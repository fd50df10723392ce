"""Band-structure probe for the NO-SORT banded gather-transpose.

The sorted transpose is doomed by the permuted take (74.85 ms at L0:
random HBM rows from a 252 MB source — scratch/prof_scatter4.py), not by
the segment sum. But the data pipeline emits voxel-x-major-sorted points,
so in NATURAL row order a 512-row cotangent block touches a bounded band
of target ids. This probe measures that band on the REAL bench pyramid:
for every gather site (conv neighbors, pools, upsamples, every level),
per-512-block target span after (a) dropping shadow rows and (b) padding
each batch element's rows to a block multiple, and the outlier-row
fraction at candidate windows w.

Run on CPU: JAX_PLATFORMS=cpu python scratch/prof_band.py
"""
import sys

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from __graft_entry__ import _make_batch

BLK = 512
WINDOWS = (512, 768, 1024, 1536, 2048, 3072)

cfg = KPConfig(
    fusion="early",
    in_features_dim=66,
    num_points=(16384, 4096, 1024, 256, 64),
    conv_neighbors=(30, 30, 30, 30, 30),
    pool_neighbors=(30, 30, 30, 30),
    num_views=5,
    image_height=120,
    image_width=160,
    batch_num=4,
)
spec = cfg.pyramid_spec()
rng = np.random.RandomState(0)
batch = _make_batch(cfg, cfg.batch_num, rng)
pyr = jax.jit(lambda p, m: build_pyramid(p, m, spec))(
    batch["points"], batch["mask"]
)


def probe(name, idx, ns):
    """idx: (B, Nq, K) int32 into [0, ns] where ns is the shadow row."""
    idx = np.asarray(idx)
    b, nq, k = idx.shape
    rpb = nq * k
    rpb_pad = -(-rpb // BLK) * BLK
    tot_rows = rpb * b
    spans = []
    out_counts = {w: 0 for w in WINDOWS}
    shadow = 0
    for bi in range(b):
        flat = idx[bi].reshape(-1).astype(np.int64) + bi * (ns + 1)
        is_sh = (idx[bi].reshape(-1) == ns)
        shadow += int(is_sh.sum())
        pad = rpb_pad - rpb
        if pad:
            flat = np.concatenate([flat, np.full(pad, -1)])
            is_sh = np.concatenate([is_sh, np.ones(pad, bool)])
        fb = flat.reshape(-1, BLK)
        sb = is_sh.reshape(-1, BLK)
        for j in range(fb.shape[0]):
            valid = ~sb[j]
            if not valid.any():
                continue
            v = fb[j][valid]
            lo = v.min()
            off = v - lo
            spans.append(int(off.max()) + 1)
            for w in WINDOWS:
                out_counts[w] += int((off >= w).sum())
    spans = np.array(spans)
    line = (
        f"{name:14s} rows={tot_rows/1e6:6.2f}M shadow={shadow/tot_rows:5.1%} "
        f"span p50={np.percentile(spans,50):6.0f} p90={np.percentile(spans,90):6.0f} "
        f"p99={np.percentile(spans,99):6.0f} max={spans.max():6.0f} | out/1k:"
    )
    for w in WINDOWS:
        line += f" w{w}={out_counts[w]/tot_rows*1e3:7.3f}"
    print(line, flush=True)


for lvl, nb in enumerate(pyr.neighbors):
    ns = pyr.points[lvl].shape[1]
    probe(f"conv[{lvl}]", nb, ns)
for lvl, pb in enumerate(pyr.pools):
    ns = pyr.points[lvl].shape[1]
    probe(f"pool[{lvl}]", pb, ns)
for lvl, ub in enumerate(pyr.upsamples):
    ns = pyr.points[lvl + 1].shape[1]
    probe(f"upsample[{lvl}]", ub, ns)
