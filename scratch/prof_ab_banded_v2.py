"""In-context variant V2: at the L0 c32 site, run ONLY the pallas kernel
(no shadow reduce, no residual machinery) — gradients are slightly wrong
(shadow contributions dropped) but timing isolates the kernel-in-context
cost. Everything else scatter. Run: python scratch/prof_ab_banded_v2.py"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
import mvkpconv_tpu.ops.gather as G
from mvkpconv_tpu.ops.pallas.segsum import banded_window_segsum

def kernel_only(ct, index, feat_shape):
    rows_n = int(np.prod(index.shape))
    if not (rows_n == 1966080 and feat_shape[-1] == 32):
        return G._transpose_scatter(ct, index, feat_shape)
    batch_shape = index.shape[:-2]
    ns, c = feat_shape[-2], feat_shape[-1]
    nq, k = index.shape[-2], index.shape[-1]
    b = 1
    for d in batch_shape:
        b *= d
    blk, sub = 512, G._BANDED_SUB
    rpb = nq * k
    rpb_pad = -(-rpb // blk) * blk
    nwin = min(-(-ns // sub), G._BANDED_NWIN)
    ns8 = -(-ns // 8) * 8
    rows = jax.lax.optimization_barrier(ct.reshape(b, rpb, c))
    idxb = index.reshape(b, rpb).astype(jnp.int32)
    shadow = idxb == ns - 1
    off = jnp.where(shadow, -1, idxb)
    nblk_b = rpb_pad // blk
    offb = off.reshape(b * nblk_b, blk)
    big = jnp.int32(1 << 20)
    a_lo = jnp.min(jnp.where(offb < 0, big, offb), axis=1) // sub
    a_hi = jnp.max(offb, axis=1) // sub
    base = jnp.repeat(jnp.arange(b, dtype=jnp.int32) * ns8, nblk_b)
    out = banded_window_segsum(
        rows.reshape(b * rpb_pad, c), off.reshape(-1), base,
        a_lo.astype(jnp.int32), a_hi.astype(jnp.int32),
        b * ns8, nwin=nwin, blk=blk, sub=sub)
    return out.reshape(b, ns8, c)[:, :ns].reshape(feat_shape)

G._transpose_banded = kernel_only
os.environ["MODES"] = "banded"
exec(open("/root/repo/scratch/prof_transpose_ab.py").read())
