import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

from mvkpconv_tpu.models import MVKPConv
from mvkpconv_tpu.ops.pyramid import build_pyramid
from mvkpconv_tpu.training.config import KPConfig
from mvkpconv_tpu.training.init import jit_init
from __graft_entry__ import _make_batch

B = int(sys.argv[1])
cfg = KPConfig(
    fusion="early", in_features_dim=66,
    num_points=(16384, 4096, 1024, 256, 64),
    conv_neighbors=(30, 30, 30, 30, 30), pool_neighbors=(30, 30, 30, 30),
    num_views=5, image_height=120, image_width=160, batch_num=B,
    compute_dtype=jnp.bfloat16,
)
model = MVKPConv(cfg)
spec = cfg.pyramid_spec()
rng = np.random.RandomState(0)
batch = {k: jnp.asarray(v) for k, v in _make_batch(cfg, B, rng).items()}
pyr0 = jax.jit(lambda p, m: build_pyramid(p, m, spec))(batch["points"], batch["mask"])
variables = jit_init(model, batch, pyr0)

def infer(variables, batch):
    pyr = build_pyramid(batch["points"], batch["mask"], spec)
    return jnp.sum(model.apply(variables, batch, pyr, train=False))

iters = 8
@jax.jit
def timed(variables, batch):
    def body(_, acc):
        bt = dict(batch)
        bt["points"] = batch["points"] + acc * 1e-20
        return acc + infer(variables, bt)
    return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

float(timed(variables, batch))
ts = []
for _ in range(2):
    t0 = time.perf_counter()
    float(timed(variables, batch))
    ts.append(time.perf_counter() - t0)
dt = min(ts) / iters
print(f"B={B}: {dt*1000:.2f} ms/step  {B*16384/dt/1e3:.0f}k pts/s")
