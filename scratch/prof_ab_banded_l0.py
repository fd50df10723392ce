"""In-context bisection: banded kernel at ONLY the 1.97M-row c=32 L0 site
(isolated win: 24.5 vs 42.3 ms), scatter everywhere else. If the expected
-18 ms materializes, the in-context loss comes from the other sites'
overheads; if not, the pallas/cond insertion itself costs in-context.
Run: python scratch/prof_ab_banded_l0.py"""
import sys, os
sys.path.insert(0, "/root/repo")
import numpy as np
import mvkpconv_tpu.ops.gather as G

_orig = G._transpose_banded
def filtered(ct, index, feat_shape):
    rows = int(np.prod(index.shape))
    if rows == 1966080 and feat_shape[-1] == 32:
        return _orig(ct, index, feat_shape)
    return G._transpose_scatter(ct, index, feat_shape)
G._transpose_banded = filtered

os.environ["MODES"] = "banded"
exec(open("/root/repo/scratch/prof_transpose_ab.py").read())
