"""Golden parity tests against the reference's OWN C++ (SURVEY §7 step 3).

Compiles the reference's CPU cores unmodified —
``cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp`` and
``cpp_wrappers/cpp_neighbors/neighbors/neighbors.cpp`` (nanoflann KD-tree) —
behind a C-ABI shim (tests/golden_shim.cpp) and asserts this repo's XLA ops
reproduce their contracts:

  * grid_subsample: identical voxel partition (set-equality over voxel cells)
    with matching barycenters, feature means, and majority labels;
  * radius_neighbors: identical distance-sorted neighbor lists under the
    calibrated-truncation contract, with shadow padding;
  * build_pyramid: a full multi-level pyramid on a realistic sphere cloud —
    per-level point sets and neighbor/pool index matrices checked level by
    level against C++ outputs.

Skips cleanly when the reference tree or a C++ toolchain is unavailable.
"""

import ctypes
import shutil
import subprocess
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from mvkpconv_tpu.ops.pyramid import PyramidSpec, build_pyramid
from mvkpconv_tpu.ops.neighbors import radius_neighbors
from mvkpconv_tpu.ops.sampling import grid_subsample

REF_CPP = Path("/root/reference/KPConv-PyTorch/cpp_wrappers")
SHIM = Path(__file__).parent / "golden_shim.cpp"


@pytest.fixture(scope="session")
def golden(tmp_path_factory):
    if not REF_CPP.exists():
        pytest.skip("reference C++ tree not mounted")
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    build = tmp_path_factory.mktemp("golden_build")
    tree = build / "cpp_wrappers"
    shutil.copytree(REF_CPP, tree)
    lib_path = build / "libgolden.so"
    cmd = [
        "g++", "-O3", "-std=c++14", "-shared", "-fPIC", "-I", str(tree),
        str(SHIM),
        str(tree / "cpp_utils/cloud/cloud.cpp"),
        str(tree / "cpp_subsampling/grid_subsampling/grid_subsampling.cpp"),
        str(tree / "cpp_neighbors/neighbors/neighbors.cpp"),
        "-o", str(lib_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as e:
        pytest.skip(f"reference C++ failed to compile: {e}")
    lib = ctypes.CDLL(str(lib_path))
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.golden_grid_subsample.restype = ctypes.c_long
    lib.golden_grid_subsample.argtypes = [
        f32p, ctypes.c_long, f32p, ctypes.c_int, i32p, ctypes.c_int,
        ctypes.c_float, f32p, f32p, i32p, ctypes.c_long,
    ]
    lib.golden_radius_neighbors.restype = ctypes.c_long
    lib.golden_radius_neighbors.argtypes = [
        f32p, ctypes.c_long, f32p, ctypes.c_long, i32p, i32p,
        ctypes.c_int, ctypes.c_float, i32p, ctypes.c_long,
    ]
    return lib


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def golden_grid_subsample(lib, points, features=None, labels=None, dl=0.1):
    pts = np.ascontiguousarray(points, np.float32)
    n = len(pts)
    fdim = 0 if features is None else features.shape[1]
    feats = (
        np.zeros((0,), np.float32)
        if features is None
        else np.ascontiguousarray(features, np.float32)
    )
    labs = (
        np.zeros((0,), np.int32)
        if labels is None
        else np.ascontiguousarray(labels, np.int32)
    )
    out_p = np.empty((n, 3), np.float32)
    out_f = np.empty((n, max(fdim, 1)), np.float32)
    out_l = np.empty((n,), np.int32)
    m = lib.golden_grid_subsample(
        _f32p(pts), n, _f32p(feats), fdim, _i32p(labs),
        1 if labels is not None else 0, ctypes.c_float(dl),
        _f32p(out_p), _f32p(out_f), _i32p(out_l), n,
    )
    assert m <= n
    return (
        out_p[:m],
        out_f[:m, :fdim] if features is not None else None,
        out_l[:m] if labels is not None else None,
    )


def golden_radius_neighbors(lib, queries, supports, q_lens, s_lens, radius):
    q = np.ascontiguousarray(queries, np.float32)
    s = np.ascontiguousarray(supports, np.float32)
    qb = np.asarray(q_lens, np.int32)
    sb = np.asarray(s_lens, np.int32)
    cap = len(q) * 1024
    out = np.empty((cap,), np.int32)
    mc = lib.golden_radius_neighbors(
        _f32p(q), len(q), _f32p(s), len(s), _i32p(qb), _i32p(sb),
        len(qb), ctypes.c_float(radius), _i32p(out), cap,
    )
    assert mc < 1024, "test cap exceeded"
    return out[: len(q) * mc].reshape(len(q), mc)


def _cell_keys(points, dl):
    """Integer voxel cells on the reference's grid (origin = floor(min/dl))."""
    origin = np.floor(points.min(0) / dl) * dl
    return np.floor((points - origin) / dl).astype(np.int64)


def _assert_same_ordered_neighbors(ours, gold, q, supports, tol=1e-4):
    """Same neighbor multiset, same distance-sorted order up to near-ties.

    Our distances come from the MXU expansion ‖q‖²−2q·s+‖s‖² while the
    reference computes (q−s)² exactly, so neighbors whose distances differ
    by less than float error may legally swap.
    """
    np.testing.assert_array_equal(np.sort(ours), np.sort(gold))
    d_ours = np.linalg.norm(supports[ours] - q, axis=-1)
    d_gold = np.linalg.norm(supports[gold] - q, axis=-1)
    np.testing.assert_allclose(d_ours, d_gold, rtol=0, atol=tol)


def _sphere_cloud(rng, n, radius=1.0):
    """Surface-ish cloud: points near a bumpy sphere shell (realistic for
    indoor-scan spheres: 2D manifold embedded in 3D, non-uniform density)."""
    u = rng.randn(n, 3)
    u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
    r = radius * (0.7 + 0.3 * rng.rand(n, 1))
    return (u * r).astype(np.float32)


class TestGridSubsampleGolden:
    def test_barycenters_features_labels(self, golden, rng):
        pts = _sphere_cloud(rng, 2000)
        feats = rng.rand(2000, 4).astype(np.float32)
        labs = rng.randint(0, 20, 2000).astype(np.int32)
        dl = 0.15

        gp, gf, gl = golden_grid_subsample(golden, pts, feats, labs, dl)
        ours = grid_subsample(
            jnp.asarray(pts), dl, max_out=2000,
            features=jnp.asarray(feats), labels=jnp.asarray(labs),
        )
        om = np.asarray(ours.mask)
        op = np.asarray(ours.points)[om]
        of = np.asarray(ours.features)[om]
        ol = np.asarray(ours.labels)[om]

        # identical voxel partitions ⇒ same count and same cell keys
        assert len(gp) == len(op)
        gkey = _cell_keys(gp, dl)
        okey = _cell_keys(op, dl)
        gorder = np.lexsort(gkey.T)
        oorder = np.lexsort(okey.T)
        np.testing.assert_array_equal(gkey[gorder], okey[oorder])

        np.testing.assert_allclose(
            gp[gorder], op[oorder], rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            gf[gorder], of[oorder], rtol=1e-5, atol=1e-5
        )
        # majority labels: both must pick an argmax of the voxel's vote
        # histogram (the C++ unordered_map iteration order makes exact ties
        # unspecified, so compare against the histogram, not each other)
        cell_of_point = _cell_keys(pts, dl)
        votes = {}
        for c, l in zip(map(tuple, cell_of_point), labs):
            votes.setdefault(c, np.zeros(20, np.int64))[l] += 1
        for key, g_l, o_l in zip(
            map(tuple, gkey[gorder]), gl[gorder], ol[oorder]
        ):
            hist = votes[key]
            assert hist[g_l] == hist.max()
            assert hist[o_l] == hist.max()

    def test_points_only(self, golden, rng):
        pts = _sphere_cloud(rng, 500)
        gp, _, _ = golden_grid_subsample(golden, pts, dl=0.2)
        ours = grid_subsample(jnp.asarray(pts), 0.2, max_out=500)
        op = np.asarray(ours.points)[np.asarray(ours.mask)]
        assert len(gp) == len(op)
        go, oo = np.lexsort(_cell_keys(gp, 0.2).T), np.lexsort(_cell_keys(op, 0.2).T)
        np.testing.assert_allclose(gp[go], op[oo], rtol=1e-5, atol=1e-5)


class TestRadiusNeighborsGolden:
    def test_sorted_lists_and_shadow(self, golden, rng):
        """Two stacked clouds; exact ordered-prefix + shadow-padding parity."""
        n1, n2, radius = 400, 300, 0.25
        c1 = _sphere_cloud(rng, n1)
        c2 = _sphere_cloud(rng, n2) + 5.0
        stacked = np.concatenate([c1, c2])
        gold = golden_radius_neighbors(
            golden, stacked, stacked, [n1, n2], [n1, n2], radius
        )
        max_count = gold.shape[1]

        for cloud, offset, ns in ((c1, 0, n1), (c2, n1, n2)):
            k = max_count  # truncation-free: k covers the densest row
            ours = np.asarray(
                radius_neighbors(
                    jnp.asarray(cloud), jnp.asarray(cloud), radius, k,
                    method="exact",
                )
            )
            grows = gold[offset : offset + ns]
            for qi in range(ns):
                g = grows[qi]
                g_real = g[g < n1 + n2] - offset  # de-stack indices
                o = ours[qi]
                o_real = o[o < ns]
                # same neighbors, same distance-sorted order (up to ties)
                _assert_same_ordered_neighbors(o_real, g_real, cloud[qi], cloud)
                # shadow padding beyond the real count
                assert np.all(o[len(o_real):] == ns)

    def test_truncation_prefix(self, golden, rng):
        """With k < max_count our rows must be the closest-k prefix of the
        reference's sorted rows (the calibrated-truncation contract,
        datasets/common.py:411-421)."""
        n, radius = 600, 0.4
        cloud = _sphere_cloud(rng, n)
        gold = golden_radius_neighbors(golden, cloud, cloud, [n], [n], radius)
        k = max(2, gold.shape[1] // 3)
        ours = np.asarray(
            radius_neighbors(jnp.asarray(cloud), jnp.asarray(cloud), radius, k,
                             method="exact")
        )
        for qi in range(n):
            g = gold[qi]
            g_real = g[g < n][:k]
            _assert_same_ordered_neighbors(
                ours[qi][: len(g_real)], g_real, cloud[qi], cloud)


class TestPyramidGolden:
    def test_full_pyramid(self, golden, rng):
        """Level-by-level golden check of build_pyramid on a realistic cloud."""
        n0 = 1500
        pts0 = _sphere_cloud(rng, n0, radius=1.2)
        # generous budgets so no voxel overflows (truncation-free contract)
        spec = PyramidSpec(
            num_points=(n0, 1280, 768, 512),
            first_subsampling_dl=0.06,
            conv_radius=2.5,
            conv_neighbors=(64, 64, 64, 64),
            pool_neighbors=(64, 64, 64),
            neighbor_method="exact",
        )
        pyr = build_pyramid(jnp.asarray(pts0)[None], jnp.ones((1, n0), bool), spec)

        prev_pts = None
        for l in range(spec.num_levels):
            m = np.asarray(pyr.masks[l][0])
            p = np.asarray(pyr.points[l][0])[m]
            if l > 0:
                # point sets: golden subsample of OUR previous level
                dl = spec.cell_size(l)
                gp, _, _ = golden_grid_subsample(golden, prev_pts, dl=dl)
                assert len(gp) == len(p), f"level {l} voxel count"
                go = np.lexsort(_cell_keys(gp, dl).T)
                oo = np.lexsort(_cell_keys(p, dl).T)
                np.testing.assert_allclose(
                    gp[go], p[oo], rtol=1e-5, atol=1e-5
                )
            prev_pts = p

            # conv neighbors at this level vs golden radius search
            r = spec.radius(l)
            nl = len(p)
            budget = spec.num_points[l]
            gold = golden_radius_neighbors(golden, p, p, [nl], [nl], r)
            ours = np.asarray(pyr.neighbors[l][0])
            k = ours.shape[1]
            # our index rows are over the PADDED buffer (< budget = real);
            # the golden search ran on the extracted valid points, so map
            # buffer indices → valid-order indices before comparing
            valid_idx = np.flatnonzero(np.asarray(pyr.masks[l][0]))
            buf_to_valid = {int(b): i for i, b in enumerate(valid_idx)}
            for vi, bi in enumerate(valid_idx):
                g_real = gold[vi][gold[vi] < nl][:k]
                o = ours[bi]
                o_real = o[o < budget]
                o_mapped = np.array(
                    [buf_to_valid[int(x)] for x in o_real], dtype=np.int64
                )
                _assert_same_ordered_neighbors(o_mapped, g_real, p[vi], p)

            # pool rows vs golden (queries = next level)
            if l + 1 < spec.num_levels:
                mq = np.asarray(pyr.masks[l + 1][0])
                qp = np.asarray(pyr.points[l + 1][0])[mq]
                gold_p = golden_radius_neighbors(
                    golden, qp, p, [len(qp)], [nl], r
                )
                pool = np.asarray(pyr.pools[l][0])
                kp = pool.shape[1]
                q_valid = np.flatnonzero(mq)
                for vi, bi in enumerate(q_valid):
                    g_real = gold_p[vi][gold_p[vi] < nl][:kp]
                    o = pool[bi]
                    o_real = o[o < budget]
                    o_mapped = np.array(
                        [buf_to_valid[int(x)] for x in o_real], dtype=np.int64
                    )
                    _assert_same_ordered_neighbors(o_mapped, g_real, qp[vi], p)
