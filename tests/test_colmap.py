"""COLMAP IO round trips + scene assembly + CLI on fabricated data."""

import numpy as np
import pytest

from mvkpconv_tpu.data import colmap_io as cio
from mvkpconv_tpu.data import synthetic
from mvkpconv_tpu.utils.ply import write_ply


def test_qvec_rotmat_roundtrip(rng):
    for _ in range(5):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = cio.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        np.testing.assert_allclose(cio.rotmat2qvec(R), q, atol=1e-6)


def test_cameras_images_binary_roundtrip(tmp_path):
    cams = {
        1: cio.Camera(1, "PINHOLE", 640, 480, np.array([500.0, 510.0, 320.0, 240.0])),
        2: cio.Camera(2, "SIMPLE_PINHOLE", 320, 240, np.array([250.0, 160.0, 120.0])),
    }
    cio.write_cameras_binary(cams, tmp_path / "cameras.bin")
    got = cio.read_cameras_binary(tmp_path / "cameras.bin")
    assert got[1].model == "PINHOLE" and got[2].model == "SIMPLE_PINHOLE"
    np.testing.assert_allclose(got[1].params, cams[1].params)
    K = got[1].intrinsic_matrix()
    assert K[0, 0] == 500.0 and K[1, 2] == 240.0
    K2 = got[2].intrinsic_matrix()
    assert K2[0, 0] == K2[1, 1] == 250.0

    q = np.array([0.9, 0.1, 0.2, 0.3])
    q /= np.linalg.norm(q)
    ims = {
        7: cio.ColmapImage(7, q, np.array([1.0, 2.0, 3.0]), 1, "frame_0001.jpg"),
    }
    cio.write_images_binary(ims, tmp_path / "images.bin")
    got_im = cio.read_images_binary(tmp_path / "images.bin")[7]
    assert got_im.name == "frame_0001.jpg" and got_im.camera_id == 1
    np.testing.assert_allclose(got_im.qvec, q)
    # cam_to_world ∘ world_to_cam == identity
    M = got_im.cam_to_world() @ got_im.world_to_cam()
    np.testing.assert_allclose(M, np.eye(4), atol=1e-5)


def test_dense_array_roundtrip(tmp_path, rng):
    depth = rng.rand(48, 64).astype(np.float32) * 5
    cio.write_array(depth, tmp_path / "d.geometric.bin")
    got = cio.read_array(tmp_path / "d.geometric.bin")
    np.testing.assert_allclose(got, depth)


@pytest.mark.slow
def test_load_colmap_scene_and_voting_cli(tmp_path, rng):
    """Fabricate a COLMAP workspace from a synthetic scene and run the
    end-to-end colmap test CLI with a freshly trained baseline."""
    scene = synthetic.make_scene(seed=7, num_points=20000)
    views = synthetic.render_views(scene, num_views=3, h=24, w=32, seed=7)

    sparse = tmp_path / "sparse"
    depths = tmp_path / "depths"
    sparse.mkdir(), depths.mkdir()
    K = views["intrinsics"][0]
    cams = {1: cio.Camera(1, "PINHOLE", 32, 24,
                          np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]], np.float64))}
    cio.write_cameras_binary(cams, sparse / "cameras.bin")
    ims = {}
    for v in range(3):
        c2w = views["poses"][v]
        w2c_R = c2w[:3, :3].T
        w2c_t = -w2c_R @ c2w[:3, 3]
        ims[v + 1] = cio.ColmapImage(
            v + 1, cio.rotmat2qvec(w2c_R), w2c_t, 1, f"img_{v}.jpg"
        )
        cio.write_array(views["depth"][v], depths / f"img_{v}.jpg.geometric.bin")
    cio.write_images_binary(ims, sparse / "images.bin")
    laser = tmp_path / "laser.ply"
    write_ply(laser, [scene["points"], (scene["colors"] * 255).astype(np.uint8)],
              ["x", "y", "z", "red", "green", "blue"])

    got = cio.load_colmap_scene(sparse, depths, laser, resize_hw=(24, 32))
    assert got["depth"].shape == (3, 24, 32)
    # poses must reproduce the original cam-to-world transforms
    np.testing.assert_allclose(got["poses"][0], views["poses"][0], atol=1e-4)
    np.testing.assert_allclose(got["intrinsics"][0], K, atol=1e-4)

    # end-to-end CLI: train 2 steps, then colmap voting inference + ply dump
    from mvkpconv_tpu.tools import test_colmap, train_scannet
    from mvkpconv_tpu.training.config import KPConfig

    cfgp = tmp_path / "params.txt"
    KPConfig(
        architecture=("simple", "resnetb_strided", "nearest_upsample", "unary"),
        num_points=(256, 64), conv_neighbors=(8, 8), pool_neighbors=(8,),
        first_features_dim=16, first_subsampling_dl=0.1, in_radius=1.0,
        batch_num=2, epoch_steps=2, validation_size=2, in_features_dim=2,
        num_views=2, image_height=24, image_width=32,
    ).save(cfgp)
    run = str(tmp_path / "run")
    train_scannet.main([
        "--fusion", "none", "--data", "synthetic:1", "--val-data", "synthetic:1",
        "--config", str(cfgp), "--output", run, "--steps", "2",
    ])
    out_ply = tmp_path / "pred.ply"
    test_colmap.main([
        "--run", run, "--sparse", str(sparse), "--depths", str(depths),
        "--laser", str(laser), "--votes", "0.2", "--output-ply", str(out_ply),
    ])
    assert out_ply.exists()
    from mvkpconv_tpu.utils.ply import read_ply

    pred = read_ply(out_ply)
    assert "pred" in pred and len(pred["x"]) > 100
