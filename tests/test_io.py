"""PLY IO + ScanNet preprocessing tests (round trips on fabricated data)."""

import pickle
import struct
import zlib

import numpy as np

from mvkpconv_tpu.data import scannet_io
from mvkpconv_tpu.utils.ply import read_ply, write_ply


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.rand(100, 3).astype(np.float32)
    cols = (rng.rand(100, 3) * 255).astype(np.uint8)
    labels = rng.randint(0, 40, 100).astype(np.int32)
    p = tmp_path / "cloud.ply"
    write_ply(p, [pts, cols, labels], ["x", "y", "z", "red", "green", "blue", "label"])
    data = read_ply(p)
    np.testing.assert_allclose(np.stack([data["x"], data["y"], data["z"]], 1), pts)
    np.testing.assert_array_equal(data["red"], cols[:, 0])
    np.testing.assert_array_equal(data["label"], labels)


def test_ply_ascii_read(tmp_path):
    p = tmp_path / "ascii.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 2\n"
        "property float x\nproperty float y\nproperty float z\n"
        "end_header\n0 1 2\n3 4 5\n"
    )
    data = read_ply(p)
    np.testing.assert_allclose(data["x"], [0, 3])
    np.testing.assert_allclose(data["z"], [2, 5])


def test_label_mapping_and_scene_loading(tmp_path, rng):
    # fabricate a tiny scan: mesh ply + labels ply (nyu40 ids)
    scan = tmp_path / "scene0000_00"
    scan.mkdir()
    pts = rng.rand(50, 3).astype(np.float32)
    cols = (rng.rand(50, 3) * 255).astype(np.uint8)
    write_ply(scan / "scene0000_00_vh_clean_2.ply", [pts, cols],
              ["x", "y", "z", "red", "green", "blue"])
    nyu = rng.choice([1, 2, 5, 39, 40, 0], 50).astype(np.uint16)  # 40/0 unmapped
    write_ply(scan / "scene0000_00_vh_clean_2.labels.ply", [pts, nyu],
              ["x", "y", "z", "label"])
    scene = scannet_io.load_scene(scan, "scene0000_00")
    assert scene["points"].shape == (50, 3)
    assert scene["colors"].max() <= 1.0
    lut = scannet_io.nyu40_to_train_ids()
    assert lut[1] == 0 and lut[2] == 1 and lut[39] == 19
    assert lut[40] == -1 and lut[0] == -1
    np.testing.assert_array_equal(scene["labels"], lut[nyu.astype(np.int64)])

    out = scannet_io.preprocess_split(tmp_path, ["scene0000_00"], tmp_path / "split.pkl")
    loaded = scannet_io.load_split(tmp_path / "split.pkl")
    assert loaded[0]["scan_id"] == "scene0000_00"
    np.testing.assert_array_equal(loaded[0]["labels"], out[0]["labels"])


def test_label_mapping_tsv(tmp_path):
    tsv = tmp_path / "labels.tsv"
    tsv.write_text(
        "id\traw_category\tcategory\tnyu40id\n"
        "1\twall\twall\t1\n"
        "22\tceiling lamp\tlamp\t35\n"
        "bad\tx\tx\ty\n"
    )
    m = scannet_io.parse_label_mapping_tsv(tsv)
    assert m == {1: 1, 22: 35}


def test_compute_label_weights():
    scenes = [{"labels": np.array([0, 0, 0, 1, -1])}]
    w = scannet_io.compute_label_weights(scenes, num_classes=3)
    assert w.shape == (3,)
    assert w[1] > w[0]  # rarer class weighs more
    assert w[2] >= w[1]  # absent class gets max weight


def test_sens_reader_roundtrip(tmp_path, rng):
    """Fabricate a minimal v4 .sens stream and decode it back."""
    depth = (rng.rand(8, 10) * 3000).astype("<u2")
    pose = np.eye(4, dtype="<f4")
    color_bytes = b"\xff\xd8fakejpeg"
    buf = b""
    buf += struct.pack("<I", 4)
    name = b"StructureSensor"
    buf += struct.pack("<Q", len(name)) + name
    for _ in range(4):
        buf += np.eye(4, dtype="<f4").tobytes()
    buf += struct.pack("<i", 2)  # jpeg color
    buf += struct.pack("<i", 1)  # zlib_ushort depth
    buf += struct.pack("<IIII", 320, 240, 10, 8)
    buf += struct.pack("<f", 1000.0)
    buf += struct.pack("<Q", 1)  # one frame
    comp = zlib.compress(depth.tobytes())
    buf += pose.tobytes()
    buf += struct.pack("<QQ", 0, 0)  # timestamps
    buf += struct.pack("<QQ", len(color_bytes), len(comp))
    buf += color_bytes + comp
    p = tmp_path / "scan.sens"
    p.write_bytes(buf)

    r = scannet_io.SensReader(p)
    assert r.num_frames == 1 and r.depth_shift == 1000.0
    assert r.color_compression == "jpeg" and r.depth_compression == "zlib_ushort"
    frames = list(r.frames())
    r.close()
    got_pose, got_color, got_depth = frames[0]
    np.testing.assert_array_equal(got_pose, pose)
    assert got_color == color_bytes
    np.testing.assert_allclose(got_depth, depth.astype(np.float32) / 1000.0)


def test_load_frames_raw_id_labels(tmp_path):
    """Raw-ScanNet-id 2D label pngs must go raw→nyu40 (TSV) →train, and the
    nyu40-only path must REJECT ids > 40 instead of silently corrupting
    supervision (scannet_2d.py:86-104 composition)."""
    from PIL import Image

    from mvkpconv_tpu.data.meta import NYU40_EVAL_IDS

    frames = tmp_path / "frames"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (frames / sub).mkdir(parents=True)
    h, w = 8, 10
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(frames / "color" / "0.jpg")
    Image.fromarray(np.full((h, w), 1000, np.uint16)).save(frames / "depth" / "0.png")
    np.savetxt(frames / "pose" / "0.txt", np.eye(4))
    np.savetxt(frames / "intrinsic" / "intrinsic_depth.txt", np.eye(4))

    # raw ids: 1 -> nyu40 1 (wall, train 0); 1163 -> nyu40 40 (otherprop,
    # ignored); 7 -> nyu40 5 (chair-ish, mapped)
    raw = np.zeros((h, w), np.uint16)
    raw[0] = 1
    raw[1] = 1163
    raw[2] = 7
    labels_dir = tmp_path / "label"
    labels_dir.mkdir()
    Image.fromarray(raw).save(labels_dir / "0.png")
    tsv = tmp_path / "labels.tsv"
    tsv.write_text(
        "id\traw_category\tcategory\tnyu40id\n"
        "1\twall\twall\t1\n"
        "7\tchair\tchair\t5\n"
        "1163\tobject\tobject\t40\n"
    )

    out = scannet_io.load_frames(
        frames, [0], resize_hw=None, label_dir=labels_dir,
        label_mapping_tsv=tsv,
    )
    lut = scannet_io.nyu40_to_train_ids()
    lab = out["label"][0]
    assert (lab[0] == lut[1]).all()
    assert (lab[1] == lut[40]).all()
    assert (lab[2] == lut[5]).all()
    assert (lab[3:] == -1).all()  # raw id 0 unmapped -> ignore

    # without the TSV, raw-id pngs (> 40) must raise, not corrupt
    with np.testing.assert_raises(ValueError):
        scannet_io.load_frames(
            frames, [0], resize_hw=None, label_dir=labels_dir,
        )


def test_load_frames_skips_corrupt_and_blacklisted(tmp_path, caplog):
    """Corrupt-frame robustness (reference parity: exclude_frames blacklist,
    mvpnet/data/scannet_2d3d.py:53-58, + invalid-pose skip,
    preprocess.py:137-140): truncated jpeg / all-zero depth / non-finite
    pose / blacklisted frames are skipped with a warning; survivors are
    reported in out['frame_ids']; an empty survivor set raises."""
    import logging

    from PIL import Image

    frames = tmp_path / "frames"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (frames / sub).mkdir(parents=True)
    np.savetxt(frames / "intrinsic" / "intrinsic_depth.txt", np.eye(4))
    h, w = 8, 10

    def put(fid, *, color=True, depth_val=1000, pose=None):
        if color:
            Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
                frames / "color" / f"{fid}.jpg"
            )
        else:  # truncated / undecodable jpeg
            (frames / "color" / f"{fid}.jpg").write_bytes(b"\xff\xd8broken")
        Image.fromarray(np.full((h, w), depth_val, np.uint16)).save(
            frames / "depth" / f"{fid}.png"
        )
        p = np.eye(4) if pose is None else pose
        np.savetxt(frames / "pose" / f"{fid}.txt", p)

    put(0)                                   # good
    put(1, color=False)                      # undecodable jpeg
    put(2, depth_val=0)                      # depth zero everywhere
    bad_pose = np.eye(4)
    bad_pose[0, 0] = np.inf                  # ScanNet writes inf poses for
    put(3, pose=bad_pose)                    # untracked frames
    put(4)                                   # good but blacklisted

    with caplog.at_level(logging.WARNING, "mvkpconv_tpu.data.scannet_io"):
        out = scannet_io.load_frames(
            frames, [0, 1, 2, 3, 4], resize_hw=None, exclude=[4]
        )
    np.testing.assert_array_equal(out["frame_ids"], [0])
    assert out["rgb"].shape[0] == 1 and out["depth"].shape[0] == 1
    assert len(caplog.records) == 4  # one warning per dropped frame

    # scan_id consults the built-in reference blacklist
    put(1175)
    out = scannet_io.load_frames(
        frames, [0, 1175], resize_hw=None, scan_id="scene0243_00"
    )
    np.testing.assert_array_equal(out["frame_ids"], [0])

    # nothing survives -> raise, never an empty stack
    with np.testing.assert_raises(ValueError):
        scannet_io.load_frames(frames, [1, 2], resize_hw=None)

    # skip_bad=False propagates the decode error
    with np.testing.assert_raises(Exception):
        scannet_io.load_frames(frames, [1], resize_hw=None, skip_bad=False)
