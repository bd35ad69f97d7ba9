"""Loader tests with on-the-fly fixtures for colmap / nerfpp / rtmv / nsvf
(VERDICT: these loaders previously had zero coverage)."""
import json
import os
import struct

import numpy as np
import pytest

pytest.importorskip("imageio")


def _write_png(path, hw=(8, 8), rgba=False, value=128):
    import imageio.v2 as imageio
    c = 4 if rgba else 3
    img = np.full(hw + (c,), value, np.uint8)
    if rgba:
        img[..., 3] = 255
    os.makedirs(os.path.dirname(path), exist_ok=True)
    imageio.imwrite(path, img)


# ---------------------------------------------------------------------------
# shared loaders
# ---------------------------------------------------------------------------


def test_load_image_stack_parallel(tmp_path):
    from google_nerf_tpu.data.loaders import load_image_stack
    paths = []
    for i in range(5):
        p = str(tmp_path / f"{i}.png")
        _write_png(p, value=10 * i)
        paths.append(p)
    out = load_image_stack(paths, (8, 8))
    assert out.shape == (5, 64, 3)
    np.testing.assert_allclose(out[3], 30 / 255.0, atol=1e-3)


def test_decode_image_alpha_blend(tmp_path):
    import imageio.v2 as imageio
    from google_nerf_tpu.data.loaders import decode_image
    p = str(tmp_path / "a.png")
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 0] = 200            # red
    img[..., 3] = 128            # half alpha
    imageio.imwrite(p, img)
    white = decode_image(p, (4, 4), alpha_bg=1.0).reshape(4, 4, 3)
    black = decode_image(p, (4, 4), alpha_bg=0.0).reshape(4, 4, 3)
    a = 128 / 255
    assert white[0, 0, 1] == pytest.approx(1 - a, abs=2e-2)  # green = bg
    assert black[0, 0, 1] == pytest.approx(0.0, abs=2e-2)
    assert white[0, 0, 0] == pytest.approx(200 / 255 * a + (1 - a),
                                           abs=2e-2)


def test_normalize_c2w_and_bbox():
    from google_nerf_tpu.data.loaders import bbox_shift_scale, normalize_c2w
    shift, scale = bbox_shift_scale([-1, -2, -3], [3, 2, 3])
    np.testing.assert_allclose(shift, [1, 0, 0])
    assert scale == pytest.approx(3 * 1.05)
    poses = np.zeros((2, 3, 4), np.float32)
    poses[:, :, 3] = [1, 0, 0]
    out = normalize_c2w(poses, shift, scale)
    np.testing.assert_allclose(out[:, :, 3], 0.0, atol=1e-7)


# ---------------------------------------------------------------------------
# NSVF
# ---------------------------------------------------------------------------


def _make_nsvf_scene(root, n_train=3, n_test=2):
    root = os.path.join(root, "Synthetic_NeRF", "Lego")
    os.makedirs(os.path.join(root, "rgb"))
    os.makedirs(os.path.join(root, "pose"))
    np.savetxt(os.path.join(root, "bbox.txt"),
               np.array([-1, -1, -1, 1, 1, 1, 0.01]).reshape(1, -1))
    with open(os.path.join(root, "intrinsics.txt"), "w") as f:
        f.write("1111.0 400 400 0\n0 0 0\n")
    for i in range(n_train):
        _write_png(os.path.join(root, "rgb", f"0_{i:04d}.png"), (8, 8),
                   rgba=True)
        np.savetxt(os.path.join(root, "pose", f"0_{i:04d}.txt"),
                   np.vstack([np.hstack([np.eye(3), [[0], [0], [2 + i]]]),
                              [0, 0, 0, 1]]))
    for i in range(n_test):
        _write_png(os.path.join(root, "rgb", f"2_{i:04d}.png"), (8, 8))
        np.savetxt(os.path.join(root, "pose", f"2_{i:04d}.txt"),
                   np.vstack([np.hstack([np.eye(3), [[0], [1], [2]]]),
                              [0, 0, 0, 1]]))
    return root


def test_nsvf_loader(tmp_path):
    from google_nerf_tpu.data.nsvf import NSVFDataset
    root = _make_nsvf_scene(str(tmp_path))
    ds = NSVFDataset(root, split="train", downsample=0.01)
    assert ds.img_wh == (8, 8)
    assert ds.rays.shape == (3, 64, 3)
    assert ds.poses.shape == (3, 3, 4)
    # Lego scale fix applied: scale = 1 * 1.05 * 1.1
    assert ds.scale == pytest.approx(1.05 * 1.1)
    # poses normalized: t_z = (2..4 - 0) / (2*scale)
    np.testing.assert_allclose(ds.poses[0, 2, 3], 2 / (2 * ds.scale),
                               rtol=1e-5)
    ds_test = NSVFDataset(root, split="test", downsample=0.01)
    assert len(ds_test.poses) == 2


# ---------------------------------------------------------------------------
# NeRF++
# ---------------------------------------------------------------------------


def _make_nerfpp_scene(root, n=3):
    for d in ("train", "test"):
        os.makedirs(os.path.join(root, d, "rgb"))
        os.makedirs(os.path.join(root, d, "pose"))
        os.makedirs(os.path.join(root, d, "intrinsics"))
        for i in range(n):
            _write_png(os.path.join(root, d, "rgb", f"{i:05d}.png"), (8, 8))
            pose = np.eye(4)
            pose[2, 3] = 3 + i
            np.savetxt(os.path.join(root, d, "pose", f"{i:05d}.txt"),
                       pose.reshape(1, -1))
            K = np.eye(4)
            K[0, 0] = K[1, 1] = 100.0
            K[0, 2] = K[1, 2] = 4.0
            np.savetxt(os.path.join(root, d, "intrinsics", f"{i:05d}.txt"),
                       K.reshape(1, -1))
    return root


def test_nerfpp_loader(tmp_path):
    from google_nerf_tpu.data.nerfpp import NeRFPPDataset
    root = _make_nerfpp_scene(str(tmp_path))
    ds = NeRFPPDataset(root, split="train")
    assert ds.rays.shape == (3, 64, 3)
    assert ds.poses.shape == (3, 3, 4)
    assert ds.poses[1, 2, 3] == pytest.approx(4.0)
    assert ds.K[0, 0] == pytest.approx(100.0)


# ---------------------------------------------------------------------------
# RTMV
# ---------------------------------------------------------------------------


def _make_rtmv_scene(root, n=6):
    os.makedirs(os.path.join(root, "images"))
    for i in range(n):
        _write_png(os.path.join(root, "images", f"{i:05d}.png"), (8, 8))
        cam = {"camera_data": {
            "cam2world": [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0],
                          [0, 0, 3 + i, 1]],
            "intrinsics": {"fx": 100.0, "fy": 100.0, "cx": 4.0, "cy": 4.0},
            "width": 8, "height": 8,
            "scene_center_3d_box": [0, 0, 0],
            "scene_min_3d_box": [-1, -1, -1],
            "scene_max_3d_box": [1, 1, 1]}}
        with open(os.path.join(root, f"{i:05d}.json"), "w") as f:
            json.dump(cam, f)
    return root


def test_rtmv_loader(tmp_path):
    from google_nerf_tpu.data.rtmv import RTMVDataset
    root = _make_rtmv_scene(str(tmp_path))
    ds = RTMVDataset(root, split="all")
    assert ds.rays.shape == (6, 64, 3)
    assert ds.poses.shape == (6, 3, 4)
    # cam2world transposed then y/z flipped
    assert ds.poses[0, 1, 1] == pytest.approx(-1.0)
    assert ds.poses[2, 2, 3] == pytest.approx(5.0)  # translation not flipped


# ---------------------------------------------------------------------------
# COLMAP (binary fixture written by hand per the format spec)
# ---------------------------------------------------------------------------


def _make_colmap_scene(root, n=9):
    sparse = os.path.join(root, "sparse/0")
    os.makedirs(sparse)
    os.makedirs(os.path.join(root, "images"))
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 8, 8))           # PINHOLE 8x8
        f.write(struct.pack("<dddd", 100.0, 100.0, 4.0, 4.0))
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            name = f"im{i:03d}.png"
            _write_png(os.path.join(root, "images", name), (8, 8))
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", 1.0, 0, 0, 0))      # identity quat
            f.write(struct.pack("<ddd", 0.1 * i, 0, -4.0))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))                    # no 2D points
    with open(os.path.join(sparse, "points3D.bin"), "wb") as f:
        rng = np.random.default_rng(0)
        f.write(struct.pack("<Q", 20))
        for i in range(20):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *rng.normal(0, 0.5, 3)))
            f.write(struct.pack("<BBB", 100, 100, 100))
            f.write(struct.pack("<d", 0.1))
            f.write(struct.pack("<Q", 0))                    # no track
    return root


def test_colmap_loader(tmp_path):
    from google_nerf_tpu.data.colmap import ColmapDataset
    root = _make_colmap_scene(str(tmp_path))
    ds = ColmapDataset(root, split="train")
    ds_test = ColmapDataset(root, split="test")
    # every 8th image is test: 9 images -> 2 test (0, 8), 7 train
    assert len(ds.poses) == 7
    assert len(ds_test.poses) == 2
    assert ds.rays.shape == (7, 64, 3)
    assert ds.K[0, 0] == pytest.approx(100.0)
    # scaling: min camera norm == 1 over the full (pre-split) set
    import numpy as np
    all_poses = np.concatenate([ds.poses[..., 3], ds_test.poses[..., 3]])
    assert np.linalg.norm(all_poses, axis=-1).min() == pytest.approx(
        1.0, rel=1e-5)


def test_colmap_batched_quats_match_reference():
    from google_nerf_tpu.data.colmap import _quats_to_rotmats
    from google_nerf_tpu.data.colmap_utils import qvec2rotmat
    rng = np.random.default_rng(0)
    q = rng.normal(size=(16, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    batched = _quats_to_rotmats(q)
    for i in range(16):
        np.testing.assert_allclose(batched[i], qvec2rotmat(q[i]),
                                   atol=1e-12)
