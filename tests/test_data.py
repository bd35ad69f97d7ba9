"""Tests for the data layer: IO utils, COLMAP binary parser round-trip, PLY
round-trip, NSVF fixture loading, ScanNet pose conventions."""
import os
import struct

import numpy as np
import pytest

from google_nerf_tpu.data.color_utils import (linear_to_srgb, read_image,
                                              srgb_to_linear)
from google_nerf_tpu.data.colmap_utils import (qvec2rotmat,
                                               read_cameras_binary,
                                               read_images_binary,
                                               read_points3d_binary,
                                               rotmat2qvec)
from google_nerf_tpu.data.depth_utils import read_pfm, write_pfm
from google_nerf_tpu.data.ply import read_ply_vertices, save_point_cloud
from google_nerf_tpu.data import dataset_dict


def test_srgb_linear_roundtrip():
    x = np.linspace(0, 1, 100)
    np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x,
                               atol=1e-6)


def test_read_image_alpha_blend(tmp_path):
    import imageio.v2 as imageio
    img = np.zeros((8, 8, 4), np.uint8)
    img[..., 0] = 200          # red
    img[..., 3] = 128          # half alpha
    p = str(tmp_path / "t.png")
    imageio.imwrite(p, img)
    out = read_image(p, (8, 8))
    assert out.shape == (64, 3)
    a = 128 / 255
    np.testing.assert_allclose(out[0, 0], (200 / 255) * a + (1 - a),
                               atol=1e-3)
    np.testing.assert_allclose(out[0, 1], 1 - a, atol=1e-3)  # white bg


def test_pfm_roundtrip(tmp_path):
    d = np.random.RandomState(0).rand(6, 5).astype(np.float32)
    p = str(tmp_path / "d.pfm")
    write_pfm(p, d)
    out, scale = read_pfm(p)
    np.testing.assert_allclose(out, d, atol=1e-7)


def test_ply_roundtrip(tmp_path):
    xyz = np.random.RandomState(0).randn(100, 3).astype(np.float32)
    rgb = np.random.RandomState(1).randint(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    save_point_cloud(p, xyz, rgb)
    v = read_ply_vertices(p)
    np.testing.assert_allclose(v, xyz, atol=1e-6)


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(0)
    q = rng.randn(4)
    q /= np.linalg.norm(q)
    q *= np.sign(q[0])
    R = qvec2rotmat(q)
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
    np.testing.assert_allclose(rotmat2qvec(R), q, atol=1e-8)


def _write_colmap_model(d):
    os.makedirs(os.path.join(d, "sparse/0"), exist_ok=True)
    # cameras.bin: one PINHOLE camera
    with open(os.path.join(d, "sparse/0/cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 80.0, 80.0, 32.0, 24.0))
    # images.bin: two images
    with open(os.path.join(d, "sparse/0/images.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in [(1, "b.png"), (2, "a.png")]:
            f.write(struct.pack("<i", i))
            f.write(struct.pack("<dddd", 1, 0, 0, 0))
            f.write(struct.pack("<ddd", 0.1 * i, 0, 1.0))
            f.write(struct.pack("<i", 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, 7))
    # points3D.bin
    with open(os.path.join(d, "sparse/0/points3D.bin"), "wb") as f:
        f.write(struct.pack("<Q", 2))
        for pid in (7, 9):
            f.write(struct.pack("<Q", pid))
            f.write(struct.pack("<ddd", pid * 0.1, 0.2, 0.3))
            f.write(struct.pack("<BBB", 10, 20, 30))
            f.write(struct.pack("<d", 0.5))
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ii", 1, 0))


def test_colmap_binary_parser(tmp_path):
    d = str(tmp_path)
    _write_colmap_model(d)
    cams = read_cameras_binary(os.path.join(d, "sparse/0/cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    np.testing.assert_allclose(cams[1].params, [80, 80, 32, 24])
    ims = read_images_binary(os.path.join(d, "sparse/0/images.bin"))
    assert ims[2].name == "a.png"
    np.testing.assert_allclose(ims[1].tvec, [0.1, 0, 1.0])
    np.testing.assert_allclose(ims[1].qvec2rotmat(), np.eye(3), atol=1e-12)
    pts = read_points3d_binary(os.path.join(d, "sparse/0/points3D.bin"))
    assert set(pts) == {7, 9}
    np.testing.assert_allclose(pts[7].xyz, [0.7, 0.2, 0.3])


def _write_nsvf_fixture(d):
    os.makedirs(os.path.join(d, "Synthetic_NeRF_Test/rgb"), exist_ok=True)
    os.makedirs(os.path.join(d, "Synthetic_NeRF_Test/pose"), exist_ok=True)
    root = os.path.join(d, "Synthetic_NeRF_Test")
    np.savetxt(os.path.join(root, "bbox.txt"),
               np.array([[-1, -1, -1, 1, 1, 1, 0.1]]))
    with open(os.path.join(root, "intrinsics.txt"), "w") as f:
        f.write("1111.0 0 400 0\n0 1111.0 400 0\n0 0 1 0\n0 0 0 1\n")
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    for i, prefix in enumerate(["0_", "0_", "1_", "2_"]):
        pose = np.eye(4)
        pose[:3, 3] = [0, 0, 2 + i]
        np.savetxt(os.path.join(root, "pose", f"{prefix}{i:04d}.txt"), pose)
        img = rng.randint(0, 255, (800, 800, 3)).astype(np.uint8)
        imageio.imwrite(os.path.join(root, "rgb", f"{prefix}{i:04d}.png"),
                        img)
    return root


def test_nsvf_dataset_fixture(tmp_path):
    root = _write_nsvf_fixture(str(tmp_path))
    ds = dataset_dict["nsvf"](root, split="train", downsample=0.05)
    assert ds.img_wh == (40, 40)
    assert ds.rays.shape == (2, 1600, 3)
    assert ds.poses.shape == (2, 3, 4)
    # pose normalisation: translation / (2*scale); scale=1*1.05
    np.testing.assert_allclose(ds.poses[0][:, 3], [0, 0, 2 / (2 * 1.05)],
                               atol=1e-6)
    assert len(ds) == 1000
    batch = ds.sample(np.random.default_rng(0), 256)
    assert batch["rgb"].shape == (256, 3)
    scene = ds.scene()
    assert scene["images"].shape == (2, 1600, 3)


def _write_scannet_fixture(d):
    scene = os.path.join(d, "scene0000_00")
    for sub in ("rgb", "pose", "test_step_8"):
        os.makedirs(os.path.join(scene, sub), exist_ok=True)
    # mesh AABB ply in the scene dir (fallback raw-scan root)
    save_point_cloud(os.path.join(scene, "scene0000_00_vh_clean_2.ply"),
                     np.array([[0, 0, 0], [4, 2, 2.0]], np.float32))
    np.savetxt(os.path.join(scene, "intrinsic_depth.txt"),
               np.array([[577.87, 0, 319.5, 0], [0, 577.87, 239.5, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1]]))
    import imageio.v2 as imageio
    rng = np.random.RandomState(0)
    for i in range(3):
        pose = np.eye(4)
        pose[:3, 3] = [2, 1, 1]
        np.savetxt(os.path.join(scene, "pose", f"{i}.txt"), pose)
        imageio.imwrite(os.path.join(scene, "rgb", f"{i}.jpg"),
                        rng.randint(0, 255, (480, 640, 3)).astype(np.uint8))
    with open(os.path.join(scene, "test_step_8", "train.txt"), "w") as f:
        f.write("0\n1\n")
    with open(os.path.join(scene, "test_step_8", "test.txt"), "w") as f:
        f.write("2\n")
    return scene


def test_scannet_dataset_fixture(tmp_path):
    scene = _write_scannet_fixture(str(tmp_path))
    ds = dataset_dict["scannet"](scene, split="train", downsample=0.1,
                                 test_skip=8, raw_scan_rootdir=str(tmp_path))
    assert ds.img_wh == (64, 48)
    assert ds.rays.shape == (2, 64 * 48, 3)
    # scale from mesh AABB: max extent 4 -> scale = 2*1.05
    np.testing.assert_allclose(ds.scale, 2 * 1.05)
    # camera at the AABB center maps to origin
    np.testing.assert_allclose(ds.poses[0][:, 3], 0.0, atol=1e-6)
    ds_test = dataset_dict["scannet"](scene, split="test", downsample=0.1,
                                      test_skip=8,
                                      raw_scan_rootdir=str(tmp_path))
    assert len(ds_test) == 1
