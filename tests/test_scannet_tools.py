"""Round-trip tests of the .sens decoder, exporters, split tool, and the
native decompression path."""
import io
import os

import numpy as np
import pytest

from google_nerf_tpu.scannet_tools import native
from google_nerf_tpu.scannet_tools.process import (process_scene,
                                                   split_train_test)
from google_nerf_tpu.scannet_tools.sensor_data import SensorData, write_sens


def _jpeg(rgb):
    import imageio.v2 as imageio
    buf = io.BytesIO()
    imageio.imwrite(buf, rgb, format="jpeg")
    return buf.getvalue()


@pytest.fixture()
def sens_file(tmp_path):
    rng = np.random.RandomState(0)
    frames = []
    for i in range(5):
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [i, 0, 0]
        rgb = rng.randint(0, 255, (6, 8, 3)).astype(np.uint8)
        depth = (rng.rand(6, 8) * 5000).astype(np.uint16)
        frames.append((c2w, _jpeg(rgb), depth))
    path = str(tmp_path / "scene0000_00.sens")
    write_sens(path, frames=frames, color_wh=(8, 6), depth_wh=(8, 6))
    return path, frames


def test_sens_header_and_frames(sens_file):
    path, frames = sens_file
    sd = SensorData(path)
    assert sd.num_frames == 5
    assert sd.color_compression_type == "jpeg"
    assert sd.depth_compression_type == "zlib_ushort"
    assert sd.depth_shift == 1000.0
    # lazy random access
    f3 = sd.frame(3)
    np.testing.assert_allclose(f3.camera_to_world[:3, 3], [3, 0, 0])
    d = f3.depth_image(sd.depth_compression_type, 6, 8)
    np.testing.assert_array_equal(d, frames[3][2])
    sd.close()


def test_native_zlib_matches_python():
    import zlib
    rng = np.random.RandomState(1)
    raw = rng.randint(0, 255, 4096).astype(np.uint8).tobytes()
    comp = zlib.compress(raw)
    assert native.zlib_decompress(comp) == raw
    if native.have_native():
        out = native.zlib_decompress_batch([comp] * 7, len(raw))
        for i in range(7):
            assert out[i].tobytes() == raw


def test_process_scene_and_split(sens_file, tmp_path):
    path, frames = sens_file
    out = str(tmp_path / "exported")
    process_scene(path, out, frame_skip=2, image_size=(6, 8))
    # frames 0, 2, 4 exported
    assert sorted(os.listdir(os.path.join(out, "rgb"))) == \
        ["0.jpg", "2.jpg", "4.jpg"]
    assert os.path.exists(os.path.join(out, "pose", "2.txt"))
    assert os.path.exists(os.path.join(out, "intrinsic_depth.txt"))
    pose = np.loadtxt(os.path.join(out, "pose", "4.txt"))
    np.testing.assert_allclose(pose[:3, 3], [4, 0, 0])
    import imageio.v2 as imageio
    d = imageio.imread(os.path.join(out, "depth", "2.png"))
    np.testing.assert_array_equal(np.asarray(d), frames[2][2])

    train_ids, test_ids = split_train_test(out, test_step=2)
    assert test_ids == [0, 4] and train_ids == [2]
    with open(os.path.join(out, "test_step_2", "train.txt")) as f:
        assert f.read().split() == ["2"]
