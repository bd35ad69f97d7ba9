"""Full ScanNet glue-chain e2e (SURVEY §0 story, VERDICT r1 item 9):

  synthetic .sens -> process_scene -> split_train_test -> ScannetDataset
  (with a dumped per-frame depth prior) -> depth-supervised train steps.

Each piece is unit-tested elsewhere (tests/test_scannet_tools.py,
tests/test_depth_supervision_e2e.py); this test exercises the seams the
reference pipeline crosses between repos
(`process_scannet/process_scannet_single_scene.py:126-141` ->
`ngp_pl/train_scannet.py` -> depth priors from the LeReS tool).
"""
import io
import os

import numpy as np
import pytest


def _jpeg(rgb):
    import imageio.v2 as imageio
    buf = io.BytesIO()
    imageio.imwrite(buf, rgb, format="jpeg")
    return buf.getvalue()


def test_scannet_chain_sens_to_depth_supervised_training(tmp_path):
    import jax
    import jax.numpy as jnp

    from google_nerf_tpu.data.ply import save_point_cloud
    from google_nerf_tpu.data.scannet import ScannetDataset
    from google_nerf_tpu.models.ngp import NGPConfig
    from google_nerf_tpu.scannet_tools.process import (process_scene,
                                                       split_train_test)
    from google_nerf_tpu.scannet_tools.sensor_data import write_sens
    from google_nerf_tpu.train.system import (TrainConfig, init_train_state,
                                              run_training)

    # ---- 1. synthetic .sens: 6 inward-looking cameras on a small arc ----
    rng = np.random.RandomState(0)
    h_img, w_img = 12, 16
    # the dataset reads K from intrinsic_depth.txt and does NOT rescale it
    # (reference quirk, datasets/scannet.py) -> write K for the target size
    K = np.array([[16.0, 0, 8.0, 0], [0, 16.0, 6.0, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    frames = []
    for i in range(6):
        th = (i - 2.5) * 0.15
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 3] = [np.sin(th) * 1.2, 0.0, -np.cos(th) * 1.2]
        rgb = rng.randint(0, 255, (h_img, w_img, 3)).astype(np.uint8)
        depth = np.full((h_img, w_img), 1200, np.uint16)  # ~1.2 m
        frames.append((c2w, _jpeg(rgb), depth))
    sens = str(tmp_path / "scene0000_00.sens")
    write_sens(sens, intrinsic_depth=K, color_wh=(w_img, h_img),
               depth_wh=(w_img, h_img), frames=frames)

    # ---- 2-3. export + split (the process_scannet stage) ----
    out = str(tmp_path / "scene0000_00")
    process_scene(sens, out, frame_skip=1, image_size=(h_img, w_img))
    train_ids, test_ids = split_train_test(out, test_step=3)
    assert train_ids and test_ids

    # ---- raw-scan AABB source: the _vh_clean_2.ply the dataset scales by
    # span covers the cameras too (a scanned room contains its camera),
    # so normalized poses land inside [-0.5, 0.5]^3 like real scans
    verts = rng.uniform(-1.4, 1.4, (200, 3)).astype(np.float32)
    save_point_cloud(os.path.join(out, "scene0000_00_vh_clean_2.ply"),
                     verts)

    # ---- depth priors (the LeReS dump stage): per-frame .npy in meters
    prior_dir = str(tmp_path / "priors")
    os.makedirs(prior_dir)
    for i in train_ids + test_ids:
        np.save(os.path.join(prior_dir, f"{i}.npy"),
                np.full((h_img, w_img), 1.1, np.float32))

    # ---- 4. dataset over the exported tree ----
    ds = ScannetDataset(out, split="train", downsample=w_img / 640.0,
                        test_skip=3, raw_scan_rootdir=str(tmp_path),
                        depth_dir=prior_dir)
    assert ds.img_wh == (w_img, h_img)
    assert ds.rays.shape[0] == len(train_ids)
    assert ds.depths is not None and ds.depths.shape == ds.rays.shape[:2]
    # priors arrive in scene units (normalized by 2*scale like the poses)
    np.testing.assert_allclose(ds.depths, 1.1 / (2 * ds.scale), rtol=1e-5)
    # poses landed inside the normalized scene box
    assert np.abs(ds.poses[:, :, 3]).max() <= 0.5 + 1e-5

    # ---- 5. depth-supervised training steps on the scene pytree ----
    scene = ds.scene()
    assert "depths" in scene
    model = NGPConfig(scale=0.5, encoder="packed", packed_levels=4,
                      packed_log2_size=12, grid_size=32)
    cfg = TrainConfig(model=model, batch_size=256, k_samples=16,
                      max_samples=64, lr=1e-2, num_epochs=1,
                      steps_per_epoch=10, warmup_steps=4, lambda_depth=0.5)
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                             ds.img_wh)
    state, metrics = run_training(state, scene, cfg, steps=10)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["psnr"]))
    assert int(state["step"]) == 10
