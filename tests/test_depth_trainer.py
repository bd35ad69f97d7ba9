"""cIMLE depth-training smoke test — the reference's own verification bar
(`LeReS/README.md:74-78`: 2-epoch run on a bundled demo dataset)."""
import dataclasses
import json
import os

import numpy as np
import pytest

import jax


def _write_demo_dataset(root, n=6, hw=64):
    import cv2
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "demo", "rgb")
    dep_dir = os.path.join(root, "demo", "depth")
    os.makedirs(img_dir), os.makedirs(dep_dir)
    os.makedirs(os.path.join(root, "demo", "annotations"))
    annos = []
    for i in range(n):
        # smooth gradient scenes so depth is learnable
        yy, xx = np.mgrid[0:hw, 0:hw] / hw
        depth = (1.0 + xx + 0.5 * yy + 0.1 * rng.random()) * 1000
        rgb = np.stack([xx, yy, 1 - xx], -1) * 255
        cv2.imwrite(f"{img_dir}/{i:04d}.png", rgb.astype(np.uint8))
        cv2.imwrite(f"{dep_dir}/{i:04d}.png", depth.astype(np.uint16))
        annos.append({"rgb_path": f"demo/rgb/{i:04d}.png",
                      "depth_path": f"demo/depth/{i:04d}.png"})
    with open(os.path.join(root, "demo", "annotations",
                           "train_annotations.json"), "w") as f:
        json.dump(annos, f)


@pytest.mark.slow
def test_cimle_smoke_train(tmp_path):
    pytest.importorskip("cv2")
    from google_nerf_tpu.depth.config import DepthCfg
    from google_nerf_tpu.depth.data import (DepthAnnotationDataset,
                                            MultiDatasetSampler)
    from google_nerf_tpu.depth.trainer import (init_trainer, loss_config,
                                               make_train_step,
                                               make_zcache_fn, model_config,
                                               recache_z, train_depth)

    root = str(tmp_path)
    _write_demo_dataset(root)
    cfg = DepthCfg()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset, crop_size=(64, 64)),
        model=dataclasses.replace(cfg.model, encoder="resnet18",
                                  d_latent=8),
        train=dataclasses.replace(cfg.train, batch_size=2, base_lr=1e-3,
                                  num_latent=4, latent_minibatch=2,
                                  log_interval=3,
                                  loss_mode="_meanstd-tanh_msgil-normal_"))
    ds = DepthAnnotationDataset(root, "demo", cfg=cfg.dataset)
    assert len(ds) == 6
    sampler = MultiDatasetSampler([ds])

    logs = []
    state = train_depth(jax.random.PRNGKey(0), cfg, sampler, epochs=2,
                        log=lambda m: logs.append(str(m)))
    assert state.step == 6  # 2 epochs x 3 batches
    # loss decreased across the run
    losses = [float(line.split("total_loss=")[1].split()[0])
              for line in logs if "total_loss=" in line]
    assert len(losses) >= 2
    assert losses[-1] < losses[0] * 1.5  # not diverging
    assert np.isfinite(losses).all()


def test_multi_dataset_sampler_interleaves(tmp_path):
    pytest.importorskip("cv2")
    from google_nerf_tpu.depth.config import DepthCfg
    from google_nerf_tpu.depth.data import (DepthAnnotationDataset,
                                            MultiDatasetSampler)
    root = str(tmp_path)
    _write_demo_dataset(root, n=4, hw=16)
    cfg = dataclasses.replace(DepthCfg().dataset, crop_size=(16, 16))
    ds = DepthAnnotationDataset(root, "demo", cfg=cfg)
    ds2 = DepthAnnotationDataset(root, "demo", cfg=cfg)
    s = MultiDatasetSampler([ds, ds2])
    idxs = s.epoch_indices(0)
    assert [i[0] for i in idxs[:4]] == [0, 1, 0, 1]  # interleaved
    # strided rank shards partition the order
    s0 = MultiDatasetSampler([ds, ds2], rank=0, world_size=2)
    s1 = MultiDatasetSampler([ds, ds2], rank=1, world_size=2)
    a, b = s0.epoch_indices(0), s1.epoch_indices(0)
    assert len(a) == len(b) == len(idxs) // 2
    assert a + b != idxs  # interleaved halves
    assert sorted(a + b) == sorted(idxs)

    batch = next(iter(s.batches(0, 2)))
    assert batch["rgb"].shape == (2, 16, 16, 3)
    assert batch["depth"].shape == (2, 16, 16)
    assert batch["quality_flg"].shape == (2,)


@pytest.mark.slow
def test_zcache_selects_argmin(tmp_path):
    pytest.importorskip("cv2")
    from google_nerf_tpu.depth.config import DepthCfg
    from google_nerf_tpu.depth.data import (DepthAnnotationDataset,
                                            MultiDatasetSampler)
    from google_nerf_tpu.depth.trainer import (init_trainer, loss_config,
                                               model_config, recache_z)
    root = str(tmp_path)
    _write_demo_dataset(root, n=2, hw=32)
    cfg = DepthCfg()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset, crop_size=(32, 32)),
        model=dataclasses.replace(cfg.model, encoder="resnet18",
                                  d_latent=4),
        train=dataclasses.replace(cfg.train, num_latent=4,
                                  latent_minibatch=2,
                                  loss_mode="_meanstd-tanh_"))
    ds = DepthAnnotationDataset(root, "demo", cfg=cfg.dataset)
    sampler = MultiDatasetSampler([ds])
    state, _, mcfg = init_trainer(jax.random.PRNGKey(0), cfg)
    z = recache_z(jax.random.PRNGKey(1), state, sampler, cfg, mcfg,
                  loss_config(cfg), log=lambda *_: None)
    assert z.shape == (2, 4)
    assert np.isfinite(z).all()
    assert not np.allclose(z[0], z[1])


@pytest.mark.slow
def test_calibrate_adain_sets_stats(tmp_path):
    pytest.importorskip("cv2")
    from google_nerf_tpu.depth.config import DepthCfg
    from google_nerf_tpu.depth.data import (DepthAnnotationDataset,
                                            MultiDatasetSampler)
    from google_nerf_tpu.depth.trainer import calibrate_adain, init_trainer
    import flax
    root = str(tmp_path)
    _write_demo_dataset(root, n=2, hw=32)
    cfg = DepthCfg()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset, crop_size=(32, 32)),
        model=dataclasses.replace(cfg.model, encoder="resnet18",
                                  d_latent=4, cimle_version="v2"))
    ds = DepthAnnotationDataset(root, "demo", cfg=cfg.dataset)
    sampler = MultiDatasetSampler([ds])
    state, _, mcfg = init_trainer(jax.random.PRNGKey(0), cfg)
    before = flax.traverse_util.flatten_dict(
        state.variables["adain_stats"])
    assert all(np.allclose(v, 0) for v in before.values())
    state = calibrate_adain(jax.random.PRNGKey(1), state, sampler, cfg,
                            mcfg, n_batches=2, n_z=2)
    after = flax.traverse_util.flatten_dict(state.variables["adain_stats"])
    assert any(not np.allclose(np.asarray(v), 0) for v in after.values())


@pytest.mark.slow
def test_resume_roundtrip(tmp_path):
    pytest.importorskip("cv2")
    from google_nerf_tpu.depth.config import DepthCfg
    from google_nerf_tpu.depth.data import (DepthAnnotationDataset,
                                            MultiDatasetSampler)
    from google_nerf_tpu.depth.trainer import train_depth
    from google_nerf_tpu.utils.ckpt import load_ckpt, save_ckpt
    root = str(tmp_path / "data")
    os.makedirs(root)
    _write_demo_dataset(root, n=4, hw=32)
    cfg = DepthCfg()
    cfg = dataclasses.replace(
        cfg,
        dataset=dataclasses.replace(cfg.dataset, crop_size=(32, 32)),
        model=dataclasses.replace(cfg.model, encoder="resnet18",
                                  d_latent=4),
        train=dataclasses.replace(cfg.train, batch_size=2, num_latent=2,
                                  latent_minibatch=2,
                                  loss_mode="_meanstd-tanh_"))
    ds = DepthAnnotationDataset(root, "demo", cfg=cfg.dataset)
    sampler = MultiDatasetSampler([ds])
    saved = {}

    def ckpt_fn(state, epoch):
        path = str(tmp_path / f"resume_e{epoch + 1}")
        save_ckpt(path, dict(variables=state.variables,
                             opt_state=state.opt_state,
                             step=state.step, epoch=epoch + 1))
        saved[epoch + 1] = path

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ckpt_epochs=1))
    s1 = train_depth(jax.random.PRNGKey(0), cfg, sampler, epochs=1,
                     log=lambda *_: None, ckpt_fn=ckpt_fn)
    assert 1 in saved
    from google_nerf_tpu.depth.trainer import init_trainer
    tmpl, _, _ = init_trainer(jax.random.PRNGKey(0), cfg)
    restored = load_ckpt(saved[1],
                         target=dict(variables=tmpl.variables,
                                     opt_state=tmpl.opt_state,
                                     step=0, epoch=0))
    assert int(restored["epoch"]) == 1
    s2 = train_depth(jax.random.PRNGKey(0), cfg, sampler, epochs=2,
                     log=lambda *_: None, resume=restored)
    assert s2.step > s1.step  # continued past the restored state
