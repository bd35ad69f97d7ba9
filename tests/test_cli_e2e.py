"""CLI-level e2e on synthetic FORMAT FIXTURES (VERDICT r2 item 6).

The ScanNet chain has a bytes-on-disk e2e (tests/test_scannet_chain_e2e.py);
these lock the NSVF and ColMAP loaders the same way: write the reference
formats to disk (bbox.txt/intrinsics/pose txts; cameras/images/points3D.bin)
and drive the REAL `train.py` CLI — get_opts() argv -> main() -> train ->
checkpoint -> validation — so the loader/trainer seam is exercised through
the actual entry point (reference: `ngp_pl/datasets/nsvf.py:23-100`,
`ngp_pl/datasets/colmap.py:23-86`).
"""
import glob
import os

import numpy as np
import pytest

from tests.test_loaders import _make_colmap_scene, _make_nsvf_scene

TINY = [
    "--num_epochs", "1", "--steps_per_epoch", "20", "--batch_size", "128",
    "--grid_size", "16", "--packed_levels", "2", "--packed_log2_size", "8",
    "--max_samples", "64", "--k_samples", "16", "--no_save_test",
    "--platform", "cpu",
]


def _run_cli(argv, tmp_path, monkeypatch):
    from opt import get_opts
    from train import main

    monkeypatch.chdir(tmp_path)  # ckpts/ + results/ land in tmp
    logs = main(get_opts(argv), video_fps=1)
    assert np.isfinite(logs["psnr"])
    ckpts = glob.glob(str(tmp_path / "ckpts" / "*" / "*" / "epoch=0*"))
    assert any("slim" in c for c in ckpts), ckpts
    assert any("slim" not in c for c in ckpts), ckpts
    return logs


def test_train_cli_nsvf_fixture_e2e(tmp_path, monkeypatch):
    root = _make_nsvf_scene(str(tmp_path))
    _run_cli(["--root_dir", root, "--dataset_name", "nsvf",
              "--downsample", "0.01", "--exp_name", "cli_nsvf"] + TINY,
             tmp_path, monkeypatch)


def test_train_cli_colmap_fixture_e2e(tmp_path, monkeypatch):
    root = _make_colmap_scene(str(tmp_path / "scene"))
    # colmap path: exp_step_factor=1/256 (unbounded), erode grid updates,
    # multi-cascade model with the seg marcher + while-loop test renderer
    _run_cli(["--root_dir", root, "--dataset_name", "colmap",
              "--scale", "4.0", "--exp_name", "cli_colmap"] + TINY,
             tmp_path, monkeypatch)
