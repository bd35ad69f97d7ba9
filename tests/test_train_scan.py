"""fused_train_steps (multi-step lax.scan per dispatch) must walk the
SAME trajectory as the serial fused_train_step loop when fed the same
per-step keys.  Locks the r4 dispatch-amortization path used by bench.py
(reference cadence: ngp_pl/train.py:144-168 steps once per batch; the
scan is a pure batching of dispatches, not an algorithm change)."""
import jax
import jax.numpy as jnp
import numpy as np

from google_nerf_tpu.data.synthetic import SyntheticDataset
from google_nerf_tpu.models.ngp import NGPConfig
from google_nerf_tpu.train.system import (TrainConfig, fused_train_step,
                                          fused_train_steps,
                                          grid_update_step,
                                          init_train_state)


def _setup():
    model = NGPConfig(scale=0.5, encoder="packed", packed_levels=4,
                      packed_log2_size=10, grid_size=32)
    cfg = TrainConfig(model=model, batch_size=256, k_samples=16,
                      max_samples=64, random_bg=True,
                      exclude_incomplete="backfill")
    ds = SyntheticDataset(split="train", n_images=4, img_wh=(24, 24))
    state = init_train_state(jax.random.PRNGKey(0), cfg, ds.K, ds.poses,
                             ds.img_wh)
    return cfg, ds.scene(), state


def test_scan_matches_serial_loop():
    cfg, scene, state = _setup()
    key = jax.random.PRNGKey(3)
    state = grid_update_step(state, jax.random.PRNGKey(1), cfg=cfg,
                             warmup=True)
    state2 = jax.tree.map(jnp.copy, state)

    n = 4
    serial = state
    m_serial = None
    for i in range(n):
        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
        # reproduce the scan body's key schedule through the public API:
        # fused_train_step splits its key the same way internally
        serial, m_serial = fused_train_step(
            serial, scene, jax.random.fold_in(key, i), cfg=cfg)

    scanned, m_scan = fused_train_steps(state2, scene, key, cfg=cfg,
                                        n_steps=n)

    assert int(scanned["step"]) == int(serial["step"]) == n
    # same keys + same ops; tolerance only for XLA fusing the bf16 chain
    # differently inside the scan body vs the standalone program
    for a, b in zip(jax.tree_util.tree_leaves(scanned["params"]),
                    jax.tree_util.tree_leaves(serial["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=5e-5, rtol=5e-4)
    assert abs(float(m_scan["loss"]) - float(m_serial["loss"])) < 1e-4
