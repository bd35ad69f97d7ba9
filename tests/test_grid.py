"""Tests for occupancy-grid maintenance (reference networks.py:119-252)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from google_nerf_tpu.ops.grid import (cell_coords, cells_to_world,
                                      mark_invisible_cells,
                                      update_density_grid)

G = 32
SCALE = 0.5


def test_cells_to_world_range():
    coords = cell_coords(G)
    w = np.asarray(cells_to_world(coords, 0, SCALE, G))
    s, half = 0.5, 0.5 / G
    assert w.min() == -(s - half) and w.max() == (s - half)
    # raster order: last axis fastest
    np.testing.assert_allclose(w[1] - w[0],
                               [0, 0, 2 * (s - half) / (G - 1)], atol=1e-6)


def test_mark_invisible_cells_camera_frustum():
    # one camera at z=-2 looking +z with a narrow fov
    # (half-tangent 32/300 ~ 0.107 -> covers only +-0.21 at the box center)
    K = jnp.asarray([[300.0, 0, 32], [0, 300.0, 32], [0, 0, 1]])
    pose = jnp.asarray(
        np.concatenate([np.eye(3), [[0], [0], [-2.0]]], 1)[None],
        jnp.float32)
    grid = np.asarray(mark_invisible_cells(
        K, pose, img_w=64, img_h=64, grid_size=G, cascades=1, scale=SCALE))
    assert grid.shape == (1, G, G, G)
    assert set(np.unique(grid)) <= {0.0, -1.0}
    # center cell is visible (straight ahead)
    assert grid[0, G // 2, G // 2, G // 2] == 0.0
    # fov is narrow (tan = 0.32 half-width at dist ~2): corners invisible
    assert grid[0, 0, 0, G // 2] == -1.0
    # some cells are visible, some not
    assert (grid == 0).sum() > 0 and (grid == -1).sum() > 0


def _ball_density(x):
    return 30.0 * (jnp.linalg.norm(x, axis=-1) < 0.2)


@pytest.mark.slow
def test_update_density_grid_warmup_marks_ball():
    grid0 = jnp.zeros((1, G, G, G))
    new, occ = update_density_grid(
        grid0, _ball_density, jax.random.PRNGKey(0), scale=SCALE,
        density_threshold=0.6, warmup=True)
    occ = np.asarray(occ)
    coords = np.asarray(cell_coords(G))
    centers = np.asarray(cells_to_world(coords, 0, SCALE, G)).reshape(
        G, G, G, 3)
    inside = np.linalg.norm(centers, axis=-1) < 0.15
    outside = np.linalg.norm(centers, axis=-1) > 0.3
    assert occ[0][inside].mean() > 0.95   # ball cells occupied
    assert occ[0][outside].mean() < 0.01  # empty space stays empty


@pytest.mark.slow
def test_update_density_grid_invisible_cells_stay_dead():
    grid0 = -jnp.ones((1, G, G, G))
    new, occ = update_density_grid(
        grid0, _ball_density, jax.random.PRNGKey(0), scale=SCALE,
        density_threshold=0.6, warmup=True)
    assert (np.asarray(new) == -1).all()
    assert not np.asarray(occ).any()


@pytest.mark.slow
def test_update_density_grid_ema_decay():
    # positive grid + zero density field -> values decay by 0.95
    grid0 = jnp.full((1, G, G, G), 10.0)
    new, _ = update_density_grid(
        grid0, lambda x: jnp.zeros(x.shape[:-1]), jax.random.PRNGKey(0),
        scale=SCALE, density_threshold=0.6, warmup=True)
    np.testing.assert_allclose(np.asarray(new), 9.5, rtol=1e-6)


@pytest.mark.slow
def test_update_density_grid_sampled_phase_runs():
    grid0 = jnp.zeros((1, G, G, G))
    new, occ = update_density_grid(
        grid0, _ball_density, jax.random.PRNGKey(0), scale=SCALE,
        density_threshold=0.6, warmup=True)
    # second update in sampled mode must keep the ball occupied
    new2, occ2 = update_density_grid(
        new, _ball_density, jax.random.PRNGKey(1), scale=SCALE,
        density_threshold=0.6, warmup=False)
    coords = np.asarray(cell_coords(G))
    centers = np.asarray(cells_to_world(coords, 0, SCALE, G)).reshape(
        G, G, G, 3)
    inside = np.linalg.norm(centers, axis=-1) < 0.15
    assert np.asarray(occ2)[0][inside].mean() > 0.9


def test_erode_kills_isolated_floater():
    grid0 = jnp.zeros((1, G, G, G)).at[0, 5, 5, 5].set(100.0)
    new, _ = update_density_grid(
        grid0, lambda x: jnp.zeros(x.shape[:-1]), jax.random.PRNGKey(0),
        scale=SCALE, density_threshold=0.6, warmup=True, erode=True)
    # EMA decay then erode decay: 100 * 0.95 * 0.95
    np.testing.assert_allclose(float(new[0, 5, 5, 5]), 100 * 0.95 * 0.95,
                               rtol=1e-6)


@pytest.mark.slow
def test_segment_max_dense_vs_scatter():
    from google_nerf_tpu.ops.grid import _segment_max_dense
    key = jax.random.PRNGKey(11)
    n, m = 257, 4096
    idx = jax.random.randint(key, (m,), 0, n, dtype=jnp.int32)
    vals = jnp.abs(jax.random.normal(jax.random.fold_in(key, 1), (m,))) * 50
    ref = jnp.zeros((n,)).at[idx].max(vals)
    got = _segment_max_dense(idx, vals, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=0)
