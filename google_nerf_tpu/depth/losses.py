"""LeReS loss zoo + orchestrator, as fixed-shape XLA programs.

TPU-native rebuild of the reference losses:
  * ILNR  (`Train/lib/models/ILNR_loss.py:11-105`)
  * MSGIL (`Train/lib/models/MSGIL_loss.py:6-75`)
  * Edge-guided ranking (`Train/lib/models/ranking_loss.py:17-214`)
  * PWN-edges normal regression (`Train/lib/models/PWN_edges.py:102-262`)
  * PWN-planes virtual-normal plane loss (`Train/lib/models/PWN_planes.py:6-261`)
  * scale/shift recovery (`multi_depth_model_auxiv2.py:568-591`)
  * ModelLoss orchestrator with LOSS_MODE substring flags
    (`multi_depth_model_auxiv2.py:188-356`)

Design stance: the reference's data-dependent gathers (nonzero / randperm /
masked_select) become *fixed-count masked categorical sampling* — every
loss is one static-shape jitted expression, vmappable over both batch and
cIMLE hypotheses.  Behavioral notes preserved on purpose:
  * the fork's ILNR/MSGIL `transform` always degenerates to mean=0/std=1
    (`ILNR_loss.py:24-41`: the `[:5]` truncation forces the <10 branch), so
    normalization here is identity as well;
  * MSGIL evaluates the same half-resolution scale `scale` times
    (`MSGIL_loss.py:71-75` re-derives d_gt from gt_trans each iteration).

Depth maps here are (B, H, W); rgb (B, H, W, 3); masks bool (B, H, W).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from google_nerf_tpu.depth.normals import surface_normal_from_depth


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def masked_mean(x, mask, axis=None, eps=1e-8):
    m = mask.astype(x.dtype)
    return jnp.sum(x * m, axis=axis) / (jnp.sum(m, axis=axis) + eps)


def sample_masked_indices(key, mask_flat, n: int):
    """Draw `n` indices uniformly from the True entries of (N,) `mask_flat`.

    Fixed-shape replacement for torch `nonzero + randperm`: Gumbel-top-k
    over the mask gives a uniform sample without replacement when
    n <= popcount, else duplicates fill in.  Returns (idx (n,), ok (n,))
    where ok marks draws that landed on valid entries."""
    g = jax.random.gumbel(key, mask_flat.shape)
    score = jnp.where(mask_flat, g, -jnp.inf)
    k = min(n, mask_flat.shape[0])
    _, idx = jax.lax.top_k(score, k)
    if k < n:  # tile up to the requested fixed size
        idx = jnp.concatenate([idx, idx[:n - k] if n - k <= k else
                               jnp.resize(idx, (n - k,))])
    ok = mask_flat[idx]
    return idx, ok


def sobel_edges(gray):
    """(B, H, W) -> (edges, thetas), zero border padding, matching `getEdge`
    (`ranking_loss.py:125-141`: VALID 3x3 sobel then zero pad)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], gray.dtype)
    ky = jnp.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], gray.dtype)
    x = gray[:, :, :, None]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 3, 3),
                                        ("NHWC", "OIHW", "NHWC"))
    gx = jax.lax.conv_general_dilated(x, kx[None, None], (1, 1), "VALID",
                                      dimension_numbers=dn)[..., 0]
    gy = jax.lax.conv_general_dilated(x, ky[None, None], (1, 1), "VALID",
                                      dimension_numbers=dn)[..., 0]
    pad = [(0, 0), (1, 1), (1, 1)]
    edges = jnp.pad(jnp.sqrt(gx * gx + gy * gy), pad)
    thetas = jnp.pad(jnp.arctan2(gy, gx), pad)
    return edges, thetas


def recover_scale_shift_depth(pred, gt, min_threshold=-1e-8,
                              max_threshold=1e8):
    """Closed-form per-image 2x2 least squares fit of (scale, shift) mapping
    pred -> gt over valid gt pixels (`multi_depth_model_auxiv2.py:568-591`).
    pred/gt: (B, H, W)."""
    mask = ((gt > min_threshold) & (gt < max_threshold)).astype(pred.dtype)
    b = pred.shape[0]
    p = pred.reshape(b, -1) * mask.reshape(b, -1)
    m = mask.reshape(b, -1)
    g = gt.reshape(b, -1) * m
    a11 = jnp.sum(p * p, -1)
    a12 = jnp.sum(p, -1)          # sum over ones*pred within mask
    a22 = jnp.sum(m, -1)
    b1 = jnp.sum(p * g, -1)
    b2 = jnp.sum(g, -1)
    eps = 1e-6
    det = (a11 + eps) * (a22 + eps) - a12 * a12
    scale = ((a22 + eps) * b1 - a12 * b2) / det
    shift = ((a11 + eps) * b2 - a12 * b1) / det
    return pred * scale[:, None, None] + shift[:, None, None]


# ---------------------------------------------------------------------------
# ILNR — image-level normalized regression (`ILNR_loss.py`)
# ---------------------------------------------------------------------------


def ilnr_loss(pred, gt, valid_threshold=-1e-8, max_threshold=1e8,
              return_per_pixel: bool = False):
    """MAE(gt' - pred) + MAE(tanh(.01 gt') - tanh(.01 pred)), per-image
    masked means averaged over images with >100 valid pixels.

    The fork's trimmed mean/std normalization is degenerate (see module
    docstring) so gt' == gt."""
    mask = (gt > valid_threshold) & (gt < max_threshold)
    b = pred.shape[0]
    mask_b = mask.reshape(b, -1)
    batch_ok = jnp.sum(mask_b, -1) > 100

    diff = jnp.abs(gt - pred).reshape(b, -1)
    tanh_diff = jnp.abs(jnp.tanh(0.01 * gt)
                        - jnp.tanh(0.01 * pred)).reshape(b, -1)
    per_img = (masked_mean(diff, mask_b, axis=-1)
               + masked_mean(tanh_diff, mask_b, axis=-1))
    per_img = jnp.where(batch_ok, per_img, 0.0)
    # reference mean is over the masked sub-batch
    loss = jnp.sum(per_img) / jnp.maximum(jnp.sum(batch_ok), 1)
    loss = jnp.where(jnp.any(batch_ok), loss, 0.0)
    if return_per_pixel:
        per_pixel = jnp.where(mask & batch_ok[:, None, None],
                              (diff + tanh_diff).reshape(pred.shape), 0.0)
        return loss, per_pixel
    return loss


# ---------------------------------------------------------------------------
# MSGIL — multi-scale gradient loss (`MSGIL_loss.py`)
# ---------------------------------------------------------------------------


def _one_scale_gradient(pred, gt, mask):
    m = mask.astype(pred.dtype)
    d = pred - gt
    vg = jnp.abs(d[:, :-2, :] - d[:, 2:, :]) * (m[:, :-2, :] * m[:, 2:, :])
    hg = jnp.abs(d[:, :, :-2] - d[:, :, 2:]) * (m[:, :, :-2] * m[:, :, 2:])
    b = gt.shape[0]
    valid = (jnp.mean((m[:, :, :-2] * m[:, :, 2:]).reshape(b, -1), -1)
             + jnp.mean((m[:, :-2, :] * m[:, 2:, :]).reshape(b, -1), -1))
    grad = (jnp.mean(hg.reshape(b, -1), -1)
            + jnp.mean(vg.reshape(b, -1), -1))
    return grad / (valid + 1e-8)


def msgil_loss(pred, gt, scales: int = 4, valid_threshold=-1e-8):
    """Per-image gradient-matching loss; the fork evaluates the identical
    half-resolution scale `scales` times (`MSGIL_loss.py:71-75`), so this is
    `scales * one_scale(half_res)`.  Returns (B,)."""
    mask = gt > valid_threshold
    g = _one_scale_gradient(pred[:, ::2, ::2], gt[:, ::2, ::2],
                            mask[:, ::2, ::2])
    return scales * g


# ---------------------------------------------------------------------------
# Edge-guided ranking loss (`ranking_loss.py:113-214`)
# ---------------------------------------------------------------------------


def _edge_guided_pairs(key, h, w, edges, thetas, n_pairs: int):
    """Sample edge-anchored A/B index pairs (`edgeGuidedSampling`,
    `ranking_loss.py:62-110`): anchors on strong edges, 4 points spread
    [2,30] px along the gradient direction, chained a-b, b-c, c-d.

    edges/thetas: (N,) flat.  Returns (A, B, anchor_ok) each (3*n_pairs,)."""
    k1, k2, k3 = jax.random.split(key, 3)
    edge_mask = edges >= jnp.max(edges) * 0.1
    anchor_idx, ok = sample_masked_indices(k1, edge_mask, n_pairs)
    theta = thetas[anchor_idx]
    row_a, col_a = anchor_idx // w, anchor_idx % w
    dist = jax.random.randint(k2, (4, n_pairs), 2, 31).astype(jnp.float32)
    sign = jnp.array([-1.0, -1.0, 1.0, 1.0])[:, None]
    dist = dist * sign
    col = col_a[None] + jnp.round(dist * jnp.abs(jnp.cos(theta))[None]
                                  ).astype(jnp.int32)
    row = row_a[None] + jnp.round(dist * jnp.abs(jnp.sin(theta))[None]
                                  ).astype(jnp.int32)
    col = jnp.clip(col, 0, w - 1)
    row = jnp.clip(row, 0, h - 1)
    pts = row * w + col                      # (4, n_pairs)
    A = jnp.concatenate([pts[0], pts[1], pts[2]])
    B = jnp.concatenate([pts[1], pts[2], pts[3]])
    return A, B, jnp.tile(ok, 3)


def _random_pairs(key, mask_flat, n_pairs: int):
    k1, k2 = jax.random.split(key)
    a, ok_a = sample_masked_indices(k1, mask_flat, n_pairs)
    b, ok_b = sample_masked_indices(k2, mask_flat, n_pairs)
    return a, b, ok_a & ok_b


def ranking_loss(key, pred, gt, rgb, mask_value=-1e-8, sigma: float = 0.03,
                 alpha: float = 1.0, n_pairs: int = 2048):
    """Edge-guided + random ordinal ranking loss.  Returns (B,).

    pred/gt: (B, H, W); rgb: (B, H, W, 3) (red channel drives edges, as in
    `getEdge` with c==3, `ranking_loss.py:128-131`)."""
    b, h, w = pred.shape
    masks = gt > mask_value
    edges, thetas = sobel_edges(rgb[..., 0])

    def per_image(key, pred_i, gt_i, mask_i, e_i, t_i):
        ke, kr = jax.random.split(key)
        A1, B1, ok1 = _edge_guided_pairs(ke, h, w, e_i.reshape(-1),
                                         t_i.reshape(-1), n_pairs)
        A2, B2, ok2 = _random_pairs(kr, mask_i.reshape(-1), 3 * n_pairs)
        A = jnp.concatenate([A1, A2])
        B = jnp.concatenate([B1, B2])
        ok = jnp.concatenate([ok1, ok2])
        p, g, m = pred_i.reshape(-1), gt_i.reshape(-1), mask_i.reshape(-1)
        pa, pb = p[A], p[B]
        ga, gb = g[A], g[B]
        consistent = (m[A] & m[B] & ok).astype(pred_i.dtype)

        ratio = (ga + 1e-6) / (gb + 1e-6)
        mask_eq = (ratio < 1.0 + sigma) & (ratio > 1.0 / (1.0 + sigma))
        labels = jnp.where(ratio >= 1.0 + sigma, 1.0,
                           jnp.where(ratio <= 1.0 / (1.0 + sigma), -1.0,
                                     0.0))
        equal = (pa - pb) ** 2 * mask_eq * consistent
        unequal = (jnp.log1p(jnp.exp(jnp.clip((-pa + pb) * labels,
                                              -60.0, 60.0)))
                   * (~mask_eq) * consistent)
        return alpha * jnp.mean(equal) + jnp.mean(unequal)

    keys = jax.random.split(key, b)
    return jax.vmap(per_image)(keys, pred, gt, masks, edges, thetas)


# ---------------------------------------------------------------------------
# PWN-edges: edge-guided normal regression (`PWN_edges.py:102-262`)
# ---------------------------------------------------------------------------


def pwn_edges_loss(key, pred, gt, rgb, focal_length, mask_value=-1e-8,
                   cos_theta1: float = 0.3, cos_theta2: float = 0.95,
                   n_pairs: int = 2048):
    """Normal-consistency regression on edge-anchored and random point
    pairs.  pred/gt: (B, H, W); rgb (B, H, W, 3); focal_length (B,).
    Returns (B,)."""
    b, h, w = pred.shape
    masks = gt > mask_value
    n_pred = surface_normal_from_depth(pred, focal_length, masks)
    n_gt = surface_normal_from_depth(gt, focal_length, masks)

    edges_img, thetas_img = sobel_edges(rgb[..., 0])
    # edges from gt normals: mean |sobel| over the 3 channels
    gx = [sobel_edges(n_gt[..., c])[0] for c in range(3)]
    # getNormalEdge takes |grad| per channel then means, then magnitude —
    # approximate with the mean of channel edge magnitudes
    edges_normal = sum(gx) / 3.0
    thetas_normal = thetas_img  # direction reuse; gt-normal thetas below
    border = jnp.ones((b, h, w), bool)
    border = border.at[:, 5:-5, 5:-5].set(False)
    edges_normal = jnp.where(border, 0.0, edges_normal)

    # dilated depth-edge exclusion (`PWN_edges.py:197-203`)
    edges_depth, _ = sobel_edges(gt)
    edm = (edges_depth >= jnp.max(edges_depth) * 0.1).astype(jnp.float32)
    dil = jax.lax.reduce_window(edm[..., None], 0.0, jax.lax.add,
                                (1, 3, 3, 1), (1, 1, 1, 1), "SAME")[..., 0]
    excl = jnp.clip(dil, 0, 1) > 0
    edges_normal = jnp.where(excl, 0.0, edges_normal)
    edges_img = jnp.where(excl, 0.0, edges_img)

    def per_image(key, ni, ti, mask_i, e_img, t_img, e_nrm, t_nrm):
        k1, k2, k3 = jax.random.split(key, 3)
        A1, B1, ok1 = _edge_guided_pairs(k1, h, w, e_img.reshape(-1),
                                         t_img.reshape(-1), n_pairs)
        A2, B2, ok2 = _edge_guided_pairs(k2, h, w, e_nrm.reshape(-1),
                                         t_nrm.reshape(-1), n_pairs)
        A = jnp.concatenate([A1, A2])
        B = jnp.concatenate([B1, B2])
        ok = jnp.concatenate([ok1, ok2])
        m = mask_i.reshape(-1)
        consistent = m[A] & m[B] & ok

        nif = ni.reshape(-1, 3)
        tif = ti.reshape(-1, 3)
        t_cos = jnp.abs(jnp.sum(tif[A] * tif[B], -1))
        i_cos = jnp.abs(jnp.sum(nif[A] * nif[B], -1))
        m75 = (t_cos < cos_theta1) & consistent
        m10 = (t_cos > cos_theta2) & consistent
        l75 = jnp.sum(jnp.abs(t_cos - i_cos) * m75) / (jnp.sum(m75) + 1e-8)
        l10 = jnp.sum(jnp.abs(t_cos - i_cos) * m10) / (jnp.sum(m10) + 1e-8)

        # random-sampling regression term (`PWN_edges.py:246-252`)
        RA, RB, rok = _random_pairs(k3, m, n_pairs)
        rt = jnp.abs(jnp.sum(tif[RA] * tif[RB], -1))
        ri = jnp.abs(jnp.sum(nif[RA] * nif[RB], -1))
        lr = jnp.sum(jnp.abs(rt - ri) * rok) / (jnp.sum(rok) + 1e-8)
        # reference overwrites loss[i] with the random term after adding
        # the edge terms to a running total (`PWN_edges.py:241-252`) —
        # net effect per image is the random regression term plus the two
        # edge terms of *previous* images; we treat all three as intended.
        return l75 + l10 + lr

    keys = jax.random.split(key, b)
    return jax.vmap(per_image)(keys, n_pred, n_gt, masks, edges_img,
                               thetas_img, edges_normal, thetas_normal)


# ---------------------------------------------------------------------------
# PWN-planes: virtual-normal plane consistency (`PWN_planes.py:6-261`)
# ---------------------------------------------------------------------------


def pwn_planes_loss(key, gt_depth, pred_depth_ss, planes, focal_length,
                    sample_groups: int = 512, max_planes: int = 8,
                    delta_cos: float = 0.867, delta_diff: float = 0.007,
                    xyz_mode: str = "xyz"):
    """Points on the same annotated plane should share a normal.

    gt_depth/pred_depth_ss: (B, H, W); planes: (B, H, W) int plane ids
    (0 = no plane); focal_length: (B,).  Returns scalar (summed over batch
    then normalised by valid group count, as `PWN_planes.py:233-259`)."""
    b, h, w = gt_depth.shape
    u = (jnp.arange(w, dtype=pred_depth_ss.dtype) - w // 2)
    v = (jnp.arange(h, dtype=pred_depth_ss.dtype) - h // 2)
    max_uv = jnp.max(u)

    def per_image(key, pred_i, planes_i, f):
        if xyz_mode == "uvd":
            x = jnp.broadcast_to(u[None, :] / max_uv, (h, w))
            y = jnp.broadcast_to(v[:, None] / max_uv, (h, w))
            pw = jnp.stack([x, y, pred_i], -1)
        else:
            x = u[None, :] * jnp.abs(pred_i) / f
            y = v[:, None] * jnp.abs(pred_i) / f
            pw = jnp.stack([x, y, pred_i], -1)
        pwf = pw.reshape(-1, 3)

        def per_plane(pk, plane_id):
            mask = (planes_i == plane_id) & (plane_id != 0)
            n_valid = jnp.sum(mask)
            ks = jax.random.split(pk, 3)
            idx = [sample_masked_indices(k, mask.reshape(-1),
                                         sample_groups)[0] for k in ks]
            p1, p2, p3 = pwf[idx[0]], pwf[idx[1]], pwf[idx[2]]
            # filter near-degenerate groups (`filter_mask`,
            # `PWN_planes.py:146-172`): colinear xy or too-close points
            d12, d13, d23 = (p2 - p1)[:, :2], (p3 - p1)[:, :2], \
                (p3 - p2)[:, :2]
            dots = jnp.stack([
                jnp.sum(a * bb, -1)
                / (jnp.linalg.norm(a, axis=-1)
                   * jnp.linalg.norm(bb, axis=-1) + 1e-8)
                for a, bb in ((d12, d13), (d12, d23), (d13, d23))], -1)
            cos_bad = jnp.sum(jnp.abs(dots) > delta_cos, -1) > 0
            near_x = jnp.stack([jnp.abs(d[:, 0]) < delta_diff
                                for d in (d12, d13, d23)], -1).any(-1)
            near_y = jnp.stack([jnp.abs(d[:, 1]) < delta_diff
                                for d in (d12, d13, d23)], -1).any(-1)
            ok = (~(cos_bad | (near_x & near_y))
                  & (n_valid > 3 * sample_groups * 0.6 / 5))
            vn = jnp.cross(p2 - p1, p3 - p1)
            vn = vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-8)
            flip = jnp.sum(vn * p1, -1) > 0
            vn = jnp.where(flip[:, None], -vn, vn)
            okf = ok.astype(vn.dtype)[:, None]
            aver = jnp.sum(vn * okf, 0)
            aver = aver / (jnp.linalg.norm(aver) + 1e-5)
            cos_diff = (1.0 - jnp.sum(vn * aver, -1)) * ok
            return jnp.sum(cos_diff), jnp.sum(ok)

        plane_ids = jnp.arange(1, max_planes + 1)
        keys = jax.random.split(key, max_planes)
        losses, counts = jax.vmap(per_plane)(keys, plane_ids)
        return jnp.sum(losses), jnp.sum(counts)

    keys = jax.random.split(key, b)
    losses, counts = jax.vmap(per_image)(keys, pred_depth_ss, planes,
                                         focal_length)
    return jnp.sum(losses) / (jnp.sum(counts) + 1e-8)


# ---------------------------------------------------------------------------
# Orchestrator (`ModelLoss`, `multi_depth_model_auxiv2.py:188-356`)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LossConfig:
    loss_mode: str = "_ranking-edge_ilnr_msgil-normal_meanstd-tanh_"
    loss_auxi_weight: float = 0.5
    focal_x: float = 256.0
    focal_y: float = 256.0
    ilnr_min: float = -1e-8
    ilnr_max: float = 1e8
    pwn_max: float = 10.1


def depth_losses(key, pred, data, cfg: LossConfig,
                 auxi=None) -> Dict[str, jnp.ndarray]:
    """Full criterion.  `data` is a dict with keys depth (B,H,W), rgb
    (B,H,W,3), and optionally planes (B,H,W) int, focal_length (B,),
    quality_flg (B,), disp (B,H,W).

    Returns a dict of named losses + 'total_loss' (scalar) + 'total_raw'
    ((B,) per-image raw totals for cIMLE argmin-z selection,
    `multi_depth_model_auxiv2.py:217-221`)."""
    mode = cfg.loss_mode.lower()
    gt = data["depth"]
    b = gt.shape[0]
    q = data.get("quality_flg", jnp.full((b,), 3, jnp.int32))
    mid = (q >= 2)[:, None, None]
    focal = data.get("focal_length", jnp.full((b,), cfg.focal_x))
    keys = jax.random.split(key, 4)

    loss: Dict[str, jnp.ndarray] = {}
    total_raw = jnp.zeros((b,), pred.dtype)

    needs_ss = ("_pairwise-normal-regress-edge_" in mode
                or "_pairwise-normal-regress-plane_" in mode)
    pred_ss = (recover_scale_shift_depth(pred, gt, -1e-8, cfg.pwn_max)
               if needs_ss else None)

    if "_pairwise-normal-regress-plane_" in mode:
        planes = data.get("planes", jnp.zeros_like(gt, jnp.int32))
        cur = pwn_planes_loss(keys[0], gt, pred_ss, planes, focal)
        loss["pairwise-normal-regress-plane_loss"] = cur
        total_raw = total_raw + cur

    if "_pairwise-normal-regress-edge_" in mode:
        hi = (q == 3).astype(pred.dtype)
        cur = pwn_edges_loss(keys[1], pred_ss, gt, data["rgb"], focal) * hi
        loss["pairwise-normal-regress-edge_loss"] = jnp.sum(cur)
        total_raw = total_raw + cur

    if "_meanstd-tanh_" in mode:
        gt_mid = jnp.where(mid, gt, 0.0)   # quality-masked (>=2) pixels
        cur, per_pixel = ilnr_loss(pred, gt_mid, cfg.ilnr_min, cfg.ilnr_max,
                                   return_per_pixel=True)
        loss["meanstd-tanh_loss"] = cur
        loss["ilnr_per_pixel"] = per_pixel
        total_raw = total_raw + cur

    if "_ranking-edge_" in mode:
        cur = ranking_loss(keys[2], pred, gt, data["rgb"])
        loss["ranking-edge_loss"] = jnp.sum(cur)
        total_raw = total_raw + cur

    if "_msgil-normal_" in mode:
        cur = msgil_loss(pred, gt) * 0.1
        loss["msg_normal_loss"] = jnp.sum(cur)
        total_raw = total_raw + cur

    total = jnp.zeros((), pred.dtype)
    for k in sorted(loss):
        if k == "ilnr_per_pixel":
            continue
        total = total + jnp.sum(loss[k])

    # auxi branch on disparity (`auxi_loss`, multi_depth_model_auxiv2.py:240)
    if auxi is not None and "disp" in data:
        disp = data["disp"]
        auxi_total = jnp.zeros((), pred.dtype)
        if "_ranking-edge-auxi_" in mode:
            cur = jnp.sum(ranking_loss(keys[3], auxi, disp, data["rgb"]))
            loss["ranking-edge_auxiloss"] = cur
            auxi_total += cur
        if "_msgil-normal-auxi_" in mode:
            cur = jnp.sum(msgil_loss(auxi, disp)) * 0.5
            loss["msg_normal_auxiloss"] = cur
            auxi_total += cur
        if "_meanstd-tanh-auxi_" in mode:
            cur = ilnr_loss(auxi, disp)
            loss["meanstd-tanh_auxiloss"] = cur
            auxi_total += cur
        total = total + auxi_total * cfg.loss_auxi_weight

    loss["total_loss"] = total
    loss["total_raw"] = total_raw
    return loss
