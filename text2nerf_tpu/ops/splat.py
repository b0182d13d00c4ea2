"""Depth-image-based rendering (DIBR): forward warping by bilinear splatting.

Vectorized XLA re-design of the reference warping stack
(/root/reference/scripts/Warper.py:21-272, /root/reference/utils.py:83-238).
The reference uses numpy ``np.add.at`` scatter loops on the host (a major
CPU bottleneck); here the unproject → rigid transform → reproject → 4-corner
scatter-add pipeline is a single fused jit region, and one→many warps vmap
over target poses.

Semantics preserved bit-for-bit where they matter:
- soft z-buffer: splat weights divided by exp(log1p(depth)/max·50)
  (Warper.py:141-148);
- corner indices via floor/ceil of (pos + 1) clipped to the padded ring,
  then cropped (Warper.py:122-170);
- the reference quantizes the source image to uint8 before warping and
  rounds the warped output back to uint8 (utils.py:101,144; Warper.py:179) —
  reproduced via explicit floor/round quantization helpers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def intrinsic_from_tuple(intrinsic):
    """(fx, fy, cx, cy) → 3x3 K (utils.py:91-95)."""
    fx, fy, cx, cy = intrinsic
    return jnp.array(
        [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32
    )


@jax.jit
def transform_points(depth, w2c_src, w2c_tar, k_src, k_tar):
    """Per-pixel target-camera homogeneous positions.

    Mirrors compute_transformed_points (Warper.py:64-96): unproject pixel
    (x, y) with depth via K1^-1, apply T = w2c_tar @ c2w_src, reproject with
    K2.  Returns (H, W, 3): [x*z, y*z, z] in the target camera.
    """
    h, w = depth.shape
    x2d, y2d = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32)
    )
    pos = jnp.stack([x2d, y2d, jnp.ones_like(x2d)], -1)  # (H, W, 3)
    t = w2c_tar @ jnp.linalg.inv(w2c_src)
    unnorm = jnp.einsum(
        "ij,hwj->hwi", jnp.linalg.inv(k_src), pos,
        precision=jax.lax.Precision.HIGHEST,
    )
    world = depth[..., None] * unnorm
    trans = (
        jnp.einsum(
            "ij,hwj->hwi", t[:3, :3], world,
            precision=jax.lax.Precision.HIGHEST,
        )
        + t[:3, 3]
    )
    return jnp.einsum(
        "ij,hwj->hwi", k_tar, trans, precision=jax.lax.Precision.HIGHEST
    )


@functools.partial(jax.jit, static_argnames=("is_image",))
def bilinear_splat(frame, mask, depth, trans_pos, is_image: bool = False):
    """Scatter ``frame`` to positions ``trans_pos`` with bilinear weights and
    a soft exponential z-buffer (bilinear_splatting, Warper.py:98-180).

    Args:
      frame: (H, W, C) values to splat.
      mask: (H, W) source validity (float/bool).
      depth: (H, W) target-space depth per source pixel (z-buffer weight).
      trans_pos: (H, W, 2) target pixel positions (x, y).
      is_image: round the normalized output to uint8 levels.

    Returns: (warped (H, W, C), mask2 (H, W) bool)
    """
    h, w, c = frame.shape
    mask = mask.astype(jnp.float32)
    pos_off = trans_pos + 1.0
    pos_floor = jnp.floor(pos_off).astype(jnp.int32)
    pos_ceil = jnp.ceil(pos_off).astype(jnp.int32)
    lim = jnp.array([w + 1, h + 1], jnp.int32)
    pos_off = jnp.clip(pos_off, 0.0, lim.astype(jnp.float32))
    pos_floor = jnp.clip(pos_floor, 0, lim)
    pos_ceil = jnp.clip(pos_ceil, 0, lim)

    fx, fy = pos_off[..., 0] - pos_floor[..., 0], pos_off[..., 1] - pos_floor[..., 1]
    cx, cy = pos_ceil[..., 0] - pos_off[..., 0], pos_ceil[..., 1] - pos_off[..., 1]
    prox_nw = (1 - fy) * (1 - fx)
    prox_sw = (1 - cy) * (1 - fx)
    prox_ne = (1 - fy) * (1 - cx)
    prox_se = (1 - cy) * (1 - cx)

    sat_depth = jnp.clip(depth, 0.0, 1000.0)
    log_depth = jnp.log1p(sat_depth)
    depth_w = jnp.exp(log_depth / jnp.maximum(log_depth.max(), 1e-12) * 50.0)

    base = mask / depth_w
    w_nw, w_sw = prox_nw * base, prox_sw * base
    w_ne, w_se = prox_ne * base, prox_se * base

    acc = jnp.zeros((h + 2, w + 2, c), jnp.float32)
    acc_w = jnp.zeros((h + 2, w + 2), jnp.float32)
    xf, yf = pos_floor[..., 0], pos_floor[..., 1]
    xc, yc = pos_ceil[..., 0], pos_ceil[..., 1]
    for (yy, xx, ww) in (
        (yf, xf, w_nw), (yc, xf, w_sw), (yf, xc, w_ne), (yc, xc, w_se)
    ):
        acc = acc.at[yy, xx].add(frame * ww[..., None])
        acc_w = acc_w.at[yy, xx].add(ww)

    cropped = acc[1:-1, 1:-1]
    cropped_w = acc_w[1:-1, 1:-1]
    mask2 = cropped_w > 0
    out = jnp.where(mask2[..., None], cropped / jnp.maximum(cropped_w, 1e-30)[..., None], 0.0)
    if is_image:
        out = jnp.round(jnp.clip(out, 0.0, 255.0))
    return out, mask2


@jax.jit
def forward_warp(frame_u8, mask, depth, w2c_src, w2c_tar, k_src, k_tar):
    """Full forward warp of one view (forward_warp, Warper.py:21-62).

    Args:
      frame_u8: (H, W, 3) image quantized to 0..255 levels (float storage).
      mask: (H, W) source validity or None-equivalent (pass ones).
      depth: (H, W) source depth.
      w2c_src/w2c_tar: (4, 4) extrinsics (world→camera).

    Returns: (warped_u8, mask2 bool, warped_depth, flow (H, W, 2))
    """
    trans = transform_points(depth, w2c_src, w2c_tar, k_src, k_tar)
    z = trans[..., 2]
    coords = trans[..., :2] / z[..., None]
    trans_pos = coords  # flow + grid == coords (Warper.py:56-57,119-120)

    warped, mask2 = bilinear_splat(frame_u8, mask, z, trans_pos, is_image=True)
    warped_depth, _ = bilinear_splat(z[..., None], mask, z, trans_pos, is_image=False)
    h, w = depth.shape
    x2d, y2d = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32)
    )
    flow = coords - jnp.stack([x2d, y2d], -1)
    return warped, mask2, warped_depth[..., 0], flow


def quantize_u8(rgb01):
    """(rgb * 255).astype(uint8) truncation (utils.py:101,144)."""
    return jnp.floor(jnp.clip(rgb01, 0.0, 1.0) * 255.0)


def warp_one_to_many(
    rgb01, depth, pose_src, poses_tar, intrinsic, mask=None, white_bg=True
):
    """Warp one RGBD view to many target poses (gt_warping with
    bilinear_splat=True, utils.py:122-163), vmapped over targets.

    Returns (rgbs01 (V,H,W,3), masks (V,H,W) int, depths (V,H,W)).
    """
    k = intrinsic_from_tuple(intrinsic)
    frame = quantize_u8(rgb01)
    h, w = depth.shape
    if mask is None:
        mask = jnp.ones((h, w), jnp.float32)
    w2c_src = jnp.linalg.inv(pose_src)

    def one(pose_tar):
        w2c_tar = jnp.linalg.inv(pose_tar)
        warped, m2, wdepth, _ = forward_warp(
            frame, mask, depth, w2c_src, w2c_tar, k, k
        )
        # white background fill (utils.py:149-152)
        mf = m2.astype(jnp.float32)
        out = warped * mf[..., None] + 255.0 * (1.0 - mf[..., None])
        return out / 255.0, m2.astype(jnp.int32), wdepth

    return jax.vmap(one)(jnp.asarray(poses_tar))


@jax.jit
def _warp_many_with_mask(frame, depth, extra_mask, pose_src, poses_tar, k):
    h, w = depth.shape
    ones = jnp.ones((h, w), jnp.float32)
    w2c_src = jnp.linalg.inv(pose_src)

    def one(pose_tar):
        w2c_tar = jnp.linalg.inv(pose_tar)
        trans = transform_points(depth, w2c_src, w2c_tar, k, k)
        z = trans[..., 2]
        pos = trans[..., :2] / z[..., None]
        warped, m2 = bilinear_splat(frame, ones, z, pos, is_image=True)
        wdepth, _ = bilinear_splat(z[..., None], ones, z, pos, is_image=False)
        # coverage of the extra-mask-restricted content: bilinear_splat's
        # mask2 depends only on the gated weights, not the splatted frame,
        # so this equals warp_one_to_many(mask=extra_mask)'s second output
        _, m_extra = bilinear_splat(
            extra_mask[..., None], extra_mask, z, pos, is_image=False
        )
        mf = m2.astype(jnp.float32)
        out = warped * mf[..., None] + 255.0 * (1.0 - mf[..., None])
        return (
            out / 255.0,
            m2.astype(jnp.int32),
            wdepth[..., 0],
            m_extra.astype(jnp.int32),
        )

    return jax.vmap(one)(poses_tar)


def warp_one_to_many_with_mask(
    rgb01, depth, pose_src, poses_tar, intrinsic, extra_mask
):
    """Fused double warp: full-content RGBD warp PLUS the coverage map of
    ``extra_mask``-restricted content, sharing the reprojection.

    Equivalent to ``warp_one_to_many(...)`` followed by
    ``warp_one_to_many(..., mask=extra_mask)`` keeping only the second
    call's mask output — the pattern in the expansion support-pool /
    update-known-views paths (text2nerf_main.py:302-334, 379-399) — in ONE
    device program instead of two full warps.

    Returns (rgbs01 (V,H,W,3), masks (V,H,W) int, depths (V,H,W),
             masks_extra (V,H,W) int).
    """
    k = intrinsic_from_tuple(intrinsic)
    return _warp_many_with_mask(
        quantize_u8(rgb01),
        jnp.asarray(depth),
        jnp.asarray(extra_mask, jnp.float32),
        jnp.asarray(pose_src),
        jnp.asarray(poses_tar),
        k,
    )


def warp_many_to_one(rgbs01, depths, poses, pose_tar, intrinsic, masks=None):
    """Merge several source views into one target view with first-view
    priority (bilinear_splat_warping_multiview, utils.py:83-119).

    Earlier views own their pixels; later views fill only holes.

    Returns (mask (H,W) int, rgb01 (H,W,3), depth (H,W)).
    """
    k = intrinsic_from_tuple(intrinsic)
    pose_tar = jnp.asarray(pose_tar)
    w2c_tar = jnp.linalg.inv(pose_tar)
    n, h, w = np.asarray(depths).shape

    out_img = jnp.zeros((h, w, 3), jnp.float32)
    out_depth = jnp.zeros((h, w), jnp.float32)
    mask_final = jnp.zeros((h, w), jnp.float32)
    for v in range(n):
        frame = quantize_u8(jnp.asarray(rgbs01[v]))
        m = (
            jnp.asarray(masks[v], jnp.float32)
            if masks is not None
            else jnp.ones((h, w), jnp.float32)
        )
        warped, m2, wdepth, _ = forward_warp(
            frame,
            m,
            jnp.asarray(depths[v]),
            jnp.linalg.inv(jnp.asarray(poses[v])),
            w2c_tar,
            k,
            k,
        )
        m2f = m2.astype(jnp.float32)
        mask_new = m2f * (1.0 - jnp.minimum(mask_final, 1.0))
        # reference accumulates in uint8: truncate the warped contribution
        out_img = out_img * mask_final[..., None] + jnp.floor(warped) * mask_new[..., None]
        out_depth = out_depth * mask_final + wdepth * mask_new
        mask_final = jnp.minimum(mask_final + m2f, 1.0)

    out_img = out_img * mask_final[..., None] + 255.0 * (1.0 - mask_final[..., None])
    return mask_final.astype(jnp.int32), out_img / 255.0, out_depth
