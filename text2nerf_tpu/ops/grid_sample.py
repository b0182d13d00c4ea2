"""Bilinear/trilinear grid gathers — the TPU replacement for F.grid_sample.

The reference's hot op is ``F.grid_sample(plane[1,C,H,W], coords[1,N,1,2],
align_corners=True)`` (tensoRF.py:205-239).  Here planes are stored
channels-last ``[H, W, C]`` so each gather pulls a contiguous C-vector row
from HBM, and the four corner gathers + lerp fuse into the surrounding
computation under XLA.

All functions use align_corners=True semantics: a normalized coordinate
``u in [-1, 1]`` maps to pixel ``(u + 1) / 2 * (size - 1)``.  Coordinates are
clamped to the valid range (the callers mask out-of-AABB samples anyway).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(u, size: int):
    return (u + 1.0) * 0.5 * (size - 1)


def grid_sample_2d(plane, x, y):
    """Bilinearly sample ``plane`` at normalized coords.

    Args:
      plane: (H, W, C) feature plane.
      x: (N,) normalized coords in [-1, 1] indexing W.
      y: (N,) normalized coords in [-1, 1] indexing H.

    Returns:
      (N, C) sampled features.
    """
    h, w, c = plane.shape
    fx = _unnormalize(x, w)
    fy = _unnormalize(y, h)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    tx = jnp.clip(fx - x0.astype(fx.dtype), 0.0, 1.0)[:, None]
    ty = jnp.clip(fy - y0.astype(fy.dtype), 0.0, 1.0)[:, None]

    flat = plane.reshape(h * w, c)
    f00 = jnp.take(flat, y0 * w + x0, axis=0)
    f01 = jnp.take(flat, y0 * w + x1, axis=0)
    f10 = jnp.take(flat, y1 * w + x0, axis=0)
    f11 = jnp.take(flat, y1 * w + x1, axis=0)

    top = f00 * (1.0 - tx) + f01 * tx
    bot = f10 * (1.0 - tx) + f11 * tx
    return top * (1.0 - ty) + bot * ty


def grid_sample_1d(line, y):
    """Linearly sample a feature line.

    Args:
      line: (L, C) feature line.
      y: (N,) normalized coords in [-1, 1] indexing L.

    Returns:
      (N, C) sampled features.
    """
    l, c = line.shape
    fy = _unnormalize(y, l)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, l - 1)
    y1 = jnp.minimum(y0 + 1, l - 1)
    ty = jnp.clip(fy - y0.astype(fy.dtype), 0.0, 1.0)[:, None]
    f0 = jnp.take(line, y0, axis=0)
    f1 = jnp.take(line, y1, axis=0)
    return f0 * (1.0 - ty) + f1 * ty


def grid_sample_3d(volume, x, y, z):
    """Trilinearly sample a volume (used by the alpha-grid mask,
    tensorBase.py:52-56).

    Args:
      volume: (D, H, W) or (D, H, W, C) volume; grid_sample convention
        maps coordinate (x, y, z) to (W, H, D) axes respectively.
      x, y, z: (N,) normalized coords in [-1, 1].

    Returns:
      (N,) or (N, C) sampled values.
    """
    squeeze = volume.ndim == 3
    if squeeze:
        volume = volume[..., None]
    d, h, w, c = volume.shape
    fx = _unnormalize(x, w)
    fy = _unnormalize(y, h)
    fz = _unnormalize(z, d)
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, h - 1)
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, d - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    z1 = jnp.minimum(z0 + 1, d - 1)
    tx = jnp.clip(fx - x0.astype(fx.dtype), 0.0, 1.0)[:, None]
    ty = jnp.clip(fy - y0.astype(fy.dtype), 0.0, 1.0)[:, None]
    tz = jnp.clip(fz - z0.astype(fz.dtype), 0.0, 1.0)[:, None]

    flat = volume.reshape(d * h * w, c)

    def take(zi, yi, xi):
        return jnp.take(flat, (zi * h + yi) * w + xi, axis=0)

    c00 = take(z0, y0, x0) * (1 - tx) + take(z0, y0, x1) * tx
    c01 = take(z0, y1, x0) * (1 - tx) + take(z0, y1, x1) * tx
    c10 = take(z1, y0, x0) * (1 - tx) + take(z1, y0, x1) * tx
    c11 = take(z1, y1, x0) * (1 - tx) + take(z1, y1, x1) * tx
    c0 = c00 * (1 - ty) + c01 * ty
    c1 = c10 * (1 - ty) + c11 * ty
    out = c0 * (1 - tz) + c1 * tz
    return out[:, 0] if squeeze else out


def resize_bilinear_align_corners(img, out_h: int, out_w: int):
    """align_corners=True bilinear resize of an (H, W, C) image.

    The TPU equivalent of ``F.interpolate(mode='bilinear',
    align_corners=True)`` used by TensoRF grid upsampling
    (tensoRF.py:243-256).
    """
    ys = jnp.linspace(-1.0, 1.0, out_h)
    xs = jnp.linspace(-1.0, 1.0, out_w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    out = grid_sample_2d(img, gx.reshape(-1), gy.reshape(-1))
    return out.reshape(out_h, out_w, img.shape[-1])


def resize_linear_align_corners(line, out_l: int):
    """align_corners=True linear resize of an (L, C) feature line."""
    ys = jnp.linspace(-1.0, 1.0, out_l)
    return grid_sample_1d(line, ys)
