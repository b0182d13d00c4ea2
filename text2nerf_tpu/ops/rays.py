"""Camera-ray generation and projection primitives (pure JAX).

Implements the ray conventions of the reference pipeline
(/root/reference/dataLoader/ray_utils.py:24-126) as batched, jit-friendly
functions.  The camera model is a pinhole with the reference convention:
view direction +z, image y down, i.e. direction for pixel (i, j) is
``[(i + .5 - cx)/fx, (j + .5 - cy)/fy, 1]`` (ray_utils.py:24-42, the +0.5
comes from kornia's create_meshgrid + 0.5 at ray_utils.py:34).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def pixel_centers(h: int, w: int, dtype=jnp.float32):
    """Pixel-center coordinate grids ``(i, j)`` of shape (h, w).

    ``i`` is the x/column coordinate, ``j`` the y/row coordinate, both offset
    by +0.5 to pixel centers (ray_utils.py:34).
    """
    j, i = jnp.meshgrid(
        jnp.arange(h, dtype=dtype) + 0.5,
        jnp.arange(w, dtype=dtype) + 0.5,
        indexing="ij",
    )
    return i, j


@functools.partial(
    jax.jit, static_argnums=(0, 1), static_argnames=("normalize",)
)
def ray_directions(h: int, w: int, focal, center=None, normalize: bool = True):
    """Per-pixel ray directions in camera coordinates, shape (h, w, 3).

    Mirrors get_ray_directions (ray_utils.py:24-42) followed by the L2
    normalization done at the call site (scene_gen.py:45).

    Args:
      focal: (fx, fy) focal lengths in pixels.
      center: (cx, cy) principal point; defaults to (w/2, h/2).
      normalize: L2-normalize directions (the scene-gen pipeline always does).
    """
    fx, fy = focal[0], focal[1]
    if center is None:
        cx, cy = w / 2.0, h / 2.0
    else:
        cx, cy = center[0], center[1]
    i, j = pixel_centers(h, w)
    dirs = jnp.stack([(i - cx) / fx, (j - cy) / fy, jnp.ones_like(i)], axis=-1)
    if normalize:
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return dirs


@functools.partial(jax.jit, static_argnums=(0, 1))
def ray_directions_blender(h: int, w: int, focal, center=None):
    """Blender-convention directions (y up, view -z), (ray_utils.py:45-63)."""
    fx, fy = focal[0], focal[1]
    if center is None:
        cx, cy = w / 2.0, h / 2.0
    else:
        cx, cy = center[0], center[1]
    i, j = pixel_centers(h, w)
    return jnp.stack(
        [(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1
    )


@jax.jit
def rays_from_pose(directions, c2w):
    """World-space ray origins and directions for one camera.

    Mirrors get_rays (ray_utils.py:66-87): rotate camera-space directions by
    c2w[:3,:3] (directions are NOT re-normalized here) and broadcast the
    camera origin.

    Args:
      directions: (..., 3) camera-space directions.
      c2w: (4, 4) or (3, 4) camera-to-world matrix.

    Returns:
      rays_o, rays_d: each (N, 3) with N = prod of leading dims.
    """
    rays_d = jnp.matmul(
        directions, c2w[:3, :3].T, precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)


@jax.jit
def rays_from_poses(directions, c2ws):
    """Batched rays for many cameras: returns (V, H*W, 6) [o|d] arrays."""

    def one(c2w):
        o, d = rays_from_pose(directions, c2w)
        return jnp.concatenate([o, d], axis=-1)

    return jax.vmap(one)(c2ws)


def rays_split_np(poses, intrinsic, h: int, w: int) -> "np.ndarray":
    """Host-numpy mirror of ``ray_directions`` + ``rays_from_poses``.

    Returns (V, H*W, 6) [o|d] float32 — the training-pool layout.  Same
    math as the jax path (pixel centers +0.5, fp32 L2-normalized
    directions, rotation at float64 ≈ Precision.HIGHEST), computed on the
    host: the pool builders consume numpy, and a device round-trip here
    costs a ~2 s HBM→host transfer per support set on the tunneled
    single-chip setup (PERF.md round 3).  Golden-tested against the jax
    version (tests/test_rays.py).
    """
    fx, fy, cx, cy = (float(x) for x in intrinsic)
    jj, ii = np.meshgrid(
        np.arange(h, dtype=np.float32) + 0.5,
        np.arange(w, dtype=np.float32) + 0.5,
        indexing="ij",
    )
    dirs = np.stack(
        [(ii - cx) / fx, (jj - cy) / fy, np.ones_like(ii)], axis=-1
    ).reshape(-1, 3)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs64 = dirs.astype(np.float64)
    poses = np.asarray(poses, np.float64).reshape(-1, *np.asarray(poses).shape[-2:])
    out = np.empty((poses.shape[0], h * w, 6), np.float32)
    for v in range(poses.shape[0]):
        out[v, :, 0:3] = poses[v, :3, 3].astype(np.float32)
        out[v, :, 3:6] = (dirs64 @ poses[v, :3, :3].T).astype(np.float32)
    return out


@functools.partial(
    jax.jit, static_argnums=(0, 1), static_argnames=("blender",)
)
def ndc_rays(h: int, w: int, focal, near, rays_o, rays_d, blender: bool = False):
    """Project rays to NDC space (ray_utils.py:90-126).

    ``blender=True`` selects the sign convention of ndc_rays_blender
    (ray_utils.py:90-107); otherwise ndc_rays (ray_utils.py:109-126).
    """
    sgn = -1.0 if blender else 1.0
    if blender:
        t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    else:
        t = (near - rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = sgn / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = sgn / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 - sgn * 2.0 * near / rays_o[..., 2]
    d0 = sgn / (w / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = sgn / (h / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = sgn * 2.0 * near / rays_o[..., 2]
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)


def intrinsic_matrix(fx, fy, cx, cy, dtype=jnp.float32):
    """3x3 pinhole intrinsic matrix."""
    return jnp.array(
        [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=dtype
    )


def default_intrinsics(h: int, w: int):
    """The scene-gen intrinsics rule: f = max(H, W), c = (W//2, H//2).

    Mirrors scene_gen.py:229-237 (the normalize/rescale round-trip there is
    an identity, leaving fx = fy = max(H, W)).
    """
    f = float(max(h, w))
    return f, f, float(w // 2), float(h // 2)


@jax.jit
def aabb_slab_entry(rays_o, rays_d, aabb, near, far):
    """Per-ray AABB entry parameter t_min, clamped to [near, far].

    Mirrors the slab test in sample_ray (tensorBase.py:304-311): zero
    direction components are replaced with 1e-6 before division.
    """
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.minimum(rate_a, rate_b).max(axis=-1)
    return jnp.clip(t_min, near, far)


@jax.jit
def aabb_slab_interval(rays_o, rays_d, aabb):
    """(t_min, t_max) of the ray/AABB intersection (tensorBase.py:385-391)."""
    vec = jnp.where(rays_d == 0, 1e-6, rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.minimum(rate_a, rate_b).max(axis=-1)
    t_max = jnp.maximum(rate_a, rate_b).min(axis=-1)
    return t_min, t_max


def ndc_bbox(all_rays):
    """AABB of the ray near/far points in NDC space (ndc_bbox,
    ray_utils.py:269-275)."""
    o = all_rays[..., :3].reshape(-1, 3)
    far = (all_rays[..., :3] + all_rays[..., 3:6]).reshape(-1, 3)
    lo = jnp.minimum(o.min(axis=0), far.min(axis=0))
    hi = jnp.maximum(o.max(axis=0), far.max(axis=0))
    return jnp.stack([lo, hi])


def depth2dist(z_vals, cos_angle):
    """Sample depths → inter-sample distances scaled by ray angle
    (ray_utils.py:9-15)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], -1
    )
    return dists * cos_angle[..., None]


def ndc2dist(ndc_pts, cos_angle):
    """NDC point chain → distances (ray_utils.py:18-21)."""
    dists = jnp.linalg.norm(ndc_pts[:, 1:] - ndc_pts[:, :-1], axis=-1)
    return jnp.concatenate([dists, 1e10 * cos_angle[..., None]], -1)


@functools.partial(jax.jit, static_argnames=("n_samples", "lindisp"))
def ray_marcher(
    rays, n_samples: int = 64, lindisp: bool = False, perturb: float = 0.0,
    bbox=None, rng=None,
):
    """Near/far stratified point sampling (ray_marcher, ray_utils.py:184-228).

    rays: (N, 8) [o | d | near | far]; with ``bbox`` the near/far come from
    the AABB intersection (dda, ray_utils.py:174-181).
    """
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    if bbox is not None:
        t_min, t_max = aabb_slab_interval(rays_o, rays_d, jnp.asarray(bbox))
        near, far = t_min[:, None], t_max[:, None]
    else:
        near, far = rays[:, 6:7], rays[:, 7:8]

    z_steps = jnp.linspace(0.0, 1.0, n_samples)
    if not lindisp:
        z_vals = near * (1 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1 - z_steps) + 1.0 / far * z_steps)
    z_vals = jnp.broadcast_to(z_vals, (rays.shape[0], n_samples))

    if perturb > 0 and rng is not None:
        mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], -1)
        lower = jnp.concatenate([z_vals[:, :1], mids], -1)
        u = jax.random.uniform(rng, z_vals.shape)
        z_vals = lower + (upper - lower) * perturb * u

    xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    return xyz, rays_o, rays_d, z_vals


@functools.partial(jax.jit, static_argnums=(2,))
def sample_pdf(bins, weights, n_samples: int, rng=None):
    """Hierarchical inverse-CDF sampling (ray_utils.py:129-171).

    Deterministic (midpoint-free linspace) when ``rng`` is None.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)

    if rng is None:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples)
    ).reshape(u.shape)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)
