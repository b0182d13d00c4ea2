"""Scene-aware eval z-cull (supervised_z_floor + eval_z_min plumbing).

The reference culls world z <= 2 at eval ("Eckert" filter,
tensorBase.py:458-462).  Scene trajectories can place SUPERVISED content
below that plane — the r4c run's view 3 held 24.6% of its GT there and
evaluated at 9.1 dB on a field that carried it at 36.8 dB
(reports/diag_zmin_probe_r4c.json).  These tests pin:
  - the floor computation (min over views of GT-depth world z - margin,
    capped at the reference constant),
  - that eval_z_min reaches the dense, compact, and adaptive eval paths
    through render_chunked (a slab below z=2 is erased at the constant
    and rendered at the scene floor).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.ops import render as R


def _scene_with_depths(depths_split, rays_split):
    v, h, w = depths_split.shape
    return ss.SceneState(
        hw=(h, w), intrinsic=(1.0, 1.0, 0.5, 0.5),
        scene_bbox=np.array([[-4.0] * 3, [4.0] * 3], np.float32),
        near_far=(0.5, 8.0), white_bg=True,
        poses_gen=np.tile(np.eye(4, dtype=np.float32), (v, 1, 1)),
        poses_support=np.tile(np.eye(4, dtype=np.float32), (2, 1, 1)),
        all_rays=np.zeros((0, 6), np.float32),
        all_rgbs=np.zeros((0, 3), np.float32),
        all_depth=np.zeros((0,), np.float32),
        rays_gen_split=rays_split,
        rgbs_gen_split=np.zeros((v, h, w, 3), np.float32),
        depth_gen_split=depths_split,
        masks_gen_split=np.zeros((v, h, w), np.float32),
        rays_support_split=None,
    )


def test_supervised_z_floor_below_reference_constant():
    # 2 views of 2x2; straight +z rays from origin -> world z == depth
    rays = np.zeros((2, 4, 6), np.float32)
    rays[..., 5] = 1.0
    depths = np.stack([
        np.full((2, 2), 3.0, np.float32),
        np.array([[1.4, 2.6], [3.0, 4.0]], np.float32),  # min z 1.4
    ])
    floor = ss.supervised_z_floor(_scene_with_depths(depths, rays))
    assert abs(floor - 1.3) < 1e-6  # 1.4 - 0.1 margin


def test_supervised_z_floor_keeps_reference_constant_when_content_is_deep():
    rays = np.zeros((1, 4, 6), np.float32)
    rays[..., 5] = 1.0
    depths = np.full((1, 2, 2), 3.5, np.float32)
    assert ss.supervised_z_floor(_scene_with_depths(depths, rays)) == 2.0


def test_supervised_z_floor_uses_ray_geometry_not_raw_depth():
    # ray origin at z=2: world z = 2 + depth, so depth 0.5 -> z 2.5 (deep)
    rays = np.zeros((1, 4, 6), np.float32)
    rays[..., 2] = 2.0
    rays[..., 5] = 1.0
    depths = np.full((1, 2, 2), 0.5, np.float32)
    assert ss.supervised_z_floor(_scene_with_depths(depths, rays)) == 2.0


CFG = tf.TensoRFConfig(
    density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
    fea_pe=2, feature_c=32,
)
GRID = (24, 24, 24)
AABB = jnp.array([[-4.0, -4.0, -4.0], [4.0, 4.0, 4.0]])


def _low_slab_field():
    """Dense slab at world z in [1.2, 1.6] — BELOW the reference cull."""
    params = dict(tf.init_params(jax.random.PRNGKey(0), CFG, GRID))
    line = np.full((24, 4), -3.0, np.float32)
    zs = np.linspace(-4, 4, 24)
    line[(zs > 1.2) & (zs < 1.6)] = 3.0
    params["density_lines"] = (
        jnp.asarray(line),
        jnp.abs(params["density_lines"][1]) + 1.0,
        jnp.abs(params["density_lines"][2]) + 1.0,
    )
    params["density_planes"] = tuple(
        jnp.abs(p) + 1.0 for p in params["density_planes"]
    )
    alpha_mask, _ = tf.update_alpha_mask(CFG, params, AABB, GRID)
    return params, alpha_mask


def _z_rays(n=64):
    rays = np.zeros((n, 6), np.float32)
    rays[:, 0] = np.linspace(-1.0, 1.0, n)  # spread in x
    rays[:, 5] = 1.0
    return jnp.asarray(rays)


def _acc(out):
    return float(jnp.mean(jnp.sum(out.weights, -1)))


def test_eval_z_min_reaches_dense_compact_and_adaptive_paths():
    params, alpha_mask = _low_slab_field()
    rays = _z_rays()
    for compact_k in (0, 16, -1):
        kw = dict(n_samples=64, chunk=32, app_k=16, alpha_mask=alpha_mask)
        erased = R.render_chunked(CFG, params, AABB, rays,
                                  compact_k=compact_k, **kw)
        kept = R.render_chunked(CFG, params, AABB, rays,
                                compact_k=compact_k, eval_z_min=1.0, **kw)
        # constant cull (2.0) erases the slab -> white bg, zero acc;
        # the scene floor renders it
        assert _acc(erased) < 1e-3, compact_k
        assert _acc(kept) > 0.5, compact_k
        assert float(jnp.mean(erased.rgb)) > 0.99, compact_k
