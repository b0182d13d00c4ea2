"""Volume-renderer tests: compositing math, masking rules, chunking."""

import numpy as np
import jax
import jax.numpy as jnp

from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.ops import render as render_ops
from text2nerf_tpu.ops import rays as ray_ops


CFG = tf.TensoRFConfig(
    density_n_comp=(4, 4, 4), app_n_comp=(6, 6, 6), app_dim=9,
    shading_mode="MLP_Fea_noview", fea_pe=2, feature_c=16,
)
GRID = (16, 16, 16)
AABB = jnp.array([[-4.0, -4.0, -4.0], [4.0, 4.0, 4.0]])


def _rays(n=32, seed=0):
    rng = np.random.default_rng(seed)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs[:, 2] = np.abs(dirs[:, 2]) + 0.5  # look forward (+z)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    o = np.zeros((n, 3), np.float32)
    return jnp.asarray(np.concatenate([o, dirs], -1))


def test_raw2alpha_matches_reference_math(rng):
    sigma = jnp.asarray(rng.uniform(0, 2, (5, 7)).astype(np.float32))
    dists = jnp.asarray(rng.uniform(0.01, 0.1, (5, 7)).astype(np.float32))
    alpha, weights, bg = render_ops.raw2alpha(sigma, dists)
    a = 1 - np.exp(-np.asarray(sigma) * np.asarray(dists))
    t = np.cumprod(
        np.concatenate([np.ones((5, 1)), 1 - a + 1e-10], -1), -1
    )
    np.testing.assert_allclose(np.asarray(alpha), a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(weights), a * t[:, :-1], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(bg), t[:, -1:], rtol=1e-4, atol=1e-5)
    # weights + background weight partition unity
    np.testing.assert_allclose(
        np.asarray(weights).sum(-1) + np.asarray(bg)[:, 0], 1.0, atol=1e-4
    )


def test_render_rays_shapes_and_ranges():
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    rays = _rays(16)
    out = render_ops.render_rays(
        CFG, params, AABB, rays, n_samples=48, app_k=16, white_bg=True
    )
    assert out.rgb.shape == (16, 3)
    assert out.depth.shape == (16,)
    assert out.weights.shape == (16, 48)
    assert (np.asarray(out.rgb) >= 0).all() and (np.asarray(out.rgb) <= 1).all()
    assert (np.asarray(out.weights) >= 0).all()


def test_empty_field_renders_white_background():
    # density feature 0 → softplus(-10) ≈ 4.5e-5 → alpha ≈ 0 → white bg
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    params = jax.tree.map(jnp.zeros_like, params)
    rays = _rays(8)
    out = render_ops.render_rays(
        CFG, params, AABB, rays, n_samples=32, app_k=8, white_bg=True
    )
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-2)
    assert np.asarray(out.acc).max() < 1e-2


def test_eval_z_mask_kills_near_content():
    """The eval-time z>2 cull (tensorBase.py:458-462): a dense field in
    front of z=2 contributes at eval only beyond z=2."""
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    # make the field uniformly dense by biasing density features up
    params = dict(params)
    params["density_planes"] = tuple(
        jnp.abs(p) + 2.0 for p in params["density_planes"]
    )
    params["density_lines"] = tuple(
        jnp.abs(l) + 2.0 for l in params["density_lines"]
    )
    rays = _rays(8)
    out_eval = render_ops.render_rays(
        CFG, params, AABB, rays, n_samples=64, app_k=16,
        white_bg=True, is_train=False,
    )
    # first surface the eval pass can see is at world z >= 2 (rays whose
    # in-AABB segment never reaches z=2 have all weights masked to 0)
    w = np.asarray(out_eval.weights)
    z_hit = np.asarray(out_eval.z_vals)[np.arange(8), w.argmax(-1)]
    pts_z = np.asarray(rays[:, 5]) * z_hit  # o=0 so sample z = d_z * t
    hit = w.sum(-1) > 1e-4
    assert hit.any()
    assert (pts_z[hit] > 1.9).all()


def test_train_jitter_needs_rng_and_varies():
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    rays = _rays(4)
    o1 = render_ops.render_rays(
        CFG, params, AABB, rays, jax.random.PRNGKey(1),
        n_samples=32, app_k=8, is_train=True, white_bg=True,
    )
    o2 = render_ops.render_rays(
        CFG, params, AABB, rays, jax.random.PRNGKey(2),
        n_samples=32, app_k=8, is_train=True, white_bg=True,
    )
    assert not np.allclose(np.asarray(o1.z_vals), np.asarray(o2.z_vals))


def test_chunked_matches_single_call():
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    rays = _rays(50)
    full = render_ops.render_rays(
        CFG, params, AABB, rays, n_samples=32, app_k=8, white_bg=True
    )
    chunked = render_ops.render_chunked(
        CFG, params, AABB, rays, n_samples=32, chunk=16, app_k=8, white_bg=True
    )
    np.testing.assert_allclose(
        np.asarray(full.rgb), np.asarray(chunked.rgb), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(full.depth), np.asarray(chunked.depth), atol=1e-5
    )


def test_filter_rays_bbox():
    rays_hit = _rays(8)
    mask = np.asarray(render_ops.filter_rays_bbox(AABB, rays_hit))
    assert mask.all()
    # rays far outside pointing away
    o = np.full((4, 3), 100.0, np.float32)
    d = np.tile(np.array([[1.0, 0, 0]], np.float32), (4, 1))
    rays_miss = jnp.asarray(np.concatenate([o, d], -1))
    assert not np.asarray(render_ops.filter_rays_bbox(AABB, rays_miss)).any()


def test_topk_compaction_matches_dense_reference(rng):
    """With K = n_samples, top-K compaction must equal a dense evaluation
    with thresholded appearance (the reference semantics)."""
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    rays = _rays(8)
    a = render_ops.render_rays(
        CFG, params, AABB, rays, n_samples=32, app_k=32, white_bg=True
    )
    b = render_ops.render_rays(
        CFG, params, AABB, rays, n_samples=32, app_k=16, white_bg=True
    )
    # K=16 covers all significant weights here → same image
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=1e-4)


def test_filter_rays_alpha_keeps_hitting_rays():
    """Alpha-branch ray filtering (tensorBase.py:372-404): rays through
    occupied voxels are kept, rays through empty space are dropped, and
    the filter is conservative w.r.t. mask-culled rendering (any ray
    with nonzero masked alpha along it must survive)."""
    # occupancy only in a +z slab: mask volume hand-built
    reso = (16, 16, 16)
    vol = np.zeros(reso, np.float32)
    vol[10:13, :, :] = 1.0  # layout (D, H, W) == (z, y, x): a +z slab
    mask = {"volume": jnp.asarray(vol), "aabb": AABB, "pool": 3}

    # rays straight up +z from inside hit the slab; rays down -z miss it
    o = np.zeros((8, 3), np.float32)
    up = np.tile(np.array([[0, 0, 1.0]], np.float32), (4, 1))
    down = np.tile(np.array([[0, 0, -1.0]], np.float32), (4, 1))
    rays = jnp.asarray(
        np.concatenate([np.concatenate([o[:4], up], -1),
                        np.concatenate([o[4:], down], -1)], 0)
    )
    keep = np.asarray(render_ops.filter_rays_alpha(AABB, rays, mask))
    assert keep[:4].all() and not keep[4:].any(), keep

    # conservativeness vs the masked renderer on random rays
    params = tf.init_params(jax.random.PRNGKey(1), CFG, GRID)
    params = dict(params)
    params["density_planes"] = tuple(p + 1.0 for p in params["density_planes"])
    r = _rays(64, seed=3)
    out = render_ops.render_rays(
        CFG, params, AABB, r, n_samples=48, app_k=16, white_bg=True,
        alpha_mask=mask, eval_z_min=-100.0,
    )
    acc = np.asarray(out.acc)
    keep = np.asarray(render_ops.filter_rays_alpha(AABB, r, mask))
    assert (acc[~keep] < 1e-6).all(), acc[~keep].max()
