"""Compacted renderer: exactness vs the dense path under an alpha mask."""

import numpy as np
import jax
import jax.numpy as jnp

from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.ops import render as R


CFG = tf.TensoRFConfig(
    density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
    fea_pe=2, feature_c=32,
)
GRID = (24, 24, 24)
AABB = jnp.array([[-4.0, -4.0, -4.0], [4.0, 4.0, 4.0]])


def _field_and_mask():
    """A field dense in a z-slab [2.4, 3.2] and empty elsewhere."""
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    params = dict(params)
    # density line along world z is lines index VEC_MODE.index... axis 2 is
    # handled by line 0 (VEC_MODE=(2,1,0)); make it high in the slab
    line = np.full((24, 4), -3.0, np.float32)
    zs = np.linspace(-4, 4, 24)
    line[(zs > 2.4) & (zs < 3.2)] = 3.0
    params["density_lines"] = (
        jnp.asarray(line),
        jnp.abs(params["density_lines"][1]) + 1.0,
        jnp.abs(params["density_lines"][2]) + 1.0,
    )
    params["density_planes"] = tuple(
        jnp.abs(p) + 1.0 for p in params["density_planes"]
    )
    alpha_mask, _ = tf.update_alpha_mask(CFG, params, AABB, (24, 24, 24))
    return params, alpha_mask


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([np.zeros((n, 3), np.float32), d], -1))


def test_compact_matches_dense_with_mask():
    params, alpha_mask = _field_and_mask()
    rays = _rays()
    dense = R.render_rays(
        CFG, params, AABB, rays, n_samples=64, app_k=32,
        white_bg=True, alpha_mask=alpha_mask,
    )
    compact = R.render_rays_compact(
        CFG, params, AABB, rays, alpha_mask,
        n_samples=64, compact_k=32, app_k=32, white_bg=True,
        feature_dtype="fp32",
    )
    occupancy = float((np.asarray(dense.weights) > 1e-6).sum(-1).max())
    assert occupancy <= 32, occupancy  # K covers all live samples
    np.testing.assert_allclose(
        np.asarray(compact.rgb), np.asarray(dense.rgb), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(compact.depth), np.asarray(dense.depth), atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(compact.acc), np.asarray(dense.acc), atol=2e-3
    )


def test_compact_handles_all_empty_rays():
    params, alpha_mask = _field_and_mask()
    # rays pointing straight up never reach the z-slab
    n = 8
    d = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1))
    rays = jnp.asarray(np.concatenate([np.zeros((n, 3), np.float32), d], -1))
    out = R.render_rays_compact(
        CFG, params, AABB, rays, alpha_mask,
        n_samples=64, compact_k=16, app_k=8, white_bg=True,
    )
    np.testing.assert_allclose(np.asarray(out.rgb), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.acc), 0.0, atol=1e-4)


def test_compact_stride2_bf16_close_to_dense():
    """The production fast path (pool=5 mask -> stride-2 occupancy test +
    bf16 feature lerp) stays within bf16 rounding of the dense fp32 render
    and never drops a live sample (acc only grows or matches)."""
    params, _ = _field_and_mask()
    mask5, _ = tf.update_alpha_mask(CFG, params, AABB, (24, 24, 24), pool=5)
    assert mask5["pool"] == 5
    rays = _rays(seed=3)
    dense = R.render_rays(
        CFG, params, AABB, rays, n_samples=64, app_k=32, white_bg=True,
    )
    fast = R.render_rays_compact(
        CFG, params, AABB, rays, mask5,
        n_samples=64, compact_k=40, app_k=32, white_bg=True,
    )
    np.testing.assert_allclose(
        np.asarray(fast.rgb), np.asarray(dense.rgb), atol=2e-2
    )
    # conservative: the dilated-stride test must not lose opacity
    assert (np.asarray(fast.acc) >= np.asarray(dense.acc) - 2e-2).all()


def test_compact_stride2_fp32_exact_vs_masked_dense():
    """stride-2 with a pool-5 mask reproduces the dense render under the
    same pool-5 mask up to compaction exactness (no bf16)."""
    params, _ = _field_and_mask()
    mask5, _ = tf.update_alpha_mask(CFG, params, AABB, (24, 24, 24), pool=5)
    rays = _rays(seed=4)
    dense = R.render_rays(
        CFG, params, AABB, rays, n_samples=64, app_k=32,
        white_bg=True, alpha_mask=mask5,
    )
    occupancy = float((np.asarray(dense.weights) > 1e-6).sum(-1).max())
    assert occupancy <= 40, occupancy
    fast = R.render_rays_compact(
        CFG, params, AABB, rays, mask5,
        n_samples=64, compact_k=40, app_k=40, white_bg=True,
        feature_dtype="fp32",
    )
    np.testing.assert_allclose(
        np.asarray(fast.rgb), np.asarray(dense.rgb), atol=2e-3
    )


def test_occupancy_stride_guard():
    """Strided occupancy falls back to stride 1 when the mask's extra
    dilation cannot cover the untested samples (ADVICE r2)."""
    params, _ = _field_and_mask()
    mask5, _ = tf.update_alpha_mask(CFG, params, AABB, (24, 24, 24), pool=5)
    # standard config: pool-5 slack (1 mask voxel) covers a 1-step drift
    assert R.occupancy_stride_safe(CFG, params, AABB, mask5, 2)
    # pool-3 masks have no slack beyond the reference's own dilation
    mask3, _ = tf.update_alpha_mask(CFG, params, AABB, (24, 24, 24), pool=3)
    assert not R.occupancy_stride_safe(CFG, params, AABB, mask3, 2)
    # large step_ratio breaks the drift bound -> unsafe
    cfg_big = tf.TensoRFConfig(
        density_n_comp=CFG.density_n_comp, app_n_comp=CFG.app_n_comp,
        app_dim=CFG.app_dim, fea_pe=CFG.fea_pe, feature_c=CFG.feature_c,
        step_ratio=4.0,
    )
    assert not R.occupancy_stride_safe(cfg_big, params, AABB, mask5, 2)
    # unnormalized wide-FOV directions shrink the safe envelope
    assert not R.occupancy_stride_safe(CFG, params, AABB, mask5, 2,
                                       dir_bound=4.0)
    # memoization: second call answers from the dict cache
    assert "_stride_safe" in mask5
    assert R.occupancy_stride_safe(CFG, params, AABB, mask5, 2)


def test_compact_unsafe_stride_renders_stride1():
    """A pool-5 mask with a pathological step_ratio must render identically
    to the explicitly-unstrided path (the guard forces occ_stride=1)."""
    params, _ = _field_and_mask()
    cfg_big = tf.TensoRFConfig(
        density_n_comp=CFG.density_n_comp, app_n_comp=CFG.app_n_comp,
        app_dim=CFG.app_dim, fea_pe=CFG.fea_pe, feature_c=CFG.feature_c,
        step_ratio=4.0,
    )
    mask5, _ = tf.update_alpha_mask(cfg_big, params, AABB, (24, 24, 24), pool=5)
    rays = _rays(32)
    out = R.render_rays_compact(
        cfg_big, params, AABB, rays, mask5,
        n_samples=32, compact_k=16, app_k=16, feature_dtype="fp32",
    )
    mask_nostride = dict(mask5, pool=3)
    ref = R.render_rays_compact(
        cfg_big, params, AABB, rays, mask_nostride,
        n_samples=32, compact_k=16, app_k=16, feature_dtype="fp32",
    )
    np.testing.assert_array_equal(np.asarray(out.rgb), np.asarray(ref.rgb))


# ---------------------------------------------------------------------------
# Channel-fused density+app tables (pack_params_fused): the shade-all
# compact paths (app_k >= compact_k) gather ONE row per sample per factor
# serving both heads — must equal the split-table features exactly.
# ---------------------------------------------------------------------------


def _fused_vs_split(cfg, grid):
    params = tf.init_params(jax.random.PRNGKey(7), cfg, grid)
    xn = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (257, 3)).astype(np.float32)
    )

    def split_fn(p):
        packed = tf.pack_params(cfg, p)
        return (
            tf.compute_density_feature_packed(cfg, packed, xn),
            tf.compute_app_feature_packed(cfg, packed, xn),
        )

    def fused_fn(p):
        return tf.compute_fused_features_packed(
            cfg, tf.pack_params_fused(cfg, p), xn
        )

    sig_s, app_s = split_fn(params)
    sig_f, app_f = fused_fn(params)
    np.testing.assert_allclose(
        np.asarray(sig_f), np.asarray(sig_s), rtol=1e-6, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(app_f), np.asarray(app_s), rtol=1e-6, atol=1e-6
    )

    # gradients w.r.t. the canonical params must agree too (the fused
    # backward scatters into the concatenated table and slices apart)
    def loss_split(p):
        s, a = split_fn(p)
        return jnp.sum(s**2) + jnp.sum(jnp.sin(a))

    def loss_fused(p):
        s, a = fused_fn(p)
        return jnp.sum(s**2) + jnp.sum(jnp.sin(a))

    g_s = jax.grad(loss_split)(params)
    g_f = jax.grad(loss_fused)(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        ),
        g_f, g_s,
    )


def test_fused_features_vm_split():
    # asymmetric per-axis comps exercise the per-plane channel split
    cfg = tf.TensoRFConfig(
        density_n_comp=(4, 6, 8), app_n_comp=(8, 10, 12), app_dim=12,
        fea_pe=2, feature_c=32,
    )
    _fused_vs_split(cfg, (12, 16, 20))


def test_fused_features_cp():
    cfg = tf.TensoRFConfig(
        model_name="cp", density_n_comp=(6, 6, 6), app_n_comp=(10, 10, 10),
        app_dim=12, fea_pe=2, feature_c=32,
    )
    _fused_vs_split(cfg, (12, 16, 20))


def test_fused_features_vm():
    cfg = tf.TensoRFConfig(
        model_name="vm", density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8),
        app_dim=24, fea_pe=2, feature_c=32,
    )
    _fused_vs_split(cfg, (16, 16, 16))


def test_compact_shade_all_matches_topk_subset():
    """app_k == compact_k (the fused shade-all path) must agree with a
    top-K run whose K covers every above-threshold sample (app_k just
    below compact_k exercises the split-table branch)."""
    params, alpha_mask = _field_and_mask()
    rays = _rays(seed=9)
    fused = R.render_rays_compact(
        CFG, params, AABB, rays, alpha_mask,
        n_samples=64, compact_k=32, app_k=32, white_bg=True,
        feature_dtype="fp32",
    )
    topk = R.render_rays_compact(
        CFG, params, AABB, rays, alpha_mask,
        n_samples=64, compact_k=32, app_k=31, white_bg=True,
        feature_dtype="fp32",
    )
    occupancy = (np.asarray(fused.weights) > CFG.raymarch_weight_thres).sum(-1)
    assert occupancy.max() <= 31  # top-31 covers all live samples here
    np.testing.assert_allclose(
        np.asarray(fused.rgb), np.asarray(topk.rgb), rtol=1e-5, atol=1e-5
    )
