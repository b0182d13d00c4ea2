"""Model tests: feature evaluation vs an independent torch implementation of
the VM decomposition math, plus regularizers and grid ops."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from text2nerf_tpu.models import tensorf as tf


CFG = tf.TensoRFConfig(
    density_n_comp=(4, 4, 4), app_n_comp=(6, 6, 6), app_dim=9,
    shading_mode="MLP_Fea_noview", fea_pe=2, feature_c=16,
)
GRID = (12, 10, 8)
AABB = jnp.array([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])


def _params():
    return tf.init_params(jax.random.PRNGKey(0), CFG, GRID)


def _torch_vm_density(params, xn):
    """Independent torch evaluation of Σ_i Σ_c plane⊙line at normalized
    coords, following the VM-split math (tensoRF.py:205-220)."""
    n = xn.shape[0]
    sigma = torch.zeros(n)
    for i in range(3):
        m0, m1 = tf.MAT_MODE[i]
        v = tf.VEC_MODE[i]
        plane = torch.from_numpy(np.asarray(params["density_planes"][i]))
        line = torch.from_numpy(np.asarray(params["density_lines"][i]))
        g_plane = torch.from_numpy(xn[:, [m0, m1]]).view(1, n, 1, 2)
        g_line = torch.from_numpy(
            np.stack([np.zeros(n, np.float32), xn[:, v]], -1)
        ).view(1, n, 1, 2)
        pf = F.grid_sample(
            plane.permute(2, 0, 1)[None], g_plane, align_corners=True
        ).view(-1, n)
        lf = F.grid_sample(
            line.T[None, :, :, None], g_line, align_corners=True
        ).view(-1, n)
        sigma += (pf * lf).sum(0)
    return sigma.numpy()


def test_density_feature_matches_torch(rng):
    params = _params()
    xn = rng.uniform(-1, 1, (321, 3)).astype(np.float32)
    ours = np.asarray(tf.compute_density_feature(CFG, params, jnp.asarray(xn)))
    ref = _torch_vm_density(params, xn)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_app_feature_matches_torch(rng):
    params = _params()
    xn = rng.uniform(-1, 1, (100, 3)).astype(np.float32)
    ours = np.asarray(tf.compute_app_feature(CFG, params, jnp.asarray(xn)))

    feats = []
    for i in range(3):
        m0, m1 = tf.MAT_MODE[i]
        v = tf.VEC_MODE[i]
        plane = torch.from_numpy(np.asarray(params["app_planes"][i]))
        line = torch.from_numpy(np.asarray(params["app_lines"][i]))
        n = xn.shape[0]
        g_plane = torch.from_numpy(xn[:, [m0, m1]]).view(1, n, 1, 2)
        g_line = torch.from_numpy(
            np.stack([np.zeros(n, np.float32), xn[:, v]], -1)
        ).view(1, n, 1, 2)
        pf = F.grid_sample(
            plane.permute(2, 0, 1)[None], g_plane, align_corners=True
        ).view(-1, n)
        lf = F.grid_sample(
            line.T[None, :, :, None], g_line, align_corners=True
        ).view(-1, n)
        feats.append(pf * lf)
    ref = (
        torch.cat(feats, 0).T @ torch.from_numpy(np.asarray(params["basis"]))
    ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_feature2density():
    feat = jnp.array([-5.0, 0.0, 10.0, 30.0])
    out = np.asarray(tf.feature2density(CFG, feat))
    ref = np.log1p(np.exp(np.minimum(feat - 10.0, 30))) + np.maximum(
        np.asarray(feat) - 10.0 - 30, 0
    )
    np.testing.assert_allclose(out, np.asarray(torch.nn.functional.softplus(
        torch.tensor([-5.0, 0.0, 10.0, 30.0]) - 10.0)), rtol=1e-5, atol=1e-6)


def test_tv_loss_matches_torch(rng):
    params = _params()
    ours = float(tf.tv_loss_density(CFG, params))

    total = 0.0
    for p in params["density_planes"]:
        x = torch.from_numpy(np.asarray(p)).permute(2, 0, 1)[None]
        h, w = x.shape[2], x.shape[3]
        count_h = x.shape[1] * (h - 1) * w
        count_w = x.shape[1] * h * (w - 1)
        h_tv = ((x[:, :, 1:] - x[:, :, :-1]) ** 2).sum()
        w_tv = ((x[:, :, :, 1:] - x[:, :, :, :-1]) ** 2).sum()
        total += float(2 * (h_tv / count_h + w_tv / count_w)) * 1e-2
    np.testing.assert_allclose(ours, total, rtol=1e-5)


def test_upsample_and_resolution_roundtrip():
    params = _params()
    assert tf.grid_resolution(CFG, params) == GRID
    up = tf.upsample_volume_grid(CFG, params, (24, 20, 16))
    assert tf.grid_resolution(CFG, up) == (24, 20, 16)
    assert up["density_planes"][0].shape == (20, 24, 4)  # (grid[m1], grid[m0], C)
    assert up["density_lines"][0].shape == (16, 4)       # axis 2


def test_n_to_reso_and_samples():
    reso = tf.n_to_reso(27_000_000, AABB)
    assert reso == (300, 300, 300)
    # ~259 samples at step_ratio 1.0 (text2nerf_main.py:439, SURVEY §3.5)
    assert tf.default_n_samples(reso, 1.0) == 259


def test_alpha_mask_and_shrink():
    params = _params()
    alpha, new_aabb = tf.update_alpha_mask(CFG, params, AABB, (8, 8, 8))
    assert alpha["volume"].shape == (8, 8, 8)
    assert np.all(np.asarray(new_aabb[0]) <= np.asarray(new_aabb[1]))

    shrunk, corrected, new_size = tf.shrink(
        CFG, params, AABB, jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    )
    assert tf.grid_resolution(CFG, shrunk) == new_size
    assert all(s <= g for s, g in zip(new_size, GRID))


def test_param_group_labels():
    params = _params()
    labels = tf.param_group_labels(params)
    assert labels["basis"] == "network"
    assert set(jax.tree.leaves(labels["mlp"])) == {"network"}
    assert set(jax.tree.leaves(labels["density_planes"])) == {"spatial"}


def test_shrink_cp_crops_lines_and_preserves_field():
    """TensorCP.shrink (tensoRF.py:388-416): crop line factors to the
    snapped AABB; density at interior points is unchanged when evaluated
    against the corrected AABB (grid nodes are preserved by the crop)."""
    cfg = tf.TensoRFConfig(
        model_name="cp", density_n_comp=(8, 8, 8), app_n_comp=(8, 8, 8),
        app_dim=9, fea_pe=2, feature_c=16,
    )
    grid = (17, 13, 9)
    params = tf.init_params(jax.random.PRNGKey(1), cfg, grid)
    shrunk, corrected, new_size = tf.shrink(
        cfg, params, AABB, jnp.array([[-1.0, -0.8, -1.2], [1.0, 1.3, 0.9]])
    )
    assert tf.grid_resolution(cfg, shrunk) == new_size
    assert all(s <= g for s, g in zip(new_size, grid))
    assert "density_planes" not in shrunk  # cp has line factors only

    # interior points: same density before (old aabb) and after (corrected).
    # Sample strictly inside the SNAPPED box (the coarse grid rounds the
    # requested bounds outward/inward by up to one voxel, e.g. -0.8 →
    # -0.667 on the 13-node axis; outside it, clamping legitimately
    # differs).
    rng = np.random.default_rng(3)
    lo = np.asarray(corrected)[0] + 0.1
    hi = np.asarray(corrected)[1] - 0.1
    pts = rng.uniform(lo, hi, (64, 3)).astype(np.float32)
    xn_old = np.asarray(tf.normalize_coord(AABB, jnp.asarray(pts)))
    xn_new = np.asarray(tf.normalize_coord(corrected, jnp.asarray(pts)))
    before = tf.compute_density_feature(cfg, params, jnp.asarray(xn_old))
    after = tf.compute_density_feature(cfg, shrunk, jnp.asarray(xn_new))
    np.testing.assert_allclose(
        np.asarray(after), np.asarray(before), atol=1e-4, rtol=1e-4
    )
    # appearance path too
    before_a = tf.compute_app_feature(cfg, params, jnp.asarray(xn_old))
    after_a = tf.compute_app_feature(cfg, shrunk, jnp.asarray(xn_new))
    np.testing.assert_allclose(
        np.asarray(after_a), np.asarray(before_a), atol=1e-4, rtol=1e-4
    )
