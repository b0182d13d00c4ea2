"""Training-step tests: optimization actually fits a tiny scene."""

import numpy as np
import jax
import jax.numpy as jnp

from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.ops import rays as R
from text2nerf_tpu.engine import train_step as ts


CFG = tf.TensoRFConfig(
    density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
    shading_mode="MLP_Fea_noview", fea_pe=2, feature_c=32,
)
GRID = (32, 32, 32)
AABB = jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]])


def _scene_batch(n=512, seed=0):
    """A toy supervised scene: forward-looking rays hitting a colored wall
    at depth 4."""
    rng = np.random.default_rng(seed)
    h = w = 16
    fx, fy, cx, cy = R.default_intrinsics(h, w)
    dirs = np.asarray(R.ray_directions(h, w, (fx, fy), (cx, cy)))
    o, d = R.rays_from_pose(jnp.asarray(dirs), jnp.eye(4))
    rays = jnp.concatenate([o, d], -1)
    # wall color varies smoothly with pixel position
    uv = dirs.reshape(-1, 3)[:, :2]
    rgb = jnp.asarray(
        np.stack(
            [0.5 + 0.4 * uv[:, 0], 0.5 + 0.4 * uv[:, 1], 0.3 + 0 * uv[:, 0]], -1
        ).astype(np.float32)
    )
    depth = jnp.full((h * w,), 4.0, jnp.float32)
    return {"rays": rays, "rgb": rgb, "depth": depth}


def test_lr_factor():
    # ratio 0.1 over 1000 iters (e_opt.py:62-65)
    f = ts.lr_factor(0.1, 1000)
    np.testing.assert_allclose(f ** 1000, 0.1, rtol=1e-6)


def test_training_fits_toy_scene():
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    state, tx = ts.make_train_state(params, factor=ts.lr_factor(0.1, 400))
    step = ts.make_train_step(
        CFG, tx, n_samples=48, app_k=16, white_bg=True,
        tv_factor=ts.lr_factor(0.1, 400),
    )
    batch = _scene_batch()
    key = jax.random.PRNGKey(1)
    first_psnr = None
    for i in range(120):
        key, k = jax.random.split(key)
        state, metrics = step(state, AABB, batch, k)
        if i == 0:
            first_psnr = float(metrics["psnr"])
    final_psnr = float(metrics["psnr"])
    assert final_psnr > first_psnr + 4.0, (first_psnr, final_psnr)
    assert final_psnr > 18.0, final_psnr
    # depth supervision pulls the surface toward z=4
    assert float(metrics["depth_loss"]) < 1.0


def test_optimizer_groups_move_at_different_rates():
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    state, tx = ts.make_train_state(params, lr_init=0.02, lr_basis=1e-3)
    step = ts.make_train_step(CFG, tx, n_samples=32, app_k=8)
    batch = _scene_batch(seed=1)
    state2, _ = step(state, AABB, batch, jax.random.PRNGKey(2))
    # Adam moves every touched param by ~lr in the first step
    d_spatial = float(
        jnp.abs(state2.params["density_planes"][0] - state.params["density_planes"][0]).max()
    )
    d_net = float(jnp.abs(state2.params["basis"] - state.params["basis"]).max())
    assert d_spatial <= 0.0201 and d_spatial > 1e-4
    assert d_net <= 0.00101


def test_permutation_sampler_covers_pool():
    s = ts.PermutationSampler(100, 32, seed=0)
    seen = set()
    for _ in range(6):
        ids = s.next_ids()
        assert len(ids) == 32
        seen.update(int(i) for i in ids)
    assert len(seen) > 90  # reshuffles cover the pool


def test_depth_loss_type_selection():
    """--type_depth_loss changes the depth term (e_opt.py:20; 'ssi' adds the
    fitted scale/shift to the metrics, text2nerf_main.py:610-611)."""
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    batch = _scene_batch()
    key = jax.random.PRNGKey(2)
    vals = {}
    for kind in ("mse", "ssi", "silog"):
        state, tx = ts.make_train_state(params, factor=1.0)
        step = ts.make_train_step(
            CFG, tx, n_samples=48, app_k=16, white_bg=True,
            depth_loss_type=kind,
        )
        state, metrics = step(state, AABB, batch, key)
        vals[kind] = float(metrics["depth_loss"])
        assert np.isfinite(vals[kind])
        if kind == "ssi":
            assert np.isfinite(float(metrics["ssi_s"]))
            assert np.isfinite(float(metrics["ssi_t"]))
        else:
            assert "ssi_s" not in metrics
    # the three depth objectives measure different things
    assert vals["mse"] != vals["ssi"]
    assert vals["mse"] != vals["silog"]


def test_runtime_decay_matches_embedded_schedule():
    """The runtime-decay train step (unit-LR Adam scaled by the lr_decay
    scalar) reproduces the embedded exponential-decay optimizer exactly:
    after N identical steps the params agree to fp round-off.  The
    trainer relies on this equivalence to reuse ONE executable across
    stage resets (engine/trainer.py reconstruction)."""
    lr_init, lr_basis, factor = 0.02, 1e-3, ts.lr_factor(0.1, 50)
    params = tf.init_params(jax.random.PRNGKey(0), CFG, GRID)
    batch = _scene_batch(seed=3)
    kwargs = dict(n_samples=32, app_k=8, white_bg=True)

    state_e, tx_e = ts.make_train_state(params, lr_init, lr_basis, factor)
    step_e = ts.make_train_step(CFG, tx_e, **kwargs)
    state_r, tx_r = ts.make_train_state(
        params, lr_init, lr_basis, factor, runtime_decay=True
    )
    step_r = ts.make_train_step(
        CFG, tx_r, runtime_decay=True, lr_init=lr_init, lr_basis=lr_basis,
        **kwargs,
    )

    lr_decay = 1.0
    for i in range(6):
        k = jax.random.PRNGKey(100 + i)
        state_e, m_e = step_e(state_e, AABB, batch, k)
        state_r, m_r = step_r(state_r, AABB, batch, k, lr_decay=lr_decay)
        lr_decay *= factor
    np.testing.assert_allclose(
        float(m_e["mse"]), float(m_r["mse"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree.leaves(state_e.params), jax.tree.leaves(state_r.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
