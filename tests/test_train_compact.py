"""Alpha-mask TRAIN compaction: exactness of render_rays_train_compact and
the compacted train step vs the dense path (render.py, train_step.py).

The compact path materializes only the first K mask-live samples per ray;
with a fully-permissive mask and K = n_samples it must reproduce the dense
unmasked step bit-for-bit modulo fp reassociation (same rng stream, same
sample positions, same losses with the full-S transmittance denominator).
"""

import numpy as np
import jax
import pytest
import jax.numpy as jnp

from text2nerf_tpu.engine import train_step as ts
from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.ops import render as R


CFG = tf.TensoRFConfig(
    density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
    fea_pe=2, feature_c=32,
)
GRID = (24, 24, 24)
AABB = jnp.array([[-4.0, -4.0, -4.0], [4.0, 4.0, 4.0]])
S = 64


def _params(seed=0):
    return tf.init_params(jax.random.PRNGKey(seed), CFG, GRID)


def _slab_field_and_mask(pool=3):
    """A field dense in a z-slab and empty elsewhere (test_render_compact)."""
    params = dict(_params())
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
    mask, _ = tf.update_alpha_mask(CFG, params, AABB, (24, 24, 24), pool=pool)
    return params, mask


def _ones_mask(pool=5):
    """Fully-permissive mask: every sample is live."""
    return {
        "volume": jnp.ones((24, 24, 24), jnp.float32),
        "aabb": AABB,
        "pool": pool,
    }


def _rays(n=64, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([np.zeros((n, 3), np.float32), d], -1))


def _batch(n=64, seed=0):
    rng = np.random.default_rng(seed + 100)
    return {
        "rays": _rays(n, seed),
        "rgb": jnp.asarray(rng.uniform(size=(n, 3)).astype(np.float32)),
        "depth": jnp.asarray(
            rng.uniform(2.0, 4.0, size=(n,)).astype(np.float32)
        ),
    }


def test_train_compact_full_mask_matches_dense_render():
    """All-live mask + K = S: the compact TRAIN render equals the dense
    unmasked train render exactly (same rng stream -> same jitter)."""
    params = _params()
    rays = _rays()
    key = jax.random.PRNGKey(3)
    dense = R.render_rays(
        CFG, params, AABB, rays, key, n_samples=S, app_k=32, is_train=True,
        white_bg=True,
    )
    compact = R.render_rays_train_compact(
        CFG, params, AABB, rays, _ones_mask(), key, n_samples=S,
        compact_k=S, app_k=32, white_bg=True, density_group=1,
    )
    np.testing.assert_allclose(
        np.asarray(compact.rgb), np.asarray(dense.rgb), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(compact.depth), np.asarray(dense.depth), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(compact.weights), np.asarray(dense.weights), atol=1e-6
    )


def test_train_compact_grouped_close_to_dense():
    """density_group=2 (one gathered block row per sample pair) matches up
    to fp reassociation of the weighted contraction."""
    params = _params()
    rays = _rays(seed=5)
    key = jax.random.PRNGKey(7)
    block = tf.grouping_block(AABB, GRID, CFG.step_ratio, group=2)
    assert block, "fixture config must license grouping"
    dense = R.render_rays(
        CFG, params, AABB, rays, key, n_samples=S, app_k=32, is_train=True,
        white_bg=True,
    )
    compact = R.render_rays_train_compact(
        CFG, params, AABB, rays, _ones_mask(pool=5), key, n_samples=S,
        compact_k=S, app_k=32, white_bg=True, density_group=2,
        density_block=block,
    )
    np.testing.assert_allclose(
        np.asarray(compact.rgb), np.asarray(dense.rgb), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(compact.depth), np.asarray(dense.depth), atol=1e-3
    )


def test_train_compact_tight_mask_matches_masked_dense():
    """Slab mask (pool=3 -> occ stride 1), K covering all live samples:
    compact selection reproduces dense masked culling
    (tensorBase.py:451-456)."""
    params, mask = _slab_field_and_mask(pool=3)
    rays = _rays(seed=6)
    key = jax.random.PRNGKey(11)
    dense = R.render_rays(
        CFG, params, AABB, rays, key, n_samples=S, app_k=32, is_train=True,
        white_bg=True, alpha_mask=mask,
    )
    live_max = int((np.asarray(dense.weights) > 1e-6).sum(-1).max())
    assert live_max <= 32, live_max
    compact = R.render_rays_train_compact(
        CFG, params, AABB, rays, mask, key, n_samples=S,
        compact_k=32, app_k=32, white_bg=True, density_group=1,
    )
    np.testing.assert_allclose(
        np.asarray(compact.rgb), np.asarray(dense.rgb), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(compact.depth), np.asarray(dense.depth), atol=2e-2
    )


def test_train_step_compact_matches_dense_grads():
    """make_train_step(compact_k=S) with an all-live mask produces the same
    loss metrics and parameter update as the dense step (g=1, fp32)."""
    params = _params(seed=2)
    batch = _batch()
    key = jax.random.PRNGKey(13)
    aabb = AABB

    state_d, tx_d = ts.make_train_state(params)
    step_dense = ts.make_train_step(
        CFG, tx_d, n_samples=S, app_k=32, white_bg=True, density_group=1,
    )
    new_d, m_d = step_dense(state_d, aabb, batch, key, 1.0)

    state_c, tx_c = ts.make_train_state(params)
    step_compact = ts.make_train_step(
        CFG, tx_c, n_samples=S, app_k=32, white_bg=True, density_group=1,
        compact_k=S,
    )
    new_c, m_c = step_compact(state_c, aabb, batch, key, 1.0,
                              alpha_mask=_ones_mask())

    for k in ("mse", "depth_loss", "transmit_loss"):
        np.testing.assert_allclose(
            float(m_c[k]), float(m_d[k]), rtol=1e-5, atol=1e-7
        )
    for a, b in zip(
        jax.tree.leaves(new_c.params), jax.tree.leaves(new_d.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_train_step_compact_microbatched_runs():
    """Microbatch scan + grouped compact gathers + tight mask: finite
    losses and a changed parameter tree."""
    params, mask = _slab_field_and_mask(pool=5)
    batch = _batch(n=64, seed=9)
    key = jax.random.PRNGKey(17)
    block = tf.grouping_block(AABB, GRID, CFG.step_ratio, group=2)
    state, tx = ts.make_train_state(params)
    step = ts.make_train_step(
        CFG, tx, n_samples=S, app_k=16, white_bg=True, density_group=2,
        density_block=block, microbatch=2, compact_k=16,
    )
    new, m = step(state, AABB, batch, key, 1.0, alpha_mask=mask)
    assert np.isfinite(float(m["mse"]))
    assert np.isfinite(float(m["psnr"]))
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(new.params), jax.tree.leaves(state.params)
        )
    )
    assert changed


def test_microbatch_compact_specialization():
    """microbatch_compact only governs the MASKED specialization: with a
    mask the step is bit-identical to a microbatch=1 build (same trace,
    same rng stream); without a mask it is bit-identical to a plain
    microbatch=R dense build."""
    params, mask = _slab_field_and_mask(pool=5)
    batch = _batch(n=64, seed=21)
    key = jax.random.PRNGKey(29)
    state, tx = ts.make_train_state(params)
    step_ab = ts.make_train_step(
        CFG, tx, n_samples=S, app_k=16, white_bg=True,
        microbatch=4, microbatch_compact=1, compact_k=16,
    )
    step_r1 = ts.make_train_step(
        CFG, tx, n_samples=S, app_k=16, white_bg=True,
        microbatch=1, compact_k=16,
    )
    new_a, m_a = step_ab(state, AABB, batch, key, 1.0, alpha_mask=mask)
    new_b, m_b = step_r1(state, AABB, batch, key, 1.0, alpha_mask=mask)
    assert float(m_a["mse"]) == float(m_b["mse"])
    for x, y in zip(
        jax.tree.leaves(new_a.params), jax.tree.leaves(new_b.params)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    step_r4 = ts.make_train_step(
        CFG, tx, n_samples=S, app_k=16, white_bg=True,
        microbatch=4, compact_k=16,
    )
    new_c, m_c = step_ab(state, AABB, batch, key, 1.0)
    new_d, m_d = step_r4(state, AABB, batch, key, 1.0)
    assert float(m_c["mse"]) == float(m_d["mse"])
    for x, y in zip(
        jax.tree.leaves(new_c.params), jax.tree.leaves(new_d.params)
    ):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_train_step_dense_ignores_mask_when_disabled():
    """compact_k=0 steps must ignore a passed mask (dense path)."""
    params = _params(seed=4)
    batch = _batch(n=32, seed=3)
    key = jax.random.PRNGKey(23)
    state, tx = ts.make_train_state(params)
    step = ts.make_train_step(CFG, tx, n_samples=S, app_k=16, white_bg=True)
    new_a, m_a = step(state, AABB, batch, key, 1.0)
    state_b, _ = ts.make_train_state(params)
    new_b, m_b = step(state_b, AABB, batch, key, 1.0,
                      alpha_mask=_ones_mask())
    np.testing.assert_array_equal(
        np.asarray(new_a.params["basis"]), np.asarray(new_b.params["basis"])
    )
    assert float(m_a["mse"]) == float(m_b["mse"])


def test_train_compact_wrapper_guard():
    """The public wrapper refuses density_group=2 with a pool-3 mask (the
    dilation cannot license the group-strided occupancy test)."""
    params, mask3 = _slab_field_and_mask(pool=3)
    rays = _rays(8)
    key = jax.random.PRNGKey(0)
    try:
        R.render_rays_train_compact(
            CFG, params, AABB, rays, mask3, key, n_samples=S,
            compact_k=16, app_k=8, density_group=2, density_block=3,
        )
    except ValueError:
        pass
    else:
        raise AssertionError("expected ValueError for unlicensed stride")


# ---------------------------------------------------------------------------
# Depth-band mask stamping (train-compaction soundness, PERF.md round 3)
# ---------------------------------------------------------------------------


def test_stamp_alpha_mask_marks_depth_band():
    mask = {
        "volume": jnp.zeros((24, 24, 24), jnp.float32),
        "aabb": AABB, "pool": 5,
    }
    # one +z ray from the origin, supervised depth 2.0 → world point
    # (0, 0, 2): voxel (x=11..12, y=11..12, z=18)
    rays = np.array([[0, 0, -2, 0, 0, 1.0]], np.float32)
    depth = np.array([4.0], np.float32)  # o + d*4 = (0,0,2)
    out = tf.stamp_alpha_mask(mask, rays, depth, band_voxels=1)
    vol = np.asarray(out["volume"])  # [z, y, x]
    assert out["pool"] == 5
    iz = round((2.0 + 4) / 8 * 23)   # z=2 → index 17
    assert vol[iz, 12, 12] == 1.0
    # dilation: band(1) + pool radius(2) = ±3 voxels
    assert vol[iz - 3, 12, 12] == 1.0 and vol[iz + 3, 12, 12] == 1.0
    assert vol[iz, 12 + 3, 12] == 1.0
    # far away stays dead
    assert vol[2, 12, 12] == 0.0 and vol[iz, 2, 2] == 0.0
    # original mask untouched
    assert float(np.asarray(mask["volume"]).sum()) == 0.0


def test_stamp_empty_pool_is_identity():
    mask = _ones_mask()
    out = tf.stamp_alpha_mask(
        mask, np.zeros((0, 6), np.float32), np.zeros((0,), np.float32)
    )
    assert out is mask


def test_compacted_step_grows_content_only_with_stamp():
    """The round-3 quality collapse, reduced: content at a depth the mask
    marks dead cannot be learned by the compacted step; stamping the
    supervised depth band restores growth (tf.stamp_alpha_mask)."""
    params, mask = _slab_field_and_mask(pool=5)  # live only in z∈(2.4,3.2)
    rays = np.array(_rays(64))
    rays[:, :3] = [0.0, 0.0, -3.9]
    rays[:, 3:] = [0.0, 0.0, 1.0]
    rays = jnp.asarray(rays)
    # supervise content at z = -2 (depth 1.9 from o) — dead in the mask
    batch = {
        "rays": rays,
        "rgb": jnp.full((64, 3), 0.2, jnp.float32),
        "depth": jnp.full((64,), 1.9, jnp.float32),
    }
    w = ts.LossWeights(depth=1.0, transmittance=0.0, tv_density=0, tv_app=0)

    def fit(m):
        state, tx = ts.make_train_state(params, lr_init=0.05, factor=1.0)
        step = ts.make_train_step(
            CFG, tx, n_samples=S, app_k=16, white_bg=True, weights=w,
            compact_k=32,
        )
        key = jax.random.PRNGKey(0)
        metrics = None
        for i in range(40):
            key, k = jax.random.split(key)
            state, metrics = step(state, AABB, batch, k, alpha_mask=m)
        return float(metrics["depth_loss"])

    loss_frozen = fit(mask)
    stamped = tf.stamp_alpha_mask(
        mask, np.asarray(rays), np.full((64,), 1.9, np.float32)
    )
    loss_stamped = fit(stamped)
    # frozen support: the depth loss cannot move toward the dead region
    assert loss_stamped < 0.25 * loss_frozen, (loss_frozen, loss_stamped)


def test_stamp_selection_shapes_bucket_to_powers_of_two(monkeypatch):
    """Pool sizes vary per view; the stamp's jit shape must not (review
    r3): selection sizes round UP to a power of two so a handful of
    _stamp_volume specializations serve every view."""
    seen = []
    real = tf._stamp_volume

    def spy(vol, aabb, rays, depth, **kw):
        seen.append(rays.shape[0])
        return real(vol, aabb, rays, depth, **kw)

    monkeypatch.setattr(tf, "_stamp_volume", spy)
    mask = {
        "volume": jnp.zeros((8, 8, 8), jnp.float32),
        "aabb": AABB, "pool": 3,
    }
    for n in (3, 5, 700, 900, 1024):
        rays = np.tile([[0, 0, -2, 0, 0, 1.0]], (n, 1)).astype(np.float32)
        tf.stamp_alpha_mask(mask, rays, np.full((n,), 4.0, np.float32))
    assert seen == [4, 8, 1024, 1024, 1024]
    # duplicates from the padded linspace are harmless (max-reduction):
    # a 1-ray pool stamps the same voxels as the same ray twice
    one = tf.stamp_alpha_mask(
        mask, np.array([[0, 0, -2, 0, 0, 1.0]], np.float32),
        np.array([4.0], np.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(one["volume"]),
        np.asarray(tf.stamp_alpha_mask(
            mask, np.tile([[0, 0, -2, 0, 0, 1.0]], (2, 1)).astype(np.float32),
            np.full((2,), 4.0, np.float32),
        )["volume"]),
    )


def test_train_step_guard_matches_wrapper(monkeypatch):
    """make_train_step must enforce the same stride license the public
    render wrapper does (review r3: the compact branch called the private
    renderer with occ_stride=group and no occupancy_stride_safe check)."""
    from text2nerf_tpu.engine import train_step as ts

    params, mask3 = _slab_field_and_mask(pool=3)
    state, tx = ts.make_train_state(params)
    step = ts.make_train_step(
        CFG, tx, n_samples=S, app_k=8, density_group=2, density_block=3,
        compact_k=16,
    )
    rays = _rays(8)
    batch = {
        "rays": rays,
        "rgb": jnp.zeros((8, 3), jnp.float32),
        "depth": jnp.full((8,), 4.0, jnp.float32),
    }
    with pytest.raises(ValueError, match="pool dilation"):
        step(state, AABB, batch, jax.random.PRNGKey(0), alpha_mask=mask3)


# ---------------------------------------------------------------------------
# Depth-anchored compaction (round 4): the first-K-live window can end
# before a ray's supervised depth once the mask densifies; anchoring the
# window to END at depth_gt + band guarantees the surface is rendered.
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("impl", ["sort", "topk", "rank"])
def test_last_k_live_matches_numpy_oracle(impl):
    rng = np.random.default_rng(11)
    live = rng.uniform(size=(32, 48)) < 0.3
    k = 8
    idx, sel = R.last_k_live(jnp.asarray(live), k, impl=impl)
    idx, sel = np.asarray(idx), np.asarray(sel)
    for r in range(32):
        want = np.flatnonzero(live[r])[-k:]
        got = idx[r][sel[r]]
        np.testing.assert_array_equal(got, want)
        # pads sit at the FRONT, pointing at 0, so kept z stays ascending
        np.testing.assert_array_equal(sel[r], np.array(
            [False] * (k - len(want)) + [True] * len(want)))
        np.testing.assert_array_equal(idx[r][~sel[r]], 0)


def test_depth_anchored_equals_first_k_when_cap_covers_ray():
    """depth_gt beyond the far slab boundary + K = S: the anchored window
    holds every live sample, identical to the unanchored compact render."""
    params = _params()
    rays = _rays()
    key = jax.random.PRNGKey(3)
    plain = R.render_rays_train_compact(
        CFG, params, AABB, rays, _ones_mask(), key, n_samples=S,
        compact_k=S, app_k=32, white_bg=True, density_group=1,
    )
    anchored = R.render_rays_train_compact(
        CFG, params, AABB, rays, _ones_mask(), key, n_samples=S,
        compact_k=S, app_k=32, white_bg=True, density_group=1,
        depth_gt=jnp.full((64,), 14.0, jnp.float32), cap_band_samples=6,
    )
    np.testing.assert_allclose(
        np.asarray(anchored.rgb), np.asarray(plain.rgb), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(anchored.depth), np.asarray(plain.depth), atol=1e-5
    )


def test_depth_anchored_window_sees_truncated_surface():
    """The round-4 full-schedule failure, reduced: an all-live mask with
    K << S makes the first-K window end far before the slab the rays'
    supervision points at — the render never sees it (acc ~ 0).  The
    depth-anchored window ends at the supervised depth and matches the
    dense render."""
    params, _ = _slab_field_and_mask()  # density only in z in (2.4, 3.2)
    rays = np.zeros((32, 6), np.float32)
    rays[:, 2] = -3.9
    rays[:, 5] = 1.0
    rays = jnp.asarray(rays)
    gt_depth = jnp.full((32,), 6.7, jnp.float32)  # slab from o.z = -3.9
    key = jax.random.PRNGKey(5)
    dense = R.render_rays(
        CFG, params, AABB, rays, key, n_samples=S, app_k=16, is_train=True,
        white_bg=True,
    )
    first_k = R.render_rays_train_compact(
        CFG, params, AABB, rays, _ones_mask(), key, n_samples=S,
        compact_k=16, app_k=16, white_bg=True, density_group=1,
    )
    anchored = R.render_rays_train_compact(
        CFG, params, AABB, rays, _ones_mask(), key, n_samples=S,
        compact_k=16, app_k=16, white_bg=True, density_group=1,
        depth_gt=gt_depth, cap_band_samples=6,
    )
    assert float(np.asarray(first_k.acc).max()) < 0.05  # window truncates
    np.testing.assert_allclose(
        np.asarray(anchored.acc), np.asarray(dense.acc), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(anchored.rgb), np.asarray(dense.rgb), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(anchored.depth), np.asarray(dense.depth), atol=5e-3
    )


def test_train_step_depth_cap_grows_deep_content():
    """End-to-end: with a dense live prefix overflowing K, the unanchored
    compacted step cannot fit content at the supervised depth (the window
    never reaches it); depth_cap_band anchors the window and the fit
    converges."""
    params = _params()
    mask = _ones_mask()
    rays = np.zeros((64, 6), np.float32)
    rays[:, 2] = -3.9
    rays[:, 5] = 1.0
    batch = {
        "rays": jnp.asarray(rays),
        "rgb": jnp.full((64, 3), 0.2, jnp.float32),
        "depth": jnp.full((64,), 6.5, jnp.float32),
    }
    w = ts.LossWeights(depth=1.0, transmittance=0.0, tv_density=0, tv_app=0)

    def fit(band):
        state, tx = ts.make_train_state(params, lr_init=0.05, factor=1.0)
        step = ts.make_train_step(
            CFG, tx, n_samples=S, app_k=16, white_bg=True, weights=w,
            compact_k=16, depth_cap_band=band,
        )
        key = jax.random.PRNGKey(0)
        metrics = None
        for _ in range(100):
            key, k = jax.random.split(key)
            state, metrics = step(state, AABB, batch, k, alpha_mask=mask)
        return float(metrics["depth_loss"])

    loss_truncated = fit(0)
    loss_anchored = fit(6)
    assert loss_anchored < 0.25 * loss_truncated, (
        loss_truncated, loss_anchored)


def test_stamped_train_mask_covers_replay_pool():
    """Round-4 lock-in fix: the trainer's train-compaction mask must stay
    live at EVERY pool's supervised depth band — including the replay
    pool (stage 3 has pool_new=None; a weakly-trained view's region would
    otherwise go permanently dead at the first mask rebuild after its
    stamp is dropped).  trainer.stamped_train_mask is the single stamping
    site train_mask_arg uses."""
    from text2nerf_tpu.engine import trainer as tr

    mask = {
        "volume": jnp.zeros((24, 24, 24), jnp.float32),
        "aabb": AABB, "pool": 5,
    }
    ray_z = np.array([[0, 0, -2, 0, 0, 1.0]], np.float32)   # hits (0,0,2)
    ray_x = np.array([[-2, 0, 0, 1.0, 0, 0]], np.float32)   # hits (2,0,0)
    pool_new = (ray_z, None, np.array([4.0], np.float32))
    pool_pre = (ray_x, None, np.array([4.0], np.float32))
    out = tr.stamped_train_mask(mask, pool_new, pool_pre)
    vol = np.asarray(out["volume"])  # [z, y, x]
    i_hi = round((2.0 + 4) / 8 * 23)
    i_mid = round((0.0 + 4) / 8 * 23)
    assert vol[i_hi, i_mid, i_mid] == 1.0      # pool_new band live
    assert vol[i_mid, i_mid, i_hi] == 1.0      # replay band live (round 4)
    # stage 3 shape: pool_new is None — replay stamp alone must apply
    out3 = tr.stamped_train_mask(mask, None, pool_pre)
    vol3 = np.asarray(out3["volume"])
    assert vol3[i_mid, i_mid, i_hi] == 1.0
    assert vol3[i_hi, i_mid, i_mid] == 0.0
    # both empty: identity
    assert tr.stamped_train_mask(mask, None, None) is mask
