"""Group-packed gathers (ops/fused_gather.py): G ray-consecutive samples
per gathered row must reproduce the per-sample packed path (up to fp
reassociation of the weighted contraction) — including at clamped edges —
and the grouped train render/grads must match the ungrouped ones."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.ops import fused_gather as fg
from text2nerf_tpu.ops import render as render_ops


def _grouped_coords(rng, n, g, max_drift):
    """(N, G) normalized coords where consecutive entries drift at most
    max_drift cells (the ray-marching structure)."""
    base = rng.uniform(-1.0, 1.0, (n, 1))
    steps = rng.uniform(-max_drift, max_drift, (n, g - 1)).cumsum(axis=1)
    return np.concatenate([base, base + steps], axis=1)


@pytest.mark.parametrize("block", [3, 4])
def test_plane_groups_match_per_sample(block):
    rng = np.random.default_rng(0)
    h, w, c = 23, 31, 5
    plane = jnp.asarray(rng.standard_normal((h, w, c)), jnp.float32)
    n, g = 257, 2
    # real-valued drift ≤ block-2 cells → floor span ≤ block-2
    x = _grouped_coords(rng, n, g, (block - 2) * 2.0 / (w - 1))
    y = _grouped_coords(rng, n, g, (block - 2) * 2.0 / (h - 1))
    x = np.clip(x, -1, 1)
    y = np.clip(y, -1, 1)

    ref = fg.sample_packed_plane(
        fg.pack_plane(plane), h, w, c,
        jnp.asarray(x.reshape(-1), jnp.float32),
        jnp.asarray(y.reshape(-1), jnp.float32),
    ).reshape(n, g, c)
    out = fg.sample_packed_plane_groups(
        fg.pack_plane_block(plane, block), h, w, c,
        jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        block=block,
    )  # list of G (C, N) channel-major arrays
    got = jnp.stack(out, axis=0).transpose(2, 0, 1)  # (N, G, C)
    # weighted contraction = per-sample lerp up to fp reassociation
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


@pytest.mark.parametrize("block", [3, 4])
def test_line_groups_match_per_sample(block):
    rng = np.random.default_rng(1)
    l, c = 37, 4
    line = jnp.asarray(rng.standard_normal((l, c)), jnp.float32)
    n, g = 301, 2
    y = np.clip(_grouped_coords(rng, n, g, (block - 2) * 2.0 / (l - 1)), -1, 1)

    ref = fg.sample_packed_line(
        fg.pack_line(line), l, c, jnp.asarray(y.reshape(-1), jnp.float32)
    ).reshape(n, g, c)
    out = fg.sample_packed_line_groups(
        fg.pack_line_block(line, block), l, c, jnp.asarray(y, jnp.float32),
        block=block,
    )
    got = jnp.stack(out, axis=0).transpose(2, 0, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_grouping_safe_guard():
    aabb = [[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]]
    assert tf.grouping_safe(aabb, (48, 48, 48), step_ratio=1.0)
    # pathological unit skew: one axis 8x finer → drift > 2 cells/step
    assert not tf.grouping_safe(aabb, (48, 48, 384), step_ratio=1.0)
    # larger groups need smaller drift
    assert not tf.grouping_safe(aabb, (48, 48, 48), step_ratio=1.5, group=3)
    # block auto-selection: equal units / step_ratio 1 → tightest block 3
    assert tf.grouping_block(aabb, (48, 48, 48), step_ratio=1.0) == 3
    assert tf.grouping_block(aabb, (48, 48, 48), step_ratio=1.5) == 4
    assert tf.grouping_block(aabb, (48, 48, 384), step_ratio=1.0) == 0
    # unnormalized wide-FOV directions scale the drift bound (ADVICE r2)
    assert not tf.grouping_safe(aabb, (48, 48, 48), 1.0, dir_bound=3.0)
    assert tf.grouping_block(aabb, (48, 48, 48), 1.0, dir_bound=1.9) == 4


@pytest.mark.parametrize("model_name", ["vm_split", "cp"])
def test_render_rays_grouped_matches_ungrouped(model_name):
    cfg = tf.TensoRFConfig(
        model_name=model_name, density_n_comp=(8, 8, 8), app_n_comp=(8, 8, 8)
    )
    aabb = jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    reso = (24, 24, 24)
    assert tf.grouping_safe(aabb, reso, cfg.step_ratio)
    params = tf.init_params(jax.random.PRNGKey(0), cfg, reso)
    # put some density in so appearance/compositing paths are live
    if model_name == "cp":
        params["density_lines"] = tuple(
            l + 0.3 for l in params["density_lines"]
        )
    else:
        params["density_planes"] = tuple(
            p + 0.3 for p in params["density_planes"]
        )
    rng = np.random.default_rng(2)
    b, s = 64, 33  # odd sample count exercises the pad path
    o = rng.uniform(-0.3, 0.3, (b, 3))
    d = rng.standard_normal((b, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1), jnp.float32)
    key = jax.random.PRNGKey(3)

    out1 = render_ops.render_rays(
        cfg, params, aabb, rays, key, n_samples=s, app_k=8, is_train=True,
        density_group=1,
    )
    out2 = render_ops.render_rays(
        cfg, params, aabb, rays, key, n_samples=s, app_k=8, is_train=True,
        density_group=2,
    )
    np.testing.assert_allclose(
        np.asarray(out2.rgb), np.asarray(out1.rgb), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out2.weights), np.asarray(out1.weights), atol=1e-6
    )


def test_grouped_grads_match():
    cfg = tf.TensoRFConfig(density_n_comp=(4, 4, 4), app_n_comp=(4, 4, 4))
    aabb = jnp.asarray([[-2.0, -2.0, -2.0], [2.0, 2.0, 2.0]])
    params = tf.init_params(jax.random.PRNGKey(1), cfg, (16, 16, 16))
    params["density_planes"] = tuple(p + 0.5 for p in params["density_planes"])
    rng = np.random.default_rng(5)
    o = rng.uniform(-0.2, 0.2, (32, 3))
    d = rng.standard_normal((32, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (32, 3)), jnp.float32)
    key = jax.random.PRNGKey(4)

    def loss(p, group):
        out = render_ops.render_rays(
            cfg, p, aabb, rays, key, n_samples=17, app_k=8, is_train=True,
            density_group=group,
        )
        return jnp.mean((out.rgb - tgt) ** 2)

    g1 = jax.grad(lambda p: loss(p, 1))(params)
    g2 = jax.grad(lambda p: loss(p, 2))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_line_hat_matmul_matches_lerp():
    """sample_line_hat (MXU matmul) equals the gather+lerp path to ~1e-6
    (hat weights reproduce the lerp weights up to 1-(1-t) rounding),
    including at the clamped edges."""
    rng = np.random.default_rng(9)
    l, c = 37, 6
    line = jnp.asarray(rng.standard_normal((l, c)), jnp.float32)
    y = jnp.asarray(
        np.concatenate([
            rng.uniform(-1.2, 1.2, 400), [-1.0, 1.0, 0.0, -1.3, 1.3]
        ]).astype(np.float32)
    )
    y_c = jnp.clip(y, -1, 1)
    ref = fg.sample_packed_line(fg.pack_line(line), l, c, y_c)
    got = fg.sample_line_hat(line, y_c)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-6, rtol=1e-6
    )
    # gradients flow to the line as a matmul transpose (no scatter)
    g1 = jax.grad(lambda t: jnp.sum(fg.sample_line_hat(t, y_c) ** 2))(line)
    g2 = jax.grad(
        lambda t: jnp.sum(
            fg.sample_packed_line(fg.pack_line(t), l, c, y_c) ** 2
        )
    )(line)
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), atol=5e-5, rtol=1e-4
    )


def test_sample_line_hat_bf16_keeps_index_math_fp32():
    """dtype=bf16 must cast only the FINISHED weights, never the absolute
    grid coordinate (review r3: bf16's 1-ulp spacing past row 128 wiped
    the fractional part on production-size 300-row tables)."""
    rng = np.random.default_rng(3)
    l, c = 300, 8
    line = jnp.asarray(rng.normal(size=(l, c)).astype(np.float32))
    # coordinates landing in rows > 128 with non-trivial fractions
    y = jnp.asarray(rng.uniform(0.7, 0.95, 64).astype(np.float32))
    ref = np.asarray(fg.sample_line_hat(line, y))
    got = np.asarray(fg.sample_line_hat(line, y, dtype=jnp.bfloat16))
    # bf16 weight/table rounding only (~1e-2 relative), NOT whole-cell
    # jumps from a destroyed fraction
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)
    err = np.abs(got - ref).max()
    assert err < 0.1, err
