"""Filter tests: discontinuity maps, weighted-median vectorization vs a
direct per-pixel numpy implementation, hole filling."""

import numpy as np
import jax.numpy as jnp

from text2nerf_tpu.ops import filters


def test_depth_discontinuity_step_edge():
    depth = np.full((10, 10), 2.0, np.float32)
    depth[:, 5:] = 6.0  # disparity step 0.5 - 0.1667 >> 0.04
    u, b, l, r = filters.depth_discontinuity(jnp.asarray(depth), 0.04)
    l, r = np.asarray(l), np.asarray(r)
    # l sees a jump at the column right of the edge; r at the edge column
    assert l[1:-1, 5].all()
    assert r[1:-1, 4].all()
    assert np.asarray(u)[1:-1, 1:4].sum() == 0


def _ref_median_filter(values, disc, window):
    """Direct per-pixel implementation of the discontinuity-branch weighted
    median (bilateral_filtering.py:167-198)."""
    m = window // 2
    v = np.pad(values[1:-1, 1:-1], 1, mode="edge")
    d = np.pad(disc[1:-1, 1:-1], 1, mode="edge")
    pv = np.pad(v, m, mode="edge")
    pd = np.pad(d, m, mode="edge")
    out = v.copy()
    h, w = v.shape
    for i in range(h):
        for j in range(w):
            dp = pd[i : i + window, j : j + window]
            if not dp.any():
                continue
            patch = pv[i : i + window, j : j + window]
            coef = (1.0 - dp).astype(np.float32)
            if coef.max() == 0:
                out[i, j] = patch[m, m]
                continue
            order = patch.ravel().argsort()
            coef = coef / coef.sum()
            cum = np.cumsum(coef.ravel()[order])
            ind = np.digitize(0.5, cum)
            out[i, j] = patch.ravel()[order][ind]
    return out


def test_median_filter_matches_reference_loop(rng):
    values = rng.uniform(1, 5, (12, 12)).astype(np.float32)
    disc = (rng.uniform(0, 1, (12, 12)) > 0.7).astype(np.float32)
    ours = np.asarray(
        filters.discontinuity_median_filter(
            jnp.asarray(values), jnp.asarray(disc), 5
        )
    )
    ref = _ref_median_filter(values, disc, 5)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def _ref_median_filter_masked(values, disc, mask, window):
    """Literal per-pixel implementation of the discontinuity branch WITH
    mask (bilateral_filtering.py:163-199): mask==0 centers skipped, coef
    multiplied by the zero-padded raw mask patch."""
    m = window // 2
    v = np.pad(values[1:-1, 1:-1], 1, mode="edge")
    d = np.pad(disc[1:-1, 1:-1], 1, mode="edge")
    pv = np.pad(v, m, mode="edge")
    pd = np.pad(d, m, mode="edge")
    pm = np.pad(mask, m, mode="constant")
    out = v.copy()
    h, w = v.shape
    for i in range(h):
        for j in range(w):
            if mask[i, j] == 0:
                continue
            dp = pd[i : i + window, j : j + window]
            if not dp.any():
                continue
            patch = pv[i : i + window, j : j + window]
            coef = (1.0 - dp) * pm[i : i + window, j : j + window]
            if coef.max() == 0:
                out[i, j] = patch[m, m]
                continue
            order = patch.ravel().argsort()
            coef = coef / coef.sum()
            cum = np.cumsum(coef.ravel()[order])
            ind = np.digitize(0.5, cum)
            out[i, j] = patch.ravel()[order][min(ind, window * window - 1)]
    return out


def test_median_filter_mask_matches_reference_loop(rng):
    values = rng.uniform(1, 5, (12, 12)).astype(np.float32)
    disc = (rng.uniform(0, 1, (12, 12)) > 0.7).astype(np.float32)
    mask = (rng.uniform(0, 1, (12, 12)) > 0.3).astype(np.float32)
    ours = np.asarray(
        filters.discontinuity_median_filter(
            jnp.asarray(values), jnp.asarray(disc), 5, mask=jnp.asarray(mask)
        )
    )
    ref = _ref_median_filter_masked(values, disc, mask, 5)
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    # masked-out centers keep their (ring-replaced) value
    v = np.pad(values[1:-1, 1:-1], 1, mode="edge")
    np.testing.assert_array_equal(ours[mask == 0], v[mask == 0])


def test_median_filter_constant_unchanged():
    values = np.full((8, 8), 3.0, np.float32)
    disc = np.zeros((8, 8), np.float32)
    disc[4, 4] = 1.0
    out = np.asarray(
        filters.discontinuity_median_filter(
            jnp.asarray(values), jnp.asarray(disc), 3
        )
    )
    np.testing.assert_allclose(out, 3.0)


def test_sparse_bilateral_smooths_outlier():
    depth = np.full((16, 16), 2.0, np.float32)
    depth[8, 8] = 6.0  # spike creates a discontinuity around it
    img = np.tile(depth[..., None] / 6.0, (1, 1, 3)).astype(np.float32)
    img2, depth2 = filters.sparse_bilateral_filtering(
        depth, img, filter_size=(5, 5, 3, 3), num_iter=4
    )
    assert abs(float(depth2[8, 8]) - 2.0) < 0.1
    assert img2.shape == (16, 16, 3)


def test_hole_fill_fills_small_holes():
    rng = np.random.default_rng(0)
    img = rng.uniform(0.4, 0.6, (20, 20, 3)).astype(np.float32)
    mask = np.ones((20, 20), np.float32)
    mask[9:11, 9:11] = 0
    img_holed = img * mask[..., None]
    depth = np.full((20, 20), 3.0, np.float32) * mask
    img2, mask2, depth2 = filters.hole_fill(img_holed, mask, depth)
    assert np.asarray(mask2)[9:11, 9:11].all()
    filled = np.asarray(img2)[9:11, 9:11]
    assert (np.abs(filled - 0.5) < 0.15).all()
    np.testing.assert_allclose(np.asarray(depth2)[9:11, 9:11], 3.0, atol=0.1)


def test_hole_fill_leaves_large_holes():
    img = np.ones((30, 30, 3), np.float32)
    mask = np.ones((30, 30), np.float32)
    mask[5:25, 5:25] = 0
    _, mask2, _ = filters.hole_fill(img * mask[..., None], mask, max_passes=2)
    assert np.asarray(mask2)[14:16, 14:16].sum() == 0  # center stays a hole


def test_expand_mask_blur():
    mask = np.ones((20, 20), np.float32)
    mask[:, 10:] = 0
    out = np.asarray(filters.expand_mask_blur(jnp.asarray(mask), 5, 0.99))
    # known region shrinks by the blur radius near the boundary
    assert out[:, :7].all()
    assert not out[:, 8:].any()


def _random_rgbd(seed, h=24, w=20, zero_frac=0.08):
    rng = np.random.default_rng(seed)
    depth = rng.uniform(0.5, 6.0, (h, w)).astype(np.float32)
    # step edges to create real discontinuities, plus zero-depth holes
    depth[:, w // 2 :] *= 2.5
    depth[h // 3 :, :] += 1.7
    depth[rng.uniform(size=(h, w)) < zero_frac] = 0.0
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    return depth, img


def test_native_bilateral_bit_exact_vs_device():
    """The host C++ path is bit-exact to the jitted XLA program: the
    filter's coefs are binary so the weighted-median has no fp ambiguity."""
    from text2nerf_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")
    for seed, mask_on, fs, ni in (
        (0, False, (5, 5, 3, 3), 4),
        (1, True, (5, 5, 3, 3), 4),
        (2, False, (7, 5, 5, 3, 3), 5),
        (3, True, (3,), 2),
    ):
        depth, img = _random_rgbd(seed)
        mask = None
        if mask_on:
            rng = np.random.default_rng(100 + seed)
            mask = (rng.uniform(size=depth.shape) > 0.2).astype(np.float32)
        img_d, depth_d = filters.sparse_bilateral_filtering(
            depth, img, filter_size=fs, depth_threshold=0.02,
            num_iter=ni, mask=mask, backend="device",
        )
        img_n, depth_n = filters.sparse_bilateral_filtering(
            depth, img, filter_size=fs, depth_threshold=0.02,
            num_iter=ni, mask=mask, backend="native",
        )
        np.testing.assert_array_equal(np.asarray(depth_d), depth_n)
        np.testing.assert_array_equal(np.asarray(img_d), img_n)


def test_bilateral_auto_backend_dispatch():
    """auto picks native for host inputs (when the lib loads) and the
    device program for device-resident inputs."""
    from text2nerf_tpu import native

    depth, img = _random_rgbd(7, h=12, w=10)
    out_auto = filters.sparse_bilateral_filtering(depth, img, num_iter=2)
    out_dev = filters.sparse_bilateral_filtering(
        jnp.asarray(depth), jnp.asarray(img), num_iter=2, backend="device"
    )
    np.testing.assert_array_equal(np.asarray(out_auto[1]), np.asarray(out_dev[1]))
    np.testing.assert_array_equal(np.asarray(out_auto[0]), np.asarray(out_dev[0]))
    if native.available():
        assert isinstance(out_auto[0], np.ndarray)
