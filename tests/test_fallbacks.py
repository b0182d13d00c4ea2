"""Procedural fallback services — host-numpy helpers.

The fallbacks run during scene bootstrap on the host; their image helpers
were moved off jax (each device call costs a tunnel compile on the
single-chip setup, PERF.md round 3).  These tests pin the numpy
implementations to the documented semantics:

- `_box_mean_same` must equal a zero-padded SAME convolution with a
  constant kernel (the previous jax implementation, bit-level).
- `_resize_bicubic_np` is a separable Keys-kernel (a=-0.5) upsample with
  half-pixel centers — golden-tested against a literal per-pixel loop.
"""

import numpy as np
import jax
import jax.numpy as jnp

from text2nerf_tpu.services import fallbacks as fb


def test_box_mean_matches_same_conv():
    rng = np.random.default_rng(3)
    x = rng.random((23, 17)).astype(np.float32)
    k = jnp.ones((9, 9), jnp.float32) / 81.0
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x)[None, None], k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]
    )
    got = fb._box_mean_same(x, 9)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def _bicubic_loop(grid, h, w):
    """Literal per-output-pixel Keys-kernel resize (half-pixel centers)."""
    n_in_h, n_in_w = grid.shape
    out = np.zeros((h, w), np.float64)
    # rows then cols, like the separable implementation
    tmp = np.zeros((h, n_in_w), np.float64)
    for o in range(h):
        c = (o + 0.5) * n_in_h / h - 0.5
        b = int(np.floor(c))
        taps = [b - 1, b, b + 1, b + 2]
        wts = fb._cubic_weights(np.array([c - t for t in taps]))
        wts = wts / max(wts.sum(), 1e-8)
        for j in range(n_in_w):
            tmp[o, j] = sum(
                wts[i] * grid[min(max(t, 0), n_in_h - 1), j]
                for i, t in enumerate(taps)
            )
    for o in range(w):
        c = (o + 0.5) * n_in_w / w - 0.5
        b = int(np.floor(c))
        taps = [b - 1, b, b + 1, b + 2]
        wts = fb._cubic_weights(np.array([c - t for t in taps]))
        wts = wts / max(wts.sum(), 1e-8)
        for i in range(h):
            out[i, o] = sum(
                wts[q] * tmp[i, min(max(t, 0), n_in_w - 1)]
                for q, t in enumerate(taps)
            )
    return out.astype(np.float32)


def test_bicubic_matches_literal_loop():
    rng = np.random.default_rng(7)
    g = rng.random((5, 9)).astype(np.float32)
    ref = _bicubic_loop(g, 21, 13)
    got = fb._resize_bicubic_np(g, 21, 13)
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_procedural_services_shapes_and_speed():
    img = fb.procedural_text2img("a test garden", hw=(64, 48))
    assert img.shape == (64, 48, 3)
    assert img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    # deterministic in the prompt
    img2 = fb.procedural_text2img("a test garden", hw=(64, 48))
    np.testing.assert_array_equal(img, img2)
    counts = fb.procedural_depth(img)
    assert counts.shape == (64, 48)
    d = counts / 12000.0 + 2.0
    assert d.min() > 2.0 and d.max() < 7.0
