"""Native C++ host kernels: build, exactness vs a literal python loop."""

import numpy as np
import pytest

from text2nerf_tpu import native


pytestmark = pytest.mark.skipif(not native.available(), reason="no g++")


def _ref_hole_fill2(image, mask, depth, threshold=0.65):
    """Literal raster-order reference (the documented semantics of
    utils.py:394-409)."""
    img = image.copy()
    m = mask.copy()
    d = depth.copy()
    h, w, c = img.shape
    w5 = np.array(
        [
            [1, 1, 1.5, 1, 1],
            [1, 1.5, 3, 1.5, 1],
            [1.5, 3, 0, 3, 1.5],
            [1, 1.5, 3, 1.5, 1],
            [1, 1, 1.5, 1, 1],
        ],
        np.float32,
    )
    sw = w5.sum()
    for i in range(2, h - 2):
        for j in range(2, w - 2):
            if m[i, j] == 0 and (m[i - 2 : i + 3, j - 2 : j + 3] * w5).sum() / sw > threshold:
                msum = m[i - 1 : i + 2, j - 1 : j + 2].sum()
                for cc in range(c):
                    img[i, j, cc] = (
                        img[i - 1 : i + 2, j - 1 : j + 2, cc]
                        * m[i - 1 : i + 2, j - 1 : j + 2]
                    ).sum() / msum
                d[i, j] = (
                    d[i - 1 : i + 2, j - 1 : j + 2] * m[i - 1 : i + 2, j - 1 : j + 2]
                ).sum() / msum
                m[i, j] = 1
    return img, m, d


def test_hole_fill2_matches_sequential_reference(rng):
    h = w = 24
    img = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (h, w)) > 0.25).astype(np.float32)
    depth = rng.uniform(1, 5, (h, w)).astype(np.float32)
    img_n, m_n, d_n = native.hole_fill2(img, mask, depth)
    img_r, m_r, d_r = _ref_hole_fill2(img, mask, depth)
    np.testing.assert_array_equal(m_n, m_r)
    np.testing.assert_allclose(img_n, img_r, atol=1e-5)
    np.testing.assert_allclose(d_n, d_r, atol=1e-5)
    # sequential propagation: more filled than one synchronous pass
    assert m_n.sum() > mask.sum()


def test_hole_fill1_border_and_removal(rng):
    h = w = 24
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    mask = np.ones((h, w), np.float32)
    mask[0, :] = 0           # top border hole → extended from row 1
    mask[16, 16] = 0         # small interior hole → filled
    # isolated known pixel deep inside a large hole → removed
    mask[3:12, 3:12] = 0
    mask[7, 7] = 1
    img_o, m_o = native.hole_fill1(img, mask)
    assert m_o[0].all()
    assert m_o[16, 16] == 1
    assert m_o[7, 7] == 0
    np.testing.assert_allclose(img_o[7, 7], 255.0)


def test_unavailable_native_is_loud(monkeypatch):
    """A failed build must warn (once) and hard-fail under
    TEXT2NERF_REQUIRE_NATIVE=1 — never degrade silently (VERDICT r1)."""
    import warnings

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_LOAD_ERROR", "simulated build failure")
    monkeypatch.setattr(native, "_WARNED", False)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert not native.available()
    assert any("XLA approximation" in str(x.message) for x in w)
    monkeypatch.setenv("TEXT2NERF_REQUIRE_NATIVE", "1")
    with pytest.raises(RuntimeError, match="simulated build failure"):
        native.load()


def test_zbuffer_splat_first_writer_wins():
    h = w = 8
    xs = np.zeros((h, w), np.int16)
    ys = np.zeros((h, w), np.int16)
    zs = np.ones((h, w), np.float32)
    src = np.arange(h * w * 3, dtype=np.float32).reshape(h, w, 3)
    out, pts, mask = native.zbuffer_splat(xs, ys, zs, src)
    # everything maps to (0,0); the raster-first source pixel (0,0) wins
    np.testing.assert_allclose(out[0, 0], src[0, 0])
    assert mask[0, 0] == 1 and mask.sum() == 1
