"""Boosted-depth machinery tests with a synthetic base estimator."""

import numpy as np

from text2nerf_tpu.services import depth_service as DS


def _scene_image(h=128, w=128):
    rng = np.random.default_rng(0)
    img = np.zeros((h, w, 3), np.float32)
    img[:, : w // 2] = 0.2
    img[:, w // 2 :] = 0.8
    img += rng.uniform(0, 0.05, (h, w, 3))
    return np.clip(img, 0, 1)


def _oracle_estimator(img, size):
    """Base estimator: depth = mean intensity (resolution-independent)."""
    return img.mean(-1).astype(np.float32)


def test_resolution_search_bounds():
    img = _scene_image(256, 256)
    optimal, patch_scale = DS.calculate_processing_res(img, basesize=64)
    assert 64 <= optimal <= 3 * 256
    assert patch_scale > 0


def test_generate_patches_prefers_gradients():
    img = np.full((256, 256, 3), 0.5, np.float32)
    # textured quadrant
    rng = np.random.default_rng(0)
    img[:128, :128] = rng.uniform(0, 1, (128, 128, 3))
    patches = DS.generate_patches(img, base_size=64, factor=1.0)
    assert len(patches) > 0
    # patches concentrate in the textured quadrant
    centers = np.array(
        [[p["rect"][1] + p["rect"][3] / 2, p["rect"][0] + p["rect"][2] / 2]
         for p in patches]
    )
    assert (centers < 170).mean() > 0.8


def test_boosted_estimate_shapes_and_range():
    img = _scene_image()
    booster = DS.BoostedDepthEstimator(
        _oracle_estimator, receptive_field=32, pix2pix_size=128, max_patches=3
    )
    counts = booster.estimate(img)
    assert counts.shape == (128, 128)
    assert counts.min() >= 0 and counts.max() <= 65535
    assert counts.max() > 60000  # normalized to the full 16-bit range
    # bright half should get consistently different depth than dark half
    left = counts[:, :60].mean()
    right = counts[:, 68:].mean()
    assert abs(left - right) > 5000


def test_gaussian_blend_mask():
    m = DS.gaussian_blend_mask((64, 64))
    assert m.shape == (64, 64)
    assert m.max() == 1.0 and m.min() == 0.0
    assert m[32, 32] > 0.9 and m[0, 0] < 0.1
