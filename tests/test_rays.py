"""Geometry tests for ray generation against independent numpy math."""

import numpy as np
import jax.numpy as jnp

from text2nerf_tpu.ops import rays as R


def test_ray_directions_pinhole():
    h, w = 6, 8
    fx = fy = 8.0
    cx, cy = 4.0, 3.0
    dirs = np.asarray(
        R.ray_directions(h, w, (fx, fy), (cx, cy), normalize=False)
    )
    # pixel (i=col, j=row) center at +0.5 (ray_utils.py:34-40)
    for j in (0, 3, 5):
        for i in (0, 4, 7):
            expect = np.array([(i + 0.5 - cx) / fx, (j + 0.5 - cy) / fy, 1.0])
            np.testing.assert_allclose(dirs[j, i], expect, atol=1e-6)

    dn = np.asarray(R.ray_directions(h, w, (fx, fy), (cx, cy)))
    np.testing.assert_allclose(np.linalg.norm(dn, axis=-1), 1.0, atol=1e-6)


def test_rays_from_pose_rotation_translation(rng):
    dirs = np.asarray(R.ray_directions(4, 4, (4.0, 4.0)))
    theta = 0.3
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = np.array(
        [
            [np.cos(theta), 0, np.sin(theta)],
            [0, 1, 0],
            [-np.sin(theta), 0, np.cos(theta)],
        ]
    )
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    o, d = R.rays_from_pose(jnp.asarray(dirs), jnp.asarray(c2w))
    o, d = np.asarray(o), np.asarray(d)
    np.testing.assert_allclose(o, np.tile(c2w[:3, 3], (16, 1)), atol=1e-6)
    np.testing.assert_allclose(
        d, dirs.reshape(-1, 3) @ c2w[:3, :3].T, atol=1e-6
    )
    # rotation preserves the unit norm of directions
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-6)


def test_default_intrinsics_rule():
    # f = max(H, W), c = (W//2, H//2) (scene_gen.py:229-237)
    fx, fy, cx, cy = R.default_intrinsics(512, 512)
    assert (fx, fy, cx, cy) == (512.0, 512.0, 256.0, 256.0)
    fx, fy, cx, cy = R.default_intrinsics(480, 640)
    assert (fx, fy, cx, cy) == (640.0, 640.0, 320.0, 240.0)


def test_aabb_slab_entry():
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    rays_o = jnp.array([[0.0, 0.0, -3.0], [0.0, 0.0, 0.0]])
    rays_d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t = np.asarray(R.aabb_slab_entry(rays_o, rays_d, aabb, 0.5, 8.0))
    # first ray enters box at t=2; second starts inside (entry clamped to near)
    np.testing.assert_allclose(t, [2.0, 0.5], atol=1e-5)

    tmin, tmax = R.aabb_slab_interval(rays_o, rays_d, aabb)
    assert np.asarray(tmax)[0] > np.asarray(tmin)[0]
    # a ray that misses the box entirely
    miss_o = jnp.array([[5.0, 5.0, -3.0]])
    tmin2, tmax2 = R.aabb_slab_interval(miss_o, rays_d[:1], aabb)
    assert np.asarray(tmax2)[0] <= np.asarray(tmin2)[0]


def test_sample_pdf_deterministic_monotone(rng):
    bins = jnp.linspace(0.0, 1.0, 9)[None, :].repeat(4, 0)
    weights = jnp.asarray(rng.uniform(0.1, 1.0, (4, 8)).astype(np.float32))
    samples = np.asarray(R.sample_pdf(bins, weights, 16))
    assert samples.shape == (4, 16)
    assert (np.diff(samples, axis=-1) >= -1e-6).all()
    assert (samples >= 0).all() and (samples <= 1).all()
