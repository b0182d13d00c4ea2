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


def _ndc_reference(h, w, focal, near, rays_o, rays_d, blender):
    """Literal numpy transcription of ray_utils.py:90-126."""
    rays_o = rays_o.copy()
    if blender:
        t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    else:
        t = (near - rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d
    s = -1.0 if blender else 1.0
    o0 = s / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = s / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    d0 = s / (w / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = s / (h / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    if blender:
        o2 = 1.0 + 2.0 * near / rays_o[..., 2]
        d2 = -2.0 * near / rays_o[..., 2]
    else:
        o2 = 1.0 - 2.0 * near / rays_o[..., 2]
        d2 = 2.0 * near / rays_o[..., 2]
    return (
        np.stack([o0, o1, o2], -1),
        np.stack([d0, d1, d2], -1),
    )


def test_ndc_rays_both_conventions(rng):
    h, w, focal, near = 12, 16, 20.0, 1.0
    o = rng.normal(size=(64, 3)).astype(np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    # blender convention looks down -z; standard down +z
    for blender in (True, False):
        dz = -np.abs(d[:, 2]) - 0.3 if blender else np.abs(d[:, 2]) + 0.3
        dd = np.concatenate([d[:, :2], dz[:, None]], -1)
        oo = o.copy()
        oo[:, 2] = (np.abs(o[:, 2]) + 2.0) * (-1.0 if blender else 1.0)
        ro, rd = R.ndc_rays(
            h, w, focal, near, jnp.asarray(oo), jnp.asarray(dd),
            blender=blender,
        )
        eo, ed = _ndc_reference(h, w, focal, near, oo, dd, blender)
        np.testing.assert_allclose(np.asarray(ro), eo, atol=2e-5)
        np.testing.assert_allclose(np.asarray(rd), ed, atol=2e-5)
        # a point at the near plane maps to ndc z = -1 (o2 = 1 - 2n/n)
        if not blender:
            onear = np.array([[0.0, 0.0, near]], np.float32)
            dnear = np.array([[0.0, 0.0, 1.0]], np.float32)
            ro2, _ = R.ndc_rays(
                h, w, focal, near, jnp.asarray(onear), jnp.asarray(dnear)
            )
            np.testing.assert_allclose(float(ro2[0, 2]), -1.0, atol=1e-6)


def test_rays_split_np_matches_jax_path(rng):
    """Host-numpy pool ray builder ≡ ray_directions + rays_from_poses."""
    h, w = 14, 18
    intr = (21.0, 19.5, 9.2, 6.8)
    poses = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
    # random valid c2w rotations + translations
    for v in range(3):
        a, b, c = rng.normal(size=3) * 0.4
        Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
        Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
        Rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
        poses[v, :3, :3] = (Rx @ Ry @ Rz).astype(np.float32)
        poses[v, :3, 3] = rng.normal(size=3).astype(np.float32)
    dirs = R.ray_directions(h, w, intr[:2], intr[2:])
    ref = np.asarray(R.rays_from_poses(dirs, jnp.asarray(poses)))
    got = R.rays_split_np(poses, intr, h, w)
    assert got.shape == (3, h * w, 6)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got.reshape(ref.shape), ref, atol=1e-6)
