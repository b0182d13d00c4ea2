"""Remaining parity utilities: extra pose generators, ndc bbox, depth-pair
alignment."""

import numpy as np
import jax.numpy as jnp

from text2nerf_tpu.data import trajectories as traj
from text2nerf_tpu.engine.expansion import align_depth_pair
from text2nerf_tpu.ops.rays import ndc_bbox


def _rotations_orthonormal(poses):
    for p in poses:
        r = p[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_pretraining_poses():
    poses = traj.pretraining_poses(np.eye(4))
    assert poses.shape == (9, 4, 4)
    _rotations_orthonormal(poses)
    # yaw-right pose rotates about y by range_yaw degrees
    expect = traj.rot_y(20 / 180 * np.pi)
    np.testing.assert_allclose(poses[1][:3, :3], expect, atol=1e-5)


def test_circle_poses_from_basis_view():
    poses = traj.circle_poses_from_basis_view(np.eye(4), n_views=24, n_r=1)
    assert poses.shape == (24, 4, 4)
    _rotations_orthonormal(poses)
    # camera positions trace a small circle around the basis center
    radii = np.linalg.norm(poses[:, :3, 3] - poses[:, :3, 3].mean(0), axis=-1)
    assert radii.std() < 0.01


def test_ndc_bbox():
    rays = jnp.asarray(
        np.concatenate(
            [np.zeros((4, 3), np.float32),
             np.array([[1, 0, 0], [0, 1, 0], [-1, 0, 0], [0, 0, 1]], np.float32)],
            -1,
        )
    )
    box = np.asarray(ndc_bbox(rays))
    np.testing.assert_allclose(box[0], [-1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(box[1], [1, 1, 1], atol=1e-6)


def test_align_depth_pair_recovers_affine():
    h = w = 48
    yy = np.linspace(2.0, 5.0, h, dtype=np.float32)[:, None]
    depth_ref = np.tile(yy, (1, w))
    pose = np.eye(4, dtype=np.float32)
    # source depth is an affine distortion of the true depth (same view)
    depth_src = depth_ref * 1.5 + 0.4
    aligned, uncert = align_depth_pair(
        depth_ref, depth_src, pose, pose, (48.0, 48.0, 24.0, 24.0)
    )
    err = np.abs(aligned - depth_ref)
    assert np.median(err) < 0.15, np.median(err)
    assert uncert.shape == (h, w)
