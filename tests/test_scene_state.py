"""Scene bootstrap / ray-pool tests (hermetic, fallback services)."""

import os

import numpy as np

from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.services import fallbacks


HW = (32, 32)


def _cfg(tmp_path, **kw):
    return ss.SceneConfig(
        datadir=str(tmp_path / "scene"), prompt="test scene", hw=HW,
        num_filter_iter=2, filter_size=(3, 3), **kw,
    )


def _bootstrap(cfg, split="train"):
    return ss.bootstrap_scene(
        cfg, split,
        text2img=lambda p, n="": fallbacks.procedural_text2img(p, n, hw=HW),
        estimate_depth=fallbacks.procedural_depth,
    )


def test_bootstrap_writes_scene_layout(tmp_path):
    cfg = _cfg(tmp_path)
    state = _bootstrap(cfg)
    d = cfg.datadir
    assert os.path.isfile(os.path.join(d, "rgbs", "00000.png"))
    assert os.path.isfile(os.path.join(d, "depth", "00000.png"))
    assert os.path.isfile(os.path.join(d, "cam", "intrinsic.npy"))
    assert os.path.isfile(os.path.join(d, "cam", "00000_pose.npy"))
    # local_fixed: 9 trajectory poses, 9 support poses (scene_util.py:554-596)
    assert state.poses_gen.shape == (9, 4, 4)
    assert state.poses_support.shape == (9, 4, 4)


def test_bootstrap_pools_masked(tmp_path):
    state = _bootstrap(_cfg(tmp_path))
    h, w = HW
    n = state.all_rays.shape[0]
    # seed view contributes all pixels; warped support views only their masks
    assert h * w <= n <= 9 * h * w
    assert state.all_rgbs.shape == (n, 3)
    assert state.all_depth.shape == (n,)
    assert state.rays_gen_split.shape == (9, h * w, 6)
    assert state.rgbs_gen_split.shape == (1, h, w, 3)
    assert "00000" in state.updates
    # depth is metric (push_depth=2 → [2, ~6.5])
    assert 1.5 < state.all_depth.mean() < 7.0


def test_bootstrap_reuses_cached_assets(tmp_path):
    cfg = _cfg(tmp_path)
    s1 = _bootstrap(cfg)
    # second bootstrap must read from disk (no services needed)
    s2 = ss.bootstrap_scene(cfg, "train")
    np.testing.assert_allclose(
        s2.rgbs_gen_split[0], s1.rgbs_gen_split[0], atol=2.0 / 255
    )


def test_test_split_builds_video_trajectory(tmp_path):
    cfg = _cfg(tmp_path)
    _bootstrap(cfg)  # create assets
    state = ss.bootstrap_scene(cfg, "test")
    # local trajectories → 120-frame spiral (scene_gen.py:267-269)
    assert state.poses_gen.shape == (120, 4, 4)
    assert state.rays_gen_split.shape[0] == 120


def test_circle_trajectory_split(tmp_path):
    cfg = _cfg(tmp_path, pose_traj="circle0_40", num_training=4)
    state = _bootstrap(cfg)
    assert state.poses_gen.shape == (4, 4, 4)
    test_state = ss.bootstrap_scene(cfg, "test")
    # global trajectories → 360-frame path (scene_gen.py:273-279)
    assert test_state.poses_gen.shape == (360, 4, 4)


def test_append_generated_view(tmp_path):
    state = _bootstrap(_cfg(tmp_path))
    h, w = HW
    img = np.random.default_rng(0).uniform(0, 1, (h, w, 3)).astype(np.float32)
    depth = np.full((h, w), 3.0, np.float32)
    mask = np.zeros((h, w), np.float32)
    s2 = ss.append_generated_view(state, img, depth, mask)
    assert s2.rgbs_gen_split.shape[0] == 2
    assert state.rgbs_gen_split.shape[0] == 1  # original untouched
