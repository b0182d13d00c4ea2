"""Scene state: the functional replacement for SceneGenDataset.

The reference mutates a torch Dataset in place as the scene grows
(/root/reference/dataLoader/scene_gen.py:103-443,
/root/reference/text2nerf_main.py:296-399).  Here the scene is an explicit
state object of numpy/JAX arrays; the bootstrap and every expansion step
return new state, which keeps the progressive trainer functional and
resumable.

Generative priors (text2img / depth estimation) are injected as callables
so the whole pipeline is hermetically testable (the reference constructs
pipelines inline and cannot be faked — SURVEY §4).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, Dict, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..utils.atomic_io import atomic_savez
from ..ops import rays as ray_ops
from ..ops import splat as splat_ops
from ..ops import filters as filter_ops
from . import io as scene_io
from . import trajectories as traj


def formatted_ray_pool(images, depths, masks, poses, intrinsic, h, w):
    """Flattened masked training pools + per-view split tensors.

    Mirrors produce_formatted_data train mode (scene_gen.py:31-86):
    normalized ray directions, per-view rays [o|d], masked selection into
    flat pools.

    Returns (rays [M,6], rgbs [M,3], depths [M],
             rays_split [N,H*W,6], rgbs_split [N,H,W,3], depths_split [N,H,W]).
    """
    # host-numpy ray generation (rays_split_np): the pools are numpy and
    # a device round-trip costs a ~2 s readback per support set on the
    # tunneled chip (PERF.md round 3)
    rays_split = ray_ops.rays_split_np(poses, intrinsic, h, w)

    images = np.asarray(images, np.float32)
    depths = np.asarray(depths, np.float32)
    masks = np.asarray(masks)

    n = poses.shape[0]
    sel_rays, sel_rgbs, sel_depths = [], [], []
    for i in range(n):
        m = masks[i].reshape(-1) > 0.5
        sel_rays.append(rays_split[i][m])
        sel_rgbs.append(images[i].reshape(-1, 3)[m])
        sel_depths.append(depths[i].reshape(-1)[m])
    return (
        np.concatenate(sel_rays, 0),
        np.concatenate(sel_rgbs, 0),
        np.concatenate(sel_depths, 0),
        rays_split,
        images.reshape(n, h, w, 3),
        depths.reshape(n, h, w),
    )


def test_ray_split(poses, intrinsic, h, w):
    """produce_formatted_data test mode (scene_gen.py:88-98)."""
    return ray_ops.rays_split_np(poses, intrinsic, h, w)


@dataclasses.dataclass
class SceneState:
    """Everything the progressive trainer needs about the growing scene."""

    hw: Tuple[int, int]
    intrinsic: Tuple[float, float, float, float]
    scene_bbox: np.ndarray            # (2, 3), ±scene_bound (scene_gen.py:117)
    near_far: Tuple[float, float]     # (0.5, 8.0) (scene_gen.py:121)
    white_bg: bool
    poses_gen: np.ndarray             # (V, 4, 4) trajectory poses
    poses_support: np.ndarray         # (9, 4, 4) support poses of view 0
    # flat masked pools over the seed's support set (stage-1 training data)
    all_rays: np.ndarray
    all_rgbs: np.ndarray
    all_depth: np.ndarray
    # per-view split tensors for the generation loop
    rays_gen_split: np.ndarray        # (V, H*W, 6)
    rgbs_gen_split: np.ndarray        # (k, H, W, 3) — grows per expansion
    depth_gen_split: np.ndarray       # (k, H, W)
    masks_gen_split: np.ndarray       # (k, H, W) inpaint masks
    # support-view split tensors (for preview rendering)
    rays_support_split: np.ndarray
    # per-view ray-pool updates: view id -> (rays, rgbs, depths)
    updates: Dict[str, Tuple[np.ndarray, np.ndarray, np.ndarray]] = (
        dataclasses.field(default_factory=dict)
    )
    render_path: Optional[np.ndarray] = None  # test split video poses


@dataclasses.dataclass
class SceneConfig:
    """Bootstrap options (subset of e_opt.py flags that shape the scene)."""

    datadir: str
    prompt: str = "a cozy living room"
    negative_prompt: str = "blurry, bad art, blurred, text, watermark"
    pose_traj: str = "local_fixed"
    num_training: int = 24
    angle: float = 0.2
    trans_range: float = 0.2
    push_depth: float = 2.0
    scene_bound: float = 8.0
    hw: Tuple[int, int] = (512, 512)
    use_support_set: bool = True
    regen_pose: bool = True
    depth_net_type: int = 2
    white_bg: bool = True
    filter_size: Tuple[int, ...] = (5, 5, 3, 3)
    num_filter_iter: int = 4


def bootstrap_scene(
    cfg: SceneConfig,
    split: str = "train",
    text2img: Optional[Callable[[str, str], np.ndarray]] = None,
    estimate_depth: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    auto_accept: bool = True,
    confirm: Optional[Callable[[np.ndarray], bool]] = None,
    log=None,
) -> SceneState:
    """Build the initial scene (SceneGenDataset.read_meta, scene_gen.py:159-423).

    - seed image from disk or the injected ``text2img`` service
      (scene_gen.py:161-178);
    - metric depth from disk or the injected ``estimate_depth`` service +
      depth_process (scene_gen.py:189-208);
    - sparse bilateral filtering of the seed RGBD (scene_gen.py:219-225);
    - intrinsics rule f=max(H,W), c=center (scene_gen.py:229-237);
    - trajectory + support poses + support-set warping (scene_gen.py:240-340).

    ``auto_accept`` replaces the reference's interactive stdin approval loop
    (scene_gen.py:163-173) for batch jobs; pass a ``confirm`` callable to
    keep a human gate (regenerates while it returns False).

    ``log`` (a tracing.MetricsLogger) records per-sub-phase wall clocks as
    ``phase/bootstrap_<name>_s`` rows.
    """
    from ..engine.tracing import phase_timer

    h, w = cfg.hw
    paths = scene_io.scene_paths(cfg.datadir)
    for p in paths.values():
        os.makedirs(p, exist_ok=True)

    # ---- seed image -------------------------------------------------------
    seed_path = os.path.join(paths["rgb"], "00000.png")
    with phase_timer("bootstrap_seed_image", log):
        if os.path.isfile(seed_path):
            img = scene_io.read_rgb(seed_path)
        else:
            if text2img is None:
                raise FileNotFoundError(
                    f"no seed image at {seed_path} and no text2img service given"
                )
            while True:
                img = np.asarray(text2img(cfg.prompt, cfg.negative_prompt))
                if auto_accept or confirm is None or confirm(img):
                    break
            scene_io.write_rgb(seed_path, img)

    # crop to square if needed (scene_gen.py:180-187)
    ih, iw = img.shape[:2]
    if ih != iw:
        s = min(ih, iw)
        img = img[:s, :s]

    # ---- depth ------------------------------------------------------------
    depth_png = os.path.join(paths["depth"], "00000.png")
    depth_npy = os.path.join(paths["depth"], "00000.npy")
    with phase_timer("bootstrap_depth", log):
        if os.path.isfile(depth_png):
            depth = scene_io.depth_process(
                scene_io.read_depth_raw(depth_png), cfg.depth_net_type,
                push_depth=cfg.push_depth,
            )
        elif os.path.isfile(depth_npy):
            # scene_gen.py:206-208
            depth = (np.load(depth_npy) / 2.0).astype(np.float32)
        else:
            if estimate_depth is None:
                raise FileNotFoundError(
                    f"no depth at {depth_png} and no depth service given"
                )
            counts = np.asarray(estimate_depth(img))
            scene_io.write_depth_png(depth_png, counts)
            depth = scene_io.depth_process(
                counts, cfg.depth_net_type, push_depth=cfg.push_depth
            )
    if depth.shape[0] != img.shape[0]:
        import cv2

        depth = cv2.resize(depth, img.shape[:2][::-1], interpolation=cv2.INTER_NEAREST)

    # resize to target resolution (scene_gen.py:212-216)
    if img.shape[:2] != (h, w):
        import cv2

        img = cv2.resize(img, (w, h), interpolation=cv2.INTER_NEAREST)
        depth = cv2.resize(depth, (w, h), interpolation=cv2.INTER_NEAREST)

    # ---- seed RGBD filtering (scene_gen.py:219-225) ------------------------
    with phase_timer("bootstrap_bilateral", log):
        img_j, depth_j = filter_ops.sparse_bilateral_filtering(
            depth, img, filter_size=cfg.filter_size,
            depth_threshold=0.02, num_iter=cfg.num_filter_iter,
        )
        img, depth = np.asarray(img_j), np.asarray(depth_j)

    # ---- intrinsics + poses -----------------------------------------------
    fx, fy, cx, cy = ray_ops.default_intrinsics(h, w)
    intrinsic = (fx, fy, cx, cy)
    existing = scene_io.load_poses(paths["cam"])
    if existing is not None and not cfg.regen_pose:
        poses = existing
    else:
        poses = traj.training_trajectory(
            cfg.pose_traj, cfg.num_training, cfg.angle, cfg.trans_range
        )
        k = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        scene_io.save_poses(paths["cam"], poses, k)

    # support poses (scene_gen.py:294-300)
    if cfg.pose_traj == "local_circle":
        poses_sprt = traj.local_orbit_poses(poses[0], range_center=cfg.trans_range)
    else:
        poses_sprt = traj.local_fixed_poses(
            poses[0], angle=cfg.angle, range_center=cfg.trans_range,
            range_yaw=0.6, range_pitch=0.2,
        )

    if split != "train":
        vposes = traj.test_trajectory(
            cfg.pose_traj, poses[0], cfg.angle, cfg.trans_range
        )
        rays_split = test_ray_split(vposes, intrinsic, h, w)
        return SceneState(
            hw=(h, w), intrinsic=intrinsic,
            scene_bbox=np.array(
                [[-cfg.scene_bound] * 3, [cfg.scene_bound] * 3], np.float32
            ),
            near_far=(0.5, 8.0), white_bg=cfg.white_bg,
            poses_gen=vposes, poses_support=poses_sprt,
            all_rays=rays_split.reshape(-1, 6),
            all_rgbs=np.zeros((0, 3), np.float32),
            all_depth=np.zeros((0,), np.float32),
            rays_gen_split=rays_split,
            rgbs_gen_split=np.zeros((0, h, w, 3), np.float32),
            depth_gen_split=np.zeros((0, h, w), np.float32),
            masks_gen_split=np.zeros((0, h, w), np.float32),
            rays_support_split=rays_split,
            render_path=vposes,
        )

    # ---- support set via warping (scene_gen.py:302-334) --------------------
    # sub-timers split the three cost regimes (round-4 report_phases put
    # this phase at 205 s of a 512² bootstrap): device warp programs +
    # first-compile, tunnel readback of the warped stack, host-numpy pool
    with phase_timer("bootstrap_support_pool", log):
        if cfg.use_support_set:
            with phase_timer("bootstrap_sprt_warp", log):
                rgbs_w, masks_w, depth_w = splat_ops.warp_one_to_many(
                    jnp.asarray(img), jnp.asarray(depth),
                    jnp.asarray(poses_sprt[0]),
                    jnp.asarray(poses_sprt[1:]), intrinsic,
                )
            with phase_timer("bootstrap_sprt_readback", log):
                images = np.concatenate([img[None], np.asarray(rgbs_w)], 0)
                masks = np.concatenate(
                    [np.ones((1, h, w), np.int32), np.asarray(masks_w)], 0
                )
                depths = np.concatenate([depth[None], np.asarray(depth_w)], 0)
            with phase_timer("bootstrap_sprt_raypool", log):
                pool = formatted_ray_pool(
                    images, depths, masks, poses_sprt, intrinsic, h, w
                )
        else:
            pool = formatted_ray_pool(
                img[None], depth[None], np.ones((1, h, w), np.int64),
                poses_sprt[:1], intrinsic, h, w,
            )
    all_rays, all_rgbs, all_depth, rays_split, rgbs_split, depth_split = pool
    rays_support_split = (
        rays_split
        if cfg.use_support_set
        else test_ray_split(poses_sprt, intrinsic, h, w)
    )

    state = SceneState(
        hw=(h, w), intrinsic=intrinsic,
        scene_bbox=np.array(
            [[-cfg.scene_bound] * 3, [cfg.scene_bound] * 3], np.float32
        ),
        near_far=(0.5, 8.0), white_bg=cfg.white_bg,
        poses_gen=poses, poses_support=poses_sprt,
        all_rays=all_rays, all_rgbs=all_rgbs, all_depth=all_depth,
        rays_gen_split=test_ray_split(poses, intrinsic, h, w),
        rgbs_gen_split=rgbs_split[:1],
        depth_gen_split=depth_split[:1],
        masks_gen_split=np.ones((1, h, w), np.float32),
        rays_support_split=rays_support_split,
    )
    # seed view-0 pool (scene_gen.py:337-340)
    state.updates["00000"] = (all_rays, all_rgbs, all_depth)
    return state


def supervised_z_floor(
    scene: SceneState, margin: float = 0.1, ceiling: float = 2.0,
    floor: float = 0.05,
) -> float:
    """Scene-aware eval-time world-z cull threshold.

    The reference culls samples with world z <= 2 at eval ("Eckert"
    filter, tensorBase.py:458-462) to hide unsupervised near-camera
    floaters.  Scene-generation trajectories can place SUPERVISED content
    below z = 2 — the r4c run's view 3 held 24.6% of its GT depth there
    and the constant cull erased it (9.1 dB eval on a 36.8 dB field;
    reports/diag_zmin_probe_r4c.json).  This returns the tightest cull
    that keeps every generated view's GT-depth geometry:
    min(ceiling, min-over-views world z of GT-depth points - margin),
    clamped to ``floor`` so the cull never fully disappears.

    Probe on the r4c checkpoint (tools/diag_view_collapse.py --zmins):
    at the scene floor 1.1 every view matches or beats the constant cull
    (39.7/37.4/37.0/36.9 vs 39.8/37.4/36.9/9.1 at compact K=64) — the
    floaters the filter exists for sit closer than the supervised
    content, so the scene-aware cull still hides them.
    """
    n_views = int(np.asarray(scene.rgbs_gen_split).shape[0])
    z_min = float("inf")
    for v in range(n_views):
        rays = np.asarray(scene.rays_gen_split[v], np.float32)
        d = np.asarray(scene.depth_gen_split[v], np.float32).reshape(-1)
        z = rays[:, 2] + rays[:, 5] * d
        z_min = min(z_min, float(z.min()))
    if not np.isfinite(z_min):
        return ceiling
    return max(floor, min(ceiling, z_min - margin))


def save_scene_snapshot(path: str, scene: SceneState):
    """Persist the resumable part of the scene: generated view splits,
    masks, poses.  Ray pools are derived data (support warps are
    deterministic) and get rebuilt on load."""
    atomic_savez(
        path,
        hw=np.asarray(scene.hw),
        intrinsic=np.asarray(scene.intrinsic),
        scene_bbox=scene.scene_bbox,
        near_far=np.asarray(scene.near_far),
        white_bg=np.asarray(scene.white_bg),
        poses_gen=scene.poses_gen,
        poses_support=scene.poses_support,
        rgbs_gen_split=scene.rgbs_gen_split,
        depth_gen_split=scene.depth_gen_split,
        masks_gen_split=scene.masks_gen_split,
    )


def rebuild_view_pool(
    scene: SceneState, view_idx: int, trans_range: float, use_support_set: bool
):
    """Recompute updates['%05d' % view_idx] from the stored view splits —
    the deterministic support-warp + pool formatting of
    text2nerf_main.py:379-399 (and scene bootstrap for view 0)."""
    from . import trajectories as traj

    h, w = scene.hw
    img = np.asarray(scene.rgbs_gen_split[view_idx])
    depth = np.asarray(scene.depth_gen_split[view_idx])
    mask = np.asarray(scene.masks_gen_split[view_idx])
    if use_support_set:
        if view_idx == 0:
            poses_support = scene.poses_support
            mask0 = np.ones((h, w), np.float32)
        else:
            poses_support = traj.local_fixed_poses(
                scene.poses_gen[view_idx], angle=0, range_center=trans_range,
                range_yaw=0.6, range_pitch=0.2,
            )
            mask0 = mask
        if view_idx > 0:
            # masks come from warping only the inpainted region
            # (text2nerf_main.py:385-387) — fused with the content warp
            rgbs_w, _, depth_w, masks_w = splat_ops.warp_one_to_many_with_mask(
                jnp.asarray(img), jnp.asarray(depth),
                jnp.asarray(poses_support[0]), jnp.asarray(poses_support[1:]),
                scene.intrinsic, extra_mask=mask,
            )
        else:
            rgbs_w, masks_w, depth_w = splat_ops.warp_one_to_many(
                jnp.asarray(img), jnp.asarray(depth),
                jnp.asarray(poses_support[0]), jnp.asarray(poses_support[1:]),
                scene.intrinsic,
            )
        images = np.concatenate([img[None], np.asarray(rgbs_w)], 0)
        masks = np.concatenate([mask0[None], np.asarray(masks_w)], 0)
        depths = np.concatenate([depth[None], np.asarray(depth_w)], 0)
        rays_p, rgbs_p, depths_p, _, _, _ = formatted_ray_pool(
            images, depths, masks, poses_support, scene.intrinsic, h, w
        )
    else:
        m = np.ones((h, w), np.float32) if view_idx == 0 else mask
        rays_p, rgbs_p, depths_p, _, _, _ = formatted_ray_pool(
            img[None], depth[None], m[None],
            scene.poses_gen[view_idx][None], scene.intrinsic, h, w,
        )
    return rays_p, rgbs_p, depths_p


def load_scene_snapshot(
    path: str, n_views_pools: int, trans_range: float = 0.2,
    use_support_set: bool = True,
) -> SceneState:
    """Restore a SceneState from a snapshot, rebuilding the ray pools for
    views [0, n_views_pools)."""
    data = np.load(path)
    h, w = (int(x) for x in data["hw"])
    intrinsic = tuple(float(x) for x in data["intrinsic"])
    poses = data["poses_gen"]
    state = SceneState(
        hw=(h, w), intrinsic=intrinsic,
        scene_bbox=data["scene_bbox"],
        near_far=tuple(float(x) for x in data["near_far"]),
        white_bg=bool(data["white_bg"]),
        poses_gen=poses, poses_support=data["poses_support"],
        all_rays=np.zeros((0, 6), np.float32),
        all_rgbs=np.zeros((0, 3), np.float32),
        all_depth=np.zeros((0,), np.float32),
        rays_gen_split=test_ray_split(poses, intrinsic, h, w),
        rgbs_gen_split=data["rgbs_gen_split"],
        depth_gen_split=data["depth_gen_split"],
        masks_gen_split=data["masks_gen_split"],
        rays_support_split=test_ray_split(data["poses_support"], intrinsic, h, w),
    )
    for v in range(n_views_pools):
        state.updates["%05d" % v] = rebuild_view_pool(
            state, v, trans_range, use_support_set
        )
    if "00000" in state.updates:
        state = dataclasses.replace(
            state,
            all_rays=state.updates["00000"][0],
            all_rgbs=state.updates["00000"][1],
            all_depth=state.updates["00000"][2],
        )
    return state


def append_generated_view(
    state: SceneState, img: np.ndarray, depth: np.ndarray, inpaint_mask: np.ndarray
) -> SceneState:
    """Append a completed RGBD view to the generation splits
    (text2nerf_main.py:296-299)."""
    state = dataclasses.replace(
        state,
        rgbs_gen_split=np.concatenate(
            [state.rgbs_gen_split, np.asarray(img, np.float32)[None]], 0
        ),
        depth_gen_split=np.concatenate(
            [state.depth_gen_split, np.asarray(depth, np.float32)[None]], 0
        ),
        masks_gen_split=np.concatenate(
            [state.masks_gen_split, np.asarray(inpaint_mask, np.float32)[None]], 0
        ),
        updates=dict(state.updates),
    )
    return state
