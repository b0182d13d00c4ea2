"""Blender-style transforms_{split}.json dataset loader.

Equivalent of YourOwnDataset (/root/reference/dataLoader/your_own_data.py:
13-129), the second entry of the reference's dataset registry
(dataLoader/__init__.py:6-7): standard NeRF-synthetic format with
camera_angle_x intrinsics and per-frame transform matrices.
"""

from __future__ import annotations

import json
import math
import os
from typing import Tuple

import numpy as np
import jax.numpy as jnp

from ..ops import rays as ray_ops
from . import io as scene_io
from .scene_state import SceneState

BLENDER2OPENCV = np.array(
    [[1, 0, 0, 0], [0, -1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]], np.float64
)


def load_blender_scene(
    datadir: str,
    split: str = "train",
    downsample: float = 1.0,
    scene_bound: float = 1.5,
    near_far: Tuple[float, float] = (2.0, 6.0),
    white_bg: bool = True,
) -> SceneState:
    """Load transforms_{split}.json into a SceneState."""
    with open(os.path.join(datadir, f"transforms_{split}.json")) as f:
        meta = json.load(f)

    frame0 = meta["frames"][0]
    img0 = scene_io.read_rgb(
        os.path.join(datadir, frame0["file_path"] + ".png")
    )
    h = int(img0.shape[0] / downsample)
    w = int(img0.shape[1] / downsample)
    focal = 0.5 * w / math.tan(0.5 * meta["camera_angle_x"])
    intrinsic = (focal, focal, w / 2.0, h / 2.0)

    poses, images = [], []
    import cv2

    for frame in meta["frames"]:
        c2w = np.array(frame["transform_matrix"]) @ BLENDER2OPENCV
        poses.append(c2w.astype(np.float32))
        path = os.path.join(datadir, frame["file_path"] + ".png")
        import imageio.v2 as imageio

        img = np.asarray(imageio.imread(path)).astype(np.float32) / 255.0
        if downsample != 1.0:
            img = cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)
        if img.shape[-1] == 4:  # blend alpha to white (your_own_data.py)
            img = img[..., :3] * img[..., 3:] + (1 - img[..., 3:])
        images.append(img)
    poses = np.stack(poses)
    images = np.stack(images)

    dirs = ray_ops.ray_directions(h, w, (focal, focal), (w / 2, h / 2))
    rays_split = np.asarray(ray_ops.rays_from_poses(dirs, jnp.asarray(poses)))

    n = poses.shape[0]
    state = SceneState(
        hw=(h, w), intrinsic=intrinsic,
        scene_bbox=np.array(
            [[-scene_bound] * 3, [scene_bound] * 3], np.float32
        ),
        near_far=near_far, white_bg=white_bg,
        poses_gen=poses, poses_support=poses[:1],
        all_rays=rays_split.reshape(-1, 6),
        all_rgbs=images.reshape(-1, 3),
        all_depth=np.zeros((n * h * w,), np.float32),
        rays_gen_split=rays_split,
        rgbs_gen_split=images,
        depth_gen_split=np.zeros((n, h, w), np.float32),
        masks_gen_split=np.ones((n, h, w), np.float32),
        rays_support_split=rays_split,
        render_path=poses,
    )
    return state


DATASET_REGISTRY = {
    "scene_gen": "text2nerf_tpu.data.scene_state:bootstrap_scene",
    "own_data": "text2nerf_tpu.data.blender:load_blender_scene",
}
