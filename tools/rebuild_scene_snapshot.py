"""Rebuild a corrupted/lost scene_snapshot.npz from the DIBR artifact tree.

Every quantity the snapshot stores is recoverable from a run's on-disk
artifacts (the same layout the reference writes, text2nerf_main.py:80-87):

- view 0 + poses + bbox: re-running ``bootstrap_scene`` against the run's
  cached data dir (seed image/depth/poses on disk → fully deterministic,
  scene_gen.py:129-146 caching semantics);
- generated view v >= 1:
    rgb   = DIBR/rgbs/%05d.png            (pre-filter, uint8)
    depth = DIBR/depth/%05d_depth_finetuning2.png
            (uint16 of (merged+1)*32768 → depth = png/12000 + push_depth,
             engine/expansion.py step 6)
    mask  = 1 - DIBR/mask/%05d.png        (the inpaint mask)
  then the deterministic sparse bilateral filter (expansion step 7) is
  re-applied, matching ``append_generated_view``'s inputs up to the PNG
  uint8/uint16 quantization (~4e-3 rgb, ~1e-4 depth).

Usage:
  python tools/rebuild_scene_snapshot.py --logfolder <run log dir> \
      --datadir <run data dir> --prompt "..." [--views N] [--hw 512]

Writes ``<logfolder>/scene_snapshot.npz`` (atomically) after verifying it
loads through ``load_scene_snapshot``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--logfolder", required=True)
    p.add_argument("--datadir", required=True)
    p.add_argument("--prompt", required=True)
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--pose_traj", default="circle0_60")
    p.add_argument("--push_depth", type=float, default=2.0)
    args = p.parse_args(argv)

    import imageio.v2 as imageio

    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.ops import filters as filter_ops

    scene_cfg = ss.SceneConfig(
        datadir=args.datadir, prompt=args.prompt, pose_traj=args.pose_traj,
        num_training=args.views, hw=(args.hw, args.hw),
        push_depth=args.push_depth,
    )
    scene = ss.bootstrap_scene(scene_cfg, "train")
    print(f"bootstrap: view 0 rebuilt from {args.datadir}")

    dibr = os.path.join(args.logfolder, "DIBR")
    v = 1
    while os.path.isfile(os.path.join(dibr, "rgbs", "%05d.png" % v)):
        rgb = imageio.imread(
            os.path.join(dibr, "rgbs", "%05d.png" % v)
        ).astype(np.float32) / 255.0
        fin = imageio.imread(
            os.path.join(dibr, "depth", "%05d_depth_finetuning2.png" % v)
        ).astype(np.float32)
        depth = fin / 12000.0 + args.push_depth
        mask_known = imageio.imread(
            os.path.join(dibr, "mask", "%05d.png" % v)
        ).astype(np.float32) / 255.0
        inpaint_mask = 1.0 - mask_known
        # expansion step 7 (deterministic)
        img_j, depth_j = filter_ops.sparse_bilateral_filtering(
            depth, rgb, filter_size=(5, 5, 3, 3),
            depth_threshold=0.02, num_iter=4,
        )
        scene = ss.append_generated_view(
            scene, np.asarray(img_j), np.asarray(depth_j), inpaint_mask
        )
        print(f"view {v}: recovered from DIBR artifacts")
        v += 1

    snap = os.path.join(args.logfolder, "scene_snapshot.npz")
    ss.save_scene_snapshot(snap, scene)
    # verify it round-trips with the pools the trainer will ask for
    restored = ss.load_scene_snapshot(
        snap, n_views_pools=v, trans_range=scene_cfg.trans_range,
        use_support_set=scene_cfg.use_support_set,
    )
    assert restored.rgbs_gen_split.shape[0] == v, restored.rgbs_gen_split.shape
    print(f"wrote {snap}: {v} views, load-verified")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
