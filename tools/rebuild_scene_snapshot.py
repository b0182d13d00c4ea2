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

The scene configuration is read from the run's own ``args.txt`` dump
(written by trainer.reconstruction); any field can be overridden on the
command line.

Usage:
  python tools/rebuild_scene_snapshot.py --logfolder <run log dir>

Writes ``<logfolder>/scene_snapshot.npz`` (atomically) after verifying it
loads through ``load_scene_snapshot``.
"""

from __future__ import annotations

import argparse
import ast
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scene_config_from_args_txt(path: str):
    """Parse the trainer's args.txt dump back into a SceneConfig."""
    from text2nerf_tpu.data import scene_state as ss

    fields = {f.name: f for f in dataclasses.fields(ss.SceneConfig)}
    kw = {}
    with open(path) as f:
        for line in f:
            k, _, v = line.rstrip("\n").partition(":")
            if k not in fields:
                continue
            if fields[k].type in ("str", str):
                kw[k] = v
            else:
                kw[k] = ast.literal_eval(v)
    return ss.SceneConfig(**kw)


def _resume_next_view(logfolder: str):
    """next_view from the run's resume checkpoint, or None.

    The trainer snapshots the scene BEFORE each expansion (with
    ``next_view`` pointing at the view about to be generated), so the DIBR
    tree may hold artifacts for one view NEWER than the checkpointed loop
    state — recovering that view into the snapshot would make the resumed
    run append it twice.

    Handles both checkpoint backends (newest-mtime first when several
    exist): npz archives (``*_resume.npz`` with an embedded
    ``__loop_state__`` JSON blob) and orbax directories (``*_resume/``
    with a side ``loop_state.json`` — engine/checkpoints.save_orbax)."""
    import json

    cands = sorted(
        (n for n in os.listdir(logfolder) if n.endswith("_resume.npz")
         or (n.endswith("_resume")
             and os.path.isdir(os.path.join(logfolder, n)))),
        key=lambda n: os.path.getmtime(os.path.join(logfolder, n)),
        reverse=True,
    )
    for name in cands:
        full = os.path.join(logfolder, name)
        try:
            if name.endswith(".npz"):
                data = np.load(full)
                ls = json.loads(bytes(data["__loop_state__"].tobytes()).decode())
            else:
                with open(os.path.join(full, "loop_state.json")) as f:
                    ls = json.load(f)
            return int(ls["next_view"])
        except Exception as e:  # noqa: BLE001 — recovery tool, keep going
            print(f"warning: could not read loop state from {name}: {e}")
    return None


def rebuild(logfolder: str, scene_cfg, max_views=None) -> str:
    import imageio.v2 as imageio

    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.ops import filters as filter_ops

    if max_views is None:
        max_views = _resume_next_view(logfolder)
    if max_views is None:
        max_views = scene_cfg.num_training

    scene = ss.bootstrap_scene(scene_cfg, "train")
    print(f"bootstrap: view 0 rebuilt from {scene_cfg.datadir}")

    dibr = os.path.join(logfolder, "DIBR")
    v = 1
    while v < max_views and os.path.isfile(
        os.path.join(dibr, "rgbs", "%05d.png" % v)
    ):
        rgb = imageio.imread(
            os.path.join(dibr, "rgbs", "%05d.png" % v)
        ).astype(np.float32) / 255.0
        fin = imageio.imread(
            os.path.join(dibr, "depth", "%05d_depth_finetuning2.png" % v)
        ).astype(np.float32)
        depth = fin / 12000.0 + scene_cfg.push_depth
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

    snap = os.path.join(logfolder, "scene_snapshot.npz")
    ss.save_scene_snapshot(snap, scene)
    # verify it round-trips with the pools the trainer will ask for
    restored = ss.load_scene_snapshot(
        snap, n_views_pools=v, trans_range=scene_cfg.trans_range,
        use_support_set=scene_cfg.use_support_set,
    )
    assert restored.rgbs_gen_split.shape[0] == v, restored.rgbs_gen_split.shape
    print(f"wrote {snap}: {v} views, load-verified")
    return snap


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--logfolder", required=True)
    p.add_argument("--datadir", help="override args.txt datadir")
    p.add_argument("--prompt", help="override args.txt prompt")
    p.add_argument("--max_views", type=int, default=None,
                   help="recover only views < max_views (default: the "
                        "resume checkpoint's next_view)")
    args = p.parse_args(argv)

    args_txt = os.path.join(args.logfolder, "args.txt")
    if not os.path.isfile(args_txt):
        p.error(f"{args_txt} not found — cannot infer the scene config")
    scene_cfg = scene_config_from_args_txt(args_txt)
    overrides = {
        k: v
        for k, v in (("datadir", args.datadir), ("prompt", args.prompt))
        if v is not None
    }
    if overrides:
        scene_cfg = dataclasses.replace(scene_cfg, **overrides)
    rebuild(args.logfolder, scene_cfg, max_views=args.max_views)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
