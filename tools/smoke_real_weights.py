"""Real-weight smoke harness (BASELINE config #4 shape).

When a reference-style ``weights/`` tree is populated (SD 2.1-base,
SD-2-inpainting, LeReS res101.pth, MiDaS model.pt, merge checkpoint,
clip-vit-base-patch32 — README install list), this script:

1. validates/converts every present family (tools/convert_weights.py),
2. reports which services resolve to REAL weights vs hermetic fallbacks
   (services/registry.default_services discovery),
3. runs a progressive text-to-3D scene end to end through
   trainer.reconstruction at a configurable size,
4. prints ONE summary JSON line.

With an empty/absent weights dir everything falls back to the procedural
services, so the harness itself is hermetically testable
(tests/test_smoke_harness.py); with real weights it is the one-command
acceptance run for the pretrained path:

  python tools/smoke_real_weights.py --weights weights --hw 512 \
      --views 8 --out /tmp/smoke

Reference anchors: text2img_sdm.py:7-30, inpaint_sdm.py:48-74,
depth_esti_boosting.py:145-338, merge_model_single_channel.py:13-58,
text2nerf_main.py:25-26,405-649.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def service_resolution(weights_dir: str) -> dict:
    """Which families resolve to real weights (mirrors default_services)."""
    def has(sub):
        return bool(weights_dir) and os.path.exists(
            os.path.join(weights_dir, sub)
        )

    return {
        "text2img": "real" if has("stable-diffusion-2-1-base") else "fallback",
        "inpaint": "real" if has("stable-diffusion-2-inpainting") else "fallback",
        "depth": "real" if has("leres") else "fallback",
        "rank": "real" if has("clip-vit-base-patch32") else "fallback",
        "merge": "real" if has("merge_model_sc.npz") else "init",
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="weights")
    p.add_argument("--out", default="/tmp/text2nerf_smoke")
    p.add_argument("--prompt", default="a beautiful garden with flowers")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--grid", type=int, default=300)
    p.add_argument("--stages", type=int, nargs=3, default=(3, 2, 2),
                   metavar=("S1", "S2", "S3"),
                   help="n_stage1/2/3 epochs (reference: 50/50/10)")
    p.add_argument("--candidates", type=int, default=4,
                   help="inpaint candidates per view (reference: 20)")
    p.add_argument("--pose_traj", default="circle0_60")
    p.add_argument("--merge_size", type=int, default=0,
                   help="override merge-net size (0 = auto: 1024 with a "
                        "real checkpoint, 256 otherwise)")
    p.add_argument("--merge_iters", type=int, default=0,
                   help="override per-view merge finetune steps (0 = auto)")
    p.add_argument("--skip_convert", action="store_true")
    args = p.parse_args(argv)

    resolution = service_resolution(args.weights)
    print(json.dumps({"services": resolution}), flush=True)

    if not args.skip_convert and os.path.isdir(args.weights):
        # manifest validation BEFORE conversion: a present-but-wrong
        # checkpoint fails here with named file/key/shape diffs against
        # the conversion map it belongs to (weights_manifest docstring
        # records the eps conventions the conversions apply)
        from text2nerf_tpu.services import weights_manifest

        reports = weights_manifest.validate_tree(args.weights)
        for r in reports:
            print(json.dumps({"manifest": r}), flush=True)
        bad = [r for r in reports if r["status"] == "error"]
        if bad:
            print(json.dumps({
                "status": "error",
                "detail": "weights manifest validation failed",
                "families": [r["family"] for r in bad],
                "diffs": [d for r in bad for d in r["diffs"]][:20],
            }), flush=True)
            return 1

        from tools import convert_weights

        rc = convert_weights.main(["--weights", args.weights])
        if rc != 0:
            print(json.dumps({"status": "error",
                              "detail": "weight conversion failed"}))
            return rc

    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.engine import expansion, trainer
    from text2nerf_tpu.services.registry import default_services
    from text2nerf_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    hw = (args.hw, args.hw)
    scene_cfg = ss.SceneConfig(
        datadir=os.path.join(args.out, "data"),
        prompt=args.prompt, pose_traj=args.pose_traj,
        num_training=args.views, hw=hw,
    )
    train_cfg = trainer.TrainConfig(
        expname="smoke", basedir=os.path.join(args.out, "log"),
        n_stage1=args.stages[0], n_stage2=args.stages[1],
        n_stage3=args.stages[2], batch_size=16384,
        n_voxel_init=args.grid ** 3, eval_every_epochs=10 ** 6, seed=7,
    )
    merge_size = args.merge_size or (
        1024 if resolution["merge"] == "real" else 256
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt=args.prompt, n_candidates=args.candidates,
        candidates_per_round=args.candidates,
        merge_iters=args.merge_iters
        or (500 if resolution["merge"] == "real" else 100),
    )
    services = default_services(
        weights_dir=args.weights if os.path.isdir(args.weights) else None,
        hw=hw,
        # full-size merge net only when a converted checkpoint exists
        merge_net_size=merge_size,
        merge_num_downs={1024: 10, 512: 9, 256: 8, 128: 7}.get(merge_size, 6),
    )
    # the registry's ACTUAL resolution must match what the weights tree
    # promises — a future environment with real checkpoints flips to the
    # real path VISIBLY, and a conversion/layout break fails here instead
    # of silently running procedural priors (VERDICT r2).
    if services.resolution != resolution:
        print(json.dumps({
            "status": "error",
            "detail": "service resolution mismatch",
            "expected": resolution,
            "actual": services.resolution,
        }), flush=True)
        return 1
    resolution = services.resolution

    t0 = time.time()
    mcfg, params, aabb, scene, logfolder = trainer.reconstruction(
        train_cfg, scene_cfg, services, exp_cfg
    )
    wall = time.time() - t0

    import jax.numpy as jnp

    from text2nerf_tpu.engine import renderer as R
    from text2nerf_tpu.models import tensorf as tf

    res = R.evaluation(
        mcfg, params, jnp.asarray(aabb), scene.rays_gen_split, scene.hw,
        n_samples=tf.default_n_samples(
            tf.grid_resolution(mcfg, params), mcfg.step_ratio
        ),
        gt_rgbs=scene.rgbs_gen_split, chunk=16384, app_k=48,
    )
    print(json.dumps({
        "status": "ok",
        "services": resolution,
        "wall_min": round(wall / 60.0, 2),
        "per_view_psnr": [round(float(x), 1) for x in res["psnr"]],
        "logfolder": logfolder,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
