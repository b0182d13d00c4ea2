"""Full-schedule production-size quality run (VERDICT r3 item 3).

Runs the reference's COMPLETE schedule — n_stage1=50, n_stage2=50 per
generated view, n_stage3=10 (e_opt.py:26-28, text2nerf_main.py:468) — at
the production configuration (512², 300³ grid, batch 16384, circle
trajectory) with the procedural priors, mid-run resume enabled, and
records per-view PSNR/SSIM + wall clock as ONE JSON line (also appended
to --report).

Designed to survive tunnel flaps: re-running the same command resumes
from the last stage-boundary checkpoint (TrainConfig.resume) — wrap in a
retry loop:

  for i in $(seq 1 20); do
      python tools/run_full_schedule.py --out /tmp/fullsched && break
      sleep 120
  done
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _newest_mtime(root):
    newest = 0.0
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            try:
                newest = max(newest, os.path.getmtime(os.path.join(dirpath, fn)))
            except OSError:
                pass
    return newest


def _start_stall_watchdog(out_dir, stall_s):
    """Exit(3) when nothing under *out_dir* has been written for *stall_s*.

    The documented tunnel failure mode is a dispatch that HANGS (ADVICE
    r4): a healthy run writes metrics.jsonl every ~12 s and resume
    checkpoints every 5 epochs, so prolonged mtime silence means the
    process is wedged on a dead dispatch.  os._exit (not sys.exit)
    because the wedged thread holds the runtime; the external retry loop
    re-enters with resume=True from the last checkpoint.
    """
    import threading

    t_start = time.time()

    def _watch():
        while True:
            time.sleep(60)
            newest = _newest_mtime(out_dir)
            ref = newest if newest else t_start
            if time.time() - ref > stall_s:
                print(
                    f"STALL: no write under {out_dir} for {stall_s}s; "
                    "exiting 3 for external resume", file=sys.stderr, flush=True,
                )
                os._exit(3)

    threading.Thread(target=_watch, daemon=True, name="stall-watchdog").start()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/text2nerf_fullsched")
    p.add_argument("--prompt", default="a beautiful garden with flowers")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--grid", type=int, default=300)
    # coarse-to-fine (VERDICT r4 item 1): start the factor grids at
    # --grid_init^3 and upsample toward --grid^3 at the --upsamp global
    # steps (TensoRF's own recipe, reference machinery
    # models/tensoRF.py:258-264 parsed-but-dead at e_opt.py:132-133).
    # Milestones should complete within stage 1 so every expansion
    # renders a full-resolution field.  0 disables (fixed grid).
    p.add_argument("--grid_init", type=int, default=0)
    p.add_argument("--upsamp", type=int, nargs="*",
                   default=(1000, 1500, 2000, 2750, 3500))
    # stage-3 tail rebalance (VERDICT r4 item 2): 'tail_deficit'
    # draws stage-3 batches per-view ∝ (1/expected exposure)^gamma
    p.add_argument("--stage3_balance", default="uniform")
    p.add_argument("--stage3_gamma", type=float, default=1.0)
    p.add_argument("--stages", type=int, nargs=3, default=(50, 50, 10))
    p.add_argument("--candidates", type=int, default=4)
    p.add_argument("--pose_traj", default="circle0_60")
    p.add_argument("--report", default="")
    p.add_argument("--eval_every", type=int, default=10 ** 6,
                   help="epoch interval for intermediate evals (default: "
                        "stage boundaries only)")
    p.add_argument("--retries", type=int, default=0,
                   help="in-process resume-and-retry count for transient "
                        "failures (tunnel flaps)")
    p.add_argument("--stall_exit_s", type=int, default=1500,
                   help="exit(3) when NOTHING under --out changes for this "
                        "many seconds (a hung tunnel dispatch; the outer "
                        "retry loop re-enters with resume).  0 disables.  "
                        "Default 1500 s clears the worst silent windows "
                        "(8-min first Pallas compile, 206-s bootstrap).")
    args = p.parse_args(argv)

    if args.stall_exit_s:
        _start_stall_watchdog(args.out, args.stall_exit_s)

    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.engine import expansion, trainer
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
    c2f = bool(args.grid_init) and args.grid_init < args.grid
    train_cfg = trainer.TrainConfig(
        expname="fullsched", basedir=os.path.join(args.out, "log"),
        n_stage1=args.stages[0], n_stage2=args.stages[1],
        n_stage3=args.stages[2], batch_size=16384,
        n_voxel_init=(args.grid_init if c2f else args.grid) ** 3,
        n_voxel_final=args.grid ** 3,
        upsamp_list=tuple(args.upsamp) if c2f else (),
        stage3_balance=args.stage3_balance,
        stage3_balance_gamma=args.stage3_gamma,
        eval_every_epochs=args.eval_every, seed=7,
        resume=True, resume_every_epochs=5, vis_support_views=False,
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt=args.prompt, n_candidates=args.candidates,
        candidates_per_round=args.candidates, merge_iters=100,
    )
    from text2nerf_tpu.services.registry import default_services

    services = default_services(
        weights_dir=None, hw=hw, merge_net_size=256, merge_num_downs=8
    )

    t0 = time.time()
    # in-process retry: the periodic resume checkpoints (atomic, see
    # utils/atomic_io) make reconstruction restartable after tunnel
    # flaps / transient device errors; SIGKILL-level deaths still need an
    # external loop re-running this command (resume picks up the same way)
    for attempt in range(args.retries + 1):
        try:
            mcfg, params, aabb, scene, logfolder = trainer.reconstruction(
                train_cfg, scene_cfg, services, exp_cfg
            )
            break
        except Exception:
            if attempt == args.retries:
                raise
            import traceback

            traceback.print_exc()
            print(f"attempt {attempt + 1} failed; resuming in 60 s",
                  flush=True)
            time.sleep(60)
    wall_min = (time.time() - t0) / 60.0

    import jax.numpy as jnp
    import numpy as np

    from text2nerf_tpu.engine import renderer as R
    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.data import scene_state as ss

    # compute_extra_metrics: SSIM on the float renders inside evaluation
    # (one metric implementation, not a hand-rolled uint8 copy here).
    # eval_z_min: the scene-aware floater cull — the constant 2.0 erased
    # view 3 of the r4c run (9.09 dB on a 36.8 dB field; see
    # supervised_z_floor + reports/diag_zmin_probe_r4c.json)
    res = R.evaluation(
        mcfg, params, jnp.asarray(aabb), scene.rays_gen_split, scene.hw,
        n_samples=tf.default_n_samples(
            tf.grid_resolution(mcfg, params), mcfg.step_ratio
        ),
        gt_rgbs=scene.rgbs_gen_split, chunk=16384, app_k=48,
        eval_z_min=ss.supervised_z_floor(scene),
        compute_extra_metrics=True,
    )
    ssims = [float(s) for s in res["ssim"]]
    summary = {
        "status": "ok",
        "schedule": list(args.stages),
        "hw": args.hw, "grid": args.grid, "views": args.views,
        "grid_init": args.grid_init if c2f else args.grid,
        "upsamp": list(args.upsamp) if c2f else [],
        "stage3_balance": args.stage3_balance,
        "stage3_gamma": args.stage3_gamma,
        "wall_min_this_attempt": round(wall_min, 2),
        "per_view_psnr": [round(float(x), 2) for x in res["psnr"]],
        "per_view_ssim": [round(s, 3) for s in ssims],
        "mean_psnr": round(float(np.mean(res["psnr"])), 2),
        "mean_ssim": round(float(np.mean(ssims)), 3),
        "logfolder": logfolder,
    }
    line = json.dumps(summary)
    print(line, flush=True)
    if args.report:
        with open(args.report, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
