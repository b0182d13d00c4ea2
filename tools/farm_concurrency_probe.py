"""Measure the intra-host farm's concurrency residue on REAL hardware
(VERDICT r4 item: the <15 min/scene v5e-8 claim assumed 8 concurrent
pipelines divide a host perfectly; measure instead of assuming).

Protocol (single real chip, one host core — the residue this isolates is
the HOST's, which is exactly the part that doesn't scale with chips):
  A. one full mini-pipeline solo through run_farm_parallel  -> wall_1
  B. N identical-config (distinct-prompt) pipelines concurrently, all
     pinned to the same chip                                 -> span_N

On one chip the scenes' DEVICE work serializes, so
    span_N ≈ N * device_1 + host_residue_N
and the interesting outputs are:
  - host-phase inflation: device_idle_s per scene in B vs A (GIL /
    host-contention factor g on the host-side phases),
  - overlap efficiency: sum(wall_i) / span_N (1.0 = host fully hides
    one scene's host work behind another's device work),
from which PERF.md derives the corrected v5e-8 estimate
    span_8chips ≈ max(device_1 + host_1, 8 * host_1 * g).

Usage:
  python tools/farm_concurrency_probe.py --n 2 \
      --json reports/farm_concurrency_r5.json
Config is a reduced-but-complete pipeline (all phases present: seed
bootstrap, expansion warp/inpaint/merge, 3-stage schedule, eval).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=2, help="concurrent scenes in B")
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--views", type=int, default=3)
    p.add_argument("--stages", type=int, nargs=3, default=(8, 6, 4))
    p.add_argument("--grid", type=int, default=200)
    p.add_argument("--work", default="/root/repo/.runs/farm_probe")
    p.add_argument("--json", default="")
    args = p.parse_args(argv)

    import jax

    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.engine import expansion, trainer
    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.parallel import scene_farm as farm
    from text2nerf_tpu.services.registry import default_services
    from text2nerf_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    hw = (args.hw, args.hw)
    scene_cfg = ss.SceneConfig(
        datadir="", prompt="", pose_traj="local_fixed",
        num_training=args.views, hw=hw,
    )
    train_cfg = trainer.TrainConfig(
        expname="probe", basedir="",
        n_stage1=args.stages[0], n_stage2=args.stages[1],
        n_stage3=args.stages[2],
        batch_size=16384, n_voxel_init=args.grid ** 3,
        eval_every_epochs=10 ** 6, seed=7, vis_support_views=False,
        model=tf.TensoRFConfig(),
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt="", n_candidates=2, candidates_per_round=2,
        chunk=16384,
    )

    def services_factory():
        return default_services(hw=hw, merge_net_size=64, merge_num_downs=4)

    run = farm.progressive_runner(
        train_cfg, scene_cfg, None, exp_cfg,
        services_factory=services_factory,
    )
    dev = jax.devices()[0]

    # --- A: solo (also absorbs first-compile into the persistent cache:
    # a second solo scene with a different prompt is the timed one) ------
    warm = farm.run_farm_parallel(
        ["warm compile scene"], f"{args.work}/wd", f"{args.work}/wl",
        run, devices=[dev],
    )[0]
    t0 = time.time()
    solo = farm.run_farm_parallel(
        ["a quiet study with bookshelves"],
        f"{args.work}/ad", f"{args.work}/al", run, devices=[dev],
    )[0]
    wall_1 = time.time() - t0

    # --- B: N concurrent on the SAME chip -------------------------------
    prompts = [
        f"probe scene {i}: a sunlit corridor with plants {i}"
        for i in range(args.n)
    ]
    t0 = time.time()
    conc = farm.run_farm_parallel(
        prompts, f"{args.work}/bd", f"{args.work}/bl", run,
        devices=[dev] * args.n,
    )
    span_n = time.time() - t0

    idle_1 = float(solo.get("device_idle_s", 0.0))
    idles = [float(r.get("device_idle_s", 0.0)) for r in conc]
    walls = [float(r["wall_s"]) for r in conc]
    report = {
        "n": args.n, "hw": args.hw, "views": args.views,
        "stages": list(args.stages), "grid": args.grid,
        "warm_wall_s": round(float(warm["wall_s"]), 2),
        "solo_wall_s": round(wall_1, 2),
        "solo_device_idle_s": round(idle_1, 2),
        "concurrent_span_s": round(span_n, 2),
        "concurrent_wall_s": [round(w, 2) for w in walls],
        "concurrent_device_idle_s": [round(i, 2) for i in idles],
        # host-contention factor on host-side phases (>=1; GIL etc.)
        "host_inflation": round(
            (sum(idles) / len(idles)) / idle_1, 3) if idle_1 > 0 else None,
        # 1.0 = concurrency free (span == slowest); N = fully serial
        "span_over_solo": round(span_n / wall_1, 3) if wall_1 > 0 else None,
        "sum_wall_over_span": round(sum(walls) / span_n, 3),
    }
    print(json.dumps(report), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
