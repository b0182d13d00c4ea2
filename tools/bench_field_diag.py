"""Characterize the bench field's per-ray live-count / saturation
structure — the data that decides how the adaptive eval reaches the
round-5 throughput target honestly.

Round-5 finding that motivated this: on the 30-epoch bench field the
MEDIAN ray's escalation target is the TOP rung (K=128) — novel-pose rays
that miss the supervised relief never saturate transmittance and cross
up to ~138 dilated-mask-live samples, so the acc-gated ladder honestly
pays K=128 for most rays.  The candidate lever is the EVAL mask itself:
pool=5 dilation (which licenses stride-2 occupancy tests) inflates
n_live vs a tight pool=3 mask.  This tool measures both.

Also saves the fitted field to .runs/bench_field_seed<seed>.npz so
renderer iteration doesn't re-pay the ~10 min fit (REMEMBER the tunnel
dedup: vary poses between timed runs against the same saved field).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--c2f", type=int, nargs="*", default=(),
                    help="upsample step milestones (150^3 -> 300^3)")
    ap.add_argument("--pose", type=int, default=3)
    ap.add_argument("--ckpt", default="",
                    help="diag an existing checkpoint (e.g. a full-schedule "
                         "run's fullsched_final.npz) instead of fitting — "
                         "measures whether the PRODUCTION-trained field "
                         "saturates at the bottom adaptive rung")
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import bench
    from text2nerf_tpu.data import trajectories as traj
    from text2nerf_tpu.engine import checkpoints as ckpt
    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.ops import rays as R
    from text2nerf_tpu.ops import render as Rd
    from text2nerf_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    cfg = tf.TensoRFConfig()
    tag = f"seed{args.seed}" + ("_c2f" if args.c2f else "")
    path = f"/root/repo/.runs/bench_field_{tag}.npz"
    if args.ckpt:
        mcfg, params, aabb, _, _ = ckpt.load_checkpoint(args.ckpt)
    elif os.path.exists(path):
        mcfg, params, aabb, _, _ = ckpt.load_checkpoint(path)
    else:
        mcfg, params, aabb = bench.fit_seed_scene(
            cfg, n_epochs=args.epochs, seed=args.seed, c2f=args.c2f)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        ckpt.save_checkpoint(path, mcfg, params, aabb)
    aabb = jnp.asarray(aabb)
    reso = tf.n_to_reso(27_000_000, jnp.array([[-8.0] * 3, [8.0] * 3]))
    n_samples = int(tf.default_n_samples(reso, cfg.step_ratio))

    h = w = 512
    fx, fy, cx, cy = R.default_intrinsics(h, w)
    dirs = R.ray_directions(h, w, (fx, fy), (cx, cy))
    poses = traj.test_trajectory("circle0", np.eye(4), angle=0.2,
                                 trans_range=0.2)
    rays = jnp.concatenate(
        R.rays_from_pose(dirs, jnp.asarray(poses[args.pose])), -1)

    report = {"n_samples": n_samples, "pose": args.pose, "seed": args.seed}
    if args.ckpt:
        report["ckpt"] = args.ckpt
    for pool in (5, 3):
        mask, _ = tf.update_alpha_mask(mcfg, params, aabb, (200,) * 3,
                                       pool=pool)
        occ_stride = max(1, (pool - 1) // 2)
        if occ_stride > 1 and not Rd.occupancy_stride_safe(
                mcfg, params, aabb, mask, occ_stride):
            occ_stride = 1
        counts = np.asarray(Rd.count_live_samples(
            mcfg, params, aabb, rays, mask, n_samples=n_samples,
            occ_stride=occ_stride))
        out16 = Rd.render_rays_compact(
            mcfg, params, aabb, rays, mask, n_samples=n_samples,
            compact_k=16, app_k=16, white_bg=True)
        acc = np.asarray(out16.acc)
        sat = acc >= 1.0 - 1e-3
        flag = (counts > 16) & ~sat
        need = np.zeros_like(counts)
        for k in (128, 64, 32, 16):
            need[counts <= k] = k
        need[counts > 128] = 128
        report[f"pool{pool}"] = {
            "occupancy": round(float(np.asarray(mask["volume"]).mean()), 4),
            "occ_stride": occ_stride,
            "live_pct_50_90_99_100": [
                int(x) for x in np.percentile(counts, [50, 90, 99, 100])],
            "sat_frac_at_k16": round(float(sat.mean()), 4),
            "flagged_frac_at_k16": round(float(flag.mean()), 4),
            "acc_pct_1_25_50": [
                round(float(x), 4) for x in np.percentile(acc, [1, 25, 50])],
            "need_hist_flagged": {
                str(k): int(((need == k) & flag).sum()) for k in
                (16, 32, 64, 128)},
        }
        print(f"pool{pool}: {json.dumps(report[f'pool{pool}'])}", flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
