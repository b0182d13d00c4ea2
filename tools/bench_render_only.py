"""BASELINE config #1 evidence: render_only throughput from a trained
production checkpoint — a 360-frame 512² circle sweep through the
acc-gated adaptive compacted renderer (the `--render_only 1
--render_test 1` serving path, reference renderer.py:45-140 /
text2nerf_main.py:601-612).

Reports wall seconds for the full 360-frame video, frames/min, and
rays/s.  Pose angles are jittered per run (tunnel dedup hygiene); one
warm-up frame absorbs compiles (the adaptive path's two program shapes
are reused for all frames).

Usage: python tools/bench_render_only.py --json reports/render_only_r5.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=360)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--pool", type=int, default=5,
                    help="eval-mask dilation (5: stride-2 occupancy; 3: tight)")
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    import bench
    from text2nerf_tpu.data import trajectories as traj
    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.ops import rays as R
    from text2nerf_tpu.ops import render as Rd
    from text2nerf_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    prod = bench.load_production_field()
    if prod is None:
        print("no production checkpoint under .runs", file=sys.stderr)
        return 1
    mcfg, params, aabb, src = prod
    aabb = jnp.asarray(aabb)
    n_samples = int(tf.default_n_samples(
        tf.grid_resolution(mcfg, params), mcfg.step_ratio))
    mask, _ = tf.update_alpha_mask(mcfg, params, aabb, (200,) * 3,
                                   pool=args.pool)

    h = w = args.hw
    fx, fy, cx, cy = R.default_intrinsics(h, w)
    dirs = R.ray_directions(h, w, (fx, fy), (cx, cy))
    jrng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    angle = 0.2 * (1.0 + 0.03 * jrng.random())
    poses = traj.test_trajectory("circle0", np.eye(4), angle=angle,
                                 trans_range=0.2)
    n = min(args.frames, len(poses))

    def render_rays_v(rays_v):
        out, _ = Rd.render_chunked_adaptive(
            mcfg, params, aabb, rays_v, mask, n_samples=n_samples,
            chunk=65536, app_k=128, k_ladder=(16, 32, 64, 128),
        )
        return out

    def render_frame(i, pose_set=poses):
        return render_rays_v(jnp.concatenate(
            R.rays_from_pose(dirs, jnp.asarray(pose_set[i % len(pose_set)])),
            -1))

    # warm-up on a second jittered angle: every timed frame's ray buffer
    # stays unique (tunnel dedup)
    warm_poses = traj.test_trajectory(
        "circle0", np.eye(4), angle=0.2 * (1.0 + 0.03 * jrng.random()),
        trans_range=0.2)
    np.asarray(render_frame(0, warm_poses).rgb[-1])
    t0 = time.time()
    for i in range(n):
        out = render_frame(i)
    np.asarray(out.rgb[-1])
    dt = time.time() - t0
    report = {
        "ckpt": src,
        "frames": n, "hw": args.hw, "mask_pool": args.pool,
        "wall_s": round(dt, 1),
        "frames_per_min": round(n * 60.0 / dt, 1),
        "rays_per_s": round(n * h * w / dt, 1),
        "video_360_wall_min": round(dt * 360.0 / n / 60.0, 2),
    }
    print(json.dumps(report), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
