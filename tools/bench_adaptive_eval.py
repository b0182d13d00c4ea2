"""Adaptive compact-K eval A/B on the trained seed-scene field (VERDICT
r4 item 3).  Measures, in bench.py's pipelined harness (one sync per
timed view set, unique ray contents per dispatch):

- fixed K=64 (the round-3 headline path) rays/s,
- adaptive ladder rays/s + the per-chunk K distribution,
- max |rgb| deviation and PSNR of both vs a K=160 (> max live count)
  reference render of the same view.
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
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--ladder", type=int, nargs="*", default=(32, 64, 128))
    p.add_argument("--report", default="")
    args = p.parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    import bench
    from text2nerf_tpu.data import trajectories as traj
    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.ops import rays as R
    from text2nerf_tpu.ops import render as Rd
    from text2nerf_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()
    cfg = tf.TensoRFConfig()
    mcfg, params, aabb = bench.fit_seed_scene(cfg)
    aabb = jnp.asarray(aabb)
    reso = tf.n_to_reso(27_000_000, jnp.array([[-8.0] * 3, [8.0] * 3]))
    n_samples = int(tf.default_n_samples(reso, cfg.step_ratio))
    alpha_mask, _ = tf.update_alpha_mask(mcfg, params, aabb, (200,) * 3,
                                         pool=5)

    h = w = 512
    fx, fy, cx, cy = R.default_intrinsics(h, w)
    dirs = R.ray_directions(h, w, (fx, fy), (cx, cy))
    poses = traj.test_trajectory("circle0", np.eye(4), angle=0.2,
                                 trans_range=0.2)
    n_views = 4
    views = [
        jnp.concatenate(R.rays_from_pose(dirs, jnp.asarray(poses[i])), -1)
        for i in range(n_views + 1)
    ]

    ladder = tuple(args.ladder)

    def render_fixed(rays, k):
        outs = []
        for s in range(0, rays.shape[0], args.chunk):
            outs.append(Rd.render_rays_compact(
                cfg, params, aabb, rays[s : s + args.chunk], alpha_mask,
                n_samples=n_samples, compact_k=k, app_k=min(64, k),
                white_bg=True,
            ).rgb)
        return outs

    def render_adaptive(rays):
        out, ks = Rd.render_chunked_adaptive(
            cfg, params, aabb, rays, alpha_mask, n_samples=n_samples,
            chunk=args.chunk, app_k=64, k_ladder=ladder,
        )
        return out.rgb, ks

    # --- accuracy vs K=160 (> max live ≈ 138: zero truncation) ----------
    ref = np.concatenate(
        [np.asarray(x) for x in render_fixed(views[4], 160)], 0
    )
    fixed64 = np.concatenate(
        [np.asarray(x) for x in render_fixed(views[4], 64)], 0
    )
    ada, ks4 = render_adaptive(views[4])
    ada = np.asarray(ada)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return 99.0 if mse < 1e-12 else -10.0 * np.log10(mse)

    report = {
        "n_samples": n_samples, "ladder": list(ladder),
        "fixed64_vs_k160": {"psnr": round(psnr(fixed64, ref), 2),
                            "max_dev": round(float(np.abs(fixed64 - ref).max()), 5)},
        "adaptive_vs_k160": {"psnr": round(psnr(ada, ref), 2),
                             "max_dev": round(float(np.abs(ada - ref).max()), 5)},
        "adaptive_k_hist": {str(k): ks4.count(k) for k in set(ks4)},
    }

    # --- throughput (pipelined: sync once per timed set) -----------------
    np.asarray(render_fixed(views[4], 64)[-1])  # warm both paths
    render_adaptive(views[4])
    t0 = time.time()
    for i in range(n_views):
        outs = render_fixed(views[i], 64)
    np.asarray(outs[-1])
    report["fixed64_rays_s"] = round(n_views * h * w / (time.time() - t0), 1)

    t0 = time.time()
    hist = {}
    for i in range(n_views):
        rgb, ks = render_adaptive(views[i])
        for k in ks:
            hist[k] = hist.get(k, 0) + 1
    np.asarray(rgb)
    report["adaptive_rays_s"] = round(n_views * h * w / (time.time() - t0), 1)
    report["adaptive_k_hist_timed"] = {str(k): v for k, v in hist.items()}

    line = json.dumps(report)
    print(line, flush=True)
    if args.report:
        with open(args.report, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
