"""A/B the adaptive eval's mask regime on the PRODUCTION checkpoint.

Round-5 finding (reports/prod_field_diag_r5.json): on the converged
full-schedule field the pool-5 dilated mask — the eval default tuned for
the FIXED-K path, where dilation licenses stride-2 occupancy testing —
inflates per-ray live counts past the top rung, so 28.5% of rays
escalate to K=128 under the acc-gated adaptive path (vs 5.2% with the
tight pool-3 mask).  The dilation's +5.5% fixed-K win cannot pay for a
5x larger escalation set; this measures the real tradeoff end-to-end:

  arms: (pool5, chunk 65536) — the shipping bench config,
        (pool3, chunk 65536),
        (pool3, chunk 131072, sample_budget 2M) — dispatch-floor
        amortization at the K=16 base rung,
  plus fixed-K references and a per-arm max_dev vs an untruncated K=160
  render (the accuracy contract).

Timing hygiene (PERF.md): every timed arm renders DISTINCT jittered
poses (tunnel dedup), a warm-up pass per arm absorbs jit compiles
(including the escalation-group specializations), and a scalar readback
closes each timing window.

Usage:  python tools/bench_adaptive_pool_ab.py --json reports/adaptive_pool_ab_r5.json
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
    ap.add_argument("--views", type=int, default=4)
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
        print("no production checkpoint under .runs; nothing to measure",
              file=sys.stderr)
        return 1
    mcfg, params, aabb, src = prod
    aabb = jnp.asarray(aabb)
    n_samples = int(tf.default_n_samples(
        tf.grid_resolution(mcfg, params), mcfg.step_ratio))

    h = w = 512
    fx, fy, cx, cy = R.default_intrinsics(h, w)
    dirs = R.ray_directions(h, w, (fx, fy), (cx, cy))
    jrng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))

    def view_rays(angle, pose_i):
        poses = traj.test_trajectory("circle0", np.eye(4), angle=angle,
                                     trans_range=0.2)
        return jnp.concatenate(
            R.rays_from_pose(dirs, jnp.asarray(poses[pose_i])), -1)

    masks = {}
    for pool in (5, 3):
        m, _ = tf.update_alpha_mask(mcfg, params, aabb, (200,) * 3, pool=pool)
        masks[pool] = m

    arms = [
        ("pool5_c65536", 5, 65536, 1_048_576),
        ("pool3_c65536", 3, 65536, 1_048_576),
        ("pool3_c131072", 3, 131072, 2_097_152),
    ]
    report = {"ckpt": src, "n_samples": n_samples, "views": args.views}

    for name, pool, chunk, budget in arms:
        mask = masks[pool]
        angle = 0.2 * (1.0 + 0.03 * jrng.random())

        def render(rays_v):
            out, ks = Rd.render_chunked_adaptive(
                mcfg, params, aabb, rays_v, mask, n_samples=n_samples,
                chunk=chunk, app_k=128, white_bg=True,
                k_ladder=(16, 32, 64, 128), sample_budget=budget,
            )
            return out, ks

        # two warm-up views: absorbs phase-1 AND the escalation-group
        # quanta specializations this field's typical views produce
        for wv in range(2):
            out, _ = render(view_rays(angle, args.views + wv))
            np.asarray(out.rgb[-1])
        t0 = time.time()
        ks_seen = []
        for i in range(args.views):
            out, ks = render(view_rays(angle, i))
            ks_seen.append(max(ks))
        np.asarray(out.rgb[-1])
        dt = time.time() - t0
        rays_s = args.views * h * w / dt

        # accuracy contract: one extra view vs untruncated K=160
        rays_chk = view_rays(angle, args.views + 2)
        ada, _ = render(rays_chk)
        ref = Rd.render_chunked(
            mcfg, params, aabb, rays_chk, n_samples=n_samples, chunk=16384,
            app_k=160, alpha_mask=mask, compact_k=min(160, n_samples),
        )
        max_dev = float(np.abs(np.asarray(ada.rgb) - np.asarray(ref.rgb)).max())
        report[name] = {
            "rays_per_s": round(rays_s, 1),
            "max_k_per_view": ks_seen,
            "max_dev_vs_k160": round(max_dev, 5),
        }
        print(f"{name}: {json.dumps(report[name])}", flush=True)

    # fixed-K references at the shipping chunk (context row)
    for pool, k in ((5, 64), (3, 64), (3, 16)):
        mask = masks[pool]
        angle = 0.2 * (1.0 + 0.03 * jrng.random())

        def render_fixed(rays_v):
            outs = []
            for s in range(0, rays_v.shape[0], 16384):
                outs.append(Rd.render_rays_compact(
                    mcfg, params, aabb, rays_v[s:s + 16384], mask,
                    n_samples=n_samples, compact_k=k, app_k=min(64, k),
                    white_bg=True))
            return outs

        np.asarray(render_fixed(view_rays(angle, args.views))[-1].rgb[-1])
        t0 = time.time()
        for i in range(args.views):
            outs = render_fixed(view_rays(angle, i))
        np.asarray(outs[-1].rgb[-1])
        dt = time.time() - t0
        report[f"fixed{k}_pool{pool}"] = round(args.views * h * w / dt, 1)
        print(f"fixed{k}_pool{pool}: {report[f'fixed{k}_pool{pool}']}",
              flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
