"""Per-op cost breakdown of the compact eval render path (VERDICT r4 item 3).

Fits the seed scene at the production 300^3 grid (bench.py's headline
field), then measures on the real chip:

- ms / 16384-ray chunk at a sweep of compact_k values (the fixed-K wall),
- the occupancy-only counting pass in isolation (what an adaptive-K
  scheme pays per view to pick K),
- the per-view live-sample distribution (max / p99 / mean of mask-live
  samples per ray under the shipping stride rules) — the K a per-scene
  adaptive scheme would actually select.

Measurement rules (PERF.md): unique ray contents per timed dispatch (the
axon tunnel dedupes repeats), scalar readback to force execution.
Reference hot-loop semantics: /root/reference/models/tensorBase.py:436-507.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _time_call(fn, args_stream, n=6, warmup=2):
    """Median ms over n calls, each with fresh input contents."""
    import numpy as np

    for _ in range(warmup):
        np.asarray(fn(next(args_stream)))
    ts = []
    for _ in range(n):
        a = next(args_stream)
        t0 = time.time()
        r = fn(a)
        np.asarray(r)  # host readback forces execution through the tunnel
        ts.append((time.time() - t0) * 1e3)
    return float(np.median(ts))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--chunk", type=int, default=16384)
    p.add_argument("--chunks", type=int, nargs="*", default=(),
                   help="additional chunk sizes to sweep for the render-"
                        "cost section (one seed fit serves all): the "
                        "per-chunk cost has a K-independent floor that "
                        "is partly DISPATCH latency through the tunnel, "
                        "so larger chunks amortize it")
    p.add_argument("--ks", type=int, nargs="*",
                   default=(16, 32, 48, 64, 96, 128))
    p.add_argument("--selects", nargs="*", default=(),
                   help="first_k_live lowerings to sweep at each K "
                        "(e.g. sort topk rank); empty = default only")
    p.add_argument("--skip_counts", action="store_true",
                   help="skip the live-distribution / count-pass section")
    p.add_argument("--report", default="")
    args = p.parse_args(argv)

    import jax
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
    n_samples = tf.default_n_samples(reso, cfg.step_ratio)
    alpha_mask, _ = tf.update_alpha_mask(mcfg, params, aabb, (200,) * 3,
                                         pool=5)
    occupancy = float(np.asarray(alpha_mask["volume"]).mean())

    h = w = 512
    fx, fy, cx, cy = R.default_intrinsics(h, w)
    dirs = R.ray_directions(h, w, (fx, fy), (cx, cy))
    poses = traj.test_trajectory("circle0", np.eye(4), angle=0.2,
                                 trans_range=0.2)
    views = [
        np.asarray(
            jnp.concatenate(R.rays_from_pose(dirs, jnp.asarray(poses[i])), -1)
        )
        for i in range(4)
    ]

    # unique chunk stream cycling through all views' chunks with a tiny
    # per-draw origin perturbation so no two dispatches share buffers
    rng = np.random.default_rng(0)

    def chunk_stream(chunk):
        while True:
            for v in views:
                for s in range(0, v.shape[0], chunk):
                    c = v[s : s + chunk].copy()
                    if c.shape[0] < chunk:
                        continue
                    c[:, :3] += rng.normal(0, 1e-4, (c.shape[0], 3))
                    yield jnp.asarray(c)

    stream = chunk_stream(args.chunk)
    report = {"mask_occupancy": round(occupancy, 4), "chunk": args.chunk,
              "n_samples": int(n_samples)}

    occ_stride = max(1, (int(alpha_mask.get("pool", 3)) - 1) // 2)
    if occ_stride > 1 and not Rd.occupancy_stride_safe(
        mcfg, params, aabb, alpha_mask, occ_stride
    ):
        occ_stride = 1
    report["occ_stride"] = occ_stride

    if not args.skip_counts:
        # --- live-count distribution (what adaptive K would pick) --------
        per_view = []
        for v in views:
            counts = []
            for s in range(0, v.shape[0], args.chunk):
                c = jnp.asarray(v[s : s + args.chunk])
                counts.append(np.asarray(Rd.count_live_samples(
                    mcfg, params, aabb, c, alpha_mask,
                    n_samples=int(n_samples), occ_stride=occ_stride,
                )))
            counts = np.concatenate(counts)
            per_view.append({
                "max": int(counts.max()),
                "p99": int(np.percentile(counts, 99)),
                "mean": round(float(counts.mean()), 1),
            })
        report["live_per_view"] = per_view
        report["adaptive_k_would_pick"] = [
            Rd.adaptive_compact_k(v["max"]) for v in per_view
        ]

        # --- occupancy-only counting pass cost ---------------------------
        count_fn = lambda c: Rd.count_live_samples(  # noqa: E731
            mcfg, params, aabb, c, alpha_mask,
            n_samples=int(n_samples), occ_stride=occ_stride,
        ).max()
        report["count_pass_ms"] = round(_time_call(count_fn, stream), 2)

    # --- render cost vs compact_k (x select lowering x chunk) -------------
    for chunk in [args.chunk, *args.chunks]:
        stream_c = stream if chunk == args.chunk else chunk_stream(chunk)
        # extra chunks measure the dispatch-amortization question only —
        # the select-lowering cross product stays at the base chunk
        sels = (args.selects or (None,)) if chunk == args.chunk else (None,)
        for sel in sels:
            ms_by_k = {}
            for k in args.ks:
                if k > n_samples:
                    continue
                fn = lambda c, _k=k, _s=sel: Rd.render_rays_compact(  # noqa: E731
                    mcfg, params, aabb, c, alpha_mask,
                    n_samples=int(n_samples), compact_k=_k, app_k=_k,
                    white_bg=True, select_impl=_s,
                ).rgb
                ms_by_k[k] = round(_time_call(fn, stream_c), 2)
            tag = f"render_ms_by_k_{sel}" if sel else "render_ms_by_k"
            if chunk != args.chunk:
                tag += f"_chunk{chunk}"
            report[tag] = ms_by_k
            report[tag.replace("render_ms", "rays_per_s")] = {
                k: round(chunk / ms * 1e3, 1) for k, ms in ms_by_k.items()
            }

    line = json.dumps(report)
    print(line, flush=True)
    if args.report:
        with open(args.report, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
