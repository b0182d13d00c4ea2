"""Train-step benchmark at the production config (300^3, 259 samples,
batch 16384) on the real TPU chip.

Measurement rules (PERF.md): every timed call consumes a batch with
UNIQUE contents (the axon tunnel dedupes repeat dispatches on
previously-seen buffers), and each timing window ends with a host scalar
readback (block_until_ready alone does not force execution through the
tunnel).

Usage:
  python tools/bench_train_step.py [--group 1] [--block 3] [--mb 32]
      [--steps 8] [--compute-dtype fp32]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--group", type=int, default=1)
    ap.add_argument("--block", type=int, default=3)
    ap.add_argument("--mb", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--compute-dtype", default="fp32")
    ap.add_argument("--app-k", type=int, default=64)
    ap.add_argument("--compact-k", type=int, default=0,
                    help="alpha-mask train compaction width (the trainer "
                         "default is 64 once a mask exists; 0 = dense). "
                         "Builds a slab field + pool-5 mask to compact "
                         "against.")
    ap.add_argument("--cap-band", type=int, default=0,
                    help="depth-anchored compaction band (round 4; the "
                         "trainer default is 6) — selection becomes "
                         "last-K-live capped at depth_gt + band*step")
    ap.add_argument("--mb-sweep", default="",
                    help="comma-separated microbatch counts to sweep in "
                         "one process (shares the field/mask build; "
                         "overrides --mb)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from text2nerf_tpu.utils.compilation_cache import (
        enable_persistent_compilation_cache,
    )

    enable_persistent_compilation_cache()

    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.engine import train_step as ts

    cfg = tf.TensoRFConfig()
    aabb = jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]])
    reso = tf.n_to_reso(27_000_000, aabb)
    n_samples = tf.default_n_samples(reso, cfg.step_ratio)
    print(f"reso={reso} n_samples={n_samples} group={args.group} "
          f"block={args.block} mb={args.mb} dtype={args.compute_dtype}")

    params = tf.init_params(jax.random.PRNGKey(0), cfg, reso)
    alpha_mask = None
    if args.compact_k > 0:
        # room-shell density (bench.py's slab) → a real pooled mask to
        # compact against; pool=5 licenses the group-2 occupancy stride
        params = dict(params)
        zs = np.linspace(-8, 8, reso[2])
        import jax.numpy as _jnp

        line_z = np.full((reso[2], cfg.density_n_comp[0]), -3.0, np.float32)
        line_z[(zs > 2.0) & (zs < 3.0)] = 2.0
        params["density_lines"] = (
            _jnp.asarray(line_z),
            abs(params["density_lines"][1]) * 0.3 + 0.2,
            abs(params["density_lines"][2]) * 0.3 + 0.2,
        )
        alpha_mask, _ = tf.update_alpha_mask(
            cfg, params, aabb, tuple(min(r, 200) for r in reso), pool=5
        )
        occ = float(np.asarray(alpha_mask["volume"]).mean())
        print(f"compact_k={args.compact_k} mask_occupancy={occ:.3f}")
    state, tx = ts.make_train_state(params, factor=0.999)
    kwargs = {}
    if args.compute_dtype != "fp32":
        kwargs["compute_dtype"] = args.compute_dtype
    b = args.batch
    rng = np.random.default_rng(0)

    def make_batch(i):
        o = rng.uniform(-0.5, 0.5, (b, 3)).astype(np.float32)
        d = rng.normal(size=(b, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        return {
            "rays": jnp.asarray(np.concatenate([o, d], -1)),
            "rgb": jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)),
            "depth": jnp.asarray(
                rng.uniform(2.5, 6.0, b).astype(np.float32)
            ),
        }

    mbs = (
        [int(x) for x in args.mb_sweep.split(",")]
        if args.mb_sweep
        else [args.mb]
    )
    results = {}
    for mb in mbs:
        # (anchoring requires weights.depth > 0 — the LossWeights default
        # 0.005 already satisfies it, so the benched program matches the
        # trainer's)
        step_fn = ts.make_train_step(
            cfg, tx, n_samples=n_samples, app_k=args.app_k,
            density_group=args.group, density_block=args.block,
            microbatch=mb, compact_k=args.compact_k,
            depth_cap_band=args.cap_band, **kwargs,
        )
        # each sweep point restarts from the SAME initial state so every
        # R sees identical parameter magnitudes (fresh unique batches per
        # point — the tunnel dedupes repeat input buffers)
        st = state
        batches = [make_batch(i) for i in range(args.steps + 1)]
        key = jax.random.PRNGKey(mb)

        # warm-up / compile on batch outside the timed set
        t0 = time.time()
        try:
            st, m = step_fn(
                st, aabb, batches[-1], key, alpha_mask=alpha_mask
            )
            _ = float(m["mse"])
        except Exception as e:  # OOM at small R: record and move on
            print(f"mb={mb} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        print(f"mb={mb} compile+first step: {time.time() - t0:.1f}s  "
              f"psnr={float(m['psnr']):.2f}", flush=True)

        t0 = time.time()
        for i in range(args.steps):
            key, k = jax.random.split(key)
            st, m = step_fn(st, aabb, batches[i], k, alpha_mask=alpha_mask)
        _ = float(m["mse"])  # host readback forces execution
        dt = (time.time() - t0) / args.steps
        results[mb] = dt * 1e3
        print(f"mb={mb} ms/step: {dt * 1e3:.1f}", flush=True)
    if len(results) > 1:
        best = min(results, key=results.get)
        print("sweep: " + "  ".join(
            f"R={k}:{v:.1f}ms" for k, v in sorted(results.items())
        ) + f"  best=R={best}")


if __name__ == "__main__":
    main()
