"""Diagnose a collapsed eval view on a trained checkpoint.

Round-5 follow-up to the r4c full-schedule A/B: view 3 evaluated at
9.09 dB with both round-4 train-side fixes active while train PSNR sat
at 53 dB — so the field FITS its supervision and the damage must be in
(a) the eval-time world-z cull (the "Eckert" filter, reference
models/tensorBase.py:458-462: samples with world z <= 2 are dropped
when not is_train), (b) alpha-mask truncation at eval, or (c) genuinely
missing density.  This script separates the three on a checkpoint:

  for each view: PSNR under
    - compact eval, default z-cull (what the trainer reported)
    - dense eval, default z-cull
    - dense eval, z-cull OFF            -> isolates hypothesis (a)
    - compact eval, z-cull OFF
  plus supervision-side stats: world z of GT-depth points (fraction at
  z <= 2) and alpha-mask coverage at those points (hypothesis (b)).

Usage:
  python tools/diag_view_collapse.py <logfolder> [--views 0,1,2,3]
    [--json reports/diag_view_collapse.json]

logfolder must contain fullsched_final.npz + scene_snapshot.npz.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from text2nerf_tpu.engine import checkpoints as ckpt
from text2nerf_tpu.engine import metrics as M
from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.ops import render as render_ops


def _render_dense(cfg, params, aabb, rays, alpha_mask, *, n_samples,
                  z_min, chunk=16384):
    outs = []
    n = rays.shape[0]
    for s in range(0, n, chunk):
        part = rays[s:s + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = np.concatenate([part, np.zeros((pad, 6), part.dtype)], 0)
        out = render_ops.render_rays(
            cfg, params, aabb, jnp.asarray(part), n_samples=n_samples,
            app_k=64, is_train=False, white_bg=True,
            alpha_mask=alpha_mask, eval_z_min=z_min,
        )
        rgb = np.asarray(jnp.clip(out.rgb, 0, 1))
        outs.append(rgb[: chunk - pad] if pad else rgb)
    return np.concatenate(outs, 0)


def _render_compact(cfg, params, aabb, rays, alpha_mask, *, n_samples,
                    z_min, compact_k=64, chunk=16384):
    outs = []
    n = rays.shape[0]
    for s in range(0, n, chunk):
        part = rays[s:s + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = np.concatenate([part, np.zeros((pad, 6), part.dtype)], 0)
        out = render_ops.render_rays_compact(
            cfg, params, aabb, jnp.asarray(part), alpha_mask,
            n_samples=n_samples, compact_k=compact_k, app_k=compact_k,
            white_bg=True, eval_z_min=z_min,
        )
        rgb = np.asarray(jnp.clip(out.rgb, 0, 1))
        outs.append(rgb[: chunk - pad] if pad else rgb)
    return np.concatenate(outs, 0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logfolder")
    ap.add_argument("--views", default=None)
    ap.add_argument("--ckpt", default="fullsched_final.npz")
    ap.add_argument("--json", default=None)
    ap.add_argument("--zmins", default=None,
                    help="comma list of extra eval_z_min values to probe "
                         "(dense + compact PSNR at each)")
    ap.add_argument("--compact_k", type=int, default=64)
    args = ap.parse_args()

    cfg, params, aabb, alpha_mask, _ = ckpt.load_checkpoint(
        os.path.join(args.logfolder, args.ckpt))
    scene = ss.load_scene_snapshot(
        os.path.join(args.logfolder, "scene_snapshot.npz"), n_views_pools=0)
    h, w = scene.hw
    reso = tf.grid_resolution(cfg, params)
    n_samples = tf.default_n_samples(reso, cfg.step_ratio)
    n_views = scene.poses_gen.shape[0]
    views = (list(range(n_views)) if args.views is None
             else [int(v) for v in args.views.split(",")])
    aabb_np = np.asarray(aabb)
    print(f"grid {tuple(int(r) for r in reso)}  n_samples {n_samples}  "
          f"aabb {aabb_np.tolist()}  views {views}")

    mask_vol = render_ops._strip_pool(alpha_mask) if alpha_mask else None
    results = {}
    for v in views:
        rays = np.asarray(scene.rays_gen_split[v], np.float32)
        gt = np.asarray(scene.rgbs_gen_split[v], np.float32).reshape(-1, 3)
        gtd = np.asarray(scene.depth_gen_split[v], np.float32).reshape(-1)

        # supervision-side geometry: where does GT depth place the content?
        pts = rays[:, :3] + rays[:, 3:6] * gtd[:, None]
        zq = np.percentile(pts[:, 2], [0, 1, 5, 25, 50, 100])
        frac_zcull = float((pts[:, 2] <= 2.0).mean())
        in_aabb = np.all((pts >= aabb_np[0]) & (pts <= aabb_np[1]), axis=-1)
        cov = None
        if mask_vol is not None:
            am = np.asarray(render_ops._nearest_alpha_lookup(
                mask_vol, jnp.asarray(pts)))
            cov = float((am > 0)[in_aabb].mean()) if in_aabb.any() else 0.0

        r = {}
        r["psnr_compact_zcull"] = M.psnr(
            _render_compact(cfg, params, aabb, rays, alpha_mask,
                            n_samples=n_samples, z_min=2.0), gt)
        r["psnr_compact_nocull"] = M.psnr(
            _render_compact(cfg, params, aabb, rays, alpha_mask,
                            n_samples=n_samples, z_min=-1e6), gt)
        r["psnr_dense_zcull"] = M.psnr(
            _render_dense(cfg, params, aabb, rays, alpha_mask,
                          n_samples=n_samples, z_min=2.0), gt)
        r["psnr_dense_nocull"] = M.psnr(
            _render_dense(cfg, params, aabb, rays, alpha_mask,
                          n_samples=n_samples, z_min=-1e6), gt)
        for zm in ([] if args.zmins is None
                   else [float(z) for z in args.zmins.split(",")]):
            r[f"psnr_dense_z{zm}"] = M.psnr(
                _render_dense(cfg, params, aabb, rays, alpha_mask,
                              n_samples=n_samples, z_min=zm), gt)
            r[f"psnr_compact_z{zm}"] = M.psnr(
                _render_compact(cfg, params, aabb, rays, alpha_mask,
                                n_samples=n_samples, z_min=zm,
                                compact_k=args.compact_k), gt)
        r.update(
            gt_z_pcts=[round(float(x), 3) for x in zq],
            frac_gt_z_le2=round(frac_zcull, 4),
            frac_gt_in_aabb=round(float(in_aabb.mean()), 4),
            mask_cov_at_gt=None if cov is None else round(cov, 4),
        )
        results[v] = r
        print(f"view {v}: " + json.dumps(r))

    if args.json:
        with open(args.json, "w") as f:
            json.dump({"logfolder": args.logfolder, "n_samples": int(n_samples),
                       "views": results}, f, indent=1)
        print("wrote", args.json)


if __name__ == "__main__":
    main()
