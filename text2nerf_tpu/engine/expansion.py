"""Progressive scene expansion: render → warp → inpaint → align → update.

Functional re-design of render_warping_inapinting
(/root/reference/text2nerf_main.py:68-401): each call takes the current
field + scene state and returns new scene state with one more completed
RGBD view and its support-set ray pools.  All geometry runs on-device
(splatting, filtering); the generative priors come from the injected
Services bundle; artifacts are written under ``<logdir>/DIBR/`` in the
reference's layout for parity debugging.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np
import jax.numpy as jnp

from ..data import scene_state as ss
from ..data import trajectories as traj
from ..ops import filters as filter_ops
from ..ops import render as render_ops
from ..ops import splat as splat_ops
from ..services.registry import Services


def _write(path, arr):
    """Artifact write — asynchronous (engine/io_async): the PNG encode and
    disk IO leave the critical path between device phases; the trainer
    flushes before returning so callers always observe complete trees."""
    from . import io_async

    io_async.write_async(path, np.asarray(arr))


def global_depth_alignment(
    depth_rendered, depth_est, known_mask, push_depth, max_samples=10000, seed=0
):
    """Global scale + shift between the monocular estimate and the rendered
    depth, from sampled known pixels.

    Vectorized equivalent of the pixel-pair loops at
    text2nerf_main.py:232-270: consecutive sampled-pixel differences give
    scale candidates, filtered by the |s-1| <= 5|thresh-1| and s >= 0 rules;
    shifts filtered by |shift| <= 2|thresh|.
    """
    rng = np.random.default_rng(seed)
    ys, xs = np.nonzero(np.asarray(known_mask) > 0)
    if len(ys) == 0:
        return 1.0, 0.0
    n = min(len(ys), max_samples)
    sel = rng.choice(len(ys), size=n, replace=False)
    ys, xs = ys[sel], xs[sel]
    dr = np.asarray(depth_rendered)[ys, xs]
    de = np.asarray(depth_est)[ys, xs]

    thresh_s = (np.asarray(depth_rendered).max() - push_depth) / (
        np.asarray(depth_est).max() - push_depth + 1e-12
    )
    dd1 = dr[:-1] - dr[1:]
    dd2 = de[:-1] - de[1:]
    s = dd1 / (dd2 + 1e-8)
    ok = np.isfinite(s) & (np.abs(s - 1) <= 5 * abs(thresh_s - 1)) & (s >= 0)
    scale = float(s[ok].mean()) if ok.any() else float(thresh_s)

    de_scaled = np.asarray(depth_est) * scale
    thresh_t = de_scaled.max() - np.asarray(depth_rendered).max()
    shifts = de_scaled[ys, xs] - dr
    ok_t = np.abs(shifts) <= 2 * abs(thresh_t)
    shift = float(shifts[ok_t].mean()) if ok_t.any() else float(thresh_t)
    return scale, shift


def align_depth_pair(
    depth_ref, depth_src, pose_ref, pose_src, intrinsic, max_samples=1000,
    seed=0,
):
    """Warping-correspondence depth alignment (eliminate_depth_error,
    scene_util.py:42-132): forward-warp the reference depth into the source
    view, estimate a global scale from sampled point-pair distances and a
    shift from the mean residual over covered pixels.

    Returns (aligned_src_depth, uncertainty) where uncertainty is the
    per-pixel residual on covered pixels and 0.1 elsewhere (:130).
    """
    from ..ops import splat as splat_ops

    h, w = np.asarray(depth_ref).shape
    rgb_dummy = jnp.zeros((h, w, 3), jnp.float32)
    _, mask_w, depth_w = splat_ops.warp_one_to_many(
        rgb_dummy, jnp.asarray(depth_ref), jnp.asarray(pose_ref),
        jnp.asarray(pose_src)[None], intrinsic,
    )
    mask = np.asarray(mask_w[0]).astype(np.float32)
    warped = np.asarray(depth_w[0])

    rng = np.random.default_rng(seed)
    ys, xs = np.nonzero(mask > 0)
    if len(ys) < 2:
        return np.asarray(depth_src, np.float32), np.full((h, w), 0.1, np.float32)
    n = min(len(ys), max_samples)
    sel = rng.choice(len(ys), n, replace=False)
    ys, xs = ys[sel], xs[sel]
    # scale from pairwise depth-difference ratios at corresponding pixels
    dw = warped[ys, xs]
    dsrc = np.asarray(depth_src)[ys, xs]
    d1 = np.abs(np.diff(dw))
    d2 = np.abs(np.diff(dsrc))
    ok = (d1 > 1e-6) & np.isfinite(d2 / np.maximum(d1, 1e-12))
    scale = float((d2[ok] / d1[ok]).mean()) if ok.any() else 1.0
    # note the reference computes src/ref distance ratios then divides the
    # src depth by nothing — it scales src by ref/src; we align src to ref:
    scale = 1.0 / max(scale, 1e-6)
    src_scaled = np.asarray(depth_src) * scale
    shift = float(((src_scaled - warped) * mask).sum() / max(mask.sum(), 1))
    aligned = src_scaled - shift
    uncert = np.abs(aligned - warped) * mask + 0.1 * (1 - mask)
    return aligned.astype(np.float32), uncert.astype(np.float32)


def _update_known_views(
    view_idx, scene, services, ex, img_new, depth_new, my_map_f, seed,
    logdir=None,
):
    """Warp the freshly inpainted content back into the previous views and
    rebuild their ray pools (text2nerf_main.py:300-377): per known view,
    composite the warped content where this view had no coverage,
    re-estimate + merge depth on the updated image, regenerate its support
    pools from the inpaint mask.  With ``logdir`` the per-view
    pre/post-warp artifacts are written under
    ``DIBR/rgbs_support/%05d_warp2known/`` (text2nerf_main.py:320-326)."""
    h, w = scene.hw
    inv_mask = 1.0 - my_map_f
    pose_new = scene.poses_gen[view_idx]
    prev_poses = scene.poses_gen[:view_idx]

    rgbs_w, _, depth_w, masks_w = splat_ops.warp_one_to_many_with_mask(
        jnp.asarray(img_new), jnp.asarray(depth_new), jnp.asarray(pose_new),
        jnp.asarray(prev_poses), scene.intrinsic, extra_mask=inv_mask,
    )
    rgbs_gen = np.array(scene.rgbs_gen_split)
    depth_gen = np.array(scene.depth_gen_split)
    for ii in range(view_idx):
        mask = np.asarray(masks_w[ii], np.float32)
        if mask.sum() < 1:
            continue
        if logdir is not None:
            sup = os.path.join(
                logdir, "DIBR", "rgbs_support", "%05d_warp2known" % view_idx
            )
            _write(os.path.join(sup, "%05d_image_pre.png" % ii), rgbs_gen[ii])
            _write(os.path.join(sup, "%05d_image_warp.png" % ii),
                   np.asarray(rgbs_w[ii]))
            _write(os.path.join(sup, "%05d_depth_pre.png" % ii),
                   depth_gen[ii] * 12000)
            _write(os.path.join(sup, "%05d_depth_warp.png" % ii),
                   np.asarray(depth_w[ii]) * 12000)
        img = rgbs_gen[ii] * (1 - mask[..., None]) + np.asarray(
            rgbs_w[ii]
        ) * mask[..., None]
        counts = np.asarray(services.estimate_depth(img))
        depth_ref = (
            (depth_gen[ii] - ex.push_depth) * 12000.0 / 32768.0 - 1.0
        ) * (1 - mask)
        depth_est = counts / 32768.0 - 1.0
        merged = services.merge.run_finetune(
            depth_ref.astype(np.float32), depth_est.astype(np.float32),
            (1 - mask), outsize=max(h, w), lr=ex.merge_lr, iters=ex.merge_iters,
        )
        depth = (
            (np.asarray(merged) + 1.0) * 32768.0 / 12000.0 + ex.push_depth
        ).astype(np.float32)
        rgbs_gen[ii] = img
        depth_gen[ii] = depth
        inpaint_mask_ii = np.asarray(scene.masks_gen_split[ii], np.float32)
        if ex.use_support_set:
            img_j, depth_j = filter_ops.sparse_bilateral_filtering(
                depth, img, filter_size=(5, 5, 3, 3),
                depth_threshold=0.02, num_iter=4,
            )
            img_f, depth_f = np.asarray(img_j), np.asarray(depth_j)
            poses_support = traj.local_fixed_poses(
                scene.poses_gen[ii], angle=0, range_center=ex.trans_range,
                range_yaw=0.6, range_pitch=0.2,
            )
            r_w, _, d_w, m_w = splat_ops.warp_one_to_many_with_mask(
                jnp.asarray(img_f), jnp.asarray(depth_f),
                jnp.asarray(poses_support[0]), jnp.asarray(poses_support[1:]),
                scene.intrinsic, extra_mask=inpaint_mask_ii,
            )
            imgs = np.concatenate([img_f[None], np.asarray(r_w)], 0)
            msks = np.concatenate([inpaint_mask_ii[None], np.asarray(m_w)], 0)
            deps = np.concatenate([depth_f[None], np.asarray(d_w)], 0)
            rays_p, rgbs_p, depths_p, _, _, _ = ss.formatted_ray_pool(
                imgs, deps, msks, poses_support, scene.intrinsic, h, w
            )
        else:
            rays_p, rgbs_p, depths_p, _, _, _ = ss.formatted_ray_pool(
                img[None], depth[None], inpaint_mask_ii[None],
                scene.poses_gen[ii][None], scene.intrinsic, h, w,
            )
        scene.updates["%05d" % ii] = (rays_p, rgbs_p, depths_p)

    return dataclasses.replace(
        scene, rgbs_gen_split=rgbs_gen, depth_gen_split=depth_gen,
        updates=dict(scene.updates),
    )


@dataclasses.dataclass
class ExpansionConfig:
    prompt: str
    negative_prompt: str = "blurry, bad art, blurred, text, watermark"
    push_depth: float = 2.0
    trans_range: float = 0.2
    use_support_set: bool = True
    update_known_views: bool = False
    use_filter_filling_holes: bool = True
    use_rendered_img_to_warp: bool = True
    frame_select_type: str = "auto_cos"  # auto_cos | first
    n_candidates: int = 20               # text2nerf_main.py:191-193
    candidates_per_round: int = 5
    merge_iters: int = 500
    merge_lr: float = 1e-5
    chunk: int = 16384
    app_k: int = 64


def expand_scene(
    view_idx: int,
    cfg_model,
    params,
    scene: ss.SceneState,
    services: Services,
    expansion: ExpansionConfig,
    logdir: str,
    *,
    n_samples: int,
    white_bg: bool = False,
    seed: int = 0,
    alpha_mask=None,
    compact_k: int = 0,
    eval_z_min: float = 2.0,
    log=None,
) -> ss.SceneState:
    """Complete view ``view_idx`` of the trajectory and update the scene.

    Mirrors render_warping_inapinting's default path (update_known_views
    off, text2nerf_main.py:658).  Returns the updated SceneState (the new
    view appended to gen splits + its support ray pool in .updates).

    With ``alpha_mask`` + ``compact_k`` the known-view and target renders
    go through the compacted fast path (render_rays_compact) — the trainer
    rebuilds the mask at each stage boundary.

    ``log`` (a tracing.MetricsLogger) records per-sub-phase wall clocks as
    ``phase/expand{view}_<name>_s`` rows for host/device attribution.
    """
    from .tracing import phase_timer

    h, w = scene.hw
    aabb = jnp.asarray(scene.scene_bbox)
    dibr = os.path.join(logdir, "DIBR")
    ex = expansion
    tag = f"expand{view_idx}"

    # --- 1. render + filter the existing views (text2nerf_main.py:102-122)
    # pipelined: every view's render is DISPATCHED before any filtering
    # blocks on results — the device works through the render queue while
    # the host converts/filters earlier views
    rgbs_pre, depths_pre = [], []
    with phase_timer(f"{tag}_render_filter_known", log):
        outs = []
        if ex.use_rendered_img_to_warp:
            for n in range(view_idx):
                out = render_ops.render_chunked(
                    cfg_model, params, aabb,
                    jnp.asarray(scene.rays_gen_split[n]),
                    n_samples=n_samples, chunk=ex.chunk, app_k=ex.app_k,
                    white_bg=white_bg, alpha_mask=alpha_mask,
                    compact_k=compact_k, eval_z_min=eval_z_min,
                )
                # keep only rgb+depth: holding every view's full
                # RenderOutput would pin the (H*W, K) weights/z_vals
                # buffers (~hundreds of MB/view at 512²) on device for
                # the whole loop alongside the 300³ params
                outs.append((jnp.clip(out.rgb, 0, 1), out.depth))
        for n in range(view_idx):
            if ex.use_rendered_img_to_warp:
                rgb_d, depth_d = outs[n]
                rgb = np.asarray(rgb_d).reshape(h, w, 3)
                depth = np.asarray(depth_d).reshape(h, w)
                rgb_j, depth_j = filter_ops.sparse_bilateral_filtering(
                    depth, rgb, filter_size=(7, 5, 5, 3, 3),
                    depth_threshold=0.02, num_iter=5,
                )
                rgbs_pre.append(np.asarray(rgb_j))
                depths_pre.append(np.asarray(depth_j))
            else:
                rgbs_pre.append(np.asarray(scene.rgbs_gen_split[n]))
                depths_pre.append(np.asarray(scene.depth_gen_split[n]))

    # --- 2. DIBR all views into the target (text2nerf_main.py:128-136)
    my_map, warped_img, warped_depth = splat_ops.warp_many_to_one(
        rgbs_pre, depths_pre, scene.poses_gen[:view_idx],
        scene.poses_gen[view_idx], scene.intrinsic,
    )
    if ex.use_filter_filling_holes:
        from .. import native

        with phase_timer(f"{tag}_dibr_holefill", log):
            if native.available():
                # exact sequential fill (dibr_filter_mask2 semantics)
                warped_img, my_map_f, warped_depth = native.hole_fill2(
                    np.asarray(warped_img), np.asarray(my_map, np.float32),
                    np.asarray(warped_depth),
                )
            else:
                warped_img_j, my_map_j, warped_depth_j = filter_ops.hole_fill(
                    warped_img, my_map.astype(jnp.float32), warped_depth
                )
                warped_img = np.asarray(warped_img_j)
                my_map_f = np.asarray(my_map_j)
                warped_depth = np.asarray(warped_depth_j)
    else:
        my_map_f = np.asarray(my_map).astype(np.float32)
        warped_img = np.asarray(warped_img)
        warped_depth = np.asarray(warped_depth)

    _write(os.path.join(dibr, "warped", "%05d.png" % view_idx), warped_img)
    _write(os.path.join(dibr, "mask", "%05d.png" % view_idx), my_map_f)
    _write(os.path.join(dibr, "mask_inv", "%05d.png" % view_idx), 1 - my_map_f)

    # --- mask expansion (text2nerf_main.py:146-163): with
    # update_known_views the known-content mask is ERODED (blur > 0.99)
    # before everything downstream — the inpaint hole grows to cover the
    # blurry warp boundary whose pixels the back-warp would propagate
    # into known views.  (The reference's mask_ex difference image is
    # computed and never used — dead code, not reproduced.)
    if ex.update_known_views:
        my_map_f = np.asarray(
            filter_ops.expand_mask_blur(my_map_f, ksize=5, thresh=0.99)
        )
        _write(
            os.path.join(dibr, "warped", "%05d_expand.png" % view_idx),
            warped_img * my_map_f[..., None],
        )
        _write(os.path.join(dibr, "mask", "%05d_expand.png" % view_idx),
               my_map_f)
        _write(os.path.join(dibr, "mask_inv", "%05d_expand.png" % view_idx),
               1 - my_map_f)

    # --- 3. render the target view (text2nerf_main.py:164-178)
    with phase_timer(f"{tag}_render_target", log):
        out = render_ops.render_chunked(
            cfg_model, params, aabb,
            jnp.asarray(scene.rays_gen_split[view_idx]),
            n_samples=n_samples, chunk=ex.chunk, app_k=ex.app_k,
            white_bg=white_bg, alpha_mask=alpha_mask, compact_k=compact_k,
            eval_z_min=eval_z_min,
        )
        rgb_render = np.asarray(jnp.clip(out.rgb, 0, 1)).reshape(h, w, 3)
        depth_rendered = np.asarray(out.depth).reshape(h, w) * my_map_f
    _write(os.path.join(dibr, "rendered", "%05d_ori.png" % view_idx), rgb_render)

    # --- 4. diffusion inpainting + candidate ranking
    #        (text2nerf_main.py:186-220)
    mask_inv = 1.0 - my_map_f
    with phase_timer(f"{tag}_inpaint_rank", log):
        if ex.frame_select_type == "auto_cos":
            candidates = []
            rounds = max(1, ex.n_candidates // ex.candidates_per_round)
            for r in range(rounds):
                candidates += list(
                    services.inpaint(
                        rgb_render, mask_inv, prompt=ex.prompt,
                        negative_prompt=ex.negative_prompt,
                        num_images=ex.candidates_per_round,
                        seed=seed * 100 + r,
                    )
                )
            ref = scene.rgbs_gen_split[0]
            scores = services.rank(candidates, ref)
            img_new = np.asarray(candidates[int(np.argmax(scores))], np.float32)
            for i, cand in enumerate(candidates):
                _write(
                    os.path.join(dibr, "rgbs", "%05d_%03d.png" % (view_idx, i)),
                    cand,
                )
        else:
            img_new = np.asarray(
                services.inpaint(
                    rgb_render, mask_inv, prompt=ex.prompt,
                    negative_prompt=ex.negative_prompt, num_images=1, seed=seed,
                )[0],
                np.float32,
            )
    _write(os.path.join(dibr, "rgbs", "%05d.png" % view_idx), img_new)

    # --- 5. monocular depth + global alignment (text2nerf_main.py:222-270)
    with phase_timer(f"{tag}_depth_align", log):
        counts = np.asarray(services.estimate_depth(img_new))
        depth_est = counts / 12000.0 + ex.push_depth
        scale, shift = global_depth_alignment(
            depth_rendered, depth_est, my_map_f, ex.push_depth, seed=seed
        )
        depth_shift = depth_est * scale - shift

    # --- 6. local alignment: test-time finetuned merge net
    #        (text2nerf_main.py:272-283)
    depth_ref = ((depth_rendered - ex.push_depth) * 12000.0 / 32768.0 - 1.0) * my_map_f
    depth_src = (depth_shift - ex.push_depth) * 12000.0 / 32768.0 - 1.0
    with phase_timer(f"{tag}_merge_finetune", log):
        merged = services.merge.run_finetune(
            depth_ref.astype(np.float32), depth_src.astype(np.float32),
            my_map_f.copy(), outsize=max(h, w), lr=ex.merge_lr,
            iters=ex.merge_iters,
        )
        depth_new = ((np.asarray(merged) + 1.0) * 32768.0) / 12000.0 + ex.push_depth
        depth_new = depth_new.astype(np.float32)
    _write(
        os.path.join(dibr, "depth", "%05d_depth_finetuning2.png" % view_idx),
        (np.asarray(merged) + 1.0) * 32768.0,
    )

    # --- 7. filter the completed view (text2nerf_main.py:287-291)
    with phase_timer(f"{tag}_filter_new", log):
        img_j, depth_j = filter_ops.sparse_bilateral_filtering(
            depth_new, img_new, filter_size=(5, 5, 3, 3),
            depth_threshold=0.02, num_iter=4,
        )
        img_new, depth_new = np.asarray(img_j), np.asarray(depth_j)
    _write(os.path.join(dibr, "depth", "%05d_new.png" % view_idx), depth_new * 12000)

    # --- 8. append + support pools (text2nerf_main.py:296-299, 379-399)
    inpaint_mask = 1.0 - my_map_f
    scene = ss.append_generated_view(scene, img_new, depth_new, inpaint_mask)

    # --- 8b. optionally back-propagate the new content into known views
    #         (update_known_views branch, text2nerf_main.py:300-377;
    #         OFF in the production configuration, :658)
    if ex.update_known_views and view_idx > 0:
        scene = _update_known_views(
            view_idx, scene, services, ex, img_new, depth_new, my_map_f, seed,
            logdir=logdir,
        )

    with phase_timer(f"{tag}_support_pool", log):
        if ex.use_support_set:
            poses_support = traj.local_fixed_poses(
                scene.poses_gen[view_idx], angle=0, range_center=ex.trans_range,
                range_yaw=0.6, range_pitch=0.2,
            )
            rgbs_w, _, depth_w, masks_w = splat_ops.warp_one_to_many_with_mask(
                jnp.asarray(img_new), jnp.asarray(depth_new),
                jnp.asarray(poses_support[0]), jnp.asarray(poses_support[1:]),
                scene.intrinsic, extra_mask=inpaint_mask,
            )
            images = np.concatenate([img_new[None], np.asarray(rgbs_w)], 0)
            masks = np.concatenate([inpaint_mask[None], np.asarray(masks_w)], 0)
            depths = np.concatenate([depth_new[None], np.asarray(depth_w)], 0)
            rays_p, rgbs_p, depths_p, _, _, _ = ss.formatted_ray_pool(
                images, depths, masks, poses_support, scene.intrinsic, h, w
            )
        else:
            rays_p, rgbs_p, depths_p, _, _, _ = ss.formatted_ray_pool(
                img_new[None], depth_new[None], inpaint_mask[None],
                scene.poses_gen[view_idx][None], scene.intrinsic, h, w,
            )
    scene.updates["%05d" % view_idx] = (rays_p, rgbs_p, depths_p)
    return scene
