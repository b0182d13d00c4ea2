"""Fused volume rendering for TensoRF fields (the hot path).

TPU-native re-design of TensorBase.forward + OctreeRender_trilinear_fast
(/root/reference/models/tensorBase.py:436-507, /root/reference/renderer.py:28-42):

- Fixed shapes everywhere: every ray carries exactly ``n_samples`` samples;
  out-of-AABB samples are masked (sigma = 0) instead of gathered away.
- The reference evaluates appearance only where ``weight > 1e-4`` via boolean
  fancy-indexing (tensorBase.py:477-492) — dynamic shapes that cannot jit.
  Here we take the top-K samples per ray by weight (``lax.top_k``) and run
  the appearance gathers + shading MLP on the compacted [B, K] set.  When K
  covers every sample above the threshold (the usual case: weights are
  concentrated at the surface crossing), this is numerically identical,
  because sub-threshold samples contribute rgb = 0 exactly as the reference
  leaves them zero-filled.
- Compositing (cumprod transmittance, tensorBase.py:19-26) and the white
  background / depth-fill rules (tensorBase.py:497-505) are fused into the
  same jit region.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..models import tensorf as tf
from ..models import mlp as mlp_mod
from .rays import aabb_slab_entry


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray       # (B, 3) composited color in [0, 1]
    depth: jnp.ndarray     # (B,) expected termination depth (with bg fill)
    z_vals: jnp.ndarray    # (B, S) sample depths along each ray
    weights: jnp.ndarray   # (B, S) compositing weights
    acc: jnp.ndarray       # (B,) accumulated opacity


def _shade(cfg, params, xn, dirs, app_feat, is_train: bool):
    """Shading-head dispatch: the fused Pallas kernel on TPU eval paths
    (2.6x over the XLA head in isolation — it keeps the 351-wide PE
    expansion in VMEM), the autodiffable XLA head otherwise.  Opt-in via
    TEXT2NERF_PALLAS_HEAD=1: at the default app_k the head overlaps the
    gathers and the kernel does not move end-to-end time, while its Mosaic
    compile is slow on tunneled backends (PERF.md)."""
    import os

    if (
        not is_train
        and cfg.shading_mode == "MLP_Fea_noview"
        and os.environ.get("TEXT2NERF_PALLAS_HEAD") == "1"
    ):
        from .pallas.shading_mlp import pallas_available, shade_fea_noview_pallas

        if pallas_available():
            return shade_fea_noview_pallas(
                params["mlp"], app_feat, fea_pe=cfg.fea_pe
            )
    return mlp_mod.shade(
        cfg.shading_mode, params.get("mlp"), xn, dirs, app_feat,
        view_pe=cfg.view_pe, fea_pe=cfg.fea_pe, pos_pe=cfg.pos_pe,
    )


def raw2alpha(sigma, dists):
    """alpha/weights/background weight from density (tensorBase.py:19-26)."""
    alpha = 1.0 - jnp.exp(-sigma * dists)
    ones = jnp.ones_like(alpha[:, :1])
    t = jnp.cumprod(jnp.concatenate([ones, 1.0 - alpha + 1e-10], -1), -1)
    weights = alpha * t[:, :-1]
    return alpha, weights, t[:, -1:]


def _strip_pool(alpha_mask):
    """Drop the host-side 'pool' tag before a mask dict enters jit."""
    if alpha_mask is None:
        return None
    return {"volume": alpha_mask["volume"], "aabb": alpha_mask["aabb"]}


def render_rays(
    cfg: tf.TensoRFConfig,
    params,
    aabb,
    rays,
    rng: Optional[jax.Array] = None,
    *,
    n_samples: int,
    app_k: int = 64,
    is_train: bool = False,
    white_bg: bool = True,
    ndc: bool = False,
    alpha_mask=None,
    eval_z_min: float = 2.0,
    density_group: int = 1,
    density_block: int = 4,
    feature_dtype: str = "fp32",
) -> RenderOutput:
    return _render_rays(
        cfg, params, aabb, rays, rng, n_samples=n_samples, app_k=app_k,
        is_train=is_train, white_bg=white_bg, ndc=ndc,
        alpha_mask=_strip_pool(alpha_mask), eval_z_min=eval_z_min,
        density_group=density_group, density_block=density_block,
        feature_dtype=feature_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_samples", "app_k", "is_train", "white_bg", "ndc", "eval_z_min",
        "density_group", "density_block", "feature_dtype",
    ),
)
def _render_rays(
    cfg: tf.TensoRFConfig,
    params,
    aabb,
    rays,
    rng: Optional[jax.Array] = None,
    *,
    n_samples: int,
    app_k: int = 64,
    is_train: bool = False,
    white_bg: bool = True,
    ndc: bool = False,
    alpha_mask=None,
    eval_z_min: float = 2.0,
    density_group: int = 1,
    density_block: int = 4,
    feature_dtype: str = "fp32",
) -> RenderOutput:
    """Render a chunk of rays.

    Args:
      cfg: static model config.
      params: TensoRF parameter pytree.
      aabb: (2, 3) scene bounds.
      rays: (B, 6) [origin | direction] — directions pre-normalized by the
        data layer (scene_gen.py:45).
      rng: PRNG key; required when is_train (sample jitter + random white bg).
      n_samples: samples per ray (fixed; text2nerf_main.py:439).
      app_k: appearance compaction width (top-K samples by weight).
      alpha_mask: optional {'volume','aabb'} occupancy mask — samples where
        the mask is 0 are treated as empty (tensorBase.py:451-456).
      eval_z_min: eval-time world-z culling threshold — the "Eckert" filter
        dropping samples with z <= 2 at eval (tensorBase.py:458-462).
      density_group: >1 packs that many ray-consecutive samples per
        density gather/scatter row — callers MUST check
        tensorf.grouping_block first, passing their actual |direction
        component| bound when rays are not normalized (FOV > 90° exceeds
        1.0 and silently reads 0 otherwise; see grouping_safe).
      feature_dtype: 'bf16' runs the factor-gather value/lerp math (and
        its backward) in bfloat16 — index math and compositing stay fp32.
        Training-relevant deviation ~5e-3 rgb; fp32 is the default.
    """
    aabb = jnp.asarray(aabb)
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    b = rays.shape[0]

    if ndc:
        # sample_ray_ndc (tensorBase.py:293-302)
        z_vals = jnp.linspace(cfg.near, cfg.far, n_samples)[None, :]
        z_vals = jnp.broadcast_to(z_vals, (b, n_samples))
        if is_train:
            rng, k_jit = jax.random.split(rng)
            z_vals = z_vals + jax.random.uniform(k_jit, (b, n_samples)) * (
                (cfg.far - cfg.near) / n_samples
            )
        rays_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        viewdirs = rays_d / rays_norm
        pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], -1
        ) * rays_norm
    else:
        # sample_ray: slab entry + fixed step with per-ray jitter
        # (tensorBase.py:304-323)
        step = tf.step_size(aabb, tf.grid_resolution(cfg, params), cfg.step_ratio)
        t_min = aabb_slab_entry(rays_o, rays_d, aabb, cfg.near, cfg.far)
        steps = jnp.arange(n_samples, dtype=rays.dtype)[None, :]
        if is_train:
            rng, k_jit = jax.random.split(rng)
            steps = steps + jax.random.uniform(k_jit, (b, 1))
        z_vals = t_min[:, None] + step * steps
        pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
        dists = jnp.concatenate(
            [z_vals[:, 1:] - z_vals[:, :-1], jnp.zeros_like(z_vals[:, :1])], -1
        )
        viewdirs = rays_d

    valid = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    if alpha_mask is not None:
        # nearest-voxel lookup (1 gathered row/sample) instead of the
        # trilinear test (8 rows); equivalent ">0" decision given the
        # 3x3x3 max-pool applied when the mask is built
        # (tensorBase.py:355), at 1/8 the gather cost.
        am = _nearest_alpha_lookup(alpha_mask, pts.reshape(-1, 3)).reshape(b, -1)
        valid = valid & (am > 0)
    if not is_train:
        valid = valid & (pts[..., 2] > eval_z_min)

    fdt = jnp.bfloat16 if feature_dtype == "bf16" else None
    xn = jnp.clip(tf.normalize_coord(aabb, pts), -1.0, 1.0)
    packed = tf.pack_params(cfg, params)
    if density_group > 1:
        # group-packed gathers: G ray-consecutive samples per gathered
        # (and, in backward, per scattered) row — callers must check
        # tf.grouping_safe first (see ops/fused_gather.py)
        g = density_group
        pad = (-n_samples) % g
        xn_g = xn
        if pad:
            xn_g = jnp.concatenate(
                [xn, jnp.repeat(xn[:, -1:], pad, axis=1)], axis=1
            )
        grouped = tf.pack_params_grouped(cfg, params, block=density_block)
        feat = tf.compute_density_feature_grouped(
            cfg, grouped, xn_g.reshape(-1, g, 3), block=density_block,
            dtype=fdt,
        ).reshape(b, n_samples + pad)[:, :n_samples]
    else:
        feat = tf.compute_density_feature_packed(
            cfg, packed, xn.reshape(-1, 3), dtype=fdt
        ).reshape(b, n_samples)
    sigma = jnp.where(valid, tf.feature2density(cfg, feat), 0.0)

    _, weights, _ = raw2alpha(sigma, dists * cfg.distance_scale)
    acc = jnp.sum(weights, axis=-1)

    # --- appearance on the top-K weighted samples -------------------------
    k = min(app_k, n_samples)
    w_top, idx = jax.lax.top_k(weights, k)
    xn_k = jnp.take_along_axis(xn, idx[..., None], axis=1)
    app_ok = (w_top > cfg.raymarch_weight_thres)[..., None]

    app_feat = tf.compute_app_feature_packed(
        cfg, packed, xn_k.reshape(-1, 3), dtype=fdt
    )
    dirs_k = jnp.broadcast_to(viewdirs[:, None], (b, k, 3)).reshape(-1, 3)
    rgb_k = _shade(cfg, params, xn_k.reshape(-1, 3), dirs_k, app_feat,
                   is_train).reshape(b, k, 3)
    rgb_k = jnp.where(app_ok, rgb_k, 0.0)

    rgb = jnp.sum(w_top[..., None] * rgb_k, axis=1)

    if white_bg:
        rgb = rgb + (1.0 - acc[..., None])
    elif is_train:
        rng, k_bg = jax.random.split(rng)
        use_bg = jax.random.uniform(k_bg, ()) < 0.5
        rgb = jnp.where(use_bg, rgb + (1.0 - acc[..., None]), rgb)
    rgb = jnp.clip(rgb, 0.0, 1.0)

    depth = jnp.sum(weights * z_vals, axis=-1) + (1.0 - acc) * rays[:, -1]
    return RenderOutput(rgb=rgb, depth=depth, z_vals=z_vals, weights=weights, acc=acc)


def occupancy_stride_safe(
    cfg, params, aabb, alpha_mask, stride: int, dir_bound: float = 1.0
) -> bool:
    """Host-side guard for strided occupancy testing (analogous to
    tensorf.grouping_safe for grouped gathers — ADVICE r2).

    Testing occupancy only every ``stride``-th sample is conservative only
    when the untested neighbors' lookups stay inside the mask's EXTRA
    dilation: the reference's own 3³ max-pool (tensorBase.py:355) is
    already spent making the nearest-voxel test conservative, so the
    slack is ``(pool-3)/2`` mask voxels.  An untested sample drifts at
    most ``(stride-1)·step·dir_bound`` world units from its tested
    neighbor (``dir_bound``: max |direction| component — 1.0 for the
    normalized directions the data layer emits; pass the actual bound for
    unnormalized wide-FOV rays).  With a large step_ratio or anisotropic
    mask voxels the bound fails and callers must fall back to stride 1 —
    render_rays_compact does so automatically.

    Results are memoized in the mask dict (keyed by grid reso / step_ratio
    / stride) so the aabb readback happens once per mask, not per chunk.
    """
    if stride <= 1:
        return True
    import numpy as np

    from ..models import tensorf as tf_mod

    reso = tf_mod.grid_resolution(cfg, params)
    key = (reso, float(cfg.step_ratio), int(stride), float(dir_bound))
    cache = alpha_mask.setdefault("_stride_safe", {})
    if key not in cache:
        pool = int(alpha_mask.get("pool", 3))
        slack = (pool - 3) // 2
        if slack <= 0:
            cache[key] = False
        else:
            d, h, w = alpha_mask["volume"].shape
            m_aabb = np.asarray(alpha_mask["aabb"], np.float64)
            mask_unit = (
                (m_aabb[1] - m_aabb[0]) / np.array([w - 1, h - 1, d - 1])
            ).min()
            a = np.asarray(aabb, np.float64)
            step = ((a[1] - a[0]) / (np.asarray(reso) - 1)).mean() * float(
                cfg.step_ratio
            )
            cache[key] = bool(
                (stride - 1) * step * dir_bound <= slack * mask_unit + 1e-9
            )
    return cache[key]


def _nearest_alpha_lookup(alpha_mask, pts):
    """Single-gather occupancy test: nearest-voxel lookup into the (dilated)
    alpha volume.  One gathered row per sample vs 8 for the trilinear test;
    conservative when the volume was built with the reference's 3x3x3
    max-pool (tensorBase.py:355)."""
    volume, aabb = alpha_mask["volume"], alpha_mask["aabb"]
    d, h, w = volume.shape
    xn = jnp.clip(tf.normalize_coord(aabb, pts), -1.0, 1.0)
    ix = jnp.round((xn[..., 0] + 1) * 0.5 * (w - 1)).astype(jnp.int32)
    iy = jnp.round((xn[..., 1] + 1) * 0.5 * (h - 1)).astype(jnp.int32)
    iz = jnp.round((xn[..., 2] + 1) * 0.5 * (d - 1)).astype(jnp.int32)
    flat = volume.reshape(-1)
    return jnp.take(flat, (iz * h + iy) * w + ix)


def first_k_live(live, k: int, impl: str = "sort"):
    """Per-row indices of the first ``k`` True entries of ``live`` (B, N),
    ascending, padded with N where a row has fewer; plus the pad mask.

    Three equivalent lowerings (semantics identical, TPU cost is not —
    the full bitonic sort pays O(N log^2 N) compare-swap passes through
    HBM for what is a streaming compaction):

    - ``sort``: sort the live-index key, take the first k columns.
    - ``topk``: ``lax.top_k`` on the negated key — a partial sort.
    - ``rank``: live-rank (exclusive cumsum) names each live sample's
      output slot; a block scan streams N in slabs, min-reducing each
      slab's slot hits into a (B, k) carry — one pass over N, no sort.
    """
    b, n = live.shape
    if impl in ("sort", "topk"):
        steps = jnp.arange(n, dtype=jnp.int32)[None, :]
        order_key = jnp.where(live, steps, n)
        if impl == "sort":
            idx = jnp.sort(order_key, axis=-1)[:, :k]
        else:
            idx = -jax.lax.top_k(-order_key, k)[0]
    elif impl == "rank":
        rank = jnp.cumsum(live.astype(jnp.int32), axis=-1) - 1
        tgt = jnp.where(live & (rank < k), rank, k)  # k = discard slot
        blk = 16
        n_pad = n + ((-n) % blk)
        tgt = jnp.pad(tgt, ((0, 0), (0, n_pad - n)), constant_values=k)
        slots = jnp.arange(k, dtype=jnp.int32)
        base = jnp.arange(n_pad, dtype=jnp.int32).reshape(-1, blk)

        def body(acc, xs):
            tgt_b, j_b = xs  # (B, blk), (blk,)
            hit = tgt_b[..., None] == slots  # (B, blk, k) — fused
            cand = jnp.min(jnp.where(hit, j_b[None, :, None], n), axis=1)
            return jnp.minimum(acc, cand), None

        init = jnp.full((b, k), n, jnp.int32)
        idx, _ = jax.lax.scan(
            body, init, (tgt.reshape(b, -1, blk).swapaxes(0, 1), base)
        )
    else:
        raise ValueError(f"unknown first_k_live impl: {impl!r}")
    sel = idx < n
    return jnp.minimum(idx, n - 1), sel


def last_k_live(live, k: int, impl: str = "sort"):
    """Per-row indices of the LAST ``k`` True entries of ``live`` (B, N),
    ascending, plus the selection mask (pad slots are False and point at 0,
    placed at the FRONT so the kept indices stay in march order).

    Companion to first_k_live for the depth-anchored train compaction
    (PERF.md round 4): when a ray crosses more than K mask-live samples
    BEFORE its supervised depth, the first-K window ends before the
    content the rgb loss is asked to reproduce — the optimizer then
    manufactures fog inside the window (measured: the last generated
    view's hole region collapsed to 6 dB at the full schedule).  Anchoring
    the window to END at the supervised depth (+band) guarantees the
    supervised surface is always rendered.
    """
    n = live.shape[1]
    idx_r, sel_r = first_k_live(live[:, ::-1], k, impl=impl)
    idx = jnp.where(sel_r, (n - 1) - idx_r, 0)
    return idx[:, ::-1], sel_r[:, ::-1]


#: compact_k buckets an adaptive eval picks from — a small static set so
#: at most len(buckets) jit specializations of the render exist per config
ADAPTIVE_K_BUCKETS = (16, 32, 48, 64, 96, 128)

#: per-(field, mask, ladder) memo of the adaptive probe's starting rung
#: (render_chunked_adaptive) — identity-keyed like the trainer's stamped
#: mask memo; bounded, hint-only (a stale hit costs at most an extra
#: escalation round or a wider-than-needed K, never accuracy)
_ADAPTIVE_PROBE_CACHE: dict = {}


def adaptive_compact_k(max_live: int, buckets=ADAPTIVE_K_BUCKETS) -> int:
    """Smallest bucket covering ``max_live`` mask-live samples (the largest
    bucket when none does — the existing tail-truncation semantics then
    apply, see render_rays_compact)."""
    for b in buckets:
        if b >= max_live:
            return b
    return buckets[-1]


@functools.partial(jax.jit, static_argnames=("cfg", "n_samples", "occ_stride",
                                             "eval_z_min"))
def _count_live_samples(cfg, params, aabb, rays, alpha_mask, *, n_samples,
                        occ_stride, eval_z_min):
    aabb = jnp.asarray(aabb)
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    b = rays.shape[0]
    step = tf.step_size(aabb, tf.grid_resolution(cfg, params), cfg.step_ratio)
    t_min = aabb_slab_entry(rays_o, rays_d, aabb, cfg.near, cfg.far)
    steps = jnp.arange(n_samples, dtype=rays.dtype)[None, :]
    z_vals = t_min[:, None] + step * steps
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]
    valid = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    valid = valid & (pts[..., 2] > eval_z_min)
    if occ_stride == 1:
        occ = _nearest_alpha_lookup(alpha_mask, pts.reshape(-1, 3)).reshape(
            b, n_samples
        )
    else:
        n_t = (n_samples + occ_stride - 1) // occ_stride
        occ_t = _nearest_alpha_lookup(
            alpha_mask, pts[:, ::occ_stride].reshape(-1, 3)
        ).reshape(b, n_t)
        occ = jnp.repeat(occ_t, occ_stride, axis=1)[:, :n_samples]
    return jnp.sum((valid & (occ > 0)).astype(jnp.int32), axis=-1)


def count_live_samples(cfg, params, aabb, rays, alpha_mask, *, n_samples,
                       occ_stride, eval_z_min: float = 2.0):
    """Per-ray count of mask-live samples under EXACTLY the live rule
    _render_rays_compact selects with (same z-cull, same strided occupancy
    broadcast) — so ``compact_k >= counts.max()`` renders every live
    sample with zero tail truncation.  One occupancy row per tested sample;
    no feature gathers — the cheap pre-pass an adaptive-K eval runs once
    per view (see adaptive_compact_k / render_view_adaptive)."""
    return _count_live_samples(
        cfg, params, aabb, rays, _strip_pool(alpha_mask),
        n_samples=n_samples, occ_stride=occ_stride, eval_z_min=eval_z_min,
    )


def render_rays_compact(
    cfg: tf.TensoRFConfig,
    params,
    aabb,
    rays,
    alpha_mask,
    *,
    n_samples: int,
    compact_k: int = 96,
    app_k: int = 48,
    white_bg: bool = True,
    eval_z_min: float = 2.0,
    feature_dtype: str = "bf16",
    select_impl: Optional[str] = None,
) -> RenderOutput:
    """Eval renderer with alpha-mask sample compaction.

    Matches the reference's alpha-mask culling semantics
    (tensorBase.py:451-456: sigma = 0 where the mask is 0) for rays with
    at most ``compact_k`` mask-occupied samples: excluded samples
    contribute alpha = 0, so compositing over the first ``compact_k``
    occupied samples per ray equals the dense product.  Rays with MORE
    than ``compact_k`` occupied samples have their tail truncated
    (dropped alpha; white background fills the missing acc) — raise
    ``compact_k`` if the scene's occupancy along rays exceeds it; the
    ``app_k`` top-K can additionally drop above-threshold appearance
    samples.  Feature gathers run only on B*K rows instead of B*S — the
    main throughput lever once a trained field has a tight occupancy
    mask (see PERF.md).

    Two TPU levers on top (PERF.md round 2: +41% together):
    - occupancy striding: when the mask was built with a ``pool`` > 3
      dilation (update_alpha_mask), occupancy is tested only every
      (pool-1)//2-th sample and broadcast — conservative because the
      dilation covers the untested neighbors, so no live sample is missed;
    - ``feature_dtype='bf16'``: value/lerp math of the feature gathers in
      bfloat16 (index math stays fp32) — ~5e-3 max rgb deviation; pass
      'fp32' for bit-level parity with the dense path.
    """
    occ_stride = max(1, (int(alpha_mask.get("pool", 3)) - 1) // 2)
    if occ_stride > 1 and not occupancy_stride_safe(
        cfg, params, aabb, alpha_mask, occ_stride
    ):
        occ_stride = 1
    return _render_rays_compact(
        cfg, params, aabb, rays, _strip_pool(alpha_mask),
        n_samples=n_samples, compact_k=compact_k, app_k=app_k,
        white_bg=white_bg, eval_z_min=eval_z_min, occ_stride=occ_stride,
        feature_dtype=feature_dtype,
        select_impl=_resolve_select_impl(select_impl),
    )


_SELECT_IMPLS = ("sort", "topk", "rank")


def _resolve_select_impl(impl: Optional[str]) -> str:
    """Explicit arg > TEXT2NERF_SELECT_IMPL env > 'sort'.  Rejects unknown
    values loudly (a typo must not silently fall back)."""
    import os

    if impl is None:
        impl = os.environ.get("TEXT2NERF_SELECT_IMPL", "") or "sort"
    if impl not in _SELECT_IMPLS:
        raise ValueError(
            f"select_impl must be one of {_SELECT_IMPLS}, got {impl!r}"
        )
    return impl


def render_rays_compact_need(
    cfg, params, aabb, rays, alpha_mask, *, n_samples, compact_k,
    app_k, k_ladder, white_bg=True, eval_z_min=2.0, feature_dtype="bf16",
    acc_tol=1e-3, select_impl=None,
):
    """render_rays_compact + a PER-RAY escalation target: for each ray
    whose mask-live samples overflow ``compact_k`` while its
    transmittance has not saturated (acc < 1 - acc_tol), the int8 index
    of the smallest ``k_ladder`` rung covering its live count (0 for
    rays needing no escalation).  The repacking adaptive renderer
    (render_chunked_adaptive) reads this back once per view — one
    byte/ray — and re-renders exactly the flagged rays at exactly the
    rung they need, instead of re-rendering whole chunks rung by rung."""
    occ_stride = max(1, (int(alpha_mask.get("pool", 3)) - 1) // 2)
    if occ_stride > 1 and not occupancy_stride_safe(
        cfg, params, aabb, alpha_mask, occ_stride
    ):
        occ_stride = 1
    return _render_rays_compact(
        cfg, params, aabb, rays, _strip_pool(alpha_mask),
        n_samples=n_samples, compact_k=compact_k, app_k=app_k,
        white_bg=white_bg, eval_z_min=eval_z_min, occ_stride=occ_stride,
        feature_dtype=feature_dtype, overflow_tol=float(acc_tol),
        select_impl=_resolve_select_impl(select_impl),
        need_ladder=tuple(int(k) for k in k_ladder),
    )


def render_rays_compact_flagged(
    cfg, params, aabb, rays, alpha_mask, *, n_samples, compact_k,
    app_k, white_bg=True, eval_z_min=2.0, feature_dtype="bf16",
    acc_tol=1e-3, select_impl=None,
):
    """render_rays_compact + an escalation flag: the count of rays whose
    mask-live samples OVERFLOW ``compact_k`` while their transmittance has
    NOT saturated (acc < 1 - acc_tol) — exactly the rays whose truncated
    tail could still contribute color.  Rays that saturate early (opaque
    surface hit) and rays with few live samples (background) never flag,
    so the count is the per-chunk 'does K need to grow' signal the
    adaptive ladder reads (render_chunked_adaptive)."""
    occ_stride = max(1, (int(alpha_mask.get("pool", 3)) - 1) // 2)
    if occ_stride > 1 and not occupancy_stride_safe(
        cfg, params, aabb, alpha_mask, occ_stride
    ):
        occ_stride = 1
    return _render_rays_compact(
        cfg, params, aabb, rays, _strip_pool(alpha_mask),
        n_samples=n_samples, compact_k=compact_k, app_k=app_k,
        white_bg=white_bg, eval_z_min=eval_z_min, occ_stride=occ_stride,
        feature_dtype=feature_dtype, overflow_tol=float(acc_tol),
        select_impl=_resolve_select_impl(select_impl),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_samples", "compact_k", "app_k", "white_bg", "eval_z_min",
        "occ_stride", "feature_dtype", "overflow_tol", "select_impl",
        "need_ladder",
    ),
)
def _render_rays_compact(
    cfg: tf.TensoRFConfig,
    params,
    aabb,
    rays,
    alpha_mask,
    *,
    n_samples: int,
    compact_k: int,
    app_k: int,
    white_bg: bool,
    eval_z_min: float,
    occ_stride: int,
    feature_dtype: str,
    overflow_tol: Optional[float] = None,
    select_impl: str = "sort",
    need_ladder: Optional[tuple] = None,
) -> RenderOutput:
    fdt = jnp.bfloat16 if feature_dtype == "bf16" else None
    aabb = jnp.asarray(aabb)
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    b = rays.shape[0]
    step = tf.step_size(aabb, tf.grid_resolution(cfg, params), cfg.step_ratio)
    t_min = aabb_slab_entry(rays_o, rays_d, aabb, cfg.near, cfg.far)
    steps = jnp.arange(n_samples, dtype=rays.dtype)[None, :]
    z_vals = t_min[:, None] + step * steps
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]

    valid = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    valid = valid & (pts[..., 2] > eval_z_min)
    if occ_stride == 1:
        occ = _nearest_alpha_lookup(alpha_mask, pts.reshape(-1, 3)).reshape(
            b, n_samples
        )
    else:
        # every occ_stride-th sample is tested; the mask's dilation covers
        # the in-between samples, so broadcasting the tested value to its
        # group never drops a live sample (it may add dead ones, which
        # contribute sigma and get culled by k_live weighting anyway).
        # Tested points are recomputed at the strided positions (identical
        # float path to pts) so the full (B, N, 3) pts never materializes.
        n_t = (n_samples + occ_stride - 1) // occ_stride
        pts_t = rays_o[:, None] + rays_d[:, None] * z_vals[
            :, ::occ_stride, None
        ]
        occ_t = _nearest_alpha_lookup(
            alpha_mask, pts_t.reshape(-1, 3)
        ).reshape(b, n_t)
        occ = jnp.repeat(occ_t, occ_stride, axis=1)[:, :n_samples]
    live = valid & (occ > 0)
    n_live = jnp.sum(live.astype(jnp.int32), axis=-1)

    # first-K live samples per ray, in ray order
    k = min(compact_k, n_samples)
    idx, k_live = first_k_live(live, k, impl=select_impl)

    # z/pts at the selected samples are RECOMPUTED from idx with the
    # exact expression that built z_vals/pts (bit-identical float path) —
    # a take_along_axis here would force the (B, N, 3) pts tensor to
    # materialize in HBM solely to be gathered back, where recomputation
    # lets XLA fuse pts into its elementwise consumers above
    z_k = t_min[:, None] + step * idx.astype(rays.dtype)
    pts_k = rays_o[:, None] + rays_d[:, None] * z_k[..., None]
    xn_k = jnp.clip(tf.normalize_coord(aabb, pts_k), -1.0, 1.0)

    # app_k >= k shades every compacted sample → the channel-fused tables
    # serve density AND appearance from one gathered row per factor (half
    # the rows; see pack_params_fused + the train-compact path below)
    shade_all = app_k >= k
    if shade_all:
        feat, app_feat = tf.compute_fused_features_packed(
            cfg, tf.pack_params_fused(cfg, params),
            xn_k.reshape(-1, 3), dtype=fdt,
        )
        feat = feat.reshape(b, k)
    else:
        packed = tf.pack_params(cfg, params)
        feat = tf.compute_density_feature_packed(
            cfg, packed, xn_k.reshape(-1, 3), dtype=fdt
        ).reshape(b, k)
    sigma = jnp.where(k_live, tf.feature2density(cfg, feat), 0.0)
    # uniform eval sampling → every inter-sample dist is exactly `step`,
    # except the dense march's final sample which carries dist 0
    # (tensorBase.py:448)
    dists = jnp.where(idx == n_samples - 1, 0.0, step) * cfg.distance_scale
    _, weights, _ = raw2alpha(sigma, dists)
    acc = jnp.sum(weights, axis=-1)

    if shade_all:
        k2 = k
        w_top, xn_a = weights, xn_k
    else:
        k2 = min(app_k, k)
        w_top, aidx = jax.lax.top_k(weights, k2)
        xn_a = jnp.take_along_axis(xn_k, aidx[..., None], axis=1)
        app_feat = tf.compute_app_feature_packed(
            cfg, packed, xn_a.reshape(-1, 3), dtype=fdt
        )
    app_ok = (w_top > cfg.raymarch_weight_thres)[..., None]
    dirs_a = jnp.broadcast_to(rays_d[:, None], (b, k2, 3)).reshape(-1, 3)
    rgb_a = _shade(
        cfg, params, xn_a.reshape(-1, 3), dirs_a, app_feat, False
    ).reshape(b, k2, 3)
    rgb_a = jnp.where(app_ok, rgb_a, 0.0)
    rgb = jnp.sum(w_top[..., None] * rgb_a, axis=1)
    if white_bg:
        rgb = rgb + (1.0 - acc[..., None])
    rgb = jnp.clip(rgb, 0.0, 1.0)
    depth = jnp.sum(weights * z_k, axis=-1) + (1.0 - acc) * rays[:, -1]
    out = RenderOutput(rgb=rgb, depth=depth, z_vals=z_k, weights=weights,
                       acc=acc)
    if overflow_tol is not None:
        flagged = (n_live > k) & (acc < 1.0 - overflow_tol)
        if need_ladder is not None:
            # per-ray escalation target: the smallest ladder rung whose K
            # covers this ray's live count (clipped to the top rung — rays
            # beyond it keep the top rung's truncation semantics).  int8:
            # one byte/ray crosses the host link (render_chunked_adaptive
            # reads it back once per view to repack flagged rays).
            ladder = jnp.asarray(need_ladder, jnp.int32)
            rung = jnp.clip(
                jnp.searchsorted(ladder, n_live), 0, len(need_ladder) - 1
            )
            need = jnp.where(flagged, rung, 0).astype(jnp.int8)
            return out, need
        # rays whose truncated tail could still matter: more live samples
        # than K AND unsaturated transmittance (see
        # render_rays_compact_flagged)
        return out, jnp.sum(flagged.astype(jnp.int32))
    return out


def render_rays_train_compact(
    cfg: tf.TensoRFConfig,
    params,
    aabb,
    rays,
    alpha_mask,
    rng,
    *,
    n_samples: int,
    compact_k: int = 96,
    app_k: int = 48,
    white_bg: bool = True,
    density_group: int = 1,
    density_block: int = 4,
    feature_dtype: str = "fp32",
    select_impl: Optional[str] = None,
    depth_gt=None,
    cap_band_samples: int = 0,
) -> RenderOutput:
    """TRAIN-path alpha-mask sample compaction (round-3 perf lever).

    The reference's training loop never sets the alpha mask (SURVEY §3.1:
    alphaMask "never set here"), so its hot loop gathers all ``n_samples``
    per ray.  Once a mask exists, masked culling (tensorBase.py:451-456)
    zeroes most samples' sigma — this path gathers (and, in the backward,
    scatters) only the first ``compact_k`` mask-live samples per ray,
    cutting the scatter-bound backward's row count by the mask's live
    fraction.  Differences vs the dense unmasked step are exactly the
    mask-culled samples (below the alpha threshold by construction) plus
    tail truncation past ``compact_k``.

    Train extras over _render_rays_compact: per-ray sampling jitter, the
    random white-background rule, the autodiffable shading head, and
    support for ``density_group=2`` — compaction granularity becomes the
    GROUP (pairs of ray-consecutive samples share one gathered/scattered
    block row; callers must check tensorf.grouping_block, and the group
    doubles as the occupancy-test stride, licensed by the same pool
    dilation as eval striding).

    ``depth_gt`` (B,) + ``cap_band_samples`` > 0 switch on DEPTH-ANCHORED
    selection (round 4): live samples are capped at ``z <= depth_gt +
    cap_band_samples * step`` and the LAST K capped-live samples are kept,
    so the window always ends at — and therefore covers — the supervised
    surface.  Rationale: first-K-live truncation before the GT depth asks
    the rgb loss to reproduce content the render cannot see, which
    manufactures fog early in the window (measured at the full schedule:
    25% of the last view's hole rays truncated, hole PSNR 6 dB).  Samples
    behind the cap are exactly those the ray's own supervision says are
    occluded; samples before the window start are those the 1e3-weighted
    transmittance-margin loss wants empty (the dropped gradient there is
    the reference's own margin semantics applied through other rays).
    Rays with depth_gt <= 0 keep an uncapped window (cap = +inf).
    """
    g = max(1, int(density_group))
    occ_stride = g
    if g == 1:
        # per-sample compaction may still test occupancy every 2nd sample
        # when the mask's dilation licenses it (eval-path rule)
        s = max(1, (int(alpha_mask.get("pool", 3)) - 1) // 2)
        if s > 1 and occupancy_stride_safe(cfg, params, aabb, alpha_mask, s):
            occ_stride = s
    elif not occupancy_stride_safe(cfg, params, aabb, alpha_mask, g):
        raise ValueError(
            "density_group=%d needs a mask pool dilation licensing stride-%d "
            "occupancy tests (update_alpha_mask(pool>=%d))" % (g, g, 2 * g + 1)
        )
    return _render_rays_train_compact(
        cfg, params, aabb, rays, _strip_pool(alpha_mask), rng,
        n_samples=n_samples, compact_k=compact_k, app_k=app_k,
        white_bg=white_bg, density_group=g, density_block=density_block,
        occ_stride=occ_stride, feature_dtype=feature_dtype,
        select_impl=_resolve_select_impl(select_impl),
        depth_gt=depth_gt, cap_band_samples=cap_band_samples,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "n_samples", "compact_k", "app_k", "white_bg",
        "density_group", "density_block", "occ_stride", "feature_dtype",
        "select_impl", "cap_band_samples",
    ),
)
def _render_rays_train_compact(
    cfg: tf.TensoRFConfig,
    params,
    aabb,
    rays,
    alpha_mask,
    rng,
    *,
    n_samples: int,
    compact_k: int,
    app_k: int,
    white_bg: bool,
    density_group: int,
    density_block: int,
    occ_stride: int,
    feature_dtype: str,
    select_impl: str = "sort",
    depth_gt=None,
    cap_band_samples: int = 0,
) -> RenderOutput:
    fdt = jnp.bfloat16 if feature_dtype == "bf16" else None
    g = density_group
    aabb = jnp.asarray(aabb)
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    b = rays.shape[0]

    # jittered fixed-step sampling (tensorBase.py:304-323), padded to a
    # multiple of g so groups are ray-consecutive sample pairs
    s_pad = n_samples + ((-n_samples) % g)
    step = tf.step_size(aabb, tf.grid_resolution(cfg, params), cfg.step_ratio)
    t_min = aabb_slab_entry(rays_o, rays_d, aabb, cfg.near, cfg.far)
    rng, k_jit = jax.random.split(rng)
    jit_u = jax.random.uniform(k_jit, (b, 1))
    steps = jnp.arange(s_pad, dtype=rays.dtype)[None, :] + jit_u
    z_vals = t_min[:, None] + step * steps
    pts = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]

    valid = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    # padding samples (index >= n_samples) are never live
    valid = valid & (steps < n_samples)

    # occupancy, tested every occ_stride-th sample and broadcast (the
    # mask's pool dilation covers the untested neighbors); tested points
    # recomputed at the strided positions — same float path as pts, so
    # the (B, N, 3) pts tensor stays fused into its elementwise consumers
    n_t = (s_pad + occ_stride - 1) // occ_stride
    pts_t = rays_o[:, None] + rays_d[:, None] * z_vals[:, ::occ_stride, None]
    occ_t = _nearest_alpha_lookup(
        alpha_mask, pts_t.reshape(-1, 3)
    ).reshape(b, n_t)
    occ = jnp.repeat(occ_t, occ_stride, axis=1)[:, :s_pad]
    live = valid & (occ > 0)

    anchored = depth_gt is not None and cap_band_samples > 0
    if anchored:
        # depth-anchored selection (see render_rays_train_compact): drop
        # live samples behind the supervised surface (+band) so the LAST-K
        # window below always ends at — and covers — the GT depth
        cap = jnp.where(
            depth_gt > 0, depth_gt + cap_band_samples * step, jnp.inf
        )
        live = live & (z_vals <= cap[:, None])

    n_groups = s_pad // g
    kg = max(1, min(compact_k, n_samples) // g)
    if g > 1:
        live_g = jnp.any(live.reshape(b, n_groups, g), axis=-1)
    else:
        live_g = live
    if anchored:
        # last-Kg capped-live groups per ray, ascending
        gidx, g_live = last_k_live(live_g, kg, impl=select_impl)
    else:
        # first-Kg live groups per ray, in ray order
        gidx, g_live = first_k_live(live_g, kg, impl=select_impl)

    # member sample indices of the selected groups: (B, Kg*g); z/pts at
    # the selected samples are RECOMPUTED from midx with the exact float
    # path that built z_vals/pts (take_along_axis would force pts to
    # materialize in HBM solely to be gathered back)
    midx = (gidx[..., None] * g + jnp.arange(g, dtype=jnp.int32)).reshape(b, kg * g)
    steps_k = midx.astype(rays.dtype) + jit_u
    z_k = t_min[:, None] + step * steps_k
    pts_k = rays_o[:, None] + rays_d[:, None] * z_k[..., None]
    valid_k = (
        jnp.all((pts_k >= aabb[0]) & (pts_k <= aabb[1]), axis=-1)
        & (steps_k < n_samples)
        & jnp.repeat(g_live, g, axis=1)
    )
    xn_k = jnp.clip(tf.normalize_coord(aabb, pts_k), -1.0, 1.0)

    # when every compacted sample is shaded (app_k covers the compacted
    # set — the trainer default app_k == compact_k), density and
    # appearance read the SAME sample positions: the channel-fused tables
    # (tensorf.pack_params_fused) serve both heads from one gathered row
    # per factor, halving the forward gather AND backward scatter rows vs
    # split tables (gather/scatter cost is row-count-bound, PERF.md).
    # top_k is also skipped — shading all samples above the weight
    # threshold is exactly the reference rule (tensorBase.py:477-492).
    shade_all = app_k >= kg * g
    if shade_all:
        feat, app_feat = tf.compute_fused_features_packed(
            cfg, tf.pack_params_fused(cfg, params),
            xn_k.reshape(-1, 3), dtype=fdt,
        )
        feat = feat.reshape(b, kg * g)
    elif g > 1:
        packed = tf.pack_params(cfg, params)
        grouped = tf.pack_params_grouped(cfg, params, block=density_block)
        feat = tf.compute_density_feature_grouped(
            cfg, grouped, xn_k.reshape(-1, g, 3), block=density_block, dtype=fdt
        ).reshape(b, kg * g)
    else:
        packed = tf.pack_params(cfg, params)
        feat = tf.compute_density_feature_packed(
            cfg, packed, xn_k.reshape(-1, 3), dtype=fdt
        ).reshape(b, kg * g)
    sigma = jnp.where(valid_k, tf.feature2density(cfg, feat), 0.0)
    # uniform spacing: every inter-sample dist is exactly `step` (the
    # jitter is per-ray, so spacing is preserved), except the dense
    # march's final sample which carries dist 0 (tensorBase.py:448)
    dists = jnp.where(midx == n_samples - 1, 0.0, step) * cfg.distance_scale
    _, weights, _ = raw2alpha(sigma, dists)
    acc = jnp.sum(weights, axis=-1)

    if shade_all:
        k2 = kg * g
        w_top, xn_a = weights, xn_k
    else:
        k2 = min(app_k, kg * g)
        w_top, aidx = jax.lax.top_k(weights, k2)
        xn_a = jnp.take_along_axis(xn_k, aidx[..., None], axis=1)
        app_feat = tf.compute_app_feature_packed(
            cfg, packed, xn_a.reshape(-1, 3), dtype=fdt
        )
    app_ok = (w_top > cfg.raymarch_weight_thres)[..., None]
    dirs_a = jnp.broadcast_to(rays_d[:, None], (b, k2, 3)).reshape(-1, 3)
    rgb_a = _shade(
        cfg, params, xn_a.reshape(-1, 3), dirs_a, app_feat, True
    ).reshape(b, k2, 3)
    rgb_a = jnp.where(app_ok, rgb_a, 0.0)
    rgb = jnp.sum(w_top[..., None] * rgb_a, axis=1)

    if white_bg:
        rgb = rgb + (1.0 - acc[..., None])
    else:
        rng, k_bg = jax.random.split(rng)
        use_bg = jax.random.uniform(k_bg, ()) < 0.5
        rgb = jnp.where(use_bg, rgb + (1.0 - acc[..., None]), rgb)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    depth = jnp.sum(weights * z_k, axis=-1) + (1.0 - acc) * rays[:, -1]
    return RenderOutput(rgb=rgb, depth=depth, z_vals=z_k, weights=weights, acc=acc)


#: default K ladder for adaptive compacted eval — render every chunk at
#: the first rung, escalate only flagged chunks (acc-gated, see
#: render_rays_compact_flagged).  Rungs are the measured cost curve's
#: sweet spots (PERF.md round 4: ms/chunk ≈ linear in K).
ADAPTIVE_EVAL_LADDER = (32, 64, 128)


def render_chunked_adaptive(
    cfg,
    params,
    aabb,
    rays,
    alpha_mask,
    *,
    n_samples: int,
    chunk: int = 16384,
    app_k: int = 64,
    white_bg: bool = True,
    eval_z_min: float = 2.0,
    k_ladder=ADAPTIVE_EVAL_LADDER,
    acc_tol: float = 1e-3,
    feature_dtype: str = "bf16",
    probe: bool = True,
    sample_budget: int = 1_048_576,
):
    """Chunked eval renderer with per-RAY adaptive compact-K (repacking).

    Accuracy contract (same acc-gate as round 4, tightened): a ray is
    rendered at a rung whose K covers ALL its mask-live samples — zero
    truncation — unless (a) it saturated transmittance at the base rung
    (acc >= 1 - acc_tol: its truncated tail cannot contribute) or (b) its
    live count exceeds the top rung, in which case it keeps the top
    rung's truncation semantics (never less accurate than a fixed
    K=k_ladder[-1] render).

    Mechanics — built around the two real costs on a tunneled chip,
    host<->device syncs and re-rendered rays:
      1. every chunk renders ONCE at the base rung; the same kernel also
         emits each ray's escalation target (the smallest rung covering
         its live count, 0 if the acc-gate clears it) as int8 — the
         live counts and transmittance are already computed in-kernel,
         so the flags are free;
      2. ONE host readback per view (1 byte/ray) collects the targets;
      3. flagged rays — and only those rays — are REPACKED (gathered by
         index) into padded groups per rung and re-rendered at exactly
         the K they need, then scattered back.  The round-4 ladder
         re-rendered whole 16384-ray chunks rung by rung with a sync per
         rung; on a trained field where ~1% of rays straddle silhouette
         edges, that re-paid up to the whole view per rung — repacking
         pays only the flagged rays once (PERF.md round 5).

    The base rung is memoized per (field, mask, ladder, ...) identity:
    after each view the median per-ray effective rung is stored, so a
    fog-regime field (every ray escalates — the round-4 53.8k rays/s
    pathology) starts subsequent views AT the rung it needs and pays no
    escalation at all, while trained fields keep base = bottom.  The memo
    is a hint only: any base under-estimate still escalates via the
    per-ray flags (``probe=False`` disables the memo).

    Returns (RenderOutput, per-chunk list of the max K applied to any ray
    of that chunk).
    """
    import numpy as np

    n = rays.shape[0]
    ladder = tuple(int(k) for k in k_ladder)
    top = len(ladder) - 1

    cache_key = (
        id(params), id(alpha_mask["volume"]), n_samples, ladder,
        float(acc_tol), int(app_k), float(eval_z_min),
    )
    base = _ADAPTIVE_PROBE_CACHE.get(cache_key, 0) if probe else 0
    k_base = ladder[base]
    # cap the phase-1 chunk by rung width: wide chunks amortize the
    # dispatch floor at CHEAP rungs, but the compiled program's HBM
    # temps scale with chunk*K (HTTP 500 / 16.2G-HBM OOM observed at
    # 65536 x K=128 with app_k 128).  Default budget 1M selected samples
    # per program, floor 16384 (K=128 @ 16384 is a known-good compile);
    # ``sample_budget`` raises it where measured safe (chunk 131072 at
    # the K=16 base rung compiles and amortizes the dispatch floor
    # further — tools/bench_adaptive_pool_ab.py).
    while chunk > 16384 and chunk * k_base > sample_budget:
        chunk //= 2

    def _widen(out, k_to):
        kw = out.weights.shape[1]
        if kw < k_to:
            zpad = jnp.zeros(
                (out.weights.shape[0], k_to - kw), out.weights.dtype
            )
            out = out._replace(
                z_vals=jnp.concatenate([out.z_vals, zpad], 1),
                weights=jnp.concatenate([out.weights, zpad], 1),
            )
        return out

    # --- phase 1: one base-rung render per chunk, flags ride along ------
    outs, needs, pads = [], [], []
    for s in range(0, n, chunk):
        part = rays[s : s + chunk]
        pad = chunk - part.shape[0]
        if pad:
            # pad by repeating the last ray (not zeros): the duplicate
            # rows render identical values, so their flags/needs are
            # real-ray copies that get trimmed off below
            part = jnp.concatenate(
                [part, jnp.repeat(part[-1:], pad, axis=0)], 0
            )
        if base == top:
            out, need = render_rays_compact(
                cfg, params, aabb, part, alpha_mask, n_samples=n_samples,
                compact_k=k_base, app_k=min(app_k, k_base),
                white_bg=white_bg, eval_z_min=eval_z_min,
                feature_dtype=feature_dtype,
            ), None
        else:
            out, need = render_rays_compact_need(
                cfg, params, aabb, part, alpha_mask, n_samples=n_samples,
                compact_k=k_base, app_k=min(app_k, k_base),
                k_ladder=ladder, white_bg=white_bg, eval_z_min=eval_z_min,
                acc_tol=acc_tol, feature_dtype=feature_dtype,
            )
        outs.append(out)
        needs.append(need)
        pads.append(pad)

    ks = [k_base] * len(outs)
    idx_by_rung: dict = {}
    need_np = None
    if outs and base != top:
        # the view's ONE host sync: 1 byte/ray of escalation targets
        need_mat = np.asarray(jnp.stack(needs))
        need_np = np.concatenate(
            [need_mat[i, : chunk - pads[i]] for i in range(len(needs))]
        )
        esc = np.nonzero(need_np)[0]
        for r in np.unique(need_np[esc]):
            idx_by_rung[int(r)] = esc[need_np[esc] == r]
        for i in range(len(outs)):
            lo, hi = i * chunk, min((i + 1) * chunk, n)
            m = int(need_np[lo:hi].max(initial=0))
            if m:
                ks[i] = ladder[m]

    used_rungs = sorted(idx_by_rung)
    k_max = max([k_base] + [ladder[r] for r in used_rungs])

    trimmed = []
    for out, pad in zip(outs, pads):
        out = _widen(out, k_max)
        if pad:
            out = jax.tree.map(lambda x: x[: chunk - pad], out)
        trimmed.append(out)
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *trimmed)

    # --- phase 2: repack ALL flagged rays into one top-rung pass --------
    if used_rungs:
        # Every flagged ray renders at the MAX needed rung of the view
        # (a superset window is exact: first-K_top live covers any
        # smaller need), in groups padded to one of exactly TWO quanta.
        # Rationale (round-5 A/Bs, reports/adaptive_pool_ab_r5.json +
        # _r5b): per-rung groups with free pow2 quanta produced a fresh
        # jit specialization whenever a view's escalation count crossed
        # a pow2 boundary, and the 15-60 s remote compiles landed inside
        # render loops (21k rays/s on a field whose phase-1 alone runs
        # 330k); even a two-quanta scheme re-compiled mid-loop whenever
        # the warm-up views' counts straddled one quantum and a timed
        # view's the other (76k vs 235k for the SAME config).  ONE fixed
        # group shape per (field config, ladder) is deterministic: the
        # first escalating view compiles it, every later view reuses it;
        # the pad-repeat waste is < one group per view — noise next to
        # one compile.  Groups are capped at 16384 rays: a 65536-ray
        # program at K=128 blows the remote compiler (observed HTTP 500
        # / 16G HBM OOM).
        gchunk = min(chunk, 16384)
        k_r = ladder[max(used_rungs)]
        idx_all = np.sort(np.concatenate([idx_by_rung[r] for r in used_rungs]))
        m = len(idx_all)
        for s0 in range(0, m, gchunk):
            sl = idx_all[s0 : s0 + gchunk]
            rem = len(sl)
            quantum = gchunk
            part_idx = sl
            if quantum - rem:
                part_idx = np.concatenate(
                    [sl, np.repeat(sl[-1:], quantum - rem)]
                )
            # gather ON DEVICE: only the 4B/ray indices cross the host
            # boundary (shipping the rays themselves through the ~30MB/s
            # tunnel cost ~1.1 us/ray — round-5 profile)
            gidx = jnp.asarray(part_idx)
            out_r = _widen(
                render_rays_compact(
                    cfg, params, aabb, jnp.take(rays, gidx, axis=0),
                    alpha_mask, n_samples=n_samples, compact_k=k_r,
                    app_k=min(app_k, k_r), white_bg=white_bg,
                    eval_z_min=eval_z_min, feature_dtype=feature_dtype,
                ),
                k_max,
            )
            merged = RenderOutput(
                rgb=merged.rgb.at[gidx].set(out_r.rgb),
                depth=merged.depth.at[gidx].set(out_r.depth),
                z_vals=merged.z_vals.at[gidx].set(out_r.z_vals),
                weights=merged.weights.at[gidx].set(out_r.weights),
                acc=merged.acc.at[gidx].set(out_r.acc),
            )

    if probe and outs and need_np is not None:
        # memoize the MEDIAN effective rung as the next base: fog fields
        # (everything escalates) start at their true rung next view;
        # trained fields keep the bottom.  Hint-only (see docstring).
        med = int(np.median(np.maximum(need_np, base)))
        if len(_ADAPTIVE_PROBE_CACHE) >= 8:
            _ADAPTIVE_PROBE_CACHE.clear()
        _ADAPTIVE_PROBE_CACHE[cache_key] = med

    return merged, ks


def render_chunked(
    cfg,
    params,
    aabb,
    rays,
    *,
    n_samples: int,
    chunk: int = 16384,
    app_k: int = 64,
    white_bg: bool = True,
    ndc: bool = False,
    alpha_mask=None,
    compact_k: int = 0,
    eval_z_min: float = 2.0,
    feature_dtype: str = "bf16",
):
    """Host-side chunked renderer over an arbitrary ray count.

    Pads the final chunk so only one jit specialization exists per chunk
    size (the reference loops un-jitted chunks, renderer.py:28-42).
    With ``compact_k > 0`` and an alpha mask, uses the compacted
    fast path (render_rays_compact); ``compact_k = -1`` selects the
    acc-gated adaptive-K ladder (render_chunked_adaptive) — never less
    accurate than the top rung, and trained/opaque scenes render mostly
    at the bottom one.

    ``eval_z_min`` is the reference's eval-time world-z floater cull
    (tensorBase.py:458-462, fixed at 2.0 there).  Scene-generation
    trajectories can place SUPERVISED content below world z = 2 (the r4c
    run's view 3 had 24.6% of its GT there and evaluated at 9.1 dB while
    the field held it at 36.8 — reports/diag_zmin_probe_r4c.json); the
    trainer passes the scene-aware floor from
    data.scene_state.supervised_z_floor instead of the constant.
    """
    if compact_k == -1 and alpha_mask is not None and not ndc:
        out, _ = render_chunked_adaptive(
            cfg, params, aabb, rays, alpha_mask, n_samples=n_samples,
            chunk=chunk, app_k=app_k, white_bg=white_bg,
            eval_z_min=eval_z_min, feature_dtype=feature_dtype,
        )
        return out
    n = rays.shape[0]
    outs = []
    for s in range(0, n, chunk):
        part = rays[s : s + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = jnp.concatenate([part, jnp.zeros((pad, 6), part.dtype)], 0)
        if compact_k and alpha_mask is not None and not ndc:
            out = render_rays_compact(
                cfg, params, aabb, part, alpha_mask,
                n_samples=n_samples, compact_k=compact_k,
                app_k=min(app_k, compact_k), white_bg=white_bg,
                eval_z_min=eval_z_min, feature_dtype=feature_dtype,
            )
        else:
            out = render_rays(
                cfg,
                params,
                aabb,
                part,
                n_samples=n_samples,
                app_k=app_k,
                is_train=False,
                white_bg=white_bg,
                ndc=ndc,
                alpha_mask=alpha_mask,
                eval_z_min=eval_z_min,
            )
        if pad:
            out = jax.tree.map(lambda x: x[: chunk - pad], out)
        outs.append(out)
    return jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *outs)


def filter_rays_bbox(aabb, rays):
    """Boolean mask of rays that intersect the AABB — the bbox_only branch
    of filtering_rays (tensorBase.py:372-404).  Host-side helper (mask is
    consumed by the data layer to build ray pools)."""
    from .rays import aabb_slab_interval

    t_min, t_max = aabb_slab_interval(rays[..., :3], rays[..., 3:6], jnp.asarray(aabb))
    return t_max > t_min


@functools.partial(jax.jit, static_argnames=("n_samples",))
def _filter_rays_alpha_chunk(aabb, rays, alpha_mask, *, n_samples):
    aabb = jnp.asarray(aabb)
    rays_o, rays_d = rays[:, :3], rays[:, 3:6]
    t_min, t_max = _slab_interval(rays_o, rays_d, aabb)
    # rays starting inside the box get a negative entry t — only the
    # forward part of the ray matters (reference clamps to near/far,
    # tensorBase.py:381-386)
    t_min = jnp.maximum(t_min, 0.0)
    ts = jnp.linspace(0.0, 1.0, n_samples)[None, :]
    z = t_min[:, None] * (1.0 - ts) + t_max[:, None] * ts
    pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
    inside = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    occ = _nearest_alpha_lookup(alpha_mask, pts.reshape(-1, 3)).reshape(
        rays.shape[0], n_samples
    )
    return jnp.any(inside & (occ > 0) & (t_max[:, None] > t_min[:, None]), axis=-1)


def _slab_interval(rays_o, rays_d, aabb):
    from .rays import aabb_slab_interval

    return aabb_slab_interval(rays_o, rays_d, aabb)


def filter_rays_alpha(aabb, rays, alpha_mask, *, n_samples=128, chunk=262144):
    """Boolean mask of rays that touch occupied space — the alpha-mask
    branch of filtering_rays (tensorBase.py:372-404): sample each ray
    uniformly between its AABB entry/exit and keep it when ANY sample
    lands in an occupied (dilated) mask voxel.  Conservative with the
    3³+-max-pooled masks update_alpha_mask builds.  Host-side pool
    filtering — TensoRF upstream refilters the ray pools at the first two
    update_AlphaMask_list milestones."""
    parts = []
    m = _strip_pool(alpha_mask)
    for s in range(0, rays.shape[0], chunk):
        part = jnp.asarray(rays[s : s + chunk])
        parts.append(
            _filter_rays_alpha_chunk(aabb, part, m, n_samples=n_samples)
        )
    return jnp.concatenate(parts, axis=0)
