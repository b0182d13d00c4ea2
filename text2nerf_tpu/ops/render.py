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
        # rays whose truncated tail could still matter: more live samples
        # than K AND unsaturated transmittance (see
        # render_rays_compact_flagged)
        bad = jnp.sum(
            ((n_live > k) & (acc < 1.0 - overflow_tol)).astype(jnp.int32)
        )
        return out, bad
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
):
    """Chunked eval renderer with per-chunk adaptive compact-K.

    Every chunk renders at the smallest ladder rung; a chunk escalates to
    the next rung only when some ray both OVERFLOWS the rung's K (more
    mask-live samples than K) and has unsaturated transmittance
    (acc < 1 - acc_tol) — i.e. its truncated tail could still contribute
    (render_rays_compact_flagged).  Opaque-surface rays saturate within
    the first rung and background rays never overflow, so trained scenes
    render mostly at the bottom rung (the round-4 profile: fixed K=64 was
    paying for tail samples that contribute nothing).  The flag check
    syncs ONCE per rung over all chunks (not per chunk), so tunnel
    latency is paid ≤ len(k_ladder)-1 times per call.  The top rung runs
    unflagged — its truncation semantics equal render_rays_compact at
    k_ladder[-1] (≥ the fixed-K default, so never less accurate).  With
    ``probe`` (default), one strided-subsample chunk climbs the ladder
    first and all chunks start at the rung it found — a hint only: a
    chunk the subsample under-represents still escalates via its flag.

    Returns (RenderOutput, per-chunk K list).
    """
    n = rays.shape[0]
    parts, ks = [], []
    for s in range(0, n, chunk):
        part = rays[s : s + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = jnp.concatenate([part, jnp.zeros((pad, 6), part.dtype)], 0)
        parts.append((part, pad))

    import numpy as np

    # probe (performance hint only, correctness is the acc-gate's): on a
    # field where most chunks would climb the whole ladder (unsaturating
    # density — the round-4 fog-field A/B paid every rung below the top,
    # 53.8k vs 134.9k rays/s), ONE strided-subsample chunk spanning the
    # view climbs first and every chunk then starts at the rung it found;
    # stragglers the subsample missed still escalate via their flags.
    # The found rung is memoized per (field, mask, ladder) IDENTITY so a
    # multi-view evaluation / video render probes once, not per frame —
    # a different view may see different live-counts, but the cached rung
    # is still only a starting hint (under-starts escalate via flags,
    # over-starts just render wider) so identity reuse is sound.
    start = 0
    cache_key = (
        id(params), id(alpha_mask["volume"]), n_samples, tuple(k_ladder),
        float(acc_tol), int(app_k), float(eval_z_min),
    )
    cached = _ADAPTIVE_PROBE_CACHE.get(cache_key)
    if cached is not None:
        start = cached
    elif probe and len(parts) > 2:
        stride_p = max(1, n // chunk)
        probe_rays = rays[::stride_p][:chunk]
        p_pad = chunk - probe_rays.shape[0]
        if p_pad:
            probe_rays = jnp.concatenate(
                [probe_rays, jnp.zeros((p_pad, 6), probe_rays.dtype)], 0
            )
        for r, k in enumerate(k_ladder[:-1]):
            _, p_bad = render_rays_compact_flagged(
                cfg, params, aabb, probe_rays, alpha_mask,
                n_samples=n_samples, compact_k=k, app_k=min(app_k, k),
                white_bg=white_bg, eval_z_min=eval_z_min, acc_tol=acc_tol,
                feature_dtype=feature_dtype,
            )
            if int(p_bad) == 0:
                start = r
                break
        else:
            start = len(k_ladder) - 1
        if len(_ADAPTIVE_PROBE_CACHE) >= 8:
            _ADAPTIVE_PROBE_CACHE.clear()
        _ADAPTIVE_PROBE_CACHE[cache_key] = start

    k0 = k_ladder[start]
    top0 = start == len(k_ladder) - 1
    outs, flags = [], []
    for part, _ in parts:
        if top0:
            out, bad = render_rays_compact(
                cfg, params, aabb, part, alpha_mask, n_samples=n_samples,
                compact_k=k0, app_k=min(app_k, k0), white_bg=white_bg,
                eval_z_min=eval_z_min, feature_dtype=feature_dtype,
            ), None
        else:
            out, bad = render_rays_compact_flagged(
                cfg, params, aabb, part, alpha_mask, n_samples=n_samples,
                compact_k=k0, app_k=min(app_k, k0), white_bg=white_bg,
                eval_z_min=eval_z_min, acc_tol=acc_tol,
                feature_dtype=feature_dtype,
            )
        outs.append(out)
        flags.append(bad)
    ks = [k0] * len(parts)

    for rung, k in enumerate(k_ladder[start + 1:], start=start + 1):
        pend = [i for i, f in enumerate(flags) if f is not None]
        if not pend:
            break
        # ONE host sync for every still-flagged chunk at this rung
        bad = np.asarray(jnp.stack([flags[i] for i in pend]))
        for j, i in enumerate(pend):
            flags[i] = None
            if bad[j] == 0:
                continue
            ks[i] = k
            last = rung == len(k_ladder) - 1
            if last:
                outs[i] = render_rays_compact(
                    cfg, params, aabb, parts[i][0], alpha_mask,
                    n_samples=n_samples, compact_k=k, app_k=min(app_k, k),
                    white_bg=white_bg, eval_z_min=eval_z_min,
                    feature_dtype=feature_dtype,
                )
            else:
                outs[i], flags[i] = render_rays_compact_flagged(
                    cfg, params, aabb, parts[i][0], alpha_mask,
                    n_samples=n_samples, compact_k=k, app_k=min(app_k, k),
                    white_bg=white_bg, eval_z_min=eval_z_min, acc_tol=acc_tol,
                    feature_dtype=feature_dtype,
                )

    # chunks that escalated carry wider (B, K) z_vals/weights — pad the
    # narrower ones with zero weight (contributes nothing) so the
    # concatenated output has one sample width
    k_max = max(ks)
    trimmed = []
    for out, (_, pad) in zip(outs, parts):
        kw = out.weights.shape[1]
        if kw < k_max:
            zpad = jnp.zeros((out.weights.shape[0], k_max - kw),
                             out.weights.dtype)
            out = out._replace(
                z_vals=jnp.concatenate([out.z_vals, zpad], 1),
                weights=jnp.concatenate([out.weights, zpad], 1),
            )
        if pad:
            out = jax.tree.map(lambda x: x[: chunk - pad], out)
        trimmed.append(out)
    merged = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0), *trimmed)
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
