"""TensoRF factorized radiance fields as functional JAX pytrees.

TPU-native re-design of the reference model layer
(/root/reference/models/tensoRF.py, /root/reference/models/tensorBase.py):

- Parameters are a plain pytree (no Module state); the field is evaluated by
  pure functions that jit/vmap/grad cleanly and shard under pjit.
- Feature planes are stored channels-last ``[H, W, C]`` and lines ``[L, C]``
  so gathers pull contiguous rows (see ops/grid_sample.py).
- The three decompositions are supported:
    * ``vm_split`` — TensorVMSplit (tensoRF.py:139-303), the default
      (configs/text2nerf_scenes.txt:25): separate density/appearance
      plane+line factor lists.
    * ``cp``       — TensorCP (tensoRF.py:306-434): rank-1 line-only factors.
    * ``vm``       — TensorVM (tensoRF.py:4-136): fused plane/line tensors
      holding both density and appearance channels.

Axis conventions mirror the reference: matMode = [[0,1],[0,2],[1,2]] and
vecMode = [2,1,0] (tensorBase.py:190-191), i.e. plane i spans world axes
(matMode[i][0], matMode[i][1]) and line i spans world axis vecMode[i].
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import (
    grid_sample_1d,
    grid_sample_2d,
    grid_sample_3d,
    resize_bilinear_align_corners,
    resize_linear_align_corners,
)
from . import mlp as mlp_mod

MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)


@dataclasses.dataclass(frozen=True)
class TensoRFConfig:
    """Static model hyper-parameters (hashable; safe as a jit static arg).

    Defaults follow configs/text2nerf_scenes.txt and the overrides in
    text2nerf_main.py:657-665 / e_opt.py.
    """

    model_name: str = "vm_split"  # vm_split | cp | vm
    density_n_comp: Tuple[int, ...] = (16, 16, 16)
    app_n_comp: Tuple[int, ...] = (48, 48, 48)
    app_dim: int = 27
    shading_mode: str = "MLP_Fea_noview"
    pos_pe: int = 6
    view_pe: int = 2
    fea_pe: int = 6
    feature_c: int = 128
    density_shift: float = -10.0
    distance_scale: float = 25.0
    raymarch_weight_thres: float = 1e-4
    alpha_mask_thres: float = 1e-4
    fea2dense: str = "softplus"  # softplus | relu
    step_ratio: float = 1.0
    near: float = 0.5
    far: float = 8.0

    def to_dict(self):
        return dataclasses.asdict(self)

    @staticmethod
    def from_dict(d):
        d = dict(d)
        for k in ("density_n_comp", "app_n_comp"):
            if k in d:
                d[k] = tuple(d[k])
        return TensoRFConfig(**d)


# ---------------------------------------------------------------------------
# Grid bookkeeping
# ---------------------------------------------------------------------------


def n_to_reso(n_voxels: int, aabb) -> Tuple[int, int, int]:
    """Voxel-count → per-axis resolution (utils.py:292-296)."""
    aabb = jnp.asarray(aabb)
    xyz_min, xyz_max = aabb[0], aabb[1]
    voxel_size = (jnp.prod(xyz_max - xyz_min) / n_voxels) ** (1.0 / 3.0)
    return tuple(int(v) for v in ((xyz_max - xyz_min) / voxel_size))


def cal_n_samples(reso, step_ratio: float = 0.5) -> int:
    """Sample count along the grid diagonal (utils.py:298-299)."""
    return int(math.sqrt(sum(float(r) ** 2 for r in reso)) / step_ratio)


def default_n_samples(reso, step_ratio: float, n_samples_cap: int = 10 ** 6) -> int:
    """The training-time rule: min(cap, cal_n_samples/2)
    (text2nerf_main.py:439)."""
    return min(n_samples_cap, int(cal_n_samples(reso, step_ratio) / 2))


def step_size(aabb, grid_size, step_ratio: float):
    """Mean voxel edge × step_ratio (tensorBase.py:220-231)."""
    aabb = jnp.asarray(aabb)
    units = (aabb[1] - aabb[0]) / (jnp.asarray(grid_size, jnp.float32) - 1)
    return jnp.mean(units) * step_ratio


def normalize_coord(aabb, xyz):
    """World → [-1, 1] grid coords (tensorBase.py:245-246)."""
    inv = 2.0 / (aabb[1] - aabb[0])
    return (xyz - aabb[0]) * inv - 1.0


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------


def _init_linear_no_bias(rng, fan_in, fan_out, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(rng, (fan_in, fan_out), dtype, -bound, bound)


def init_params(rng, cfg: TensoRFConfig, grid_size, dtype=jnp.float32):
    """Initialize the parameter pytree for a given grid resolution.

    Matches init_svd_volume: 0.1 * randn for VM planes/lines
    (tensoRF.py:144-160), 0.2 for CP lines (tensoRF.py:311-323), and a
    bias-free basis linear (tensoRF.py:147).
    """
    keys = jax.random.split(rng, 16)
    gs = tuple(int(g) for g in grid_size)
    params = {}

    if cfg.model_name == "vm_split":
        def one_svd(kbase, n_comp, scale):
            planes, lines = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                planes.append(
                    scale
                    * jax.random.normal(
                        keys[kbase + 2 * i], (gs[m1], gs[m0], n_comp[i]), dtype
                    )
                )
                lines.append(
                    scale
                    * jax.random.normal(
                        keys[kbase + 2 * i + 1], (gs[VEC_MODE[i]], n_comp[i]), dtype
                    )
                )
            return tuple(planes), tuple(lines)

        params["density_planes"], params["density_lines"] = one_svd(
            0, cfg.density_n_comp, 0.1
        )
        params["app_planes"], params["app_lines"] = one_svd(6, cfg.app_n_comp, 0.1)
        params["basis"] = _init_linear_no_bias(
            keys[12], sum(cfg.app_n_comp), cfg.app_dim, dtype
        )
    elif cfg.model_name == "cp":
        nd, na = cfg.density_n_comp[0], cfg.app_n_comp[0]
        params["density_lines"] = tuple(
            0.2 * jax.random.normal(keys[i], (gs[VEC_MODE[i]], nd), dtype)
            for i in range(3)
        )
        params["app_lines"] = tuple(
            0.2 * jax.random.normal(keys[3 + i], (gs[VEC_MODE[i]], na), dtype)
            for i in range(3)
        )
        params["basis"] = _init_linear_no_bias(keys[12], na, cfg.app_dim, dtype)
    elif cfg.model_name == "vm":
        # Fused: single plane/line stack holding app+density channels
        # (tensoRF.py:9-14); requires a cubic grid.
        n_total = cfg.app_n_comp[0] + cfg.density_n_comp[0]
        res = gs[0]
        params["planes"] = 0.1 * jax.random.normal(
            keys[0], (3, res, res, n_total), dtype
        )
        params["lines"] = 0.1 * jax.random.normal(keys[1], (3, res, n_total), dtype)
        params["basis"] = _init_linear_no_bias(
            keys[12], cfg.app_n_comp[0] * 3, cfg.app_dim, dtype
        )
    else:
        raise ValueError(f"unknown model_name: {cfg.model_name}")

    if cfg.shading_mode.startswith("MLP"):
        in_dim = mlp_mod.mlp_input_dim(
            cfg.shading_mode, cfg.app_dim, cfg.view_pe, cfg.fea_pe, cfg.pos_pe
        )
        params["mlp"] = mlp_mod.init_mlp(keys[13], in_dim, cfg.feature_c, dtype)
    return params


def param_group_labels(params):
    """Optimizer group labels: 'spatial' for grids (lr 0.02), 'network' for
    basis + MLP (lr 1e-3) — mirrors get_optparam_groups (tensoRF.py:164-170).
    """
    return {
        k: jax.tree.map(lambda _: "network" if k in ("basis", "mlp") else "spatial", v)
        for k, v in params.items()
    }


def grid_resolution(cfg: TensoRFConfig, params) -> Tuple[int, int, int]:
    """Recover the current grid resolution from parameter shapes."""
    if cfg.model_name == "vm_split":
        # line i spans axis VEC_MODE[i]; VEC_MODE = (2,1,0)
        ls = [params["density_lines"][i].shape[0] for i in range(3)]
        return (ls[2], ls[1], ls[0])
    if cfg.model_name == "cp":
        ls = [params["density_lines"][i].shape[0] for i in range(3)]
        return (ls[2], ls[1], ls[0])
    res = params["lines"].shape[1]
    return (res, res, res)


# ---------------------------------------------------------------------------
# Feature evaluation
# ---------------------------------------------------------------------------


def compute_density_feature(cfg: TensoRFConfig, params, xn):
    """Raw density features at normalized coords ``xn`` (N, 3).

    vm_split: Σ_i Σ_c plane_i[c] * line_i[c]  (tensoRF.py:205-220)
    cp:       Σ_c Π_i line_i[c]               (tensoRF.py:334-349)
    vm:       same as vm_split on the last density_n_comp channels of the
              fused tensors (tensoRF.py:46-59).
    """
    if cfg.model_name == "cp":
        prod = None
        for i in range(3):
            lf = grid_sample_1d(params["density_lines"][i], xn[:, VEC_MODE[i]])
            prod = lf if prod is None else prod * lf
        return jnp.sum(prod, axis=-1)

    sigma = jnp.zeros(xn.shape[0], xn.dtype)
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        if cfg.model_name == "vm_split":
            plane, line = params["density_planes"][i], params["density_lines"][i]
        else:  # fused vm: density channels are the trailing ones
            nd = cfg.density_n_comp[0]
            plane = params["planes"][i][..., -nd:]
            line = params["lines"][i][..., -nd:]
        pf = grid_sample_2d(plane, xn[:, m0], xn[:, m1])
        lf = grid_sample_1d(line, xn[:, VEC_MODE[i]])
        sigma = sigma + jnp.sum(pf * lf, axis=-1)
    return sigma


def compute_app_feature(cfg: TensoRFConfig, params, xn):
    """Appearance features at normalized coords: factor gathers → basis
    matmul (tensoRF.py:223-239)."""
    if cfg.model_name == "cp":
        prod = None
        for i in range(3):
            lf = grid_sample_1d(params["app_lines"][i], xn[:, VEC_MODE[i]])
            prod = lf if prod is None else prod * lf
        return prod @ params["basis"]

    feats = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        if cfg.model_name == "vm_split":
            plane, line = params["app_planes"][i], params["app_lines"][i]
        else:
            na = cfg.app_n_comp[0]
            plane = params["planes"][i][..., :na]
            line = params["lines"][i][..., :na]
        pf = grid_sample_2d(plane, xn[:, m0], xn[:, m1])
        lf = grid_sample_1d(line, xn[:, VEC_MODE[i]])
        feats.append(pf * lf)
    return jnp.concatenate(feats, axis=-1) @ params["basis"]


def pack_params(cfg: TensoRFConfig, params):
    """Build corner-packed gather tables (see ops/fused_gather.py).

    Done inside the jit region each call: a cheap shifted-concat that XLA
    fuses, keeping gradients attached to the canonical parameters.
    Returns a dict with packed tables and the (h, w, l, c) shapes needed
    at sample time.
    """
    from ..ops import fused_gather as fg

    packed = {}
    if cfg.model_name == "vm_split":
        packed["density"] = []
        packed["app"] = []
        for i in range(3):
            dp, dl = params["density_planes"][i], params["density_lines"][i]
            ap, al = params["app_planes"][i], params["app_lines"][i]
            packed["density"].append(
                (fg.pack_plane(dp), dp.shape, fg.pack_line(dl), dl.shape)
            )
            packed["app"].append(
                (fg.pack_plane(ap), ap.shape, fg.pack_line(al), al.shape)
            )
    elif cfg.model_name == "cp":
        packed["density"] = [
            (fg.pack_line(l), l.shape) for l in params["density_lines"]
        ]
        packed["app"] = [(fg.pack_line(l), l.shape) for l in params["app_lines"]]
    else:  # fused vm
        nd, na = cfg.density_n_comp[0], cfg.app_n_comp[0]
        packed["density"] = []
        packed["app"] = []
        for i in range(3):
            dp = params["planes"][i][..., -nd:]
            dl = params["lines"][i][..., -nd:]
            ap = params["planes"][i][..., :na]
            al = params["lines"][i][..., :na]
            packed["density"].append(
                (fg.pack_plane(dp), dp.shape, fg.pack_line(dl), dl.shape)
            )
            packed["app"].append(
                (fg.pack_plane(ap), ap.shape, fg.pack_line(al), al.shape)
            )
    packed["basis"] = params["basis"]
    if "mlp" in params:
        packed["mlp"] = params["mlp"]
    return packed


def compute_density_feature_packed(cfg: TensoRFConfig, packed, xn, dtype=None):
    """Fast-path density features via corner-packed gathers (6 rows/sample
    instead of 18); numerically identical to compute_density_feature.

    ``dtype`` (bf16 on the eval fast path) selects the value/lerp compute
    precision — indices stay fp32 (fused_gather) and the output is cast
    back to fp32."""
    from ..ops import fused_gather as fg

    if cfg.model_name == "cp":
        prod = None
        for i in range(3):
            tbl, (l, c) = packed["density"][i]
            lf = fg.sample_packed_line(tbl, l, c, xn[:, VEC_MODE[i]], dtype)
            prod = lf if prod is None else prod * lf
        return jnp.sum(prod, axis=-1).astype(jnp.float32)

    sigma = None
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        ptbl, (h, w, c), ltbl, (l, _) = packed["density"][i]
        pf = fg.sample_packed_plane(ptbl, h, w, c, xn[:, m0], xn[:, m1], dtype)
        lf = fg.sample_packed_line(ltbl, l, c, xn[:, VEC_MODE[i]], dtype)
        part = jnp.sum(pf * lf, axis=-1)
        sigma = part if sigma is None else sigma + part
    return sigma.astype(jnp.float32)


def grouping_safe(
    aabb, grid_size, step_ratio: float, group: int = 2, block: int = 4,
    dir_bound: float = 1.0,
) -> bool:
    """Host-side guard for the group-packed density gathers: True when
    ``group`` ray-consecutive samples are guaranteed to span at most
    ``block - 2`` grid cells per axis (ops/fused_gather.py group packing).

    The worst-case real-valued cell drift across the group along axis a is
    (group-1) · step · dir_bound / units[a]; the span of the floors is at
    most ⌈drift⌉ ≤ block-2 when drift ≤ block-2.

    ``dir_bound`` is the maximum |direction component| of the marched
    rays: 1.0 for the normalized directions the data layer emits
    (scene_gen.py:45 semantics).  Camera-grid directions are NOT
    normalized in some conventions and exceed 1 for FOV > 90° — callers
    marching unnormalized rays must pass their actual bound or the drift
    is under-estimated and out-of-block spans silently read 0 (ADVICE
    r2)."""
    aabb = jnp.asarray(aabb)
    units = (aabb[1] - aabb[0]) / (jnp.asarray(grid_size, jnp.float32) - 1)
    step = float(jnp.mean(units)) * step_ratio
    drift = (group - 1) * step * dir_bound / float(jnp.min(units))
    return drift <= block - 2 + 1e-6


def grouping_block(
    aabb, grid_size, step_ratio: float, group: int = 2, max_block: int = 4,
    dir_bound: float = 1.0,
) -> int:
    """Smallest safe packing block for grouped density gathers, or 0 when
    none ≤ max_block is safe (→ callers fall back to per-sample gathers).
    Smaller blocks cost proportionally less HBM per gathered row, so pick
    the tightest one the drift bound allows (block 3 at the standard
    equal-units / step_ratio ≤ 1 config).  ``dir_bound``: see
    grouping_safe."""
    for block in range(3, max_block + 1):
        if grouping_safe(aabb, grid_size, step_ratio, group, block, dir_bound):
            return block
    return 0


def pack_params_grouped(cfg: TensoRFConfig, params, block: int = 4):
    """Block-packed density tables for the grouped train-path gathers
    (ops/fused_gather.pack_plane_block / pack_line_block).  Appearance
    stays per-sample (its top-K indices are not ray-consecutive)."""
    from ..ops import fused_gather as fg

    grouped = {}
    if cfg.model_name == "cp":
        grouped["density"] = [
            (fg.pack_line_block(l, block), l.shape)
            for l in params["density_lines"]
        ]
        return grouped
    grouped["density"] = []
    for i in range(3):
        if cfg.model_name == "vm_split":
            dp, dl = params["density_planes"][i], params["density_lines"][i]
        else:  # fused vm
            nd = cfg.density_n_comp[0]
            dp = params["planes"][i][..., -nd:]
            dl = params["lines"][i][..., -nd:]
        grouped["density"].append(
            (
                fg.pack_plane_block(dp, block),
                dp.shape,
                fg.pack_line_block(dl, block),
                dl.shape,
            )
        )
    return grouped


def compute_density_feature_grouped(
    cfg: TensoRFConfig, grouped, xn, *, block: int = 4, dtype=None
):
    """Density features for ray-consecutive sample groups.

    xn: (N, G, 3) normalized coords — G consecutive samples of one ray per
    row.  One gathered block row per group serves all G samples (and one
    scatter row per group in the backward — the training step's dominant
    cost).  Equal to compute_density_feature_packed up to fp reassociation
    when the group span fits the block (``grouping_safe``).  Returns
    (N, G) — every big intermediate stays channel-major 2D (TPU tile
    padding; see ops/fused_gather.sample_packed_plane_groups)."""
    from ..ops import fused_gather as fg

    n, g = xn.shape[0], xn.shape[1]
    sigma_g = [None] * g

    if cfg.model_name == "cp":
        prods = [None] * g
        for i in range(3):
            tbl, (l, c) = grouped["density"][i]
            lfs = fg.sample_packed_line_groups(
                tbl, l, c, xn[..., VEC_MODE[i]], block=block, dtype=dtype
            )
            for gi in range(g):
                prods[gi] = lfs[gi] if prods[gi] is None else prods[gi] * lfs[gi]
        sigma_g = [jnp.sum(p, axis=0) for p in prods]
    else:
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            ptbl, (h, w, c), ltbl, (l, _) = grouped["density"][i]
            pfs = fg.sample_packed_plane_groups(
                ptbl, h, w, c, xn[..., m0], xn[..., m1], block=block,
                dtype=dtype,
            )
            lfs = fg.sample_packed_line_groups(
                ltbl, l, c, xn[..., VEC_MODE[i]], block=block, dtype=dtype
            )
            for gi in range(g):
                part = jnp.sum(pfs[gi] * lfs[gi], axis=0)
                sigma_g[gi] = part if sigma_g[gi] is None else sigma_g[gi] + part
    return jnp.stack(sigma_g, axis=-1).astype(jnp.float32)


def pack_params_fused(cfg: TensoRFConfig, params):
    """Channel-fused density+appearance gather tables.

    TPU rationale (PERF.md "The gather wall"): row-gather and scatter-add
    costs are per-ROW and invariant to row width.  On paths where
    appearance is evaluated at the SAME sample positions as density (the
    compacted train/eval renderers when every compacted sample is shaded,
    i.e. ``app_k >= compact_k``), gathering a (density ‖ app)
    channel-concatenated row serves both heads from ONE row per factor —
    halving the forward gather rows AND the backward scatter rows (the
    step's dominant cost) vs separate density/app tables.  Numerically
    identical to the split tables: bilinear interpolation is per-channel.

    The fused ``vm`` decomposition (tensoRF.py:9-14) already stores both
    heads in one tensor — its pack IS this layout; vm_split/cp concat
    their factor pairs (density channels first).
    """
    from ..ops import fused_gather as fg

    packed = {"fused": [], "nd": tuple(cfg.density_n_comp)}
    if cfg.model_name == "cp":
        for i in range(3):
            fl = jnp.concatenate(
                [params["density_lines"][i], params["app_lines"][i]], axis=-1
            )
            packed["fused"].append((fg.pack_line(fl), fl.shape))
    elif cfg.model_name == "vm_split":
        for i in range(3):
            fp = jnp.concatenate(
                [params["density_planes"][i], params["app_planes"][i]], axis=-1
            )
            fl = jnp.concatenate(
                [params["density_lines"][i], params["app_lines"][i]], axis=-1
            )
            packed["fused"].append(
                (fg.pack_plane(fp), fp.shape, fg.pack_line(fl), fl.shape)
            )
    else:  # vm: natively fused, but app channels lead (tensoRF.py:46-59)
        nd, na = cfg.density_n_comp[0], cfg.app_n_comp[0]
        for i in range(3):
            fp = jnp.concatenate(
                [params["planes"][i][..., -nd:], params["planes"][i][..., :na]],
                axis=-1,
            )
            fl = jnp.concatenate(
                [params["lines"][i][..., -nd:], params["lines"][i][..., :na]],
                axis=-1,
            )
            packed["fused"].append(
                (fg.pack_plane(fp), fp.shape, fg.pack_line(fl), fl.shape)
            )
    packed["basis"] = params["basis"]
    if "mlp" in params:
        packed["mlp"] = params["mlp"]
    return packed


def compute_fused_features_packed(cfg: TensoRFConfig, packed, xn, dtype=None):
    """Density feature AND appearance features at ``xn`` from the fused
    tables (one gathered row per sample per factor — see
    :func:`pack_params_fused`).  Returns ``(density_feat (N,), app (N,
    app_dim))`` — each equal to its split-table counterpart
    (compute_density_feature_packed / compute_app_feature_packed) up to fp
    reassociation order."""
    from ..ops import fused_gather as fg

    basis = packed["basis"] if dtype is None else packed["basis"].astype(dtype)
    if cfg.model_name == "cp":
        nd = packed["nd"][0]
        prod = None
        for i in range(3):
            tbl, (l, c) = packed["fused"][i]
            lf = fg.sample_packed_line(tbl, l, c, xn[:, VEC_MODE[i]], dtype)
            prod = lf if prod is None else prod * lf
        sigma = jnp.sum(prod[:, :nd], axis=-1)
        app = prod[:, nd:] @ basis
        return sigma.astype(jnp.float32), app.astype(jnp.float32)

    sigma = None
    feats = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        nd = packed["nd"][i] if cfg.model_name == "vm_split" else packed["nd"][0]
        ptbl, (h, w, c), ltbl, (l, _) = packed["fused"][i]
        pf = fg.sample_packed_plane(ptbl, h, w, c, xn[:, m0], xn[:, m1], dtype)
        lf = fg.sample_packed_line(ltbl, l, c, xn[:, VEC_MODE[i]], dtype)
        prod = pf * lf
        part = jnp.sum(prod[:, :nd], axis=-1)
        sigma = part if sigma is None else sigma + part
        feats.append(prod[:, nd:])
    app = jnp.concatenate(feats, axis=-1) @ basis
    return sigma.astype(jnp.float32), app.astype(jnp.float32)


def compute_app_feature_packed(cfg: TensoRFConfig, packed, xn, dtype=None):
    """Fast-path appearance features via corner-packed gathers."""
    from ..ops import fused_gather as fg

    basis = packed["basis"] if dtype is None else packed["basis"].astype(dtype)
    if cfg.model_name == "cp":
        prod = None
        for i in range(3):
            tbl, (l, c) = packed["app"][i]
            lf = fg.sample_packed_line(tbl, l, c, xn[:, VEC_MODE[i]], dtype)
            prod = lf if prod is None else prod * lf
        return (prod @ basis).astype(jnp.float32)

    feats = []
    for i in range(3):
        m0, m1 = MAT_MODE[i]
        ptbl, (h, w, c), ltbl, (l, _) = packed["app"][i]
        pf = fg.sample_packed_plane(ptbl, h, w, c, xn[:, m0], xn[:, m1], dtype)
        lf = fg.sample_packed_line(ltbl, l, c, xn[:, VEC_MODE[i]], dtype)
        feats.append(pf * lf)
    return (jnp.concatenate(feats, axis=-1) @ basis).astype(jnp.float32)


def feature2density(cfg: TensoRFConfig, feat):
    """softplus(feat + density_shift) or relu (tensorBase.py:406-410)."""
    if cfg.fea2dense == "softplus":
        return jax.nn.softplus(feat + cfg.density_shift)
    return jax.nn.relu(feat)


# ---------------------------------------------------------------------------
# Regularizers
# ---------------------------------------------------------------------------


def _tv_plane(plane):
    """TV of one (H, W, C) plane, matching TVLoss (utils.py:488-504) with
    batch_size 1: 2 * (h_tv / count_h + w_tv / count_w)."""
    h, w, c = plane.shape
    h_tv = jnp.sum((plane[1:] - plane[:-1]) ** 2)
    w_tv = jnp.sum((plane[:, 1:] - plane[:, :-1]) ** 2)
    return 2.0 * (h_tv / ((h - 1) * w * c) + w_tv / (h * (w - 1) * c))


def _tv_line(line):
    l, c = line.shape
    return 2.0 * jnp.sum((line[1:] - line[:-1]) ** 2) / ((l - 1) * c)


def tv_loss_density(cfg: TensoRFConfig, params):
    """Σ_i TV(density_plane_i) * 1e-2 (tensoRF.py:193-197); CP uses lines ×
    1e-3 (tensoRF.py:424-428)."""
    if cfg.model_name == "cp":
        return sum(_tv_line(l) for l in params["density_lines"]) * 1e-3
    if cfg.model_name == "vm":
        nd = cfg.density_n_comp[0]
        return sum(_tv_plane(params["planes"][i][..., -nd:]) for i in range(3)) * 1e-2
    return sum(_tv_plane(p) for p in params["density_planes"]) * 1e-2


def tv_loss_app(cfg: TensoRFConfig, params):
    if cfg.model_name == "cp":
        return sum(_tv_line(l) for l in params["app_lines"]) * 1e-3
    if cfg.model_name == "vm":
        na = cfg.app_n_comp[0]
        return sum(_tv_plane(params["planes"][i][..., :na]) for i in range(3)) * 1e-2
    return sum(_tv_plane(p) for p in params["app_planes"]) * 1e-2


def density_l1(cfg: TensoRFConfig, params):
    """Mean-abs of density factors (tensoRF.py:187-191, :418-422)."""
    if cfg.model_name == "cp":
        return sum(jnp.mean(jnp.abs(l)) for l in params["density_lines"])
    if cfg.model_name == "vm":
        nd = cfg.density_n_comp[0]
        return sum(
            jnp.mean(jnp.abs(params["planes"][i][..., -nd:]))
            + jnp.mean(jnp.abs(params["lines"][i][..., -nd:]))
            for i in range(3)
        )
    return sum(
        jnp.mean(jnp.abs(p)) + jnp.mean(jnp.abs(l))
        for p, l in zip(params["density_planes"], params["density_lines"])
    )


def vector_comp_diffs(cfg: TensoRFConfig, params):
    """Orthogonality regularizer over line factors (tensoRF.py:173-185)."""

    def one(lines):
        total = 0.0
        for line in lines:  # (L, C) -> components are columns
            v = line.T  # (C, L)
            dotp = v @ v.T
            n_comp = v.shape[0]
            off = dotp.reshape(-1)[1:].reshape(n_comp - 1, n_comp + 1)[..., :-1]
            total = total + jnp.mean(jnp.abs(off))
        return total

    return one(params["density_lines"]) + one(params["app_lines"])


# ---------------------------------------------------------------------------
# Alpha queries / alpha-grid mask
# ---------------------------------------------------------------------------


def compute_alpha(cfg: TensoRFConfig, params, aabb, xyz, length, alpha=None):
    """Opacity 1 - exp(-sigma * length) at world points (tensorBase.py:413-433).

    ``alpha`` is an optional (alpha_volume, alpha_aabb) mask tuple; points
    with zero mask get sigma = 0.  Uses the corner-packed gather fast path
    (packing fuses into the same jit region).
    """
    xn = jnp.clip(normalize_coord(aabb, xyz), -1.0, 1.0)
    packed = pack_params(cfg, params)
    sigma = feature2density(cfg, compute_density_feature_packed(cfg, packed, xn))
    if alpha is not None:
        sigma = sigma * (sample_alpha_mask(alpha, xyz) > 0)
    return 1.0 - jnp.exp(-sigma * length)


def sample_alpha_mask(alpha, xyz):
    """Trilinear sample of the binary alpha volume (tensorBase.py:52-56).

    ``alpha`` is a dict {'volume': (D, H, W), 'aabb': (2, 3)} where the
    volume is laid out like the reference's transposed grid: volume[z, y, x].
    """
    volume, aabb = alpha["volume"], alpha["aabb"]
    xn = jnp.clip(normalize_coord(aabb, xyz), -1.0, 1.0)
    return grid_sample_3d(volume, xn[:, 0], xn[:, 1], xn[:, 2])


def dense_alpha(cfg: TensoRFConfig, params, aabb, grid_size, step, chunk=64 ** 3):
    """Alpha over a dense lattice (getDenseAlpha, tensorBase.py:328-344).

    Returns (alpha[gx, gy, gz], dense_xyz[gx, gy, gz, 3]).
    """
    gx, gy, gz = (int(g) for g in grid_size)
    u = [jnp.linspace(0.0, 1.0, g) for g in (gx, gy, gz)]
    grid = jnp.stack(jnp.meshgrid(*u, indexing="ij"), -1)
    aabb = jnp.asarray(aabb)
    dense_xyz = aabb[0] * (1 - grid) + aabb[1] * grid
    flat = dense_xyz.reshape(-1, 3)

    @jax.jit
    def alpha_chunk(p, pts, a, st):
        return compute_alpha(cfg, p, a, pts, st)

    outs = []
    n = flat.shape[0]
    for s in range(0, n, chunk):
        part = flat[s : s + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = jnp.concatenate([part, jnp.zeros((pad, 3), part.dtype)], 0)
        out = alpha_chunk(params, part, aabb, step)
        outs.append(out[: chunk - pad] if pad else out)
    return jnp.concatenate(outs).reshape(gx, gy, gz), dense_xyz


def update_alpha_mask(cfg: TensoRFConfig, params, aabb, grid_size, pool: int = 3):
    """Build the binary alpha volume + tight AABB (updateAlphaMask,
    tensorBase.py:346-370): ``pool``^3 max-pool then threshold.

    pool=3 reproduces the reference exactly; pool=2k+1 dilates by k voxels,
    licensing the compacted renderer to test occupancy only every k-th
    sample (the dict carries ``pool`` so render_rays_compact picks the
    stride automatically).
    """
    step = step_size(aabb, grid_resolution(cfg, params), cfg.step_ratio)
    alpha, dense_xyz = dense_alpha(cfg, params, aabb, grid_size, step)
    # reference transposes to volume[z, y, x]
    vol = jnp.clip(alpha, 0, 1).transpose(2, 1, 0)
    vol = jax.lax.reduce_window(
        vol, -jnp.inf, jax.lax.max, (pool, pool, pool), (1, 1, 1), "SAME"
    )
    vol = (vol >= cfg.alpha_mask_thres).astype(jnp.float32)

    occupied = vol.transpose(2, 1, 0) > 0.5
    xs = jnp.where(occupied.any(axis=(1, 2)), dense_xyz[:, 0, 0, 0], jnp.nan)
    ys = jnp.where(occupied.any(axis=(0, 2)), dense_xyz[0, :, 0, 1], jnp.nan)
    zs = jnp.where(occupied.any(axis=(0, 1)), dense_xyz[0, 0, :, 2], jnp.nan)
    new_aabb = jnp.stack(
        [
            jnp.stack([jnp.nanmin(xs), jnp.nanmin(ys), jnp.nanmin(zs)]),
            jnp.stack([jnp.nanmax(xs), jnp.nanmax(ys), jnp.nanmax(zs)]),
        ]
    )
    # an entirely-empty mask (early training) falls back to the full AABB
    new_aabb = jnp.where(jnp.isnan(new_aabb), jnp.asarray(aabb), new_aabb)
    return {"volume": vol, "aabb": jnp.asarray(aabb), "pool": int(pool)}, new_aabb


@functools.partial(
    jax.jit, static_argnames=("band_voxels", "z_samples", "pool")
)
def _stamp_volume(volume, aabb, rays, depth, band_voxels, z_samples, pool):
    o, d = rays[:, :3], rays[:, 3:6]
    dz, hz, wz = volume.shape  # [z, y, x]
    aabb = jnp.asarray(aabb)
    # band half-width in world units: band_voxels of the COARSEST mask axis
    # (conservative for anisotropic grids)
    vox = jnp.max((aabb[1] - aabb[0]) / jnp.asarray([wz, hz, dz], volume.dtype))
    offs = jnp.linspace(-band_voxels * vox, band_voxels * vox, z_samples)
    pts = o[:, None] + d[:, None] * (depth[:, None] + offs[None, :])[..., None]
    pts = pts.reshape(-1, 3)
    xn = jnp.clip(normalize_coord(aabb, pts), -1.0, 1.0)
    ix = jnp.round((xn[..., 0] + 1) * 0.5 * (wz - 1)).astype(jnp.int32)
    iy = jnp.round((xn[..., 1] + 1) * 0.5 * (hz - 1)).astype(jnp.int32)
    iz = jnp.round((xn[..., 2] + 1) * 0.5 * (dz - 1)).astype(jnp.int32)
    flat_idx = (iz * hz + iy) * wz + ix
    stamped = (
        jnp.zeros(dz * hz * wz, volume.dtype)
        .at[flat_idx]
        .max(1.0)
        .reshape(dz, hz, wz)
    )
    # dilate: ±band_voxels covers depth-alignment error perpendicular to
    # the rays; the extra pool radius keeps the ±r invariant that licenses
    # strided occupancy tests (render_rays_compact)
    k = 2 * (band_voxels + (pool - 1) // 2) + 1
    stamped = jax.lax.reduce_window(
        stamped, -jnp.inf, jax.lax.max, (k, k, k), (1, 1, 1), "SAME"
    )
    return jnp.maximum(volume, stamped)


def stamp_alpha_mask(
    mask, rays, depth, band_voxels: int = 2, z_samples: int = 5,
    max_rays: int = 1 << 20,
):
    """Mark a depth band around supervised rays live in the alpha mask.

    TRAIN-compaction soundness (PERF.md round 3): compacting the train
    step to mask-live samples freezes the density field's SUPPORT — a
    mask built before a new view is fit is dead exactly where that view's
    content must grow, and the view can never be learned (measured:
    per-view PSNR collapse).  The reference never masks its training loop
    for this reason (SURVEY §3.1 "alphaMask never set here").  The fix:
    the incoming view's supervised depth tells us where content will
    grow — stamp a ±``band_voxels`` band around each training ray's depth
    point (dilated by the mask's pool radius so the pooled volume keeps
    the dilation invariant that licenses strided occupancy testing).

    ``rays``/``depth``: the view's training pool ((N, 6), (N,)); ray
    direction parameterization matches the depth values (ray_utils
    convention).  The selection size is rounded UP to a power of two
    (capped at ``max_rays``) so a handful of jit specializations serve
    every view — pool sizes vary per view, and an exact ``min(n,
    max_rays)`` shape would recompile ``_stamp_volume`` each time
    (repeated rays are harmless: stamping is a max-reduction).
    """
    rays = np.asarray(rays)
    depth = np.asarray(depth)
    n = rays.shape[0]
    if n == 0:
        return mask
    k = min(1 << max(n - 1, 1).bit_length(), max_rays)
    sel = np.linspace(0, n - 1, k).astype(np.int64)
    vol = _stamp_volume(
        jnp.asarray(mask["volume"]), jnp.asarray(mask["aabb"]),
        jnp.asarray(rays[sel]), jnp.asarray(depth[sel]),
        band_voxels=int(band_voxels), z_samples=int(z_samples),
        pool=int(mask.get("pool", 3)),
    )
    out = dict(mask)
    out["volume"] = vol
    return out


# ---------------------------------------------------------------------------
# Grid resizing (coarse-to-fine) and AABB shrink
# ---------------------------------------------------------------------------


def upsample_volume_grid(cfg: TensoRFConfig, params, res_target):
    """Bilinear align-corners upsample of all factors
    (up_sampling_VM/upsample_volume_grid, tensoRF.py:243-264)."""
    res_target = tuple(int(r) for r in res_target)
    new = dict(params)
    if cfg.model_name == "vm_split":
        for key_p, key_l in (
            ("density_planes", "density_lines"),
            ("app_planes", "app_lines"),
        ):
            planes, lines = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                planes.append(
                    resize_bilinear_align_corners(
                        params[key_p][i], res_target[m1], res_target[m0]
                    )
                )
                lines.append(
                    resize_linear_align_corners(
                        params[key_l][i], res_target[VEC_MODE[i]]
                    )
                )
            new[key_p], new[key_l] = tuple(planes), tuple(lines)
    elif cfg.model_name == "cp":
        for key_l in ("density_lines", "app_lines"):
            new[key_l] = tuple(
                resize_linear_align_corners(params[key_l][i], res_target[VEC_MODE[i]])
                for i in range(3)
            )
    else:
        res = res_target[0]
        new["planes"] = jnp.stack(
            [
                resize_bilinear_align_corners(params["planes"][i], res, res)
                for i in range(3)
            ]
        )
        new["lines"] = jnp.stack(
            [resize_linear_align_corners(params["lines"][i], res) for i in range(3)]
        )
    return new


def shrink(cfg: TensoRFConfig, params, aabb, new_aabb):
    """Crop factor grids to a tighter AABB.

    vm_split crops planes + lines (TensorVMSplit.shrink, tensoRF.py:
    266-303); cp crops its line factors only (TensorCP.shrink,
    tensoRF.py:388-416) — both share the same voxel-snapped t_l/b_r and
    AABB-correction math.  The fused ``vm`` variant has no shrink in the
    reference either (it requires a cubic grid, which a per-axis crop
    would break).

    Returns (params, corrected_aabb, new_grid_size).
    """
    assert cfg.model_name in ("vm_split", "cp"), (
        f"shrink implemented for vm_split/cp (reference parity); "
        f"got {cfg.model_name}"
    )
    import numpy as np

    aabb = np.asarray(aabb)
    new_aabb = np.asarray(new_aabb)
    gs = np.asarray(grid_resolution(cfg, params))
    units = (aabb[1] - aabb[0]) / (gs - 1)
    t_l = np.round(np.round((new_aabb[0] - aabb[0]) / units)).astype(np.int64)
    b_r = np.round((new_aabb[1] - aabb[0]) / units).astype(np.int64) + 1
    b_r = np.minimum(b_r, gs)

    new = dict(params)
    if cfg.model_name == "cp":
        for key_l in ("density_lines", "app_lines"):
            new[key_l] = tuple(
                params[key_l][i][t_l[VEC_MODE[i]] : b_r[VEC_MODE[i]]]
                for i in range(3)
            )
    else:
        for key_p, key_l in (
            ("density_planes", "density_lines"),
            ("app_planes", "app_lines"),
        ):
            planes, lines = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                v = VEC_MODE[i]
                lines.append(params[key_l][i][t_l[v] : b_r[v]])
                planes.append(
                    params[key_p][i][t_l[m1] : b_r[m1], t_l[m0] : b_r[m0]]
                )
            new[key_p], new[key_l] = tuple(planes), tuple(lines)

    t_l_r = t_l / (gs - 1)
    b_r_r = (b_r - 1) / (gs - 1)
    correct = np.stack(
        [
            (1 - t_l_r) * aabb[0] + t_l_r * aabb[1],
            (1 - b_r_r) * aabb[0] + b_r_r * aabb[1],
        ]
    )
    return new, jnp.asarray(correct, jnp.float32), tuple(int(x) for x in (b_r - t_l))
