"""Jitted training step for TensoRF scene fitting.

Reproduces the optimizer + loss semantics of the reference training loop
(/root/reference/text2nerf_main.py:453-601) in one fused jit region:

- Adam(betas=0.9, 0.99) with two parameter groups: spatial grids at
  ``lr_init`` (0.02) and basis/MLP at ``lr_basis`` (1e-3)
  (tensoRF.py:164-170, text2nerf_main.py:453-454).
- Per-step exponential LR decay: lr(t) = lr0 * factor**t where
  factor = target_ratio ** (1/decay_iters) (text2nerf_main.py:483-488,
  600-601).  Stage boundaries reset the optimizer state and the schedule
  (text2nerf_main.py:523-528) — done by rebuilding the TrainState.
- Loss = mse(rgb) + 0.005 * mse(depth) + 1e3 * transmittance-mask loss
  (margin 0.1 before GT depth) + decayed TV regularizers
  (text2nerf_main.py:563-586).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import tensorf as tf
from ..ops import losses as L
from ..ops import render as render_ops


class TrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32


class LossWeights(NamedTuple):
    depth: float = 0.005        # text2nerf_main.py:565
    transmittance: float = 1e3  # text2nerf_main.py:570
    trans_margin: float = 0.1   # text2nerf_main.py:569
    tv_density: float = 0.1     # configs/text2nerf_scenes.txt:33
    tv_app: float = 0.01        # configs/text2nerf_scenes.txt:34
    l1: float = 0.0
    ortho: float = 0.0


def effective_microbatch(batch_size: int, microbatch: int) -> int:
    """Largest divisor of ``batch_size`` that is ≤ ``microbatch`` (the
    scan sub-batch split must be exact).  v5e optimum at the production
    batch is 32 (PERF.md)."""
    mb = max(1, min(int(microbatch), int(batch_size)))
    while batch_size % mb:
        mb -= 1
    return mb


def lr_factor(decay_target_ratio: float, decay_iters: int) -> float:
    """factor such that lr decays to lr*ratio over decay_iters steps
    (text2nerf_main.py:483-488)."""
    return float(decay_target_ratio) ** (1.0 / max(int(decay_iters), 1))


def make_optimizer(params, lr_init=0.02, lr_basis=1e-3, factor=1.0,
                   runtime_decay=False):
    """Two-group Adam with per-step exponential decay.

    ``runtime_decay=True`` returns a UNIT-learning-rate Adam: the
    per-group base LR and the ``factor**t`` decay are applied inside the
    train step from a runtime scalar (the ``lr_decay`` step argument)
    instead of an optax schedule.  The decay factor then never appears as
    a compiled constant, so ONE executable serves every stage reset,
    resume, and warm-up — the embedded-schedule form recompiles whenever
    ``factor`` changes (each stage boundary recomputes it from the pool
    size; a multi-minute compile per view on tunneled backends).
    """
    if runtime_decay:
        return optax.adam(1.0, b1=0.9, b2=0.99)

    def sched(base):
        return optax.exponential_decay(
            init_value=base, transition_steps=1, decay_rate=factor
        )

    tx = optax.multi_transform(
        {
            "spatial": optax.adam(sched(lr_init), b1=0.9, b2=0.99),
            "network": optax.adam(sched(lr_basis), b1=0.9, b2=0.99),
        },
        tf.param_group_labels(params),
    )
    return tx


def make_train_state(params, lr_init=0.02, lr_basis=1e-3, factor=1.0,
                     runtime_decay=False):
    tx = make_optimizer(params, lr_init, lr_basis, factor, runtime_decay)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def make_train_step(
    cfg: tf.TensoRFConfig,
    tx,
    *,
    n_samples: int,
    app_k: int = 64,
    white_bg: bool = True,
    ndc: bool = False,
    weights: LossWeights = LossWeights(),
    tv_factor: float = 1.0,
    depth_loss_type: str = "mse",
    density_group: int = 1,
    density_block: int = 4,
    microbatch: int = 1,
    microbatch_compact: int | None = None,
    compute_dtype: str = "fp32",
    compact_k: int = 0,
    depth_cap_band: int = 0,
    runtime_decay: bool = False,
    lr_init: float = 0.02,
    lr_basis: float = 1e-3,
):
    """Build the jitted train step.

    The TV weights decay multiplicatively every iteration and are NOT reset
    at stage boundaries (text2nerf_main.py:577-584): callers pass the
    accumulated decay via ``tv_decay`` to train_step; the ``tv_factor``
    default provides the stateless tv_factor**step fallback when callers
    pass tv_decay=None.

    ``depth_loss_type`` selects the depth term (--type_depth_loss,
    e_opt.py:20; default 'mse' = text2nerf_main.py:565):
    - 'mse': mean((depth_map - depth_gt)^2)
    - 'ssi': scale/shift-invariant WLS fit of the sample depths to the GT
      (utils.py:333-342 semantics, closed-form on-device); metrics gain
      the fitted 's'/'t' scalars (surfaced in the reference progress bar,
      text2nerf_main.py:610-611)
    - 'silog': scale-invariant log loss (utils.py:324-331)

    ``density_group=2`` groups ray-consecutive samples in the density
    gathers — halving the backward scatter-add rows, the training step's
    dominant cost (PERF.md).  Exact ONLY when
    ``tensorf.grouping_block(aabb, reso, step_ratio)`` returns a nonzero
    ``density_block`` (out-of-block spans silently read 0) — callers must
    check before enabling; the trainer does.

    ``compute_dtype='bf16'`` runs the factor-gather value/lerp math (and
    its backward) in bfloat16 — index math, compositing, losses, params,
    and Adam state all stay fp32 (a mixed-precision option; the gather/
    scatter costs are row-count-bound, so expect modest gains at most).

    ``depth_cap_band=B > 0`` switches the compacted selection to the
    DEPTH-ANCHORED window (render_rays_train_compact): the last
    ``compact_k`` mask-live samples at ``z <= depth_gt + B*step`` instead
    of the first ``compact_k`` live — guaranteeing the supervised surface
    is inside the rendered window (requires ``weights.depth > 0``; the
    anchor is the batch's depth supervision).

    ``microbatch=R`` accumulates gradients over R equal sub-batches inside
    one lax.scan (HLO temp memory scales with B/R; scatter row count — the
    time cost — is unchanged).  The losses are means over equal-size
    sub-batches, so the accumulated gradient equals the full-batch one up
    to fp reassociation; the batch-independent TV/L1/ortho terms are added
    once outside the scan, exactly.  Sampling jitter is drawn per
    sub-batch, so the random stream differs from microbatch=1 (same
    distribution).  With depth_loss_type='ssi' the scale/shift fit happens
    per sub-batch.

    ``microbatch_compact`` (default: same as ``microbatch``) is the R used
    when the step actually runs COMPACTED (mask present): compaction
    shrinks per-iteration temps ~4× (k=64 vs 259 samples), so the R tuned
    for the dense regime wastes time rebuilding packed tables per
    sub-batch — measured round 4 at the production config, the compacted
    step runs R=1 at 247.7 ms vs R=32's 456.4 (tools/bench_train_step.py
    --mb-sweep).  jit already specializes per alpha_mask None-ness, so
    the selection is trace-time.
    """
    assert depth_loss_type in ("mse", "ssi", "silog"), depth_loss_type
    compact = compact_k > 0 and not ndc
    # depth-anchored compaction needs per-ray depth supervision to anchor
    # to — with weights.depth == 0 the batch depths may be dummies
    anchor = compact and depth_cap_band > 0 and weights.depth > 0

    def batch_loss(params, aabb, batch, rng, alpha_mask=None):
        """Per-ray loss terms (no batch-independent regularizers)."""
        if compact and alpha_mask is not None:
            # alpha-mask train compaction (render_rays_train_compact):
            # gather/scatter rows only for compact_k mask-live samples per
            # ray — the round-3 answer to the scatter-bound backward
            # (PERF.md).  Semantics = the reference's masked culling
            # (tensorBase.py:451-456) + tail truncation.  With
            # depth_cap_band > 0 the window is DEPTH-ANCHORED (round 4):
            # it ends at the ray's supervised depth + band, so the rgb
            # loss always sees the surface it is asked to reproduce —
            # first-K truncation before the GT depth manufactured fog
            # (the full-schedule last-view collapse, PERF.md round 4).
            out = render_ops._render_rays_train_compact(
                cfg, params, aabb, batch["rays"], alpha_mask, rng,
                n_samples=n_samples,
                compact_k=compact_k,
                app_k=min(app_k, compact_k),
                white_bg=white_bg,
                density_group=density_group,
                density_block=density_block,
                occ_stride=max(1, density_group),
                feature_dtype=compute_dtype,
                depth_gt=batch["depth"] if anchor else None,
                cap_band_samples=depth_cap_band if anchor else 0,
            )
        else:
            out = render_ops.render_rays(
                cfg,
                params,
                aabb,
                batch["rays"],
                rng,
                n_samples=n_samples,
                app_k=app_k,
                is_train=True,
                white_bg=white_bg,
                ndc=ndc,
                density_group=1 if ndc else density_group,
                density_block=density_block,
                feature_dtype=compute_dtype,
            )
        depth_map = jnp.nan_to_num(out.depth)  # text2nerf_main.py:559-560

        loss_rgb = L.mse(out.rgb, batch["rgb"])
        ssi_s = ssi_t = None
        if depth_loss_type == "ssi":
            loss_depth, ssi_s, ssi_t = L.scale_shift_invariant_depth_loss(
                out.z_vals, out.weights, batch["depth"]
            )
        elif depth_loss_type == "silog":
            loss_depth = L.scale_invariant_log_depth_loss(
                jnp.maximum(depth_map, 1e-6), jnp.maximum(batch["depth"], 1e-6)
            )
        else:
            loss_depth = L.mse(depth_map, batch["depth"])
        mask = L.depth_front_mask(out.z_vals, batch["depth"], weights.trans_margin)
        # compacted weights cover only the materialized samples; keep the
        # reference's full-S per-ray mean (culled samples contribute 0)
        loss_trans = L.transmittance_mask_loss(
            out.weights, mask,
            denom=n_samples if compact and alpha_mask is not None else None,
        )

        total = (
            loss_rgb
            + weights.depth * loss_depth
            + weights.transmittance * loss_trans
        )
        metrics = {
            "mse": loss_rgb,
            "depth_loss": loss_depth,
            "transmit_loss": loss_trans,
        }
        if ssi_s is not None:
            metrics["ssi_s"], metrics["ssi_t"] = ssi_s, ssi_t
        return total, metrics

    def reg_loss(params, step, tv_decay):
        """Batch-independent regularizers (TV decayed per step)."""
        decay = (
            tv_factor ** step.astype(jnp.float32) if tv_decay is None else tv_decay
        )
        total = jnp.zeros(())
        metrics = {}
        if weights.tv_density > 0:
            tv_d = tf.tv_loss_density(cfg, params) * weights.tv_density * decay
            total = total + tv_d
            metrics["reg_tv_density"] = tv_d
        if weights.tv_app > 0:
            tv_a = tf.tv_loss_app(cfg, params) * weights.tv_app * decay
            total = total + tv_a
            metrics["reg_tv_app"] = tv_a
        if weights.l1 > 0:
            total = total + weights.l1 * tf.density_l1(cfg, params)
        if weights.ortho > 0:
            total = total + weights.ortho * tf.vector_comp_diffs(cfg, params)
        return total, metrics

    def loss_fn(params, aabb, batch, rng, step, tv_decay, alpha_mask=None):
        total, metrics = batch_loss(params, aabb, batch, rng, alpha_mask)
        reg, reg_metrics = reg_loss(params, step, tv_decay)
        metrics.update(reg_metrics)
        return total + reg, metrics

    @functools.partial(jax.jit, static_argnames=("has_tv_decay",))
    def _step(state: TrainState, aabb, batch, rng, tv_decay, has_tv_decay,
              alpha_mask=None, lr_decay=jnp.float32(1.0)):
        tv_decay = tv_decay if has_tv_decay else None
        # shapes are static per-compile: clamp to a divisor of the actual
        # batch (ray pools smaller than batch_size yield short batches).
        # alpha_mask None-ness is a trace-time fact, so the compacted
        # specialization can carry its own (smaller) R
        b = jax.tree.leaves(batch)[0].shape[0]
        mb = microbatch
        if compact and alpha_mask is not None and microbatch_compact:
            mb = microbatch_compact
        r = effective_microbatch(b, mb)
        if r == 1:
            (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, aabb, batch, rng, state.step, tv_decay, alpha_mask
            )
        else:
            sub = jax.tree.map(
                lambda x: x.reshape(r, x.shape[0] // r, *x.shape[1:]), batch
            )
            rngs = jax.random.split(rng, r)
            grad_fn = jax.value_and_grad(batch_loss, has_aux=True)

            def body(acc, xs):
                b_i, k_i = xs
                (_, m), g = grad_fn(state.params, aabb, b_i, k_i, alpha_mask)
                return jax.tree.map(jnp.add, acc, g), m

            zero = jax.tree.map(jnp.zeros_like, state.params)
            gsum, ms = jax.lax.scan(body, zero, (sub, rngs))
            grads = jax.tree.map(lambda x: x / r, gsum)
            (_, reg_metrics), g_reg = jax.value_and_grad(
                reg_loss, has_aux=True
            )(state.params, state.step, tv_decay)
            grads = jax.tree.map(jnp.add, grads, g_reg)
            metrics = {k: jnp.mean(v) for k, v in ms.items()}
            metrics.update(reg_metrics)
        metrics["psnr"] = L.mse2psnr(metrics["mse"])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if runtime_decay:
            # unit-LR Adam directions scaled here by the per-group base LR
            # and the runtime decay scalar (see make_optimizer): the
            # schedule never enters the compiled HLO
            labels = tf.param_group_labels(state.params)
            updates = jax.tree.map(
                lambda u, lbl: u
                * ((lr_init if lbl == "spatial" else lr_basis) * lr_decay),
                updates, labels,
            )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    def train_step(state, aabb, batch, rng, tv_decay=None, alpha_mask=None,
                   lr_decay=1.0):
        if compact and alpha_mask is not None:
            # same license render_rays_train_compact enforces: grouped
            # compaction tests occupancy every density_group-th sample,
            # which is only sound when the mask's pool dilation covers the
            # skipped neighbors (memoized per reso/stride inside the mask,
            # so this is cheap after the first call)
            if density_group > 1 and not render_ops.occupancy_stride_safe(
                cfg, state.params, aabb, alpha_mask, density_group
            ):
                raise ValueError(
                    "density_group=%d needs a mask pool dilation licensing "
                    "stride-%d occupancy tests (update_alpha_mask(pool>="
                    "%d))" % (density_group, density_group,
                              2 * density_group + 1)
                )
            alpha_mask = render_ops._strip_pool(alpha_mask)
        else:
            alpha_mask = None
        if tv_decay is None:
            return _step(state, aabb, batch, rng, jnp.float32(1.0), False,
                         alpha_mask, jnp.float32(lr_decay))
        return _step(state, aabb, batch, rng, jnp.float32(tv_decay), True,
                     alpha_mask, jnp.float32(lr_decay))

    return train_step


class PermutationSampler:
    """Random-permutation batch sampler (SimpleSampler, renderer.py:14-26).

    Host-side; reshuffles when the next batch would run past the pool.
    """

    def __init__(self, total: int, batch: int, seed: int = 0):
        import numpy as np

        self.total = int(total)
        self.batch = int(batch)
        self.curr = self.total
        self.ids = None
        self._rng = np.random.default_rng(seed)

    def next_ids(self):
        import numpy as np

        self.curr += self.batch
        if self.curr + self.batch > self.total:
            self.ids = self._rng.permutation(self.total)
            self.curr = 0
        return self.ids[self.curr : self.curr + self.batch]
