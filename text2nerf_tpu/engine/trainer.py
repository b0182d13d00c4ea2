"""Progressive 3-stage training orchestrator + render-only entry.

Functional re-design of reconstruction / render_test
(/root/reference/text2nerf_main.py:405-649, :29-65):

- stage 1: fit the seed view's support set for ``n_stage1`` epochs;
- stage 2: for each trajectory view, expand the scene (engine/expansion),
  reset the optimizer + LR schedule, then train ``n_stage2`` epochs with
  the 4:1 new-view / replay sampling rule (text2nerf_main.py:550-555);
- stage 3: 10 epochs over the full accumulated ray pool.

The TensoRF field lives as an immutable params pytree; optimizer resets are
a TrainState rebuild; scene growth is SceneState replacement.  TensorBoard
scalars are mirrored by a JSONL metrics log (engine/tracing).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..data import scene_state as ss
from ..models import tensorf as tf
from ..ops import render as render_ops
from ..services.registry import Services, default_services
from . import checkpoints as ckpt
from . import expansion as exp
from . import io_async
from . import renderer as eval_renderer
from . import train_step as ts
from .tracing import MetricsLogger, phase_timer


@dataclasses.dataclass
class TrainConfig:
    """The training-schedule flags of e_opt.py (defaults follow
    configs/text2nerf_scenes.txt + the __main__ overrides at
    text2nerf_main.py:657-665)."""

    expname: str = "exp"
    basedir: str = "./log"
    n_stage1: int = 50
    n_stage2: int = 50
    batch_size: int = 16384
    lr_init: float = 0.02
    lr_basis: float = 1e-3
    lr_decay_iters: int = -1
    lr_decay_target_ratio: float = 0.1
    tv_weight_density: float = 0.1
    tv_weight_app: float = 0.01
    l1_weight: float = 0.0     # L1_weight_inital (e_opt.py:70-71)
    ortho_weight: float = 0.0  # Ortho_weight (e_opt.py:74-75)
    n_voxel_init: int = 27_000_000
    n_samples_cap: int = 10 ** 6
    app_k: int = 64
    ndc_ray: bool = False
    eval_every_epochs: int = 50
    ckpt: Optional[str] = None
    render_test: bool = False
    render_path: bool = False
    render_train: bool = False       # --render_train (e_opt.py:40,
                                     # text2nerf_main.py:629-634)
    n_stage3: int = 10               # stage-3 epochs (text2nerf_main.py:468)
    n_vis: int = -1                  # --N_vis eval view subsampling
    vis_support_views: bool = True   # boundary preview renders of the
                                     # support split (text2nerf_main.py:
                                     # 619-621, evaluation preview=True)
    progress_refresh_rate: int = 50  # scalar-log cadence (e_opt.py:10)
    l1_weight_rest: float = 0.0      # --L1_weight_rest: L1 weight after the
                                     # first alpha-mask update (TensoRF rule)
    add_timestamp: bool = False      # --add_timestamp (e_opt.py:13)
    depth_loss_type: str = "mse"     # --type_depth_loss (e_opt.py:20)
    # eval-render compaction: rebuild the alpha-grid mask at each stage
    # boundary after stage 1 and route evaluation / expansion renders
    # through render_rays_compact (tensorBase.py:451-456 culling semantics;
    # 0 disables; a fixed K > 0 truncates rays whose live samples exceed
    # it).  Default -1: the acc-gated adaptive-K repacking renderer
    # (render.render_chunked_adaptive) — stage-boundary evals run on
    # mid-training fields where a fixed K=64 measured 14.7 dB of
    # truncation (PERF.md round 4), so the accuracy-honest path is the
    # default and fixed K is the opt-in
    eval_compact_k: int = -1
    # eval-mask dilation: pool=3 is the reference's own 3^3 max-pool
    # (tensorBase.py:355) and the tight default for the adaptive eval —
    # on a converged field the pool-5 dilation inflates per-ray live
    # counts past the top rung (28.5% of rays escalate at K=128 vs 5.2%
    # tight; reports/prod_field_diag_r5.json), which costs far more than
    # the stride-2 occupancy discount the dilation buys.  pool=5/7
    # license stride-2/3 occupancy testing (+5.5% on fixed-K renders,
    # PERF.md) — an opt-in for fixed eval_compact_k configs
    eval_mask_pool: int = 3
    # TPU-native extension: gradient micro-batching inside the jitted
    # train step (lax.scan over sub-batches).  Measured FASTER on v5e
    # (768 -> 554 ms/step at the production config, PERF.md) and caps HLO
    # temp memory; gradient equals the full batch up to fp reassociation.
    # The effective value is clamped to the largest divisor of batch_size.
    train_microbatch: int = 32
    # R for the COMPACTED specialization of the step (mask present):
    # compaction shrinks per-iter temps ~4×, and the dense-tuned R=32
    # wastes time rebuilding the packed tables per sub-batch — the
    # round-4 mb sweep at the production config measured the compacted
    # step at R=1: 247.7 ms vs R=32: 456.4 ms (tools/bench_train_step.py
    # --mb-sweep; PERF.md).  0/None falls back to train_microbatch.
    train_microbatch_compact: int = 1
    # TPU-native extension: grouped density gathers — G ray-consecutive
    # samples share one gathered (fwd) / scattered (bwd) table row.  The
    # round-3 weighted-contraction extraction made G=2 the fastest train
    # path (689 → 529 ms/step at production config, PERF.md); guarded per
    # grid by tensorf.grouping_block, 1 disables.
    train_density_group: int = 2
    # 'bf16' runs the factor gather/lerp math of the train forward+backward
    # in bfloat16 (index math, losses, params, Adam all fp32)
    train_compute_dtype: str = "fp32"
    # TPU-native extension: alpha-mask TRAIN compaction — once a stage
    # boundary has built an occupancy mask, the train step gathers (and
    # scatters, in the backward) only the first K mask-live samples per
    # ray (render_rays_train_compact; semantics = the reference's masked
    # culling, tensorBase.py:451-456, + tail truncation past K).  Cuts
    # the scatter-bound backward by the mask's live fraction; 0 disables.
    # Stage 1 (no mask yet) always runs dense.  Measured 528.5 → 378.6
    # ms/step (−28%) at the production config on a trained 5.6%-occupancy
    # mask — but ONLY sound when the mask covers everywhere the remaining
    # training must grow density: the trainer stamps the incoming view's
    # depth-band voxels into the mask at each stage boundary
    # (stamp_alpha_mask) to license it; without the stamp, new-view
    # content cannot grow in dead-masked voxels and quality collapses
    # (PERF.md round 3 A/B).
    train_compact_k: int = 64
    # Depth-anchored compaction window (round 4): the first-K-live window
    # can end BEFORE a ray's supervised depth once the mask densifies (at
    # the full schedule, 25% of the last view's hole rays), asking the rgb
    # loss to reproduce content the render cannot see — the optimizer then
    # manufactures fog inside the window and the view collapses (measured
    # 11 dB).  With band > 0 the window instead holds the LAST K mask-live
    # samples at z <= depth_gt + band·step: the supervised surface is
    # always rendered; the dropped early samples are those the margin loss
    # wants empty anyway.  Value = band width in march steps behind the
    # GT depth (0 disables; requires depth supervision, weights.depth > 0).
    train_depth_cap_band: int = 6
    # TPU-native extension (round 4): stage-3 tail rebalance.  Under the
    # reference schedule the LAST-generated view is the quality outlier
    # (16.7 dB at the full 50/50/10 schedule, PERF.md): every earlier
    # view keeps receiving reconciliation epochs via the 4:1 replay rule
    # (text2nerf_main.py:550-555) during all later views' stages, while
    # the last view gets only its own n_stage2 + n_stage3 epochs.
    # 'tail_deficit' draws each stage-3 batch from ONE view's pool, the
    # view chosen with probability ∝ (1 / epochs its content has been
    # trained since generation)^gamma — steering stage 3 toward the
    # least-reconciled (latest) views.  'uniform' is reference parity
    # (one permutation over the merged pool, text2nerf_main.py:529-536).
    stage3_balance: str = "uniform"
    stage3_balance_gamma: float = 1.0
    seed: int = 1024
    model: tf.TensoRFConfig = dataclasses.field(default_factory=tf.TensoRFConfig)
    # TensoRF coarse-to-fine machinery (upsamp_list / update_AlphaMask_list,
    # e_opt.py:126-133).  The reference parses these but its main loop never
    # invokes them (grid fixed at 300^3, SURVEY §5); here they are live:
    # global-step milestones at which the factor grids are upsampled toward
    # n_voxel_final / the alpha mask is rebuilt.
    n_voxel_final: int = 27_000_000
    upsamp_list: Tuple[int, ...] = ()
    update_alphamask_list: Tuple[int, ...] = ()
    lr_upsample_reset: bool = True
    # additionally checkpoint every N epochs (0 = stage boundaries only):
    # long stages (the reference's 50-epoch stage 1 is ~1 h at production
    # size) survive interruptions without losing the whole stage
    resume_every_epochs: int = 0
    # mid-scene resume: checkpoint params + loop state + a scene snapshot at
    # every stage boundary; a crashed run restarts from the last completed
    # view (the reference can only restart from scratch, SURVEY §5)
    resume: bool = False
    # 'npz' (single portable file) or 'orbax' (async OCDBT directory —
    # every process writes its shards of a sharding-annotated params tree;
    # the multi-host backend for pod runs)
    checkpoint_backend: str = "npz"


def eval_boundary(
    epoch: int, n_stage1: int, n_stage2: int, eval_every: int
) -> bool:
    """Is the epoch that just FINISHED (0-indexed) an eval boundary?

    Boundaries (text2nerf_main.py:618-625): every ``eval_every`` epochs,
    the end of stage 1, and each stage-2 view boundary.  The view-boundary
    term must be guarded to epochs strictly past stage 1 — Python's
    floored modulo is 0 for negative multiples too (epoch+1=10, stages
    50/20: (10-50) % 20 == 0), which would fire mid-stage-1 and, worse,
    hand the train-compaction path a mask built from the half-trained
    seed field (regression-tested)."""
    e1 = epoch + 1
    return (
        e1 % eval_every == 0
        or (n_stage2 > 0 and e1 > n_stage1 and (e1 - n_stage1) % n_stage2 == 0)
        or e1 == n_stage1
    )


def _epoch_iters(n_rays: int, batch: int) -> int:
    return n_rays // batch + int(n_rays % batch > 0)


def stage3_view_weights(cfg: "TrainConfig", lengths, iters1: int) -> np.ndarray:
    """Per-view stage-3 sampling weights ∝ (1 / reconciliation epochs)^gamma.

    The quality deficit at the full schedule decays with RECENCY: the
    later a view's content was generated, the fewer epochs the field has
    had to reconcile it (round-3 full run: last view 16.7 dB while
    earlier views reached 40+; text2nerf_main.py:481-555 gives the last
    view only its own stage + stage 3).  Weight each view by the inverse
    of the epochs its content has been trained on when stage 3 starts:
    E_0 = n_stage1 + (V-1)*n_stage2 + n_stage3 (the seed view is present
    throughout), E_u = (V-u)*n_stage2 + n_stage3 for generated view u.
    Deterministic in the config alone, so resume needs no extra state.

    A first cut weighted by inverse per-RAY exposure instead was run and
    measured WRONG (round 4, PERF.md): the seed view's pool spans ~24
    support warps, so its per-ray exposure is tiny and it drew 51% of
    stage-3 batches while the dying last view got 18.5% — per-ray
    pressure is not per-view quality need.  ``iters1`` is kept for
    call-site compatibility (unused by the recency model).
    """
    del iters1
    lengths = np.asarray(lengths, np.float64)
    v_n = len(lengths)
    epochs = np.zeros(v_n)
    epochs[0] = cfg.n_stage1 + (v_n - 1) * cfg.n_stage2 + cfg.n_stage3
    for u in range(1, v_n):
        epochs[u] = (v_n - u) * cfg.n_stage2 + cfg.n_stage3
    w = np.zeros(v_n)
    ok = (epochs > 0) & (lengths > 0)
    w[ok] = (1.0 / epochs[ok]) ** cfg.stage3_balance_gamma
    if w.sum() <= 0:
        w[lengths > 0] = 1.0
    return w / w.sum()


class _WeightedViewSampler:
    """Stage-3 batch source for stage3_balance='tail_deficit': each
    batch comes from ONE view's update pool, the view drawn ∝ weights;
    within a view, permutation sampling (SimpleSampler semantics)."""

    def __init__(self, pools, weights, batch: int, seed: int):
        self.pools = pools
        self.weights = np.asarray(weights, np.float64)
        self.batch = int(batch)
        self.samplers = [
            ts.PermutationSampler(len(p[0]), batch, seed + 31 * i)
            if len(p[0]) >= batch else None
            for i, p in enumerate(pools)
        ]
        self._rng = np.random.default_rng(seed)

    def next_batch(self):
        v = int(self._rng.choice(len(self.pools), p=self.weights))
        if self.samplers[v] is not None:
            ids = self.samplers[v].next_ids()
        else:
            # tiny pool (< batch, micro-size tests): draw with replacement
            ids = self._rng.integers(0, len(self.pools[v][0]), self.batch)
        return _batch_from_pool(self.pools[v], ids)


def _resolve_group(cfg: "TrainConfig", aabb, reso, step_ratio):
    """(density_group, density_block) under the grouping_block drift guard
    — the ONE resolver shared by the real step builder and the bootstrap
    warm-up so both compile the identical executable."""
    group, block = 1, 4
    if cfg.train_density_group > 1 and not cfg.ndc_ray:
        b = tf.grouping_block(
            aabb, reso, step_ratio, group=cfg.train_density_group
        )
        if b:
            group, block = cfg.train_density_group, b
    return group, block


def _initial_loss_weights(cfg: "TrainConfig") -> "ts.LossWeights":
    """Run-start loss weights (the trainer mutates its copy at the
    L1_weight_rest milestone, so _step_kwargs takes the LIVE value)."""
    return ts.LossWeights(
        tv_density=cfg.tv_weight_density, tv_app=cfg.tv_weight_app,
        l1=cfg.l1_weight, ortho=cfg.ortho_weight,
    )


def _step_kwargs(
    cfg: "TrainConfig", *, n_samples, group, block, white_bg, weights=None
):
    """The single source of make_train_step kwargs.  The warm-up thread
    and reconstruction's make_step MUST build byte-identical programs or
    the persistent-cache overlap buys nothing — any new knob goes here."""
    return dict(
        n_samples=n_samples, app_k=cfg.app_k, white_bg=white_bg,
        ndc=cfg.ndc_ray,
        weights=_initial_loss_weights(cfg) if weights is None else weights,
        depth_loss_type=cfg.depth_loss_type,
        density_group=group, density_block=block,
        compute_dtype=cfg.train_compute_dtype,
        compact_k=cfg.train_compact_k,
        depth_cap_band=cfg.train_depth_cap_band,
        runtime_decay=True, lr_init=cfg.lr_init, lr_basis=cfg.lr_basis,
        microbatch=ts.effective_microbatch(
            cfg.batch_size, cfg.train_microbatch
        ),
        microbatch_compact=(
            ts.effective_microbatch(
                cfg.batch_size, cfg.train_microbatch_compact
            )
            if cfg.train_microbatch_compact
            else None
        ),
    )


def stamped_train_mask(eval_mask, pool_new, pool_pre):
    """Stamp the train-compaction mask with every supervised depth band.

    Pools are ``(rays, rgbs, depths, ...)`` tuples (scene_state updates
    layout).  ``pool_new`` is the in-flight view's pool (round 3: its
    content must be able to GROW through the frozen-support mask);
    ``pool_pre`` is the replay pool over all earlier views (round 4: a
    weakly-trained region loses its density-derived mask coverage at the
    next rebuild and goes permanently dead — the last-view collapse's
    lock-in step; in stage 3 pool_new is None, so the replay stamp is the
    only thing keeping under-trained supervised regions trainable).
    Stamping only marks live what some training ray's own depth
    supervision says should hold content (tf.stamp_alpha_mask)."""
    m = eval_mask
    if pool_new is not None and len(pool_new[0]) > 0:
        m = tf.stamp_alpha_mask(m, pool_new[0], pool_new[2])
    if pool_pre is not None and len(pool_pre[0]) > 0:
        m = tf.stamp_alpha_mask(m, pool_pre[0], pool_pre[2])
    return m


def _start_train_step_warmup(cfg: "TrainConfig", scene_cfg):
    """Overlap the stage-1 train-step jit compile with the host-side scene
    bootstrap (VERDICT r3 item 5).

    Every shape the train step compiles against derives from CONFIG alone
    (the scene AABB is ±scene_bound, the grid from n_voxel_init, the batch
    from batch_size), so a background thread can run one throwaway step on
    dummy data while bootstrap_scene does its bilateral filter / support
    warps / pool building — populating the in-process + persistent
    compilation caches that the first real step then hits.  XLA compiles
    release the GIL (and run server-side on tunneled backends), so the
    overlap is genuine.  Returns the thread (callers may join; failures
    are swallowed — warm-up is best-effort and the real compile path is
    unchanged).
    """
    import threading

    def body():
        try:
            aabb_w = jnp.asarray(
                [[-scene_cfg.scene_bound] * 3, [scene_cfg.scene_bound] * 3],
                jnp.float32,
            )
            reso = tf.n_to_reso(cfg.n_voxel_init, aabb_w)
            n_samples = tf.default_n_samples(
                reso, cfg.model.step_ratio, cfg.n_samples_cap
            )
            params_w = tf.init_params(
                jax.random.PRNGKey(0), cfg.model, reso
            )
            state_w, tx_w = ts.make_train_state(
                params_w, cfg.lr_init, cfg.lr_basis, runtime_decay=True
            )
            group, block = _resolve_group(
                cfg, aabb_w, reso, cfg.model.step_ratio
            )
            step_w = ts.make_train_step(
                cfg.model, tx_w,
                **_step_kwargs(
                    cfg, n_samples=n_samples, group=group, block=block,
                    white_bg=scene_cfg.white_bg,
                ),
            )
            dirs = np.full((cfg.batch_size, 3), 0.577, np.float32)
            batch_w = {
                "rays": jnp.asarray(
                    np.concatenate(
                        [np.zeros((cfg.batch_size, 3), np.float32), dirs], -1
                    )
                ),
                "rgb": jnp.zeros((cfg.batch_size, 3), jnp.float32),
                "depth": jnp.full((cfg.batch_size,), 4.0, jnp.float32),
            }
            _, m = step_w(state_w, aabb_w, batch_w, jax.random.PRNGKey(0), 1.0)
            jax.block_until_ready(m)
        except Exception:  # best-effort: never block the real path
            pass

    t = threading.Thread(target=body, daemon=True, name="train-step-warmup")
    t.start()
    return t


def _batch_from_pool(pool, ids):
    rays, rgbs, depths = pool
    return {
        "rays": jnp.asarray(rays[ids]),
        "rgb": jnp.asarray(rgbs[ids]),
        "depth": jnp.asarray(depths[ids]),
    }


def init_field(cfg: TrainConfig, scene: ss.SceneState, rng_key=None):
    """Model init or checkpoint warm-start (text2nerf_main.py:442-452)."""
    if cfg.ckpt and os.path.exists(cfg.ckpt):
        mcfg, params, aabb, alpha_mask, _ = ckpt.load_checkpoint(cfg.ckpt)
        return mcfg, params, aabb, alpha_mask
    aabb = jnp.asarray(scene.scene_bbox)
    reso = tf.n_to_reso(cfg.n_voxel_init, aabb)
    params = tf.init_params(
        rng_key if rng_key is not None else jax.random.PRNGKey(cfg.seed),
        cfg.model, reso,
    )
    return cfg.model, params, aabb, None


def reconstruction(
    cfg: TrainConfig,
    scene_cfg: ss.SceneConfig,
    services: Optional[Services] = None,
    expansion_cfg: Optional[exp.ExpansionConfig] = None,
):
    """Full progressive training (reconstruction, text2nerf_main.py:405-649).

    Returns (model_cfg, params, aabb, scene, logfolder).
    """
    services = services or default_services(hw=scene_cfg.hw)
    expansion_cfg = expansion_cfg or exp.ExpansionConfig(
        prompt=scene_cfg.prompt, push_depth=scene_cfg.push_depth,
        trans_range=scene_cfg.trans_range,
    )
    logfolder = os.path.join(
        cfg.basedir,
        f"{cfg.expname}_{scene_cfg.prompt.replace(' ', '_')}"
        f"_{scene_cfg.angle}_{scene_cfg.trans_range}",
    )
    if cfg.add_timestamp:
        import datetime

        logfolder += datetime.datetime.now().strftime("-%Y%m%d-%H%M%S")
    os.makedirs(logfolder, exist_ok=True)
    log = MetricsLogger(os.path.join(logfolder, "metrics.jsonl"))
    with open(os.path.join(logfolder, "args.txt"), "w") as f:
        for k, v in {**dataclasses.asdict(cfg), **dataclasses.asdict(scene_cfg)}.items():
            f.write(f"{k}:{v}\n")

    orbax = cfg.checkpoint_backend == "orbax"
    resume_ckpt = os.path.join(
        logfolder,
        f"{cfg.expname}_resume" + ("" if orbax else ".npz"),
    )
    resume_snap = os.path.join(logfolder, "scene_snapshot.npz")
    resume_state = None
    if cfg.resume and os.path.exists(resume_ckpt) and os.path.exists(resume_snap):
        if orbax:
            mcfg, params, aabb, resume_state = ckpt.load_orbax(resume_ckpt)
            params = jax.tree_util.tree_map(jnp.asarray, params)
            aabb = jnp.asarray(aabb)
        else:
            mcfg, params, aabb, _, resume_state = ckpt.load_checkpoint(resume_ckpt)
        scene = ss.load_scene_snapshot(
            resume_snap, n_views_pools=resume_state["next_view"],
            trans_range=scene_cfg.trans_range,
            use_support_set=scene_cfg.use_support_set,
        )
        log.scalars(0, {"resume_epoch": resume_state["epoch"]})
    else:
        # overlap the stage-1 train-step compile with the host-side
        # bootstrap (both multi-minute at production size); the join
        # timer records any residual compile wait after bootstrap
        warmup = _start_train_step_warmup(cfg, scene_cfg)
        with phase_timer("bootstrap", log):
            scene = ss.bootstrap_scene(
                scene_cfg, "train",
                text2img=services.text2img,
                estimate_depth=services.estimate_depth,
                log=log,
            )
        with phase_timer("warmup_join", log):
            # bounded: a hung tunnel compile in the throwaway warm-up must
            # not deadlock reconstruction before any checkpointing exists —
            # proceed and let the real compile (and the stall supervisor)
            # own the failure
            warmup.join(timeout=900.0)
            if warmup.is_alive():
                log.scalars(0, {"warmup_abandoned": 1.0})
        mcfg, params, aabb, _ = init_field(cfg, scene)
    white_bg = scene.white_bg
    reso = tf.grid_resolution(mcfg, params)
    n_samples = tf.default_n_samples(reso, mcfg.step_ratio, cfg.n_samples_cap)

    # ray filtering (text2nerf_main.py:476-477)
    if not cfg.ndc_ray:
        keep = np.asarray(
            render_ops.filter_rays_bbox(aabb, jnp.asarray(scene.all_rays))
        )
        pool_pre = (
            scene.all_rays[keep], scene.all_rgbs[keep], scene.all_depth[keep]
        )
    else:
        pool_pre = (scene.all_rays, scene.all_rgbs, scene.all_depth)

    sampler_pre = ts.PermutationSampler(len(pool_pre[0]), cfg.batch_size, cfg.seed)
    n_iters_epoch1 = _epoch_iters(len(pool_pre[0]), cfg.batch_size)
    n_iters_stage1 = cfg.n_stage1 * n_iters_epoch1
    decay_iters = (
        cfg.lr_decay_iters if cfg.lr_decay_iters > 0
        else (n_iters_stage1 if n_iters_stage1 > 0 else 1000)
    )
    factor = ts.lr_factor(cfg.lr_decay_target_ratio, decay_iters)

    weights = _initial_loss_weights(cfg)

    def current_group():
        # grouped density gathers: the round-3 weighted-contraction
        # extraction made them the fastest train path (689 → 529 ms/step
        # at the production config, PERF.md) — one gathered/scattered row
        # serves ``train_density_group`` ray-consecutive samples.  Guarded
        # by grouping_block on the CURRENT aabb/reso (re-evaluated at
        # upsample/shrink milestones because make_step is rebuilt there);
        # falls back to per-sample gathers when the drift bound fails.
        return _resolve_group(
            cfg, aabb, tf.grid_resolution(mcfg, state.params),
            mcfg.step_ratio,
        )

    def make_step(tx):
        group, block = current_group()
        return ts.make_train_step(
            mcfg, tx,
            **_step_kwargs(
                cfg, n_samples=n_samples, group=group, block=block,
                white_bg=white_bg, weights=weights,
            ),
        )

    _tm_cache = {}

    def train_mask_arg():
        """The alpha mask for train compaction, or None when disabled /
        not yet built / the mask's dilation cannot license the group-
        strided occupancy test (render_rays_train_compact's guard).

        CRITICAL: compaction freezes the density field's SUPPORT, so the
        mask must be STAMPED with the in-flight view's supervised depth
        band (tf.stamp_alpha_mask) — without it the new view's content
        cannot grow in dead-masked voxels and per-view quality collapses
        (PERF.md round-3 A/B).  Round 4: the REPLAY pool is stamped too —
        a view whose surface trained weakly (e.g. fog from the
        pre-anchoring truncation) loses its stamp at the next mask
        rebuild and its region goes permanently dead, exactly the
        last-view collapse's lock-in step; and in stage 3 pool_new is
        None, so without the replay stamp stage 3 trains against a mask
        that can never regrow ANY under-trained region.  Stamping is a
        max-reduction over supervised depth bands: it only keeps live
        what some ray's own supervision says should hold content.  Keyed
        on (mask, pools) identity so every mask-rebuild site and every
        pool change re-stamps.  The guard does host-side readbacks,
        hence the memoization.

        Stage 1 ALWAYS trains dense (``epoch`` resolves to the loop
        variable at call time): the seed content is still growing, a mask
        from the half-trained field freezes its support, and there is no
        pool_new stamp source — the same reason stage-1 resumes stay
        dense.  An eval_every_epochs-triggered eval may legitimately
        build eval_mask mid-stage-1; it must not leak into the train
        step."""
        if cfg.train_compact_k <= 0 or eval_mask is None:
            return None
        if epoch < cfg.n_stage1:
            return None
        # the key must stay pure-id cheap: this runs EVERY train step and
        # anything touching jnp here (grid_resolution readbacks,
        # grouping_block's float() syncs) would serialize the hot loop
        # over the tunnel.  id(aabb) covers shrink; upsample (same ids)
        # keeps the cached verdict, which stays conservative — the march
        # step only shrinks under upsample, and the per-step wrapper
        # guard in make_train_step re-verifies per (reso, stride) anyway.
        mkey = (id(eval_mask), id(pool_new), id(pool_pre), id(aabb))
        if mkey not in _tm_cache:
            g, _ = current_group()
            ok = g == 1 or render_ops.occupancy_stride_safe(
                mcfg, state.params, aabb, eval_mask, g
            )
            m = None
            if ok:
                m = stamped_train_mask(eval_mask, pool_new, pool_pre)
            _tm_cache.clear()
            _tm_cache[mkey] = m
        return _tm_cache[mkey]

    def render_mask():
        """Mask for eval/expansion RENDERS: only when eval compaction is
        opted in.  With eval_compact_k==0 the mask may still exist (train
        compaction builds it) but must not alter metric renders — dense
        eval is the reference's shipped-config behavior
        (update_AlphaMask_list=[], so its tensorf.alphaMask stays None)."""
        return eval_mask if cfg.eval_compact_k != 0 else None

    _zf_cache: dict = {}

    def eval_z_floor():
        """Scene-aware eval z-cull (supervised_z_floor): the reference's
        constant 2.0 erases supervised content the trajectory placed
        below world z = 2 (r4c view 3: 9.1 dB on a 36.8 dB field —
        reports/diag_zmin_probe_r4c.json).  Recomputed when the scene
        grows (each appended view can lower the floor)."""
        k = scene.rgbs_gen_split.shape[0]
        if k not in _zf_cache:
            _zf_cache[k] = ss.supervised_z_floor(scene)
        return _zf_cache[k]

    # runtime_decay: the LR schedule lives in a per-step scalar (lr_decay,
    # tracked like tv_decay) instead of a compiled constant — ONE train-step
    # executable serves every stage reset, resume, and the bootstrap-time
    # warm-up, where the embedded-schedule form recompiled per view
    state, tx = ts.make_train_state(
        params, cfg.lr_init, cfg.lr_basis, factor, runtime_decay=True
    )
    step_fn = make_step(tx)

    n_views = scene.poses_gen.shape[0]
    # n_stage2 = 0 → stage-1-only local scene fit (no diffusion in the
    # loop; BASELINE config #2)
    n_epoch_stage2 = cfg.n_stage2 * (n_views - 1)
    n_total = cfg.n_stage1 + n_epoch_stage2

    key = jax.random.PRNGKey(cfg.seed)
    tv_decay = 1.0
    lr_decay = 1.0  # factor**stage_step, reset at every schedule reset
    view_idx = 0
    eval_mask = None  # alpha-grid mask for compacted eval renders

    def rebuild_eval_mask():
        # train compaction shares this mask: train_compact_k alone must
        # still build it (eval call sites pass compact_k=eval_compact_k,
        # so eval stays dense-with-mask-culling when only train opts in)
        if (cfg.eval_compact_k == 0 and cfg.train_compact_k <= 0) or cfg.ndc_ray:
            return None
        reso_now = tf.grid_resolution(mcfg, state.params)
        mask_reso = tuple(min(r, 200) for r in reso_now)
        # pool dilation licenses the strided occupancy test in
        # render_rays_compact (PERF.md round 2): stride = (pool-1)//2
        mask, _ = tf.update_alpha_mask(mcfg, state.params, aabb, mask_reso,
                                       pool=cfg.eval_mask_pool)
        return mask
    pool_new = None
    sampler_new = None
    sampler_s3 = None  # stage-3 weighted source (stage3_balance)
    n_iters_epoch = n_iters_epoch1

    def build_stage3_sampler(n_views_done: int, seed: int):
        if cfg.stage3_balance != "tail_deficit":
            return None
        pools = [scene.updates["%05d" % v] for v in range(n_views_done)]
        w = stage3_view_weights(
            cfg, [len(p[0]) for p in pools], n_iters_epoch1
        )
        log.scalars(0, {"stage3_weight_view%d" % v: float(w[v])
                        for v in range(len(w))})
        return _WeightedViewSampler(pools, w, cfg.batch_size, seed)

    global_step = 0
    start_epoch = 0
    stage_step = 0  # optimizer steps since the last state/schedule reset
    if resume_state is not None:
        start_epoch = int(resume_state["epoch"])
        view_idx = int(resume_state["next_view"]) - 1
        tv_decay = float(resume_state.get("tv_decay", 1.0))
        global_step = int(resume_state.get("global_step", 0))
        stage_step = int(resume_state.get("stage_step", 0))
        # Mid-stage resume (periodic resume_every_epochs checkpoints):
        # start_epoch is NOT a stage boundary, so the loop below will not
        # rebuild the pools/optimizer — reconstruct the in-flight stage's
        # state here.  The LR schedule restarts from lr·factor^stage_step
        # (the decay already applied); Adam moments restart (they rebuild
        # within ~100 steps).
        at_boundary = (
            cfg.n_stage2 > 0
            and start_epoch >= cfg.n_stage1
            and (start_epoch - cfg.n_stage1) % cfg.n_stage2 == 0
            and start_epoch < n_total
        )
        # the L1_weight_rest switch keys on global_step and will not
        # re-fire at a restored position past the milestone — re-apply it
        # before any step_fn rebuild below (or at the live boundary code)
        l1_switched = bool(
            cfg.update_alphamask_list
            and global_step > cfg.update_alphamask_list[0]
        )
        if l1_switched:
            weights = weights._replace(l1=cfg.l1_weight_rest)
        if start_epoch > 0 and not at_boundary:
            stage3_entry = False
            if start_epoch >= n_total:  # stage 3: every view's pool folded
                allp = [
                    scene.updates["%05d" % nn] for nn in range(view_idx + 1)
                ]
                pool_pre = tuple(np.concatenate(x, 0) for x in zip(*allp))
                pool_new, sampler_new = None, None
                sampler_s3 = build_stage3_sampler(
                    view_idx + 1, cfg.seed + start_epoch + 7
                )
                n_iters_epoch = _epoch_iters(len(pool_pre[0]), cfg.batch_size)
                decay_iters = n_iters_epoch * max(cfg.n_stage3, 1)
                # a checkpoint written at the last stage-2 epoch resumes
                # AT n_total: the live stage-3 schedule reset (the pool
                # fold branch) is skipped on resume, so reset here
                stage3_entry = start_epoch == n_total
            elif start_epoch > cfg.n_stage1 and cfg.n_stage2 > 0:
                # mid-stage-2 for view view_idx
                prev = [scene.updates["%05d" % nn] for nn in range(view_idx)]
                pool_pre = tuple(np.concatenate(x, 0) for x in zip(*prev))
                pool_new = scene.updates["%05d" % view_idx]
                sampler_new = (
                    ts.PermutationSampler(
                        len(pool_new[0]), cfg.batch_size,
                        cfg.seed + start_epoch + 1,
                    )
                    if len(pool_new[0]) > 0
                    else None
                )
                n_iters_epoch = (
                    _epoch_iters(len(pool_new[0]), cfg.batch_size)
                    + n_iters_epoch1
                )
                decay_iters = n_iters_epoch * cfg.n_stage2
            else:
                # mid-stage-1: pools already correct; keep stage-1 decay
                decay_iters = (
                    cfg.lr_decay_iters if cfg.lr_decay_iters > 0
                    else (n_iters_stage1 if n_iters_stage1 > 0 else 1000)
                )
            factor = ts.lr_factor(cfg.lr_decay_target_ratio, decay_iters)
            # re-apply the alpha-mask milestone's ray-pool filtering (its
            # live firing keys on global_step and is already behind us):
            # rebuild the mask from the restored field and drop alpha-dead
            # rays, mirroring filtering_rays (tensorBase.py:372-404)
            if l1_switched:
                reso_r = tf.grid_resolution(mcfg, params)
                mask_r, _ = tf.update_alpha_mask(
                    mcfg, params, aabb, tuple(min(r, 200) for r in reso_r)
                )
                keep_pre = np.asarray(render_ops.filter_rays_alpha(
                    aabb, jnp.asarray(pool_pre[0]), mask_r
                ))
                if keep_pre.any() and not keep_pre.all():
                    pool_pre = tuple(p[keep_pre] for p in pool_pre)
                if pool_new is not None and len(pool_new[0]) > 0:
                    keep_new = np.asarray(render_ops.filter_rays_alpha(
                        aabb, jnp.asarray(pool_new[0]), mask_r
                    ))
                    if keep_new.any() and not keep_new.all():
                        pool_new = tuple(p[keep_new] for p in pool_new)
                        sampler_new = ts.PermutationSampler(
                            len(pool_new[0]), cfg.batch_size,
                            cfg.seed + start_epoch + 1,
                        )
            sampler_pre = ts.PermutationSampler(
                len(pool_pre[0]), cfg.batch_size, cfg.seed + start_epoch
            )
            state, tx = ts.make_train_state(
                state.params, cfg.lr_init, cfg.lr_basis, factor,
                runtime_decay=True,
            )
            # restore the decayed LR VERBATIM from the checkpoint (the
            # runtime-decay step reads it from the lr_decay scalar, so the
            # compiled HLO is identical across resumes and Adam's moments
            # restart with fresh bias correction).  factor**stage_step is
            # only the legacy fallback — it loses the non-unit base left
            # by lr_upsample_reset=False upsample milestones.
            if stage3_entry:
                stage_step = 0
                lr_decay = 1.0
            else:
                lr_decay = float(
                    resume_state.get("lr_decay", factor ** stage_step)
                )
            step_fn = make_step(tx)
            if start_epoch >= cfg.n_stage1 and (
                cfg.train_compact_k > 0 or cfg.eval_compact_k != 0
            ):
                # stage-2/3 mid-stage resume: rebuild the mask from the
                # restored field so the resumed epochs keep the compacted
                # train/eval paths (train_mask_arg re-stamps the in-flight
                # view's depth band on top; stage-1 resumes stay dense —
                # the seed content is still growing and has no stamp
                # source)
                eval_mask = rebuild_eval_mask()

    for epoch in range(start_epoch, n_total + cfg.n_stage3):
        # --- stage-boundary: expand the scene ------------------------------
        if (
            cfg.n_stage2 > 0
            and epoch >= cfg.n_stage1
            and (epoch - cfg.n_stage1) % cfg.n_stage2 == 0
            and epoch < n_total
        ):
            view_idx = (epoch - cfg.n_stage1) // cfg.n_stage2 + 1
            if cfg.resume:
                # stage-boundary resume point: loop state + scene snapshot
                ss.save_scene_snapshot(resume_snap, scene)
                loop_state = {
                    "epoch": epoch, "next_view": view_idx,
                    "tv_decay": tv_decay, "global_step": global_step,
                    "stage_step": stage_step, "lr_decay": lr_decay,
                }
                if orbax:
                    ckpt.save_orbax(resume_ckpt, mcfg, state.params, aabb,
                                    loop_state=loop_state)
                else:
                    ckpt.save_checkpoint(resume_ckpt, mcfg, state.params,
                                         aabb, loop_state=loop_state)
            # the field just finished fitting the previous views: rebuild
            # the occupancy mask so the expansion's known-view renders and
            # the next round of evals use the compacted path
            eval_mask = rebuild_eval_mask()
            with phase_timer(f"expand_view_{view_idx}", log):
                scene = exp.expand_scene(
                    view_idx, mcfg, state.params, scene, services,
                    expansion_cfg, logfolder,
                    n_samples=n_samples, white_bg=white_bg, seed=cfg.seed + view_idx,
                    alpha_mask=render_mask(),
                    compact_k=cfg.eval_compact_k,
                    eval_z_min=eval_z_floor(),
                    log=log,
                )
            # replay pool = all previous views' pools (text2nerf_main.py:509-517)
            prev = [scene.updates["%05d" % nn] for nn in range(view_idx)]
            pool_pre = tuple(np.concatenate(x, 0) for x in zip(*prev))
            sampler_pre = ts.PermutationSampler(
                len(pool_pre[0]), cfg.batch_size, cfg.seed + epoch
            )
            pool_new = scene.updates["%05d" % view_idx]
            sampler_new = (
                ts.PermutationSampler(
                    len(pool_new[0]), cfg.batch_size, cfg.seed + epoch + 1
                )
                if len(pool_new[0]) > 0
                else None
            )
            n_iters_epoch = (
                _epoch_iters(len(pool_new[0]), cfg.batch_size) + n_iters_epoch1
            )
            # optimizer + schedule reset (text2nerf_main.py:523-528)
            decay_iters = n_iters_epoch * cfg.n_stage2
            factor = ts.lr_factor(cfg.lr_decay_target_ratio, decay_iters)
            state, tx = ts.make_train_state(
                state.params, cfg.lr_init, cfg.lr_basis, factor,
                runtime_decay=True,
            )
            step_fn = make_step(tx)
            stage_step = 0
            lr_decay = 1.0
        elif epoch == n_total and pool_new is not None:
            # stage 3: fold the last view's pool in (text2nerf_main.py:529-536)
            pool_pre = tuple(
                np.concatenate([a, b], 0) for a, b in zip(pool_pre, pool_new)
            )
            sampler_pre = ts.PermutationSampler(
                len(pool_pre[0]), cfg.batch_size, cfg.seed + epoch
            )
            pool_new = None
            sampler_s3 = build_stage3_sampler(n_views, cfg.seed + epoch + 7)
            n_iters_epoch = _epoch_iters(len(pool_pre[0]), cfg.batch_size)
            decay_iters = n_iters_epoch * max(cfg.n_stage3, 1)
            factor = ts.lr_factor(cfg.lr_decay_target_ratio, decay_iters)
            state, tx = ts.make_train_state(
                state.params, cfg.lr_init, cfg.lr_basis, factor,
                runtime_decay=True,
            )
            step_fn = make_step(tx)
            stage_step = 0
            lr_decay = 1.0

        # --- epoch ----------------------------------------------------------
        for it in range(n_iters_epoch):
            # coarse-to-fine grid upsampling (tensoRF.py:258-264 + the
            # lr_upsample_reset rule, e_opt.py:66-67)
            if cfg.upsamp_list and global_step in cfg.upsamp_list:
                # logarithmic voxel schedule from current to final count
                n_voxels = int(
                    np.exp(
                        np.linspace(
                            np.log(cfg.n_voxel_init),
                            np.log(cfg.n_voxel_final),
                            len(cfg.upsamp_list) + 1,
                        )
                    )[list(cfg.upsamp_list).index(global_step) + 1]
                )
                reso = tf.n_to_reso(n_voxels, aabb)
                params_up = tf.upsample_volume_grid(mcfg, state.params, reso)
                n_samples = tf.default_n_samples(
                    reso, mcfg.step_ratio, cfg.n_samples_cap
                )
                state, tx = ts.make_train_state(
                    params_up, cfg.lr_init, cfg.lr_basis, factor,
                    runtime_decay=True,
                )
                # lr_upsample_reset=False continues at the decayed LR
                # (TensoRF's rule): the runtime scalar carries the scale,
                # the compiled step is unchanged either way
                lr_decay = 1.0 if cfg.lr_upsample_reset else tv_decay
                step_fn = make_step(tx)
                stage_step = 0
            if (
                cfg.update_alphamask_list
                and global_step in cfg.update_alphamask_list
            ):
                # alpha-mask rebuild + AABB shrink on the first update
                # (tensorBase.py:346-370, tensoRF.py:266-303)
                reso_now = tf.grid_resolution(mcfg, state.params)
                mask_reso = tuple(min(r, 200) for r in reso_now)
                alpha_mask, new_aabb = tf.update_alpha_mask(
                    mcfg, state.params, aabb, mask_reso
                )
                if global_step == cfg.update_alphamask_list[0]:
                    if mcfg.model_name in ("vm_split", "cp"):
                        # the fused 'vm' variant has no shrink in the
                        # reference either (its cubic grid can't crop
                        # per-axis); only shrink resets the optimizer
                        params_sh, aabb, _ = tf.shrink(
                            mcfg, state.params, aabb, new_aabb
                        )
                        state, tx = ts.make_train_state(
                            params_sh, cfg.lr_init, cfg.lr_basis, factor,
                            runtime_decay=True,
                        )
                        stage_step = 0
                        lr_decay = 1.0
                    # TensoRF's L1_weight_rest rule: the L1 weight switches
                    # after the first alpha-mask update for EVERY
                    # decomposition (train.py upstream; e_opt.py:72-73)
                    weights = weights._replace(l1=cfg.l1_weight_rest)
                    step_fn = make_step(tx)
                # refilter the ray pools through the fresh mask — the
                # alpha branch of filtering_rays (tensorBase.py:372-404):
                # rays that never touch occupied space stop consuming
                # training iterations
                keep_pre = np.asarray(render_ops.filter_rays_alpha(
                    aabb, jnp.asarray(pool_pre[0]), alpha_mask
                ))
                if keep_pre.any() and not keep_pre.all():
                    pool_pre = tuple(p[keep_pre] for p in pool_pre)
                    sampler_pre = ts.PermutationSampler(
                        len(pool_pre[0]), cfg.batch_size, cfg.seed + global_step
                    )
                if pool_new is not None:
                    keep_new = np.asarray(render_ops.filter_rays_alpha(
                        aabb, jnp.asarray(pool_new[0]), alpha_mask
                    ))
                    if keep_new.any() and not keep_new.all():
                        pool_new = tuple(p[keep_new] for p in pool_new)
                        sampler_new = ts.PermutationSampler(
                            len(pool_new[0]), cfg.batch_size,
                            cfg.seed + global_step + 1,
                        )
            use_replay = (
                view_idx == 0 or it % 5 == 0 or epoch >= n_total
                or sampler_new is None
            )
            if use_replay:
                if sampler_s3 is not None and epoch >= n_total:
                    batch = sampler_s3.next_batch()
                else:
                    ids = sampler_pre.next_ids()
                    batch = _batch_from_pool(pool_pre, ids)
            else:
                ids = sampler_new.next_ids()
                batch = _batch_from_pool(pool_new, ids)
            key, k = jax.random.split(key)
            state, metrics = step_fn(
                state, aabb, batch, k, tv_decay, alpha_mask=train_mask_arg(),
                lr_decay=lr_decay,
            )
            tv_decay *= factor
            lr_decay *= factor
            global_step += 1
            stage_step += 1
            if global_step % max(cfg.progress_refresh_rate, 1) == 0:
                log.scalars(
                    global_step,
                    {m: float(metrics[m]) for m in ("psnr", "mse", "depth_loss")},
                )

        # --- periodic eval (text2nerf_main.py:618-625) -----------------------
        boundary = eval_boundary(
            epoch, cfg.n_stage1, cfg.n_stage2, cfg.eval_every_epochs
        )
        if boundary:
            eval_mask = rebuild_eval_mask()
        # support-view preview renders (evaluation(preview=True) over
        # all_rays_sprt_split, renderer.py:63-67 + text2nerf_main.py:
        # 619-621): no ground truth, written to imgs_vis_support_view
        if (
            boundary
            and cfg.vis_support_views
            and scene.rays_support_split is not None
            and len(scene.rays_support_split) > 0
        ):
            eval_renderer.evaluation(
                mcfg, state.params, aabb, scene.rays_support_split,
                scene.hw, n_samples=n_samples, gt_rgbs=None,
                save_path=os.path.join(logfolder, "imgs_vis_support_view"),
                prefix=f"epoch{epoch + 1:04d}_", chunk=cfg.batch_size,
                app_k=cfg.app_k, white_bg=white_bg, ndc=cfg.ndc_ray,
                push_depth=scene_cfg.push_depth, near_far=scene.near_far,
                alpha_mask=render_mask(),
                compact_k=cfg.eval_compact_k if eval_mask is not None else 0,
                eval_z_min=eval_z_floor(),
                n_vis=cfg.n_vis,
            )
        if boundary and scene.rgbs_gen_split.shape[0] > 0:
            res = eval_renderer.evaluation(
                mcfg, state.params, aabb,
                scene.rays_gen_split[: scene.rgbs_gen_split.shape[0]],
                scene.hw, n_samples=n_samples,
                gt_rgbs=scene.rgbs_gen_split,
                save_path=os.path.join(logfolder, "imgs_vis_inpaint_view"),
                prefix=f"epoch{epoch + 1:04d}_", chunk=cfg.batch_size,
                app_k=cfg.app_k, white_bg=white_bg, ndc=cfg.ndc_ray,
                push_depth=scene_cfg.push_depth, near_far=scene.near_far,
                alpha_mask=render_mask(),
                compact_k=cfg.eval_compact_k if eval_mask is not None else 0,
                eval_z_min=eval_z_floor(),
                n_vis=cfg.n_vis,
            )
            if res["psnr"]:
                log.scalars(global_step, {"eval_psnr": float(np.mean(res["psnr"]))})

        # --- periodic mid-stage resume checkpoint ---------------------------
        # (resume_every_epochs; the stage-boundary saves above cover view
        # transitions — this bounds the loss from an interruption inside a
        # long stage to N epochs)
        if (
            cfg.resume
            and cfg.resume_every_epochs > 0
            and (epoch + 1) % cfg.resume_every_epochs == 0
            and epoch + 1 < n_total + cfg.n_stage3
        ):
            ss.save_scene_snapshot(resume_snap, scene)
            loop_state = {
                "epoch": epoch + 1, "next_view": view_idx + 1,
                "tv_decay": tv_decay, "global_step": global_step,
                "stage_step": stage_step, "lr_decay": lr_decay,
            }
            if orbax:
                ckpt.save_orbax(resume_ckpt, mcfg, state.params, aabb,
                                loop_state=loop_state)
            else:
                ckpt.save_checkpoint(resume_ckpt, mcfg, state.params,
                                     aabb, loop_state=loop_state)

    # final mask: saved into the checkpoint (tensorBase.py:275-283 packs it)
    # and used by the final render passes below
    eval_mask = rebuild_eval_mask()
    final_compact_k = cfg.eval_compact_k if eval_mask is not None else 0
    ckpt.save_checkpoint(
        os.path.join(logfolder, f"{cfg.expname}_final.npz"),
        mcfg, state.params, aabb, alpha_mask=render_mask(),
        loop_state={"view_idx": view_idx, "global_step": global_step},
    )
    if orbax:
        ckpt.save_orbax(
            os.path.join(logfolder, f"{cfg.expname}_final"),
            mcfg, state.params, aabb,
            loop_state={"view_idx": view_idx, "global_step": global_step},
        )

    if cfg.render_train:
        # render every training view to imgs_train_all
        # (text2nerf_main.py:629-634: re-stacked train dataset + video)
        eval_renderer.evaluation(
            mcfg, state.params, aabb,
            scene.rays_gen_split[: scene.rgbs_gen_split.shape[0]],
            scene.hw, n_samples=n_samples,
            gt_rgbs=scene.rgbs_gen_split,
            save_path=os.path.join(logfolder, "imgs_train_all"),
            chunk=cfg.batch_size, app_k=cfg.app_k, white_bg=white_bg,
            ndc=cfg.ndc_ray, video=True,
            push_depth=scene_cfg.push_depth, near_far=scene.near_far,
            alpha_mask=render_mask(), compact_k=final_compact_k,
            eval_z_min=eval_z_floor(), n_vis=cfg.n_vis,
        )

    if cfg.render_test or cfg.render_path:
        test_scene = ss.bootstrap_scene(
            scene_cfg, "test",
            text2img=services.text2img, estimate_depth=services.estimate_depth,
        )
        if cfg.render_test:
            eval_renderer.evaluation(
                mcfg, state.params, aabb, test_scene.rays_gen_split,
                scene.hw, n_samples=n_samples,
                save_path=os.path.join(logfolder, "imgs_test_all"),
                chunk=cfg.batch_size, app_k=cfg.app_k, white_bg=white_bg,
                ndc=cfg.ndc_ray, video=True,
                push_depth=scene_cfg.push_depth, near_far=scene.near_far,
                alpha_mask=render_mask(), compact_k=final_compact_k,
                eval_z_min=eval_z_floor(), n_vis=cfg.n_vis,
            )
        if cfg.render_path:
            eval_renderer.evaluation_path(
                mcfg, state.params, aabb, test_scene.render_path, scene.hw,
                scene.intrinsic, n_samples=n_samples,
                save_path=os.path.join(logfolder, "imgs_path_all"),
                white_bg=white_bg, ndc=cfg.ndc_ray, near_far=scene.near_far,
                alpha_mask=render_mask(), compact_k=final_compact_k,
                eval_z_min=eval_z_floor(),
            )

    # drain THIS scene's asynchronous DIBR artifact writes before handing
    # the log tree to the caller (engine/io_async; scoped so concurrent
    # farm scenes neither wait on nor observe each other's writes)
    io_async.flush(logfolder)
    return mcfg, state.params, aabb, scene, logfolder


def render_test(cfg: TrainConfig, scene_cfg: ss.SceneConfig):
    """Render-only entry from a checkpoint (render_test,
    text2nerf_main.py:29-65)."""
    assert cfg.ckpt and os.path.exists(cfg.ckpt), "checkpoint required"
    mcfg, params, aabb, alpha_mask, _ = ckpt.load_checkpoint(cfg.ckpt)
    # a checkpointed alpha mask routes rendering through the compacted
    # fast path (PERF.md); -1 = the acc-gated adaptive-K renderer, which
    # never truncates an unsaturated ray below the top rung
    compact_k = -1 if alpha_mask is not None else 0
    scene = ss.bootstrap_scene(scene_cfg, "test")
    reso = tf.grid_resolution(mcfg, params)
    n_samples = tf.default_n_samples(reso, mcfg.step_ratio, cfg.n_samples_cap)
    logfolder = os.path.dirname(cfg.ckpt)
    # scene-aware eval z-cull: the trained scene's supervised floor (the
    # constant 2.0 erases supervised content below world z = 2 — see
    # supervised_z_floor); falls back to the reference constant when no
    # snapshot sits next to the checkpoint
    z_floor = 2.0
    snap = os.path.join(logfolder, "scene_snapshot.npz")
    if os.path.exists(snap):
        z_floor = ss.supervised_z_floor(
            ss.load_scene_snapshot(snap, n_views_pools=0))
    out = {}
    if cfg.render_test:
        out["test"] = eval_renderer.evaluation(
            mcfg, params, aabb, scene.rays_gen_split, scene.hw,
            n_samples=n_samples,
            save_path=os.path.join(logfolder, "imgs_test_all"),
            chunk=cfg.batch_size, app_k=cfg.app_k, white_bg=scene.white_bg,
            ndc=cfg.ndc_ray, video=True, push_depth=scene_cfg.push_depth,
            near_far=scene.near_far,
            alpha_mask=alpha_mask, compact_k=compact_k, eval_z_min=z_floor,
            n_vis=cfg.n_vis,
        )
    if cfg.render_path:
        out["path"] = eval_renderer.evaluation_path(
            mcfg, params, aabb, scene.render_path, scene.hw, scene.intrinsic,
            n_samples=n_samples,
            save_path=os.path.join(logfolder, "imgs_path_all"),
            white_bg=scene.white_bg, ndc=cfg.ndc_ray, near_far=scene.near_far,
            alpha_mask=alpha_mask, compact_k=compact_k, eval_z_min=z_floor,
        )
    return out
