"""Multi-scene farm: many prompts in parallel across the device mesh.

The reference's only scale-out is a thread-pool shelling one process per
(GPU, experiment) with mkdir locks (/root/reference/extra/
auto_run_paramsets.py:160-207).  The TPU-native design has two tiers:

- **Intra-host**: scenes are assigned round-robin to device subsets of the
  local mesh; each scene's train steps run on its own devices (jit with
  device placement), so an 8-chip v5e host fits 8 independent scenes
  (BASELINE.json config #5).
- **Multi-host**: `jax.distributed.initialize()` + process-indexed scene
  assignment over DCN; each host farm runs its shard of the prompt list.
  Idempotent completion markers on shared storage replace mkdir locks.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, List, Optional, Sequence

import jax


@dataclasses.dataclass
class FarmJob:
    prompt: str
    datadir: str
    logdir: str


def _marker(job: FarmJob) -> str:
    return os.path.join(job.logdir, "FARM_DONE.json")


#: phase-timer names (suffix match) whose time is HOST-side work during
#: which the scene's device sits idle: the seed bootstrap family
#: (bilateral filters + support warp pools + image IO, scene_state.py),
#: the native C++ DIBR hole fill, and the host-numpy support ray pools
#: (expansion.py).  render/inpaint/depth/merge phases are
#: device-dominated and excluded.
HOST_PHASE_SUFFIXES = (
    "bootstrap", "bootstrap_seed_image", "bootstrap_depth",
    "bootstrap_bilateral", "bootstrap_support_pool", "warmup_join",
    "dibr_holefill", "support_pool",
)


def collect_phase_times(logdir: str) -> dict:
    """Sum every ``phase/*_s`` scalar under ``logdir``'s metrics JSONLs.

    Returns {phase_name: seconds}.  Powers the farm's per-scene
    device-idle accounting: the engine's phase timers
    (engine/tracing.phase_timer) are written as ``phase/<name>_s``
    scalars into each scene's metrics.jsonl.
    """
    phases: dict = {}
    for root, _, files in os.walk(logdir):
        for fn in files:
            if fn != "metrics.jsonl":
                continue
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    try:
                        rec = json.loads(line)
                    except ValueError:
                        continue
                    for k, v in rec.items():
                        if k.startswith("phase/") and k.endswith("_s"):
                            name = k[len("phase/"):-2]
                            phases[name] = phases.get(name, 0.0) + float(v)
    return phases


def device_idle_seconds(phases: dict) -> float:
    """Host-side share of a scene's wall: seconds summed over the phases
    in HOST_PHASE_SUFFIXES (suffix match strips per-view tags like
    'view003_').  An upper-bound proxy for the scene's device idle time —
    the quantity that decides how far run_farm_parallel's wall is from
    'slowest scene' on a real v5e-8 (VERDICT r4 item 8).

    The aggregate 'bootstrap' timer WRAPS the bootstrap_* sub-phase
    timers (engine/tracing nests them); when sub-phases are present the
    parent is skipped so its children aren't double-counted (older logs
    without sub-phases still count the parent)."""
    has_boot_subs = any(
        k.endswith(HOST_PHASE_SUFFIXES) and "bootstrap_" in k for k in phases
    )
    total = 0.0
    for name, secs in phases.items():
        if not name.endswith(HOST_PHASE_SUFFIXES):
            continue
        if name.endswith("bootstrap") and has_boot_subs:
            continue
        total += secs
    return total


def claim_and_run(
    job: FarmJob, run: Callable[[FarmJob], dict], force: bool = False
) -> Optional[dict]:
    """Idempotent single-job execution with a completion marker (the
    lock-file role of getFolderLocker, auto_run_paramsets.py:7-19)."""
    os.makedirs(job.logdir, exist_ok=True)
    if os.path.exists(_marker(job)) and not force:
        with open(_marker(job)) as f:
            return json.load(f)
    t0 = time.time()
    result = run(job)
    result = dict(result or {})
    result["t_start"], result["t_end"] = t0, time.time()
    result["wall_s"] = result["t_end"] - t0
    result["prompt"] = job.prompt
    # per-scene device-idle accounting (VERDICT r4 item 8): host-side
    # phase seconds from the scene's own metrics.jsonl timers
    phases = collect_phase_times(job.logdir)
    if phases:
        result["device_idle_s"] = round(device_idle_seconds(phases), 3)
        result["phase_s"] = {k: round(v, 3) for k, v in phases.items()}
    with open(_marker(job), "w") as f:
        json.dump(result, f)
    return result


def run_farm(
    prompts: Sequence[str],
    base_datadir: str,
    base_logdir: str,
    run: Callable[[FarmJob], dict],
    distributed: bool = False,
) -> List[dict]:
    """Run one scene per prompt, sharded over hosts when distributed.

    ``run`` receives a FarmJob and should execute the full scene pipeline
    (e.g. a closure over engine.trainer.reconstruction with the prompt
    substituted).  With ``distributed`` the prompt list is strided by
    jax.process_index() so each host handles its share over DCN.
    """
    if distributed and jax.process_count() > 1:
        idx, count = jax.process_index(), jax.process_count()
    else:
        idx, count = 0, 1

    results = []
    for i, prompt in enumerate(prompts):
        if i % count != idx:
            continue
        tag = f"scene{i:03d}_{prompt.replace(' ', '_')[:48]}"
        job = FarmJob(
            prompt=prompt,
            datadir=os.path.join(base_datadir, tag),
            logdir=os.path.join(base_logdir, tag),
        )
        results.append(claim_and_run(job, run))
    return results


def run_farm_parallel(
    prompts: Sequence[str],
    base_datadir: str,
    base_logdir: str,
    run: Callable[[FarmJob], dict],
    devices=None,
    force: bool = False,
) -> List[dict]:
    """Intra-host scene parallelism for the FULL pipeline: one worker
    thread per device, each scene pinned to its own chip via
    ``jax.default_device``.

    Every jit program a scene issues — train steps, expansion renders,
    diffusion candidate batches, merge finetunes — dispatches to that
    scene's device, so the host drives all chips concurrently and the
    device wall-clock is ≈ the slowest scene, not the sum (the serial
    residue is the host-side share: bootstrap numpy work and the GIL).
    This is the threads+devices answer to the reference's
    process-per-GPU launcher (auto_run_paramsets.py:160-207) at full
    pipeline depth — run_farm() strides scenes across HOSTS; this
    parallelizes them WITHIN a host (BASELINE config #5 on one v5e-8).

    ``run`` must be thread-reentrant: anything stateful (services,
    merge nets) must be constructed inside it, per job — see
    progressive_runner(services_factory=...).

    Returns results in prompt order; each carries its device and
    wall_s (per-phase timings live in the scene's metrics.jsonl).
    """
    import queue
    import threading

    devices = list(devices if devices is not None else jax.local_devices())
    jobq: "queue.Queue" = queue.Queue()
    for i, prompt in enumerate(prompts):
        jobq.put((i, prompt))
    results: List[Optional[dict]] = [None] * len(prompts)
    errors: List[tuple] = []  # (index, prompt, exception)

    def worker(dev):
        while True:
            try:
                i, prompt = jobq.get_nowait()
            except queue.Empty:
                return
            tag = f"scene{i:03d}_{prompt.replace(' ', '_')[:48]}"
            job = FarmJob(
                prompt=prompt,
                datadir=os.path.join(base_datadir, tag),
                logdir=os.path.join(base_logdir, tag),
            )
            try:
                with jax.default_device(dev):
                    out = claim_and_run(job, run, force=force)
                out = dict(out or {})
                out["device"] = str(dev)
                results[i] = out
            except BaseException as e:  # noqa: BLE001 — surfaced below
                # keep draining: one scene's failure (a transient tunnel
                # flap, a bad prompt) must not abandon the queue's
                # remaining scenes on this device
                errors.append((i, prompt, e))

    threads = [
        threading.Thread(target=worker, args=(d,), daemon=True)
        for d in devices[: max(1, min(len(devices), len(prompts)))]
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        # completed scenes keep their FARM_DONE markers + results; raise
        # the first failure with the full roster attached so callers can
        # re-run just the failures (claim_and_run skips completed ones)
        i0, p0, e0 = errors[0]
        if len(errors) > 1:
            import logging

            for i_, p_, e_ in errors[1:]:
                logging.getLogger(__name__).error(
                    "farm scene %d (%r) also failed: %r", i_, p_, e_
                )
        e0.farm_failed = [(i_, p_) for i_, p_, _ in errors]
        e0.farm_results = results
        raise e0
    return [r for r in results if r is not None]


def progressive_runner(train_cfg, scene_cfg, services, exp_cfg,
                       eval_views: bool = True, services_factory=None):
    """Build a ``run(job)`` executing the FULL progressive text→3D
    pipeline (engine.trainer.reconstruction) for each farm job, with the
    job's prompt/datadir/logdir substituted into the base configs.

    This extends the farm beyond stage-1 fits: each job runs seed
    generation → depth → progressive warp/inpaint/align expansion → the
    3-stage schedule, exactly like the single-scene entry point — the
    multi-scene answer to BASELINE config #5 at full pipeline depth.
    Returns per-view reconstruction PSNRs in the completion marker.

    ``services_factory`` (0-arg callable) builds a FRESH services bundle
    per job — required with run_farm_parallel, where concurrent scenes
    must not share stateful services (merge-net finetune state)."""
    import dataclasses as dc

    def run(job: FarmJob) -> dict:
        import jax.numpy as jnp
        import numpy as np

        from ..engine import renderer as eval_renderer
        from ..engine import trainer
        from ..models import tensorf as tf

        job_services = (
            services_factory() if services_factory is not None else services
        )
        s_cfg = dc.replace(scene_cfg, prompt=job.prompt, datadir=job.datadir)
        t_cfg = dc.replace(train_cfg, basedir=job.logdir)
        e_cfg = dc.replace(exp_cfg, prompt=job.prompt)
        mcfg, params, aabb, scene, logfolder = trainer.reconstruction(
            t_cfg, s_cfg, job_services, e_cfg
        )
        out = {"logfolder": logfolder,
               "views": int(scene.poses_gen.shape[0])}
        if eval_views:
            from ..data import scene_state as _ss

            res = eval_renderer.evaluation(
                mcfg, params, jnp.asarray(aabb), scene.rays_gen_split,
                scene.hw,
                n_samples=tf.default_n_samples(
                    tf.grid_resolution(mcfg, params), mcfg.step_ratio
                ),
                gt_rgbs=scene.rgbs_gen_split, chunk=t_cfg.batch_size,
                app_k=t_cfg.app_k,
                # scene-aware floater cull (see supervised_z_floor): the
                # reference constant erases supervised content below z=2
                eval_z_min=_ss.supervised_z_floor(scene),
            )
            out["per_view_psnr"] = [round(float(p), 2) for p in res["psnr"]]
        return out

    return run


def fit_scenes_mesh(
    cfg,
    stacked_params,
    aabbs,
    pools,
    *,
    n_steps: int,
    batch_size: int,
    n_samples: int,
    mesh=None,
    axis: str = "scene",
    app_k: int = 16,
    white_bg: bool = True,
    lr_init: float = 0.02,
    lr_basis: float = 1e-3,
    factor: float = 1.0,
    seed: int = 0,
):
    """Mesh-native multi-scene fitting: S independent scenes, one per
    device (BASELINE config #5 — the v5e-8 shape).

    The train step is vmapped over a leading scene axis and every stacked
    array is sharded over the mesh's ``axis``; XLA partitions the program
    with zero collectives (scenes are independent), so each chip fits its
    own scene at full speed inside ONE jit program — the TPU answer to
    the reference's process-per-GPU launcher (auto_run_paramsets.py:
    160-207).

    Args:
      stacked_params: params pytree with a leading S axis on every leaf.
      aabbs: (S, 2, 3) scene bounds.
      pools: list of S (rays, rgbs, depth) numpy pools (equal lengths).
    Returns: (final stacked params, metrics dict of (n_steps, S) arrays).
    """
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..engine import train_step as ts

    n_scenes = aabbs.shape[0]
    if mesh is None:
        mesh = Mesh(np.array(jax.devices()[:n_scenes]), (axis,))
    shard = NamedSharding(mesh, P(axis))

    tx = ts.make_optimizer(
        jax.tree_util.tree_map(lambda x: x[0], stacked_params),
        lr_init, lr_basis, factor,
    )
    step_fn = ts.make_train_step(
        cfg, tx, n_samples=n_samples, app_k=app_k, white_bg=white_bg,
        microbatch=ts.effective_microbatch(batch_size, 32),
    )

    def one(state_params, opt_state, step, aabb, batch, rng):
        state = ts.TrainState(state_params, opt_state, step)
        new_state, metrics = step_fn(state, aabb, batch, rng)
        return new_state.params, new_state.opt_state, new_state.step, metrics

    vstep = jax.vmap(one)

    params = jax.device_put(stacked_params, shard)
    opt_state = jax.device_put(jax.vmap(tx.init)(stacked_params), shard)
    steps = jnp.zeros((n_scenes,), jnp.int32)
    aabbs = jax.device_put(jnp.asarray(aabbs), shard)

    samplers = [
        ts.PermutationSampler(len(p[0]), batch_size, seed + i)
        for i, p in enumerate(pools)
    ]
    key = jax.random.PRNGKey(seed)
    history = []
    for _ in range(n_steps):
        batch = {}
        picks = [s.next_ids() for s in samplers]
        for j, name in enumerate(("rays", "rgb", "depth")):
            batch[name] = jax.device_put(
                jnp.asarray(np.stack(
                    [pools[i][j][picks[i]] for i in range(n_scenes)])),
                shard,
            )
        key, *ks = jax.random.split(key, n_scenes + 1)
        params, opt_state, steps, metrics = vstep(
            params, opt_state, steps, aabbs, batch, jnp.stack(ks)
        )
        history.append(metrics)
    metrics = {
        k: np.stack([np.asarray(h[k]) for h in history])
        for k in history[0]
    }
    return params, metrics


def param_grid(**axes) -> List[dict]:
    """Cartesian-product experiment combos (get_param_list,
    auto_run_paramsets.py:28-67)."""
    import itertools

    keys = list(axes)
    combos = []
    for values in itertools.product(*(axes[k] for k in keys)):
        combos.append(dict(zip(keys, values)))
    return combos
