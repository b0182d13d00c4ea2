"""Worker for the 2-process jax.distributed farm test (launched by
tests/test_multihost.py, one subprocess per simulated host).

Covers the multi-host tier the reference approximates with a
process-per-GPU shell launcher (/root/reference/extra/
auto_run_paramsets.py:160-207): process-strided scene assignment
(run_farm(distributed=True)) plus one train step whose ray batch is
sharded over a global mesh spanning BOTH processes, so the gradient
all-reduce actually crosses the process boundary (the DCN stand-in on
CPU is Gloo).
"""

import json
import os
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
workdir = sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from text2nerf_tpu.engine import train_step as ts  # noqa: E402
from text2nerf_tpu.models import tensorf as tf  # noqa: E402
from text2nerf_tpu.parallel import mesh as pmesh  # noqa: E402
from text2nerf_tpu.parallel import scene_farm  # noqa: E402

# --- process-strided scene assignment (scene_farm.py:71-87) ---------------
prompts = [f"scene prompt {i}" for i in range(5)]
ran = []


def run(job):
    ran.append(job.prompt)
    return {"proc": jax.process_index()}


results = scene_farm.run_farm(
    prompts,
    os.path.join(workdir, "data"),
    os.path.join(workdir, f"log_p{pid}"),
    run,
    distributed=True,
)

# --- one DCN-sharded fit step over the global (2-process) mesh ------------
cfg = tf.TensoRFConfig(
    density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
    fea_pe=2, feature_c=32,
)
grid = (16, 16, 16)
aabb = jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]])
params = tf.init_params(jax.random.PRNGKey(0), cfg, grid)

mesh = pmesh.make_mesh(data=len(jax.devices()), model=1)
with mesh:
    params = pmesh.shard_params(params, mesh)
    state, tx = ts.make_train_state(params, factor=ts.lr_factor(0.1, 100))
    step = ts.make_train_step(cfg, tx, n_samples=16, app_k=8, microbatch=1)

    b = 8 * len(jax.devices())
    rng = np.random.default_rng(0)
    d = rng.normal(size=(b, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    batch = pmesh.shard_batch(
        {
            "rays": jnp.asarray(
                np.concatenate([np.zeros((b, 3), np.float32), d], -1)
            ),
            "rgb": jnp.asarray(rng.uniform(0, 1, (b, 3)).astype(np.float32)),
            "depth": jnp.full((b,), 4.0, jnp.float32),
        },
        mesh,
    )
    state, metrics = step(state, aabb, batch, jax.random.PRNGKey(1))
    mse = float(metrics["mse"])

out = {
    "proc": pid,
    "n_global_devices": len(jax.devices()),
    "scenes": sorted(ran),
    "result_procs": sorted({r["proc"] for r in results}),
    "mse": mse,
}
with open(os.path.join(workdir, f"out_p{pid}.json"), "w") as f:
    json.dump(out, f)
print("worker", pid, "ok", flush=True)
