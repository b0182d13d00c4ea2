"""Multi-host (2-process jax.distributed) farm + DCN-sharded fit test.

Launches two REAL processes with jax.distributed.initialize over a local
coordinator; each runs run_farm(distributed=True) (process-strided scene
assignment, scene_farm.py:71-87 — the reference's surface is
extra/auto_run_paramsets.py:160-207) and one train step whose batch is
sharded across the global 2-process mesh, so the gradient reduction
crosses the process boundary (Gloo stands in for DCN on CPU).
"""

import json
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_farm(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = dict(os.environ)
    # fresh processes must not inherit this process's axon/pjrt setup or
    # the 8-device XLA flags from conftest (the worker sets its own)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]

    reports = []
    for i in range(2):
        with open(tmp_path / f"out_p{i}.json") as f:
            reports.append(json.load(f))

    # both processes saw the global 4-device (2x2) topology
    assert all(r["n_global_devices"] == 4 for r in reports)
    # disjoint, complete scene assignment: proc 0 gets 0,2,4; proc 1 gets 1,3
    s0, s1 = set(reports[0]["scenes"]), set(reports[1]["scenes"])
    assert s0 == {"scene prompt 0", "scene prompt 2", "scene prompt 4"}
    assert s1 == {"scene prompt 1", "scene prompt 3"}
    assert not (s0 & s1)
    # each process only ran (and reported) its own jobs
    assert reports[0]["result_procs"] == [0]
    assert reports[1]["result_procs"] == [1]
    # the cross-process sharded fit step produced identical finite loss
    import math

    assert math.isfinite(reports[0]["mse"])
    assert reports[0]["mse"] == reports[1]["mse"]
