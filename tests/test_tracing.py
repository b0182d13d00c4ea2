"""Observability: JSONL metrics logger, phase timers, profiler wrapper
(engine/tracing.py — the reference's only instrumentation was tqdm +
TensorBoard scalars, SURVEY §5)."""

import json
import os
import time

from text2nerf_tpu.engine import tracing


def test_metrics_logger_roundtrip(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = tracing.MetricsLogger(path)
    log.scalars(0, {"psnr": 21.5, "mse": 0.007})
    log.scalars(50, {"psnr": 25.0})
    log.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["step"] == 0 and rows[0]["psnr"] == 21.5
    assert rows[1]["step"] == 50
    assert all("t" in r for r in rows)  # wall timestamps recorded


def test_metrics_logger_noop_without_path():
    log = tracing.MetricsLogger(None)
    log.scalars(0, {"x": 1.0})  # must not raise
    log.close()


def test_phase_timer_logs_duration(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    log = tracing.MetricsLogger(path)
    with tracing.phase_timer("warp", log):
        time.sleep(0.05)
    log.close()
    row = json.loads(open(path).readline())
    assert row["phase/warp_s"] >= 0.05


def test_profile_trace_disabled_is_noop(tmp_path):
    with tracing.profile_trace(str(tmp_path / "prof"), enabled=False):
        pass
    assert not os.path.exists(str(tmp_path / "prof")) or not os.listdir(
        str(tmp_path / "prof")
    )
