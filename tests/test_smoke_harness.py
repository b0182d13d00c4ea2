"""The real-weight smoke harness must run hermetically (fallback services)
end to end at tiny sizes, and report service resolution correctly."""

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_service_resolution_reporting(tmp_path):
    sys.path.insert(0, REPO)
    from tools.smoke_real_weights import service_resolution

    res = service_resolution(str(tmp_path / "nope"))
    assert set(res.values()) == {"fallback", "init"}
    os.makedirs(tmp_path / "w" / "stable-diffusion-2-1-base")
    os.makedirs(tmp_path / "w" / "leres")
    res = service_resolution(str(tmp_path / "w"))
    assert res["text2img"] == "real"
    assert res["depth"] == "real"
    assert res["inpaint"] == "fallback"


def test_harness_runs_hermetically(tmp_path, capsys):
    # in-process so the session jit cache is shared (a cold subprocess
    # pays every progressive-loop compile and takes ~9 min on one core)
    sys.path.insert(0, REPO)
    from tools.smoke_real_weights import main

    rc = main([
        "--weights", str(tmp_path / "absent"),
        "--out", str(tmp_path / "run"),
        "--hw", "48", "--views", "3", "--grid", "40",
        "--stages", "1", "1", "1", "--candidates", "2",
        "--merge_size", "64", "--merge_iters", "15",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    summary = lines[-1]
    assert summary["status"] == "ok"
    assert summary["services"]["text2img"] == "fallback"
    assert len(summary["per_view_psnr"]) == 3
    # micro sizes (48², 40³, 1-epoch stages) bound correctness, not
    # quality: every view must render finitely and not be garbage
    assert all(np.isfinite(p) and p > 5 for p in summary["per_view_psnr"]), summary
