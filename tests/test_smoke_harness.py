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


def test_registry_reports_actual_resolution(tmp_path):
    """default_services fills Services.resolution with what it ACTUALLY
    built — the smoke harness asserts this against the weights-tree
    prediction (VERDICT r2: the real-weights path must flip visibly)."""
    sys.path.insert(0, REPO)
    from text2nerf_tpu.services.registry import default_services

    s = default_services(weights_dir=None, hw=(32, 32), merge_net_size=64,
                         merge_num_downs=4)
    assert s.resolution == {
        "text2img": "fallback", "inpaint": "fallback", "depth": "fallback",
        "rank": "fallback", "merge": "init",
    }


def test_lpips_absence_warns_once(tmp_path):
    """Missing LPIPS weights produce ONE loud warning, not a silent pass
    (VERDICT r2; engine/renderer previously swallowed the exception)."""
    import warnings

    from text2nerf_tpu.engine import renderer as R

    R._lpips_warned = False  # reset the once-latch for this test
    img = np.zeros((16, 16, 3), np.float32)
    missing = str(tmp_path / "no_lpips_weights")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert R._lpips_or_warn(img, img, "alex", missing) is None
        assert R._lpips_or_warn(img, img, "alex", missing) is None
    msgs = [w for w in caught if "LPIPS unavailable" in str(w.message)]
    assert len(msgs) == 1, [str(w.message) for w in caught]
