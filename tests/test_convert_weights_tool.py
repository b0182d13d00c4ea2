"""convert_weights CLI: absent families skip cleanly; present-but-broken
checkpoints fail loudly (exit 1)."""

import json
import os
import subprocess
import sys

import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_weights.py"),
         *args],
        capture_output=True, text=True, cwd=REPO, env=env,
    )


def test_empty_weights_dir_all_absent(tmp_path):
    r = _run(["--weights", str(tmp_path)])
    assert r.returncode == 0, r.stderr[-500:]
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    assert {l["family"] for l in lines} >= {
        "stable-diffusion-2-1-base", "stable-diffusion-2-inpainting",
        "leres_res101", "midas_v21", "sgrnet", "merge_model_sc",
        "clip-vit-base-patch32",
    }
    assert all(l["status"] == "absent" for l in lines)


def test_broken_checkpoint_fails_loudly(tmp_path):
    leres = tmp_path / "leres"
    leres.mkdir()
    torch.save({"depth_model": {"module.bogus": torch.zeros(1)}},
               leres / "res101.pth")
    r = _run(["--weights", str(tmp_path)])
    assert r.returncode == 1
    lines = [json.loads(l) for l in r.stdout.splitlines() if l.startswith("{")]
    by = {l["family"]: l for l in lines}
    assert by["leres_res101"]["status"] == "error"
    assert "mismatch" in by["leres_res101"]["detail"]
