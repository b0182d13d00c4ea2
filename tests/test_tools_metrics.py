"""Offline metrics CLI (tools/compute_metrics.py) + the interactive seed
confirm callback."""

import json
import os
import subprocess
import sys

import numpy as np

from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.services import fallbacks


def test_compute_metrics_cli(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    pred = tmp_path / "pred"
    gt = tmp_path / "gt"
    os.makedirs(pred)
    os.makedirs(gt)
    for i in range(2):
        img = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
        imageio.imwrite(str(gt / f"{i:03d}.png"), img)
        noisy = np.clip(img.astype(int) + rng.integers(-5, 6, img.shape), 0, 255)
        imageio.imwrite(str(pred / f"{i:03d}.png"), noisy.astype(np.uint8))

    out_json = tmp_path / "m.json"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "compute_metrics.py"),
         "--pred", str(pred), "--gt", str(gt), "--out", str(out_json)],
        capture_output=True, text=True, env=env, cwd=repo, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    result = json.load(open(out_json))
    assert result["n_images"] == 2
    assert 25 < result["psnr_mean"] < 60
    assert 0.5 < result["ssim_mean"] <= 1.0


def test_seed_confirm_callback(tmp_path):
    """The human quality gate (scene_gen.py:163-173) as a callback:
    regenerate until accepted."""
    hw = (24, 24)
    calls = []

    def confirm(img):
        calls.append(img.shape)
        return len(calls) >= 2  # reject the first candidate

    cfg = ss.SceneConfig(
        datadir=str(tmp_path / "d"), prompt="gate test", hw=hw,
        num_filter_iter=2, filter_size=(3, 3),
    )
    state = ss.bootstrap_scene(
        cfg, "train",
        text2img=lambda p, n="": fallbacks.procedural_text2img(p, n, hw=hw),
        estimate_depth=fallbacks.procedural_depth,
        auto_accept=False, confirm=confirm,
    )
    assert len(calls) == 2  # one rejection, one acceptance
    assert state.rgbs_gen_split.shape == (1, 24, 24, 3)
