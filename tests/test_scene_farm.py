"""Scene farm + blender loader tests."""

import json
import os

import numpy as np

from text2nerf_tpu.parallel import scene_farm as farm


def test_param_grid():
    combos = farm.param_grid(lr=[0.1, 0.2], bs=[4, 8, 16])
    assert len(combos) == 6
    assert {"lr": 0.1, "bs": 16} in combos


def test_farm_idempotent(tmp_path):
    calls = []

    def run(job):
        calls.append(job.prompt)
        return {"psnr": 30.0}

    prompts = ["a cat", "a dog"]
    r1 = farm.run_farm(prompts, str(tmp_path / "d"), str(tmp_path / "l"), run)
    assert len(r1) == 2 and len(calls) == 2
    # second run is served from completion markers
    r2 = farm.run_farm(prompts, str(tmp_path / "d"), str(tmp_path / "l"), run)
    assert len(calls) == 2
    assert r2[0]["psnr"] == 30.0 and r2[0]["prompt"] == "a cat"


def test_blender_loader(tmp_path):
    import imageio.v2 as imageio

    d = tmp_path / "scene"
    os.makedirs(d / "train")
    frames = []
    rng = np.random.default_rng(0)
    for i in range(3):
        img = (rng.uniform(0, 255, (32, 32, 4))).astype(np.uint8)
        imageio.imwrite(str(d / "train" / f"r_{i}.png"), img)
        c2w = np.eye(4)
        c2w[0, 3] = i * 0.1
        frames.append(
            {"file_path": f"train/r_{i}", "transform_matrix": c2w.tolist()}
        )
    with open(d / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)

    from text2nerf_tpu.data.blender import load_blender_scene

    state = load_blender_scene(str(d), "train")
    assert state.hw == (32, 32)
    assert state.poses_gen.shape == (3, 4, 4)
    assert state.all_rgbs.shape == (3 * 32 * 32, 3)
    assert 0 <= state.all_rgbs.min() and state.all_rgbs.max() <= 1
