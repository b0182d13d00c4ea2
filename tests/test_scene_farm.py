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


def test_fit_scenes_mesh_one_scene_per_device():
    """BASELINE config #5 shape: 8 independent scenes, one per device of
    the virtual v5e-8 mesh, fitted inside one vmapped+sharded jit
    program."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.ops import rays as R

    n_scenes = 8
    cfg = tf.TensoRFConfig(
        density_n_comp=(2, 2, 2), app_n_comp=(4, 4, 4), app_dim=6,
        fea_pe=2, feature_c=16,
    )
    aabb = np.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]], np.float32)
    reso = (24, 24, 24)

    params = [
        tf.init_params(jax.random.PRNGKey(i), cfg, reso)
        for i in range(n_scenes)
    ]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *params
    )

    # one 16x16 forward-looking view per scene: a colored wall whose color
    # and depth differ per scene (test_train_step.py toy-scene pattern)
    h = w = 16
    fx, fy, cx, cy = R.default_intrinsics(h, w)
    dirs = R.ray_directions(h, w, (fx, fy), (cx, cy))
    o, d = R.rays_from_pose(jnp.asarray(dirs), jnp.eye(4))
    rays = np.asarray(jnp.concatenate([o, d], -1)).reshape(-1, 6)
    uv = np.asarray(dirs).reshape(-1, 3)[:, :2]
    pools = []
    for i in range(n_scenes):
        base = (i + 1) / (n_scenes + 1)
        rgb = np.stack(
            [base + 0.3 * uv[:, 0], 0.5 + 0.4 * uv[:, 1],
             1.0 - base + 0 * uv[:, 0]], -1,
        ).astype(np.float32)
        depth = np.full((h * w,), 4.0 + 0.2 * i, np.float32)
        pools.append((rays, rgb, depth))

    stacked_aabbs = np.repeat(aabb[None], n_scenes, 0)
    final, metrics = farm.fit_scenes_mesh(
        cfg, stacked, stacked_aabbs, pools,
        n_steps=40, batch_size=128, n_samples=48, app_k=16,
        factor=1.0,
    )
    # every scene's fit improved
    psnr = metrics["psnr"]
    assert psnr.shape == (40, n_scenes)
    assert (psnr[-1] > psnr[0] + 1.0).all(), (psnr[0], psnr[-1])
    # arrays really live sharded over the 8 devices
    leaf = jax.tree_util.tree_leaves(final)[0]
    assert isinstance(leaf.sharding, NamedSharding)
    assert len(leaf.sharding.device_set) == 8


def test_progressive_runner_farms_full_scenes(tmp_path):
    """run_farm + progressive_runner: TWO full progressive text->3D scenes
    (seed gen -> expansion -> 3-stage fit) at micro sizes, idempotent on
    the second pass."""
    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.engine import expansion, trainer
    from text2nerf_tpu.services import fallbacks
    from text2nerf_tpu.services.merge import DepthMergeService
    from text2nerf_tpu.services.registry import Services

    hw = (40, 40)
    scene_cfg = ss.SceneConfig(
        datadir="", prompt="", pose_traj="circle0_60", num_training=2, hw=hw,
    )
    train_cfg = trainer.TrainConfig(
        expname="farm", basedir="", n_stage1=1, n_stage2=1, n_stage3=1,
        batch_size=512, n_voxel_init=32 ** 3, app_k=16,
        eval_every_epochs=10 ** 6, seed=3,
    )
    services = Services(
        text2img=lambda p, n="": fallbacks.procedural_text2img(p, n, hw=hw),
        inpaint=fallbacks.diffusion_fill_inpaint,
        estimate_depth=fallbacks.procedural_depth,
        rank=fallbacks.histogram_rank,
        merge=DepthMergeService(net_size=64, num_downs=6),
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt="", n_candidates=2, candidates_per_round=2, merge_iters=10,
        chunk=512, app_k=16,
    )
    run = farm.progressive_runner(train_cfg, scene_cfg, services, exp_cfg)
    prompts = ["a tiny red room", "a tiny blue room"]
    r = farm.run_farm(prompts, str(tmp_path / "d"), str(tmp_path / "l"), run)
    assert len(r) == 2
    for res in r:
        assert res["views"] == 2
        assert len(res["per_view_psnr"]) == 2
        assert all(np.isfinite(p) for p in res["per_view_psnr"])
        assert os.path.exists(os.path.join(res["logfolder"], "metrics.jsonl"))
    # idempotent: second pass served from markers (wall unchanged)
    r2 = farm.run_farm(prompts, str(tmp_path / "d"), str(tmp_path / "l"), run)
    assert r2[0]["wall_s"] == r[0]["wall_s"]


def test_run_farm_parallel_eight_scenes(tmp_path):
    """VERDICT r2 item 2: EIGHT full progressive scenes through the
    intra-host parallel farm on the virtual 8-device mesh — every scene
    pinned to its own device, per-phase timings recorded, results
    idempotent.  (On real chips the device wall is ≈ the slowest scene;
    the hermetic CPU run validates structure: distinct per-scene devices
    and complete per-phase logs.)"""
    import jax

    from text2nerf_tpu.data import scene_state as ss
    from text2nerf_tpu.engine import expansion, trainer
    from text2nerf_tpu.models import tensorf as tf
    from text2nerf_tpu.services import fallbacks
    from text2nerf_tpu.services.merge import DepthMergeService
    from text2nerf_tpu.services.registry import Services

    hw = (24, 24)
    scene_cfg = ss.SceneConfig(
        datadir="", prompt="", pose_traj="circle0_60", num_training=2, hw=hw,
        num_filter_iter=2, filter_size=(3, 3),
    )
    train_cfg = trainer.TrainConfig(
        expname="pfarm", basedir="", n_stage1=1, n_stage2=1, n_stage3=1,
        batch_size=256, n_voxel_init=16 ** 3, app_k=8,
        eval_every_epochs=10 ** 6, seed=5,
        model=tf.TensoRFConfig(
            density_n_comp=(2, 2, 2), app_n_comp=(4, 4, 4), app_dim=6,
            fea_pe=2, feature_c=16,
        ),
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt="", n_candidates=1, candidates_per_round=1, merge_iters=2,
        chunk=256, app_k=8,
    )

    def services_factory():
        # fresh bundle per scene: stateful merge nets must not be shared
        # across concurrent scene threads
        return Services(
            text2img=lambda p, n="": fallbacks.procedural_text2img(
                p, n, hw=hw),
            inpaint=fallbacks.diffusion_fill_inpaint,
            estimate_depth=fallbacks.procedural_depth,
            rank=fallbacks.histogram_rank,
            merge=DepthMergeService(net_size=64, num_downs=6),
        )

    run = farm.progressive_runner(
        train_cfg, scene_cfg, None, exp_cfg,
        services_factory=services_factory,
    )
    prompts = [f"tiny room {i}" for i in range(8)]
    results = farm.run_farm_parallel(
        prompts, str(tmp_path / "d"), str(tmp_path / "l"), run,
        devices=jax.devices(),
    )
    assert len(results) == 8
    devices_used = {r["device"] for r in results}
    assert len(devices_used) == 8, devices_used  # one scene per device
    for res in results:
        assert res["views"] == 2
        assert all(np.isfinite(p) for p in res["per_view_psnr"])
        # per-phase device-utilization record (phase/expand_view_*_s etc.)
        mpath = os.path.join(res["logfolder"], "metrics.jsonl")
        phases = [
            json.loads(l) for l in open(mpath) if "phase/" in l
        ]
        assert any(
            any(k.startswith("phase/expand_view") for k in p)
            for p in phases
        ), f"no expansion phase timing in {mpath}"
        # device-idle accounting (VERDICT r4 item 8): every scene reports
        # its host-side phase seconds + start/end stamps so a real-v5e-8
        # run can measure the serial residue (overlap = sum(wall)/span)
        assert res["device_idle_s"] >= 0
        assert res["phase_s"].get("bootstrap", 0) > 0
        assert res["t_end"] > res["t_start"]
    span = max(r["t_end"] for r in results) - min(
        r["t_start"] for r in results
    )
    overlap = sum(r["wall_s"] for r in results) / span
    idle_share = sum(r["device_idle_s"] for r in results) / sum(
        r["wall_s"] for r in results
    )
    # 1-core CI can't show 8x overlap — just record the two quantities a
    # real run compares (printed into the test log for the baseline)
    print(f"farm overlap={overlap:.2f}x device_idle_share={idle_share:.3f}")
    assert 0.0 <= idle_share <= 1.0
    # second pass is served from completion markers (idempotent)
    r2 = farm.run_farm_parallel(
        prompts, str(tmp_path / "d"), str(tmp_path / "l"), run,
        devices=jax.devices(),
    )
    assert r2[0]["wall_s"] == results[0]["wall_s"]


def test_run_farm_parallel_survives_one_failed_scene(tmp_path):
    """One scene's failure must not abandon the device's remaining queue
    (review r3): the others complete (markers + results preserved) and
    the raised error carries the failure roster + partial results."""
    import jax
    import pytest

    from text2nerf_tpu.parallel import scene_farm as sf

    def run(job):
        if "bad" in job.prompt:
            raise RuntimeError("boom")
        return {"ok": True, "prompt": job.prompt}

    with pytest.raises(RuntimeError, match="boom") as ei:
        sf.run_farm_parallel(
            ["a good scene", "a bad scene", "another good scene"],
            str(tmp_path / "d"), str(tmp_path / "l"), run,
            devices=[jax.devices()[0]],  # ONE worker drains all three
        )
    assert ei.value.farm_failed == [(1, "a bad scene")]
    done = [r for r in ei.value.farm_results if r]
    assert len(done) == 2 and all(r["ok"] for r in done)
    # completed scenes keep their markers → a re-run skips them
    import os

    markers = []
    for root, _, files in os.walk(tmp_path / "l"):
        markers += [f for f in files if "FARM_DONE" in f or "done" in f.lower()]
    assert len(markers) == 2
