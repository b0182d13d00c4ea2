"""Hermetic end-to-end test of the progressive text→3D pipeline.

Runs the full reconstruction loop at tiny scale with the procedural
fallback services (no pretrained weights, no network): bootstrap from a
prompt, stage-1 fit, two scene expansions (warp→inpaint→depth-align→merge),
stage-3 consolidation, checkpoint save/load, render-only entry.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.engine import trainer, expansion, checkpoints
from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.services import fallbacks
from text2nerf_tpu.services.merge import DepthMergeService
from text2nerf_tpu.services.registry import Services


def _tiny_services(hw):
    return Services(
        text2img=lambda p, n="": fallbacks.procedural_text2img(p, n, hw=hw),
        inpaint=fallbacks.diffusion_fill_inpaint,
        estimate_depth=fallbacks.procedural_depth,
        rank=fallbacks.histogram_rank,
        merge=DepthMergeService(net_size=128, num_downs=7),
    )


@pytest.fixture(scope="module")
def e2e_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("scene")
    hw = (48, 48)
    scene_cfg = ss.SceneConfig(
        datadir=str(root / "data"), prompt="a tiny test garden",
        pose_traj="circle0_30", num_training=3, hw=hw,
        num_filter_iter=2, filter_size=(3, 3),
    )
    train_cfg = trainer.TrainConfig(
        expname="t", basedir=str(root / "log"),
        n_stage1=2, n_stage2=1, batch_size=512,
        n_voxel_init=24 ** 3, app_k=16, eval_every_epochs=1000,
        seed=7,
        model=tf.TensoRFConfig(
            density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
            fea_pe=2, feature_c=32,
        ),
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt=scene_cfg.prompt, n_candidates=2, candidates_per_round=2,
        merge_iters=3, chunk=512, app_k=16, trans_range=0.2,
    )
    services = _tiny_services(hw)
    result = trainer.reconstruction(train_cfg, scene_cfg, services, exp_cfg)
    return result, train_cfg, scene_cfg


def test_pipeline_produces_all_views(e2e_run):
    (mcfg, params, aabb, scene, logfolder), _, _ = e2e_run
    # 3 trajectory views: seed + 2 expansions
    assert scene.rgbs_gen_split.shape[0] == 3
    assert scene.depth_gen_split.shape[0] == 3
    assert set(scene.updates) == {"00000", "00001", "00002"}
    # generated depth is metric-plausible (around push_depth=2)
    assert 0.5 < scene.depth_gen_split[1].mean() < 8.0


def test_pipeline_writes_artifacts(e2e_run):
    (_, _, _, _, logfolder), _, _ = e2e_run
    dibr = os.path.join(logfolder, "DIBR")
    for sub in ("warped", "mask", "mask_inv", "rendered", "rgbs", "depth"):
        assert os.path.isdir(os.path.join(dibr, sub)), sub
    assert os.path.isfile(os.path.join(dibr, "rgbs", "00001.png"))
    assert os.path.isfile(os.path.join(logfolder, "metrics.jsonl"))
    # support-split preview renders at stage boundaries
    # (imgs_vis_support_view, text2nerf_main.py:619-621)
    sup = os.path.join(logfolder, "imgs_vis_support_view", "rgbs")
    assert os.path.isdir(sup), "support-view eval renders missing"
    assert any(f.endswith("_rgb.png") for f in os.listdir(sup))


def test_checkpoint_roundtrip(e2e_run):
    (mcfg, params, aabb, scene, logfolder), train_cfg, _ = e2e_run
    path = os.path.join(logfolder, "t_final.npz")
    assert os.path.isfile(path)
    cfg2, params2, aabb2, alpha, loop_state = checkpoints.load_checkpoint(path)
    assert cfg2 == mcfg
    np.testing.assert_allclose(np.asarray(aabb2), np.asarray(aabb))
    for a, b in zip(
        params["density_planes"], params2["density_planes"]
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(params["mlp"]["w1"]), np.asarray(params2["mlp"]["w1"])
    )
    assert loop_state["view_idx"] == 2


def test_render_only_from_checkpoint(e2e_run, tmp_path):
    (_, _, _, _, logfolder), train_cfg, scene_cfg = e2e_run
    import dataclasses

    cfg = dataclasses.replace(
        train_cfg, ckpt=os.path.join(logfolder, "t_final.npz"),
        render_test=True, render_path=False, batch_size=512,
    )
    out = trainer.render_test(cfg, scene_cfg)
    assert "test" in out
    assert len(out["test"]["rgb"]) > 0
    assert os.path.isfile(
        os.path.join(logfolder, "imgs_test_all", "video.mp4")
    ) or os.path.isdir(os.path.join(logfolder, "imgs_test_all"))


def test_training_improves_over_seed_view(e2e_run):
    """After the full loop the field reproduces the seed view reasonably."""
    (mcfg, params, aabb, scene, _), train_cfg, _ = e2e_run
    from text2nerf_tpu.engine import renderer as R

    res = R.evaluation(
        mcfg, params, jnp.asarray(aabb), scene.rays_gen_split[:1], scene.hw,
        n_samples=tf.default_n_samples(
            tf.grid_resolution(mcfg, params), mcfg.step_ratio
        ),
        gt_rgbs=scene.rgbs_gen_split[:1], chunk=512, app_k=16,
    )
    assert res["psnr"][0] > 14.0, res["psnr"]
