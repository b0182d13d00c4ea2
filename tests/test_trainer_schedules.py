"""Coarse-to-fine + alpha-mask schedules in the trainer (tiny scale)."""

import numpy as np
import jax
import jax.numpy as jnp

from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.engine import trainer, expansion
from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.services import fallbacks
from text2nerf_tpu.services.merge import DepthMergeService
from text2nerf_tpu.services.registry import Services


def test_upsample_schedule_grows_grid(tmp_path):
    hw = (32, 32)
    scene_cfg = ss.SceneConfig(
        datadir=str(tmp_path / "d"), prompt="upsample test",
        pose_traj="circle0_20", num_training=2, hw=hw,
        num_filter_iter=2, filter_size=(3, 3), use_support_set=False,
    )
    train_cfg = trainer.TrainConfig(
        expname="u", basedir=str(tmp_path / "log"),
        n_stage1=2, n_stage2=1, n_stage3=2, batch_size=256,
        n_voxel_init=12 ** 3, n_voxel_final=20 ** 3,
        upsamp_list=(4,), update_alphamask_list=(8,),
        # integration of the stage-3 tail rebalance with the c2f schedule
        # (unit coverage: test_stage3_balance.py)
        stage3_balance="tail_deficit", stage3_balance_gamma=2.0,
        app_k=8, eval_every_epochs=1000, seed=3,
        model=tf.TensoRFConfig(
            density_n_comp=(2, 2, 2), app_n_comp=(4, 4, 4), app_dim=6,
            fea_pe=2, feature_c=16,
        ),
    )
    services = Services(
        text2img=lambda p, n="": fallbacks.procedural_text2img(p, n, hw=hw),
        inpaint=fallbacks.diffusion_fill_inpaint,
        estimate_depth=fallbacks.procedural_depth,
        rank=fallbacks.histogram_rank,
        merge=DepthMergeService(net_size=64, num_downs=6),
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt=scene_cfg.prompt, n_candidates=1, candidates_per_round=1,
        merge_iters=2, chunk=256, app_k=8, use_support_set=False,
    )
    mcfg, params, aabb, scene, _ = trainer.reconstruction(
        train_cfg, scene_cfg, services, exp_cfg
    )
    reso = tf.grid_resolution(mcfg, params)
    # grid grew past the initial 12^3 (upsample), and the alpha-mask shrink
    # may have trimmed it; it must exceed the initial resolution
    assert min(reso) > 12, reso
    assert np.all(np.isfinite(np.asarray(aabb)))


def test_eval_boundary_never_fires_mid_stage1():
    """Python's floored modulo made the stage-2 view-boundary term fire
    mid-stage-1 ((10-50) % 20 == 0), handing train compaction a mask
    built from the half-trained seed field (review r3)."""
    from text2nerf_tpu.engine.trainer import eval_boundary

    n1, n2, every = 50, 20, 10 ** 6
    fired = [e for e in range(120) if eval_boundary(e, n1, n2, every)]
    # stage-1 end (epoch 49) and the view boundaries past it — nothing else
    assert fired == [49, 69, 89, 109]
    # eval_every-triggered mid-stage-1 evals still fire
    assert eval_boundary(9, n1, n2, 10)
    # local fit (n_stage2=0): only eval_every and stage-1 end
    assert [e for e in range(60) if eval_boundary(e, 50, 0, 25)] == [24, 49]
