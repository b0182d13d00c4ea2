"""The reference's DEFAULT scene size is num_training=24 (e_opt.py:54):
23 progressive expansions through the full pipeline.  Everything else in
the suite uses 2-4 views; this exercises the long-horizon state machine
(updates dict, trajectory generation, support pools, mask stamping) at
the reference's real view count — at micro sizes.
"""

import numpy as np


from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.engine import expansion, trainer
from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.services import fallbacks
from text2nerf_tpu.services.merge import DepthMergeService
from text2nerf_tpu.services.registry import Services


def test_full_pipeline_at_reference_default_24_views(tmp_path):
    hw = (16, 16)
    n_views = 24
    scene_cfg = ss.SceneConfig(
        datadir=str(tmp_path / "d"), prompt="24v test",
        pose_traj="circle0_60", num_training=n_views, hw=hw,
        num_filter_iter=2, filter_size=(3, 3),
    )
    train_cfg = trainer.TrainConfig(
        expname="v24", basedir=str(tmp_path / "log"),
        n_stage1=1, n_stage2=1, n_stage3=1, batch_size=128,
        n_voxel_init=8 ** 3, app_k=4, eval_every_epochs=10 ** 6, seed=24,
        vis_support_views=False,
        model=tf.TensoRFConfig(
            density_n_comp=(2, 2, 2), app_n_comp=(2, 2, 2), app_dim=6,
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
        merge_iters=1, chunk=128, app_k=4, trans_range=0.2,
    )
    mcfg, params, aabb, scene, logfolder = trainer.reconstruction(
        train_cfg, scene_cfg, services, exp_cfg
    )
    assert scene.rgbs_gen_split.shape[0] == n_views
    assert set(scene.updates) == {"%05d" % v for v in range(n_views)}
    assert np.isfinite(scene.depth_gen_split).all()
    for rays, rgbs, depths in scene.updates.values():
        assert len(rays) == len(rgbs) == len(depths)
    # circle0 is a pure-rotation pan (scene_util.py:257-277): all camera
    # centers coincide; the 24 ROTATIONS are distinct around the circle
    assert scene.poses_gen.shape == (n_views, 4, 4)
    rots = scene.poses_gen[:, :3, :3].reshape(n_views, -1)
    assert np.unique(np.round(rots, 4), axis=0).shape[0] == n_views
    np.testing.assert_allclose(
        scene.poses_gen[:, :3, 3], 0.0, atol=1e-6
    )
