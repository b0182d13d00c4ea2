"""The update_known_views branch: new content propagates into known views
(text2nerf_main.py:300-377), end-to-end at tiny scale."""

import numpy as np

from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.engine import trainer, expansion
from text2nerf_tpu.models import tensorf as tf
from text2nerf_tpu.services import fallbacks
from text2nerf_tpu.services.merge import DepthMergeService
from text2nerf_tpu.services.registry import Services


def test_update_known_views_branch(tmp_path):
    hw = (32, 32)
    scene_cfg = ss.SceneConfig(
        datadir=str(tmp_path / "d"), prompt="ukv test",
        pose_traj="circle0_40", num_training=3, hw=hw,
        num_filter_iter=2, filter_size=(3, 3),
    )
    train_cfg = trainer.TrainConfig(
        expname="u", basedir=str(tmp_path / "log"),
        n_stage1=1, n_stage2=1, batch_size=256,
        n_voxel_init=16 ** 3, app_k=8, eval_every_epochs=1000, seed=9,
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
        merge_iters=2, chunk=256, app_k=8, trans_range=0.2,
        update_known_views=True,
    )
    mcfg, params, aabb, scene, logfolder = trainer.reconstruction(
        train_cfg, scene_cfg, services, exp_cfg
    )
    # all views produced, pools for every view present (including rebuilt
    # pools for back-updated known views)
    assert scene.rgbs_gen_split.shape[0] == 3
    assert set(scene.updates) == {"00000", "00001", "00002"}
    # the back-updated views' merged depths stay finite and every view's
    # rebuilt pool is internally consistent on the fully-expanded scene
    assert np.isfinite(scene.depth_gen_split).all()
    for k, (rays, rgbs, depths) in scene.updates.items():
        assert len(rays) == len(rgbs) == len(depths)
    # mask expansion (text2nerf_main.py:146-163): update_known_views mode
    # erodes the known mask and writes the *_expand artifact set
    import os

    from text2nerf_tpu.engine import io_async

    io_async.flush()
    for v in (1, 2):
        for sub in ("mask", "mask_inv", "warped"):
            p = os.path.join(logfolder, "DIBR", sub, "%05d_expand.png" % v)
            assert os.path.isfile(p), p


def test_update_known_views_writes_support_artifacts(tmp_path):
    """When new content lands in a known view, the pre/post-warp artifacts
    are written under DIBR/rgbs_support/%05d_warp2known
    (text2nerf_main.py:320-326)."""
    import os

    from text2nerf_tpu.engine.expansion import _update_known_views

    hw = (32, 32)
    scene_cfg = ss.SceneConfig(
        datadir=str(tmp_path / "d"), prompt="ukv artifacts",
        pose_traj="circle0_40", num_training=2, hw=hw,
        num_filter_iter=2, filter_size=(3, 3),
    )
    scene = ss.bootstrap_scene(
        scene_cfg, "train",
        text2img=lambda p, n="": fallbacks.procedural_text2img(p, n, hw=hw),
        estimate_depth=fallbacks.procedural_depth,
    )
    services = Services(
        text2img=lambda p, n="": fallbacks.procedural_text2img(p, n, hw=hw),
        inpaint=fallbacks.diffusion_fill_inpaint,
        estimate_depth=fallbacks.procedural_depth,
        rank=fallbacks.histogram_rank,
        merge=DepthMergeService(net_size=64, num_downs=6),
    )
    exp_cfg = expansion.ExpansionConfig(
        prompt="x", merge_iters=2, chunk=256, app_k=8,
        update_known_views=True,
    )
    img_new = np.random.default_rng(0).uniform(
        0, 1, (32, 32, 3)).astype(np.float32)
    depth_new = np.full((32, 32), 3.0, np.float32)
    # a big central hole = freshly inpainted content that must back-warp
    my_map_f = np.ones((32, 32), np.float32)
    my_map_f[4:28, 4:28] = 0.0
    out = _update_known_views(
        1, scene, services, exp_cfg, img_new, depth_new, my_map_f,
        seed=0, logdir=str(tmp_path / "log"),
    )
    from text2nerf_tpu.engine import io_async

    io_async.flush()  # artifact writes are async; the trainer flushes
    assert np.isfinite(out.depth_gen_split).all()
    sup = os.path.join(str(tmp_path / "log"), "DIBR", "rgbs_support",
                       "00001_warp2known")
    assert os.path.isdir(sup), "rgbs_support artifacts missing"
    files = os.listdir(sup)
    assert any("image_pre" in f for f in files), files
    assert any("image_warp" in f for f in files), files
    assert any("depth_warp" in f for f in files), files
