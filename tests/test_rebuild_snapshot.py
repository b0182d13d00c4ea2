"""tools/rebuild_scene_snapshot: recover a run whose snapshot was lost.

Production scenario: a kill corrupted scene_snapshot.npz mid-write and the
resume path was stranded.  The tool reconstructs the snapshot from the
run's DIBR artifacts + cached data dir, after which resume works again.
"""

import json
import os

import numpy as np

from tests.test_resume import _setup
from text2nerf_tpu.data import scene_state as ss
from text2nerf_tpu.engine import checkpoints, trainer


def test_rebuild_snapshot_restores_resume(tmp_path):
    train_cfg, scene_cfg, services, exp_cfg = _setup(tmp_path)
    mcfg, params, aabb, scene1, logfolder = trainer.reconstruction(
        train_cfg, scene_cfg, services, exp_cfg
    )
    snap = os.path.join(logfolder, "scene_snapshot.npz")
    *_, loop_state = checkpoints.load_checkpoint(
        os.path.join(logfolder, "r_resume.npz")
    )
    next_view = loop_state["next_view"]
    orig = ss.load_scene_snapshot(
        snap, n_views_pools=next_view, trans_range=scene_cfg.trans_range,
        use_support_set=scene_cfg.use_support_set,
    )

    # corrupt the snapshot the way a mid-write SIGKILL did in production
    with open(snap, "wb") as f:
        f.write(b"PK\x03\x04 truncated archive")

    from tools.rebuild_scene_snapshot import (
        main,
        scene_config_from_args_txt,
    )

    cfg2 = scene_config_from_args_txt(os.path.join(logfolder, "args.txt"))
    assert cfg2.hw == scene_cfg.hw
    assert cfg2.num_filter_iter == scene_cfg.num_filter_iter
    assert cfg2.prompt == scene_cfg.prompt

    assert main(["--logfolder", logfolder]) == 0

    # the rebuilt snapshot stops at the checkpoint's next_view even though
    # the DIBR tree holds artifacts for the view generated AFTER the last
    # boundary save (recovering it would make resume append it twice)
    rebuilt = ss.load_scene_snapshot(
        snap, n_views_pools=next_view, trans_range=scene_cfg.trans_range,
        use_support_set=scene_cfg.use_support_set,
    )
    assert rebuilt.rgbs_gen_split.shape == orig.rgbs_gen_split.shape
    # recovered views match the originals up to PNG quantization + the
    # re-run bilateral filter's response to it
    err = np.abs(rebuilt.rgbs_gen_split - orig.rgbs_gen_split).max()
    assert err < 0.05, err
    derr = np.abs(rebuilt.depth_gen_split - orig.depth_gen_split).max()
    assert derr < 0.05, derr
    np.testing.assert_allclose(rebuilt.poses_gen, orig.poses_gen, atol=1e-6)

    # and the trainer resumes from it, regenerating the tail views
    _, _, _, scene2, _ = trainer.reconstruction(
        train_cfg, scene_cfg, services, exp_cfg
    )
    lines = [
        json.loads(l)
        for l in open(os.path.join(logfolder, "metrics.jsonl"))
        if "resume_epoch" in l
    ]
    assert lines and lines[-1]["resume_epoch"] >= 1
    assert scene2.rgbs_gen_split.shape[0] == 3


def test_resume_next_view_reads_both_backends(tmp_path):
    """_resume_next_view must honor orbax checkpoints too (review r3):
    a directory named ``*_resume`` with a side loop_state.json — and pick
    the newest candidate when several exist."""
    from tools.rebuild_scene_snapshot import _resume_next_view

    log = tmp_path / "log"
    log.mkdir()
    # orbax-style: directory + loop_state.json
    od = log / "exp_resume"
    od.mkdir()
    (od / "loop_state.json").write_text(json.dumps({"next_view": 3}))
    assert _resume_next_view(str(log)) == 3

    # an npz written LATER (newer mtime) wins
    import time

    time.sleep(0.05)
    ls = np.frombuffer(json.dumps({"next_view": 2}).encode(), dtype=np.uint8)
    np.savez(log / "exp2_resume.npz", __loop_state__=ls)
    os.utime(log / "exp2_resume.npz")
    assert _resume_next_view(str(log)) == 2

    # unreadable newest candidate falls through to the next one
    (log / "exp3_resume.npz").write_bytes(b"not a zip")
    assert _resume_next_view(str(log)) == 2
