"""bench.py field acquisition: the headline must render the newest
PRODUCTION-trained checkpoint when one exists (converged fields are the
regime the adaptive ladder's bottom rung serves — a 120-step in-bench fit
is semi-transparent fog, reports/bench_field_diag_r5.json) and fall back
to fitting on fresh clones."""

import os

import jax
import jax.numpy as jnp

import bench
from text2nerf_tpu.engine import checkpoints as ckpt
from text2nerf_tpu.models import tensorf as tf


def _save_fake_run(root, name, reso, mtime=None):
    cfg = tf.TensoRFConfig(density_n_comp=(2, 2, 2), app_n_comp=(2, 2, 2))
    aabb = jnp.array([[-8.0, -8.0, -8.0], [8.0, 8.0, 8.0]])
    params = tf.init_params(jax.random.PRNGKey(0), cfg, reso)
    p = os.path.join(root, name, "log", "scene", "fullsched_final.npz")
    ckpt.save_checkpoint(p, cfg, params, aabb)
    if mtime is not None:
        os.utime(p, (mtime, mtime))
    return p


def test_missing_root_returns_none(tmp_path):
    assert bench.load_production_field(str(tmp_path / "nope")) is None


def test_small_grid_checkpoints_rejected(tmp_path):
    _save_fake_run(str(tmp_path), "fullsched_tiny", (32, 32, 32))
    assert bench.load_production_field(str(tmp_path)) is None


def test_newest_production_checkpoint_wins(tmp_path):
    _save_fake_run(str(tmp_path), "fullsched_old", (300, 300, 300),
                   mtime=1_000_000)
    newest = _save_fake_run(str(tmp_path), "fullsched_new", (300, 300, 300),
                            mtime=2_000_000)
    # a too-small grid must be skipped even when newest
    _save_fake_run(str(tmp_path), "fullsched_small", (48, 48, 48),
                   mtime=3_000_000)
    got = bench.load_production_field(str(tmp_path))
    assert got is not None
    mcfg, params, aabb, path = got
    assert path == newest
    assert min(tf.grid_resolution(mcfg, params)) >= 250
