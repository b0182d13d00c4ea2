"""Orbax checkpoint backend: multi-host-shaped save/restore of a
mesh-sharded params tree on the 8-device virtual CPU mesh, and trainer
resume through checkpoint_backend='orbax'."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from text2nerf_tpu.engine import checkpoints as ckpt
from text2nerf_tpu.models import tensorf as tf


def _tiny_field():
    cfg = tf.TensoRFConfig(density_n_comp=(2, 2, 2), app_n_comp=(4, 4, 4),
                           app_dim=6, fea_pe=2, feature_c=16)
    aabb = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    params = tf.init_params(jax.random.PRNGKey(0), cfg,
                            tf.n_to_reso(16 ** 3, aabb))
    return cfg, params, aabb


def test_orbax_sharded_roundtrip(tmp_path):
    cfg, params, aabb = _tiny_field()
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("model",))

    def shard(x):
        # shard the channel axis over the 'model' axis where it divides,
        # replicate otherwise — the param_sharding_spec pattern
        if x.ndim >= 1 and x.shape[-1] % 8 == 0:
            spec = P(*([None] * (x.ndim - 1) + ["model"]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    sharded = jax.tree_util.tree_map(shard, params)
    path = str(tmp_path / "orbax_ckpt")
    ckpt.save_orbax(path, cfg, sharded, aabb,
                    loop_state={"epoch": 3, "next_view": 2})

    # directory checkpoint with sidecars exists
    assert os.path.isdir(path)
    assert os.path.exists(os.path.join(path, "cfg.json"))
    assert os.path.exists(os.path.join(path, "loop_state.json"))

    cfg2, params2, aabb2, loop = ckpt.load_orbax(path)
    assert loop == {"epoch": 3, "next_view": 2}
    assert cfg2.to_dict() == cfg.to_dict()
    np.testing.assert_allclose(np.asarray(aabb2), np.asarray(aabb))
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # sharded restore: abstract target with the mesh shardings
    like = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        sharded,
    )
    _, params3, _, _ = ckpt.load_orbax(path, like, aabb)
    leaf = jax.tree_util.tree_leaves(params3)[0]
    assert isinstance(leaf.sharding, NamedSharding)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_trainer_resume_from_orbax(tmp_path):
    from test_resume import _setup
    from text2nerf_tpu.engine import trainer

    train_cfg, scene_cfg, services, exp_cfg = _setup(tmp_path)
    train_cfg.checkpoint_backend = "orbax"

    mcfg, params, aabb, scene1, logfolder = trainer.reconstruction(
        train_cfg, scene_cfg, services, exp_cfg
    )
    assert os.path.isdir(os.path.join(logfolder, "r_resume"))
    assert os.path.isdir(os.path.join(logfolder, "r_final"))
    assert scene1.rgbs_gen_split.shape[0] == 3

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
