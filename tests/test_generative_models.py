"""Architecture tests for the generative model family (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from text2nerf_tpu.models import diffusion as D
from text2nerf_tpu.models import clip as C
from text2nerf_tpu.models import monodepth as MD


def test_unet_shapes_and_conditioning():
    cfg = D.UNetConfig.tiny()
    unet = D.UNet(cfg)
    x = jnp.zeros((2, 16, 16, 4))
    ctx = jnp.zeros((2, 8, cfg.cross_attention_dim))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((2,)), ctx)["params"]
    out = unet.apply({"params": params}, x, jnp.array([10.0, 500.0]), ctx)
    assert out.shape == (2, 16, 16, 4)
    # conditioning must matter: different context → different output
    ctx2 = jnp.ones_like(ctx)
    out2 = unet.apply({"params": params}, x, jnp.array([10.0, 500.0]), ctx2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_inpaint_unet_accepts_9_channels():
    cfg = D.UNetConfig(
        in_channels=9, block_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, head_dim=16, attn_blocks=(True, False),
    )
    unet = D.UNet(cfg)
    x = jnp.zeros((1, 8, 8, 9))
    ctx = jnp.zeros((1, 4, 32))
    params = unet.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), ctx)["params"]
    assert unet.apply({"params": params}, x, jnp.zeros((1,)), ctx).shape == (
        1, 8, 8, 4,
    )


def test_vae_roundtrip_shapes():
    cfg = D.VAEConfig.tiny()
    enc, dec = D.VAEEncoder(cfg), D.VAEDecoder(cfg)
    img = jnp.zeros((1, 32, 32, 3))
    pe = enc.init(jax.random.PRNGKey(0), img)["params"]
    latent_dist = enc.apply({"params": pe}, img)
    assert latent_dist.shape == (1, 16, 16, 8)  # mean+logvar, 2 downsamples
    z = latent_dist[..., :4]
    pd = dec.init(jax.random.PRNGKey(1), z)["params"]
    out = dec.apply({"params": pd}, z)
    assert out.shape == (1, 32, 32, 3)


def test_euler_schedule_denoises_toward_x0():
    """With a perfect epsilon oracle, Euler stepping recovers x0."""
    sched = D.EulerSchedule.create(16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32)) * 0.3
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    x = x0 + noise * sched.sigmas[0]

    for i in range(16):
        eps = (x - x0) / sched.sigmas[i]  # oracle
        x = sched.step(eps, i, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-3)


def test_ddim_schedule_monotone():
    sched = D.DDIMSchedule.create(10)
    ts = np.asarray(sched.timesteps)
    assert (np.diff(ts) < 0).all() and ts[0] > 800


def test_clip_text_encoder_outputs():
    cfg = C.CLIPTextConfig.tiny()
    enc = C.CLIPTextEncoder(cfg, skip_last_layers=1)
    tokens = C.hash_tokenize(["a cat", "a very large dog"], cfg.context_length,
                             cfg.vocab_size)
    params = enc.init(jax.random.PRNGKey(0), tokens)["params"]
    out = enc.apply({"params": params}, tokens)
    assert out["hidden"].shape == (2, cfg.context_length, cfg.width)
    assert out["embeds"].shape == (2, cfg.projection_dim)
    # causal: truncating the suffix must not change the prefix hidden states
    t2 = tokens.at[:, 8:].set(0)
    out2 = enc.apply({"params": params}, t2)
    np.testing.assert_allclose(
        np.asarray(out["hidden"][:, :4]), np.asarray(out2["hidden"][:, :4]),
        atol=1e-5,
    )


def test_clip_vision_and_ranking():
    cfg = C.CLIPVisionConfig.tiny()
    enc = C.CLIPVisionEncoder(cfg)
    imgs = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (3, 32, 32, 3)).astype(np.float32)
    )
    params = enc.init(jax.random.PRNGKey(0), imgs)["params"]
    emb = enc.apply({"params": params}, imgs)["embeds"]
    assert emb.shape == (3, cfg.projection_dim)
    scores = C.cosine_scores(emb[:2], emb[2:3])
    assert scores.shape == (2,)
    # an image is maximally similar to itself
    self_score = C.cosine_scores(emb[2:3], emb[2:3])
    assert float(self_score[0]) >= float(scores.max()) - 1e-4


def test_monodepth_output():
    net = MD.RelDepthNet(MD.DepthNetConfig.tiny())
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    d = net.apply({"params": params}, x)
    assert d.shape == (1, 64, 64)
    assert (np.asarray(d) >= 0).all()  # softplus output


def test_sync_batch_norm_matches_local_on_one_device():
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 4, 4, 3)).astype(np.float32)
    )
    out = MD.sync_batch_norm(x)
    np.testing.assert_allclose(np.asarray(out).mean((0, 1, 2)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out).std((0, 1, 2)), 1.0, atol=1e-3)


def test_sync_batch_norm_cross_device():
    """Statistics must be identical on every shard under shard_map."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = jax.devices()[:4]
    mesh = Mesh(np.array(devs), ("d",))
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((8, 4, 4, 3)).astype(np.float32)
    )

    f = shard_map(
        lambda xs: MD.sync_batch_norm(xs, axis_name="d"),
        mesh=mesh, in_specs=P("d"), out_specs=P("d"),
    )
    out = np.asarray(f(x))
    ref = np.asarray(MD.sync_batch_norm(x))
    np.testing.assert_allclose(out, ref, atol=1e-4)
