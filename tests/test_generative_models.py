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


def _pndm_reference_loop(x, eps_fn, num_steps, n_train=1000, steps_offset=1):
    """Literal numpy implementation of the published PNDM/PLMS algorithm
    with skip_prk_steps (the diffusers semantics the SD checkpoints
    configure): stateful ets history + counter + cur_sample, 4th-order
    Adams-Bashforth once warm.  Written from the documented update rules
    as the golden oracle for the branchless fori_loop re-design."""
    betas = np.linspace(0.00085 ** 0.5, 0.012 ** 0.5, n_train) ** 2
    alphas_cum = np.cumprod(1.0 - betas)
    ratio = n_train // num_steps
    base = (np.arange(num_steps) * ratio).round().astype(np.int64) + steps_offset
    plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]

    ets, counter, cur_sample = [], 0, None
    for t in plms:
        e = eps_fn(x, t)
        t_eff, t_prev = int(t), int(t) - ratio
        if counter != 1:
            ets = ets[-3:] + [e]
        else:
            t_prev = int(t)
            t_eff = int(t) + ratio
        if len(ets) == 1 and counter == 0:
            out = e
            cur_sample = x
        elif len(ets) == 1 and counter == 1:
            out = (e + ets[-1]) / 2
            x = cur_sample
        elif len(ets) == 2:
            out = (3 * ets[-1] - ets[-2]) / 2
        elif len(ets) == 3:
            out = (23 * ets[-1] - 16 * ets[-2] + 5 * ets[-3]) / 12
        else:
            out = (55 * ets[-1] - 59 * ets[-2] + 37 * ets[-3] - 9 * ets[-4]) / 24
        a_t = alphas_cum[t_eff]
        a_prev = alphas_cum[t_prev] if t_prev >= 0 else alphas_cum[0]
        coeff = (a_prev / a_t) ** 0.5
        denom = a_t * (1 - a_prev) ** 0.5 + (a_t * (1 - a_t) * a_prev) ** 0.5
        x = coeff * x - (a_prev - a_t) * out / denom
        counter += 1
    return x


def test_pndm_schedule_matches_reference_algorithm():
    """The branchless PNDMSchedule reproduces the stateful PLMS loop
    step-for-step, including the warm-up re-evaluation and the
    final-alpha clamp."""
    rng = np.random.default_rng(7)
    x0 = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)

    def eps_fn(x, t):  # deterministic pseudo-model: depends on x and t
        return np.tanh(x) * 0.9 + np.float32(t) / 1000.0 * 0.1

    for num_steps in (4, 7, 12):
        want = _pndm_reference_loop(x0.copy(), eps_fn, num_steps)

        sched = D.PNDMSchedule.create(num_steps)
        assert sched.timesteps.shape[0] == num_steps + 1
        x = jnp.asarray(x0)
        state = sched.init_state(x)
        for i in range(int(sched.timesteps.shape[0])):
            t = int(sched.timesteps[i])
            e = jnp.asarray(eps_fn(np.asarray(x), t))
            x, state = sched.step_state(e, i, x, state)
        np.testing.assert_allclose(
            np.asarray(x), want, atol=2e-5, rtol=1e-5
        ), num_steps


def test_pndm_denoises_toward_x0():
    """With a perfect epsilon oracle, PNDM recovers x0 (epsilon
    parameterization: x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps)."""
    sched = D.PNDMSchedule.create(12)
    alphas = np.asarray(sched.alphas_cum)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((1, 4, 4, 2)).astype(np.float32) * 0.3
    noise = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    t0 = int(sched.timesteps[0])
    x = jnp.asarray(np.sqrt(alphas[t0]) * x0 + np.sqrt(1 - alphas[t0]) * noise)
    state = sched.init_state(x)
    for i in range(int(sched.timesteps.shape[0])):
        t = int(sched.t_eff[i])
        a = alphas[t]
        eps = (x - np.sqrt(a) * jnp.asarray(x0)) / np.sqrt(1 - a)  # oracle
        x, state = sched.step_state(eps, i, x, state)
    # multistep history mixes timesteps, so the instantaneous
    # oracle is only approximately consistent at 12 steps
    np.testing.assert_allclose(np.asarray(x), x0, atol=0.1)


def test_ddim_final_step_uses_final_alpha_cumprod():
    """set_alpha_to_one=False (the SD checkpoints' DDIM config): the last
    step's a_prev is alphas_cumprod[0], not 1.0 (review r3) — literal-math
    golden of the final update."""
    sched = D.DDIMSchedule.create(10)
    n = sched.timesteps.shape[0]
    x = jnp.full((1, 2, 2, 1), 0.7, jnp.float32)
    eps = jnp.full_like(x, 0.3)
    got = np.asarray(sched.step(eps, n - 1, x))
    t = int(sched.timesteps[n - 1])
    a_t = float(sched.alphas_cum[t])
    a_prev = float(sched.alphas_cum[0])  # final_alpha_cumprod
    x0 = (0.7 - np.sqrt(1 - a_t) * 0.3) / np.sqrt(a_t)
    want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * 0.3
    np.testing.assert_allclose(got, np.full_like(got, want), rtol=1e-5)
