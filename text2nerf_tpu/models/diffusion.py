"""Latent-diffusion model family (Flax): UNet, VAE, schedulers.

TPU-native replacement for the reference's diffusers pipelines
(/root/reference/scripts/text2img_sdm.py:7-30 — StableDiffusionPipeline on
stable-diffusion-2-1-base with EulerDiscreteScheduler;
/root/reference/scripts/inpaint_sdm.py:48-74 —
StableDiffusionInpaintPipeline on stable-diffusion-2-inpainting).

The architecture matches the SD 2.x family so converted checkpoints drop
in (see services/weight_convert.py):
- UNet: 4 (text2img) or 9 (inpainting) input channels at 1/8 resolution,
  block widths (320, 640, 1280, 1280), 2 res layers per block, cross
  attention dim 1024, GEGLU feed-forwards, GroupNorm(32)+SiLU resnets.
- VAE: AutoencoderKL encoder/decoder, scaling factor 0.18215.
- Schedulers: Euler discrete (text2img default) and DDIM.

Everything here is shape-static and jit-friendly: the denoise loop is a
lax.fori_loop over a precomputed sigma schedule; classifier-free guidance
doubles the batch.  Candidate batches (num_images_per_prompt) map onto the
data axis of the device mesh.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def timestep_embedding(timesteps, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (SD convention: half cos, half sin)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = nn.GroupNorm(32, dtype=self.dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype)(h)
        if temb is not None:
            t = nn.Dense(self.out_ch, dtype=self.dtype)(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(32, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype)(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(x)
        return x + h


class Attention(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        head_dim = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(x)
        k = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(context)
        v = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)(context)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(*out.shape[:-2], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype)(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype)(a * nn.gelu(gate))


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.dim, self.heads, self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x)
        )
        x = x + Attention(self.dim, self.heads, self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x), context
        )
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype)(
            nn.LayerNorm(dtype=self.dtype)(x)
        )
        return x


class SpatialTransformer(nn.Module):
    dim: int
    heads: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(32, dtype=self.dtype)(x)
        x = nn.Dense(self.dim, dtype=self.dtype)(x)  # proj_in (linear, SD2)
        x = x.reshape(b, h * w, self.dim)
        for _ in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, self.dtype)(x, context)
        x = x.reshape(b, h, w, self.dim)
        x = nn.Dense(c, dtype=self.dtype)(x)  # proj_out
        return x + res


class Downsample(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.ch, (3, 3), strides=(2, 2), padding=1,
                       dtype=self.dtype)(x)


class Upsample(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4            # 9 for the inpainting variant
    out_channels: int = 4
    block_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024  # SD2.x (OpenCLIP-H); 768 for SD1.x
    head_dim: int = 64
    attn_blocks: Tuple[bool, ...] = (True, True, True, False)

    @staticmethod
    def sd21_base():
        return UNetConfig()

    @staticmethod
    def sd2_inpaint():
        return UNetConfig(in_channels=9)

    @staticmethod
    def tiny(cross_attention_dim: int = 64):
        """A miniature config for tests."""
        return UNetConfig(
            block_channels=(32, 64), layers_per_block=1,
            cross_attention_dim=cross_attention_dim, head_dim=16,
            attn_blocks=(True, False),
        )


class UNet(nn.Module):
    """SD-style conditional UNet over latents (NHWC)."""

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context):
        c = self.cfg
        tdim = c.block_channels[0] * 4
        temb = timestep_embedding(timesteps, c.block_channels[0])
        temb = nn.Dense(tdim, dtype=self.dtype)(temb)
        temb = nn.Dense(tdim, dtype=self.dtype)(nn.silu(temb))

        h = nn.Conv(c.block_channels[0], (3, 3), padding=1, dtype=self.dtype)(x)
        skips = [h]

        # down
        for i, ch in enumerate(c.block_channels):
            for _ in range(c.layers_per_block):
                h = ResnetBlock(ch, self.dtype)(h, temb)
                if c.attn_blocks[i]:
                    h = SpatialTransformer(
                        ch, ch // c.head_dim, dtype=self.dtype
                    )(h, context)
                skips.append(h)
            if i < len(c.block_channels) - 1:
                h = Downsample(ch, self.dtype)(h)
                skips.append(h)

        # mid
        mid_ch = c.block_channels[-1]
        h = ResnetBlock(mid_ch, self.dtype)(h, temb)
        h = SpatialTransformer(mid_ch, mid_ch // c.head_dim, dtype=self.dtype)(
            h, context
        )
        h = ResnetBlock(mid_ch, self.dtype)(h, temb)

        # up
        for i, ch in list(enumerate(c.block_channels))[::-1]:
            for _ in range(c.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch, self.dtype)(h, temb)
                if c.attn_blocks[i]:
                    h = SpatialTransformer(
                        ch, ch // c.head_dim, dtype=self.dtype
                    )(h, context)
            if i > 0:
                h = Upsample(ch, self.dtype)(h)

        h = nn.GroupNorm(32, dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL)
# ---------------------------------------------------------------------------


class VAEAttention(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(32, dtype=self.dtype)(x)
        x = x.reshape(b, h * w, c)
        x = Attention(self.ch, heads=1, dtype=self.dtype)(x)
        return res + x.reshape(b, h, w, c)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 4
    block_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215

    @staticmethod
    def tiny():
        return VAEConfig(block_channels=(32, 64), layers_per_block=1)


class VAEEncoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_channels[0], (3, 3), padding=1, dtype=self.dtype)(x)
        for i, ch in enumerate(c.block_channels):
            for _ in range(c.layers_per_block):
                h = ResnetBlock(ch, self.dtype)(h)
            if i < len(c.block_channels) - 1:
                h = Downsample(ch, self.dtype)(h)
        h = ResnetBlock(c.block_channels[-1], self.dtype)(h)
        h = VAEAttention(c.block_channels[-1], self.dtype)(h)
        h = ResnetBlock(c.block_channels[-1], self.dtype)(h)
        h = nn.GroupNorm(32, dtype=self.dtype)(h)
        h = nn.silu(h)
        # mean + logvar
        return nn.Conv(2 * c.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype)(h)


class VAEDecoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        h = nn.Conv(c.block_channels[-1], (3, 3), padding=1, dtype=self.dtype)(z)
        h = ResnetBlock(c.block_channels[-1], self.dtype)(h)
        h = VAEAttention(c.block_channels[-1], self.dtype)(h)
        h = ResnetBlock(c.block_channels[-1], self.dtype)(h)
        for i, ch in list(enumerate(c.block_channels))[::-1]:
            for _ in range(c.layers_per_block + 1):
                h = ResnetBlock(ch, self.dtype)(h)
            if i > 0:
                h = Upsample(ch, self.dtype)(h)
        h = nn.GroupNorm(32, dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype)(h)


# ---------------------------------------------------------------------------
# Schedulers
# ---------------------------------------------------------------------------


def make_betas(n_train: int = 1000, beta_start=0.00085, beta_end=0.012):
    """scaled_linear betas (the SD default)."""
    return (
        jnp.linspace(beta_start ** 0.5, beta_end ** 0.5, n_train) ** 2
    )


@dataclasses.dataclass
class EulerSchedule:
    """Euler discrete scheduler (text2img_sdm.py:16 uses
    EulerDiscreteScheduler).  Works on sigma parameterization with
    epsilon-prediction models."""

    timesteps: jnp.ndarray  # (S,)
    sigmas: jnp.ndarray     # (S+1,) descending, last = 0

    @staticmethod
    def create(num_steps: int, n_train: int = 1000):
        betas = make_betas(n_train)
        alphas_cum = jnp.cumprod(1.0 - betas)
        all_sigmas = jnp.sqrt((1 - alphas_cum) / alphas_cum)
        ts = jnp.linspace(n_train - 1, 0, num_steps)
        idx = jnp.clip(ts.astype(jnp.int32), 0, n_train - 1)
        sigmas = all_sigmas[idx]
        return EulerSchedule(
            timesteps=ts, sigmas=jnp.concatenate([sigmas, jnp.zeros((1,))])
        )

    @property
    def init_noise_sigma(self):
        return jnp.sqrt(self.sigmas[0] ** 2 + 1)

    def scale_model_input(self, x, i):
        return x / jnp.sqrt(self.sigmas[i] ** 2 + 1)

    def step(self, eps, i, x):
        sigma = self.sigmas[i]
        pred_x0 = x - sigma * eps
        d = (x - pred_x0) / sigma
        return x + d * (self.sigmas[i + 1] - sigma)


@dataclasses.dataclass
class DDIMSchedule:
    timesteps: jnp.ndarray
    alphas_cum: jnp.ndarray  # over train steps

    @staticmethod
    def create(num_steps: int, n_train: int = 1000):
        betas = make_betas(n_train)
        step = n_train // num_steps
        ts = (jnp.arange(num_steps) * step)[::-1]
        return DDIMSchedule(timesteps=ts, alphas_cum=jnp.cumprod(1.0 - betas))

    @property
    def init_noise_sigma(self):
        return jnp.float32(1.0)

    def scale_model_input(self, x, i):
        return x

    def step(self, eps, i, x):
        t = self.timesteps[i]
        n = self.timesteps.shape[0]
        t_prev = jnp.where(
            i + 1 < n, self.timesteps[jnp.minimum(i + 1, n - 1)], -1
        )
        a_t = self.alphas_cum[t]
        a_prev = jnp.where(t_prev >= 0, self.alphas_cum[jnp.maximum(t_prev, 0)], 1.0)
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps


# ---------------------------------------------------------------------------
# Guided sampling loops
# ---------------------------------------------------------------------------


def denoise_loop(
    unet: UNet,
    unet_params,
    schedule,
    latents,
    context_cond,
    context_uncond,
    guidance_scale: float = 7.5,
    extra_channels: Optional[jnp.ndarray] = None,
):
    """Classifier-free-guided sampling as one lax.fori_loop.

    ``extra_channels`` (e.g. the inpainting mask + masked-image latents,
    5 channels) are concatenated to the latent input every step.
    """
    n_steps = schedule.timesteps.shape[0]
    context = jnp.concatenate([context_uncond, context_cond], 0)

    def body(i, x):
        inp = schedule.scale_model_input(x, i)
        if extra_channels is not None:
            inp = jnp.concatenate(
                [inp, jnp.broadcast_to(extra_channels, (*x.shape[:-1],
                                                        extra_channels.shape[-1]))],
                axis=-1,
            )
        inp2 = jnp.concatenate([inp, inp], 0)
        t = jnp.broadcast_to(schedule.timesteps[i], (inp2.shape[0],))
        eps2 = unet.apply({"params": unet_params}, inp2, t, context)
        eps_u, eps_c = jnp.split(eps2, 2, axis=0)
        eps = eps_u + guidance_scale * (eps_c - eps_u)
        return schedule.step(eps, i, x)

    return jax.lax.fori_loop(0, n_steps, body, latents * schedule.init_noise_sigma)
