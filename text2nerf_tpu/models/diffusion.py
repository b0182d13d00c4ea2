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
  attention dim 1024, GEGLU feed-forwards, GroupNorm(32, eps 1e-5)+SiLU
  resnets, linear transformer projections (the SD2 configuration).
- VAE: AutoencoderKL encoder/decoder incl. quant/post-quant 1x1 convs,
  scaling factor 0.18215, GroupNorm eps 1e-6.
- Schedulers: Euler discrete (text2img default) and DDIM.

Module names mirror the diffusers checkpoint layout (down_0_res_1,
mid_attn, conv_out, ...) so the torch→Flax name maps in
services/weight_convert.py are a mechanical enumeration; epsilon values
match torch's so converted nets are numerically exact.

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
    """GroupNorm→SiLU→Conv ×2 with a time-embedding shift and 1x1 shortcut
    (diffusers ResnetBlock2D; norm eps 1e-5 in the UNet, 1e-6 in the VAE)."""

    out_ch: int
    norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None):
        h = nn.GroupNorm(32, epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_ch, dtype=self.dtype,
                         name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = nn.GroupNorm(32, epsilon=self.norm_eps, dtype=self.dtype,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class Attention(nn.Module):
    """Multi-head attention with diffusers naming (to_q/to_k/to_v/to_out);
    q/k/v are bias-free in the UNet transformer blocks."""

    dim: int
    heads: int
    qkv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        context = x if context is None else context
        head_dim = self.dim // self.heads
        q = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_q")(x)
        k = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_k")(context)
        v = nn.Dense(self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="to_v")(context)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(*out.shape[:-2], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim * self.mult
        proj = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(proj, 2, axis=-1)
        # torch F.gelu is the exact erf form, not the tanh approximation
        gate = nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(a * gate)


class TransformerBlock(nn.Module):
    """BasicTransformerBlock: self-attn, cross-attn, GEGLU MLP, pre-LN
    (torch LayerNorm eps 1e-5)."""

    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + Attention(self.dim, self.heads, dtype=self.dtype, name="attn1")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        )
        x = x + Attention(self.dim, self.heads, dtype=self.dtype, name="attn2")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), context
        )
        x = x + GEGLUFeedForward(self.dim, dtype=self.dtype, name="ff")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        )
        return x


class SpatialTransformer(nn.Module):
    """Transformer2DModel with linear proj_in/proj_out (SD2 sets
    use_linear_projection=True); GroupNorm eps 1e-6."""

    dim: int
    heads: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, self.dim)
        for d in range(self.depth):
            x = TransformerBlock(self.dim, self.heads, self.dtype,
                                 name=f"block_{d}")(x, context)
        x = x.reshape(b, h, w, self.dim)
        x = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return x + res


class Downsample(nn.Module):
    """Strided conv downsample.  The UNet pads symmetrically; the VAE
    encoder (diffusers Downsample2D with padding=0 + manual (0,1,0,1) pad)
    pads bottom/right only — ``asymmetric`` selects that variant."""

    ch: int
    dtype: jnp.dtype = jnp.float32
    asymmetric: bool = False

    @nn.compact
    def __call__(self, x):
        pad = ((0, 1), (0, 1)) if self.asymmetric else 1
        return nn.Conv(self.ch, (3, 3), strides=(2, 2), padding=pad,
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
        return nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


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
    """SD-style conditional UNet over latents (NHWC).

    Submodule names follow the diffusers layout: ``down_{i}_res_{j}`` ↔
    ``down_blocks.{i}.resnets.{j}``, ``up_{i}_attn_{j}`` ↔
    ``up_blocks.{L-1-i}.attentions.{j}`` (up blocks run high→low channel
    here, indexed by the channel-table position ``i``), ``mid_res_{0,1}`` /
    ``mid_attn`` ↔ ``mid_block.*``.
    """

    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timesteps, context):
        c = self.cfg
        tdim = c.block_channels[0] * 4
        temb = timestep_embedding(timesteps, c.block_channels[0])
        temb = nn.Dense(tdim, dtype=self.dtype, name="time_dense_1")(temb)
        temb = nn.Dense(tdim, dtype=self.dtype, name="time_dense_2")(
            nn.silu(temb))

        h = nn.Conv(c.block_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        skips = [h]

        # down
        for i, ch in enumerate(c.block_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(h, temb)
                if c.attn_blocks[i]:
                    h = SpatialTransformer(
                        ch, ch // c.head_dim, dtype=self.dtype,
                        name=f"down_{i}_attn_{j}",
                    )(h, context)
                skips.append(h)
            if i < len(c.block_channels) - 1:
                h = Downsample(ch, self.dtype, name=f"down_{i}_downsample")(h)
                skips.append(h)

        # mid
        mid_ch = c.block_channels[-1]
        h = ResnetBlock(mid_ch, dtype=self.dtype, name="mid_res_0")(h, temb)
        h = SpatialTransformer(mid_ch, mid_ch // c.head_dim, dtype=self.dtype,
                               name="mid_attn")(h, context)
        h = ResnetBlock(mid_ch, dtype=self.dtype, name="mid_res_1")(h, temb)

        # up
        for i, ch in list(enumerate(c.block_channels))[::-1]:
            for j in range(c.layers_per_block + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(ch, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(h, temb)
                if c.attn_blocks[i]:
                    h = SpatialTransformer(
                        ch, ch // c.head_dim, dtype=self.dtype,
                        name=f"up_{i}_attn_{j}",
                    )(h, context)
            if i > 0:
                h = Upsample(ch, self.dtype, name=f"up_{i}_upsample")(h)

        h = nn.GroupNorm(32, epsilon=1e-5, dtype=self.dtype,
                         name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(c.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


# ---------------------------------------------------------------------------
# VAE (AutoencoderKL)
# ---------------------------------------------------------------------------


class VAEAttention(nn.Module):
    """Single-head mid-block attention (diffusers AttentionBlock): GroupNorm
    eps 1e-6, biased q/k/v/out projections."""

    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        res = x
        x = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        x = Attention(self.ch, heads=1, qkv_bias=True, dtype=self.dtype,
                      name="attn")(x)
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
    """AutoencoderKL encoder + the quant 1x1 conv; returns the moments
    (mean ‖ logvar, 2×latent channels)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.block_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(c.block_channels):
            for j in range(c.layers_per_block):
                h = ResnetBlock(ch, norm_eps=1e-6, dtype=self.dtype,
                                name=f"down_{i}_res_{j}")(h)
            if i < len(c.block_channels) - 1:
                h = Downsample(ch, self.dtype, asymmetric=True,
                               name=f"down_{i}_downsample")(h)
        top = c.block_channels[-1]
        h = ResnetBlock(top, norm_eps=1e-6, dtype=self.dtype,
                        name="mid_res_0")(h)
        h = VAEAttention(top, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(top, norm_eps=1e-6, dtype=self.dtype,
                        name="mid_res_1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * c.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return nn.Conv(2 * c.latent_channels, (1, 1), dtype=self.dtype,
                       name="quant_conv")(h)


class VAEDecoder(nn.Module):
    """AutoencoderKL decoder incl. the post-quant 1x1 conv."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        c = self.cfg
        z = nn.Conv(c.latent_channels, (1, 1), dtype=self.dtype,
                    name="post_quant_conv")(z)
        top = c.block_channels[-1]
        h = nn.Conv(top, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        h = ResnetBlock(top, norm_eps=1e-6, dtype=self.dtype,
                        name="mid_res_0")(h)
        h = VAEAttention(top, self.dtype, name="mid_attn")(h)
        h = ResnetBlock(top, norm_eps=1e-6, dtype=self.dtype,
                        name="mid_res_1")(h)
        for i, ch in list(enumerate(c.block_channels))[::-1]:
            for j in range(c.layers_per_block + 1):
                h = ResnetBlock(ch, norm_eps=1e-6, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(h)
            if i > 0:
                h = Upsample(ch, self.dtype, name=f"up_{i}_upsample")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, dtype=self.dtype,
                         name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(3, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


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
    def create(num_steps: int, n_train: int = 1000,
               beta_start=0.00085, beta_end=0.012, steps_offset: int = 0):
        del steps_offset  # Euler's linspace spacing ignores the offset
        betas = make_betas(n_train, beta_start, beta_end)
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

    def init_state(self, latents):
        return ()

    def step(self, eps, i, x):
        sigma = self.sigmas[i]
        pred_x0 = x - sigma * eps
        d = (x - pred_x0) / sigma
        return x + d * (self.sigmas[i + 1] - sigma)

    def step_state(self, eps, i, x, state):
        return self.step(eps, i, x), state


@dataclasses.dataclass
class DDIMSchedule:
    timesteps: jnp.ndarray
    alphas_cum: jnp.ndarray  # over train steps

    @staticmethod
    def create(num_steps: int, n_train: int = 1000,
               beta_start=0.00085, beta_end=0.012, steps_offset: int = 0):
        betas = make_betas(n_train, beta_start, beta_end)
        step = n_train // num_steps
        ts = (jnp.arange(num_steps) * step + steps_offset)[::-1]
        ts = jnp.clip(ts, 0, n_train - 1)
        return DDIMSchedule(timesteps=ts, alphas_cum=jnp.cumprod(1.0 - betas))

    @property
    def init_noise_sigma(self):
        return jnp.float32(1.0)

    def scale_model_input(self, x, i):
        return x

    def init_state(self, latents):
        return ()

    def step(self, eps, i, x):
        t = self.timesteps[i]
        n = self.timesteps.shape[0]
        t_prev = jnp.where(
            i + 1 < n, self.timesteps[jnp.minimum(i + 1, n - 1)], -1
        )
        a_t = self.alphas_cum[t]
        # final step: set_alpha_to_one=False (the SD checkpoints' DDIM
        # config) → final_alpha_cumprod = alphas_cumprod[0], NOT 1.0 —
        # matches diffusers and the PNDM implementation below
        a_prev = jnp.where(
            t_prev >= 0,
            self.alphas_cum[jnp.maximum(t_prev, 0)],
            self.alphas_cum[0],
        )
        x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_prev) * x0 + jnp.sqrt(1 - a_prev) * eps

    def step_state(self, eps, i, x, state):
        return self.step(eps, i, x), state


@dataclasses.dataclass
class PNDMSchedule:
    """PNDM (PLMS) scheduler with ``skip_prk_steps=True`` — the exact
    configuration the SD checkpoints ship (scheduler_config.json:
    PNDMScheduler, steps_offset=1, skip_prk_steps=true,
    set_alpha_to_one=false); the reference inpaint pipeline runs it at the
    checkpoint's 50-step default (/root/reference/scripts/inpaint_sdm.py:
    52-56).

    The diffusers implementation is stateful Python (an ``ets`` history
    list, a ``counter``, a saved ``cur_sample``).  Re-designed for one
    lax.fori_loop: the per-step Adams-Bashforth coefficients over
    [current eps, 3-deep history] and the effective (t, t_prev) pairs are
    precomputed host-side, so the loop body is branchless and carries a
    fixed (3, ...) eps-history stack.  Runs ``num_steps + 1`` UNet
    evaluations (the PLMS warm-up re-evaluates the second timestep) —
    identical to diffusers.
    """

    timesteps: jnp.ndarray   # (S+1,) UNet eval timesteps, plms order
    t_eff: jnp.ndarray       # (S+1,) effective t for the x-update
    t_prev: jnp.ndarray      # (S+1,) effective previous t (< 0 at the end)
    coeffs: jnp.ndarray      # (S+1, 4) weights over [eps, p1, p2, p3]
    push: jnp.ndarray        # (S+1,) 1 = push eps into the history stack
    use_saved: jnp.ndarray   # (S+1,) 1 = update from the saved cur_sample
    save: jnp.ndarray        # (S+1,) 1 = save x as cur_sample
    alphas_cum: jnp.ndarray  # (n_train,)

    @staticmethod
    def create(num_steps: int, n_train: int = 1000,
               beta_start=0.00085, beta_end=0.012, steps_offset: int = 1):
        import numpy as np

        betas = make_betas(n_train, beta_start, beta_end)
        ratio = n_train // num_steps
        base = (np.arange(num_steps) * ratio).round().astype(np.int64)
        base = base + steps_offset
        # PLMS timestep list: drop the last, duplicate the second-to-last,
        # append the last, reverse (PNDMScheduler.set_timesteps with
        # skip_prk_steps)
        plms = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1].copy()
        s1 = len(plms)
        t_eff = plms.copy()
        t_prev = plms - ratio
        if s1 > 1:
            # counter==1: the warm-up re-evaluation steps from t+ratio to t
            t_eff[1] = plms[1] + ratio
            t_prev[1] = plms[1]
        coeffs = np.zeros((s1, 4), np.float32)
        coeffs[0] = (1.0, 0.0, 0.0, 0.0)
        if s1 > 1:
            coeffs[1] = (0.5, 0.5, 0.0, 0.0)
        if s1 > 2:
            coeffs[2] = (1.5, -0.5, 0.0, 0.0)
        if s1 > 3:
            coeffs[3] = (23 / 12, -16 / 12, 5 / 12, 0.0)
        if s1 > 4:
            coeffs[4:] = (55 / 24, -59 / 24, 37 / 24, -9 / 24)
        push = np.ones(s1, np.float32)
        use_saved = np.zeros(s1, np.float32)
        save = np.zeros(s1, np.float32)
        save[0] = 1.0
        if s1 > 1:
            push[1] = 0.0
            use_saved[1] = 1.0
        return PNDMSchedule(
            timesteps=jnp.asarray(plms),
            t_eff=jnp.asarray(t_eff),
            t_prev=jnp.asarray(t_prev),
            coeffs=jnp.asarray(coeffs),
            push=jnp.asarray(push),
            use_saved=jnp.asarray(use_saved),
            save=jnp.asarray(save),
            alphas_cum=jnp.cumprod(1.0 - betas),
        )

    @property
    def init_noise_sigma(self):
        return jnp.float32(1.0)

    def scale_model_input(self, x, i):
        return x

    def init_state(self, latents):
        zero = jnp.zeros_like(latents)
        return {"hist": jnp.stack([zero, zero, zero]), "cur": zero}

    def step_state(self, eps, i, x, state):
        h = state["hist"]
        c = self.coeffs[i]
        e = c[0] * eps + c[1] * h[0] + c[2] * h[1] + c[3] * h[2]
        sample = jnp.where(self.use_saved[i] > 0, state["cur"], x)
        t = self.t_eff[i]
        tp = self.t_prev[i]
        a_t = self.alphas_cum[t]
        # set_alpha_to_one=False → final_alpha_cumprod = alphas_cumprod[0]
        a_prev = jnp.where(
            tp >= 0, self.alphas_cum[jnp.maximum(tp, 0)], self.alphas_cum[0]
        )
        sample_coeff = jnp.sqrt(a_prev / a_t)
        denom = a_t * jnp.sqrt(1 - a_prev) + jnp.sqrt(
            a_t * (1 - a_t) * a_prev
        )
        x_new = sample_coeff * sample - (a_prev - a_t) * e / denom
        new_hist = jnp.where(self.push[i] > 0, jnp.stack([eps, h[0], h[1]]), h)
        new_cur = jnp.where(self.save[i] > 0, x, state["cur"])
        return x_new, {"hist": new_hist, "cur": new_cur}


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

    def body(i, carry):
        x, state = carry
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
        return schedule.step_state(eps, i, x, state)

    x0 = latents * schedule.init_noise_sigma
    x, _ = jax.lax.fori_loop(0, n_steps, body, (x0, schedule.init_state(x0)))
    return x
