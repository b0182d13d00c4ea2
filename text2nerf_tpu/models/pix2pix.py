"""pix2pix-style UNet generator + PatchGAN discriminator (Flax).

Equivalent of the reference depth-merge network family
(/root/reference/models/merge_model_sc/networks.py:119-167,444-543 and the
unused 2-channel / RGBD variants in models/merge_model and
models/merge_model_inpainting): a recursive skip-connection UNet with 4x4
stride-2 convolutions.  The production configuration is ``unet_1024``
(num_downs=10, ngf=64, norm='none', 1 input / 1 output channel —
merge_model_sc/Options.yml, pix2pix4depth_model.py:65).

On TPU the convs run channels-last (NHWC) in the caller-selected compute
dtype; at 1024x1024x64 the 4x4 convs map directly onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn


class UnetSkipBlock(nn.Module):
    """One U-Net level: down-conv → submodule → up-conv, with skip concat
    (UnetSkipConnectionBlock, networks.py:478-543)."""

    outer_nc: int
    inner_nc: int
    input_nc: Optional[int] = None
    submodule: Optional[nn.Module] = None
    outermost: bool = False
    innermost: bool = False
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        down = x
        if not self.outermost:
            down = nn.leaky_relu(down, 0.2)
        down = nn.Conv(
            self.inner_nc, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
            dtype=self.dtype,
        )(down)
        mid = down
        if self.submodule is not None:
            mid = self.submodule(mid, train=train)
        up = nn.relu(mid)
        up = nn.ConvTranspose(
            self.outer_nc, (4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype,
        )(up)
        if self.outermost:
            return jnp.tanh(up)
        if self.use_dropout and not self.innermost:
            up = nn.Dropout(0.5, deterministic=not train)(up)
        return jnp.concatenate([x, up], axis=-1)


class UnetGenerator(nn.Module):
    """Recursive UNet (UnetGenerator, networks.py:444-474).

    num_downs=10 shrinks a 1024x1024 input to 1x1 at the bottleneck.
    """

    input_nc: int = 1
    output_nc: int = 1
    num_downs: int = 10
    ngf: int = 64
    use_dropout: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        block = UnetSkipBlock(
            outer_nc=self.ngf * 8, inner_nc=self.ngf * 8,
            innermost=True, dtype=self.dtype,
        )
        for _ in range(self.num_downs - 5):
            block = UnetSkipBlock(
                outer_nc=self.ngf * 8, inner_nc=self.ngf * 8,
                submodule=block, use_dropout=self.use_dropout, dtype=self.dtype,
            )
        for mult in (4, 2, 1):
            block = UnetSkipBlock(
                outer_nc=self.ngf * mult, inner_nc=self.ngf * mult * 2,
                submodule=block, dtype=self.dtype,
            )
        block = UnetSkipBlock(
            outer_nc=self.output_nc, inner_nc=self.ngf,
            input_nc=self.input_nc, submodule=block, outermost=True,
            dtype=self.dtype,
        )
        return block(x, train=train)


class PatchDiscriminator(nn.Module):
    """70x70 PatchGAN (NLayerDiscriminator, networks.py:546+)."""

    input_nc: int = 2  # cond + generated (pix2pix4depth_model.py:69)
    ndf: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ndf, (4, 4), (2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype)(x)
        h = nn.leaky_relu(h, 0.2)
        mult = 1
        for n in range(1, self.n_layers):
            mult = min(2 ** n, 8)
            h = nn.Conv(self.ndf * mult, (4, 4), (2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype)(h)
            h = nn.leaky_relu(h, 0.2)
        mult = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * mult, (4, 4), (1, 1),
                    padding=((1, 1), (1, 1)), dtype=self.dtype)(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), (1, 1), padding=((1, 1), (1, 1)),
                       dtype=self.dtype)(h)


def gan_loss(pred, target_is_real: bool, mode: str = "vanilla"):
    """GANLoss (networks.py GANLoss): vanilla = BCE-with-logits, lsgan = MSE."""
    target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
    if mode == "lsgan":
        return jnp.mean((pred - target) ** 2)
    if mode == "vanilla":
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    raise ValueError(mode)


def minmax_normalize(x):
    """Min-max to [0,1] then scale to [-1,1]
    (pix2pix4depth_model.set_input_tensor, :116-129)."""
    x = (x - x.min()) / jnp.maximum(x.max() - x.min(), 1e-12)
    return x * 2.0 - 1.0
