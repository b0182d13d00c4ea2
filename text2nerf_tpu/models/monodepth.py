"""Monocular depth estimation networks (Flax).

Covers the three base estimators of the boosted-depth stack
(/root/reference/scripts/depth_esti_boosting.py:67-68,455-569 and
/root/reference/third-parties/BoostingMonocularDepth):

- ``leres``  (depthNet=2, the default): RelDepthModel — ResNet/ResNeXt
  stride-32 encoder with a lateral-fusion decoder
  (lib/multi_depth_model_woauxi.py:6-20, lib/network_auxi.py:15-416).
- ``midas``  (depthNet=0): MidasNet — ResNet encoder + FeatureFusion
  decoder (midas/models/midas_net.py:12-76).
- ``sgrnet`` (depthNet=1): DepthNet — ResNet50 + decoder
  (structuredrl/models/DepthNet.py:82-125); its multi-GPU syncbn CUDA
  extension (the reference's only native code, SURVEY §2.3 row 27) maps to
  :func:`sync_batch_norm` — a psum over the device mesh instead of custom
  NCCL kernels.

One shared encoder/decoder skeleton expresses all three: they differ in
backbone widths and fusion details that matter only under pretrained
weights (conversion in services/weight_convert.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def sync_batch_norm(x, axis_name: Optional[str] = None, eps: float = 1e-5):
    """Cross-device batch normalization statistics.

    TPU-native equivalent of the reference syncbn CUDA extension
    (third-parties/.../syncbn.cu.h:7-24: fused sum/sqsum reduction across
    GPUs + normalize fwd/bwd): compute per-feature sum and square-sum,
    psum them over the mesh axis, normalize.  XLA differentiates through
    the collective, providing the backward pass the reference hand-wrote.
    """
    n = x.shape[0] * x.shape[1] * x.shape[2]
    s = jnp.sum(x, axis=(0, 1, 2))
    ss = jnp.sum(x * x, axis=(0, 1, 2))
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        ss = jax.lax.psum(ss, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    mean = s / n
    var = ss / n - mean * mean
    return (x - mean) * jax.lax.rsqrt(var + eps)


class SyncBatchNorm(nn.Module):
    """BN layer with optional cross-device stats + learned affine."""

    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if use_running_average:
            mean = self.variable("batch_stats", "mean",
                                 lambda: jnp.zeros((c,))).value
            var = self.variable("batch_stats", "var",
                                lambda: jnp.ones((c,))).value
            xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        else:
            xn = sync_batch_norm(x, self.axis_name)
        return xn * scale + bias


def _gn(ch: int, dtype):
    return nn.GroupNorm(num_groups=min(32, ch), dtype=dtype)


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    groups: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.width * 4
        h = nn.Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype)(x)
        h = _gn(self.width, self.dtype)(h)
        h = nn.relu(h)
        groups = self.groups if self.width % self.groups == 0 else 1
        h = nn.Conv(
            self.width, (3, 3), strides=(self.stride, self.stride), padding=1,
            feature_group_count=groups, use_bias=False, dtype=self.dtype,
        )(h)
        h = _gn(self.width, self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype)(h)
        h = _gn(out_ch, self.dtype)(h)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(
                out_ch, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype,
            )(x)
            x = _gn(out_ch, self.dtype)(x)
        return nn.relu(x + h)


@dataclasses.dataclass(frozen=True)
class DepthNetConfig:
    blocks: Tuple[int, ...] = (3, 4, 6, 3)   # ResNet50 / ResNeXt101: (3,4,23,3)
    base_width: int = 64
    groups: int = 1                          # 32 for ResNeXt
    decoder_width: int = 256

    @staticmethod
    def leres():  # ResNeXt101-32x8d-ish (lib/network_auxi.py Resnext_torch)
        return DepthNetConfig(blocks=(3, 4, 23, 3), groups=32, base_width=128)

    @staticmethod
    def midas():  # ResNet backbone (midas/models/midas_net.py)
        return DepthNetConfig(blocks=(3, 4, 6, 3))

    @staticmethod
    def sgrnet():  # ResNet50 (structuredrl/models/resnet.py)
        return DepthNetConfig(blocks=(3, 4, 6, 3))

    @staticmethod
    def tiny():
        return DepthNetConfig(blocks=(1, 1, 1, 1), base_width=8,
                              decoder_width=16)


class RelDepthNet(nn.Module):
    """Encoder-decoder relative depth network.

    Encoder: stride-32 bottleneck pyramid.  Decoder: top-down lateral
    fusion (the FTB/FFM pattern of lib/network_auxi.py:15-416) ending in a
    1-channel prediction at input/2 resolution, upsampled to input size.
    Output is non-negative relative depth (RelDepthModel.inference applies
    no sigmoid; LeReS outputs direct depth).
    """

    cfg: DepthNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.base_width, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype)(x)
        h = nn.GroupNorm(min(32, c.base_width), dtype=self.dtype)(h)
        h = nn.relu(h)
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        width = c.base_width
        for stage, n_blocks in enumerate(c.blocks):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                h = Bottleneck(width, stride, c.groups, self.dtype)(h)
            feats.append(h)
            width *= 2

        # decoder: lateral 1x1 + top-down upsample-add, then smooth conv
        d = nn.Conv(c.decoder_width, (1, 1), dtype=self.dtype)(feats[-1])
        for f in feats[-2::-1]:
            lat = nn.Conv(c.decoder_width, (1, 1), dtype=self.dtype)(f)
            b_, hh, ww, cc = lat.shape
            d = jax.image.resize(d, (b_, hh, ww, cc), "bilinear")
            d = d + lat
            d = nn.Conv(c.decoder_width, (3, 3), padding=1, dtype=self.dtype)(d)
            d = nn.relu(d)

        d = nn.Conv(c.decoder_width // 2, (3, 3), padding=1, dtype=self.dtype)(d)
        d = nn.relu(d)
        b_, hh, ww, _ = d.shape
        d = jax.image.resize(
            d, (b_, x.shape[1], x.shape[2], d.shape[-1]), "bilinear"
        )
        depth = nn.Conv(1, (3, 3), padding=1, dtype=self.dtype)(d)
        return nn.softplus(depth[..., 0])
