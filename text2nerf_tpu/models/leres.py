"""LeReS relative-depth network (Flax) — the default base estimator of the
boosted-depth stack (depthNet=2, /root/reference/scripts/depth_esti_boosting.py:145).

Faithful re-architecture of the reference model so the published
``res101.pth`` checkpoint converts and loads:

- encoder: torchvision-style ResNeXt101-32x8d stride-32 pyramid returning
  the four lateral features (lib/Resnext_torch.py:119-236,
  network_auxi.py:64-97);
- decoder: FTB/FFM/AO top-down fusion (lib/network_auxi.py:15-62,100-281):
  FTB(2048→512) → conv(512→256) → ×2 up → FFM(1024) → FFM(512) → FFM(256)
  → AO(256→1), all upsampling bilinear with align_corners=True;
- wrapper: RelDepthModel.inference returns raw depth logits
  (lib/multi_depth_model_woauxi.py:6-20).

BatchNorms are frozen (inference-only in the pipeline): running stats
convert to plain parameters, keeping the conversion map mechanical and the
whole net one jit region.  Conversion lives in services/weight_convert.py
(leres_name_map); parity is torch-verified in tests/test_leres_convert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


# ImageNet normalization used by estimateleres (depth_esti_boosting.py
# scale_torch: mean (0.485, 0.456, 0.406), std (0.229, 0.224, 0.225))
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm2d: running mean/var are converted
    parameters, so torch's eval-time semantics hold exactly."""

    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return (x - mean) * inv + bias


def resize_bilinear_align_corners(x, out_hw: Tuple[int, int]):
    """Bilinear resize with torch's align_corners=True grid (source index
    i_out·(H_in−1)/(H_out−1)); jax.image.resize only offers the
    half-pixel convention."""
    b, h, w, c = x.shape
    ho, wo = out_hw
    ys = jnp.linspace(0.0, h - 1.0, ho) if ho > 1 else jnp.zeros((1,))
    xs = jnp.linspace(0.0, w - 1.0, wo) if wo > 1 else jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    rows = x[:, y0] * (1 - wy) + x[:, y1] * wy           # (B, Ho, W, C)
    return rows[:, :, x0] * (1 - wx) + rows[:, :, x1] * wx


class Bottleneck(nn.Module):
    """torchvision ResNet-V1.5 bottleneck (stride on the 3x3 conv),
    grouped for ResNeXt (lib/Resnext_torch.py:70-116)."""

    planes: int
    stride: int = 1
    groups: int = 1
    base_width: int = 64
    has_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * self.base_width / 64.0) * self.groups
        out_ch = self.planes * 4
        h = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(h))
        h = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    padding=1, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = FrozenBatchNorm(dtype=self.dtype, name="bn3")(h)
        if self.has_downsample:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype,
                        name="downsample_conv")(x)
            x = FrozenBatchNorm(dtype=self.dtype, name="downsample_bn")(x)
        return nn.relu(x + h)


@dataclasses.dataclass(frozen=True)
class LeReSConfig:
    blocks: Tuple[int, ...] = (3, 4, 23, 3)
    planes: Tuple[int, ...] = (64, 128, 256, 512)
    groups: int = 32
    base_width: int = 8
    # decoder mid channels (network_auxi.py:19: [256, 256, 256, 512])
    mid: Tuple[int, ...] = (256, 256, 256, 512)

    @staticmethod
    def resnext101():  # the res101.pth configuration
        return LeReSConfig()

    @staticmethod
    def resnet50():  # resnet50_stride32 (network_auxi.py:8-9)
        return LeReSConfig(blocks=(3, 4, 6, 3), groups=1, base_width=64)

    @staticmethod
    def tiny():
        return LeReSConfig(blocks=(1, 1, 1, 1), planes=(8, 16, 32, 64),
                           groups=2, base_width=8, mid=(16, 16, 16, 32))


class ResNetEncoder(nn.Module):
    """Stride-32 pyramid; returns [1/4, 1/8, 1/16, 1/32] lateral features
    (Resnext_torch.ResNet._forward_impl:196-220)."""

    cfg: LeReSConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        h = nn.Conv(c.planes[0], (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn1")(h))
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        inplanes = c.planes[0]
        for s, (planes, n_blocks) in enumerate(zip(c.planes, c.blocks)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and s > 0) else 1
                has_ds = b == 0 and (stride != 1 or inplanes != planes * 4)
                h = Bottleneck(
                    planes, stride, c.groups, c.base_width, has_ds,
                    self.dtype, name=f"layer{s + 1}_{b}",
                )(h)
                inplanes = planes * 4
            feats.append(h)
        return feats


class FTB(nn.Module):
    """Feature-transfer block (network_auxi.py:100-124): 3x3 conv then a
    residual ReLU→conv→BN→ReLU→conv branch."""

    mid: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(x)
        h = nn.Conv(self.mid, (3, 3), padding=1, dtype=self.dtype,
                    name="branch_conv1")(h)
        h = FrozenBatchNorm(dtype=self.dtype, name="branch_bn")(h)
        h = nn.relu(h)
        h = nn.Conv(self.mid, (3, 3), padding=1, dtype=self.dtype,
                    name="branch_conv2")(h)
        return nn.relu(x + h)


class FFM(nn.Module):
    """Feature-fusion: FTB(low) + high → FTB → ×upfactor bilinear
    align-corners upsample (network_auxi.py:191-213)."""

    mid: int
    out: int
    upfactor: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, low, high):
        x = FTB(self.mid, self.dtype, name="ftb1")(low)
        x = x + high
        x = FTB(self.out, self.dtype, name="ftb2")(x)
        b, h, w, c = x.shape
        return resize_bilinear_align_corners(
            x, (h * self.upfactor, w * self.upfactor))


class AO(nn.Module):
    """Adaptive output head: conv→BN→ReLU→conv→×2 upsample
    (network_auxi.py:238-259)."""

    out: int = 1
    upfactor: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Conv(c // 2, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(FrozenBatchNorm(dtype=self.dtype, name="bn")(h))
        h = nn.Conv(self.out, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        b, hh, ww, _ = h.shape
        return resize_bilinear_align_corners(
            h, (hh * self.upfactor, ww * self.upfactor))


class LeReSDecoder(nn.Module):
    """network_auxi.Decoder:15-62."""

    cfg: LeReSConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        mid = self.cfg.mid
        x = FTB(mid[3], self.dtype, name="conv")(feats[3])        # 1/32
        x = nn.Conv(mid[2], (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(x)
        b, h, w, c = x.shape
        x = resize_bilinear_align_corners(x, (h * 2, w * 2))      # 1/16
        x = FFM(mid[2], mid[2], dtype=self.dtype, name="ffm2")(feats[2], x)
        x = FFM(mid[1], mid[1], dtype=self.dtype, name="ffm1")(feats[1], x)
        x = FFM(mid[0], mid[0], dtype=self.dtype, name="ffm0")(feats[0], x)
        return AO(1, 2, self.dtype, name="outconv")(x)


class RelDepthModel(nn.Module):
    """Full LeReS model: (B, H, W, 3) ImageNet-normalized RGB → (B, H, W)
    raw relative-depth logits (multi_depth_model_woauxi.py:15-20 applies
    no activation)."""

    cfg: LeReSConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = ResNetEncoder(self.cfg, self.dtype, name="encoder")(x)
        return LeReSDecoder(self.cfg, self.dtype, name="decoder")(feats)[..., 0]


def normalize_imagenet(rgb01):
    """[0,1] RGB → the normalization estimateleres applies
    (depth_esti_boosting.py scale_torch)."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (rgb01 - mean) / std
