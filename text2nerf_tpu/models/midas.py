"""MiDaS v2.1 monocular depth network (Flax) — base estimator depthNet=0
of the boosted-depth stack (/root/reference/scripts/depth_esti_boosting.py:
180-191, 495-533).

Faithful re-architecture of the reference model
(midas/models/midas_net.py:12-76, midas/models/blocks.py) so the published
``midas/model.pt`` checkpoint converts and loads:

- backbone: ResNeXt101-32x8d-WSL (torchvision ResNet layout; identical
  block structure to the LeReS encoder — models/leres.ResNetEncoder is
  reused), exposed as pretrained.layer1..layer4;
- scratch: four bias-free 3x3 convs to a common 256-feature width;
- decoder: RefineNet-style FeatureFusionBlocks (two ResidualConvUnits +
  ×2 bilinear align_corners=True upsample) cascaded top-down;
- head: conv(256→128) → ×2 bilinear (align_corners=False) → conv(128→32)
  → ReLU → 1x1 conv → ReLU (non_negative).

Output is inverse depth (disparity); depth_process maps it to metric
depth for the pipeline (dataLoader/scene_gen.py:16-29).
Conversion map: services/weight_convert.midas_name_map; parity is
torch-verified in tests/test_midas_convert.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .leres import LeReSConfig, ResNetEncoder, resize_bilinear_align_corners


class ResidualConvUnit(nn.Module):
    """blocks.py:82-118: ReLU→conv→ReLU→conv with identity skip."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.relu(x)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        return h + x


class FeatureFusionBlock(nn.Module):
    """blocks.py:121-153: optional lateral RCU add, RCU, ×2 up
    (align_corners=True)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None):
        out = x
        if skip is not None:
            out = out + ResidualConvUnit(self.features, self.dtype,
                                         name="resConfUnit1")(skip)
        out = ResidualConvUnit(self.features, self.dtype,
                               name="resConfUnit2")(out)
        b, h, w, c = out.shape
        return resize_bilinear_align_corners(out, (h * 2, w * 2))


class MidasNet(nn.Module):
    """(B, H, W, 3) ImageNet-normalized RGB → (B, H, W) inverse depth."""

    cfg: LeReSConfig = LeReSConfig.resnext101()
    features: int = 256
    non_negative: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = ResNetEncoder(self.cfg, self.dtype, name="pretrained")(x)
        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name=f"layer{i + 1}_rn")(f)
            for i, f in enumerate(feats)
        ]
        p = FeatureFusionBlock(self.features, self.dtype,
                               name="refinenet4")(rn[3])
        p = FeatureFusionBlock(self.features, self.dtype,
                               name="refinenet3")(p, rn[2])
        p = FeatureFusionBlock(self.features, self.dtype,
                               name="refinenet2")(p, rn[1])
        p = FeatureFusionBlock(self.features, self.dtype,
                               name="refinenet1")(p, rn[0])

        out = nn.Conv(128, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv1")(p)
        b, h, w, c = out.shape
        # Interpolate(scale_factor=2, mode='bilinear', align_corners=False)
        # — the half-pixel convention jax.image.resize implements
        out = jax.image.resize(out, (b, h * 2, w * 2, c), "bilinear")
        out = nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                      name="output_conv2")(out)
        out = nn.relu(out)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="output_conv3")(out)
        if self.non_negative:
            out = nn.relu(out)
        return out[..., 0]


def midas_resize_shape(h: int, w: int, target: int = 384,
                       multiple_of: int = 32):
    """The MiDaS Resize transform's output shape (keep_aspect_ratio=True,
    resize_method='upper_bound', ensure_multiple_of=32 —
    midas/models/transforms.py:94-126 used by estimatemidas,
    depth_esti_boosting.py:498-512): the smaller scale bounds both sides,
    each rounded to a multiple of 32 but floored when over the target."""

    def constrain(x):
        y = int(round(x / multiple_of) * multiple_of)
        if y > target:
            y = int(x // multiple_of * multiple_of)
        return max(y, multiple_of)

    scale = min(target / h, target / w)
    return constrain(scale * h), constrain(scale * w)
