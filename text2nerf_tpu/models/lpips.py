"""LPIPS perceptual metric (Flax).

Equivalent of the lpips package usage in the reference
(/root/reference/utils.py:412-424): normalized AlexNet/VGG feature stacks
compared per layer through learned 1x1 linear heads.  Requires converted
pretrained weights (services/weight_convert.py); construction without them
raises, since a random-weight LPIPS is meaningless as a metric.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class AlexFeatures(nn.Module):
    """AlexNet conv stack; returns the 5 relu feature maps."""

    @nn.compact
    def __call__(self, x):
        feats = []
        h = nn.relu(nn.Conv(64, (11, 11), (4, 4), padding=2)(x))
        feats.append(h)
        h = nn.max_pool(h, (3, 3), (2, 2))
        h = nn.relu(nn.Conv(192, (5, 5), padding=2)(h))
        feats.append(h)
        h = nn.max_pool(h, (3, 3), (2, 2))
        h = nn.relu(nn.Conv(384, (3, 3), padding=1)(h))
        feats.append(h)
        h = nn.relu(nn.Conv(256, (3, 3), padding=1)(h))
        feats.append(h)
        h = nn.relu(nn.Conv(256, (3, 3), padding=1)(h))
        feats.append(h)
        return feats


class VGG16Features(nn.Module):
    """VGG16 conv stack; returns relu1_2..relu5_3."""

    @nn.compact
    def __call__(self, x):
        feats = []
        widths = (64, 128, 256, 512, 512)
        convs = (2, 2, 3, 3, 3)
        h = x
        for stage, (wd, n) in enumerate(zip(widths, convs)):
            for _ in range(n):
                h = nn.relu(nn.Conv(wd, (3, 3), padding=1)(h))
            feats.append(h)
            if stage < 4:
                h = nn.max_pool(h, (2, 2), (2, 2))
        return feats


class LPIPSModel:
    def __init__(self, net: str, feature_params, lin_weights: Sequence[np.ndarray]):
        self.backbone = AlexFeatures() if net == "alex" else VGG16Features()
        self.params = feature_params
        self.lins = [jnp.asarray(w) for w in lin_weights]
        self._fn = jax.jit(self._distance)

    @staticmethod
    def create(net: str = "alex", weights_dir=None) -> "LPIPSModel":
        from ..services.weight_convert import load_converted
        import os

        tree = (
            load_converted(os.path.join(weights_dir, f"lpips_{net}"))
            if weights_dir
            else None
        )
        if tree is None:
            raise FileNotFoundError(
                f"LPIPS-{net} requires converted pretrained weights "
                f"(weights_dir/lpips_{net}.npz); none found."
            )
        # converted lins arrive as a {"0".."4"} dict of torch-shaped
        # (1, C, 1, 1) tensors; _distance broadcasts them over NHWC
        # channels, so flatten to (C,)
        lins = tree["lins"]
        if isinstance(lins, dict):
            lins = [lins[str(i)] for i in range(len(lins))]
        lins = [np.asarray(w).reshape(-1) for w in lins]
        return LPIPSModel(net, tree["features"], lins)

    def _distance(self, img0, img1):
        def norm_input(x):
            x = x * 2 - 1
            return (x - _SHIFT) / _SCALE

        f0 = self.backbone.apply({"params": self.params}, norm_input(img0)[None])
        f1 = self.backbone.apply({"params": self.params}, norm_input(img1)[None])
        total = 0.0
        for a, b, lin in zip(f0, f1, self.lins):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
        return total

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> float:
        return float(self._fn(jnp.asarray(img0), jnp.asarray(img1)))
