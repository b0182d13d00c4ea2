"""CLIP-based inpainting-candidate ranking.

Equivalent of the CLIP cosine selection in the reference loop
(/root/reference/text2nerf_main.py:25-26, 195-220): embed the candidates
and the seed view with the CLIP vision tower, score by image-image cosine
scaled by exp(logit_scale), pick the max.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(images: Sequence[np.ndarray], size: int = 224) -> np.ndarray:
    """Resize + CLIP normalization (what CLIPProcessor does to images)."""
    import cv2

    out = []
    for img in images:
        x = cv2.resize(
            np.asarray(img, np.float32), (size, size),
            interpolation=cv2.INTER_CUBIC,
        )
        out.append((x - _CLIP_MEAN) / _CLIP_STD)
    return np.stack(out)


def make_clip_ranker(weights_path: str, logit_scale: float = 100.0):
    import jax
    import jax.numpy as jnp

    from ..models.clip import CLIPVisionEncoder, CLIPVisionConfig, cosine_scores
    from .weight_convert import load_converted

    cfg = CLIPVisionConfig.vit_b32()
    model = CLIPVisionEncoder(cfg)
    params = None
    converted = load_converted(weights_path)
    if converted is not None and "vision" in converted:
        params = converted["vision"]
    else:
        # HF checkpoint directory (clip-vit-base-patch32 layout)
        import os

        from .weight_convert import (
            clip_vision_name_map, convert_torch_state_dict,
            fill_missing_params, load_torch_checkpoint,
        )

        for fname in ("model.safetensors", "pytorch_model.bin"):
            path = os.path.join(weights_path, fname)
            state = load_torch_checkpoint(path)
            if state is not None:
                ref = model.init(
                    jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
                )["params"]
                tree = convert_torch_state_dict(
                    state, clip_vision_name_map(cfg.layers)
                )
                params = fill_missing_params(tree, ref)
                break
    if params is None:
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))
        )["params"]

    apply = jax.jit(model.apply)

    def rank(candidates: Sequence[np.ndarray], reference: np.ndarray):
        imgs = preprocess(list(candidates) + [reference])
        embeds = apply({"params": params}, jnp.asarray(imgs))["embeds"]
        scores = cosine_scores(embeds[:-1], embeds[-1:], logit_scale)
        return np.asarray(scores)

    return rank
