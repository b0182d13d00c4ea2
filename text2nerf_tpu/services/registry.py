"""Service registry: bundles the generative priors behind one injectable
interface.

The reference constructs its pipelines inline (inpaint_sdm.py:52-56,
text2nerf_main.py:25-26) making the loop untestable without GPUs+weights
(SURVEY §4).  Here every prior is a callable on a Services object; the
default factory returns the real diffusion/CLIP/depth implementations when
their weights are present and the hermetic fallbacks otherwise.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional, Sequence

import numpy as np

from . import fallbacks
from .merge import DepthMergeService


@dataclasses.dataclass
class Services:
    """The generative prior bundle used by the progressive trainer."""

    # (prompt, negative_prompt) -> (H, W, 3) float image in [0, 1]
    text2img: Callable[..., np.ndarray]
    # (image01, holes_mask, prompt, negative_prompt, num_images) -> [candidates]
    inpaint: Callable[..., List[np.ndarray]]
    # (image01) -> 16-bit depth counts (LeReS convention)
    estimate_depth: Callable[..., np.ndarray]
    # (candidates, reference01) -> scores, higher is better
    rank: Callable[[Sequence[np.ndarray], np.ndarray], np.ndarray]
    # per-view depth-merge finetuner
    merge: DepthMergeService
    # what each family ACTUALLY resolved to: 'real' | 'fallback' | 'init'
    # (filled by default_services; hand-built bundles may leave it empty).
    # Surfaced so acceptance runs (tools/smoke_real_weights.py) can assert
    # the pretrained path is live instead of silently procedural.
    resolution: dict = dataclasses.field(default_factory=dict)


def default_services(
    weights_dir: Optional[str] = None,
    hw=(512, 512),
    merge_net_size: int = 1024,
    merge_num_downs: int = 10,
) -> Services:
    """Build the service bundle.

    ``weights_dir`` layout (mirrors the reference's ``weights/`` directory,
    README.md install instructions):
      stable-diffusion-2-1-base/   — text2img weights (torch/safetensors)
      stable-diffusion-2-inpainting/
      clip-vit-base-patch32/
      leres/                        — depth estimator backbone
      merge_model_sc.npz            — converted depth-merge generator
    Missing entries fall back to the procedural implementations.
    """
    weights_dir = weights_dir or ""

    def _has(sub):
        return bool(weights_dir) and os.path.exists(os.path.join(weights_dir, sub))

    if _has("stable-diffusion-2-1-base"):
        from .diffusion_service import make_text2img

        text2img = make_text2img(
            os.path.join(weights_dir, "stable-diffusion-2-1-base"), hw=hw
        )
    else:
        text2img = lambda prompt, negative_prompt="": fallbacks.procedural_text2img(
            prompt, negative_prompt, hw=hw
        )

    if _has("stable-diffusion-2-inpainting"):
        from .diffusion_service import make_inpaint

        inpaint = make_inpaint(
            os.path.join(weights_dir, "stable-diffusion-2-inpainting"), hw=hw
        )
    else:
        inpaint = fallbacks.diffusion_fill_inpaint

    if _has("leres"):
        from .depth_service import make_depth_estimator

        estimate_depth = make_depth_estimator(os.path.join(weights_dir, "leres"))
    else:
        estimate_depth = fallbacks.procedural_depth

    if _has("clip-vit-base-patch32"):
        from .clip_rank import make_clip_ranker

        rank = make_clip_ranker(os.path.join(weights_dir, "clip-vit-base-patch32"))
    else:
        rank = fallbacks.histogram_rank

    merge_ckpt = (
        os.path.join(weights_dir, "merge_model_sc.npz") if weights_dir else None
    )
    merge = DepthMergeService(
        ckpt_path=merge_ckpt, net_size=merge_net_size, num_downs=merge_num_downs
    )
    resolution = {
        "text2img": "real" if _has("stable-diffusion-2-1-base") else "fallback",
        "inpaint": "real" if _has("stable-diffusion-2-inpainting") else "fallback",
        "depth": "real" if _has("leres") else "fallback",
        "rank": "real" if _has("clip-vit-base-patch32") else "fallback",
        # the merge net always exists; 'init' = random-initialized weights
        "merge": "real" if _has("merge_model_sc.npz") else "init",
    }
    return Services(
        text2img=text2img,
        inpaint=inpaint,
        estimate_depth=estimate_depth,
        rank=rank,
        merge=merge,
        resolution=resolution,
    )
