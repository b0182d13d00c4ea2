"""Pretrained-weight conversion: torch/safetensors checkpoints → Flax trees.

The reference loads five pretrained networks from its ``weights/`` tree
(SD-2.1-base, SD-2-inpainting, clip-vit-base-patch32, LeReS, the merge
pix2pix — README install section, text2nerf_main.py:25-26,
inpaint_sdm.py:52-56, merge_model_single_channel.py:16-20).  On an
air-gapped TPU pod the converted artifacts are produced once (any machine
with the torch checkpoints) and shipped as .npz trees.

Conversion conventions torch → Flax/NHWC:
- Conv2d weight (O, I, kh, kw) → (kh, kw, I, O)
- ConvTranspose2d weight (I, O, kh, kw) → (kh, kw, O, I) flipped spatially
- Linear weight (O, I) → (I, O)
- GroupNorm/LayerNorm weight/bias → scale/bias

``convert_torch_state_dict`` handles the mechanical transposes; the
name-mapping tables for each network live with their model definitions and
are completed when real checkpoints are available to verify against
(tracked as a round-2 item).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np


def convert_tensor(name: str, arr: np.ndarray) -> np.ndarray:
    """Apply the layout transpose implied by the parameter name/shape."""
    if arr.ndim == 4:
        if "transpose" in name or "up." in name and "conv" in name:
            # ConvTranspose2d: (I, O, kh, kw) → (kh, kw, O, I), flipped
            return arr.transpose(2, 3, 1, 0)[::-1, ::-1]
        return arr.transpose(2, 3, 1, 0)  # Conv2d → HWIO
    if arr.ndim == 2 and ("weight" in name or name.endswith(".w")):
        return arr.T
    return arr


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray], name_map: Dict[str, str]
) -> dict:
    """state_dict + {torch_name: flax/path/name} → nested Flax tree."""
    tree: dict = {}
    for tname, fpath in name_map.items():
        if tname not in state_dict:
            continue
        arr = convert_tensor(tname, np.asarray(state_dict[tname]))
        node = tree
        parts = fpath.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def load_torch_checkpoint(path: str) -> Optional[Dict[str, np.ndarray]]:
    """Load a .safetensors / .bin / .pt state dict as numpy arrays."""
    if path.endswith(".safetensors") and os.path.exists(path):
        from safetensors.numpy import load_file

        return load_file(path)
    if os.path.exists(path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if "state_dict" in sd:
            sd = sd["state_dict"]
        return {k: v.numpy() for k, v in sd.items()}
    return None


def patchgan_name_map(n_layers: int = 3) -> Dict[str, str]:
    """torch→Flax name map for the PatchGAN discriminator.

    The torch module (NLayerDiscriminator, merge_model_sc/networks.py:546+)
    is a flat nn.Sequential of Conv2d/LeakyReLU: conv layers sit at indices
    0, 2, 4, ... (stride-2 stack), then the stride-1 conv and the 1-channel
    head.  Our Flax PatchDiscriminator names them Conv_0..Conv_{n+1}.
    """
    name_map = {}
    # sequential indices of the Conv2d layers: first conv at 0, then each
    # (conv, leaky) pair advances by 2 (norm='none' in the merge config)
    torch_idx = 0
    for flax_idx in range(n_layers + 2):
        name_map[f"model.{torch_idx}.weight"] = f"Conv_{flax_idx}/kernel"
        name_map[f"model.{torch_idx}.bias"] = f"Conv_{flax_idx}/bias"
        torch_idx += 2
    return name_map


def save_converted(path: str, tree: dict):
    from ..engine.checkpoints import _flatten

    np.savez(path, **_flatten(tree))


def load_converted(weights_path: str) -> Optional[dict]:
    """Load a previously converted .npz tree (returns None if absent)."""
    candidates = [weights_path, weights_path + ".npz",
                  os.path.join(weights_path, "converted.npz")]
    for cand in candidates:
        if os.path.isfile(cand) and cand.endswith(".npz"):
            from ..engine.checkpoints import _unflatten

            return _unflatten(dict(np.load(cand)))
    return None
