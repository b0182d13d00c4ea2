"""Per-checkpoint expectation manifests for a reference-style weights/ tree.

Day-one real-weights acceptance: every pretrained family the reference
installs (README install list; scripts/text2img_sdm.py:7-16,
scripts/inpaint_sdm.py:48-56, scripts/depth_esti_boosting.py:171-202,
scripts/merge_model_single_channel.py:16-20, text2nerf_main.py:25-26,274)
either validates cleanly against its manifest or fails with a PRECISE
diff naming the offending file / state-dict key / shape and the
conversion map it belongs to — instead of a bare "layout mismatch" count.

Two validation tiers:

- **Torch-checkpoint families** (LeReS, MiDaS, SGRNet, merge pix2pix,
  CLIP): the expected torch shape of EVERY mapped key is derived from the
  Flax reference tree (``jax.eval_shape`` of the in-tree architecture) by
  inverting the conversion layout rules (weight_convert.convert_tensor),
  so the audit covers the full state dict and cannot drift from the maps.
- **Diffusers trees** (SD 2.1-base / SD-2-inpainting): required files +
  literal spot-tensor shapes checked straight off the state-dict files
  (no model build) — enough to catch a wrong model variant (e.g. a
  4-channel base UNet where the 9-channel inpainting UNet belongs, or an
  SD-1.x text encoder with hidden 768 instead of 1024).

Epsilon conventions (applied by the conversions, recorded here for the
acceptance report): torch LayerNorm / HF CLIP eps 1e-5; SD UNet GroupNorm
eps 1e-5; SD VAE GroupNorm eps 1e-6; torch gelu is erf (flax default is
tanh — the models pass approximate=False); LeReS/MiDaS/SGRNet BatchNorm
runs frozen with the checkpoint's running stats.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

MAX_NAMED_DIFFS = 10

EPS_NOTES = {
    "stable-diffusion-2-1-base": "text LN 1e-5, UNet GN 1e-5, VAE GN 1e-6",
    "stable-diffusion-2-inpainting": "text LN 1e-5, UNet GN 1e-5, VAE GN 1e-6",
    "leres": "frozen BN (running stats), align_corners=True upsampling",
    "midas": "frozen BN (running stats)",
    "sgrnet": "frozen BN (running stats)",
    "merge_model_sc": "norm='none' unet_1024 (Identity norms skip indices)",
    "clip-vit-base-patch32": "LN eps 1e-5, quick_gelu",
}

# Diffusers-tree manifests: required files + spot tensors (torch shapes).
# conv_in distinguishes base (4 latent ch) from inpainting (4+4+1=9 ch,
# the masked-latent concat of StableDiffusionInpaintPipeline); the token
# embedding width distinguishes the SD-2.x OpenCLIP text tower (1024)
# from an SD-1.x one (768).
_SD_FILES = [
    "unet/config.json",
    "vae/config.json",
    "text_encoder/config.json",
    "scheduler/scheduler_config.json",
    "tokenizer/vocab.json",
    "tokenizer/merges.txt",
]
_SD_CKPTS = {
    "unet": ("unet/diffusion_pytorch_model.safetensors",
             "unet/diffusion_pytorch_model.bin"),
    "vae": ("vae/diffusion_pytorch_model.safetensors",
            "vae/diffusion_pytorch_model.bin"),
    "text_encoder": ("text_encoder/model.safetensors",
                     "text_encoder/pytorch_model.bin"),
}
_SD_SPOTS = {
    "stable-diffusion-2-1-base": {
        "unet": {"conv_in.weight": (320, 4, 3, 3),
                 "time_embedding.linear_1.weight": (1280, 320)},
        "vae": {"encoder.conv_in.weight": (128, 3, 3, 3),
                "decoder.conv_in.weight": (512, 4, 3, 3)},
        "text_encoder": {
            "text_model.embeddings.token_embedding.weight": (49408, 1024)},
    },
    "stable-diffusion-2-inpainting": {
        "unet": {"conv_in.weight": (320, 9, 3, 3),
                 "time_embedding.linear_1.weight": (1280, 320)},
        "vae": {"encoder.conv_in.weight": (128, 3, 3, 3),
                "decoder.conv_in.weight": (512, 4, 3, 3)},
        "text_encoder": {
            "text_model.embeddings.token_embedding.weight": (49408, 1024)},
    },
}


def expected_torch_shape(fpath: str, flax_shape) -> tuple:
    """Invert weight_convert.convert_tensor: Flax reference leaf shape →
    the torch shape the checkpoint must carry for this mapped name."""
    s = tuple(int(x) for x in flax_shape)
    if fpath.startswith("convT:"):
        # flax (kh, kw, I, O) <- torch (I, O, kh, kw)
        return (s[2], s[3], s[0], s[1]) if len(s) == 4 else s
    if fpath.startswith("raw:"):
        return s
    if fpath.startswith("lin:"):
        # stored either as (O, I) linear or (O, I, 1, 1) conv; report the
        # linear form (the audit accepts both)
        return (s[1], s[0]) if len(s) == 2 else s
    if len(s) == 4:
        # flax HWIO <- torch OIHW
        return (s[3], s[2], s[0], s[1])
    if len(s) == 2:
        return (s[1], s[0])
    return s


def _flax_leaf(ref, fpath: str):
    node = ref
    for p in fpath.split(":")[-1].split("/"):
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def audit_state_dict(state: Dict, name_map: Dict[str, str], ref,
                     map_name: str, min_coverage: float = 0.99) -> List[str]:
    """Full layout audit of a torch state dict against a conversion map.

    Returns a list of named diffs (empty = clean): missing mapped keys
    when coverage falls under ``min_coverage`` (optional keys like
    conv_shortcut absorb the slack), and a shape mismatch line for every
    present key whose torch shape disagrees with the expectation derived
    from the Flax reference leaf.
    """
    diffs: List[str] = []
    missing = [k for k in name_map if k not in state]
    if len(name_map) - len(missing) < min_coverage * len(name_map):
        for k in missing[:MAX_NAMED_DIFFS]:
            diffs.append(f"{map_name}: missing key {k!r}")
        if len(missing) > MAX_NAMED_DIFFS:
            diffs.append(
                f"{map_name}: ... {len(missing) - MAX_NAMED_DIFFS} more "
                f"missing ({len(name_map) - len(missing)}/{len(name_map)} "
                "mapped keys present)"
            )
    n_shape = 0
    for tname, fpath in name_map.items():
        if tname not in state:
            continue
        leaf = _flax_leaf(ref, fpath)
        if leaf is None:
            continue
        want = expected_torch_shape(fpath, leaf.shape)
        got = tuple(int(x) for x in state[tname].shape)
        if fpath.startswith("lin:") and len(got) == 4:
            got = got[:2]  # (O, I, 1, 1) conv storage of a linear
        if got != want:
            n_shape += 1
            if n_shape <= MAX_NAMED_DIFFS:
                diffs.append(
                    f"{map_name}: {tname!r} has shape {got}, expected "
                    f"{want} (flax leaf {fpath.split(':')[-1]!r})"
                )
    if n_shape > MAX_NAMED_DIFFS:
        diffs.append(f"{map_name}: ... {n_shape - MAX_NAMED_DIFFS} more "
                     "shape mismatches")
    return diffs


def _report(family: str, status: str, diffs=None, detail: str = "") -> dict:
    return {
        "family": family, "status": status, "diffs": list(diffs or []),
        "detail": detail, "eps": EPS_NOTES.get(family, ""),
    }


def _np_state(path: str) -> Optional[Dict]:
    from . import weight_convert as WC

    return WC.load_torch_checkpoint(path)


def _validate_sd_tree(weights_dir: str, family: str) -> dict:
    d = os.path.join(weights_dir, family)
    if not os.path.isdir(d):
        return _report(family, "absent")
    diffs = []
    for f in _SD_FILES:
        if not os.path.exists(os.path.join(d, f)):
            diffs.append(f"missing file {f}")
    for part, cands in _SD_CKPTS.items():
        path = next(
            (os.path.join(d, c) for c in cands
             if os.path.exists(os.path.join(d, c))), None)
        if path is None:
            diffs.append(f"missing checkpoint {cands[0]} (or .bin)")
            continue
        state = _np_state(path)
        if state is None:
            diffs.append(f"unreadable checkpoint {path}")
            continue
        for key, want in _SD_SPOTS[family][part].items():
            if key not in state:
                diffs.append(f"{part}: missing key {key!r}")
            elif tuple(state[key].shape) != want:
                diffs.append(
                    f"{part}: {key!r} has shape "
                    f"{tuple(state[key].shape)}, expected {want}"
                )
    return _report(family, "error" if diffs else "ok", diffs)


def _leres_like(weights_dir: str, family: str) -> dict:
    """LeReS res101.pth / MiDaS model.pt / SGRNet model.pth.tar — full
    map-driven audit with the loaders' own checkpoint normalization."""
    import jax
    import jax.numpy as jnp

    from . import weight_convert as WC
    from .depth_service import (
        _find_leres_checkpoint, _find_midas_checkpoint,
        _find_sgrnet_checkpoint,
    )
    from ..models.leres import LeReSConfig, RelDepthModel

    find = {"leres": _find_leres_checkpoint, "midas": _find_midas_checkpoint,
            "sgrnet": _find_sgrnet_checkpoint}[family]
    ckpt = (find(os.path.join(weights_dir, "leres")) or find(weights_dir))
    if ckpt is None:
        return _report(family, "absent")
    import torch

    raw = torch.load(ckpt, map_location="cpu", weights_only=True)
    if isinstance(raw, dict):
        raw = raw.get("depth_model", raw.get("state_dict", raw))
    state = {}
    for k, v in raw.items():
        if k.startswith("module."):
            k = k[len("module."):]
        state[k] = v.numpy() if hasattr(v, "numpy") else v

    if family == "leres":
        cfg = LeReSConfig.resnext101()
        name_map = WC.leres_name_map(cfg)
        map_name = "leres_name_map(resnext101)"
        model = RelDepthModel(cfg)
    elif family == "sgrnet":
        cfg = LeReSConfig.resnet50()
        name_map = WC.sgrnet_name_map(cfg)
        map_name = "sgrnet_name_map(resnet50)"
        model = RelDepthModel(cfg)
    else:
        from ..models.midas import MidasNet

        cfg = LeReSConfig.resnext101()
        name_map = WC.midas_name_map(cfg)
        map_name = "midas_name_map(resnext101)"
        model = MidasNet(cfg)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))["params"]
    diffs = audit_state_dict(state, name_map, ref, map_name)
    return _report(family, "error" if diffs else "ok", diffs, ckpt)


def _validate_merge(weights_dir: str) -> dict:
    import glob

    import jax
    import jax.numpy as jnp

    from . import weight_convert as WC
    from ..models.pix2pix import UnetGenerator

    cands = sorted(glob.glob(
        os.path.join(weights_dir, "merge_model_sc", "**", "*net_G*.pth"),
        recursive=True,
    )) + sorted(glob.glob(
        os.path.join(weights_dir, "**", "epoch_*"), recursive=True))
    cands = [c for c in cands if os.path.isfile(c)]
    if not cands:
        return _report("merge_model_sc", "absent")
    state = _np_state(cands[0])
    if state is None:
        return _report("merge_model_sc", "error",
                       [f"unreadable checkpoint {cands[0]}"])
    net = UnetGenerator(input_nc=1, output_nc=1, num_downs=10)
    # eval_shape only (no compute), so the full 1024 input is free
    ref = jax.eval_shape(lambda: net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1024, 1))))["params"]
    diffs = audit_state_dict(
        state, WC.unet_generator_name_map(10),
        ref, "unet_generator_name_map(10)")
    return _report("merge_model_sc", "error" if diffs else "ok", diffs,
                   cands[0])


def _validate_clip(weights_dir: str) -> dict:
    import jax
    import jax.numpy as jnp

    from . import weight_convert as WC
    from ..models.clip import (
        CLIPTextConfig, CLIPTextEncoder, CLIPVisionConfig, CLIPVisionEncoder,
    )

    family = "clip-vit-base-patch32"
    d = os.path.join(weights_dir, family)
    if not os.path.isdir(d):
        return _report(family, "absent")
    path = next(
        (os.path.join(d, f) for f in ("model.safetensors",
                                      "pytorch_model.bin")
         if os.path.exists(os.path.join(d, f))), None)
    if path is None:
        return _report(family, "error",
                       ["missing checkpoint model.safetensors (or "
                        "pytorch_model.bin)"])
    state = _np_state(path)
    if state is None:
        return _report(family, "error", [f"unreadable checkpoint {path}"])
    vcfg = CLIPVisionConfig.vit_b32()
    vref = jax.eval_shape(lambda: CLIPVisionEncoder(vcfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3))))["params"]
    diffs = audit_state_dict(
        state, WC.clip_vision_name_map(vcfg.layers), vref,
        "clip_vision_name_map")
    tcfg = CLIPTextConfig.vit_b32()
    tref = jax.eval_shape(lambda: CLIPTextEncoder(tcfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32)))["params"]
    diffs += audit_state_dict(
        state, WC.clip_text_name_map(tcfg.layers), tref,
        "clip_text_name_map")
    return _report(family, "error" if diffs else "ok", diffs, path)


def validate_tree(weights_dir: str) -> List[dict]:
    """Validate every family found under ``weights_dir``.

    Returns one report dict per family: status ok / absent / error with
    ``diffs`` naming each offending file, key, or shape and the
    conversion map it belongs to.  An empty/absent tree is all-absent
    (valid: the services fall back to the hermetic procedural priors).
    """
    if not weights_dir or not os.path.isdir(weights_dir):
        return [_report(f, "absent") for f in EPS_NOTES]
    reports = [
        _validate_sd_tree(weights_dir, "stable-diffusion-2-1-base"),
        _validate_sd_tree(weights_dir, "stable-diffusion-2-inpainting"),
        _leres_like(weights_dir, "leres"),
        _leres_like(weights_dir, "midas"),
        _leres_like(weights_dir, "sgrnet"),
        _validate_merge(weights_dir),
        _validate_clip(weights_dir),
    ]
    return reports
