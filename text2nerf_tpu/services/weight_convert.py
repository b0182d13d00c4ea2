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


def convert_tensor(name: str, arr: np.ndarray, is_transpose: bool = False):
    """Apply the layout transpose implied by the parameter name/shape.

    Verified against torch (tests/test_weight_convert.py):
    - Conv2d (O, I, kh, kw) → HWIO;
    - ConvTranspose2d (I, O, kh, kw) → (kh, kw, I, O) with a spatial flip
      (flax ConvTranspose does not flip the kernel; torch's is the
      conv gradient) — exact to 1e-7.
    """
    if arr.ndim == 4:
        if is_transpose:
            return np.ascontiguousarray(arr.transpose(2, 3, 0, 1)[::-1, ::-1])
        return arr.transpose(2, 3, 1, 0)  # Conv2d → HWIO
    if arr.ndim == 2 and ("weight" in name or name.endswith(".w")):
        return arr.T
    return arr


def convert_torch_state_dict(
    state_dict: Dict[str, np.ndarray], name_map: Dict[str, str]
) -> dict:
    """state_dict + {torch_name: flax/path/name} → nested Flax tree.

    Flax-path markers: ``convT:`` = ConvTranspose2d weight (flip+transpose
    layout); ``raw:`` = no layout change (embedding tables and other
    2D ".weight" tensors that are not Linear matrices).
    """
    tree: dict = {}
    for tname, fpath in name_map.items():
        if tname not in state_dict:
            continue
        is_t = fpath.startswith("convT:")
        if is_t:
            fpath = fpath[len("convT:"):]
        if fpath.startswith("raw:"):
            fpath = fpath[len("raw:"):]
            arr = np.asarray(state_dict[tname])
        elif fpath.startswith("lin:"):
            # force-linear: old VAE checkpoints store the mid-attention
            # projections as 1x1 convs (C, C, 1, 1); newer ones as (C, C)
            fpath = fpath[len("lin:"):]
            arr = np.asarray(state_dict[tname])
            if arr.ndim == 4:
                arr = arr[..., 0, 0]
            arr = arr.T if arr.ndim == 2 else arr
        else:
            arr = convert_tensor(tname, np.asarray(state_dict[tname]), is_t)
        node = tree
        parts = fpath.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def fill_missing_params(tree: dict, reference_params) -> dict:
    """Complete a converted tree with zeros for parameters absent from the
    torch checkpoint (e.g. bias-free convs under norm='none' — our Flax
    convs always carry biases)."""
    import jax
    import jax.numpy as jnp

    def merge(ref, got):
        if isinstance(ref, dict):
            return {
                k: merge(v, (got or {}).get(k) if isinstance(got, dict) else None)
                for k, v in ref.items()
            }
        if got is None:
            return jnp.zeros_like(ref)
        return jnp.asarray(got)

    return merge(reference_params, tree)


def unet_generator_name_map(num_downs: int = 10) -> Dict[str, str]:
    """torch→Flax map for the pix2pix UnetGenerator under norm='none'
    (merge_model_sc/networks.py:444-543; Identity norm modules occupy
    Sequential indices).

    torch nesting: the outermost block is ``model``; each submodule sits at
    Sequential index 1 (outermost) or 3 (inner blocks).  Our Flax blocks are
    registered flat as UnetSkipBlock_{i} with i=0 the innermost.
    """
    name_map = {}
    n_blocks = max(num_downs, 5)  # innermost + (num_downs-5) middles + 3 + outermost

    node = "model"  # the outermost block's Sequential attribute
    for depth in range(n_blocks):
        flax_i = n_blocks - 1 - depth
        outermost = depth == 0
        innermost = depth == n_blocks - 1
        if outermost:
            down, up = f"{node}.0", f"{node}.3"
            node = f"{node}.1"  # submodule at Sequential index 1
        elif innermost:
            down, up = f"{node}.model.1", f"{node}.model.3"
        else:
            down, up = f"{node}.model.1", f"{node}.model.5"
            node = f"{node}.model.3"  # submodule at Sequential index 3
        name_map[down + ".weight"] = f"UnetSkipBlock_{flax_i}/Conv_0/kernel"
        name_map[down + ".bias"] = f"UnetSkipBlock_{flax_i}/Conv_0/bias"
        name_map[up + ".weight"] = (
            f"convT:UnetSkipBlock_{flax_i}/ConvTranspose_0/kernel"
        )
        name_map[up + ".bias"] = f"UnetSkipBlock_{flax_i}/ConvTranspose_0/bias"
    return name_map


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


def lpips_alex_name_map() -> Dict[str, str]:
    """torch→Flax map for LPIPS-alex: the torchvision AlexNet conv stack
    (features.{0,3,6,8,10}) + the lpips linear heads (lin{0..4}.model.1,
    1x1 convs)."""
    conv_idx = [0, 3, 6, 8, 10]
    name_map = {}
    for i, t in enumerate(conv_idx):
        name_map[f"features.{t}.weight"] = f"features/Conv_{i}/kernel"
        name_map[f"features.{t}.bias"] = f"features/Conv_{i}/bias"
    for i in range(5):
        name_map[f"lin{i}.model.1.weight"] = f"lins/{i}"
    return name_map


def lpips_vgg_name_map() -> Dict[str, str]:
    """torch→Flax map for LPIPS-vgg: the torchvision VGG16 conv stack
    (features.{0,2,5,7,10,12,14,17,19,21,24,26,28} — 2+2+3+3+3 convs,
    pools between stages carry no weights) + the 5 lpips linear heads.
    The reference's rgb_lpips(net_name='vgg') path (utils.py:413-425,
    extra/compute_metrics.py)."""
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    name_map = {}
    for i, t in enumerate(conv_idx):
        name_map[f"features.{t}.weight"] = f"features/Conv_{i}/kernel"
        name_map[f"features.{t}.bias"] = f"features/Conv_{i}/bias"
    for i in range(5):
        name_map[f"lin{i}.model.1.weight"] = f"lins/{i}"
    return name_map


def clip_vision_name_map(layers: int = 12) -> Dict[str, str]:
    """torch→Flax map for the HF CLIP vision tower + visual projection
    (clip-vit-base-patch32, used for candidate ranking,
    text2nerf_main.py:25-26).

    Flax side: models/clip.CLIPVisionEncoder (Conv_0 patch embed,
    class/positional embeddings, ln_pre, TransformerLayer_{i} with
    LayerNorm_0 → MaskedAttention_0(Dense_0..3 = q,k,v,out) → LayerNorm_1 →
    Dense_0/Dense_1 MLP, ln_post, visual_projection).
    """
    m = {
        "vision_model.embeddings.patch_embedding.weight": "Conv_0/kernel",
        "vision_model.embeddings.class_embedding": "class_embedding",
        "vision_model.embeddings.position_embedding.weight":
            "raw:positional_embedding",
        # HF's layer name carries the typo "pre_layrnorm"
        "vision_model.pre_layrnorm.weight": "ln_pre/scale",
        "vision_model.pre_layrnorm.bias": "ln_pre/bias",
        "vision_model.post_layernorm.weight": "ln_post/scale",
        "vision_model.post_layernorm.bias": "ln_post/bias",
        "visual_projection.weight": "visual_projection/kernel",
    }
    for i in range(layers):
        t = f"vision_model.encoder.layers.{i}"
        f = f"TransformerLayer_{i}"
        m[f"{t}.layer_norm1.weight"] = f"{f}/LayerNorm_0/scale"
        m[f"{t}.layer_norm1.bias"] = f"{f}/LayerNorm_0/bias"
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj", "out_proj")):
            m[f"{t}.self_attn.{proj}.weight"] = (
                f"{f}/MaskedAttention_0/Dense_{j}/kernel"
            )
            m[f"{t}.self_attn.{proj}.bias"] = (
                f"{f}/MaskedAttention_0/Dense_{j}/bias"
            )
        m[f"{t}.layer_norm2.weight"] = f"{f}/LayerNorm_1/scale"
        m[f"{t}.layer_norm2.bias"] = f"{f}/LayerNorm_1/bias"
        m[f"{t}.mlp.fc1.weight"] = f"{f}/Dense_0/kernel"
        m[f"{t}.mlp.fc1.bias"] = f"{f}/Dense_0/bias"
        m[f"{t}.mlp.fc2.weight"] = f"{f}/Dense_1/kernel"
        m[f"{t}.mlp.fc2.bias"] = f"{f}/Dense_1/bias"
    return m


def clip_text_name_map(layers: int = 12) -> Dict[str, str]:
    """torch→Flax map for the HF CLIP text tower + text projection (the SD
    conditioning encoder and the ranking text side).

    The penultimate-layer LayerNorm our encoder exposes as ``ln_skip``
    (skip_last_layers > 0) has no torch counterpart — HF applies the same
    final_layer_norm — so those weights map to both ln_final and ln_skip.
    """
    m = {
        "text_model.embeddings.token_embedding.weight": "raw:Embed_0/embedding",
        "text_model.embeddings.position_embedding.weight":
            "raw:positional_embedding",
        "text_model.final_layer_norm.weight": "ln_final/scale",
        "text_model.final_layer_norm.bias": "ln_final/bias",
        "text_projection.weight": "text_projection/kernel",
    }
    for i in range(layers):
        t = f"text_model.encoder.layers.{i}"
        f = f"TransformerLayer_{i}"
        m[f"{t}.layer_norm1.weight"] = f"{f}/LayerNorm_0/scale"
        m[f"{t}.layer_norm1.bias"] = f"{f}/LayerNorm_0/bias"
        for j, proj in enumerate(("q_proj", "k_proj", "v_proj", "out_proj")):
            m[f"{t}.self_attn.{proj}.weight"] = (
                f"{f}/MaskedAttention_0/Dense_{j}/kernel"
            )
            m[f"{t}.self_attn.{proj}.bias"] = (
                f"{f}/MaskedAttention_0/Dense_{j}/bias"
            )
        m[f"{t}.layer_norm2.weight"] = f"{f}/LayerNorm_1/scale"
        m[f"{t}.layer_norm2.bias"] = f"{f}/LayerNorm_1/bias"
        m[f"{t}.mlp.fc1.weight"] = f"{f}/Dense_0/kernel"
        m[f"{t}.mlp.fc1.bias"] = f"{f}/Dense_0/bias"
        m[f"{t}.mlp.fc2.weight"] = f"{f}/Dense_1/kernel"
        m[f"{t}.mlp.fc2.bias"] = f"{f}/Dense_1/bias"
    return m


def convert_clip_text(state_dict, layers: int, reference_params):
    """Convert an HF CLIP text checkpoint; duplicates the final LayerNorm
    into ln_skip when the target encoder exposes the penultimate layer."""
    tree = convert_torch_state_dict(state_dict, clip_text_name_map(layers))
    if "ln_final" in tree and "ln_skip" in reference_params:
        tree["ln_skip"] = dict(tree["ln_final"])
    return fill_missing_params(tree, reference_params)


# ---------------------------------------------------------------------------
# LeReS (res101.pth checkpoint layout) name map
# ---------------------------------------------------------------------------


def _bn_map(t: str, f: str) -> Dict[str, str]:
    """torch BatchNorm2d → models/leres.FrozenBatchNorm (running stats
    become plain parameters)."""
    return {
        f"{t}.weight": f"{f}/scale",
        f"{t}.bias": f"{f}/bias",
        f"{t}.running_mean": f"raw:{f}/mean",
        f"{t}.running_var": f"raw:{f}/var",
    }


def _ftb_map(t: str, f: str) -> Dict[str, str]:
    """network_auxi.FTB: conv1 + conv_branch Sequential(ReLU, Conv, BN,
    ReLU, Conv) — convs at indices 1 and 4, BN at 2."""
    m = {
        f"{t}.conv1.weight": f"{f}/conv1/kernel",
        f"{t}.conv1.bias": f"{f}/conv1/bias",
        f"{t}.conv_branch.1.weight": f"{f}/branch_conv1/kernel",
        f"{t}.conv_branch.1.bias": f"{f}/branch_conv1/bias",
        f"{t}.conv_branch.4.weight": f"{f}/branch_conv2/kernel",
        f"{t}.conv_branch.4.bias": f"{f}/branch_conv2/bias",
    }
    m.update(_bn_map(f"{t}.conv_branch.2", f"{f}/branch_bn"))
    return m


def leres_name_map(
    cfg,
    encoder_prefix: str = "depth_model.encoder_modules",
    decoder_prefix: str = "depth_model.decoder_modules",
) -> Dict[str, str]:
    """torch→Flax map for the LeReS RelDepthModel (res101.pth):
    depth_model.encoder_modules.* (torchvision ResNeXt layout,
    lib/Resnext_torch.py:119-236) and depth_model.decoder_modules.*
    (FTB/FFM/AO decoder, lib/network_auxi.py:15-62).

    SGRNet (structuredrl model.pth.tar) shares the exact architecture —
    ResNet50-V1.5 encoder + the same FTB/FFM/AO decoder
    (structuredrl/models/DepthNet.py:25-118, resnet.py, networks.py) —
    under the prefixes ``encoder`` / ``decoder`` (see sgrnet_name_map)."""
    e = encoder_prefix
    d = decoder_prefix
    m = {f"{e}.conv1.weight": "encoder/conv1/kernel"}
    m.update(_bn_map(f"{e}.bn1", "encoder/bn1"))
    inplanes = cfg.planes[0]
    for s, (planes, n_blocks) in enumerate(zip(cfg.planes, cfg.blocks)):
        for b in range(n_blocks):
            t = f"{e}.layer{s + 1}.{b}"
            f = f"encoder/layer{s + 1}_{b}"
            for k in (1, 2, 3):
                m[f"{t}.conv{k}.weight"] = f"{f}/conv{k}/kernel"
                m.update(_bn_map(f"{t}.bn{k}", f"{f}/bn{k}"))
            stride = 2 if (b == 0 and s > 0) else 1
            if b == 0 and (stride != 1 or inplanes != planes * 4):
                m[f"{t}.downsample.0.weight"] = f"{f}/downsample_conv/kernel"
                m.update(_bn_map(f"{t}.downsample.1", f"{f}/downsample_bn"))
            inplanes = planes * 4
    m.update(_ftb_map(f"{d}.conv", "decoder/conv"))
    m[f"{d}.conv1.weight"] = "decoder/conv1/kernel"
    m[f"{d}.conv1.bias"] = "decoder/conv1/bias"
    for name in ("ffm2", "ffm1", "ffm0"):
        m.update(_ftb_map(f"{d}.{name}.ftb1", f"decoder/{name}/ftb1"))
        m.update(_ftb_map(f"{d}.{name}.ftb2", f"decoder/{name}/ftb2"))
    # AO head: adapt_conv Sequential(Conv, BN, ReLU, Conv, Upsample)
    m[f"{d}.outconv.adapt_conv.0.weight"] = "decoder/outconv/conv1/kernel"
    m[f"{d}.outconv.adapt_conv.0.bias"] = "decoder/outconv/conv1/bias"
    m.update(_bn_map(f"{d}.outconv.adapt_conv.1", "decoder/outconv/bn"))
    m[f"{d}.outconv.adapt_conv.3.weight"] = "decoder/outconv/conv2/kernel"
    m[f"{d}.outconv.adapt_conv.3.bias"] = "decoder/outconv/conv2/bias"
    return m


def load_leres_checkpoint(path: str):
    """Load a LeReS checkpoint (res101.pth stores the model under
    checkpoint['depth_model'] with an optional 'module.' DataParallel
    prefix — lib/net_tools.py load_ckpt/strip_prefix_if_present) and
    convert to a Flax RelDepthModel params tree."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("depth_model", ckpt) if isinstance(ckpt, dict) else ckpt
    state = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        state[k] = v.numpy()

    from ..models.leres import LeReSConfig, RelDepthModel
    import jax
    import jax.numpy as jnp

    cfg = LeReSConfig.resnext101()
    model = RelDepthModel(cfg)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))["params"]
    name_map = leres_name_map(cfg)
    hits = sum(1 for k in name_map if k in state)
    if hits < 0.99 * len(name_map):
        raise ValueError(
            f"LeReS checkpoint layout mismatch: {hits}/{len(name_map)} "
            f"mapped keys present in {path}")
    return fill_missing_params(convert_torch_state_dict(state, name_map), ref)


def sgrnet_name_map(cfg) -> Dict[str, str]:
    """torch→Flax map for SGRNet's DepthNet (depthNet=1,
    structuredrl/model.pth.tar — depth_esti_boosting.py:187-192): the
    LeReS architecture at ResNet50 width under encoder./decoder.
    prefixes; its syncbn BatchNorms carry the standard
    weight/bias/running_mean/running_var keys."""
    return leres_name_map(cfg, "encoder", "decoder")


def load_sgrnet_checkpoint(path: str):
    """Load structuredrl/model.pth.tar ({'state_dict': DataParallel
    'module.'-prefixed DepthNet}, depth_esti_boosting.py:190-191) and
    convert to Flax RelDepthModel(resnet50) params."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    state = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        state[k] = v.numpy()

    from ..models.leres import LeReSConfig, RelDepthModel
    import jax
    import jax.numpy as jnp

    cfg = LeReSConfig.resnet50()
    model = RelDepthModel(cfg)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))["params"]
    name_map = sgrnet_name_map(cfg)
    hits = sum(1 for k in name_map if k in state)
    if hits < 0.99 * len(name_map):
        raise ValueError(
            f"SGRNet checkpoint layout mismatch: {hits}/{len(name_map)} "
            f"mapped keys present in {path}")
    return fill_missing_params(convert_torch_state_dict(state, name_map), ref)


# ---------------------------------------------------------------------------
# MiDaS v2.1 (midas/model.pt checkpoint layout) name map
# ---------------------------------------------------------------------------


def _resnet_stage_map(t_prefix: str, f_prefix: str, stage: int, planes: int,
                      n_blocks: int, inplanes: int) -> Dict[str, str]:
    """One torchvision ResNet stage (layerN.{b}.conv/bn/downsample) →
    leres.ResNetEncoder's layerN_{b} blocks.  Returns (map); the caller
    tracks inplanes."""
    m: Dict[str, str] = {}
    for b in range(n_blocks):
        t = f"{t_prefix}.{b}"
        f = f"{f_prefix}/layer{stage}_{b}"
        for k in (1, 2, 3):
            m[f"{t}.conv{k}.weight"] = f"{f}/conv{k}/kernel"
            m.update(_bn_map(f"{t}.bn{k}", f"{f}/bn{k}"))
        stride = 2 if (b == 0 and stage > 1) else 1
        if b == 0 and (stride != 1 or inplanes != planes * 4):
            m[f"{t}.downsample.0.weight"] = f"{f}/downsample_conv/kernel"
            m.update(_bn_map(f"{t}.downsample.1", f"{f}/downsample_bn"))
        inplanes = planes * 4
    return m


def midas_name_map(cfg) -> Dict[str, str]:
    """torch→Flax map for MidasNet (midas/models/midas_net.py:12-76):
    pretrained.layer1 is Sequential[conv1, bn1, relu, maxpool, layer1] so
    the stem sits at indices 0/1 and stage-1 blocks under index 4;
    stages 2-4 are the plain torchvision layers; scratch carries the
    lateral convs, refinenets, and the output head Sequential."""
    m = {f"pretrained.layer1.0.weight": "pretrained/conv1/kernel"}
    m.update(_bn_map("pretrained.layer1.1", "pretrained/bn1"))
    inplanes = cfg.planes[0]
    for s, (planes, n_blocks) in enumerate(zip(cfg.planes, cfg.blocks)):
        t_prefix = ("pretrained.layer1.4" if s == 0
                    else f"pretrained.layer{s + 1}")
        m.update(_resnet_stage_map(t_prefix, "pretrained", s + 1, planes,
                                   n_blocks, inplanes))
        inplanes = planes * 4
    for i in range(4):
        m[f"scratch.layer{i + 1}_rn.weight"] = f"layer{i + 1}_rn/kernel"
    for k in range(1, 5):
        for j in (1, 2):
            for c in (1, 2):
                base = f"scratch.refinenet{k}.resConfUnit{j}.conv{c}"
                f = f"refinenet{k}/resConfUnit{j}/conv{c}"
                m[f"{base}.weight"] = f"{f}/kernel"
                m[f"{base}.bias"] = f"{f}/bias"
    for t_idx, f_name in ((0, "output_conv1"), (2, "output_conv2"),
                          (4, "output_conv3")):
        m[f"scratch.output_conv.{t_idx}.weight"] = f"{f_name}/kernel"
        m[f"scratch.output_conv.{t_idx}.bias"] = f"{f_name}/bias"
    return m


def load_midas_checkpoint(path: str):
    """Load a MiDaS v2.1 checkpoint (midas/model.pt — a plain state dict,
    midas/models/base_model.py) and convert to Flax MidasNet params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in sd:
        sd = sd["state_dict"]
    state = {k.replace("module.", "", 1) if k.startswith("module.") else k:
             v.numpy() for k, v in sd.items()}

    from ..models.leres import LeReSConfig
    from ..models.midas import MidasNet
    import jax
    import jax.numpy as jnp

    cfg = LeReSConfig.resnext101()
    model = MidasNet(cfg)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))["params"]
    name_map = midas_name_map(cfg)
    hits = sum(1 for k in name_map if k in state)
    if hits < 0.99 * len(name_map):
        raise ValueError(
            f"MiDaS checkpoint layout mismatch: {hits}/{len(name_map)} "
            f"mapped keys present in {path}")
    return fill_missing_params(convert_torch_state_dict(state, name_map), ref)


# ---------------------------------------------------------------------------
# Stable Diffusion (diffusers checkpoint layout) name maps
# ---------------------------------------------------------------------------


def _sd_resnet_map(t: str, f: str, with_time: bool = True) -> Dict[str, str]:
    """diffusers ResnetBlock2D → models/diffusion.ResnetBlock."""
    m = {
        f"{t}.norm1.weight": f"{f}/norm1/scale",
        f"{t}.norm1.bias": f"{f}/norm1/bias",
        f"{t}.conv1.weight": f"{f}/conv1/kernel",
        f"{t}.conv1.bias": f"{f}/conv1/bias",
        f"{t}.norm2.weight": f"{f}/norm2/scale",
        f"{t}.norm2.bias": f"{f}/norm2/bias",
        f"{t}.conv2.weight": f"{f}/conv2/kernel",
        f"{t}.conv2.bias": f"{f}/conv2/bias",
        # present only when in_ch != out_ch; convert skips missing keys
        f"{t}.conv_shortcut.weight": f"{f}/conv_shortcut/kernel",
        f"{t}.conv_shortcut.bias": f"{f}/conv_shortcut/bias",
    }
    if with_time:
        m[f"{t}.time_emb_proj.weight"] = f"{f}/time_emb_proj/kernel"
        m[f"{t}.time_emb_proj.bias"] = f"{f}/time_emb_proj/bias"
    return m


def _sd_attention_map(t: str, f: str) -> Dict[str, str]:
    """diffusers Transformer2DModel (linear projections, depth 1) →
    models/diffusion.SpatialTransformer."""
    m = {
        f"{t}.norm.weight": f"{f}/norm/scale",
        f"{t}.norm.bias": f"{f}/norm/bias",
        f"{t}.proj_in.weight": f"{f}/proj_in/kernel",
        f"{t}.proj_in.bias": f"{f}/proj_in/bias",
        f"{t}.proj_out.weight": f"{f}/proj_out/kernel",
        f"{t}.proj_out.bias": f"{f}/proj_out/bias",
    }
    tb, fb = f"{t}.transformer_blocks.0", f"{f}/block_0"
    for a in ("attn1", "attn2"):
        for p in ("to_q", "to_k", "to_v"):
            m[f"{tb}.{a}.{p}.weight"] = f"{fb}/{a}/{p}/kernel"
        m[f"{tb}.{a}.to_out.0.weight"] = f"{fb}/{a}/to_out/kernel"
        m[f"{tb}.{a}.to_out.0.bias"] = f"{fb}/{a}/to_out/bias"
    for n in ("norm1", "norm2", "norm3"):
        m[f"{tb}.{n}.weight"] = f"{fb}/{n}/scale"
        m[f"{tb}.{n}.bias"] = f"{fb}/{n}/bias"
    m[f"{tb}.ff.net.0.proj.weight"] = f"{fb}/ff/proj/kernel"
    m[f"{tb}.ff.net.0.proj.bias"] = f"{fb}/ff/proj/bias"
    m[f"{tb}.ff.net.2.weight"] = f"{fb}/ff/out/kernel"
    m[f"{tb}.ff.net.2.bias"] = f"{fb}/ff/out/bias"
    return m


def sd_unet_name_map(cfg) -> Dict[str, str]:
    """diffusers UNet2DConditionModel (SD 2.x layout: linear transformer
    projections, one transformer block per attention) → models/diffusion.UNet.

    Matches the checkpoints the reference loads
    (/root/reference/scripts/text2img_sdm.py:7-30 — stable-diffusion-2-1-base;
    inpaint_sdm.py:48-74 — stable-diffusion-2-inpainting).
    """
    m = {
        "conv_in.weight": "conv_in/kernel",
        "conv_in.bias": "conv_in/bias",
        "time_embedding.linear_1.weight": "time_dense_1/kernel",
        "time_embedding.linear_1.bias": "time_dense_1/bias",
        "time_embedding.linear_2.weight": "time_dense_2/kernel",
        "time_embedding.linear_2.bias": "time_dense_2/bias",
        "conv_norm_out.weight": "norm_out/scale",
        "conv_norm_out.bias": "norm_out/bias",
        "conv_out.weight": "conv_out/kernel",
        "conv_out.bias": "conv_out/bias",
    }
    L = len(cfg.block_channels)
    for i in range(L):
        for j in range(cfg.layers_per_block):
            m.update(_sd_resnet_map(
                f"down_blocks.{i}.resnets.{j}", f"down_{i}_res_{j}"))
            if cfg.attn_blocks[i]:
                m.update(_sd_attention_map(
                    f"down_blocks.{i}.attentions.{j}", f"down_{i}_attn_{j}"))
        if i < L - 1:
            m[f"down_blocks.{i}.downsamplers.0.conv.weight"] = (
                f"down_{i}_downsample/conv/kernel")
            m[f"down_blocks.{i}.downsamplers.0.conv.bias"] = (
                f"down_{i}_downsample/conv/bias")
    m.update(_sd_resnet_map("mid_block.resnets.0", "mid_res_0"))
    m.update(_sd_attention_map("mid_block.attentions.0", "mid_attn"))
    m.update(_sd_resnet_map("mid_block.resnets.1", "mid_res_1"))
    for i in range(L):
        k = L - 1 - i  # diffusers up_blocks run low→high resolution
        for j in range(cfg.layers_per_block + 1):
            m.update(_sd_resnet_map(
                f"up_blocks.{k}.resnets.{j}", f"up_{i}_res_{j}"))
            if cfg.attn_blocks[i]:
                m.update(_sd_attention_map(
                    f"up_blocks.{k}.attentions.{j}", f"up_{i}_attn_{j}"))
        if i > 0:
            m[f"up_blocks.{k}.upsamplers.0.conv.weight"] = (
                f"up_{i}_upsample/conv/kernel")
            m[f"up_blocks.{k}.upsamplers.0.conv.bias"] = (
                f"up_{i}_upsample/conv/bias")
    return m


def _sd_vae_attn_map(t: str, f: str) -> Dict[str, str]:
    """AutoencoderKL mid-block attention; supports both the modern
    (to_q/to_k/to_v/to_out.0) and legacy (query/key/value/proj_attn) key
    names, and 1x1-conv-shaped legacy projection weights via ``lin:``."""
    m = {
        f"{t}.group_norm.weight": f"{f}/group_norm/scale",
        f"{t}.group_norm.bias": f"{f}/group_norm/bias",
    }
    pairs = [("to_q", "to_q"), ("to_k", "to_k"), ("to_v", "to_v"),
             ("to_out.0", "to_out"), ("query", "to_q"), ("key", "to_k"),
             ("value", "to_v"), ("proj_attn", "to_out")]
    for tname, fname in pairs:
        m[f"{t}.{tname}.weight"] = f"lin:{f}/attn/{fname}/kernel"
        m[f"{t}.{tname}.bias"] = f"{f}/attn/{fname}/bias"
    return m


def sd_vae_encoder_name_map(cfg) -> Dict[str, str]:
    """diffusers AutoencoderKL encoder + quant_conv →
    models/diffusion.VAEEncoder."""
    m = {
        "encoder.conv_in.weight": "conv_in/kernel",
        "encoder.conv_in.bias": "conv_in/bias",
        "encoder.conv_norm_out.weight": "norm_out/scale",
        "encoder.conv_norm_out.bias": "norm_out/bias",
        "encoder.conv_out.weight": "conv_out/kernel",
        "encoder.conv_out.bias": "conv_out/bias",
        "quant_conv.weight": "quant_conv/kernel",
        "quant_conv.bias": "quant_conv/bias",
    }
    L = len(cfg.block_channels)
    for i in range(L):
        for j in range(cfg.layers_per_block):
            m.update(_sd_resnet_map(
                f"encoder.down_blocks.{i}.resnets.{j}", f"down_{i}_res_{j}",
                with_time=False))
        if i < L - 1:
            m[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = (
                f"down_{i}_downsample/conv/kernel")
            m[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = (
                f"down_{i}_downsample/conv/bias")
    m.update(_sd_resnet_map("encoder.mid_block.resnets.0", "mid_res_0",
                            with_time=False))
    m.update(_sd_vae_attn_map("encoder.mid_block.attentions.0", "mid_attn"))
    m.update(_sd_resnet_map("encoder.mid_block.resnets.1", "mid_res_1",
                            with_time=False))
    return m


def sd_vae_decoder_name_map(cfg) -> Dict[str, str]:
    """diffusers AutoencoderKL decoder + post_quant_conv →
    models/diffusion.VAEDecoder."""
    m = {
        "decoder.conv_in.weight": "conv_in/kernel",
        "decoder.conv_in.bias": "conv_in/bias",
        "decoder.conv_norm_out.weight": "norm_out/scale",
        "decoder.conv_norm_out.bias": "norm_out/bias",
        "decoder.conv_out.weight": "conv_out/kernel",
        "decoder.conv_out.bias": "conv_out/bias",
        "post_quant_conv.weight": "post_quant_conv/kernel",
        "post_quant_conv.bias": "post_quant_conv/bias",
    }
    L = len(cfg.block_channels)
    m.update(_sd_resnet_map("decoder.mid_block.resnets.0", "mid_res_0",
                            with_time=False))
    m.update(_sd_vae_attn_map("decoder.mid_block.attentions.0", "mid_attn"))
    m.update(_sd_resnet_map("decoder.mid_block.resnets.1", "mid_res_1",
                            with_time=False))
    for i in range(L):
        k = L - 1 - i  # decoder up_blocks.0 works at the top channel count
        for j in range(cfg.layers_per_block + 1):
            m.update(_sd_resnet_map(
                f"decoder.up_blocks.{k}.resnets.{j}", f"up_{i}_res_{j}",
                with_time=False))
        if i > 0:
            m[f"decoder.up_blocks.{k}.upsamplers.0.conv.weight"] = (
                f"up_{i}_upsample/conv/kernel")
            m[f"decoder.up_blocks.{k}.upsamplers.0.conv.bias"] = (
                f"up_{i}_upsample/conv/bias")
    return m


def _find_weights_file(d: str) -> Optional[str]:
    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin",
                 "model.safetensors", "pytorch_model.bin"):
        p = os.path.join(d, name)
        if os.path.isfile(p):
            return p
    return None


def checkpoint_map_coverage(state, name_map, optional_substr=("conv_shortcut",)):
    """(hits, required) for a torch→flax name map against a state dict.

    Alias groups — several torch keys mapped to ONE flax target, e.g. the
    modern/legacy VAE attention pairs to_q/query (_sd_vae_attn_map) —
    count as one required key, hit when ANY alias is present.  Targets
    whose every torch key contains an ``optional_substr`` are skipped:
    shortcut convs exist only on channel-changing resnets, so their
    absence is layout-legal.
    """
    groups: Dict[str, list] = {}
    for tk, fk in name_map.items():
        groups.setdefault(fk.split(":", 1)[-1], []).append(tk)
    hits = required = 0
    for tks in groups.values():
        if all(any(s in tk for s in optional_substr) for tk in tks):
            continue
        required += 1
        if any(tk in state for tk in tks):
            hits += 1
    return hits, required


def _require_coverage(state, name_map, what: str, path: str,
                      optional_substr=("conv_shortcut",)):
    """Raise unless ≥99% of the map's required targets are present —
    a layout mismatch must fail loudly, never fall through to
    fill_missing_params zero-fill (which would produce garbage outputs)."""
    hits, required = checkpoint_map_coverage(state, name_map, optional_substr)
    if hits < 0.99 * required:
        raise ValueError(
            f"{what} checkpoint layout mismatch: {hits}/{required} mapped "
            f"keys present in {path}")


def convert_sd_checkpoint_dir(ckpt_dir: str, pipeline) -> Optional[dict]:
    """Convert a diffusers-layout checkpoint directory (unet/ vae/
    text_encoder/ subfolders, as downloaded for the reference's weights/
    tree) into the DiffusionPipeline params dict.

    Uses jax.eval_shape on the pipeline's modules for the reference shapes
    so nothing large is materialized twice.  Raises if any component's
    checkpoint covers less than 99% of its name map (layout mismatch ≠
    silent noise).
    """
    import jax
    import jax.numpy as jnp

    unet_file = _find_weights_file(os.path.join(ckpt_dir, "unet"))
    if unet_file is None:
        return None
    vae_file = _find_weights_file(os.path.join(ckpt_dir, "vae"))
    text_file = _find_weights_file(os.path.join(ckpt_dir, "text_encoder"))

    h, w = pipeline.hw
    f = pipeline.latent_factor

    def shapes(module, *args):
        return jax.eval_shape(lambda: module.init(
            jax.random.PRNGKey(0), *args))["params"]

    params = {}

    unet_sd = load_torch_checkpoint(unet_file)
    umap = sd_unet_name_map(pipeline.unet_cfg)
    _require_coverage(unet_sd, umap, "SD UNet", unet_file)
    ref = shapes(pipeline.unet,
                 jnp.zeros((1, h // f, w // f, pipeline.unet_cfg.in_channels)),
                 jnp.zeros((1,)), jnp.zeros(
                     (1, pipeline.text_cfg.context_length,
                      pipeline.unet_cfg.cross_attention_dim)))
    params["unet"] = fill_missing_params(
        convert_torch_state_dict(unet_sd, umap), ref)
    del unet_sd

    if vae_file is not None:
        vae_sd = load_torch_checkpoint(vae_file)
        enc_map = sd_vae_encoder_name_map(pipeline.vae_cfg)
        dec_map = sd_vae_decoder_name_map(pipeline.vae_cfg)
        _require_coverage(vae_sd, enc_map, "SD VAE encoder", vae_file)
        _require_coverage(vae_sd, dec_map, "SD VAE decoder", vae_file)
        ref = shapes(pipeline.vae_enc, jnp.zeros((1, h, w, 3)))
        params["vae_encoder"] = fill_missing_params(
            convert_torch_state_dict(vae_sd, enc_map), ref)
        ref = shapes(pipeline.vae_dec, jnp.zeros(
            (1, h // f, w // f, pipeline.vae_cfg.latent_channels)))
        params["vae_decoder"] = fill_missing_params(
            convert_torch_state_dict(vae_sd, dec_map), ref)
        del vae_sd

    if text_file is not None:
        text_sd = load_torch_checkpoint(text_file)
        # text_projection exists only on the WithProjection HF variant;
        # SD text encoders (plain CLIPTextModel) legitimately lack it
        _require_coverage(
            text_sd, clip_text_name_map(pipeline.text_cfg.layers),
            "CLIP text encoder", text_file,
            optional_substr=("text_projection",))
        ref = shapes(pipeline.text, jnp.zeros(
            (1, pipeline.text_cfg.context_length), jnp.int32))
        params["text"] = convert_clip_text(
            text_sd, pipeline.text_cfg.layers, ref)
        del text_sd

    missing = {"unet", "vae_encoder", "vae_decoder", "text"} - set(params)
    if missing:
        raise ValueError(
            f"diffusers checkpoint dir {ckpt_dir} has a unet/ but is missing "
            f"the weights for: {sorted(missing)}")
    return params


def save_converted(path: str, tree: dict):
    from ..engine.checkpoints import _flatten
    from ..utils.atomic_io import atomic_savez

    atomic_savez(path, **_flatten(tree))


def load_converted(weights_path: str) -> Optional[dict]:
    """Load a previously converted .npz tree (returns None if absent)."""
    candidates = [weights_path, weights_path + ".npz",
                  os.path.join(weights_path, "converted.npz")]
    for cand in candidates:
        if os.path.isfile(cand) and cand.endswith(".npz"):
            from ..engine.checkpoints import _unflatten

            return _unflatten(dict(np.load(cand)))
    return None
