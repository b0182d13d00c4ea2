"""DiffusionPipeline consumes a real (diffusers-layout) checkpoint
directory end to end: unet/ + vae/ + text_encoder/ torch checkpoints and
tokenizer/ BPE files — the exact tree the reference downloads into
weights/stable-diffusion-2-1-base (text2img_sdm.py:7-30)."""

import json

import numpy as np
import jax.numpy as jnp
import torch
import pytest

from text2nerf_tpu.models import diffusion as D
from text2nerf_tpu.services.diffusion_service import DiffusionPipeline

from test_sd_convert import TUNet, TVAE
from test_tokenizer import _tiny_vocab_files


def _build_ckpt_dir(root, in_channels=4):
    torch.manual_seed(0)
    unet_cfg = D.UNetConfig(
        in_channels=in_channels, block_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=32, head_dim=16, attn_blocks=(True, False),
    )
    (root / "unet").mkdir()
    torch.save(TUNet(unet_cfg).state_dict(),
               root / "unet" / "diffusion_pytorch_model.bin")

    (root / "vae").mkdir()
    torch.save(TVAE(D.VAEConfig.tiny()).state_dict(),
               root / "vae" / "diffusion_pytorch_model.bin")

    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel

    hf_cfg = HFTextConfig(
        vocab_size=256, hidden_size=32, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, hidden_act="quick_gelu",
    )
    text = CLIPTextModel(hf_cfg)
    (root / "text_encoder").mkdir()
    torch.save(text.state_dict(),
               root / "text_encoder" / "pytorch_model.bin")

    tok_dir = root / "tokenizer"
    tok_dir.mkdir()
    _tiny_vocab_files(tok_dir, pad_token="!")
    return root


def test_pipeline_loads_diffusers_dir(tmp_path):
    _build_ckpt_dir(tmp_path)
    pipe = DiffusionPipeline(str(tmp_path), inpaint=False, hw=(16, 16),
                             tiny=True, num_steps=2, dtype=jnp.float32)
    # real BPE tokenizer picked up (not the hash stand-in)
    assert pipe.tokenizer is not None
    assert pipe.tokenizer.pad_id == pipe.tokenizer.encoder["!"]
    # converted parameters, not random init: spot-check one tensor
    sd = torch.load(tmp_path / "unet" / "diffusion_pytorch_model.bin",
                    weights_only=True)
    got = np.asarray(pipe.params["unet"]["conv_in"]["kernel"])
    want = sd["conv_in.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, want, atol=1e-7)

    imgs = pipe.generate("hello world", num_images=1, seed=0)
    assert imgs[0].shape == (16, 16, 3)
    assert np.isfinite(imgs[0]).all()


def test_pipeline_raises_on_partial_dir(tmp_path):
    _build_ckpt_dir(tmp_path)
    import shutil

    shutil.rmtree(tmp_path / "vae")
    with pytest.raises(ValueError, match="missing"):
        DiffusionPipeline(str(tmp_path), inpaint=False, hw=(16, 16),
                          tiny=True, num_steps=2, dtype=jnp.float32)


def test_pipeline_raises_on_vae_layout_mismatch(tmp_path):
    """A VAE checkpoint whose keys don't match the diffusers layout must
    raise (ADVICE r2: zero-filled latents are garbage, not a fallback)."""
    _build_ckpt_dir(tmp_path)
    p = tmp_path / "vae" / "diffusion_pytorch_model.bin"
    sd = torch.load(p, weights_only=True)
    torch.save({"model." + k: v for k, v in sd.items()}, p)
    with pytest.raises(ValueError, match="VAE encoder"):
        DiffusionPipeline(str(tmp_path), inpaint=False, hw=(16, 16),
                          tiny=True, num_steps=2, dtype=jnp.float32)


def test_pipeline_raises_on_text_layout_mismatch(tmp_path):
    _build_ckpt_dir(tmp_path)
    p = tmp_path / "text_encoder" / "pytorch_model.bin"
    sd = torch.load(p, weights_only=True)
    torch.save({"clip." + k: v for k, v in sd.items()}, p)
    with pytest.raises(ValueError, match="CLIP text"):
        DiffusionPipeline(str(tmp_path), inpaint=False, hw=(16, 16),
                          tiny=True, num_steps=2, dtype=jnp.float32)


def test_coverage_counts_alias_groups_once():
    """Modern/legacy VAE attention aliases map to one target and must
    count as ONE required key, hit by either name."""
    from text2nerf_tpu.services.weight_convert import checkpoint_map_coverage

    name_map = {
        "a.to_q.weight": "lin:attn/to_q/kernel",
        "a.query.weight": "lin:attn/to_q/kernel",
        "a.conv_shortcut.weight": "res/shortcut/kernel",
        "a.conv1.weight": "res/conv1/kernel",
    }
    # legacy alias present, modern absent; optional shortcut absent
    hits, required = checkpoint_map_coverage(
        {"a.query.weight": 0, "a.conv1.weight": 0}, name_map)
    assert (hits, required) == (2, 2)
    hits, required = checkpoint_map_coverage({"a.conv1.weight": 0}, name_map)
    assert (hits, required) == (1, 2)


def test_scheduler_selected_from_checkpoint_config(tmp_path):
    """Inpaint pipelines run the checkpoint's shipped scheduler
    (inpaint_sdm.py:52-56 — PNDM for SD-2-inpainting); text2img overrides
    with EulerDiscrete like text2img_sdm.py:16-28."""
    _build_ckpt_dir(tmp_path, in_channels=9)
    sdir = tmp_path / "scheduler"
    sdir.mkdir()
    (sdir / "scheduler_config.json").write_text(json.dumps({
        "_class_name": "PNDMScheduler",
        "num_train_timesteps": 1000,
        "beta_start": 0.00085, "beta_end": 0.012,
        "steps_offset": 1, "skip_prk_steps": True,
    }))
    pipe = DiffusionPipeline(str(tmp_path), inpaint=True, hw=(16, 16),
                             tiny=True, num_steps=3, dtype=jnp.float32)
    assert pipe.scheduler == "pndm"
    sched = pipe._make_schedule()
    assert sched.timesteps.shape[0] == 4  # PLMS warm-up re-evaluation
    imgs = pipe.generate(
        "fill", num_images=1, seed=0,
        init_image=np.zeros((16, 16, 3), np.float32),
        mask_holes=np.ones((16, 16), np.float32),
    )
    assert imgs[0].shape == (16, 16, 3) and np.isfinite(imgs[0]).all()

    pipe2 = DiffusionPipeline(str(tmp_path), inpaint=False, hw=(16, 16),
                              tiny=True, num_steps=3, dtype=jnp.float32)
    assert pipe2.scheduler == "euler"


def test_default_steps_are_fifty():
    """Both pipelines default to the reference's 50-step schedules
    (text2img_sdm.py:22-28 / inpaint_sdm.py:52-56)."""
    pipe = DiffusionPipeline("", inpaint=False, hw=(16, 16), tiny=True,
                             dtype=jnp.float32)
    assert pipe.num_steps == 50
    assert pipe.scheduler == "euler"
    pipe = DiffusionPipeline("", inpaint=True, hw=(16, 16), tiny=True,
                             dtype=jnp.float32)
    assert pipe.num_steps == 50
    assert pipe.scheduler == "pndm"  # checkpoint default when absent
