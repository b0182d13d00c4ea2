"""Stable-Diffusion text2img + inpainting pipelines (Flax, jitted).

TPU re-design of the reference wrappers
(/root/reference/scripts/text2img_sdm.py:7-30 and
/root/reference/scripts/inpaint_sdm.py:48-74): the whole denoise loop is one
jit region (lax.fori_loop over the scheduler — EulerDiscrete for text2img,
the checkpoint's shipped PNDM for inpainting, both at the 50-step pipeline
default — with classifier-free guidance at scale 7.5), the candidate batch
(num_images_per_prompt=5,
inpaint_sdm.py:71-74) is a leading batch dimension that shards over the
device mesh's data axis, and the VAE decode runs in the same program.

Weights load from a converted checkpoint directory (see weight_convert.py);
the registry falls back to procedural services when absent.
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import diffusion as D
from ..models import clip as C


class DiffusionPipeline:
    """Shared machinery for text2img and inpainting."""

    def __init__(
        self,
        weights_path: str,
        inpaint: bool = False,
        hw=(512, 512),
        dtype=jnp.bfloat16,
        num_steps: Optional[int] = None,
        tiny: bool = False,
        scheduler: str = "auto",
    ):
        """``scheduler``: 'auto' resolves like the reference — text2img
        overrides the checkpoint with EulerDiscrete (text2img_sdm.py:
        16-28), inpainting runs the checkpoint's shipped scheduler
        (inpaint_sdm.py:52-56: the SD-2-inpainting scheduler_config names
        PNDMScheduler) — or pass 'euler' | 'pndm' | 'ddim' explicitly.
        ``num_steps=None`` uses the diffusers 50-step pipeline default
        both pipelines run in the reference."""
        self.hw = hw
        self.inpaint = inpaint
        self.num_steps = 50 if num_steps is None else num_steps
        self.tiny = tiny
        self.sched_cfg = self._load_scheduler_config(weights_path)
        if scheduler == "auto":
            if inpaint:
                name = (self.sched_cfg or {}).get(
                    "_class_name", "PNDMScheduler"
                )
                scheduler = {
                    "PNDMScheduler": "pndm",
                    "EulerDiscreteScheduler": "euler",
                    "DDIMScheduler": "ddim",
                }.get(name, "pndm")
            else:
                scheduler = "euler"
        assert scheduler in ("euler", "pndm", "ddim"), scheduler
        self.scheduler = scheduler
        if tiny:
            self.unet_cfg = D.UNetConfig.tiny()
            if inpaint:
                self.unet_cfg = D.UNetConfig.tiny()
                self.unet_cfg = D.UNetConfig(
                    in_channels=9, block_channels=(32, 64), layers_per_block=1,
                    cross_attention_dim=32, head_dim=16, attn_blocks=(True, False),
                )
            else:
                self.unet_cfg = D.UNetConfig(
                    in_channels=4, block_channels=(32, 64), layers_per_block=1,
                    cross_attention_dim=32, head_dim=16, attn_blocks=(True, False),
                )
            self.vae_cfg = D.VAEConfig.tiny()
            self.text_cfg = C.CLIPTextConfig.tiny()
        else:
            self.unet_cfg = (
                D.UNetConfig.sd2_inpaint() if inpaint else D.UNetConfig.sd21_base()
            )
            self.vae_cfg = D.VAEConfig()
            self.text_cfg = C.CLIPTextConfig.sd2_text()

        self.unet = D.UNet(self.unet_cfg, dtype=dtype)
        self.vae_dec = D.VAEDecoder(self.vae_cfg, dtype=dtype)
        self.vae_enc = D.VAEEncoder(self.vae_cfg, dtype=dtype)
        # SD 2.x conditions on the penultimate OpenCLIP layer, but the HF
        # checkpoints we convert already ship the tower truncated to 23
        # layers with final_layer_norm as the penultimate norm — so the
        # exposed hidden state is the final one (skip_last_layers=0)
        self.text = C.CLIPTextEncoder(self.text_cfg, skip_last_layers=0, dtype=dtype)
        self.latent_factor = 2 ** (len(self.vae_cfg.block_channels) - 1)
        self.tokenizer = self._load_tokenizer(weights_path)
        self.params = self._load_or_init(weights_path)
        self._sample_jit = None

    # -- params ---------------------------------------------------------------

    @staticmethod
    def _load_scheduler_config(weights_path: str):
        """The diffusers ``scheduler/scheduler_config.json`` from the
        checkpoint dir (class name + beta schedule + steps_offset), or
        None when absent — scheduler selection then falls back to the
        reference's per-pipeline defaults."""
        import json

        if not weights_path or not os.path.isdir(weights_path):
            return None
        p = os.path.join(weights_path, "scheduler", "scheduler_config.json")
        if not os.path.isfile(p):
            return None
        try:
            with open(p, encoding="utf-8") as f:
                return json.load(f)
        except (OSError, ValueError):
            return None

    def _make_schedule(self):
        cfg = self.sched_cfg or {}
        kw = dict(
            n_train=int(cfg.get("num_train_timesteps", 1000)),
            beta_start=float(cfg.get("beta_start", 0.00085)),
            beta_end=float(cfg.get("beta_end", 0.012)),
        )
        if self.scheduler == "pndm":
            return D.PNDMSchedule.create(
                self.num_steps, steps_offset=int(cfg.get("steps_offset", 1)),
                **kw)
        if self.scheduler == "ddim":
            return D.DDIMSchedule.create(
                self.num_steps, steps_offset=int(cfg.get("steps_offset", 0)),
                **kw)
        return D.EulerSchedule.create(self.num_steps, **kw)

    @staticmethod
    def _load_tokenizer(weights_path: str):
        """Real CLIP BPE when the checkpoint dir ships tokenizer files
        (vocab.json/merges.txt, the diffusers ``tokenizer/`` subfolder)."""
        from ..models.tokenizer import CLIPBPETokenizer

        if not weights_path or not os.path.isdir(weights_path):
            return None
        for sub in ("tokenizer", "."):
            tok = CLIPBPETokenizer.from_dir(os.path.join(weights_path, sub))
            if tok is not None:
                return tok
        return None

    def _load_or_init(self, weights_path: str):
        from .weight_convert import convert_sd_checkpoint_dir, load_converted

        converted = load_converted(weights_path) if weights_path else None
        if converted is not None:
            return converted
        if weights_path and os.path.isdir(weights_path):
            converted = convert_sd_checkpoint_dir(weights_path, self)
            if converted is not None:
                return converted
        key = jax.random.PRNGKey(0)
        h, w = self.hw
        f = self.latent_factor
        lat = (1, h // f, w // f, self.unet_cfg.in_channels)
        ctx = (1, self.text_cfg.context_length, self.unet_cfg.cross_attention_dim)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "unet": self.unet.init(
                k1, jnp.zeros(lat), jnp.zeros((1,)), jnp.zeros(ctx)
            )["params"],
            "vae_decoder": self.vae_dec.init(
                k2, jnp.zeros((1, h // f, w // f, self.vae_cfg.latent_channels))
            )["params"],
            "vae_encoder": self.vae_enc.init(k3, jnp.zeros((1, h, w, 3)))["params"],
            "text": self.text.init(
                k4, jnp.zeros((1, self.text_cfg.context_length), jnp.int32)
            )["params"],
        }

    # -- conditioning -----------------------------------------------------------

    def encode_text(self, prompt: str, negative_prompt: str = ""):
        """Prompt → (cond, uncond) hidden states (get_text_embeds,
        inpaint_sdm.py:59-69); SD2 conditions on the penultimate layer."""
        if self.tokenizer is not None:
            tokens = jnp.asarray(self.tokenizer(
                [negative_prompt, prompt], self.text_cfg.context_length))
        else:
            tokens = C.hash_tokenize(
                [negative_prompt, prompt], self.text_cfg.context_length,
                self.text_cfg.vocab_size,
            )
        out = self.text.apply({"params": self.params["text"]}, tokens)
        hidden = out["hidden"]
        if hidden.shape[-1] != self.unet_cfg.cross_attention_dim:
            # only the deliberately-mismatched tiny test configs may take
            # the width-slicing shortcut; with real configs a mismatch
            # means the checkpoint and UNet config disagree — fail loudly
            # instead of silently conditioning on truncated embeddings
            assert self.tiny, (
                f"text hidden width {hidden.shape[-1]} != UNet "
                f"cross_attention_dim {self.unet_cfg.cross_attention_dim}; "
                "checkpoint/config mismatch"
            )
            hidden = hidden[..., : self.unet_cfg.cross_attention_dim]
        return hidden[1:2], hidden[0:1]

    # -- sampling -----------------------------------------------------------------

    def _build_sampler(self, batch: int):
        sched = self._make_schedule()

        # candidate batch shards over the mesh's data axis (the reference
        # generates num_images_per_prompt=5 candidates serially on one GPU,
        # inpaint_sdm.py:71-74; here each device denoises its share)
        batch_sharding = None
        n_dev = jax.device_count()
        if n_dev > 1 and batch % n_dev == 0:
            from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

            mesh = Mesh(np.array(jax.devices()), ("data",))
            batch_sharding = NamedSharding(mesh, P("data"))

        @jax.jit
        def sample(params, rng, ctx_c, ctx_u, guidance, extra):
            h, w = self.hw
            f = self.latent_factor
            lat_c = self.vae_cfg.latent_channels
            latents = jax.random.normal(
                rng, (batch, h // f, w // f, lat_c), jnp.float32
            )
            if batch_sharding is not None:
                latents = jax.lax.with_sharding_constraint(
                    latents, batch_sharding
                )
            ctx_c = jnp.broadcast_to(ctx_c, (batch, *ctx_c.shape[1:]))
            ctx_u = jnp.broadcast_to(ctx_u, (batch, *ctx_u.shape[1:]))
            z = D.denoise_loop(
                self.unet, params["unet"], sched, latents, ctx_c, ctx_u,
                guidance, extra_channels=extra,
            )
            img = self.vae_dec.apply(
                {"params": params["vae_decoder"]},
                z / self.vae_cfg.scaling_factor,
            )
            return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)

        return sample

    def generate(
        self,
        prompt: str,
        negative_prompt: str = "",
        num_images: int = 1,
        guidance_scale: float = 7.5,
        seed: int = 0,
        init_image: Optional[np.ndarray] = None,
        mask_holes: Optional[np.ndarray] = None,
    ) -> List[np.ndarray]:
        """Run the pipeline; for inpainting pass init_image + mask_holes
        (mask > 0 = regenerate, the diffusers convention the reference uses
        with mask_inv, text2nerf_main.py:188-189)."""
        ctx_c, ctx_u = self.encode_text(prompt, negative_prompt)
        extra = None
        if self.inpaint:
            assert init_image is not None and mask_holes is not None
            h, w = self.hw
            img = jnp.asarray(init_image, jnp.float32) * 2 - 1
            m = jnp.asarray(mask_holes, jnp.float32)
            if m.ndim == 3:
                m = m[..., 0]
            m = (m > 0.5).astype(jnp.float32)
            masked = img * (1 - m)[..., None]
            z_masked = self.vae_enc.apply(
                {"params": self.params["vae_encoder"]}, masked[None]
            )[..., : self.vae_cfg.latent_channels] * self.vae_cfg.scaling_factor
            f = self.latent_factor
            m_lat = jax.image.resize(m, (h // f, w // f), "nearest")
            extra = jnp.concatenate(
                [m_lat[None, :, :, None], z_masked], axis=-1
            )[0]

        if self._sample_jit is None or self._sample_batch != num_images:
            self._sample_jit = self._build_sampler(num_images)
            self._sample_batch = num_images
        imgs = self._sample_jit(
            self.params, jax.random.PRNGKey(seed), ctx_c, ctx_u,
            jnp.float32(guidance_scale), extra,
        )
        return [np.asarray(imgs[i]) for i in range(num_images)]


def make_text2img(weights_path: str, hw=(512, 512)):
    pipe = DiffusionPipeline(weights_path, inpaint=False, hw=hw)

    def text2img(prompt: str, negative_prompt: str = ""):
        return pipe.generate(prompt, negative_prompt, num_images=1)[0]

    return text2img


def make_inpaint(weights_path: str, hw=(512, 512)):
    pipe = DiffusionPipeline(weights_path, inpaint=True, hw=hw)

    def inpaint(image, mask_holes, prompt="", negative_prompt="",
                num_images=5, seed=0, guidance_scale=7.5):
        return pipe.generate(
            prompt, negative_prompt, num_images=num_images,
            guidance_scale=guidance_scale, seed=seed,
            init_image=image, mask_holes=mask_holes,
        )

    return inpaint
