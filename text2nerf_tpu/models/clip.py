"""CLIP text + vision towers (Flax).

Serves two roles from the reference pipeline:
- text conditioning for the diffusion UNets (the SD 2.x text encoder is the
  OpenCLIP ViT-H text tower; text2img_sdm.py loads it inside the diffusers
  pipeline);
- image-embedding candidate ranking (clip-vit-base-patch32,
  text2nerf_main.py:25-26, 195-220).

Pre-LN transformer with causal masking for text, class-token pooling for
vision; configs for ViT-B/32 (ranking) and ViT-H-14 text (SD 2.x
conditioning).  Weight conversion from HF checkpoints lives in
services/weight_convert.py.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn



@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 512
    layers: int = 12
    heads: int = 8
    context_length: int = 77
    projection_dim: int = 512
    use_quick_gelu: bool = True  # original CLIP; OpenCLIP uses plain gelu

    @staticmethod
    def vit_b32():
        return CLIPTextConfig()

    @staticmethod
    def sd2_text():  # OpenCLIP ViT-H text tower
        return CLIPTextConfig(
            width=1024, layers=23, heads=16, projection_dim=1024,
            use_quick_gelu=False,
        )

    @staticmethod
    def tiny():
        return CLIPTextConfig(
            vocab_size=256, width=32, layers=2, heads=2, context_length=16,
            projection_dim=32,
        )


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    projection_dim: int = 512
    use_quick_gelu: bool = True

    @staticmethod
    def vit_b32():
        return CLIPVisionConfig()

    @staticmethod
    def tiny():
        return CLIPVisionConfig(
            image_size=32, patch_size=8, width=32, layers=2, heads=2,
            projection_dim=32,
        )


def _act(x, quick: bool):
    # HF "gelu" is the exact erf form (GELUActivation), not tanh-approximate
    return x * jax.nn.sigmoid(1.702 * x) if quick else nn.gelu(x, approximate=False)


class TransformerLayer(nn.Module):
    width: int
    heads: int
    quick_gelu: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = MaskedAttention(self.width, self.heads, self.dtype)(h, mask)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype)(h)
        h = _act(h, self.quick_gelu)
        h = nn.Dense(self.width, dtype=self.dtype)(h)
        return x + h


class MaskedAttention(nn.Module):
    dim: int
    heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        import math

        head_dim = self.dim // self.heads
        q = nn.Dense(self.dim, dtype=self.dtype)(x)
        k = nn.Dense(self.dim, dtype=self.dtype)(x)
        v = nn.Dense(self.dim, dtype=self.dtype)(x)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, head_dim)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(head_dim)
        if mask is not None:
            attn = attn + mask
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(*x.shape[:-1], self.dim)
        return nn.Dense(self.dim, dtype=self.dtype)(out)


class CLIPTextEncoder(nn.Module):
    """Text tower.  ``skip_last_layers`` selects which hidden states are
    exposed (SD 2.x conditions on the penultimate layer: 1); it is a module
    attribute so parameters are stable across calls."""

    cfg: CLIPTextConfig
    skip_last_layers: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        """tokens: (B, L) int32 → {'hidden' (B, L, W), 'pooled', 'embeds'}."""
        c = self.cfg
        skip_last_layers = self.skip_last_layers
        x = nn.Embed(c.vocab_size, c.width, dtype=self.dtype)(tokens)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01), (c.context_length, c.width),
        )
        x = x + pos[None, : x.shape[1]]
        causal = jnp.triu(
            jnp.full((x.shape[1], x.shape[1]), -1e9, self.dtype), 1
        )[None, None]
        hidden_at_skip = None
        for i in range(c.layers):
            x = TransformerLayer(c.width, c.heads, c.use_quick_gelu, self.dtype)(
                x, causal
            )
            if i == c.layers - 1 - skip_last_layers:
                hidden_at_skip = x
        final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        hidden = (
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_skip")(hidden_at_skip)
            if skip_last_layers > 0
            else final
        )
        # pooled = token at argmax(tokens) (the EOT token, highest id)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = final[jnp.arange(final.shape[0]), eot]
        embeds = nn.Dense(
            c.projection_dim, use_bias=False, dtype=self.dtype,
            name="text_projection",
        )(pooled)
        return {"hidden": hidden, "pooled": pooled, "embeds": embeds}


class CLIPVisionEncoder(nn.Module):
    cfg: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: (B, H, W, 3) normalized.  Returns 'embeds' (B, proj)."""
        c = self.cfg
        x = nn.Conv(
            c.width, (c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size), use_bias=False,
            dtype=self.dtype,
        )(images)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.02),
            (1 + gh * gw, c.width),
        )
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for _ in range(c.layers):
            x = TransformerLayer(c.width, c.heads, c.use_quick_gelu, self.dtype)(x)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        embeds = nn.Dense(
            c.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
        return {"embeds": embeds}


def cosine_scores(image_embeds, ref_embed, logit_scale: float = 100.0):
    """CLIP cosine ranking (text2nerf_main.py:207-219): image_embeds @ ref
    scaled by exp(logit_scale) — embeddings are L2-normalized first."""
    a = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = ref_embed / jnp.linalg.norm(ref_embed, axis=-1, keepdims=True)
    return (a @ b.T)[:, 0] * logit_scale


# -- byte-pair-free tokenizer -------------------------------------------------


def hash_tokenize(texts, context_length: int = 77, vocab_size: int = 49408):
    """Deterministic whitespace+hash tokenizer.

    A real BPE vocabulary ships with pretrained weights; without weights the
    encoder is random anyway, so a stable hash embedding is sufficient for
    interface completeness.  Start token = vocab-2 convention not needed;
    we use 0 as BOS and vocab_size-1 as EOT (argmax-pooled)."""
    import numpy as np

    out = np.zeros((len(texts), context_length), np.int32)
    for i, text in enumerate(texts):
        toks = [0]
        for wtok in text.lower().split()[: context_length - 2]:
            toks.append(hash(wtok) % (vocab_size - 2) + 1)
        toks.append(vocab_size - 1)
        out[i, : len(toks)] = toks
    return jnp.asarray(out)
