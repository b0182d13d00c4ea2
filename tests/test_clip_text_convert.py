"""CLIP text tower conversion: torch-built mini text model → Flax encoder
with matching pooled embeddings (causal masking + EOT pooling included)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from text2nerf_tpu.models.clip import CLIPTextEncoder, CLIPTextConfig
from text2nerf_tpu.services import weight_convert as WC


class _TorchText(tnn.Module):
    def __init__(self, vocab=256, width=32, layers=2, heads=2, ctx=16, proj=32):
        super().__init__()
        self.width, self.heads = width, heads

        class Emb(tnn.Module):
            def __init__(s):
                super().__init__()
                s.token_embedding = tnn.Embedding(vocab, width)
                s.position_embedding = tnn.Embedding(ctx, width)

        class Attn(tnn.Module):
            def __init__(s):
                super().__init__()
                for n in ("q_proj", "k_proj", "v_proj", "out_proj"):
                    setattr(s, n, tnn.Linear(width, width))

        class MLP(tnn.Module):
            def __init__(s):
                super().__init__()
                s.fc1 = tnn.Linear(width, width * 4)
                s.fc2 = tnn.Linear(width * 4, width)

        class Layer(tnn.Module):
            def __init__(s):
                super().__init__()
                s.layer_norm1 = tnn.LayerNorm(width)
                s.self_attn = Attn()
                s.layer_norm2 = tnn.LayerNorm(width)
                s.mlp = MLP()

        class TextModel(tnn.Module):
            def __init__(s):
                super().__init__()
                s.embeddings = Emb()

                class Enc(tnn.Module):
                    def __init__(e):
                        super().__init__()
                        e.layers = tnn.ModuleList([Layer() for _ in range(layers)])

                s.encoder = Enc()
                s.final_layer_norm = tnn.LayerNorm(width)

        self.text_model = TextModel()
        self.text_projection = tnn.Linear(width, proj, bias=False)

    def _attn(self, layer, x, mask):
        B, L, W = x.shape
        h, d = self.heads, W // self.heads
        q = layer.self_attn.q_proj(x).view(B, L, h, d).transpose(1, 2)
        k = layer.self_attn.k_proj(x).view(B, L, h, d).transpose(1, 2)
        v = layer.self_attn.v_proj(x).view(B, L, h, d).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / d ** 0.5 + mask, -1)
        o = (a @ v).transpose(1, 2).reshape(B, L, W)
        return layer.self_attn.out_proj(o)

    def forward(self, tokens):
        tm = self.text_model
        L = tokens.shape[1]
        x = tm.embeddings.token_embedding(tokens)
        x = x + tm.embeddings.position_embedding.weight[None, :L]
        mask = torch.triu(torch.full((L, L), -1e9), 1)[None, None]
        for layer in tm.encoder.layers:
            h = layer.layer_norm1(x)
            x = x + self._attn(layer, h, mask)
            h = layer.layer_norm2(x)
            h = layer.mlp.fc1(h)
            h = h * torch.sigmoid(1.702 * h)  # quick gelu
            x = x + layer.mlp.fc2(h)
        final = tm.final_layer_norm(x)
        eot = tokens.argmax(-1)
        pooled = final[torch.arange(final.shape[0]), eot]
        return self.text_projection(pooled), final


def test_clip_text_conversion_matches_torch():
    torch.manual_seed(0)
    net = _TorchText()
    net.eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    cfg = CLIPTextConfig.tiny()
    enc = CLIPTextEncoder(cfg, skip_last_layers=0)
    ref_params = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32)
    )["params"]
    assert set(state).issubset(set(WC.clip_text_name_map(cfg.layers)))
    params = WC.convert_clip_text(state, cfg.layers, ref_params)

    rng = np.random.default_rng(0)
    tokens = np.zeros((2, 16), np.int32)
    tokens[:, 0] = 1
    tokens[0, 1:6] = rng.integers(2, 250, 5)
    tokens[0, 6] = 255  # EOT (argmax)
    tokens[1, 1:4] = rng.integers(2, 250, 3)
    tokens[1, 4] = 255

    out = enc.apply({"params": params}, jnp.asarray(tokens))
    with torch.no_grad():
        ref_embeds, ref_hidden = net(torch.from_numpy(tokens.astype(np.int64)))
    np.testing.assert_allclose(
        np.asarray(out["embeds"]), ref_embeds.numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["hidden"]), ref_hidden.numpy(), atol=5e-4
    )
