"""CLIP vision tower conversion: a torch-built mini CLIP-ViT converts to
our Flax encoder with matching embeddings."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from text2nerf_tpu.models.clip import CLIPVisionEncoder, CLIPVisionConfig
from text2nerf_tpu.services import weight_convert as WC


class _TorchViT(tnn.Module):
    """Mini HF-style CLIP vision tower (pre-LN, quick-gelu)."""

    def __init__(self, image_size=32, patch=8, width=32, layers=2, heads=2,
                 proj=32):
        super().__init__()
        self.width, self.heads = width, heads
        n_pos = (image_size // patch) ** 2 + 1

        class Emb(tnn.Module):
            def __init__(s):
                super().__init__()
                s.patch_embedding = tnn.Conv2d(3, width, patch, patch, bias=False)
                s.class_embedding = tnn.Parameter(torch.randn(width) * 0.02)
                s.position_embedding = tnn.Embedding(n_pos, width)

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

        class Vision(tnn.Module):
            def __init__(s):
                super().__init__()
                s.embeddings = Emb()
                s.pre_layrnorm = tnn.LayerNorm(width)

                class Enc(tnn.Module):
                    def __init__(e):
                        super().__init__()
                        e.layers = tnn.ModuleList([Layer() for _ in range(layers)])

                s.encoder = Enc()
                s.post_layernorm = tnn.LayerNorm(width)

        self.vision_model = Vision()
        self.visual_projection = tnn.Linear(width, proj, bias=False)

    def _attn(self, layer, x):
        B, L, W = x.shape
        h = self.heads
        d = W // h
        q = layer.self_attn.q_proj(x).view(B, L, h, d).transpose(1, 2)
        k = layer.self_attn.k_proj(x).view(B, L, h, d).transpose(1, 2)
        v = layer.self_attn.v_proj(x).view(B, L, h, d).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) / d ** 0.5, -1)
        o = (a @ v).transpose(1, 2).reshape(B, L, W)
        return layer.self_attn.out_proj(o)

    def forward(self, images):
        vm = self.vision_model
        x = vm.embeddings.patch_embedding(images)  # (B, W, gh, gw)
        B, W, gh, gw = x.shape
        x = x.flatten(2).transpose(1, 2)
        cls = vm.embeddings.class_embedding.expand(B, 1, W)
        x = torch.cat([cls, x], 1)
        x = x + vm.embeddings.position_embedding.weight[None]
        x = vm.pre_layrnorm(x)
        for layer in vm.encoder.layers:
            h = layer.layer_norm1(x)
            x = x + self._attn(layer, h)
            h = layer.layer_norm2(x)
            h = layer.mlp.fc1(h)
            h = h * torch.sigmoid(1.702 * h)  # quick gelu
            x = x + layer.mlp.fc2(h)
        pooled = vm.post_layernorm(x[:, 0])
        return self.visual_projection(pooled)


def test_clip_vision_conversion_matches_torch():
    torch.manual_seed(0)
    net = _TorchViT()
    net.eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    cfg = CLIPVisionConfig.tiny()
    enc = CLIPVisionEncoder(cfg)
    ref_params = enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )["params"]
    name_map = WC.clip_vision_name_map(cfg.layers)
    assert set(state).issubset(set(name_map)), set(state) - set(name_map)
    tree = WC.convert_torch_state_dict(state, name_map)
    params = WC.fill_missing_params(tree, ref_params)

    x = np.random.default_rng(0).standard_normal((2, 32, 32, 3)).astype(np.float32)
    ours = enc.apply({"params": params}, jnp.asarray(x))["embeds"]
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)
