"""Stable-Diffusion checkpoint conversion: torch mini-replicas built with
the exact diffusers state-dict layout (UNet2DConditionModel with linear
transformer projections / AutoencoderKL) convert to our Flax UNet/VAE with
matching outputs.  Replicates the reference's pretrained-pipeline loading
surface (/root/reference/scripts/text2img_sdm.py:7-30,
inpaint_sdm.py:48-74) without importing diffusers."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from text2nerf_tpu.models import diffusion as D
from text2nerf_tpu.services import weight_convert as WC


# ---------------------------------------------------------------------------
# torch replica with diffusers key names
# ---------------------------------------------------------------------------


class TResnet(tnn.Module):
    def __init__(self, cin, cout, tdim=None, eps=1e-5):
        super().__init__()
        self.norm1 = tnn.GroupNorm(32, cin, eps=eps)
        self.conv1 = tnn.Conv2d(cin, cout, 3, padding=1)
        if tdim is not None:
            self.time_emb_proj = tnn.Linear(tdim, cout)
        self.norm2 = tnn.GroupNorm(32, cout, eps=eps)
        self.conv2 = tnn.Conv2d(cout, cout, 3, padding=1)
        self.has_shortcut = cin != cout
        if self.has_shortcut:
            self.conv_shortcut = tnn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = F.silu(self.norm1(x))
        h = self.conv1(h)
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = F.silu(self.norm2(h))
        h = self.conv2(h)
        return (self.conv_shortcut(x) if self.has_shortcut else x) + h


class TAttn(tnn.Module):
    def __init__(self, dim, heads, ctx=None, qkv_bias=False):
        super().__init__()
        ctx = dim if ctx is None else ctx
        self.heads, self.dim = heads, dim
        self.to_q = tnn.Linear(dim, dim, bias=qkv_bias)
        self.to_k = tnn.Linear(ctx, dim, bias=qkv_bias)
        self.to_v = tnn.Linear(ctx, dim, bias=qkv_bias)
        self.to_out = tnn.Sequential(tnn.Linear(dim, dim))

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        hd = self.dim // self.heads
        q = self.to_q(x).view(b, n, self.heads, hd)
        k = self.to_k(context).view(b, -1, self.heads, hd)
        v = self.to_v(context).view(b, -1, self.heads, hd)
        attn = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        out = torch.einsum("bhqk,bkhd->bqhd", attn.softmax(-1), v)
        return self.to_out(out.reshape(b, n, self.dim))


class TGEGLU(tnn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = tnn.Linear(dim, inner * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TFF(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = tnn.Sequential(
            TGEGLU(dim, dim * 4), tnn.Identity(), tnn.Linear(dim * 4, dim)
        )

    def forward(self, x):
        return self.net(x)


class TTxBlock(tnn.Module):
    def __init__(self, dim, heads, ctx):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim)
        self.attn1 = TAttn(dim, heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.attn2 = TAttn(dim, heads, ctx)
        self.norm3 = tnn.LayerNorm(dim)
        self.ff = TFF(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TSpatialTx(tnn.Module):
    def __init__(self, dim, heads, ctx):
        super().__init__()
        self.norm = tnn.GroupNorm(32, dim, eps=1e-6)
        self.proj_in = tnn.Linear(dim, dim)
        self.transformer_blocks = tnn.ModuleList([TTxBlock(dim, heads, ctx)])
        self.proj_out = tnn.Linear(dim, dim)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        y = self.proj_in(y)
        y = self.transformer_blocks[0](y, context)
        y = self.proj_out(y)
        return y.reshape(b, h, w, c).permute(0, 3, 1, 2) + res


class TDownsample(tnn.Module):
    def __init__(self, ch, pad=1):
        super().__init__()
        self.pad = pad
        self.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=pad)

    def forward(self, x):
        if self.pad == 0:  # the VAE encoder's (0,1,0,1) manual pad
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUpsample(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = tnn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class TBlockGroup(tnn.Module):
    """Container exposing .resnets/.attentions/.downsamplers/.upsamplers."""

    def __init__(self, resnets, attentions=None, downsamplers=None,
                 upsamplers=None):
        super().__init__()
        self.resnets = tnn.ModuleList(resnets)
        if attentions is not None:
            self.attentions = tnn.ModuleList(attentions)
        if downsamplers is not None:
            self.downsamplers = tnn.ModuleList(downsamplers)
        if upsamplers is not None:
            self.upsamplers = tnn.ModuleList(upsamplers)


class TTimeEmbedding(tnn.Module):
    def __init__(self, cin, dim):
        super().__init__()
        self.linear_1 = tnn.Linear(cin, dim)
        self.linear_2 = tnn.Linear(dim, dim)

    def forward(self, t):
        return self.linear_2(F.silu(self.linear_1(t)))


def _t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], -1)


class TUNet(tnn.Module):
    """diffusers UNet2DConditionModel replica for the tiny config."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chs = cfg.block_channels
        tdim = chs[0] * 4
        self.conv_in = tnn.Conv2d(cfg.in_channels, chs[0], 3, padding=1)
        self.time_embedding = TTimeEmbedding(chs[0], tdim)
        down = []
        cin = chs[0]
        for i, ch in enumerate(chs):
            res, attn = [], [] if cfg.attn_blocks[i] else None
            for _ in range(cfg.layers_per_block):
                res.append(TResnet(cin, ch, tdim))
                cin = ch
                if cfg.attn_blocks[i]:
                    attn.append(TSpatialTx(ch, ch // cfg.head_dim,
                                           cfg.cross_attention_dim))
            ds = [TDownsample(ch)] if i < len(chs) - 1 else None
            down.append(TBlockGroup(res, attn, downsamplers=ds))
        self.down_blocks = tnn.ModuleList(down)
        mid_ch = chs[-1]
        self.mid_block = TBlockGroup(
            [TResnet(mid_ch, mid_ch, tdim), TResnet(mid_ch, mid_ch, tdim)],
            [TSpatialTx(mid_ch, mid_ch // cfg.head_dim,
                        cfg.cross_attention_dim)],
        )
        # skip-channel bookkeeping for the up path
        skip_chs = [chs[0]]
        for i, ch in enumerate(chs):
            skip_chs += [ch] * cfg.layers_per_block
            if i < len(chs) - 1:
                skip_chs.append(ch)
        up = []
        cin = mid_ch
        for i, ch in list(enumerate(chs))[::-1]:
            res, attn = [], [] if cfg.attn_blocks[i] else None
            for _ in range(cfg.layers_per_block + 1):
                res.append(TResnet(cin + skip_chs.pop(), ch, tdim))
                cin = ch
                if cfg.attn_blocks[i]:
                    attn.append(TSpatialTx(ch, ch // cfg.head_dim,
                                           cfg.cross_attention_dim))
            us = [TUpsample(ch)] if i > 0 else None
            up.append(TBlockGroup(res, attn, upsamplers=us))
        self.up_blocks = tnn.ModuleList(up)
        self.conv_norm_out = tnn.GroupNorm(32, chs[0], eps=1e-5)
        self.conv_out = tnn.Conv2d(chs[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, context):
        cfg = self.cfg
        temb = self.time_embedding(_t_timestep_embedding(
            t, cfg.block_channels[0]))
        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, r in enumerate(blk.resnets):
                h = r(h, temb)
                if cfg.attn_blocks[i]:
                    h = blk.attentions[j](h, context)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, context)
        h = self.mid_block.resnets[1](h, temb)
        for k, blk in enumerate(self.up_blocks):
            i = len(cfg.block_channels) - 1 - k
            for j, r in enumerate(blk.resnets):
                h = r(torch.cat([h, skips.pop()], 1), temb)
                if cfg.attn_blocks[i]:
                    h = blk.attentions[j](h, context)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


class TVAEAttn(tnn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = tnn.GroupNorm(32, ch, eps=1e-6)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.Sequential(tnn.Linear(ch, ch))

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = (q @ k.transpose(1, 2)) / math.sqrt(c)
        y = self.to_out(attn.softmax(-1) @ v)
        return x + y.reshape(b, h, w, c).permute(0, 3, 1, 2)


class TVAE(tnn.Module):
    """AutoencoderKL replica (encoder+decoder+quant convs)."""

    def __init__(self, cfg):
        super().__init__()
        chs = cfg.block_channels
        lat = cfg.latent_channels

        class Encoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = tnn.Conv2d(3, chs[0], 3, padding=1)
                down = []
                cin = chs[0]
                for i, ch in enumerate(chs):
                    res = []
                    for _ in range(cfg.layers_per_block):
                        res.append(TResnet(cin, ch, eps=1e-6))
                        cin = ch
                    ds = ([TDownsample(ch, pad=0)]
                          if i < len(chs) - 1 else None)
                    down.append(TBlockGroup(res, downsamplers=ds))
                self.down_blocks = tnn.ModuleList(down)
                self.mid_block = TBlockGroup(
                    [TResnet(chs[-1], chs[-1], eps=1e-6),
                     TResnet(chs[-1], chs[-1], eps=1e-6)],
                    [TVAEAttn(chs[-1])],
                )
                self.conv_norm_out = tnn.GroupNorm(32, chs[-1], eps=1e-6)
                self.conv_out = tnn.Conv2d(chs[-1], 2 * lat, 3, padding=1)

            def forward(self, x):
                h = self.conv_in(x)
                for blk in self.down_blocks:
                    for r in blk.resnets:
                        h = r(h)
                    if hasattr(blk, "downsamplers"):
                        h = blk.downsamplers[0](h)
                h = self.mid_block.resnets[0](h)
                h = self.mid_block.attentions[0](h)
                h = self.mid_block.resnets[1](h)
                return self.conv_out(F.silu(self.conv_norm_out(h)))

        class Decoder(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv_in = tnn.Conv2d(lat, chs[-1], 3, padding=1)
                self.mid_block = TBlockGroup(
                    [TResnet(chs[-1], chs[-1], eps=1e-6),
                     TResnet(chs[-1], chs[-1], eps=1e-6)],
                    [TVAEAttn(chs[-1])],
                )
                up = []
                cin = chs[-1]
                for i, ch in list(enumerate(chs))[::-1]:
                    res = []
                    for _ in range(cfg.layers_per_block + 1):
                        res.append(TResnet(cin, ch, eps=1e-6))
                        cin = ch
                    us = [TUpsample(ch)] if i > 0 else None
                    up.append(TBlockGroup(res, upsamplers=us))
                self.up_blocks = tnn.ModuleList(up)
                self.conv_norm_out = tnn.GroupNorm(32, chs[0], eps=1e-6)
                self.conv_out = tnn.Conv2d(chs[0], 3, 3, padding=1)

            def forward(self, z):
                h = self.conv_in(z)
                h = self.mid_block.resnets[0](h)
                h = self.mid_block.attentions[0](h)
                h = self.mid_block.resnets[1](h)
                for blk in self.up_blocks:
                    for r in blk.resnets:
                        h = r(h)
                    if hasattr(blk, "upsamplers"):
                        h = blk.upsamplers[0](h)
                return self.conv_out(F.silu(self.conv_norm_out(h)))

        self.encoder = Encoder()
        self.decoder = Decoder()
        self.quant_conv = tnn.Conv2d(2 * lat, 2 * lat, 1)
        self.post_quant_conv = tnn.Conv2d(lat, lat, 1)

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _nchw(x):
    return torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_sd_unet_conversion_matches_torch():
    cfg = D.UNetConfig.tiny(cross_attention_dim=32)
    torch.manual_seed(0)
    tnet = TUNet(cfg)
    tnet.eval()
    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    name_map = WC.sd_unet_name_map(cfg)
    # every torch parameter must be consumed by the map
    assert set(state).issubset(set(name_map)), sorted(set(state) - set(name_map))

    flax_net = D.UNet(cfg)
    ref = jax.eval_shape(lambda: flax_net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,)),
        jnp.zeros((1, 7, 32))))["params"]
    params = WC.fill_missing_params(
        WC.convert_torch_state_dict(state, name_map), ref)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ctx = rng.standard_normal((2, 7, 32)).astype(np.float32)
    t = np.array([3.0, 801.0], np.float32)

    ours = flax_net.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx))
    with torch.no_grad():
        theirs = tnet(_nchw(x), torch.from_numpy(t), torch.from_numpy(ctx))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), atol=2e-4)


def test_sd_inpaint_unet_9ch_converts():
    cfg = D.UNetConfig(in_channels=9, block_channels=(32, 64),
                       layers_per_block=1, cross_attention_dim=32,
                       head_dim=16, attn_blocks=(True, False))
    torch.manual_seed(1)
    tnet = TUNet(cfg)
    tnet.eval()
    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}
    name_map = WC.sd_unet_name_map(cfg)
    assert set(state).issubset(set(name_map))

    flax_net = D.UNet(cfg)
    ref = jax.eval_shape(lambda: flax_net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 9)), jnp.zeros((1,)),
        jnp.zeros((1, 7, 32))))["params"]
    params = WC.fill_missing_params(
        WC.convert_torch_state_dict(state, name_map), ref)

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 8, 9)).astype(np.float32)
    ctx = rng.standard_normal((1, 7, 32)).astype(np.float32)
    t = np.array([250.0], np.float32)
    ours = flax_net.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                          jnp.asarray(ctx))
    with torch.no_grad():
        theirs = tnet(_nchw(x), torch.from_numpy(t), torch.from_numpy(ctx))
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), atol=2e-4)


def test_sd_vae_conversion_matches_torch():
    cfg = D.VAEConfig.tiny()
    torch.manual_seed(2)
    tvae = TVAE(cfg)
    tvae.eval()
    state = {k: v.detach().numpy() for k, v in tvae.state_dict().items()}

    enc_map = WC.sd_vae_encoder_name_map(cfg)
    dec_map = WC.sd_vae_decoder_name_map(cfg)
    # every torch key lands in exactly one of the two maps (modern
    # attention names; legacy aliases are extras in the maps)
    assert set(state).issubset(set(enc_map) | set(dec_map)), sorted(
        set(state) - set(enc_map) - set(dec_map))

    enc = D.VAEEncoder(cfg)
    dec = D.VAEDecoder(cfg)
    ref_e = jax.eval_shape(lambda: enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))))["params"]
    ref_d = jax.eval_shape(lambda: dec.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4))))["params"]
    pe = WC.fill_missing_params(WC.convert_torch_state_dict(state, enc_map),
                                ref_e)
    pd = WC.fill_missing_params(WC.convert_torch_state_dict(state, dec_map),
                                ref_d)

    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    z_in = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)

    moments = enc.apply({"params": pe}, jnp.asarray(img))
    decoded = dec.apply({"params": pd}, jnp.asarray(z_in))
    with torch.no_grad():
        t_moments = tvae.encode(_nchw(img))
        t_decoded = tvae.decode(_nchw(z_in))
    np.testing.assert_allclose(np.asarray(moments), _nhwc(t_moments), atol=2e-4)
    np.testing.assert_allclose(np.asarray(decoded), _nhwc(t_decoded), atol=2e-4)


def test_sd_vae_legacy_attention_names_convert():
    """Old diffusers VAE checkpoints use query/key/value/proj_attn, some
    with (C, C, 1, 1) conv-shaped projections — both map to the same
    params."""
    cfg = D.VAEConfig.tiny()
    torch.manual_seed(3)
    tvae = TVAE(cfg)
    tvae.eval()
    state = {k: v.detach().numpy() for k, v in tvae.state_dict().items()}
    legacy = {}
    for k, v in state.items():
        for new, old in (("to_q", "query"), ("to_k", "key"),
                         ("to_v", "value"), ("to_out.0", "proj_attn")):
            if f".attentions.0.{new}." in k:
                k = k.replace(f".attentions.0.{new}.",
                              f".attentions.0.{old}.")
                if k.endswith("weight"):
                    v = v[:, :, None, None]  # 1x1-conv shaped
                break
        legacy[k] = v

    enc = D.VAEEncoder(cfg)
    ref_e = jax.eval_shape(lambda: enc.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))))["params"]
    p_new = WC.fill_missing_params(WC.convert_torch_state_dict(
        state, WC.sd_vae_encoder_name_map(cfg)), ref_e)
    p_old = WC.fill_missing_params(WC.convert_torch_state_dict(
        legacy, WC.sd_vae_encoder_name_map(cfg)), ref_e)
    for a, b in zip(jax.tree_util.tree_leaves(p_new),
                    jax.tree_util.tree_leaves(p_old)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sd21_name_map_contains_known_checkpoint_keys():
    """Spot-check the full-size map against key names known from the real
    stable-diffusion-2-1-base checkpoint layout."""
    m = WC.sd_unet_name_map(D.UNetConfig.sd21_base())
    for key in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.norm1.weight",
        "down_blocks.0.attentions.1.transformer_blocks.0.attn2.to_k.weight",
        "down_blocks.1.resnets.0.conv_shortcut.weight",
        "down_blocks.2.downsamplers.0.conv.weight",
        "mid_block.attentions.0.proj_in.weight",
        "up_blocks.0.resnets.2.time_emb_proj.weight",
        "up_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "up_blocks.2.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]:
        assert key in m, key
    # the last down block of SD2.1 has no attentions and no downsampler
    assert "down_blocks.3.attentions.0.norm.weight" not in m
    assert "down_blocks.3.downsamplers.0.conv.weight" not in m
    # up_blocks.3 (the 320-channel one) has no upsampler
    assert "up_blocks.3.upsamplers.0.conv.weight" not in m

    vm = WC.sd_vae_encoder_name_map(D.VAEConfig())
    for key in [
        "encoder.conv_in.weight",
        "encoder.down_blocks.0.downsamplers.0.conv.weight",
        "encoder.mid_block.attentions.0.group_norm.weight",
        "quant_conv.weight",
    ]:
        assert key in vm, key
    dm = WC.sd_vae_decoder_name_map(D.VAEConfig())
    for key in [
        "decoder.up_blocks.0.resnets.2.conv1.weight",
        "decoder.up_blocks.2.upsamplers.0.conv.weight",
        "post_quant_conv.weight",
    ]:
        assert key in dm, key
    assert "decoder.up_blocks.3.upsamplers.0.conv.weight" not in dm
