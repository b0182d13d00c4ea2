"""MiDaS v2.1 conversion: a torch replica with the exact midas/model.pt
state-dict layout (pretrained.layer1 stem Sequential + scratch lateral
convs/refinenets/output head — midas/models/midas_net.py:12-76,
blocks.py) converts to the Flax MidasNet with matching outputs."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F

from text2nerf_tpu.models import leres as L
from text2nerf_tpu.models import midas as M
from text2nerf_tpu.services import weight_convert as WC

from test_leres_convert import TEncoder, _randomize_bn_stats


class TRCU(tnn.Module):
    def __init__(self, features):
        super().__init__()
        self.conv1 = tnn.Conv2d(features, features, 3, padding=1)
        self.conv2 = tnn.Conv2d(features, features, 3, padding=1)

    def forward(self, x):
        out = self.conv2(F.relu(self.conv1(F.relu(x))))
        return out + x


class TFFB(tnn.Module):
    def __init__(self, features):
        super().__init__()
        self.resConfUnit1 = TRCU(features)
        self.resConfUnit2 = TRCU(features)

    def forward(self, *xs):
        out = xs[0]
        if len(xs) == 2:
            out = out + self.resConfUnit1(xs[1])
        out = self.resConfUnit2(out)
        return F.interpolate(out, scale_factor=2, mode="bilinear",
                             align_corners=True)


class TInterp(tnn.Module):
    def forward(self, x):
        return F.interpolate(x, scale_factor=2, mode="bilinear",
                             align_corners=False)


class TMidas(tnn.Module):
    def __init__(self, cfg, features):
        super().__init__()
        enc = TEncoder(cfg)
        pretrained = tnn.Module()
        pretrained.layer1 = tnn.Sequential(
            enc.conv1, enc.bn1, tnn.ReLU(), tnn.MaxPool2d(3, 2, 1),
            enc.layer1,
        )
        pretrained.layer2 = enc.layer2
        pretrained.layer3 = enc.layer3
        pretrained.layer4 = enc.layer4
        self.pretrained = pretrained

        scratch = tnn.Module()
        for i, p in enumerate(cfg.planes):
            setattr(scratch, f"layer{i + 1}_rn",
                    tnn.Conv2d(p * 4, features, 3, padding=1, bias=False))
        for k in range(1, 5):
            setattr(scratch, f"refinenet{k}", TFFB(features))
        scratch.output_conv = tnn.Sequential(
            tnn.Conv2d(features, 128, 3, padding=1), TInterp(),
            tnn.Conv2d(128, 32, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(32, 1, 1), tnn.ReLU(),
        )
        self.scratch = scratch

    def forward(self, x):
        l1 = self.pretrained.layer1(x)
        l2 = self.pretrained.layer2(l1)
        l3 = self.pretrained.layer3(l2)
        l4 = self.pretrained.layer4(l3)
        rn = [self.scratch.layer1_rn(l1), self.scratch.layer2_rn(l2),
              self.scratch.layer3_rn(l3), self.scratch.layer4_rn(l4)]
        p = self.scratch.refinenet4(rn[3])
        p = self.scratch.refinenet3(p, rn[2])
        p = self.scratch.refinenet2(p, rn[1])
        p = self.scratch.refinenet1(p, rn[0])
        return torch.squeeze(self.scratch.output_conv(p), dim=1)


def test_midas_conversion_matches_torch():
    cfg = L.LeReSConfig.tiny()
    features = 16
    torch.manual_seed(0)
    tnet = TMidas(cfg, features)
    with torch.no_grad():
        _randomize_bn_stats(tnet)
    tnet.eval()
    state = {k: v.detach().numpy() for k, v in tnet.state_dict().items()}

    name_map = WC.midas_name_map(cfg)
    relevant = {k for k in state if not k.endswith("num_batches_tracked")}
    assert relevant == set(name_map), (
        sorted(relevant - set(name_map))[:5],
        sorted(set(name_map) - relevant)[:5])

    model = M.MidasNet(cfg, features=features)
    ref = jax.eval_shape(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))["params"]
    params = WC.fill_missing_params(
        WC.convert_torch_state_dict(state, name_map), ref)

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours = model.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(), atol=5e-4)
    # the ReLU head keeps disparity non-negative
    assert np.asarray(ours).min() >= 0


def test_midas_full_map_structure():
    cfg = L.LeReSConfig.resnext101()
    tnet = TMidas(cfg, 256)
    keys = {k for k in tnet.state_dict()
            if not k.endswith("num_batches_tracked")}
    assert keys == set(WC.midas_name_map(cfg))


def test_midas_resize_shape():
    # 384 target: square stays 384; upper_bound floors the larger side
    assert M.midas_resize_shape(512, 512) == (384, 384)
    assert M.midas_resize_shape(480, 640) == (288, 384)
    nh, nw = M.midas_resize_shape(500, 375)
    assert nh <= 384 and nw <= 384 and nh % 32 == 0 and nw % 32 == 0
