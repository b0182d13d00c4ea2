"""LPIPS conversion: torch-built AlexNet feature stack + linear heads
convert to our Flax LPIPS with matching distances."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from text2nerf_tpu.models.lpips import AlexFeatures, LPIPSModel
from text2nerf_tpu.services import weight_convert as WC


def _torch_alex_features():
    """torchvision AlexNet .features layout (convs at 0,3,6,8,10)."""
    return tnn.Sequential(
        tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 1, 2), tnn.ReLU(True),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, 1), tnn.ReLU(True),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(True),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(True),
    )


def test_alex_feature_conversion_matches_torch():
    torch.manual_seed(0)
    net = _torch_alex_features()
    net.eval()
    state = {("features." + k): v.detach().numpy()
             for k, v in net.state_dict().items()}
    # add random lpips linear heads (1x1 convs over channel dims)
    rng = np.random.default_rng(0)
    chans = [64, 192, 384, 256, 256]
    for i, c in enumerate(chans):
        state[f"lin{i}.model.1.weight"] = np.abs(
            rng.standard_normal((1, c, 1, 1)).astype(np.float32)
        )

    tree = WC.convert_torch_state_dict(state, WC.lpips_alex_name_map())
    feats_params = tree["features"]
    lins = [np.asarray(tree["lins"][str(i)]).reshape(-1) for i in range(5)]

    # feature stacks must match layer by layer
    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32)
    ours = AlexFeatures().apply({"params": jax.tree.map(jnp.asarray, feats_params)},
                                jnp.asarray(x))
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        torch_feats = []
        h = t
        for layer in net:
            h = layer(h)
            if isinstance(layer, tnn.ReLU):
                torch_feats.append(h.numpy().transpose(0, 2, 3, 1))
    assert len(ours) == len(torch_feats) == 5
    for a, b in zip(ours, torch_feats):
        np.testing.assert_allclose(np.asarray(a), b, atol=2e-4)

    # end-to-end LPIPS distance runs and is symmetric-ish / zero on self
    model = LPIPSModel("alex", jax.tree.map(jnp.asarray, feats_params), lins)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    img2 = np.clip(img + rng.normal(0, 0.1, img.shape).astype(np.float32), 0, 1)
    d_self = model(img, img)
    d_noise = model(img, img2)
    assert d_self < 1e-6
    assert d_noise > d_self


def _torch_vgg16_features():
    """torchvision VGG16 .features layout (convs at
    0,2 | 5,7 | 10,12,14 | 17,19,21 | 24,26,28; pools at 4,9,16,23,30)."""
    layers = []
    in_c = 3
    for wd, n in zip((64, 128, 256, 512, 512), (2, 2, 3, 3, 3)):
        for _ in range(n):
            layers += [tnn.Conv2d(in_c, wd, 3, 1, 1), tnn.ReLU(True)]
            in_c = wd
        layers.append(tnn.MaxPool2d(2, 2))
    return tnn.Sequential(*layers)


def test_vgg_feature_conversion_matches_torch():
    from text2nerf_tpu.models.lpips import VGG16Features

    torch.manual_seed(1)
    net = _torch_vgg16_features()
    net.eval()
    state = {("features." + k): v.detach().numpy()
             for k, v in net.state_dict().items()}
    rng = np.random.default_rng(1)
    chans = [64, 128, 256, 512, 512]
    for i, c in enumerate(chans):
        state[f"lin{i}.model.1.weight"] = np.abs(
            rng.standard_normal((1, c, 1, 1)).astype(np.float32)
        )

    tree = WC.convert_torch_state_dict(state, WC.lpips_vgg_name_map())
    feats_params = tree["features"]
    assert len(tree["lins"]) == 5

    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    ours = VGG16Features().apply(
        {"params": jax.tree.map(jnp.asarray, feats_params)}, jnp.asarray(x)
    )
    with torch.no_grad():
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        torch_feats = []
        h = t
        for k, layer in enumerate(net):
            h = layer(h)
            if k in (3, 8, 15, 22, 29):  # last ReLU of each stage
                torch_feats.append(h.numpy().transpose(0, 2, 3, 1))
    assert len(ours) == len(torch_feats) == 5
    for a, b in zip(ours, torch_feats):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), b, atol=3e-4)


def test_convert_lpips_tool_produces_both_nets(tmp_path):
    """tools/convert_weights.convert_lpips: synthetic torchvision backbone
    + lpips lin checkpoints anywhere under weights/ -> lpips_{net}.npz
    loadable by LPIPSModel.create."""
    import os

    from text2nerf_tpu.models.lpips import LPIPSModel
    from tools.convert_weights import convert_lpips

    w = tmp_path / "weights"
    os.makedirs(w / "lpips" / "v0.1")
    torch.manual_seed(2)
    alex = _torch_alex_features()
    vgg = _torch_vgg16_features()
    torch.save({("features." + k): v for k, v in alex.state_dict().items()},
               str(w / "alexnet-owt.pth"))
    torch.save({("features." + k): v for k, v in vgg.state_dict().items()},
               str(w / "vgg16-feat.pth"))
    for net, chans in (("alex", [64, 192, 384, 256, 256]),
                       ("vgg", [64, 128, 256, 512, 512])):
        lins = {
            f"lin{i}.model.1.weight": torch.rand(1, c, 1, 1).abs()
            for i, c in enumerate(chans)
        }
        torch.save(lins, str(w / "lpips" / "v0.1" / f"{net}.pth"))
    assert convert_lpips(str(w), str(w))
    for net in ("alex", "vgg"):
        assert os.path.isfile(w / f"lpips_{net}.npz")
        model = LPIPSModel.create(net, weights_dir=str(w))
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        d_same = model(a, a)
        d_diff = model(a, 1.0 - a)
        assert d_same < 1e-5 < d_diff
