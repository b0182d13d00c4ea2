"""Weight conversion: a torch-built PatchGAN converts to our Flax
discriminator with matching outputs (validates the layout transposes and
name-map machinery end-to-end)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from text2nerf_tpu.models.pix2pix import PatchDiscriminator
from text2nerf_tpu.services import weight_convert as WC


def _torch_patchgan(input_nc=2, ndf=64, n_layers=3):
    """The 70x70 PatchGAN stack (pix2pix, Isola et al.) with norm='none',
    matching the merge-model discriminator configuration
    (merge_model_sc/Options.yml: netD=basic, norm=none)."""
    layers = [tnn.Conv2d(input_nc, ndf, 4, 2, 1), tnn.LeakyReLU(0.2, True)]
    mult = 1
    for n in range(1, n_layers):
        mult_prev, mult = mult, min(2 ** n, 8)
        layers += [
            tnn.Conv2d(ndf * mult_prev, ndf * mult, 4, 2, 1),
            tnn.LeakyReLU(0.2, True),
        ]
    mult_prev, mult = mult, min(2 ** n_layers, 8)
    layers += [
        tnn.Conv2d(ndf * mult_prev, ndf * mult, 4, 1, 1),
        tnn.LeakyReLU(0.2, True),
        tnn.Conv2d(ndf * mult, 1, 4, 1, 1),
    ]
    return tnn.Sequential(*layers)


def test_patchgan_conversion_matches_torch():
    torch.manual_seed(0)
    net = _torch_patchgan()
    net.eval()
    # torch Sequential state keys are "0.weight" etc → prefix to "model.N"
    state = {("model." + k): v.detach().numpy()
             for k, v in net.state_dict().items()}

    tree = WC.convert_torch_state_dict(state, WC.patchgan_name_map(3))
    flax_params = jax.tree.map(jnp.asarray, tree)

    x = np.random.default_rng(0).standard_normal((1, 64, 64, 2)).astype(np.float32)
    ours = PatchDiscriminator(input_nc=2).apply({"params": flax_params},
                                                jnp.asarray(x))
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


def test_convert_tensor_layouts():
    conv_w = np.arange(2 * 3 * 4 * 4, dtype=np.float32).reshape(2, 3, 4, 4)
    out = WC.convert_tensor("some.conv.weight", conv_w)
    assert out.shape == (4, 4, 3, 2)  # OIHW → HWIO
    lin_w = np.arange(6, dtype=np.float32).reshape(2, 3)
    assert WC.convert_tensor("fc.weight", lin_w).shape == (3, 2)
    bias = np.zeros(5, np.float32)
    assert WC.convert_tensor("fc.bias", bias).shape == (5,)
