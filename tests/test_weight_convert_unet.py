"""UNet generator conversion: a torch-built pix2pix UnetGenerator
(norm='none', the merge-model configuration) converts to our Flax generator
with matching outputs — including the ConvTranspose layout flip."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from text2nerf_tpu.models.pix2pix import UnetGenerator
from text2nerf_tpu.services import weight_convert as WC


class _TorchSkip(tnn.Module):
    """UnetSkipConnectionBlock with norm='none' (Identity norms occupy the
    Sequential indices, matching merge_model_sc/networks.py:478-543)."""

    def __init__(self, outer_nc, inner_nc, input_nc=None, submodule=None,
                 outermost=False, innermost=False):
        super().__init__()
        self.outermost = outermost
        if input_nc is None:
            input_nc = outer_nc
        downconv = tnn.Conv2d(input_nc, inner_nc, 4, 2, 1, bias=False)
        downrelu = tnn.LeakyReLU(0.2, True)
        uprelu = tnn.ReLU(True)
        if outermost:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1)
            model = [downconv, submodule, uprelu, upconv, tnn.Tanh()]
        elif innermost:
            upconv = tnn.ConvTranspose2d(inner_nc, outer_nc, 4, 2, 1, bias=False)
            model = [downrelu, downconv, uprelu, upconv, tnn.Identity()]
        else:
            upconv = tnn.ConvTranspose2d(inner_nc * 2, outer_nc, 4, 2, 1,
                                         bias=False)
            model = [downrelu, downconv, tnn.Identity(), submodule,
                     uprelu, upconv, tnn.Identity()]
        self.model = tnn.Sequential(*model)

    def forward(self, x):
        if self.outermost:
            return self.model(x)
        return torch.cat([x, self.model(x)], 1)


def _torch_unet(input_nc=1, output_nc=1, num_downs=5, ngf=8):
    block = _TorchSkip(ngf * 8, ngf * 8, innermost=True)
    for _ in range(num_downs - 5):
        block = _TorchSkip(ngf * 8, ngf * 8, submodule=block)
    for mult in (4, 2, 1):
        block = _TorchSkip(ngf * mult, ngf * mult * 2, submodule=block)
    return _TorchSkip(output_nc, ngf, input_nc=input_nc, submodule=block,
                      outermost=True)


def test_unet_generator_conversion_matches_torch():
    torch.manual_seed(0)
    net = _torch_unet()
    net.eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    flax_net = UnetGenerator(input_nc=1, output_nc=1, num_downs=5, ngf=8)
    ref_params = flax_net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1))
    )["params"]

    name_map = WC.unet_generator_name_map(5)
    # every torch parameter must be consumed by the map
    assert set(state).issubset(set(name_map)), set(state) - set(name_map)
    tree = WC.convert_torch_state_dict(state, name_map)
    params = WC.fill_missing_params(tree, ref_params)

    x = np.random.default_rng(0).standard_normal((1, 32, 32, 1)).astype(np.float32)
    ours = flax_net.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-4)
