"""Depth-merge service: per-view test-time finetuning of a pix2pix UNet.

Equivalent of depth_merge_model
(/root/reference/scripts/merge_model_single_channel.py:13-58): given the
NeRF-rendered depth on known pixels (reference) and the monocular estimate
of the full inpainted view (source), finetune the 1-channel unet_1024
generator for ~500 Adam steps so its output matches the rendered depth
where known, then predict an aligned depth for the whole view.

The finetune step is one fused jit region (forward 1024², loss on the
512² nearest-resized output, backward, Adam) — the whole 500-step loop runs
on-device via lax.fori_loop with donated carry.

Also includes the offline trainer equivalent
(merge_model_single_channel.py:142-191) with synthetic scale/shift/gamma
depth corruption (:109-137) to produce an initialization checkpoint when no
converted torch weights are available.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.pix2pix import UnetGenerator, minmax_normalize
from ..utils.atomic_io import atomic_savez


def _nearest_resize(img, size: int):
    """Nearest-neighbor resize matching F.interpolate(mode='nearest')."""
    return jax.image.resize(img, (size, size), method="nearest")


class DepthMergeService:
    """Holds the generator definition + base parameters."""

    def __init__(
        self,
        ckpt_path: Optional[str] = None,
        net_size: int = 1024,
        num_downs: int = 10,
        seed: int = 0,
        compute_dtype=jnp.bfloat16,
    ):
        self.net_size = net_size
        self.model = UnetGenerator(
            input_nc=1, output_nc=1, num_downs=num_downs, dtype=compute_dtype
        )
        init_params = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, net_size, net_size, 1), jnp.float32),
        )["params"]
        if ckpt_path is not None and os.path.exists(ckpt_path):
            if ckpt_path.endswith((".pth", ".pt", ".tar", ".safetensors")):
                # the reference's torch checkpoint (epoch_00440,
                # merge_model_single_channel.py:16-21) — conversion path
                # verified in tests/test_weight_convert_unet.py
                from .weight_convert import (
                    convert_torch_state_dict, fill_missing_params,
                    load_torch_checkpoint, unet_generator_name_map,
                )

                state = load_torch_checkpoint(ckpt_path)
                tree = convert_torch_state_dict(
                    state, unet_generator_name_map(num_downs)
                )
                self.base_params = fill_missing_params(tree, init_params)
            else:
                self.base_params = _load_params(ckpt_path)
        else:
            self.base_params = init_params
        self._finetune_fn = None

    # -- core API ------------------------------------------------------------

    def run_finetune(
        self,
        depth_ref: np.ndarray,
        depth_src: np.ndarray,
        mask_ref: np.ndarray,
        outsize: int = 512,
        lr: float = 1e-5,
        iters: int = 500,
    ) -> np.ndarray:
        """run_finetune_numpy equivalent (merge_model_single_channel.py:32-52).

        Args:
          depth_ref: (outsize, outsize) target depth in [-1, 1], valid where
            mask_ref > 0 (rendered NeRF depth, text2nerf_main.py:275).
          depth_src: (outsize, outsize) source depth in [-1, 1] (shifted
            monocular estimate, text2nerf_main.py:276).
          mask_ref: (outsize, outsize) known-pixel mask.
        Returns: (outsize, outsize) merged depth in [-1, 1].
        """
        inp = _nearest_resize(jnp.asarray(depth_src, jnp.float32), self.net_size)
        inp = minmax_normalize(inp)[None, :, :, None]
        ref = jnp.asarray(depth_ref, jnp.float32)
        mask = jnp.asarray(mask_ref, jnp.float32)

        if self._finetune_fn is None:
            model = self.model

            @functools.partial(jax.jit, static_argnames=("iters", "outsize"))
            def finetune(params, inp, ref, mask, lr, iters, outsize):
                tx = optax.adam(lr, b1=0.9, b2=0.99)
                opt_state = tx.init(params)

                def loss_fn(p):
                    out = model.apply({"params": p}, inp)[0, :, :, 0]
                    out = _nearest_resize(out, outsize)
                    return jnp.mean((out * mask - ref * mask) ** 2)

                def body(_, carry):
                    p, s = carry
                    grads = jax.grad(loss_fn)(p)
                    updates, s = tx.update(grads, s, p)
                    return optax.apply_updates(p, updates), s

                params, _ = jax.lax.fori_loop(0, iters, body, (params, opt_state))
                out = model.apply({"params": params}, inp)[0, :, :, 0]
                return _nearest_resize(out, outsize)

            self._finetune_fn = finetune

        out = self._finetune_fn(
            self.base_params, inp, ref, mask, jnp.float32(lr), iters, outsize
        )
        return np.asarray(out)

    def run(self, depth_src: np.ndarray, outsize: int = 512) -> np.ndarray:
        """Plain forward pass (merge_model_single_channel.py:54-58)."""
        inp = _nearest_resize(jnp.asarray(depth_src, jnp.float32), self.net_size)
        inp = minmax_normalize(inp)[None, :, :, None]
        out = jax.jit(self.model.apply)({"params": self.base_params}, inp)
        return np.asarray(_nearest_resize(out[0, :, :, 0], outsize))

    def save(self, path: str):
        _save_params(path, self.base_params)


# -- offline pre-training (merge_model_single_channel.py:60-191) -------------


def synthetic_corruption(rng: np.random.Generator, depth: np.ndarray):
    """Exact corruption pipeline of the reference's training data_loader
    (merge_model_single_channel.py:119-126): given depth in [-1, 1],

        d2       = minmax(depth)                      # [0, 1]
        shift    ~ U(0, 1);  degree ~ randint(30, 60) # inclusive
        scale1   = U(0.9, 1.1) * d2 ** (1 / degree)   # pixelwise array
        depth_in = minmax((d2 + shift) * scale1) * 2 - 1

    simulating the monocular estimator's unknown affine distortion plus a
    sharp near-zero root nonlinearity.  Returns depth_in in [-1, 1].
    """
    lo, hi = depth.min(), depth.max()
    d2 = (depth - lo) / max(hi - lo, 1e-12)
    shift = rng.uniform(0.0, 1.0)
    degree = int(rng.integers(30, 61))  # random.randint(30, 60) inclusive
    scale1 = rng.uniform(0.9, 1.1) * np.power(d2, 1.0 / degree)
    depth_in = (d2 + shift) * scale1
    lo, hi = depth_in.min(), depth_in.max()
    return ((depth_in - lo) / max(hi - lo, 1e-12)) * 2.0 - 1.0


def pretrain_merge_model(
    service: DepthMergeService,
    clean_depths,
    steps: int = 1000,
    lr: float = 1e-4,
    outsize: int = 512,
    seed: int = 0,
):
    """Offline trainer for the merge generator
    (merge_model_single_channel.py:160-182): corrupt clean depth with
    :func:`synthetic_corruption`, resize to the net size (nearest), run the
    generator, and minimize MSE between the ``outsize`` output and the clean
    depth with Adam(lr=1e-4, betas=(0.9, 0.999)) — the reference trains the
    generator alone with plain MSE (no GAN term, :159-160,177-180).
    Updates service.base_params in place; returns the loss history."""
    model = service.model
    tx = optax.adam(lr, b1=0.9, b2=0.999)
    params = service.base_params
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    size = service.net_size

    @functools.partial(jax.jit, static_argnames=())
    def step(params, opt_state, inp, target):
        def loss_fn(p):
            out = model.apply({"params": p}, inp)[:, :, :, 0]
            out = jax.vmap(lambda o: _nearest_resize(o, target.shape[-1]))(out)
            return jnp.mean((out - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        d = np.asarray(clean_depths[rng.integers(len(clean_depths))], np.float64)
        lo, hi = d.min(), d.max()
        depth = (d - lo) / max(hi - lo, 1e-12) * 2.0 - 1.0  # [-1, 1]
        depth_in = synthetic_corruption(rng, depth)
        inp = _nearest_resize(jnp.asarray(depth_in, jnp.float32), size)
        inp = minmax_normalize(inp)[None, :, :, None]
        tgt = _nearest_resize(
            jnp.asarray(depth, jnp.float32), min(outsize, size)
        )[None]
        params, opt_state, loss = step(params, opt_state, inp, tgt)
        losses.append(float(loss))
    service.base_params = params
    return losses


def _save_params(path: str, params):
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrs = {
        "/".join(str(k.key) for k in ks): np.asarray(v) for ks, v in flat
    }
    atomic_savez(path, **arrs)


def _load_params(path: str):
    data = np.load(path)
    out = {}
    for key, val in data.items():
        node = out
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return out
