"""Shading heads for the radiance field.

Functional (params-pytree) equivalents of the reference shading modules
(/root/reference/models/tensorBase.py:62-159):

- ``MLP_Fea_noview`` (tensorBase.py:88-109) — the default Text2NeRF head:
  input = [app_features, PE(app_features, fea_pe)], two hidden ReLU layers,
  sigmoid RGB.
- ``MLP_Fea`` (tensorBase.py:62-86) — adds viewdirs + PE(viewdirs).
- ``MLP_PE``  (tensorBase.py:111-135) — positions PE + viewdirs PE.
- ``MLP``     (tensorBase.py:137-159) — viewdirs PE only.
- ``SH`` / ``RGB`` function renderers (tensorBase.py:29-39).

All matmuls run in the caller-selected compute dtype (bf16 on TPU by
default) with fp32 params, and hit the MXU as [N, in] x [in, featureC].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .sh import eval_sh_bases


def positional_encoding(x, freqs: int):
    """Sin/cos PE over 2**k bands (tensorBase.py:11-17).

    Maps (..., D) to (..., 2 * freqs * D); ordering matches the reference:
    all sins of every (dim, band) pair, then all cosines.
    """
    bands = 2.0 ** jnp.arange(freqs, dtype=x.dtype)
    pts = (x[..., None] * bands).reshape(*x.shape[:-1], freqs * x.shape[-1])
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)


def mlp_input_dim(mode: str, app_dim: int, view_pe: int, fea_pe: int, pos_pe: int):
    if mode == "MLP_Fea_noview":
        return 2 * fea_pe * app_dim + app_dim
    if mode == "MLP_Fea":
        return 2 * view_pe * 3 + 2 * fea_pe * app_dim + 3 + app_dim
    if mode == "MLP_PE":
        return (3 + 2 * view_pe * 3) + (3 + 2 * pos_pe * 3) + app_dim
    if mode == "MLP":
        return (3 + 2 * view_pe * 3) + app_dim
    raise ValueError(f"unknown MLP shading mode: {mode}")


def init_mlp(rng, in_dim: int, feature_c: int = 128, dtype=jnp.float32):
    """Three-layer MLP params with torch.nn.Linear default init
    (U[-1/sqrt(fan_in), 1/sqrt(fan_in)]) and zero final bias
    (tensorBase.py:69-74)."""
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)

    def linear(rng_w, rng_b, fan_in, fan_out):
        bound = 1.0 / jnp.sqrt(fan_in)
        w = jax.random.uniform(rng_w, (fan_in, fan_out), dtype, -bound, bound)
        b = jax.random.uniform(rng_b, (fan_out,), dtype, -bound, bound)
        return w, b

    w1, b1 = linear(k1, k2, in_dim, feature_c)
    w2, b2 = linear(k3, k4, feature_c, feature_c)
    w3, _ = linear(k5, k5, feature_c, 3)
    return {
        "w1": w1, "b1": b1,
        "w2": w2, "b2": b2,
        "w3": w3, "b3": jnp.zeros((3,), dtype),
    }


def apply_mlp(params, x, compute_dtype=jnp.float32):
    """Run the 3-layer ReLU MLP + sigmoid (tensorBase.py:73-84)."""
    x = x.astype(compute_dtype)
    h = jax.nn.relu(
        x @ params["w1"].astype(compute_dtype) + params["b1"].astype(compute_dtype)
    )
    h = jax.nn.relu(
        h @ params["w2"].astype(compute_dtype) + params["b2"].astype(compute_dtype)
    )
    rgb = h @ params["w3"].astype(compute_dtype) + params["b3"].astype(compute_dtype)
    return jax.nn.sigmoid(rgb.astype(jnp.float32))


def shade(
    mode: str,
    mlp_params,
    pts,
    viewdirs,
    features,
    view_pe: int = 6,
    fea_pe: int = 6,
    pos_pe: int = 6,
    compute_dtype=jnp.float32,
):
    """Dispatch over shading modes; returns (N, 3) rgb in [0, 1]."""
    if mode == "MLP_Fea_noview":
        x = jnp.concatenate(
            [features, positional_encoding(features, fea_pe)], axis=-1
        )
        return apply_mlp(mlp_params, x, compute_dtype)
    if mode == "MLP_Fea":
        parts = [features, viewdirs]
        if fea_pe > 0:
            parts.append(positional_encoding(features, fea_pe))
        if view_pe > 0:
            parts.append(positional_encoding(viewdirs, view_pe))
        return apply_mlp(mlp_params, jnp.concatenate(parts, -1), compute_dtype)
    if mode == "MLP_PE":
        parts = [features, viewdirs]
        if pos_pe > 0:
            parts.append(positional_encoding(pts, pos_pe))
        if view_pe > 0:
            parts.append(positional_encoding(viewdirs, view_pe))
        return apply_mlp(mlp_params, jnp.concatenate(parts, -1), compute_dtype)
    if mode == "MLP":
        parts = [features, viewdirs]
        if view_pe > 0:
            parts.append(positional_encoding(viewdirs, view_pe))
        return apply_mlp(mlp_params, jnp.concatenate(parts, -1), compute_dtype)
    if mode == "SH":
        sh_mult = eval_sh_bases(2, viewdirs)[:, None]
        rgb_sh = features.reshape(-1, 3, sh_mult.shape[-1])
        return jax.nn.relu(jnp.sum(sh_mult * rgb_sh, axis=-1) + 0.5)
    if mode == "RGB":
        return features
    raise ValueError(f"unknown shading mode: {mode}")
