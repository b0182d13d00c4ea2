"""Pallas TPU kernel: fused positional encoding + shading MLP.

The appearance head (MLP_Fea_noview, tensorBase.py:88-109) expands each
27-dim appearance feature to a 351-dim input (feature + 12 sin/cos PE
bands) before three matmuls.  Under plain XLA the 351-wide PE tensor is
materialized in HBM between fusions (~1.4 GB round trip per 16k-ray chunk
at K=64).  This kernel keeps everything in VMEM: each grid step loads a
block of features, computes the PE bands on the VPU, runs the three
matmuls on the MXU against weights resident in VMEM, and writes only the
(block, 3) sigmoid RGB.

Used on the eval/render path (no backward); training uses the XLA head
(autodiff).  Falls back transparently when Pallas is unavailable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(feat_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
            *, fea_pe: int):
    feat = feat_ref[:]  # (BLK, C)
    blk, c = feat.shape

    # positional encoding (tensorBase.py:11-17).  Mosaic supports neither
    # float iota nor 3D→2D shape casts, so the bands are unrolled as scalar
    # multiplies and laid out band-major; the caller permutes the first
    # matmul's weight rows to compensate (exact math).
    pts = jnp.concatenate(
        [feat * (2.0 ** k) for k in range(fea_pe)], axis=-1
    )  # (BLK, F*C) band-major
    x = jnp.concatenate([feat, jnp.sin(pts), jnp.cos(pts)], axis=-1)

    h = jnp.maximum(
        jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:],
        0.0,
    )
    h = jnp.maximum(
        jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:],
        0.0,
    )
    rgb = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
    out_ref[:] = jax.nn.sigmoid(rgb)


@functools.partial(jax.jit, static_argnames=("fea_pe", "block"))
def shade_fea_noview_pallas(mlp_params, features, fea_pe: int = 6,
                            block: int = 2048):
    """Fused MLP_Fea_noview head.

    Args:
      mlp_params: {'w1','b1','w2','b2','w3','b3'} (ops order matches
        models/mlp.init_mlp).
      features: (N, app_dim) appearance features.
    Returns: (N, 3) rgb in [0, 1].
    """
    n, c = features.shape
    pad = (-n) % block
    if pad:
        features = jnp.concatenate(
            [features, jnp.zeros((pad, c), features.dtype)], 0
        )
    n_pad = features.shape[0]

    # permute w1 rows: kernel PE layout is band-major (f*C + c) while the
    # reference layout is channel-major (c*F + f) within each sin/cos block
    perm = np.arange(c + 2 * c * fea_pe)
    for block_idx in range(2):  # sin block, cos block
        base = c + block_idx * c * fea_pe
        for f in range(fea_pe):
            for ch in range(c):
                perm[base + f * c + ch] = c + block_idx * c * fea_pe + ch * fea_pe + f
    w1 = mlp_params["w1"].astype(jnp.float32)[jnp.asarray(perm)]
    b1 = mlp_params["b1"].astype(jnp.float32)[None, :]
    w2 = mlp_params["w2"].astype(jnp.float32)
    b2 = mlp_params["b2"].astype(jnp.float32)[None, :]
    w3 = mlp_params["w3"].astype(jnp.float32)
    b3 = mlp_params["b3"].astype(jnp.float32)[None, :]

    grid = (n_pad // block,)
    out = pl.pallas_call(
        functools.partial(_kernel, fea_pe=fea_pe),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b1.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(b3.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),
    )(features.astype(jnp.float32), w1, b1, w2, b2, w3, b3)
    return out[:n]


def pallas_available() -> bool:
    """True when running on a real TPU backend (Mosaic path)."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
