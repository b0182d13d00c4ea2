"""Pallas fused shading kernel — numerical equivalence vs the XLA head.

Runs only on a real TPU backend (Mosaic); the CPU test harness skips it
(the driver exercises TPU paths via bench.py and the perf scripts).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from text2nerf_tpu.models import mlp as M

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform not in ("tpu", "axon"),
    reason="Pallas TPU kernel requires a TPU backend",
)


def test_pallas_head_matches_xla():
    from text2nerf_tpu.ops.pallas.shading_mlp import shade_fea_noview_pallas

    app_dim, fea_pe = 27, 6
    params = M.init_mlp(
        jax.random.PRNGKey(0),
        M.mlp_input_dim("MLP_Fea_noview", app_dim, 2, fea_pe, 6),
    )
    feats = jnp.asarray(
        np.random.default_rng(0).standard_normal((4096, app_dim)).astype(np.float32)
    )
    ref = M.shade("MLP_Fea_noview", params, None, None, feats, fea_pe=fea_pe)
    got = shade_fea_noview_pallas(params, feats, fea_pe=fea_pe)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
