"""Golden tests: our gathers vs torch.nn.functional.grid_sample
(align_corners=True), the op the reference model is built on
(tensoRF.py:205-239)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from text2nerf_tpu.ops.grid_sample import (
    grid_sample_1d,
    grid_sample_2d,
    grid_sample_3d,
    resize_bilinear_align_corners,
    resize_linear_align_corners,
)


def test_grid_sample_2d_matches_torch(rng):
    h, w, c = 13, 9, 4
    plane = rng.standard_normal((h, w, c)).astype(np.float32)
    n = 257
    x = rng.uniform(-1, 1, n).astype(np.float32)
    y = rng.uniform(-1, 1, n).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(x), jnp.asarray(y)))

    t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None]  # [1,C,H,W]
    grid = torch.from_numpy(np.stack([x, y], -1)).view(1, n, 1, 2)
    ref = F.grid_sample(t_plane, grid, align_corners=True).view(c, n).T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_1d_matches_torch(rng):
    l, c = 17, 6
    line = rng.standard_normal((l, c)).astype(np.float32)
    n = 123
    y = rng.uniform(-1, 1, n).astype(np.float32)

    ours = np.asarray(grid_sample_1d(jnp.asarray(line), jnp.asarray(y)))

    # reference samples lines as [1, C, L, 1] with grid (0, y)
    # (tensoRF.py:209-210,216-217)
    t_line = torch.from_numpy(line).T[None, :, :, None]
    grid = torch.from_numpy(np.stack([np.zeros_like(y), y], -1)).view(1, n, 1, 2)
    ref = F.grid_sample(t_line, grid, align_corners=True).view(c, n).T.numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_3d_matches_torch(rng):
    d, h, w = 7, 9, 11
    vol = rng.standard_normal((d, h, w)).astype(np.float32)
    n = 99
    coords = rng.uniform(-1, 1, (n, 3)).astype(np.float32)

    ours = np.asarray(
        grid_sample_3d(
            jnp.asarray(vol),
            jnp.asarray(coords[:, 0]),
            jnp.asarray(coords[:, 1]),
            jnp.asarray(coords[:, 2]),
        )
    )

    # alpha-mask sampling convention (tensorBase.py:52-56)
    t_vol = torch.from_numpy(vol)[None, None]
    grid = torch.from_numpy(coords).view(1, n, 1, 1, 3)
    ref = F.grid_sample(t_vol, grid, align_corners=True).view(n).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_resize_matches_torch_interpolate(rng):
    h, w, c = 8, 10, 3
    img = rng.standard_normal((h, w, c)).astype(np.float32)
    out = np.asarray(resize_bilinear_align_corners(jnp.asarray(img), 15, 21))
    ref = (
        F.interpolate(
            torch.from_numpy(img).permute(2, 0, 1)[None],
            size=(15, 21),
            mode="bilinear",
            align_corners=True,
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)

    line = rng.standard_normal((12, 5)).astype(np.float32)
    out1 = np.asarray(resize_linear_align_corners(jnp.asarray(line), 29))
    ref1 = (
        F.interpolate(
            torch.from_numpy(line).T[None, :, :, None],
            size=(29, 1),
            mode="bilinear",
            align_corners=True,
        )[0, :, :, 0]
        .T.numpy()
    )
    np.testing.assert_allclose(out1, ref1, rtol=1e-5, atol=1e-5)
