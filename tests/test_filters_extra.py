"""Image-edge bilateral variant + ray-marcher utilities."""

import numpy as np
import jax.numpy as jnp

from text2nerf_tpu.ops import filters, rays as R


def test_image_edge_bilateral_semantics():
    depth = np.full((16, 16), 2.0, np.float32)
    img = np.full((16, 16, 3), 0.5, np.float32)
    img[:, 8:] = 0.9  # image edge at column 8
    img2, depth2 = filters.sparse_bilateral_filtering_image_edge(
        depth, img, filter_size=(5, 5, 3, 3), num_iter=4
    )
    assert img2.shape == (16, 16, 3)
    assert np.isfinite(np.asarray(depth2)).all()
    # constant regions away from the edge are untouched
    np.testing.assert_allclose(np.asarray(depth2)[:, :5], 2.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(img2)[:, :5], 0.5, atol=1e-5)


def test_ray_marcher_near_far():
    rays = jnp.asarray(
        np.concatenate(
            [
                np.zeros((4, 3), np.float32),
                np.tile(np.array([[0, 0, 1.0]], np.float32), (4, 1)),
                np.full((4, 1), 2.0, np.float32),
                np.full((4, 1), 6.0, np.float32),
            ],
            -1,
        )
    )
    xyz, o, d, z = R.ray_marcher(rays, n_samples=8)
    assert xyz.shape == (4, 8, 3)
    np.testing.assert_allclose(np.asarray(z[:, 0]), 2.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[:, -1]), 6.0, atol=1e-6)

    # lindisp spacing is denser near the camera
    _, _, _, z2 = R.ray_marcher(rays, n_samples=8, lindisp=True)
    gaps = np.diff(np.asarray(z2)[0])
    assert gaps[0] < gaps[-1]

    # bbox override
    bbox = jnp.array([[-1.0, -1.0, 3.0], [1.0, 1.0, 5.0]])
    _, _, _, z3 = R.ray_marcher(rays, n_samples=8, bbox=bbox)
    np.testing.assert_allclose(np.asarray(z3[:, 0]), 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(z3[:, -1]), 5.0, atol=1e-5)


def test_depth2dist():
    z = jnp.asarray(np.array([[1.0, 2.0, 4.0]], np.float32))
    cos = jnp.asarray(np.array([0.5], np.float32))
    d = np.asarray(R.depth2dist(z, cos))
    np.testing.assert_allclose(d[0, :2], [0.5, 1.0])
    assert d[0, 2] > 1e9 * 0.4
