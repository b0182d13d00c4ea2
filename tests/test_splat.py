"""DIBR splatting tests: identity, known translation, z-buffer ordering,
and a literal numpy cross-check of the scatter-add."""

import numpy as np
import jax.numpy as jnp

from text2nerf_tpu.ops import splat


K = (64.0, 64.0, 32.0, 32.0)


def _scene(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    rgb = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    depth = np.full((h, w), 4.0, np.float32)
    return rgb, depth


def test_identity_warp_reproduces_image():
    rgb, depth = _scene()
    pose = np.eye(4, dtype=np.float32)
    rgbs, masks, depths = splat.warp_one_to_many(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(pose),
        jnp.asarray(pose)[None], K,
    )
    m = np.asarray(masks[0])
    assert m.mean() > 0.99
    # uint8 quantization tolerance
    np.testing.assert_allclose(
        np.asarray(rgbs[0])[m > 0], rgb[m > 0], atol=2.5 / 255
    )
    np.testing.assert_allclose(np.asarray(depths[0])[m > 0], 4.0, atol=1e-3)


def test_translation_shifts_image():
    """Camera translated +x by t: content shifts by -t*fx/z pixels."""
    _, depth = _scene()
    rgb = np.full((64, 64, 3), 0.5, np.float32)
    # recognizable vertical stripe on a gray background
    rgb[:, 30:34] = np.array([1.0, 0.0, 0.0])
    pose_src = np.eye(4, dtype=np.float32)
    pose_tar = np.eye(4, dtype=np.float32)
    t = 0.5
    pose_tar[0, 3] = t  # camera moves +x
    rgbs, masks, depths = splat.warp_one_to_many(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(pose_src),
        jnp.asarray(pose_tar)[None], K,
    )
    shift = int(round(t * K[0] / 4.0))  # 8 px
    out = np.asarray(rgbs[0])
    # stripe should now be at columns 30-34 - shift
    red = (out[:, :, 0] > 0.9) & (out[:, :, 1] < 0.1)
    cols = np.where(red.any(axis=0))[0]
    assert cols.min() >= 30 - shift - 1 and cols.max() <= 33 - shift + 1


def test_soft_zbuffer_prefers_near_content():
    """Two sources splatting to the same pixels: nearer depth dominates
    via the exponential depth weighting (Warper.py:141-148)."""
    h = w = 32
    near_rgb = np.zeros((h, w, 3), np.float32)
    near_rgb[..., 0] = 1.0  # red at depth 2
    far_rgb = np.zeros((h, w, 3), np.float32)
    far_rgb[..., 2] = 1.0  # blue at depth 8
    pose = np.eye(4, dtype=np.float32)
    k = (32.0, 32.0, 16.0, 16.0)
    mask, img, depth = splat.warp_many_to_one(
        [jnp.asarray(near_rgb), jnp.asarray(far_rgb)],
        [jnp.full((h, w), 2.0, np.float32), jnp.full((h, w), 8.0, np.float32)],
        np.stack([pose, pose]),
        pose, k,
    )
    m = np.asarray(mask) > 0
    out = np.asarray(img)
    # first view owns its pixels (merge priority, utils.py:107-113)
    assert out[m][:, 0].mean() > 0.9
    np.testing.assert_allclose(np.asarray(depth)[m], 2.0, atol=0.05)


def test_bilinear_splat_matches_numpy_adds():
    """Literal cross-check of the 4-corner scatter against np.add.at with
    the same weights (the algorithm of Warper.py:119-173)."""
    rng = np.random.default_rng(3)
    h = w = 8
    frame = rng.uniform(0, 255, (h, w, 1)).astype(np.float32)
    depth = rng.uniform(1, 5, (h, w)).astype(np.float32)
    pos = (
        np.stack(np.meshgrid(np.arange(w), np.arange(h)), -1).astype(np.float32)
        + rng.uniform(-1.2, 1.2, (h, w, 2)).astype(np.float32)
    )
    ours, mask2 = splat.bilinear_splat(
        jnp.asarray(frame), jnp.ones((h, w)), jnp.asarray(depth),
        jnp.asarray(pos), is_image=False,
    )

    off = pos + 1
    fl = np.floor(off).astype(int)
    ce = np.ceil(off).astype(int)
    off = np.stack([np.clip(off[..., 0], 0, w + 1), np.clip(off[..., 1], 0, h + 1)], -1)
    fl = np.stack([np.clip(fl[..., 0], 0, w + 1), np.clip(fl[..., 1], 0, h + 1)], -1)
    ce = np.stack([np.clip(ce[..., 0], 0, w + 1), np.clip(ce[..., 1], 0, h + 1)], -1)
    pnw = (1 - (off[..., 1] - fl[..., 1])) * (1 - (off[..., 0] - fl[..., 0]))
    psw = (1 - (ce[..., 1] - off[..., 1])) * (1 - (off[..., 0] - fl[..., 0]))
    pne = (1 - (off[..., 1] - fl[..., 1])) * (1 - (ce[..., 0] - off[..., 0]))
    pse = (1 - (ce[..., 1] - off[..., 1])) * (1 - (ce[..., 0] - off[..., 0]))
    dw = np.exp(np.log1p(np.clip(depth, 0, 1000)) / np.log1p(depth).max() * 50)
    acc = np.zeros((h + 2, w + 2, 1))
    accw = np.zeros((h + 2, w + 2))
    for (yy, xx, ww) in (
        (fl[..., 1], fl[..., 0], pnw / dw),
        (ce[..., 1], fl[..., 0], psw / dw),
        (fl[..., 1], ce[..., 0], pne / dw),
        (ce[..., 1], ce[..., 0], pse / dw),
    ):
        np.add.at(acc, (yy, xx), frame * ww[..., None])
        np.add.at(accw, (yy, xx), ww)
    ref = np.where(
        (accw > 0)[1:-1, 1:-1, None], acc[1:-1, 1:-1] / np.maximum(accw, 1e-30)[1:-1, 1:-1, None], 0
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(mask2), accw[1:-1, 1:-1] > 0)


def test_warp_one_to_many_white_background():
    rgb, depth = _scene(32, 32)
    pose_src = np.eye(4, dtype=np.float32)
    pose_tar = np.eye(4, dtype=np.float32)
    pose_tar[0, 3] = 2.0  # big shift → large disocclusion
    k = (32.0, 32.0, 16.0, 16.0)
    rgbs, masks, _ = splat.warp_one_to_many(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(pose_src),
        jnp.asarray(pose_tar)[None], k,
    )
    m = np.asarray(masks[0])
    out = np.asarray(rgbs[0])
    assert (m == 0).sum() > 10
    np.testing.assert_allclose(out[m == 0], 1.0, atol=1e-6)


def test_warp_with_mask_matches_double_call():
    """warp_one_to_many_with_mask ≡ two warp_one_to_many calls (bit-level):
    full-content rgb/mask/depth from the unmasked call, extra coverage from
    the mask-restricted call's second output."""
    rng = np.random.default_rng(5)
    h = w = 48
    rgb = rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
    depth = (3.0 + rng.uniform(0, 2, (h, w))).astype(np.float32)
    extra = (rng.random((h, w)) > 0.6).astype(np.float32)
    pose_src = np.eye(4, dtype=np.float32)
    poses_tar = np.stack([np.eye(4, dtype=np.float32) for _ in range(3)])
    poses_tar[0, 0, 3] = 0.15
    poses_tar[1, 1, 3] = -0.1
    poses_tar[2, 2, 3] = 0.2
    kk = (48.0, 48.0, 24.0, 24.0)

    ref_rgb, ref_m, ref_d = splat.warp_one_to_many(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(pose_src),
        jnp.asarray(poses_tar), kk,
    )
    _, ref_me, _ = splat.warp_one_to_many(
        jnp.asarray(rgb), jnp.asarray(depth), jnp.asarray(pose_src),
        jnp.asarray(poses_tar), kk, mask=jnp.asarray(extra),
    )
    got_rgb, got_m, got_d, got_me = splat.warp_one_to_many_with_mask(
        rgb, depth, pose_src, poses_tar, kk, extra_mask=extra
    )
    # rgb/depth: one program vs two — XLA fusion differences leave ≤1-ulp
    # float noise; coverage masks must stay bit-exact
    np.testing.assert_allclose(
        np.asarray(got_rgb), np.asarray(ref_rgb), atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(ref_d), atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_me), np.asarray(ref_me))
