"""Depth-merge service tests: the test-time finetune aligns a distorted
depth to the reference on known pixels and inpaints the rest smoothly."""

import numpy as np

from text2nerf_tpu.services.merge import DepthMergeService, pretrain_merge_model
from text2nerf_tpu.services import fallbacks


def test_finetune_fits_known_region():
    svc = DepthMergeService(net_size=128, num_downs=7, seed=0)
    h = w = 64
    rng = np.random.default_rng(0)
    # ground-truth depth in [-1, 1] (the merge net's working range)
    yy = np.linspace(-0.5, 0.5, h, dtype=np.float32)[:, None]
    depth_true = yy + 0.1 * rng.standard_normal((h, w)).astype(np.float32) * 0
    depth_true = np.tile(yy, (1, w))
    mask = np.ones((h, w), np.float32)
    mask[:, w // 2 :] = 0  # right half unknown
    depth_ref = depth_true * mask
    depth_src = depth_true * 0.7 + 0.2  # affine-distorted source

    out = svc.run_finetune(depth_ref, depth_src, mask, outsize=64, lr=3e-4, iters=150)
    err_known = np.abs(out - depth_true)[mask > 0].mean()
    assert err_known < 0.12, err_known
    # the unknown half should stay in a sane range (net inpaints smoothly)
    assert np.abs(out[mask == 0]).max() <= 1.5


def test_plain_forward_shapes():
    svc = DepthMergeService(net_size=128, num_downs=7, seed=1)
    out = svc.run(np.random.default_rng(0).uniform(-1, 1, (64, 64)).astype(np.float32), outsize=64)
    assert out.shape == (64, 64)
    assert np.abs(out).max() <= 1.0  # tanh output


def test_synthetic_corruption_reference_semantics():
    """Golden check of the corruption pipeline against a literal numpy
    transcription of the reference data_loader's __getitem__
    (merge_model_single_channel.py:119-126)."""
    from text2nerf_tpu.services.merge import synthetic_corruption

    base = np.random.default_rng(7).uniform(-1, 1, (32, 32))
    out = synthetic_corruption(np.random.default_rng(3), base)

    rng = np.random.default_rng(3)  # same draw order: shift, degree, scale
    d2 = (base - base.min()) / (base.max() - base.min())
    shift = rng.uniform(0.0, 1.0)
    degree = int(rng.integers(30, 61))
    scale1 = rng.uniform(0.9, 1.1) * np.power(d2, 1.0 / degree)
    din = (d2 + shift) * scale1
    din = (din - din.min()) / (din.max() - din.min()) * 2.0 - 1.0
    np.testing.assert_allclose(out, din, atol=1e-12)

    # reference invariants: output spans exactly [-1, 1] and is monotonic
    # in the input (the corruption is order-preserving)
    assert out.min() == -1.0 and out.max() == 1.0
    flat_in, flat_out = base.ravel(), out.ravel()
    order = np.argsort(flat_in)
    assert np.all(np.diff(flat_out[order]) >= -1e-12)


def test_pretrain_reduces_loss(tmp_path):
    svc = DepthMergeService(net_size=128, num_downs=7, seed=2)
    rng = np.random.default_rng(0)
    depths = [rng.uniform(1, 5, (64, 64)).astype(np.float32) for _ in range(4)]
    losses = pretrain_merge_model(svc, depths, steps=30, lr=3e-4)
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    # save/load roundtrip
    path = str(tmp_path / "merge.npz")
    svc.save(path)
    svc2 = DepthMergeService(ckpt_path=path, net_size=128, num_downs=7)
    out1 = svc.run(depths[0], outsize=64)
    out2 = svc2.run(depths[0], outsize=64)
    np.testing.assert_allclose(out1, out2, atol=1e-5)
