"""Quality metrics: PSNR / SSIM / (weight-gated) LPIPS.

Mirrors the metric stack of the reference (renderer.py:98-109,
utils.py:412-482, extra/compute_metrics.py).
"""

from __future__ import annotations

import numpy as np
import scipy.signal


def psnr(img0, img1, max_val: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(img0) - np.asarray(img1)) ** 2))
    if mse == 0:
        return float("inf")
    return float(-10.0 * np.log(mse / max_val ** 2) / np.log(10.0))


def ssim(
    img0,
    img1,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
):
    """Gaussian-window SSIM (rgb_ssim, utils.py:436-482; same formulation as
    the mipnerf reference implementation it cites)."""
    img0 = np.asarray(img0, np.float64)
    img1 = np.asarray(img1, np.float64)
    assert img0.shape == img1.shape and img0.shape[-1] == 3

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def conv(z, f):
        return scipy.signal.convolve2d(z, f, mode="valid")

    def filt_fn(z):
        return np.stack(
            [conv(conv(z[..., i], filt[:, None]), filt[None, :]) for i in range(3)],
            -1,
        )

    mu0 = filt_fn(img0)
    mu1 = filt_fn(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    sigma00 = np.maximum(0.0, filt_fn(img0 ** 2) - mu00)
    sigma11 = np.maximum(0.0, filt_fn(img1 ** 2) - mu11)
    sigma01 = filt_fn(img0 * img1) - mu01
    sigma01 = np.sign(sigma01) * np.minimum(
        np.sqrt(sigma00 * sigma11), np.abs(sigma01)
    )
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu01 + c1) * (2 * sigma01 + c2)) / (
        (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    )
    return ssim_map if return_map else float(np.mean(ssim_map))


_LPIPS = {}


def lpips(img0, img1, net: str = "alex", weights_dir=None) -> float:
    """Learned perceptual similarity (rgb_lpips, utils.py:419-424).

    Requires pretrained feature weights; raises a clear error when absent
    (no network egress on TPU pods — supply converted weights).
    """
    key = (net, weights_dir)
    if key not in _LPIPS:
        from ..models.lpips import LPIPSModel

        _LPIPS[key] = LPIPSModel.create(net, weights_dir)
    return _LPIPS[key](np.asarray(img0), np.asarray(img1))


def visualize_depth(depth, minmax=None, colorize: bool = True):
    """Depth → JET colormap uint8 (visualize_depth_numpy, utils.py:241-265)."""
    import cv2

    x = np.nan_to_num(np.asarray(depth))
    if minmax is None:
        positive = x[x > 0]
        mi = float(positive.min()) if positive.size else 0.0
        ma = float(x.max())
    else:
        mi, ma = minmax
    xn = np.maximum((x - mi) / (ma - mi + 1e-8), 0)
    x8 = (255 * xn).astype(np.uint8)
    if colorize:
        return cv2.applyColorMap(x8, cv2.COLORMAP_JET), (mi, ma)
    return np.repeat(x8[..., None], 3, -1), (mi, ma)
