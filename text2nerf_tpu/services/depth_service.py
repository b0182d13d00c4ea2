"""Boosted monocular depth estimation.

Re-design of the in-repo boosting driver
(/root/reference/scripts/depth_esti_boosting.py:145-338, itself adapted
from BoostingMonocularDepth): content-adaptive resolution search, whole-
image double estimation merged by a pix2pix net, gradient-based patch
selection, per-patch double estimation merged back with a polyfit rescale
and Gaussian-mask blending.

The base estimator and the double-estimate merger are injectable callables,
so the machinery runs with the Flax LeReS/MiDaS/SGRNet ports
(models/monodepth.py) under converted weights, or with any stand-in.  The
host-side patch logic stays Python (data-dependent control flow); all net
inference is jitted at fixed sizes.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

WHOLE_SIZE_THRESHOLD = 3000  # R_max (depth_esti_boosting.py:48)
GPU_THRESHOLD = 1600 - 32    # max single-pass resolution (:49)


def _rgb2gray(img):
    return 0.2989 * img[..., 0] + 0.5870 * img[..., 1] + 0.1140 * img[..., 2]


def _sobel_grad(gray):
    import cv2

    return np.abs(cv2.Sobel(gray, cv2.CV_64F, 0, 1, ksize=3)) + np.abs(
        cv2.Sobel(gray, cv2.CV_64F, 1, 0, ksize=3)
    )


def gaussian_blend_mask(size: Tuple[int, int]) -> np.ndarray:
    """Patch blending mask (generatemask, BoostingMonocularDepth/utils.py)."""
    import cv2

    mask = np.zeros(size, np.float32)
    sigma = int(size[0] / 16)
    k = int(2 * np.ceil(2 * int(size[0] / 16)) + 1)
    mask[
        int(0.15 * size[0]) : size[0] - int(0.15 * size[0]),
        int(0.15 * size[1]) : size[1] - int(0.15 * size[1]),
    ] = 1
    mask = cv2.GaussianBlur(mask, (k, k), sigma)
    return ((mask - mask.min()) / (mask.max() - mask.min())).astype(np.float32)


def calculate_processing_res(
    img, basesize: int, confidence: float = 0.2, scale_threshold: int = 3,
    whole_size_threshold: int = WHOLE_SIZE_THRESHOLD,
):
    """Resolution search R_x (calculateprocessingres,
    BoostingMonocularDepth/utils.py:78-128): grow the processing size until
    more than ``confidence`` of pixels lose all contextual cues (edge-map
    dilation with a receptive-field-sized kernel no longer covers them)."""
    import cv2

    speed_scale = 32
    image_dim = int(min(img.shape[:2]))
    grad = _sobel_grad(_rgb2gray(img))
    grad = cv2.resize(grad, (image_dim, image_dim), interpolation=cv2.INTER_AREA)
    middle = grad.min() + 0.4 * (grad.max() - grad.min())
    grad = (grad >= middle).astype(np.float32)

    kernel = np.ones(
        (max(int(basesize / speed_scale), 1),) * 2, np.float32
    )
    threshold = min(whole_size_threshold, scale_threshold * max(img.shape[:2]))
    outputsize_scale = basesize / speed_scale
    for p_size in range(
        int(basesize / speed_scale), int(threshold / speed_scale),
        max(int(basesize / (2 * speed_scale)), 1),
    ):
        grad_resized = cv2.resize(
            grad, (p_size, p_size), interpolation=cv2.INTER_AREA
        )
        grad_resized = (grad_resized >= 0.5).astype(np.float32)
        dilated = cv2.dilate(grad_resized, kernel, iterations=1)
        if (1 - dilated).mean() > confidence:
            break
        outputsize_scale = p_size

    optimal = int(outputsize_scale * speed_scale)
    patch_scale = optimal / max(basesize, 1)
    return optimal, patch_scale


def _integral(img):
    import cv2

    return cv2.integral(img)


def _box_sum(integral, rect):
    x, y, w, h = rect
    return (
        integral[y + h, x + w] - integral[y, x + w]
        - integral[y + h, x] + integral[y, x]
    )


def generate_patches(img, base_size: int, factor: float) -> List[Dict]:
    """Gradient-driven adaptive patch selection (generatepatchs +
    adaptiveselection, depth_esti_boosting.py:345-427): grid of
    receptive-field patches, keep those denser in gradients than the whole
    image, grow each until its density drops to the image mean; sorted
    biggest-first so merging refines coarse-to-fine."""
    h, w = img.shape[:2]
    grad = _sobel_grad(_rgb2gray(img))
    pos = grad[grad > 0]
    thr = pos.mean() if pos.size else 0.0
    grad[grad < thr] = 0
    gf = grad.sum() / grad.size
    integral = _integral(grad)

    blsize = int(round(base_size / 2))
    stride = int(round(blsize * 0.75))
    search_step = max(int(32 / max(factor, 1e-6)), 1)

    patches = []
    for y in range(0, max(h - blsize, 1), stride):
        for x in range(0, max(w - blsize, 1), stride):
            rect = [x, y, min(blsize, w - x - 1), min(blsize, h - y - 1)]
            if rect[2] < 8 or rect[3] < 8:
                continue
            cgf = _box_sum(integral, rect) / (rect[2] * rect[3])
            if cgf < gf:
                continue
            bbox = rect.copy()
            test = rect.copy()
            while True:
                test = [
                    test[0] - search_step // 2, test[1] - search_step // 2,
                    test[2] + search_step, test[3] + search_step,
                ]
                if (
                    test[0] < 0 or test[1] < 0
                    or test[1] + test[3] >= h or test[0] + test[2] >= w
                ):
                    break
                if _box_sum(integral, test) / (test[2] * test[3]) < gf:
                    break
                bbox = test.copy()
            patches.append({"rect": bbox, "size": bbox[2]})
    patches.sort(key=lambda p: p["size"], reverse=True)
    return patches


class BoostedDepthEstimator:
    """The boosting driver over injectable base-estimator + merger."""

    def __init__(
        self,
        base_estimate: Callable[[np.ndarray, int], np.ndarray],
        merge_double: Optional[Callable[[np.ndarray, np.ndarray], np.ndarray]] = None,
        receptive_field: int = 448,  # LeReS/SGRNet; 384 for MiDaS (:159-163)
        pix2pix_size: int = 1024,
        max_patches: Optional[int] = None,
    ):
        self.base_estimate = base_estimate
        self.merge_double = merge_double or self._fallback_merge
        self.rf = receptive_field
        self.pix2pix_size = pix2pix_size
        self.max_patches = max_patches
        self._mask3000 = None

    @staticmethod
    def _fallback_merge(low, high):
        """Weights-free double-estimate merge: keep the low-res estimate's
        global structure and graft the high-res estimate's local detail
        (high minus its own low-pass), the behavior the trained merge net
        approximates."""
        import cv2

        k = max(int(low.shape[0] / 16) * 2 + 1, 3)
        high_lp = cv2.GaussianBlur(high, (k, k), 0)
        merged = low + (high - high_lp)
        lo, hi = merged.min(), merged.max()
        return (merged - lo) / max(hi - lo, 1e-12)

    def _double_estimate(self, img, size1, size2):
        import cv2

        size2 = min(size2, GPU_THRESHOLD)
        e1 = self.base_estimate(img, min(size1, GPU_THRESHOLD))
        e2 = self.base_estimate(img, size2)
        p = self.pix2pix_size
        e1 = cv2.resize(e1, (p, p), interpolation=cv2.INTER_CUBIC)
        e2 = cv2.resize(e2, (p, p), interpolation=cv2.INTER_CUBIC)
        m = self.merge_double(e1, e2)
        lo, hi = m.min(), m.max()
        return (m - lo) / max(hi - lo, 1e-12)

    def estimate(self, img: np.ndarray, output_input_res: bool = True):
        """Full boosted estimate → 16-bit counts (depth_esti_boosting.py:
        145-338 + write_depth bits=2: counts = 65535 * normalized depth)."""
        import cv2

        input_res = img.shape
        optimal, patch_scale = calculate_processing_res(img, self.rf)
        whole = self._double_estimate(img, self.rf, optimal)

        factor = max(min(1.0, 4 * patch_scale * optimal / WHOLE_SIZE_THRESHOLD), 0.2)
        if img.shape[0] > img.shape[1]:
            a, b = 2 * optimal, round(2 * optimal * img.shape[1] / img.shape[0])
        else:
            a, b = round(2 * optimal * img.shape[0] / img.shape[1]), 2 * optimal
        a, b = int(round(a / factor)), int(round(b / factor))
        img_big = cv2.resize(img, (b, a), interpolation=cv2.INTER_CUBIC)

        patches = generate_patches(img_big, self.rf * 2, factor)
        if self.max_patches is not None:
            patches = patches[: self.max_patches]

        mergein_scale = input_res[0] / img_big.shape[0]
        out_hw = (
            round(img_big.shape[0] * mergein_scale),
            round(img_big.shape[1] * mergein_scale),
        )
        estimate = cv2.resize(
            whole, (out_hw[1], out_hw[0]), interpolation=cv2.INTER_CUBIC
        )

        if self._mask3000 is None:
            self._mask3000 = gaussian_blend_mask((3000, 3000))

        for patch in patches:
            x, y, w, h = patch["rect"]
            # scale the rect into output coordinates
            xo, yo = int(round(x * mergein_scale)), int(round(y * mergein_scale))
            wo, ho = int(round(w * mergein_scale)), int(round(h * mergein_scale))
            if wo < 8 or ho < 8:
                continue
            patch_rgb = img_big[y : y + h, x : x + w]
            patch_est = self._double_estimate(patch_rgb, self.rf, self.rf * 2)
            base_patch = estimate[yo : yo + ho, xo : xo + wo]
            p = self.pix2pix_size
            base_up = cv2.resize(base_patch, (p, p), interpolation=cv2.INTER_CUBIC)
            merged01 = self.merge_double(base_up, patch_est)
            # linear polyfit so the merged patch matches the base values
            coef = np.polyfit(merged01.reshape(-1), base_up.reshape(-1), deg=1)
            mapped = np.polyval(coef, merged01.reshape(-1)).reshape(merged01.shape)
            mapped = cv2.resize(mapped, (wo, ho), interpolation=cv2.INTER_CUBIC)
            blend = cv2.resize(
                self._mask3000, (wo, ho), interpolation=cv2.INTER_LINEAR
            )
            estimate[yo : yo + ho, xo : xo + wo] = (
                base_patch * (1 - blend) + mapped * blend
            )

        if output_input_res:
            estimate = cv2.resize(
                estimate, (input_res[1], input_res[0]),
                interpolation=cv2.INTER_CUBIC,
            )
        lo, hi = estimate.min(), estimate.max()
        norm = (estimate - lo) / max(hi - lo, np.finfo(np.float32).eps)
        return (65535.0 * norm).astype(np.float64)


def _find_leres_checkpoint(weights_path: str):
    """Locate a res101.pth torch checkpoint: the path itself, inside it,
    or at the reference's location
    (weights_BoostingMonocularDepth/pix2pix/checkpoints/res101.pth,
    depth_esti_boosting.py:195)."""
    import os

    if not weights_path:
        return None
    candidates = [weights_path]
    if os.path.isdir(weights_path):
        candidates += [
            os.path.join(weights_path, "res101.pth"),
            os.path.join(weights_path, "pix2pix", "checkpoints", "res101.pth"),
            os.path.join(os.path.dirname(weights_path),
                         "weights_BoostingMonocularDepth", "pix2pix",
                         "checkpoints", "res101.pth"),
        ]
    for cand in candidates:
        if os.path.isfile(cand) and cand.endswith(".pth"):
            return cand
    return None


def _find_midas_checkpoint(weights_path: str):
    """Locate midas/model.pt (the reference loads it from
    weights_BoostingMonocularDepth/midas/model.pt,
    depth_esti_boosting.py:181)."""
    import os

    if not weights_path:
        return None
    candidates = [weights_path]
    if os.path.isdir(weights_path):
        candidates += [
            os.path.join(weights_path, "model.pt"),
            os.path.join(weights_path, "midas", "model.pt"),
            os.path.join(os.path.dirname(weights_path),
                         "weights_BoostingMonocularDepth", "midas",
                         "model.pt"),
        ]
    for cand in candidates:
        if os.path.isfile(cand) and cand.endswith(".pt"):
            return cand
    return None


def _find_sgrnet_checkpoint(weights_path: str):
    """Locate structuredrl/model.pth.tar (depth_esti_boosting.py:190)."""
    import os

    if not weights_path:
        return None
    candidates = [weights_path]
    if os.path.isdir(weights_path):
        candidates += [
            os.path.join(weights_path, "model.pth.tar"),
            os.path.join(weights_path, "structuredrl", "model.pth.tar"),
            os.path.join(os.path.dirname(weights_path), "structuredrl",
                         "model.pth.tar"),
        ]
    for cand in candidates:
        if os.path.isfile(cand) and cand.endswith(".pth.tar"):
            return cand
    return None


def make_depth_estimator(weights_path: str, net: str = "leres"):
    """Boosted estimator backed by the Flax depth net + merge pix2pix.

    With real checkpoints present, uses the faithful architectures
    (models/leres.RelDepthModel for res101.pth and SGRNet's
    model.pth.tar, models/midas.MidasNet for midas/model.pt — all
    torch-verified conversions); otherwise the generic weights-free
    RelDepthNet stand-in keeps the machinery hermetically testable."""
    import jax
    import jax.numpy as jnp

    from ..models.monodepth import RelDepthNet, DepthNetConfig
    from ..models.pix2pix import UnetGenerator, minmax_normalize
    from .weight_convert import (
        load_converted, load_leres_checkpoint, load_midas_checkpoint,
        load_sgrnet_checkpoint,
    )

    converted = load_converted(weights_path)
    merge_params = converted.get("merge") if converted else None

    leres_ckpt = _find_leres_checkpoint(weights_path) if net == "leres" else None
    midas_ckpt = _find_midas_checkpoint(weights_path) if net == "midas" else None
    srl_ckpt = _find_sgrnet_checkpoint(weights_path) if net == "sgrnet" else None
    midas_real = False
    if leres_ckpt is not None:
        from ..models.leres import LeReSConfig, RelDepthModel

        model = RelDepthModel(LeReSConfig.resnext101(), dtype=jnp.bfloat16)
        params = load_leres_checkpoint(leres_ckpt)
    elif srl_ckpt is not None:
        from ..models.leres import LeReSConfig, RelDepthModel

        model = RelDepthModel(LeReSConfig.resnet50(), dtype=jnp.bfloat16)
        params = load_sgrnet_checkpoint(srl_ckpt)
    elif midas_ckpt is not None:
        from ..models.midas import MidasNet

        model = MidasNet(dtype=jnp.bfloat16)
        params = load_midas_checkpoint(midas_ckpt)
        midas_real = True
    else:
        cfgs = {
            "leres": DepthNetConfig.leres(),
            "midas": DepthNetConfig.midas(),
            "sgrnet": DepthNetConfig.sgrnet(),
        }
        model = RelDepthNet(cfgs[net], dtype=jnp.bfloat16)
        if converted is not None and "depth" in converted:
            params = converted["depth"]
        else:
            params = model.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 448, 448, 3))
            )["params"]

    apply = jax.jit(model.apply)

    def base_estimate(img, size):
        import cv2

        sz = int(size)
        if midas_real:
            # the MiDaS transform keeps aspect ratio and snaps each side
            # to a multiple of 32 (estimatemidas, depth_esti_boosting.py:
            # 498-512; midas/models/transforms.py upper_bound)
            from ..models.midas import midas_resize_shape

            nh, nw = midas_resize_shape(img.shape[0], img.shape[1], sz)
            x = cv2.resize(img, (nw, nh), interpolation=cv2.INTER_CUBIC)
        else:
            x = cv2.resize(img, (sz, sz), interpolation=cv2.INTER_CUBIC)
        x = (x - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225]
        )  # imagenet normalization (estimateleres, depth_esti_boosting.py:555+)
        d = apply({"params": params}, jnp.asarray(x, jnp.float32)[None])
        d = np.asarray(d[0], np.float32)
        return cv2.resize(
            d, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_CUBIC
        )

    merge_double = None
    if merge_params is not None:
        merge_net = UnetGenerator(input_nc=2, output_nc=1, num_downs=10)
        merge_apply = jax.jit(merge_net.apply)

        def merge_double(low, high):
            a = np.asarray(minmax_normalize(jnp.asarray(low)))
            b = np.asarray(minmax_normalize(jnp.asarray(high)))
            inp = jnp.stack([jnp.asarray(a), jnp.asarray(b)], -1)[None]
            out = merge_apply({"params": merge_params}, inp)
            return (np.asarray(out[0, :, :, 0]) + 1) / 2

    booster = BoostedDepthEstimator(base_estimate, merge_double)
    return booster.estimate
