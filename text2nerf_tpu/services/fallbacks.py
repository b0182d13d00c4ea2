"""Hermetic fallback implementations of the generative prior services.

The real services (Stable Diffusion text2img/inpainting, CLIP ranking,
boosted monocular depth) need multi-GB pretrained weights.  When those are
absent the pipeline still has to run end-to-end — for CI, for hermetic
tests, and for air-gapped TPU pods — so each service has a deterministic
procedural stand-in with the same interface and output contract:

- :func:`procedural_text2img` — seed image from the prompt hash
  (stand-in for scripts/text2img_sdm.py:7-30).
- :func:`procedural_depth` — 16-bit depth counts in the LeReS convention
  ``counts = (depth - push) * 12000`` (stand-in for
  scripts/depth_esti_boosting.py:145-338 + scene_gen.py:16-29).
- :func:`diffusion_fill_inpaint` — pull-push / Jacobi hole filling with
  per-candidate noise (stand-in for scripts/inpaint_sdm.py:48-74).
- :func:`histogram_rank` — color-statistics candidate ranking (stand-in
  for the CLIP cosine selection, text2nerf_main.py:195-220).
"""

from __future__ import annotations

import hashlib
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _prompt_seed(prompt: str) -> int:
    return int.from_bytes(hashlib.sha256(prompt.encode()).digest()[:4], "little")


def _cubic_weights(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic interpolation kernel (the bicubic resize kernel)."""
    ax = np.abs(x)
    return np.where(
        ax <= 1.0,
        (a + 2.0) * ax ** 3 - (a + 3.0) * ax ** 2 + 1.0,
        np.where(
            ax < 2.0,
            a * ax ** 3 - 5.0 * a * ax ** 2 + 8.0 * a * ax - 4.0 * a,
            0.0,
        ),
    ).astype(np.float32)


def _resize_bicubic_np(grid: np.ndarray, h: int, w: int) -> np.ndarray:
    """Separable bicubic upsample (half-pixel centers), pure numpy.

    Host-side replacement for jax.image.resize in the fallbacks: a device
    round-trip per octave costs a tunnel compile on the single-chip TPU
    setup and dominated the bootstrap_seed_image phase (PERF.md round 3).
    """

    def along(arr, n_out, axis):
        n_in = arr.shape[axis]
        coord = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        base = np.floor(coord).astype(np.int64)
        taps = base[None, :] + np.arange(-1, 3)[:, None]          # (4, n_out)
        wts = _cubic_weights(coord[None, :] - taps)               # (4, n_out)
        wts /= np.maximum(wts.sum(0, keepdims=True), 1e-8)
        taps = np.clip(taps, 0, n_in - 1)
        moved = np.moveaxis(arr, axis, 0)
        out = np.einsum("ko,ko...->o...", wts, moved[taps])
        return np.moveaxis(out.astype(np.float32), 0, axis)

    g = along(grid.astype(np.float32), h, 0)
    return along(g, w, 1)


def _box_mean_same(x: np.ndarray, k: int) -> np.ndarray:
    """Zero-padded k×k windowed mean (= SAME conv with a 1/k² kernel)."""
    p = k // 2
    xp = np.pad(x.astype(np.float64), p)
    s = np.pad(np.cumsum(np.cumsum(xp, 0), 1), ((1, 0), (1, 0)))
    h, w = x.shape
    win = (
        s[k : k + h, k : k + w]
        - s[0:h, k : k + w]
        - s[k : k + h, 0:w]
        + s[0:h, 0:w]
    )
    return (win / float(k * k)).astype(np.float32)


def _value_noise(rng: np.random.Generator, h: int, w: int, octaves=(4, 8, 16, 32)):
    """Smooth multi-octave value noise in [0, 1]."""
    acc = np.zeros((h, w), np.float32)
    amp_total = 0.0
    for i, cells in enumerate(octaves):
        amp = 0.5 ** i
        grid = rng.random((cells, cells)).astype(np.float32)
        acc += amp * _resize_bicubic_np(grid, h, w)
        amp_total += amp
    acc /= amp_total
    return np.clip(acc, 0.0, 1.0)


def procedural_text2img(prompt: str, negative_prompt: str = "", hw=(512, 512)):
    """Deterministic scene-like seed image derived from the prompt.

    Layered sky/ground gradient + smooth noise texture + prompt-seeded
    palette.  Returns float32 [0, 1] (H, W, 3).
    """
    h, w = hw
    rng = np.random.default_rng(_prompt_seed(prompt))
    base = rng.random(3).astype(np.float32) * 0.5 + 0.25
    accent = rng.random(3).astype(np.float32) * 0.6 + 0.2

    y = np.linspace(0.0, 1.0, h, dtype=np.float32)[:, None]
    sky = np.stack(
        [np.clip(base[c] + 0.35 * (1 - y), 0, 1) * np.ones((h, w)) for c in range(3)],
        -1,
    )
    tex = _value_noise(rng, h, w)
    detail = _value_noise(rng, h, w, octaves=(16, 32, 64))
    ground_blend = np.clip((y - 0.45) * 4.0, 0, 1)[..., None]
    ground = np.stack(
        [accent[c] * (0.5 + 0.5 * tex) for c in range(3)], -1
    )
    img = sky * (1 - ground_blend) + ground * ground_blend
    img += (detail[..., None] - 0.5) * 0.15
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def procedural_depth(image: np.ndarray, push_depth: float = 2.0) -> np.ndarray:
    """Plausible depth counts for an image: near ground at the bottom, far
    sky at the top, modulated by smooth luminance structure.

    Returns counts such that ``counts / 12000 + push_depth`` is a metric
    depth in roughly [push, push+4.5] (the LeReS convention,
    scene_gen.py:27).
    """
    h, w = image.shape[:2]
    lum = image.mean(-1).astype(np.float32)
    # smooth the luminance to avoid depth speckle — zero-padded 9x9 box
    # mean via an integral image (host numpy: identical to a SAME conv
    # with a constant kernel, without a device round-trip)
    smooth = _box_mean_same(lum, 9)
    y = np.linspace(1.0, 0.0, h, dtype=np.float32)[:, None]  # top far
    depth_rel = 0.5 + 3.5 * (0.7 * y + 0.3 * smooth)  # ~[0.5, 4.5]
    counts = depth_rel * 12000.0
    return counts.astype(np.float64)


def diffusion_fill_inpaint(
    image: np.ndarray,
    mask_holes: np.ndarray,
    prompt: str = "",
    negative_prompt: str = "",
    guidance_scale: float = 7.5,
    num_images: int = 5,
    seed: int = 0,
) -> List[np.ndarray]:
    """Fill ``mask_holes > 0`` regions by iterative masked diffusion of the
    surrounding content, plus per-candidate texture noise.

    Interface mirrors text2inpainting_sdm.sdm (inpaint_sdm.py:48-74): same
    image/mask convention, returns ``num_images`` candidates in [0, 1].
    """
    img = np.asarray(image, np.float32)
    holes = np.asarray(mask_holes, np.float32)
    if holes.ndim == 3:
        holes = holes[..., 0]
    holes = (holes > 0.5).astype(np.float32)
    known = 1.0 - holes

    k = jnp.asarray(
        np.array([[1, 2, 1], [2, 4, 2], [1, 2, 1]], np.float32) / 16.0
    )

    def blur(x):
        return jax.lax.conv_general_dilated(
            x[None, None], k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    @jax.jit
    def fill(img_j, known_j):
        def body(_, state):
            vals, w = state
            vals = jnp.stack([blur(vals[..., c]) for c in range(3)], -1)
            w2 = blur(w)
            vals = vals / jnp.maximum(w2, 1e-8)[..., None]
            # re-impose known pixels
            vals = vals * (1 - known_j[..., None]) + img_j * known_j[..., None]
            w2 = jnp.maximum(w2, known_j)
            return vals * w2[..., None], w2

        state = (img_j * known_j[..., None], known_j)
        vals, w = jax.lax.fori_loop(0, 256, body, state)
        return vals / jnp.maximum(w, 1e-8)[..., None]

    base = np.asarray(fill(jnp.asarray(img), jnp.asarray(known)))
    outs = []
    rng = np.random.default_rng(seed + _prompt_seed(prompt))
    for i in range(num_images):
        tex = _value_noise(rng, img.shape[0], img.shape[1], octaves=(16, 32, 64))
        cand = base + (tex[..., None] - 0.5) * 0.08 * holes[..., None]
        outs.append(np.clip(cand, 0.0, 1.0).astype(np.float32))
    return outs


def histogram_rank(candidates: Sequence[np.ndarray], reference: np.ndarray):
    """Rank inpainting candidates by color-statistics similarity to the
    seed view (stand-in for CLIP image-embedding cosine,
    text2nerf_main.py:195-220).  Returns scores (higher = better)."""
    def hist(img):
        hs = [
            np.histogram(img[..., c], bins=32, range=(0, 1), density=True)[0]
            for c in range(3)
        ]
        return np.concatenate(hs) + 1e-6

    ref_h = hist(np.asarray(reference))
    scores = []
    for cand in candidates:
        ch = hist(np.asarray(cand))
        chi2 = np.sum((ch - ref_h) ** 2 / (ch + ref_h))
        scores.append(-float(chi2))
    return np.asarray(scores)
