"""Training losses (pure JAX).

Mirrors the loss stack used by the reference training loop
(/root/reference/text2nerf_main.py:563-586, /root/reference/utils.py:27-80,
301-342).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)


def mse2psnr(x):
    """-10 log10(mse) (utils.py:14)."""
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def transmittance_mask_loss(weights, mask, denom=None):
    """Drive compositing weights to zero before the GT surface.

    TransMittanceLoss_mask (utils.py:67-80): MSE of per-ray mean of
    ``weights * mask`` against 0.  The mask marks samples in front of the
    supervised depth minus a margin (text2nerf_main.py:569-572).

    ``denom`` overrides the per-ray mean's denominator: the compacted
    train path (render_rays_train_compact) passes the dense sample count
    so the loss scale matches the reference's full-S mean even though
    only the mask-live samples are materialized (the culled ones
    contribute exactly 0).
    """
    d = weights.shape[1] if denom is None else denom
    mean_trans = jnp.sum(weights * mask, axis=1) / d
    return jnp.mean(mean_trans ** 2)


def transmittance_const_loss(weights, target: float = 0.8):
    """TransMittanceLoss_const (utils.py:48-65)."""
    mean_trans = jnp.mean(weights, axis=1)
    return jnp.mean((mean_trans - target) ** 2)


def depth_front_mask(z_vals, target_depth, delta: float = 0.1):
    """Samples strictly before (depth - delta) (text2nerf_main.py:571)."""
    return (z_vals - target_depth[:, None] + delta) < 0


def gaussian_nll_depth_loss(depth_map, z_vals, weights, target_depth, target_std=0.1):
    """Uncertainty-gated Gaussian NLL depth loss (compute_depth_loss,
    utils.py:301-321), made fixed-shape: the "apply" gate becomes a weight
    mask instead of boolean indexing.
    """
    pred_mean = depth_map
    pred_var = jnp.sum(
        (z_vals - pred_mean[:, None]) ** 2 * weights, axis=-1
    ) + 1e-8
    delta_bad = (jnp.abs(pred_mean - target_depth) - target_std) > 0.0
    var_bad = target_std ** 2 < pred_var
    apply = jnp.logical_or(delta_bad, var_bad)
    var = jnp.maximum(pred_var, 0.001)
    nll = 0.5 * (jnp.log(var) + (target_depth - pred_mean) ** 2 / var)
    denom = jnp.maximum(jnp.sum(apply), 1)
    return jnp.abs(jnp.sum(jnp.where(apply, nll, 0.0)) / denom)


def scale_invariant_log_depth_loss(depth_map, target_depth):
    """compute_depth_loss_scale_invariant (utils.py:324-331)."""
    log_pred = jnp.log(depth_map)
    log_target = jnp.log(target_depth)
    alpha = jnp.mean(log_target - log_pred)
    return jnp.mean(jnp.abs(log_pred - log_target + alpha))


def scale_shift_invariant_depth_loss(z_vals, weights, target_depth):
    """Weighted-least-squares scale/shift-invariant depth loss.

    Replaces the statsmodels WLS fit (utils.py:333-342) with the closed-form
    2x2 normal equations, fully on-device.  Fits target ≈ s*z + t under
    weights w (gradients do not flow through the fit, matching the detached
    numpy fit in the reference), then returns mean(w * (s*z + t - target)^2).
    """
    target = jnp.broadcast_to(target_depth[:, None], z_vals.shape)
    z = z_vals.reshape(-1)
    w = jax.lax.stop_gradient(weights.reshape(-1))
    y = jax.lax.stop_gradient(target.reshape(-1))
    zs = jax.lax.stop_gradient(z)
    sw = jnp.sum(w) + 1e-12
    swz = jnp.sum(w * zs)
    swzz = jnp.sum(w * zs * zs)
    swy = jnp.sum(w * y)
    swzy = jnp.sum(w * zs * y)
    det = sw * swzz - swz * swz + 1e-12
    s = (sw * swzy - swz * swy) / det
    t = (swzz * swy - swz * swzy) / det
    loss = jnp.mean(weights * (s * z_vals + t - target) ** 2)
    return loss, s, t


def charbonnier(pred, target, eps: float = 1e-3):
    """Robust L1 alternative for ablations."""
    return jnp.mean(jnp.sqrt((pred - target) ** 2 + eps * eps))
