"""Composite NeRF training loss — autodiff replacement for the reference's
hand-derived CUDA gradients (VolumeRenderGradient_No_Compacted, ref
nerf_model.cu:817-954).

The reference writes dL/d(mlp output) analytically. We instead define a scalar
loss whose `jax.grad` reproduces those gradients exactly (up to the early-exit
cutoff, see ops/render.py):

  per ray, summed then divided by n_rays (loss_scale/nRays at ref :882 cancels
  against the optimizer's 1/loss_scale):

  * RGB:   sum_c (pred_c - target_c)^2, pred composited over a random
           background color (ref loss_and_gradient :78-84; gradient applied
           without the /3 channel mean, :916-920). For BACKGROUND rays the
           density path of the RGB loss is cut (ref :936-941 replaces the rgb
           suffix term) — implemented with stop_gradient on the weights — while
           the color-channel path still flows (ref :918-920 is unconditional).
  * Depth: 0.5 * |depth_pred - depth_target| where depth_target > 0
           (ref :868-871, L1, lambda = 0.5).
  * Mask:  0.5 * |opacity - is_object| (ref :926-938; L1 toward 1 for object
           rays, toward 0 for background rays, lambda = 0.5).
  * Reg:   background rays add 0.01 * sum_i sigma_i (ref :940, the
           density_derivative * 0.01 term, which is d/draw of 0.01*sigma).

Logged loss matches the reference's loss_cout exactly (ref :876-880):
  object rays: mean_c diff^2 + 0.5*|depth err| + (1 - opacity)
  background : mean_c diff^2 + opacity
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from romap_tpu.config import TrainConfig
from romap_tpu.ops.render import volume_render


class RayBatch(NamedTuple):
    """One training batch of rays (static shapes R rays x S samples)."""

    points: jax.Array  # [R, S, 3] warped sample positions in [0,1]^3
    t: jax.Array  # [R, S] sample distances
    rgb_target: jax.Array  # [R, 3]
    depth_target: jax.Array  # [R] (0 where unsupervised)
    is_object: jax.Array  # [R] bool: instance pixel vs background pixel
    bg_color: jax.Array  # [R, 3] random background color (target for bg rays)
    valid: jax.Array  # [] bool: any in-bbox ray existed (guards empty batch)


def composite_loss(
    raw: jax.Array, batch: RayBatch, cfg: TrainConfig
) -> tuple[jax.Array, dict]:
    """Scalar training loss from raw field outputs.

    Args:
      raw: [R, S, 4] raw MLP outputs at batch.points.
      batch: the ray batch.
      cfg: loss weights.

    Returns:
      (loss, aux) where loss is the mean-over-rays composite loss and aux
      carries the reference-compatible logged loss and the forward render.
    """
    out = volume_render(raw, batch.t, batch.bg_color)
    is_obj = batch.is_object
    obj = is_obj[..., None]

    # --- RGB term: cut the density path for background rays. -------------
    rgb_samples = jax.nn.sigmoid(raw[..., :3].astype(jnp.float32))
    w_full = out.weights
    w_cut = jnp.where(obj, w_full, jax.lax.stop_gradient(w_full))
    t_final = 1.0 - out.mask
    t_cut = jnp.where(is_obj, t_final, jax.lax.stop_gradient(t_final))
    rgb_pred = (
        jnp.sum(w_cut[..., None] * rgb_samples, axis=-2)
        + t_cut[..., None] * batch.bg_color
    )
    diff = rgb_pred - batch.rgb_target
    rgb_loss = jnp.sum(diff * diff, axis=-1)  # [R] (sum, not mean: ref :916)

    # --- Depth term (object rays with a positive target). ----------------
    has_depth = batch.depth_target > 0.0
    depth_err = jnp.abs(out.depth - batch.depth_target)
    depth_loss = cfg.depth_lambda * jnp.where(has_depth, depth_err, 0.0)

    # --- Mask term. -------------------------------------------------------
    mask_target = is_obj.astype(jnp.float32)
    mask_loss = cfg.mask_lambda * jnp.abs(out.mask - mask_target)

    # --- Background sigma regularizer. -------------------------------------
    sigma_sum = jnp.sum(out.sigma, axis=-1)
    reg_loss = cfg.bg_sigma_reg * jnp.where(is_obj, 0.0, sigma_sum)

    per_ray = rgb_loss + depth_loss + mask_loss + reg_loss
    n_rays = per_ray.shape[-1]
    loss = jnp.sum(per_ray, axis=-1) / n_rays
    # An all-miss batch trains on garbage in the reference; we zero it instead.
    loss = jnp.where(batch.valid, loss, 0.0)

    # Reference-compatible console loss (ref nerf_model.cu:876-880).
    rgb_mean = jnp.mean(
        (out.rgb - batch.rgb_target) ** 2, axis=-1
    )  # fwd rgb (full composite)
    logged = jnp.where(
        is_obj,
        rgb_mean
        + cfg.depth_lambda * jnp.where(has_depth, depth_err, 0.0)
        + (1.0 - out.mask),
        rgb_mean + out.mask,
    )
    aux = {
        "logged_loss": jnp.sum(logged, axis=-1) / n_rays,
        "rgb": out.rgb,
        "depth": out.depth,
        "mask": out.mask,
    }
    return loss, aux
