"""Emission-absorption volume rendering, masked full-length (no early exit).

Replaces the reference's sequential per-ray loops (VolumeRender, ref
nerf_model.cu:735-815; VolumeRender_Render :1134-1229) with vectorized
closed-form transmittance: since alpha_i = 1 - exp(-sigma_i*dt_i), the
running transmittance is exactly T_i = exp(-sum_{j<i} sigma_j*dt_j), so the
whole ray renders as cumulative sums — no scan, no early exit. The reference
breaks out of the loop when T < 1e-4; at that point every remaining weight is
< 1e-4 so the masked version matches to well below render precision.

Reference quirk reproduced on purpose: the first sample's dt is measured from
distance 0 (the camera), not from tmin (last_distance initialized to 0, ref
nerf_model.cu:770, 887, 1176).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def rgb_activation(raw_rgb: jax.Array) -> jax.Array:
    """Logistic, ref nerf_model.h mRgbActivation = Logistic."""
    return jax.nn.sigmoid(raw_rgb)


def density_activation(raw_sigma: jax.Array) -> jax.Array:
    """Exponential, ref nerf_model.h mDensityActivation = Exponential.

    The input is clamped to +/-15 — the reference clamps the *derivative*
    input to that range (ref nerf_model.cu:60) and its fp16 pipeline bounds
    the forward; in fp32 an unclamped exp overflows once Adam (eps=1e-15,
    sign-like updates) walks a saturated logit past ~88. sigma = e^15 makes
    alpha == 1 at any dt, so the clamp is render-invisible.
    """
    return jnp.exp(jnp.clip(raw_sigma, -15.0, 15.0))


class RenderOut(NamedTuple):
    rgb: jax.Array  # [..., 3] composited color (incl. background)
    depth: jax.Array  # [...] expected ray distance
    mask: jax.Array  # [...] opacity = 1 - T_final
    trans: jax.Array  # [..., S] per-sample transmittance T_i (pre-sample)
    weights: jax.Array  # [..., S] per-sample weights alpha_i * T_i
    sigma: jax.Array  # [..., S] activated densities


def volume_render(raw: jax.Array, t: jax.Array, bg: jax.Array) -> RenderOut:
    """Render rays from raw network outputs.

    Args:
      raw: [..., S, 4] raw MLP outputs (rgb logits + log-density).
      t: [..., S] sample distances along the ray (monotonic).
      bg: [..., 3] background color composited behind the ray.

    Returns RenderOut; all computed in fp32.
    """
    raw = raw.astype(jnp.float32)
    t = t.astype(jnp.float32)
    rgb = rgb_activation(raw[..., :3])  # [..., S, 3]
    sigma = density_activation(raw[..., 3])  # [..., S]

    # dt_i = t_i - t_{i-1}, with t_{-1} = 0 (reference quirk).
    prev = jnp.concatenate([jnp.zeros_like(t[..., :1]), t[..., :-1]], axis=-1)
    dt = t - prev
    sd = sigma * dt  # optical depth per segment
    accum = jnp.cumsum(sd, axis=-1)
    trans = jnp.exp(-(accum - sd))  # exclusive cumsum: T_i before sample i
    alpha = 1.0 - jnp.exp(-sd)
    weights = alpha * trans  # [..., S]
    t_final = jnp.exp(-accum[..., -1])

    rgb_ray = jnp.sum(weights[..., None] * rgb, axis=-2) + t_final[..., None] * bg
    depth_ray = jnp.sum(weights * t, axis=-1)
    mask_ray = 1.0 - t_final
    return RenderOut(rgb_ray, depth_ray, mask_ray, trans, weights, sigma)


def render_composite(
    out: RenderOut, d_norm: jax.Array, in_bbox: jax.Array, background: float = 1.0
):
    """Inference-time compositing (ref VolumeRender_Render nerf_model.cu:1134-1229).

    Rays that miss the bbox, or whose opacity <= 0.5, are replaced with the
    flat background; depth is converted back to z-depth by dividing by d_norm.

    Returns (rgb [..., 3], depth [...], mask [...]).
    """
    visible = in_bbox & (out.mask > 0.5)
    rgb = jnp.where(visible[..., None], out.rgb, background)
    depth = jnp.where(visible, out.depth / d_norm, 0.0)
    mask = jnp.where(visible, 1.0, 0.0)
    return rgb, depth, mask
