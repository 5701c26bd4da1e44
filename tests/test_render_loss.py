"""Volume rendering vs sequential oracle; loss gradients vs the reference's
hand-derived CUDA gradient formulas (VolumeRenderGradient_No_Compacted)."""

import jax
import jax.numpy as jnp
import numpy as np

from romap_tpu.config import TrainConfig
from romap_tpu.ops.losses import RayBatch, composite_loss
from romap_tpu.ops.render import volume_render
from tests.oracles import volume_render_ref

RNG = np.random.default_rng(2)


def _random_rays(r=8, s=16):
    raw = RNG.normal(size=(r, s, 4)).astype(np.float32)
    raw[..., 3] = RNG.normal(size=(r, s)) * 1.5  # log-densities
    tmin = RNG.uniform(0.5, 1.0, size=r)
    tmax = tmin + RNG.uniform(0.5, 2.0, size=r)
    jit = RNG.uniform(size=(r, s))
    n = np.arange(s)
    t = tmin[:, None] + ((tmax - tmin) / s)[:, None] * (n + jit)
    bg = RNG.uniform(size=(r, 3)).astype(np.float32)
    return raw, t.astype(np.float32), bg


def test_volume_render_matches_sequential_oracle():
    raw, t, bg = _random_rays()
    out = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(bg))
    for i in range(raw.shape[0]):
        rgb, depth, mask = volume_render_ref(raw[i], t[i], bg[i], early_exit=False)
        np.testing.assert_allclose(np.asarray(out.rgb)[i], rgb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth)[i], depth, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.mask)[i], mask, rtol=1e-4, atol=1e-5)


def test_volume_render_early_exit_negligible():
    # saturated rays: the no-early-exit render must agree to < 1e-3
    raw, t, bg = _random_rays()
    raw[..., 3] = 3.0  # very dense
    out = volume_render(jnp.asarray(raw), jnp.asarray(t), jnp.asarray(bg))
    for i in range(raw.shape[0]):
        rgb, depth, mask = volume_render_ref(raw[i], t[i], bg[i], early_exit=True)
        np.testing.assert_allclose(np.asarray(out.rgb)[i], rgb, atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.mask)[i], mask, atol=2e-3)


def _reference_grad(raw, t, target, dtarget, is_obj, bg, cfg):
    """Per-sample dL/d(raw) transliterated from ref nerf_model.cu:817-954,
    WITHOUT early exit and with loss_scale/nRays folded out (we test the
    per-ray gradient, n_rays normalization checked separately)."""
    s = raw.shape[0]
    # forward
    rgb_ray, depth_ray, mask_ray = volume_render_ref(raw, t, bg, early_exit=False)
    lg_grad = 2.0 * (rgb_ray - target)  # d/dpred of sum_c diff^2
    dloss_ddepth = 0.0
    if dtarget > 0:
        dloss_ddepth = cfg.depth_lambda * (1.0 if depth_ray - dtarget >= 0 else -1.0)
    grad = np.zeros((s, 4))
    T = 1.0
    rgb_ray2 = np.zeros(3)
    depth_ray2 = 0.0
    last = 0.0
    for n in range(s):
        rgb = 1.0 / (1.0 + np.exp(-raw[n, :3].astype(np.float64)))
        cur = float(t[n])
        dt = cur - last
        sigma = np.exp(float(raw[n, 3]))
        alpha = 1.0 - np.exp(-sigma * dt)
        w = alpha * T
        rgb_ray2 += w * rgb
        depth_ray2 += w * cur
        T *= 1.0 - alpha
        suffix = rgb_ray - rgb_ray2
        dloss_drgb = w * lg_grad
        grad[n, :3] = dloss_drgb * rgb * (1 - rgb)  # logistic derivative
        depth_suffix = depth_ray - depth_ray2
        depth_supervision = dloss_ddepth * (T * cur - depth_suffix)
        dmask_dd = 1.0 - mask_ray
        if is_obj:
            dloss_dmask = cfg.mask_lambda * (1.0 if mask_ray >= 1 else -1.0)
            grad[n, 3] = sigma * dt * (
                lg_grad @ (T * rgb - suffix) + depth_supervision
                + dloss_dmask * dmask_dd
            )
        else:
            dloss_dmask = cfg.mask_lambda * (1.0 if mask_ray >= 0 else -1.0)
            grad[n, 3] = sigma * dt * dloss_dmask * dmask_dd + sigma * cfg.bg_sigma_reg
        last = cur
    return grad


def test_loss_gradient_matches_reference_formulas():
    cfg = TrainConfig()
    r, s = 6, 12
    raw, t, bg = _random_rays(r, s)
    target = RNG.uniform(size=(r, 3)).astype(np.float32)
    is_obj = np.array([True, True, True, False, False, False])
    dtarget = np.where(is_obj, RNG.uniform(0.5, 2.0, size=r), 0.0).astype(np.float32)
    dtarget[2] = 0.0  # an object ray without depth supervision
    target[~is_obj] = bg[~is_obj]  # background rays: target IS the bg color

    batch = RayBatch(
        points=jnp.zeros((r, s, 3)),
        t=jnp.asarray(t),
        rgb_target=jnp.asarray(target),
        depth_target=jnp.asarray(dtarget),
        is_object=jnp.asarray(is_obj),
        bg_color=jnp.asarray(bg),
        valid=jnp.asarray(True),
    )

    def loss_fn(raw_in):
        loss, _ = composite_loss(raw_in, batch, cfg)
        return loss

    g = np.asarray(jax.grad(loss_fn)(jnp.asarray(raw)))

    for i in range(r):
        want = _reference_grad(
            raw[i].astype(np.float64), t[i], target[i], dtarget[i], is_obj[i], bg[i], cfg
        ) / r  # mean over rays
        np.testing.assert_allclose(g[i], want, rtol=2e-3, atol=1e-5,
                                   err_msg=f"ray {i} (is_obj={is_obj[i]})")


def test_loss_invalid_batch_is_zero():
    cfg = TrainConfig()
    raw, t, bg = _random_rays(4, 8)
    batch = RayBatch(
        points=jnp.zeros((4, 8, 3)), t=jnp.asarray(t),
        rgb_target=jnp.asarray(bg), depth_target=jnp.zeros((4,)),
        is_object=jnp.zeros((4,), bool), bg_color=jnp.asarray(bg),
        valid=jnp.asarray(False),
    )
    loss, _ = composite_loss(jnp.asarray(raw), batch, cfg)
    assert float(loss) == 0.0
    g = jax.grad(lambda x: composite_loss(x, batch, cfg)[0])(jnp.asarray(raw))
    assert float(jnp.max(jnp.abs(g))) == 0.0
