"""Fused Pallas MX-grid kernel vs the XLA implementation (interpret mode on
CPU; the same kernel compiles via Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from romap_tpu.ops import mxgrid, mxgrid_pallas

RNG = np.random.default_rng(7)


def spec():
    return mxgrid.make_mxspec(n_levels=3, base_resolution=4, max_resolution=32,
                              features=16)


def test_forward_matches_xla():
    s = spec()
    factors = jnp.asarray(RNG.normal(size=(3, s.total_res, 16)), jnp.float32)
    pts = jnp.asarray(RNG.uniform(0, 1, (700, 3)), jnp.float32)  # non-tile-multiple
    want = np.asarray(mxgrid.encode(factors, pts, s))
    got = np.asarray(mxgrid_pallas.encode(factors, pts, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gradient_matches_xla():
    s = spec()
    factors = jnp.asarray(RNG.normal(size=(3, s.total_res, 16)), jnp.float32)
    pts = jnp.asarray(RNG.uniform(0, 1, (600, 3)), jnp.float32)
    tgt = jnp.asarray(RNG.normal(size=(600, 16)), jnp.float32)

    def loss_xla(f):
        return jnp.sum((mxgrid.encode(f, pts, s) - tgt) ** 2)

    def loss_pl(f):
        return jnp.sum((mxgrid_pallas.encode(f, pts, s, interpret=True) - tgt) ** 2)

    g_xla = np.asarray(jax.grad(loss_xla)(factors))
    g_pl = np.asarray(jax.grad(loss_pl)(factors))
    np.testing.assert_allclose(g_pl, g_xla, rtol=1e-3, atol=1e-4)


def test_vmap_over_objects():
    s = spec()
    factors = jnp.asarray(RNG.normal(size=(4, 3, s.total_res, 16)), jnp.float32)
    pts = jnp.asarray(RNG.uniform(0, 1, (4, 520, 3)), jnp.float32)
    got = jax.vmap(lambda f, p: mxgrid_pallas.encode(f, p, s, interpret=True))(
        factors, pts
    )
    want = jax.vmap(lambda f, p: mxgrid.encode(f, p, s))(factors, pts)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=2e-4)


def test_vm_planes_forward_and_grad_match_xla():
    s = mxgrid.make_mxspec(n_levels=3, base_resolution=4, max_resolution=32,
                           features=16, plane_res=24, plane_features=8)
    key = jax.random.PRNGKey(5)
    factors = mxgrid.init_mxgrid(key, s)
    assert isinstance(factors, dict)
    pts = jnp.asarray(RNG.uniform(0, 1, (700, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(factors, pts, s))
    got = np.asarray(mxgrid_pallas.encode(factors, pts, s, interpret=True))
    assert want.shape == (700, 16 + 24)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)

    tgt = jnp.asarray(RNG.normal(size=(700, s.n_output_dims)), jnp.float32)

    def loss_xla(f):
        return jnp.sum((mxgrid.encode(f, pts, s) - tgt) ** 2)

    def loss_pl(f):
        return jnp.sum((mxgrid_pallas.encode(f, pts, s, interpret=True) - tgt) ** 2)

    g_xla = jax.grad(loss_xla)(factors)
    g_pl = jax.grad(loss_pl)(factors)
    for k in ("lines", "planes", "plane_lines"):
        np.testing.assert_allclose(np.asarray(g_pl[k]), np.asarray(g_xla[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)
