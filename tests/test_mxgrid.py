"""MX-grid encoding: shapes, continuity, chunking equivalence, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from romap_tpu.ops import mxgrid

RNG = np.random.default_rng(3)


def small_spec(chunk=4096):
    return mxgrid.make_mxspec(
        n_levels=3, base_resolution=4, max_resolution=32, features=8, chunk=chunk
    )


def test_shapes_and_layout():
    spec = small_spec()
    assert spec.resolutions == (4, 11, 32)
    assert spec.total_res == 47
    assert spec.offsets == (0, 4, 15)
    key = jax.random.PRNGKey(0)
    factors = mxgrid.init_mxgrid(key, spec)
    assert factors.shape == (3, 47, 8)
    x = jnp.asarray(RNG.uniform(0, 1, (5, 6, 3)), jnp.float32)
    out = mxgrid.encode(factors, x, spec)
    assert out.shape == (5, 6, 8)


def test_hat_basis_partition_of_unity_and_interp():
    spec = small_spec()
    x = jnp.asarray(RNG.uniform(0, 1, (64,)), jnp.float32)
    h = np.asarray(mxgrid.hat_basis(x, spec))
    # each level's rows sum to 1 (partition of unity of the tent basis)
    for lvl, (r, off) in enumerate(zip(spec.resolutions, spec.offsets)):
        np.testing.assert_allclose(h[:, off : off + r].sum(-1), 1.0, atol=1e-5)
        assert (np.sort(h[:, off : off + r], axis=-1)[:, :-2] < 1e-6).all()  # <=2 nnz


def test_encode_is_continuous_and_piecewise_linear_per_axis():
    spec = small_spec()
    factors = jnp.asarray(RNG.normal(size=(3, spec.total_res, 8)), jnp.float32)
    # epsilon pairs straddling every lattice point of every level: the jump
    # across a cell boundary must vanish with epsilon (C0 continuity)
    eps = 1e-6
    knots = np.concatenate([
        np.arange(1, r - 1) / (r - 1) for r in spec.resolutions
    ]).astype(np.float32)
    lo = jnp.stack([jnp.asarray(knots - eps), jnp.full_like(jnp.asarray(knots), 0.37),
                    jnp.full_like(jnp.asarray(knots), 0.61)], -1)
    hi = lo.at[:, 0].add(2 * eps)
    f_lo = np.asarray(mxgrid.encode(factors, lo, spec))
    f_hi = np.asarray(mxgrid.encode(factors, hi, spec))
    np.testing.assert_allclose(f_lo, f_hi, atol=1e-3)


def test_chunked_matches_unchunked():
    spec_small = small_spec(chunk=64)
    spec_big = small_spec(chunk=1 << 20)
    factors = jnp.asarray(RNG.normal(size=(3, spec_small.total_res, 8)), jnp.float32)
    x = jnp.asarray(RNG.uniform(0, 1, (333, 3)), jnp.float32)  # non-multiple of 64
    a = np.asarray(mxgrid.encode(factors, x, spec_small))
    b = np.asarray(mxgrid.encode(factors, x, spec_big))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_gradient_matches_finite_differences():
    spec = mxgrid.make_mxspec(n_levels=2, base_resolution=3, max_resolution=8,
                              features=4, chunk=128)
    factors = jnp.asarray(RNG.normal(size=(3, spec.total_res, 4)), jnp.float32)
    x = jnp.asarray(RNG.uniform(0.05, 0.95, (16, 3)), jnp.float32)

    def f(t):
        return jnp.sum(jnp.tanh(mxgrid.encode(t, x, spec)))

    g = np.asarray(jax.grad(f)(factors))
    eps = 1e-3
    for _ in range(12):
        d, r, k = (RNG.integers(0, s) for s in factors.shape)
        tp = factors.at[d, r, k].add(eps)
        tm = factors.at[d, r, k].add(-eps)
        fd = (float(f(tp)) - float(f(tm))) / (2 * eps)
        np.testing.assert_allclose(g[d, r, k], fd, rtol=2e-2, atol=2e-3)


def test_encoding_presets():
    """Named ladder presets resolve to valid configs; unknown names raise."""
    from romap_tpu.config import EncodingConfig

    flagship = EncodingConfig.preset("flagship")
    assert flagship == EncodingConfig()
    assert EncodingConfig.preset("fast").plane_specs == ()
    q = EncodingConfig.preset("quality")
    # single-level knobs normalize to (ru, rv, k) triple form
    assert q.plane_specs == ((128, 128, 8),) and q.n_output_dims == 88
    assert flagship.plane_specs == ((128, 64, 4),)  # rect flagship
    assert EncodingConfig.preset("tcnn").kind == "hashgrid"
    try:
        EncodingConfig.preset("nope")
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "nope" in str(e)
