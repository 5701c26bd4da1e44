"""Hash-grid encoding vs a per-point NumPy oracle + interpolation properties."""

import jax
import jax.numpy as jnp
import numpy as np

from romap_tpu.config import EncodingConfig
from romap_tpu.ops import hashgrid
from tests.oracles import hashgrid_encode_ref

RNG = np.random.default_rng(1)


def small_cfg():
    return EncodingConfig(
        kind="hashgrid",
        n_levels=4, n_features_per_level=2, log2_hashmap_size=9,
        base_resolution=4, desired_resolution=64.0,
    )


def test_spec_layout_reference_params():
    # the reference config: L=16 F=2 T=2^16 Nmin=16, b from res 2048
    spec = hashgrid.make_spec(EncodingConfig())
    assert spec.n_levels == 16
    assert spec.resolutions[0] == 16
    # level sizes: dense until res^3 > 2^16, then hashed at 65536
    assert spec.sizes[0] == 16**3  # 4096, dense
    assert max(spec.sizes) == 1 << 16
    assert spec.total_params == sum(spec.sizes)
    assert spec.offsets[-1] + spec.sizes[-1] == spec.total_params
    # resolutions grow geometrically to ~2048
    assert 1900 <= spec.resolutions[-1] <= 2100


def test_encode_matches_oracle():
    cfg = small_cfg()
    spec = hashgrid.make_spec(cfg)
    table = np.asarray(
        hashgrid.init_table(jax.random.PRNGKey(0), spec)
    ) * 1e4  # scale up so tolerances are meaningful
    x = RNG.uniform(0, 1, size=(64, 3)).astype(np.float32)
    got = np.asarray(hashgrid.encode(jnp.asarray(table), jnp.asarray(x), spec))
    want = hashgrid_encode_ref(table, x, spec)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_encode_interpolation_is_trilinear():
    # features must vary linearly between lattice points of the coarsest level
    cfg = EncodingConfig(n_levels=1, n_features_per_level=1, log2_hashmap_size=12,
                         base_resolution=4, desired_resolution=4.0)
    spec = hashgrid.make_spec(cfg)
    table = jnp.asarray(RNG.normal(size=(spec.total_params, 1)), jnp.float32)
    # segment along x between two lattice x-coords at fixed y,z
    scale = spec.scales[0]
    x0 = (1.0 - 0.5) / scale  # lattice point 1
    x1 = (2.0 - 0.5) / scale  # lattice point 2
    lam = np.linspace(0, 1, 11)
    pts = np.stack([x0 + lam * (x1 - x0), np.full_like(lam, x0), np.full_like(lam, x0)], -1)
    f = np.asarray(hashgrid.encode(table, jnp.asarray(pts, jnp.float32), spec))[:, 0]
    # linear in lambda
    np.testing.assert_allclose(f, f[0] + (f[-1] - f[0]) * lam, rtol=1e-4, atol=1e-5)


def test_encode_batch_shapes_and_grad():
    cfg = small_cfg()
    spec = hashgrid.make_spec(cfg)
    table = hashgrid.init_table(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(RNG.uniform(0, 1, size=(5, 7, 3)), jnp.float32)
    out = hashgrid.encode(table, x, spec)
    assert out.shape == (5, 7, cfg.n_output_dims)

    # gradient flows into the table (scatter-add transpose of the gather)
    g = jax.grad(lambda t: jnp.sum(hashgrid.encode(t, x, spec) ** 2))(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_encode_gradient_matches_finite_differences():
    cfg = EncodingConfig(n_levels=2, n_features_per_level=1, log2_hashmap_size=6,
                         base_resolution=3, desired_resolution=8.0)
    spec = hashgrid.make_spec(cfg)
    table = jnp.asarray(RNG.normal(size=(spec.total_params, 1)), jnp.float32)
    x = jnp.asarray(RNG.uniform(0.1, 0.9, size=(4, 3)), jnp.float32)

    def f(t):
        return jnp.sum(jnp.sin(hashgrid.encode(t, x, spec)))

    g = np.asarray(jax.grad(f)(table))
    eps = 1e-3
    idxs = [(i, 0) for i in RNG.integers(0, spec.total_params, size=12)]
    for i, j in idxs:
        tp = table.at[i, j].add(eps)
        tm = table.at[i, j].add(-eps)
        fd = (float(f(tp)) - float(f(tm))) / (2 * eps)
        np.testing.assert_allclose(g[i, j], fd, rtol=2e-2, atol=2e-3)


def test_sorted_impl_matches_gather_values_and_grads():
    """The sorted-lookup implementation (argsort + sorted gather + sorted
    segment-sum backward) must agree with the direct gather path in values
    and in gradients wrt table AND points (x-grads flow through the
    trilinear weights), up to fp32 summation order."""
    cfg = EncodingConfig(n_levels=4, n_features_per_level=2,
                         log2_hashmap_size=8, base_resolution=4,
                         desired_resolution=64.0)
    spec = hashgrid.make_spec(cfg)
    table = jnp.asarray(RNG.normal(size=(spec.total_params, 2)), jnp.float32)
    x = jnp.asarray(RNG.uniform(0.05, 0.95, size=(257, 3)), jnp.float32)

    out_g = hashgrid.encode(table, x, spec, impl="gather")
    out_s = hashgrid.encode(table, x, spec, impl="sorted")
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_g),
                               rtol=1e-6, atol=1e-6)

    def loss(t, pts, impl):
        return jnp.sum(jnp.sin(hashgrid.encode(t, pts, spec, impl=impl) * 3))

    gt_g, gx_g = jax.grad(loss, argnums=(0, 1))(table, x, "gather")
    gt_s, gx_s = jax.grad(loss, argnums=(0, 1))(table, x, "sorted")
    np.testing.assert_allclose(np.asarray(gt_s), np.asarray(gt_g),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_g),
                               rtol=1e-5, atol=1e-5)
