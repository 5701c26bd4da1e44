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


def test_plane_ladder_forward_and_grad_match_xla():
    """Multi-level plane ladder ((res, feats), ...) — pallas vs XLA."""
    s = mxgrid.make_mxspec(n_levels=2, base_resolution=4, max_resolution=16,
                           features=8, plane_specs=((8, 4), (24, 8)))
    factors = mxgrid.init_mxgrid(jax.random.PRNGKey(3), s)
    assert s.n_output_dims == 8 + 3 * (4 + 8)
    pts = jnp.asarray(RNG.uniform(0, 1, (530, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(factors, pts, s))
    got = np.asarray(mxgrid_pallas.encode(factors, pts, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)

    tgt = jnp.asarray(RNG.normal(size=(530, s.n_output_dims)), jnp.float32)

    def loss(enc):
        return lambda f: jnp.sum((enc(f) - tgt) ** 2)

    g_xla = jax.grad(loss(lambda f: mxgrid.encode(f, pts, s)))(factors)
    g_pl = jax.grad(loss(lambda f: mxgrid_pallas.encode(f, pts, s, interpret=True)))(factors)
    np.testing.assert_allclose(np.asarray(g_pl["lines"]), np.asarray(g_xla["lines"]),
                               rtol=1e-3, atol=1e-3)
    for lvl in range(2):
        np.testing.assert_allclose(np.asarray(g_pl["planes"][lvl]),
                                   np.asarray(g_xla["planes"][lvl]),
                                   rtol=1e-3, atol=1e-3, err_msg=f"planes[{lvl}]")
        np.testing.assert_allclose(np.asarray(g_pl["plane_lines"][lvl]),
                                   np.asarray(g_xla["plane_lines"][lvl]),
                                   rtol=1e-3, atol=1e-3, err_msg=f"plane_lines[{lvl}]")


def test_bfloat16_forward_and_grad_close_to_fp32():
    """bf16 matmul inputs with fp32 accumulation: close to the fp32 result
    (tolerance set by bf16's 8-bit mantissa; the reference trains fp16)."""
    s = mxgrid.make_mxspec(n_levels=3, base_resolution=4, max_resolution=32,
                           features=16, plane_specs=((16, 8),))
    f32 = mxgrid.init_mxgrid(jax.random.PRNGKey(9), s)
    f16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), f32)
    pts = jnp.asarray(RNG.uniform(0, 1, (520, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(f32, pts, s))
    got = np.asarray(mxgrid_pallas.encode(f16, pts, s, interpret=True),
                     dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05)

    tgt = jnp.asarray(RNG.normal(size=(520, s.n_output_dims)), jnp.float32)
    g32 = jax.grad(lambda f: jnp.sum((mxgrid.encode(f, pts, s) - tgt) ** 2))(f32)
    g16 = jax.grad(lambda f: jnp.sum(
        (mxgrid_pallas.encode(f, pts, s, interpret=True).astype(jnp.float32)
         - tgt) ** 2))(f16)
    for a, b in zip(jax.tree.leaves(g16), jax.tree.leaves(g32)):
        a = np.asarray(a, dtype=np.float32)
        b = np.asarray(b)
        denom = np.maximum(np.abs(b).max(), 1e-3)
        assert np.abs(a - b).max() / denom < 0.1


def test_rect_planes_forward_and_grad_match_xla():
    """Rectangular (ru != rv) plane levels — pallas vs XLA."""
    s = mxgrid.make_mxspec(n_levels=2, base_resolution=4, max_resolution=16,
                           features=8, plane_specs=((8, 24, 4),))
    factors = mxgrid.init_mxgrid(jax.random.PRNGKey(11), s)
    assert factors["planes"][0].shape == (3, 8, 24, 4)
    pts = jnp.asarray(RNG.uniform(0, 1, (530, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(factors, pts, s))
    got = np.asarray(mxgrid_pallas.encode(factors, pts, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)

    tgt = jnp.asarray(RNG.normal(size=(530, s.n_output_dims)), jnp.float32)
    g_xla = jax.grad(lambda f: jnp.sum((mxgrid.encode(f, pts, s) - tgt) ** 2))(factors)
    g_pl = jax.grad(lambda f: jnp.sum(
        (mxgrid_pallas.encode(f, pts, s, interpret=True) - tgt) ** 2))(factors)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_balanced_axes_forward_and_grad_match_xla():
    """plane_axes="balanced" (every axis one fine-u + one coarse-v slot) —
    pallas vs XLA, and the assignment must actually differ from "uuv"."""
    mk = lambda axes: mxgrid.make_mxspec(
        n_levels=2, base_resolution=4, max_resolution=16, features=8,
        plane_specs=((24, 8, 4),), plane_axes=axes)
    s = mk("balanced")
    assert s.plane_axes == ((0, 1, 2), (2, 0, 1), (1, 2, 0))
    assert s.plane_axes != mk("uuv").plane_axes
    factors = mxgrid.init_mxgrid(jax.random.PRNGKey(12), s)
    pts = jnp.asarray(RNG.uniform(0, 1, (530, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(factors, pts, s))
    got = np.asarray(mxgrid_pallas.encode(factors, pts, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
    # the balanced assignment must not silently equal uuv numerically
    s_uuv = mk("uuv")
    assert not np.allclose(want, np.asarray(mxgrid.encode(factors, pts, s_uuv)))

    tgt = jnp.asarray(RNG.normal(size=(530, s.n_output_dims)), jnp.float32)
    g_xla = jax.grad(lambda f: jnp.sum((mxgrid.encode(f, pts, s) - tgt) ** 2))(factors)
    g_pl = jax.grad(lambda f: jnp.sum(
        (mxgrid_pallas.encode(f, pts, s, interpret=True) - tgt) ** 2))(factors)
    for a, b in zip(jax.tree.leaves(g_pl), jax.tree.leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-3)


def test_transposed_encode_and_mlp_match_untransposed():
    """encode_t + apply_mlp_t must equal encode + apply_mlp (the training
    path runs fully transposed, points in lanes)."""
    from romap_tpu.config import NetworkConfig
    from romap_tpu.ops.mlp import apply_mlp, apply_mlp_t, init_mlp

    s = mxgrid.make_mxspec(n_levels=3, base_resolution=4, max_resolution=32,
                           features=16, plane_res=24, plane_features=8)
    factors = mxgrid.init_mxgrid(jax.random.PRNGKey(3), s)
    pts = jnp.asarray(RNG.uniform(0, 1, (700, 3)), jnp.float32)
    out = mxgrid_pallas.encode(factors, pts, s, interpret=True)
    out_t = mxgrid_pallas.encode_t(factors, pts, s, interpret=True)
    np.testing.assert_allclose(np.asarray(out_t.T), np.asarray(out),
                               rtol=1e-5, atol=1e-6)

    ncfg = NetworkConfig()
    mlp = init_mlp(jax.random.PRNGKey(4), s.n_output_dims, ncfg)
    raw = apply_mlp(mlp, out, ncfg)
    raw_t = apply_mlp_t(mlp, out_t, ncfg)
    np.testing.assert_allclose(np.asarray(raw_t.T), np.asarray(raw),
                               rtol=1e-4, atol=1e-5)

    # gradients through the transposed path match the untransposed path
    tgt = jnp.asarray(RNG.normal(size=(s.n_output_dims, 700)), jnp.float32)

    def loss_plain(f):
        return jnp.sum((mxgrid_pallas.encode(f, pts, s, interpret=True) - tgt.T) ** 2)

    def loss_t(f):
        return jnp.sum((mxgrid_pallas.encode_t(f, pts, s, interpret=True) - tgt) ** 2)

    g0 = jax.grad(loss_plain)(factors)
    g1 = jax.grad(loss_t)(factors)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5), g0, g1)


def test_snap_levels_exact_when_knots_align():
    """When every (r_l - 1) divides (r_fine - 1) the folded basis IS the
    original basis: snap_levels must be numerically a no-op (resolutions
    3, 5, 9: coarse knots all land on fine nodes)."""
    mk = lambda snap: mxgrid.make_mxspec(
        n_levels=3, base_resolution=3, max_resolution=9, features=8,
        snap_levels=snap)
    s0, s1 = mk(False), mk(True)
    assert s0.resolutions == (3, 5, 9)
    factors = jnp.asarray(RNG.normal(size=(3, s0.total_res, 8)), jnp.float32)
    pts = jnp.asarray(RNG.uniform(0, 1, (410, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(factors, pts, s0))
    got_xla = np.asarray(mxgrid.encode(factors, pts, s1))
    got_pl = np.asarray(mxgrid_pallas.encode(factors, pts, s1, interpret=True))
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(got_pl, want, rtol=1e-4, atol=1e-5)


def test_snap_levels_pallas_matches_xla_cp_only():
    """General ladder (knots NOT aligned): the folded pallas kernel must
    match the folded XLA path (same snapped semantics), fwd + grad."""
    s = mxgrid.make_mxspec(n_levels=3, base_resolution=4, max_resolution=32,
                           features=16, snap_levels=True)
    factors = jnp.asarray(RNG.normal(size=(3, s.total_res, 16)), jnp.float32)
    pts = jnp.asarray(RNG.uniform(0, 1, (700, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(factors, pts, s))
    got = np.asarray(mxgrid_pallas.encode(factors, pts, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    tgt = jnp.asarray(RNG.normal(size=(700, 16)), jnp.float32)
    g_xla = jax.grad(
        lambda f: jnp.sum((mxgrid.encode(f, pts, s) - tgt) ** 2))(factors)
    g_pl = jax.grad(
        lambda f: jnp.sum(
            (mxgrid_pallas.encode(f, pts, s, interpret=True) - tgt) ** 2
        ))(factors)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_xla),
                               rtol=1e-3, atol=1e-4)


def test_snap_levels_fused_planes_match_xla():
    """Folded FUSED kernel (CP + rectangular planes, balanced axes) vs the
    folded XLA path: fwd + every gradient leaf."""
    s = mxgrid.make_mxspec(n_levels=3, base_resolution=4, max_resolution=32,
                           features=16, plane_specs=((24, 16, 8),),
                           plane_axes="balanced", snap_levels=True)
    factors = mxgrid.init_mxgrid(jax.random.PRNGKey(11), s)
    pts = jnp.asarray(RNG.uniform(0, 1, (700, 3)), jnp.float32)
    want = np.asarray(mxgrid.encode(factors, pts, s))
    got = np.asarray(mxgrid_pallas.encode(factors, pts, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)

    tgt = jnp.asarray(RNG.normal(size=(700, s.n_output_dims)), jnp.float32)
    g_xla = jax.grad(
        lambda f: jnp.sum((mxgrid.encode(f, pts, s) - tgt) ** 2))(factors)
    g_pl = jax.grad(
        lambda f: jnp.sum(
            (mxgrid_pallas.encode(f, pts, s, interpret=True) - tgt) ** 2
        ))(factors)
    for k in ("lines", "planes", "plane_lines"):
        np.testing.assert_allclose(np.asarray(g_pl[k]), np.asarray(g_xla[k]),
                                   rtol=1e-3, atol=1e-3, err_msg=k)
