"""Fused Pallas TPU kernels for the MX-grid encoding (CP lines + VM planes).

The XLA path (ops/mxgrid.py) materializes the [P, total_res] hat basis in
HBM several times per step (fwd + checkpoint rebuild + dW consumption).
These kernels build every basis tile-by-tile in VMEM and feed the MXU
directly:

  forward (per tile of T points):
    CP lines:  hat_d = relu(1 - |x_d * a - b|);  A_d = hat_d @ W_d (MXU)
               out_cp = A_0 * A_1 * A_2
    VM planes (TensoRF-style, per plane pair i = xy, xz, yz):
               t    = hat_u @ P_i            (MXU, [T, Rp*Kp])
               f_pl = sum_r t[:, r, :] * hat_v[:, r, None]
               f_li = hat_w @ L_i
               out_i = f_pl * f_li
  backward: dW_d  = sum_tiles hat_d^T @ (g_cp * A_e * A_f)
            dL_i  = sum_tiles hat_w^T @ (g_i * f_pl)
            dP_i  = sum_tiles hat_u^T @ (hat_v[:, :, None] * (g_i*f_li)[:, None, :])
            all accumulated across the sequential TPU grid. Points receive no
            gradient — nothing in the training/render paths differentiates
            sample positions (the reference's CUDA backward passes
            dy_dx=nullptr the same way, ref nerf_model.cu:1604).

Per-column constants a (level scale R_l - 1) and b (in-level lattice index)
turn the concatenated multi-level CP basis into ONE fused expression; columns
padded to a lane multiple get a=0, b=2 so their hat value is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romap_tpu.ops.mxgrid import _PLANE_AXES, MXGridSpec

TILE = 512  # CP-kernel tile (hat is [TILE, ~2304] fp32)
PLANE_TILE = 256  # plane-kernel tile (plane stacks + wide intermediates)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.cache
def _column_consts(spec: MXGridSpec) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-column (scale a, lattice index b), padded to a lane multiple."""
    rp = _round_up(spec.total_res, 128)
    a = np.zeros(rp, np.float32)
    b = np.full(rp, 2.0, np.float32)  # pad columns: relu(1-|0*x-2|) == 0
    for r, off in zip(spec.resolutions, spec.offsets):
        a[off : off + r] = r - 1
        b[off : off + r] = np.arange(r, dtype=np.float32)
    return a, b, rp


def _hat(xd, a_ref, b_ref):
    """[T] coords -> [T, RP] concatenated multi-level tent basis."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(xd[:, None] * a_ref[0, :] - b_ref[0, :]))


def _hat1(xd, r: int):
    """[T] coords -> [T, r] single-resolution tent basis."""
    xs = xd * (r - 1)
    # Mosaic only lowers integer iota; convert after
    i = jax.lax.broadcasted_iota(jnp.int32, (1, r), 1).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(xs[:, None] - i))


def _cp_out(x_ref, a_ref, b_ref, w_ref):
    acc = None
    for d in range(3):
        hat = _hat(x_ref[d, :], a_ref, b_ref)
        ad = jnp.dot(hat, w_ref[d], preferred_element_type=jnp.float32)
        acc = ad if acc is None else acc * ad
    return acc


def _fwd_kernel(x_ref, a_ref, b_ref, w_ref, out_ref):
    out_ref[:] = _cp_out(x_ref, a_ref, b_ref, w_ref).astype(out_ref.dtype)


def _block_indicator(rp: int, kp: int):
    """[rp*kp, kp] 0/1 matrix: column k selects lane block k (the MXU stand-in
    for the banned lane-crossing reshape [T, rp*kp] -> [T, rp, kp])."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (rp * kp, kp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (rp * kp, kp), 1)
    return (rows // rp == cols).astype(jnp.float32)


def _tile_lanes(m, reps: int):
    """[T, rp] -> [T, rp*reps] lane tiling via concatenation."""
    return jnp.concatenate([m] * reps, axis=1)


def _plane_feats(x_ref, planes_ref, plines_ref, i: int, rp: int, kp: int, t: int):
    """Plane pair i, fully batched over channels: planes stored channel-major
    along lanes ([rp, kp*rp], channel k in lane block k), the per-channel
    weighted reduce becomes one matmul with a block-indicator matrix."""
    u, v, w = _PLANE_AXES[i]
    hu = _hat1(x_ref[u, :], rp)
    hv = _hat1(x_ref[v, :], rp)
    t_all = jnp.dot(hu, planes_ref[i], preferred_element_type=jnp.float32)
    f_pl = jnp.dot(t_all * _tile_lanes(hv, kp), _block_indicator(rp, kp),
                   preferred_element_type=jnp.float32)  # [T, Kp]
    f_li = jnp.dot(_hat1(x_ref[w, :], rp), plines_ref[i],
                   preferred_element_type=jnp.float32)
    return hu, hv, f_pl, f_li


def _make_fwd_planes_kernel(rp_pl: int, kp: int):
    def kernel(x_ref, planes_ref, plines_ref, out_ref):
        t = x_ref.shape[1]
        for i in range(3):
            _, _, f_pl, f_li = _plane_feats(x_ref, planes_ref, plines_ref, i,
                                            rp_pl, kp, t)
            out_ref[:, i * kp : (i + 1) * kp] = (
                (f_pl * f_li).astype(out_ref.dtype))

    return kernel


def _bwd_lines_kernel(x_ref, a_ref, b_ref, w_ref, g_ref, dw_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    a = []
    for d in range(3):
        hat = _hat(x_ref[d, :], a_ref, b_ref)
        a.append(jnp.dot(hat, w_ref[d], preferred_element_type=jnp.float32))
    g = g_ref[:].astype(jnp.float32)
    for d in range(3):
        u = g * a[(d + 1) % 3] * a[(d + 2) % 3]  # [T, K]
        hat = _hat(x_ref[d, :], a_ref, b_ref)  # rebuild (VMEM-frugal)
        dw_ref[d] += jax.lax.dot_general(
            hat, u, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dw_ref.dtype)


def _make_bwd_planes_kernel(rp_pl: int, kp: int):
    def kernel(x_ref, planes_ref, plines_ref, g_ref, dplanes_ref, dplines_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dplanes_ref[...] = jnp.zeros_like(dplanes_ref)
            dplines_ref[...] = jnp.zeros_like(dplines_ref)

        t = x_ref.shape[1]
        for i in range(3):
            u, v, w = _PLANE_AXES[i]
            hu, hv, f_pl, f_li = _plane_feats(x_ref, planes_ref, plines_ref, i,
                                              rp_pl, kp, t)
            gi = g_ref[:, i * kp : (i + 1) * kp].astype(jnp.float32)
            hw = _hat1(x_ref[w, :], rp_pl)
            dplines_ref[i] += jax.lax.dot_general(
                hw, gi * f_pl, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dplines_ref.dtype)
            gl = gi * f_li  # [T, Kp]
            # broadcast each channel grad over its lane block, one matmul
            gl_wide = jnp.dot(gl, _block_indicator(rp_pl, kp).T,
                              preferred_element_type=jnp.float32)
            dplanes_ref[i] += jax.lax.dot_general(
                hu, _tile_lanes(hv, kp) * gl_wide, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dplanes_ref.dtype)

    return kernel


def _pad_and_tile(pts: jax.Array) -> tuple[jax.Array, int, int]:
    n = pts.shape[0]
    npad = _round_up(max(n, TILE), TILE)
    pts = jnp.pad(pts, ((0, npad - n), (0, 0)))
    return pts.T, n, npad  # [3, npad]


def _lines_of(factors):
    return factors["lines"] if isinstance(factors, dict) else factors


def _fwd_impl(factors, pts, spec: MXGridSpec, interpret: bool):
    a, b, rp = _column_consts(spec)
    k = spec.features
    kp = spec.plane_features
    rp_pl = spec.plane_res
    xt, n, npad = _pad_and_tile(pts)
    lines = _lines_of(factors)
    w = jnp.pad(lines, ((0, 0), (0, rp - spec.total_res), (0, 0)))
    grid = npad // TILE

    common_specs = [
        pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, rp, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_cp = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=common_specs,
        out_specs=pl.BlockSpec((TILE, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, k), lines.dtype),
        interpret=interpret,
    )(xt, a[None, :], b[None, :], w)
    if kp == 0:
        return out_cp[:n]

    # planes in a separate kernel: the combined version exceeds the 16 MB
    # VMEM budget (hat tiles + line table + plane stacks at once)
    # channel-major lanes: W[i][u, k*Rp + v] = P[i, u, v, k]
    planes = (factors["planes"].transpose(0, 1, 3, 2)
              .reshape(3, rp_pl, kp * rp_pl))
    plines = factors["plane_lines"]
    grid_pl = npad // PLANE_TILE
    out_pl = pl.pallas_call(
        _make_fwd_planes_kernel(rp_pl, kp),
        grid=(grid_pl,),
        in_specs=[
            pl.BlockSpec((3, PLANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rp_pl, kp * rp_pl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rp_pl, kp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PLANE_TILE, 3 * kp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, 3 * kp), lines.dtype),
        interpret=interpret,
    )(xt, planes, plines)
    return jnp.concatenate([out_cp[:n], out_pl[:n]], axis=-1)


def _bwd_impl(factors, pts, g, spec: MXGridSpec, interpret: bool):
    a, b, rp = _column_consts(spec)
    k = spec.features
    kp = spec.plane_features
    rp_pl = spec.plane_res
    xt, n, npad = _pad_and_tile(pts)
    g = jnp.pad(g, ((0, npad - n), (0, 0)))
    lines = _lines_of(factors)
    w = jnp.pad(lines, ((0, 0), (0, rp - spec.total_res), (0, 0)))
    grid = npad // TILE

    dw = pl.pallas_call(
        _bwd_lines_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rp, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, rp, k), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, rp, k), lines.dtype),
        interpret=interpret,
    )(xt, a[None, :], b[None, :], w, g[:, :k])
    dlines = dw[:, : spec.total_res, :]
    if kp == 0:
        return dlines

    planes = (factors["planes"].transpose(0, 1, 3, 2)
              .reshape(3, rp_pl, kp * rp_pl))
    plines = factors["plane_lines"]
    grid_pl = npad // PLANE_TILE
    dplanes, dplines = pl.pallas_call(
        _make_bwd_planes_kernel(rp_pl, kp),
        grid=(grid_pl,),
        in_specs=[
            pl.BlockSpec((3, PLANE_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rp_pl, kp * rp_pl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rp_pl, kp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PLANE_TILE, 3 * kp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((3, rp_pl, kp * rp_pl), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rp_pl, kp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((3, rp_pl, kp * rp_pl), lines.dtype),
            jax.ShapeDtypeStruct((3, rp_pl, kp), lines.dtype),
        ),
        interpret=interpret,
    )(xt, planes, plines, g[:, k:])
    return {
        "lines": dlines,
        "planes": (dplanes.reshape(3, rp_pl, kp, rp_pl)
                   .transpose(0, 1, 3, 2)),
        "plane_lines": dplines,
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def encode_pallas(factors, pts, spec: MXGridSpec, interpret: bool = False):
    """[P, 3] points -> [P, n_output_dims]. Gradient flows to `factors` only
    (points get zeros — nothing in this framework differentiates sample
    positions)."""
    return _fwd_impl(factors, pts, spec, interpret)


def _vjp_fwd(factors, pts, spec, interpret):
    return _fwd_impl(factors, pts, spec, interpret), (factors, pts)


def _vjp_bwd(spec, interpret, res, g):
    factors, pts = res
    dw = _bwd_impl(factors, pts, g, spec, interpret)
    return dw, jnp.zeros_like(pts)


encode_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def encode(factors, p: jax.Array, spec: MXGridSpec,
           interpret: bool = False) -> jax.Array:
    """Drop-in for mxgrid.encode with arbitrary batch shape."""
    batch_shape = p.shape[:-1]
    pts = p.reshape(-1, 3).astype(_lines_of(factors).dtype)
    out = encode_pallas(factors, pts, spec, interpret)
    return out.reshape(*batch_shape, spec.n_output_dims)
