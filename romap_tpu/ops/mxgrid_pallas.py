"""Fused Pallas TPU kernel for the MX-grid encoding.

The XLA path (ops/mxgrid.py) materializes the [P, total_res] hat basis in
HBM three times per step (fwd + checkpoint rebuild + dW consumption). This
kernel builds the basis tile-by-tile in VMEM and feeds the MXU directly:

  forward:  per tile of T points, per axis d:
              hat_d = relu(1 - |x_d * a - b|)        (VPU, in VMEM)
              A_d   = hat_d @ W_d                    (MXU)
            out = A_0 * A_1 * A_2
  backward: dW_d = sum_tiles hat_d^T @ (g * A_e * A_f)   (MXU, accumulated
            across the sequential TPU grid); points receive no gradient —
            nothing in the training/render paths differentiates w.r.t.
            sample positions (the reference's CUDA backward has no input
            gradient either, ref tcnn backward with dy_dx=nullptr,
            nerf_model.cu:1604).

Per-column constants a (level scale R_l - 1) and b (in-level lattice index)
turn the concatenated multi-level basis into ONE fused expression; columns
padded to a lane multiple get a=0, b=2 so their hat value is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romap_tpu.ops.mxgrid import MXGridSpec

TILE = 512  # points per kernel tile


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
    """[T] coords -> [T, RP] tent basis (built in registers/VMEM)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(xd[:, None] * a_ref[0, :] - b_ref[0, :]))


def _fwd_kernel(x_ref, a_ref, b_ref, w_ref, out_ref):
    acc = None
    for d in range(3):
        hat = _hat(x_ref[d, :], a_ref, b_ref)
        ad = jnp.dot(hat, w_ref[d], preferred_element_type=jnp.float32)
        acc = ad if acc is None else acc * ad
    out_ref[:] = acc.astype(out_ref.dtype)


def _bwd_kernel(x_ref, a_ref, b_ref, w_ref, g_ref, dw_ref):
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


def _pad_and_tile(pts: jax.Array) -> tuple[jax.Array, int, int]:
    n = pts.shape[0]
    npad = _round_up(max(n, TILE), TILE)
    pts = jnp.pad(pts, ((0, npad - n), (0, 0)))
    return pts.T, n, npad  # [3, npad]


def _fwd_impl(factors, pts, spec: MXGridSpec, interpret: bool):
    a, b, rp = _column_consts(spec)
    k = spec.features
    xt, n, npad = _pad_and_tile(pts)
    w = jnp.pad(factors, ((0, 0), (0, rp - spec.total_res), (0, 0)))
    grid = npad // TILE
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, rp, k), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, k), factors.dtype),
        interpret=interpret,
    )(xt, a[None, :], b[None, :], w)
    return out[:n]


def _bwd_impl(factors, pts, g, spec: MXGridSpec, interpret: bool):
    a, b, rp = _column_consts(spec)
    k = spec.features
    xt, n, npad = _pad_and_tile(pts)
    g = jnp.pad(g, ((0, npad - n), (0, 0)))
    w = jnp.pad(factors, ((0, 0), (0, rp - spec.total_res), (0, 0)))
    grid = npad // TILE
    dw = pl.pallas_call(
        _bwd_kernel,
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
        out_shape=jax.ShapeDtypeStruct((3, rp, k), factors.dtype),
        interpret=interpret,
    )(xt, a[None, :], b[None, :], w, g)
    return dw[:, : spec.total_res, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def encode_pallas(factors, pts, spec: MXGridSpec, interpret: bool = False):
    """[P, 3] points -> [P, K] features. Gradient flows to `factors` only
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


def encode(factors: jax.Array, p: jax.Array, spec: MXGridSpec,
           interpret: bool = False) -> jax.Array:
    """Drop-in for mxgrid.encode with arbitrary batch shape."""
    batch_shape = p.shape[:-1]
    pts = p.reshape(-1, 3).astype(factors.dtype)
    out = encode_pallas(factors, pts, spec, interpret)
    return out.reshape(*batch_shape, spec.features)
