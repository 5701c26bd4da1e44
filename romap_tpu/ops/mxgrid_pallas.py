"""Fused Pallas TPU kernels for the MX-grid encoding (CP lines + VM planes).

The XLA path (ops/mxgrid.py) materializes the [P, total_res] hat basis in
HBM several times per step (fwd + checkpoint rebuild + dW consumption).
These kernels build every basis tile-by-tile in VMEM and feed the MXU
directly.

LAYOUT: everything runs TRANSPOSED — points live in the LANE dimension,
features/basis columns in sublanes. This is the load-bearing choice: the
per-channel plane contraction (sum over the v axis within each channel
block) becomes a reshape along the SUBLANE dim + reduce, which Mosaic
executes natively. In the untransposed layout the same reduction needs
either a lane-crossing reshape (slow vreg shuffles) or a block-indicator
matmul whose tiny output width pads to 128 lanes and wastes ~8x MXU time —
both measured slower on v5e.

  forward (per tile of T points, all transposed [*, T]):
    CP lines:  hat_d = relu(1 - |a*x_d - b|)            [RP, T]  (VPU)
               A_d   = W_d^T @ hat_d                     [K, T]   (MXU)
               out_cp = A_0 * A_1 * A_2   (computed in XLA from saved A)
    VM planes (TensoRF-style ladder, level l, plane pair i = xy, xz, yz;
    planes stored channel-major [K_l*B, R_l], v padded to lane-block B):
               t_i   = P_li @ hat_u                      [K_l*B, T] (MXU)
               f_pl  = sum_v (t_i.reshape(K_l, B, T) * hat_v[None])  (VPU)
               f_li  = L_li @ hat_w                      [K_l, T]  (MXU)
               out_li = f_pl * f_li      (computed in XLA from saved f)
  backward — CONSUMES the forward's saved activations (A, f_pl, f_li)
    instead of recomputing them; only the cheap tent bases are rebuilt:
            dW_d  = sum_tiles (g_cp * A_e * A_f) @ hat_d^T
            dL_li = sum_tiles (g_li * f_pl) @ hat_w^T
            dP_li = sum_tiles (bcast(g_li * f_li) * bcast(hat_v)) @ hat_u^T
    All accumulation buffers are fp32 across the sequential TPU grid.
    Points receive no gradient — nothing in the training/render paths
    differentiates sample positions (the reference's CUDA backward passes
    dy_dx=nullptr the same way, ref nerf_model.cu:1604).

Mixed precision: tent bases are built in fp32 on the VPU and cast to the
parameter dtype for the MXU matmuls; every dot accumulates in fp32
(preferred_element_type). With bfloat16 parameters the matmuls run at the
MXU's native bf16 rate — the reference's tcnn pipeline is fp16 with
loss_scale 128 (ref nerf_model.h:166), so sub-fp32 matmul inputs are parity.

Per-row constants a (level scale R_l - 1) and b (in-level lattice index)
turn the concatenated multi-level CP basis into ONE fused expression; rows
padded to a sublane multiple get a=0, b=2 so their hat value is exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from romap_tpu.ops.mxgrid import MXGridSpec

import os

# Tile sizes (points per grid step). Larger tiles amortize grid overhead and
# keep the MXU busier; 2048 measured ~15% faster than 512 end-to-end on v5e
# and still fits VMEM (hat is [~1152, TILE] fp32 built per axis).
TILE = int(os.environ.get("MX_TILE", "2048"))  # CP-kernel tile
PLANE_TILE = int(os.environ.get("MX_PLANE_TILE", "2048"))  # plane-kernel tile

# MX_HAT_BF16=1: run the tent-basis elementwise tail (abs/1-/relu) in
# bfloat16. The lattice-coordinate subtraction x*a - b stays fp32 — near
# the top resolution the operands are O(R) with O(1e-3) fractional
# significance, which bf16's 8 mantissa bits would destroy — but the
# result is O(1) and bf16-safe. Perf experiment: VPU elementwise is the
# encode bottleneck (ARCHITECTURE kernel split).
HAT_BF16 = os.environ.get("MX_HAT_BF16", "0") != "0"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.cache
def _column_consts(spec: MXGridSpec) -> tuple[np.ndarray, np.ndarray, int]:
    """Per-row (scale a, lattice index b), padded to a tile multiple."""
    rp = _round_up(spec.total_res, 128)
    a = np.zeros(rp, np.float32)
    b = np.full(rp, 2.0, np.float32)  # pad rows: relu(1-|0*x-2|) == 0
    for r, off in zip(spec.resolutions, spec.offsets):
        a[off : off + r] = r - 1
        b[off : off + r] = np.arange(r, dtype=np.float32)
    return a, b, rp


def _hat_t(xd, a_ref, b_ref, dtype):
    """[T] coords -> [RP, T] concatenated multi-level tent basis
    (transposed: basis rows in sublanes, points in lanes)."""
    z = xd[None, :] * a_ref[:, :1] - b_ref[:, :1]  # fp32: O(R) operands
    if HAT_BF16 and dtype != jnp.float32:
        z = z.astype(jnp.bfloat16)  # O(1)-range tail in bf16
    h = jnp.maximum(z.dtype.type(0), z.dtype.type(1) - jnp.abs(z))
    return h.astype(dtype)


def _hat1_t(xd, r: int, dtype, rows: int | None = None):
    """[T] coords -> [rows, T] single-res tent basis at resolution r
    (rows defaults to r; pad rows i >= r are exactly 0 since x <= r-1)."""
    xs = xd * (r - 1)
    i = jax.lax.broadcasted_iota(
        jnp.int32, (rows if rows is not None else r, 1), 0
    ).astype(jnp.float32)
    z = xs[None, :] - i  # fp32: O(R) operands
    if HAT_BF16 and dtype != jnp.float32:
        z = z.astype(jnp.bfloat16)
    h = jnp.maximum(z.dtype.type(0), z.dtype.type(1) - jnp.abs(z))
    return h.astype(dtype)


def _plane_block(r: int) -> int:
    """Per-channel v-block: r padded to a sublane-tile multiple so
    [K*B, T] -> [K, B, T] reshapes never touch the minor (lane) dim.

    16 = the bf16 sublane tile (fp32 needs only 8; 16 keeps K*B aligned for
    bf16 parameter arrays too). The original conservative 128 made every
    rectangular-plane level pay a full 128-row v extent in the MXU matmul
    — at rv=64 that doubled the plane FLOPs for nothing (measured: the r4
    rect64x128 ladder point showed zero speedup over square planes)."""
    return _round_up(r, 16)


def _dot_t(a, b):
    """[M, T] x [N, T] -> [M, N] (contract the point/lane dim)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


# --------------------------------------------------------------------------
# CP-line kernels
# --------------------------------------------------------------------------


def _cp_fwd_body(x_ref, a_ref, b_ref, w_ref, afac_ref):
    """Writes the three axis factors A_d = W_d^T @ hat_d (residuals for
    bwd). w_ref is [3, K, RP]."""
    mm = w_ref.dtype
    for d in range(3):
        hat = _hat_t(x_ref[d, :], a_ref, b_ref, mm)  # [RP, T]
        afac_ref[d] = jnp.dot(
            w_ref[d], hat, preferred_element_type=jnp.float32
        ).astype(afac_ref.dtype)


class _HatCache:
    """Per-tile tent-basis cache: identical (axis, res, dtype, rows) builds
    are shared — with balanced axis assignment each axis appears once as a
    fine u and once as a fine w (same resolution), and the folded CP path
    reuses the same machinery, so the VPU builds each distinct basis once
    per tile instead of once per consumer."""

    def __init__(self, x_ref):
        self.x_ref = x_ref
        self.cache = {}

    def __call__(self, axis: int, r: int, dtype, rows: int | None = None):
        key = (axis, r, jnp.dtype(dtype).name, rows)
        if key not in self.cache:
            self.cache[key] = _hat1_t(self.x_ref[axis, :], r, dtype,
                                      rows=rows)
        return self.cache[key]


def _plane_fwd_body(plane_specs, plane_axes, x_ref, planes_refs, plines_refs,
                    fpl_ref, fli_ref, out_ref=None, out_off=0, hat=None):
    """Per level/pair: f_pl (plane sample) and f_li (line sample) residuals;
    when `out_ref` is given, also writes their product at row out_off+row
    (the fused kernel's output block)."""
    mm = planes_refs[0].dtype
    t = x_ref.shape[1]
    if hat is None:
        hat = _HatCache(x_ref)
    row = 0
    for lvl, (ru, rv, kp) in enumerate(plane_specs):
        bb = _plane_block(rv)
        for i, (u, v, w) in enumerate(plane_axes):
            hu = hat(u, ru, mm)  # [Ru, T]
            hv = hat(v, rv, jnp.float32, rows=bb)  # [B, T]
            t_all = jnp.dot(
                planes_refs[lvl][i], hu, preferred_element_type=jnp.float32
            )  # [Kp*B, T]
            f_pl = jnp.sum(
                t_all.reshape(kp, bb, t) * hv[None], axis=1
            )  # [Kp, T] — sublane-dim reduce, no lane crossing
            f_li = jnp.dot(
                plines_refs[lvl][i], hat(w, max(ru, rv), mm),
                preferred_element_type=jnp.float32,
            )  # [Kp, T]
            fpl_ref[row : row + kp, :] = f_pl.astype(fpl_ref.dtype)
            fli_ref[row : row + kp, :] = f_li.astype(fli_ref.dtype)
            if out_ref is not None:
                out_ref[out_off + row : out_off + row + kp, :] = (
                    f_pl * f_li
                ).astype(out_ref.dtype)
            row += kp


def _fwd_cp_kernel(x_ref, a_ref, b_ref, w_ref, afac_ref):
    """Split-path CP forward (the product A_0*A_1*A_2 is formed in XLA)."""
    _cp_fwd_body(x_ref, a_ref, b_ref, w_ref, afac_ref)


def _cp_grad_body(x_ref, a_ref, b_ref, afac_ref, g, dw_ref):
    """dW_d^T += (g * A_e * A_f) @ hat_d^T for all three axes, fp32
    accumulation. Consumes the saved axis factors; only tent bases are
    rebuilt. `g` is the CP slice of the cotangent, [K, T]."""
    mm = afac_ref.dtype
    g = g.astype(jnp.float32)
    a0 = afac_ref[0].astype(jnp.float32)
    a1 = afac_ref[1].astype(jnp.float32)
    a2 = afac_ref[2].astype(jnp.float32)
    others = ((a1, a2), (a0, a2), (a0, a1))
    for d in range(3):
        ae, af = others[d]
        u = (g * ae * af).astype(mm)  # [K, T]
        hat = _hat_t(x_ref[d, :], a_ref, b_ref, mm)  # [RP, T]
        dw_ref[d] += _dot_t(u, hat)  # [K, RP]


def _plane_grad_body(plane_specs, plane_axes, x_ref, fpl_ref, fli_ref, g_ref,
                     g_off, dplanes_refs, dplines_refs, hat=None):
    """dP/dL accumulation for every plane level/pair. `g_off` is the row of
    g_ref where the plane block starts (0 for the split kernel, K for the
    fused one)."""
    mm = fpl_ref.dtype
    t = x_ref.shape[1]
    if hat is None:
        hat = _HatCache(x_ref)
    row = 0
    for lvl, (ru, rv, kp) in enumerate(plane_specs):
        bb = _plane_block(rv)
        for i, (u, v, w) in enumerate(plane_axes):
            gi = g_ref[g_off + row : g_off + row + kp, :].astype(jnp.float32)
            f_pl = fpl_ref[row : row + kp, :].astype(jnp.float32)
            f_li = fli_ref[row : row + kp, :].astype(jnp.float32)
            hu = hat(u, ru, mm)
            hv = hat(v, rv, jnp.float32, rows=bb)
            hw = hat(w, max(ru, rv), mm)
            dplines_refs[lvl][i] += _dot_t((gi * f_pl).astype(mm), hw)
            # d t_all[k*B+v, t] = hv[v, t] * (gi * f_li)[k, t]
            prod = (
                (gi * f_li)[:, None, :] * hv[None]
            ).reshape(kp * bb, t)  # sublane-dim reshape only
            dplanes_refs[lvl][i] += _dot_t(prod.astype(mm), hu)
            row += kp


def _bwd_cp_kernel(x_ref, a_ref, b_ref, afac_ref, g_ref, dw_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _cp_grad_body(x_ref, a_ref, b_ref, afac_ref, g_ref[:], dw_ref)


# --------------------------------------------------------------------------
# VM-plane kernels (ladder of (res, feats) levels, 3 plane pairs per level)
# --------------------------------------------------------------------------


def _make_fwd_planes_kernel(plane_specs, plane_axes):
    n_lvl = len(plane_specs)

    def kernel(x_ref, *refs):
        planes_refs = refs[:n_lvl]  # each [3, Kp*B, R]
        plines_refs = refs[n_lvl : 2 * n_lvl]  # each [3, Kp, R]
        fpl_ref, fli_ref = refs[2 * n_lvl], refs[2 * n_lvl + 1]
        _plane_fwd_body(plane_specs, plane_axes, x_ref, planes_refs,
                        plines_refs, fpl_ref, fli_ref)

    return kernel


def _make_fused_fwd_kernel(plane_specs, plane_axes, k_cp: int):
    """CP + planes + their output products in ONE kernel: loads the point
    tile once and writes the final concatenated features directly, so XLA
    never re-reads the axis factors to form A0*A1*A2 (saves two full passes
    over [kout, P] in HBM)."""
    n_lvl = len(plane_specs)

    def kernel(x_ref, a_ref, b_ref, w_ref, *refs):
        planes_refs = refs[:n_lvl]
        plines_refs = refs[n_lvl : 2 * n_lvl]
        out_ref, afac_ref, fpl_ref, fli_ref = refs[2 * n_lvl : 2 * n_lvl + 4]

        # CP lines (residuals saved for bwd; product written to out)
        _cp_fwd_body(x_ref, a_ref, b_ref, w_ref, afac_ref)
        prod = (afac_ref[0][...].astype(jnp.float32)
                * afac_ref[1][...].astype(jnp.float32)
                * afac_ref[2][...].astype(jnp.float32))
        out_ref[:k_cp, :] = prod.astype(out_ref.dtype)

        # VM planes (fpl/fli saved for bwd; product appended to out)
        _plane_fwd_body(plane_specs, plane_axes, x_ref, planes_refs,
                        plines_refs, fpl_ref, fli_ref, out_ref, k_cp)

    return kernel


def _fused_forward(factors, xt, npad, spec: MXGridSpec, interpret: bool):
    """Returns (out [kout_total, npad], afac, fpl, fli) from one kernel."""
    a, b, rp = _column_consts(spec)
    k = spec.features
    lines = _lines_of(factors)
    w_t = jnp.pad(lines, ((0, 0), (0, rp - spec.total_res), (0, 0))).transpose(
        0, 2, 1
    )
    planes = _planes_t(factors, spec)
    plines = [p.transpose(0, 2, 1) for p in factors["plane_lines"]]
    kout_pl = spec.plane_out_dims
    grid = npad // TILE
    tile = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        _const_spec((rp, 1)),
        _const_spec((rp, 1)),
        _const_spec((3, k, rp)),
    ]
    in_specs += [_const_spec(p.shape) for p in planes]
    in_specs += [_const_spec(p.shape) for p in plines]
    out_specs = (
        tile(k + kout_pl),
        pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        tile(kout_pl),
        tile(kout_pl),
    )
    dt = lines.dtype
    return pl.pallas_call(
        _make_fused_fwd_kernel(spec.plane_specs, spec.plane_axes, k),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((k + kout_pl, npad), dt),
            jax.ShapeDtypeStruct((3, k, npad), dt),
            jax.ShapeDtypeStruct((kout_pl, npad), dt),
            jax.ShapeDtypeStruct((kout_pl, npad), dt),
        ),
        interpret=interpret,
    )(xt, a[:, None], b[:, None], w_t, *planes, *plines)


def _make_fused_bwd_kernel(plane_specs, plane_axes, k_cp: int):
    """CP + plane parameter gradients in ONE kernel: the point tile and the
    cotangent tile are loaded once, all accumulators live across the
    sequential grid. Pairs with the fused forward (residual padding = CP
    TILE for both halves)."""
    n_lvl = len(plane_specs)

    def kernel(x_ref, a_ref, b_ref, afac_ref, fpl_ref, fli_ref, g_ref,
               *drefs):
        dw_ref = drefs[0]
        dplanes_refs = drefs[1 : 1 + n_lvl]
        dplines_refs = drefs[1 + n_lvl :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in drefs:
                r[...] = jnp.zeros_like(r)

        _cp_grad_body(x_ref, a_ref, b_ref, afac_ref, g_ref[:k_cp, :], dw_ref)
        _plane_grad_body(plane_specs, plane_axes, x_ref, fpl_ref, fli_ref,
                         g_ref, k_cp, dplanes_refs, dplines_refs)

    return kernel


def _fused_backward(factors, xt, npad, afac, fpl, fli, g_t,
                    spec: MXGridSpec, interpret: bool):
    """One-kernel gradient for the fused-forward residual layout.
    g_t is the FULL cotangent [kout_total, npad]."""
    a, b, rp = _column_consts(spec)
    k = spec.features
    kout_pl = spec.plane_out_dims
    grid = npad // TILE
    tile = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    dplane_shapes = [
        jax.ShapeDtypeStruct((3, kk * _plane_block(rv), ru), jnp.float32)
        for ru, rv, kk in spec.plane_specs
    ]
    dpline_shapes = [
        jax.ShapeDtypeStruct((3, kk, max(ru, rv)), jnp.float32)
        for ru, rv, kk in spec.plane_specs
    ]
    out_shapes = [jax.ShapeDtypeStruct((3, k, rp), jnp.float32)]
    out_shapes += dplane_shapes + dpline_shapes
    return pl.pallas_call(
        _make_fused_bwd_kernel(spec.plane_specs, spec.plane_axes, k),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            _const_spec((rp, 1)),
            _const_spec((rp, 1)),
            pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            tile(kout_pl),
            tile(kout_pl),
            tile(k + kout_pl),
        ],
        out_specs=tuple(_const_spec(s.shape) for s in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(xt, a[:, None], b[:, None], afac, fpl, fli, g_t)


# --------------------------------------------------------------------------
# Folded (snap_levels) kernels: the multi-level CP ladder is absorbed into
# the finest level's tent basis (W_eff = C^T W, mxgrid.fold_lines), so the
# kernel builds ONE [rfp, T] hat per axis for the whole CP stack — 2.7x
# less VPU hat work and CP-matmul MXU work at the flagship ladder — and the
# _HatCache shares it with nothing (CP fine res differs from plane res) but
# shares the plane u/w hats exactly like the unfolded path.
# --------------------------------------------------------------------------


def _folded_cp_fwd_body(rf, rfp, x_ref, w_ref, afac_ref, hat):
    mm = w_ref.dtype
    for d in range(3):
        afac_ref[d] = jnp.dot(
            w_ref[d], hat(d, rf, mm, rows=rfp),
            preferred_element_type=jnp.float32,
        ).astype(afac_ref.dtype)


def _folded_cp_grad_body(rf, rfp, x_ref, afac_ref, g, dw_ref, hat):
    mm = afac_ref.dtype
    g = g.astype(jnp.float32)
    a0 = afac_ref[0].astype(jnp.float32)
    a1 = afac_ref[1].astype(jnp.float32)
    a2 = afac_ref[2].astype(jnp.float32)
    others = ((a1, a2), (a0, a2), (a0, a1))
    for d in range(3):
        ae, af = others[d]
        u = (g * ae * af).astype(mm)  # [K, T]
        dw_ref[d] += _dot_t(u, hat(d, rf, mm, rows=rfp))  # [K, rfp]


def _make_folded_fused_fwd_kernel(plane_specs, plane_axes, k_cp, rf, rfp):
    n_lvl = len(plane_specs)

    def kernel(x_ref, w_ref, *refs):
        planes_refs = refs[:n_lvl]
        plines_refs = refs[n_lvl : 2 * n_lvl]
        out_ref, afac_ref, fpl_ref, fli_ref = refs[2 * n_lvl : 2 * n_lvl + 4]
        hat = _HatCache(x_ref)
        _folded_cp_fwd_body(rf, rfp, x_ref, w_ref, afac_ref, hat)
        prod = (afac_ref[0][...].astype(jnp.float32)
                * afac_ref[1][...].astype(jnp.float32)
                * afac_ref[2][...].astype(jnp.float32))
        out_ref[:k_cp, :] = prod.astype(out_ref.dtype)
        _plane_fwd_body(plane_specs, plane_axes, x_ref, planes_refs,
                        plines_refs, fpl_ref, fli_ref, out_ref, k_cp,
                        hat=hat)

    return kernel


def _make_folded_fused_bwd_kernel(plane_specs, plane_axes, k_cp, rf, rfp):
    n_lvl = len(plane_specs)

    def kernel(x_ref, afac_ref, fpl_ref, fli_ref, g_ref, *drefs):
        dw_ref = drefs[0]
        dplanes_refs = drefs[1 : 1 + n_lvl]
        dplines_refs = drefs[1 + n_lvl :]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in drefs:
                r[...] = jnp.zeros_like(r)

        hat = _HatCache(x_ref)
        _folded_cp_grad_body(rf, rfp, x_ref, afac_ref, g_ref[:k_cp, :],
                             dw_ref, hat)
        _plane_grad_body(plane_specs, plane_axes, x_ref, fpl_ref, fli_ref,
                         g_ref, k_cp, dplanes_refs, dplines_refs, hat=hat)

    return kernel


def _folded_w_t(factors, spec: MXGridSpec):
    from romap_tpu.ops.mxgrid import fold_lines

    return fold_lines(_lines_of(factors), spec).transpose(0, 2, 1)


def _folded_fused_forward(factors, xt, npad, spec: MXGridSpec,
                          interpret: bool):
    """Folded twin of _fused_forward: same outputs, [3, K, rfp] weights."""
    rf, rfp = spec.fold_res
    k = spec.features
    w_t = _folded_w_t(factors, spec)  # [3, K, rfp]
    planes = _planes_t(factors, spec)
    plines = [p.transpose(0, 2, 1) for p in factors["plane_lines"]]
    kout_pl = spec.plane_out_dims
    grid = npad // TILE
    tile = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        _const_spec((3, k, rfp)),
    ]
    in_specs += [_const_spec(p.shape) for p in planes]
    in_specs += [_const_spec(p.shape) for p in plines]
    out_specs = (
        tile(k + kout_pl),
        pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        tile(kout_pl),
        tile(kout_pl),
    )
    dt = w_t.dtype
    return pl.pallas_call(
        _make_folded_fused_fwd_kernel(spec.plane_specs, spec.plane_axes, k,
                                      rf, rfp),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(
            jax.ShapeDtypeStruct((k + kout_pl, npad), dt),
            jax.ShapeDtypeStruct((3, k, npad), dt),
            jax.ShapeDtypeStruct((kout_pl, npad), dt),
            jax.ShapeDtypeStruct((kout_pl, npad), dt),
        ),
        interpret=interpret,
    )(xt, w_t, *planes, *plines)


def _unfold_dlines(dw_eff, spec: MXGridSpec, dtype):
    """dW_eff [3, K, rfp] (fp32) -> dW [3, total_res, K]: the fold is
    linear, so its transpose maps effective-basis gradients back."""
    from romap_tpu.ops.mxgrid import fold_matrix

    c = jnp.asarray(fold_matrix(spec))  # [total_res, rfp]
    return jnp.einsum("dkf,rf->drk", dw_eff, c).astype(dtype)


def _folded_fused_backward(factors, xt, npad, afac, fpl, fli, g_t,
                           spec: MXGridSpec, interpret: bool):
    rf, rfp = spec.fold_res
    k = spec.features
    kout_pl = spec.plane_out_dims
    grid = npad // TILE
    tile = lambda rows: pl.BlockSpec((rows, TILE), lambda i: (0, i),
                                     memory_space=pltpu.VMEM)
    dplane_shapes = [
        jax.ShapeDtypeStruct((3, kk * _plane_block(rv), ru), jnp.float32)
        for ru, rv, kk in spec.plane_specs
    ]
    dpline_shapes = [
        jax.ShapeDtypeStruct((3, kk, max(ru, rv)), jnp.float32)
        for ru, rv, kk in spec.plane_specs
    ]
    out_shapes = [jax.ShapeDtypeStruct((3, k, rfp), jnp.float32)]
    out_shapes += dplane_shapes + dpline_shapes
    return pl.pallas_call(
        _make_folded_fused_bwd_kernel(spec.plane_specs, spec.plane_axes, k,
                                      rf, rfp),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            tile(kout_pl),
            tile(kout_pl),
            tile(k + kout_pl),
        ],
        out_specs=tuple(_const_spec(s.shape) for s in out_shapes),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(xt, afac, fpl, fli, g_t)


def _folded_cp_kernel(rf, rfp):
    def kernel(x_ref, w_ref, afac_ref):
        _folded_cp_fwd_body(rf, rfp, x_ref, w_ref, afac_ref,
                            _HatCache(x_ref))

    return kernel


def _folded_bwd_cp_kernel(rf, rfp):
    def kernel(x_ref, afac_ref, g_ref, dw_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)

        _folded_cp_grad_body(rf, rfp, x_ref, afac_ref, g_ref[:], dw_ref,
                             _HatCache(x_ref))

    return kernel


def _folded_cp_forward(factors, xt, npad, spec: MXGridSpec, interpret: bool):
    rf, rfp = spec.fold_res
    k = spec.features
    w_t = _folded_w_t(factors, spec)
    grid = npad // TILE
    return pl.pallas_call(
        _folded_cp_kernel(rf, rfp),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            _const_spec((3, k, rfp)),
        ],
        out_specs=pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, k, npad), w_t.dtype),
        interpret=interpret,
    )(xt, w_t)


def _make_bwd_planes_kernel(plane_specs, plane_axes):
    n_lvl = len(plane_specs)

    def kernel(x_ref, fpl_ref, fli_ref, g_ref, *drefs):
        dplanes_refs = drefs[:n_lvl]  # each [3, Kp*B, R]
        dplines_refs = drefs[n_lvl:]  # each [3, Kp, R]

        @pl.when(pl.program_id(0) == 0)
        def _():
            for r in drefs:
                r[...] = jnp.zeros_like(r)

        _plane_grad_body(plane_specs, plane_axes, x_ref, fpl_ref, fli_ref,
                         g_ref, 0, dplanes_refs, dplines_refs)

    return kernel


# --------------------------------------------------------------------------
# Host-side drivers
# --------------------------------------------------------------------------


def _pad_and_tile(pts: jax.Array, tile: int) -> tuple[jax.Array, int, int]:
    n = pts.shape[0]
    npad = _round_up(max(n, tile), tile)
    pts = jnp.pad(pts, ((0, npad - n), (0, 0)))
    return pts.T, n, npad  # [3, npad]


def _lines_of(factors):
    return factors["lines"] if isinstance(factors, dict) else factors


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


def _planes_t(factors, spec: MXGridSpec):
    """Plane params [3, Ru, Rv, K] -> transposed channel-major [3, K*B, Ru]
    (stored[i, k*B + v, u] = P[i, u, v, k], v padded to B = block(Rv))."""
    out = []
    for p, (ru, rv, k) in zip(factors["planes"], spec.plane_specs):
        bb = _plane_block(rv)
        q = p.transpose(0, 3, 2, 1)  # [3, K, V, U]
        q = jnp.pad(q, ((0, 0), (0, 0), (0, bb - rv), (0, 0)))
        out.append(q.reshape(3, k * bb, ru))
    return out


def _cp_forward(factors, xt, npad, spec: MXGridSpec, interpret: bool):
    """Returns the stacked axis factors A [3, K, npad] (param dtype)."""
    a, b, rp = _column_consts(spec)
    k = spec.features
    lines = _lines_of(factors)
    w_t = jnp.pad(lines, ((0, 0), (0, rp - spec.total_res), (0, 0))).transpose(
        0, 2, 1
    )  # [3, K, RP]
    grid = npad // TILE
    return pl.pallas_call(
        _fwd_cp_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((3, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            _const_spec((rp, 1)),
            _const_spec((rp, 1)),
            _const_spec((3, k, rp)),
        ],
        out_specs=pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, k, npad), lines.dtype),
        interpret=interpret,
    )(xt, a[:, None], b[:, None], w_t)


def _planes_forward(factors, xt, npad, spec: MXGridSpec, interpret: bool):
    """Returns (f_pl, f_li), each [3*sum(Kp_l), npad] (param dtype)."""
    dtype = _lines_of(factors).dtype
    kout = spec.plane_out_dims
    grid = npad // PLANE_TILE
    planes = _planes_t(factors, spec)
    plines = [p.transpose(0, 2, 1) for p in factors["plane_lines"]]  # [3,K,R]
    in_specs = [pl.BlockSpec((3, PLANE_TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    in_specs += [_const_spec(p.shape) for p in planes]
    in_specs += [_const_spec(p.shape) for p in plines]
    out_spec = pl.BlockSpec((kout, PLANE_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_planes_kernel(spec.plane_specs, spec.plane_axes),
        grid=(grid,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((kout, npad), dtype),
            jax.ShapeDtypeStruct((kout, npad), dtype),
        ),
        interpret=interpret,
    )(xt, *planes, *plines)


FUSED_FWD = os.environ.get("MX_FUSED", "1") != "0"


def _fwd_impl_t(factors, pts, spec: MXGridSpec, interpret: bool):
    """Transposed forward: returns out [kout, n] (points in lanes)."""
    xt, n, npad = _pad_and_tile(pts, TILE)
    if spec.plane_specs and FUSED_FWD:
        fused = _folded_fused_forward if spec.snap_levels else _fused_forward
        out, afac, fpl, fli = fused(factors, xt, npad, spec, interpret)
        return out[:, :n], (afac, fpl, fli)
    cp_fwd = _folded_cp_forward if spec.snap_levels else _cp_forward
    afac = cp_fwd(factors, xt, npad, spec, interpret)
    out_cp = afac[0] * afac[1] * afac[2]  # [K, npad]
    if not spec.plane_specs:
        return out_cp[:, :n], (afac, None, None)
    xt_pl, _, npad_pl = _pad_and_tile(pts, PLANE_TILE)
    fpl, fli = _planes_forward(factors, xt_pl, npad_pl, spec, interpret)
    out = jnp.concatenate([out_cp[:, :n], (fpl * fli)[:, :n]], axis=0)
    return out, (afac, fpl, fli)


def _fwd_impl(factors, pts, spec: MXGridSpec, interpret: bool):
    out_t, res = _fwd_impl_t(factors, pts, spec, interpret)
    return out_t.T, res  # one [kout, P] -> [P, kout] transpose in XLA


def _bwd_impl(factors, pts, res, g, spec: MXGridSpec, interpret: bool):
    return _bwd_impl_t(factors, pts, res, g.T, spec, interpret)


def _bwd_impl_t(factors, pts, res, g_in, spec: MXGridSpec, interpret: bool):
    """Backward from a transposed cotangent g_in [kout, n]."""
    afac, fpl, fli = res
    a, b, rp = _column_consts(spec)
    k = spec.features
    xt, n, npad = _pad_and_tile(pts, TILE)
    g_t = jnp.pad(g_in, ((0, 0), (0, npad - n)))  # [kout, npad]
    lines = _lines_of(factors)
    grid = npad // TILE

    if (FUSED_FWD and spec.plane_specs and fpl is not None
            and fpl.shape[1] == npad):
        if spec.snap_levels:
            outs = _folded_fused_backward(factors, xt, npad, afac, fpl, fli,
                                          g_t, spec, interpret)
            dlines = _unfold_dlines(outs[0], spec, lines.dtype)
        else:
            outs = _fused_backward(factors, xt, npad, afac, fpl, fli, g_t,
                                   spec, interpret)
            dlines = (outs[0].transpose(0, 2, 1)[:, : spec.total_res, :]
                      .astype(lines.dtype))
        n_lvl = len(spec.plane_specs)
        dt = lines.dtype
        return {
            "lines": dlines,
            "planes": tuple(
                outs[1 + l].reshape(3, kk, _plane_block(rv), ru)[:, :, :rv, :]
                .transpose(0, 3, 2, 1).astype(dt)
                for l, (ru, rv, kk) in enumerate(spec.plane_specs)
            ),
            "plane_lines": tuple(
                outs[1 + n_lvl + l].transpose(0, 2, 1).astype(dt)
                for l in range(n_lvl)
            ),
        }

    if spec.snap_levels:
        rf, rfp = spec.fold_res
        dw_t = pl.pallas_call(
            _folded_bwd_cp_kernel(rf, rfp),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((3, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=_const_spec((3, k, rfp)),
            out_shape=jax.ShapeDtypeStruct((3, k, rfp), jnp.float32),
            interpret=interpret,
        )(xt, afac, g_t[:k])
        dlines = _unfold_dlines(dw_t, spec, lines.dtype)
    else:
        dw_t = pl.pallas_call(
            _bwd_cp_kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((3, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                _const_spec((rp, 1)),
                _const_spec((rp, 1)),
                pl.BlockSpec((3, k, TILE), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=_const_spec((3, k, rp)),
            out_shape=jax.ShapeDtypeStruct((3, k, rp), jnp.float32),
            interpret=interpret,
        )(xt, a[:, None], b[:, None], afac, g_t[:k])
        dlines = (dw_t.transpose(0, 2, 1)[:, : spec.total_res, :]
                  .astype(lines.dtype))
    if not spec.plane_specs:
        return dlines

    # plane padding follows the saved residuals (the fused fwd pads them to
    # the CP TILE; the split fwd to PLANE_TILE — powers of two either way)
    npad_pl = fpl.shape[1]
    xt_pl = jnp.pad(pts, ((0, npad_pl - n), (0, 0))).T
    g_pl = jnp.pad(g_in[k:, :], ((0, 0), (0, npad_pl - n)))  # [kout_pl, npad]
    kout = spec.plane_out_dims
    grid_pl = npad_pl // PLANE_TILE
    tile_spec = pl.BlockSpec((kout, PLANE_TILE), lambda i: (0, i),
                             memory_space=pltpu.VMEM)
    dplane_shapes = [
        jax.ShapeDtypeStruct((3, kk * _plane_block(rv), ru), jnp.float32)
        for ru, rv, kk in spec.plane_specs
    ]
    dpline_shapes = [
        jax.ShapeDtypeStruct((3, kk, max(ru, rv)), jnp.float32)
        for ru, rv, kk in spec.plane_specs
    ]
    outs = pl.pallas_call(
        _make_bwd_planes_kernel(spec.plane_specs, spec.plane_axes),
        grid=(grid_pl,),
        in_specs=[
            pl.BlockSpec((3, PLANE_TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            tile_spec, tile_spec, tile_spec,
        ],
        out_specs=tuple(
            _const_spec(s.shape) for s in dplane_shapes + dpline_shapes
        ),
        out_shape=tuple(dplane_shapes + dpline_shapes),
        interpret=interpret,
    )(xt_pl, fpl, fli, g_pl)
    n_lvl = len(spec.plane_specs)
    dt = lines.dtype
    return {
        "lines": dlines,
        # [3, K*B, Ru] -> [3, K, B, Ru] -> drop v pad -> [3, Ru, Rv, K]
        "planes": tuple(
            outs[l].reshape(3, kk, _plane_block(rv), ru)[:, :, :rv, :]
            .transpose(0, 3, 2, 1).astype(dt)
            for l, (ru, rv, kk) in enumerate(spec.plane_specs)
        ),
        "plane_lines": tuple(
            outs[n_lvl + l].transpose(0, 2, 1).astype(dt) for l in range(n_lvl)
        ),
    }


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def encode_pallas(factors, pts, spec: MXGridSpec, interpret: bool = False):
    """[P, 3] points -> [P, n_output_dims]. Gradient flows to `factors` only
    (points get zeros — nothing in this framework differentiates sample
    positions)."""
    out, _ = _fwd_impl(factors, pts, spec, interpret)
    return out


def _vjp_fwd(factors, pts, spec, interpret):
    out, res = _fwd_impl(factors, pts, spec, interpret)
    return out, (factors, pts, res)


def _vjp_bwd(spec, interpret, saved, g):
    factors, pts, res = saved
    dw = _bwd_impl(factors, pts, res, g, spec, interpret)
    return dw, jnp.zeros_like(pts)


encode_pallas.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def encode_pallas_t(factors, pts, spec: MXGridSpec, interpret: bool = False):
    """Transposed variant: [P, 3] points -> [n_output_dims, P]. Keeping the
    output points-in-lanes lets the MLP run transposed too, so the only
    layout change in the whole field is a tiny [4, P] transpose at the end
    (instead of [kout, P] fwd + [P, kout] bwd relayouts)."""
    out, _ = _fwd_impl_t(factors, pts, spec, interpret)
    return out


def _vjp_fwd_t(factors, pts, spec, interpret):
    out, res = _fwd_impl_t(factors, pts, spec, interpret)
    return out, (factors, pts, res)


def _vjp_bwd_t(spec, interpret, saved, g):
    factors, pts, res = saved
    dw = _bwd_impl_t(factors, pts, res, g, spec, interpret)
    return dw, jnp.zeros_like(pts)


encode_pallas_t.defvjp(_vjp_fwd_t, _vjp_bwd_t)


def encode(factors, p: jax.Array, spec: MXGridSpec,
           interpret: bool = False) -> jax.Array:
    """Drop-in for mxgrid.encode with arbitrary batch shape."""
    batch_shape = p.shape[:-1]
    pts = p.reshape(-1, 3).astype(jnp.float32)
    out = encode_pallas(factors, pts, spec, interpret)
    return out.reshape(*batch_shape, spec.n_output_dims)


def encode_t(factors, p: jax.Array, spec: MXGridSpec,
             interpret: bool = False) -> jax.Array:
    """Transposed encode: [..., 3] -> [n_output_dims, P] (P = prod batch)."""
    pts = p.reshape(-1, 3).astype(jnp.float32)
    return encode_pallas_t(factors, pts, spec, interpret)
