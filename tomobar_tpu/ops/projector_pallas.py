"""Pallas TPU kernels for the parallel-beam projector pair (fast path).

Replaces the XLA-gather formulation of :mod:`tomobar_tpu.ops.projector`
with a two-pass separable operator designed for the TPU memory system,
using only constructs Mosaic executes well: 128-aligned dynamic slices,
dynamic lane rotates, and MXU matmuls — no gathers, no scatters:

  FP_a = |alpha| * Resample_a( ShearSum_a( vol ) )
  BP_a = ShearSum_a^T( Resample_a^T( sino ) )        (exact transposes)

with, per angle ``a`` (x-driven when |cos| >= |sin|; roles swapped
otherwise):

* ``ShearSum``: every image row y is shifted by ``beta*(y-cy)``
  (2-tap linear) and accumulated into a per-angle u-line — implemented as
  a per-row dynamic *lane roll* (fine shift) + 128-aligned dynamic-slice
  accumulate (coarse shift).
* ``Resample``: the u-line is sampled at detector positions
  ``alpha*t + gamma`` — implemented as a banded interpolation matrix built
  on the fly per 128-wide output tile and applied on the MXU.

For nz == 1 (2D reconstruction) the plain layout wastes 7/8 of the VPU
sublane axis, so the K1p/K4p variants pack 8 consecutive image rows onto
the sublanes: the per-row 2-tap placements become tiny one-hot matrices
applied on the MXU and the diagonal shifts one strided (FP) or
prestacked-plus-uniform (BP) lane roll — ~1.8x end-to-end on a v5e.

Why packing does NOT generalise to 2 <= nz < 8 (measured + vreg
arithmetic): packing G = 8//nz rows x nz slices per group needs D = G+1
shift diagonals per row group.  The nz = 1 win comes from D = 10
filling the 8-sublane vreg so ONE strided roll realises all diagonals
and the d-reduction is a cheap cross-sublane sum.  At nz = 4 (G = 2,
D = 3) the diagonals fragment the vreg: laid d-on-sublanes the per-z
slabs waste 5/8 sublanes, laid z-on-sublanes the d-reduction becomes
plain vector adds — both land within a few percent of the unpacked
kernel's 3 vreg-ops/row cost.  Thin slabs therefore run the plain
kernels (per-slice cost ~8/nz x the nz = 8 rate on the projector
stages); PD-TV instead pads z to a full tile (ops/pd_tv_pallas.py),
which IS a win there because its stencil work is elementwise in z.

All matmuls use a manual bf16x3 operand split (`_dot_b3` notes): Mosaic's
f32 DEFAULT silently rounds operands to bf16, which broke on-chip FP/BP
adjointness at the 1e-3 level.

The shear kernels process ``_AB``/``_AB_FP`` angles per volume pass so the
volume is streamed from HBM A/AB times instead of A times (the
HBM-bandwidth term that dominates at production sizes).

The operator semantics are "2-pass separable linear interpolation"
(kernel support 3, partition of unity) — slightly smoother than the 1-pass
Joseph XLA fallback (~1-2% on phantom data), and an exact numerical
adjoint pair (which ASTRA's FP/BP is not; cf. SURVEY.md hard-part #1).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tomobar_tpu.geometry import Geometry

__all__ = [
    "pallas_available",
    "radon_fp_pallas",
    "radon_bp_pallas",
    "radon_fp_pallas_t",
    "radon_bp_pallas_t",
]

_INTERPRET = [False]  # test hook: run the kernels in interpret mode

import os as _os

# angles per shear-kernel pass: the volume is streamed from HBM
# ceil(A/_AB) times in K1, and K4 keeps a q block plus a same-sized qd
# scratch, each (_AB, nz, LU), in VMEM — larger is less HBM traffic
# until VMEM runs out
_AB = int(_os.environ.get("TOMOBAR_TPU_AB", "16"))
# the FP shear kernel pipelines better with a larger angle block (less
# volume re-streaming), and since the K4 qd precompute moved into a VMEM
# scratch (halving the unshear working set) the BP side prefers 32 too
# (measured -4% BP at the flagship shape vs 16); the packed nz==1
# variants keep _AB — all three decouple via env knobs
_AB_FP = int(_os.environ.get("TOMOBAR_TPU_AB_FP", "32"))
_AB_BP = int(_os.environ.get("TOMOBAR_TPU_AB_BP", "32"))
# resample tiles: output tile width and the input window that covers it
# (window = tile * max|alpha| (FP) or tile / min|alpha| (BP) + taps +
# up to 128 lost to 128-alignment).  Wider tiles run fewer of the tiny
# (nz-row) MXU matmuls, amortising fill/drain.
_TT = int(_os.environ.get("TOMOBAR_TPU_TT", "128"))  # resample output tile
_TW = int(_os.environ.get("TOMOBAR_TPU_TW", "512"))  # resample input window
_UT = int(_os.environ.get("TOMOBAR_TPU_UT", "128"))  # transpose output tile
_PW = int(_os.environ.get("TOMOBAR_TPU_PW", "384"))  # transpose input window
# bytes for the (YB, nz, NXP) volume block: K4 re-fetches the q angle
# blocks once per row block, so a larger YB directly divides that traffic
# and amortises the in-kernel qd build; the K1 streamed-input side stays
# at a small block (larger regressed FP in measurement)
_YB_VMEM_BUDGET = int(
    _os.environ.get("TOMOBAR_TPU_YB_BYTES", str(2 * 1024 * 1024))
)
_YB_VMEM_BUDGET_BP = int(
    _os.environ.get("TOMOBAR_TPU_YB_BYTES_BP", str(8 * 1024 * 1024))
)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pallas_available() -> bool:
    """True when the default backend is a TPU."""
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


class _DrivenParams(NamedTuple):
    """Static per-angle-group parameters for one driven-axis group.

    alpha/beta/gamma are padded to a multiple of ``_AB`` (alpha=1, beta=0,
    gamma=0 for padding); ``A`` is the real angle count.  ``packed`` marks
    the nz==1 row-packed layout (8 image rows on the sublane axis), which
    needs 128 extra lanes of roll headroom for the per-sublane shifts.
    """

    alpha: np.ndarray  # 1/cos for x-driven (signed)
    beta: np.ndarray  # -tan
    gamma: np.ndarray  # alpha*(cor - (T-1)/2) + (nx-1)/2
    A: int
    det_x: int
    U0: int
    NXP: int
    LU: int
    packed: bool
    AB: int


def _driven_params(
    cos_v: np.ndarray,
    sin_v: np.ndarray,
    cor_v: np.ndarray,
    det_x: int,
    ny: int,
    nx: int,
    packed: bool = False,
    ab: int = _AB,
) -> _DrivenParams:
    alpha = 1.0 / cos_v
    beta = -sin_v / cos_v
    gamma = alpha * (cor_v - (det_x - 1) / 2.0) + (nx - 1) / 2.0
    A = alpha.shape[0]
    A_pad = _round_up(max(A, 1), ab)
    alpha = np.concatenate([alpha, np.ones(A_pad - A)])
    beta = np.concatenate([beta, np.zeros(A_pad - A)])
    gamma = np.concatenate([gamma, np.zeros(A_pad - A)])
    NXP = _round_up(nx + 2, 128) + 128  # row padded; roll headroom
    if packed:
        NXP += 128  # per-sublane extra shifts (<= 8 lanes past the uniform roll)
    U0 = _round_up(ny // 2 + 2, 128)
    LU = _round_up(U0 + ny // 2 + 2 + NXP, 128) + 128
    LU = _round_up(LU, max(128, _UT))  # K3 tiles LU in _UT steps
    return _DrivenParams(
        alpha.astype(np.float32),
        beta.astype(np.float32),
        gamma.astype(np.float32),
        A,
        det_x,
        U0,
        NXP,
        LU,
        packed,
        ab,
    )


def _driven_params_traced(
    cos_v: jnp.ndarray,
    sin_v: jnp.ndarray,
    cor_v: jnp.ndarray,
    det_x: int,
    ny: int,
    nx: int,
    packed: bool = False,
    ab: int = _AB,
) -> _DrivenParams:
    """Traced-data variant of :func:`_driven_params` for the sharded path:
    (cos, sin, cor) are per-shard *data* (uniform-SPMD — every device runs
    the same program on its own parameter slice), so alpha/beta/gamma are
    computed in jnp and padded with trace-time-static amounts.  All shape
    fields stay static ints."""
    cos_v = jnp.asarray(cos_v, jnp.float32)
    sin_v = jnp.asarray(sin_v, jnp.float32)
    cor_v = jnp.asarray(cor_v, jnp.float32)
    alpha = 1.0 / cos_v
    beta = -sin_v / cos_v
    gamma = alpha * (cor_v - (det_x - 1) / 2.0) + (nx - 1) / 2.0
    A = int(cos_v.shape[0])
    A_pad = _round_up(max(A, 1), ab)
    pad = A_pad - A
    alpha = jnp.concatenate([alpha, jnp.ones(pad, jnp.float32)])
    beta = jnp.concatenate([beta, jnp.zeros(pad, jnp.float32)])
    gamma = jnp.concatenate([gamma, jnp.zeros(pad, jnp.float32)])
    NXP = _round_up(nx + 2, 128) + 128
    if packed:
        NXP += 128
    U0 = _round_up(ny // 2 + 2, 128)
    LU = _round_up(U0 + ny // 2 + 2 + NXP, 128) + 128
    LU = _round_up(LU, max(128, _UT))  # K3 tiles LU in _UT steps
    return _DrivenParams(
        alpha, beta, gamma, A, det_x, U0, NXP, LU, packed, ab
    )


def fp_driven_pallas_from_data(vol, cos_v, sin_v, cor_v, det_x: int):
    """Single driven-group FP with traced per-angle parameters (sharded
    uniform-SPMD entry point; see parallel/sharding.py).  vol (nz, ny, nx)
    -> sino (nz, A, det_x)."""
    nz, ny, nx = vol.shape
    packed = nz == 1 and ny % 8 == 0
    prm = _driven_params_traced(
        cos_v, sin_v, cor_v, det_x, ny, nx, packed=packed,
        ab=_AB if packed else _AB_FP,
    )
    return _over_z(
        lambda v: _fp_driven_pallas(v, prm), (vol.astype(jnp.float32),),
        nz, prm.LU, prm.AB,
    )


def bp_driven_pallas_from_data(sino, cos_v, sin_v, cor_v, ny: int, nx: int):
    """Single driven-group BP with traced per-angle parameters (adjoint of
    :func:`fp_driven_pallas_from_data`).  sino (nz, A, det_x) -> vol."""
    nz = sino.shape[0]
    det_x = sino.shape[2]
    packed = nz == 1 and ny % 8 == 0 and ny == nx
    prm = _driven_params_traced(
        cos_v, sin_v, cor_v, det_x, ny, nx, packed=packed,
        ab=_AB if packed else _AB_BP,
    )
    return _over_z(
        lambda s: _bp_driven_pallas(s, prm, ny, nx),
        (sino.astype(jnp.float32),),
        nz,
        prm.LU,
        prm.AB,
    )


def _pick_yb(ny: int, nz: int, nxp: int, budget: int = _YB_VMEM_BUDGET) -> int:
    """Largest row block that divides ny and keeps the streamed volume
    block within the VMEM budget."""
    cap = max(1, budget // max(1, nz * nxp * 4))
    for yb in (256, 128, 64, 32, 16, 8, 4, 2):
        if yb <= cap and ny % yb == 0:
            return yb
    return 1



def _dot_b3(a, b):
    """Manual bf16x3 matmul: exact bf16 products + f32 accumulate give
    ~2^-17 relative accuracy at 3 single-pass MXU matmuls (Mosaic's f32
    DEFAULT rounds operands to bf16; HIGHEST re-splits per call and is
    ~3x slower; HIGH is not lowered)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (
        jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
        + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
        + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    )


# ---------------------------------------------------------------------------
# K1: shear-sum (FP first pass)   vol_t (ny, nz, NXP) -> s (A_pad, nz, LU)
# s[a, u] = sum_y lin-interp of row y at x = u - U0 + beta_a*(y-cy)
# ---------------------------------------------------------------------------


def _shear_fp_kernel(beta_ref, vol_ref, s_ref, *, YB, U0, NXP, NXR, ny, AB):
    ab = pl.program_id(0)
    yb = pl.program_id(1)

    @pl.when(yb == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    cy = (ny - 1) / 2.0

    def row_body(i, _):
        y = (yb * YB + i).astype(jnp.float32)
        # rows are streamed at NXR (= nx rounded to lanes) and extended to
        # the NXP roll-headroom width in-kernel: one vreg copy per row per
        # angle-block step instead of an XLA pad materialising (and then
        # streaming) the extra lanes from HBM
        row = jnp.pad(vol_ref[i], ((0, 0), (0, NXP - NXR)))  # (nz, NXP)
        # row_d precomputed once per row: g = row + f*row_d (one FMA/angle)
        row_d = pltpu.roll(row, NXP - 1, 1) - row  # row[j+1] - row[j]

        def ang_body(ia, _):
            beta = beta_ref[ab * AB + ia]
            shift = beta * (y - cy)
            kf = jnp.floor(shift)
            f = shift - kf
            o = U0 - kf.astype(jnp.int32)
            # window based on o-1 (like the transpose kernel) so the
            # wrapped g[NXP-1] = f*row[0] tap (the j = -1 interp tap)
            # lands at s[o-1] even when (o mod 128) == 0
            o1 = o - 1
            o1_hi = o1 // 128
            o1_lo = o1 - o1_hi * 128
            g = row + f * row_d
            g = pltpu.roll(g, o1_lo + 1, 1)
            off = pl.multiple_of(o1_hi * 128, 128)
            s_ref[ia, :, pl.ds(off, NXP)] += g
            return 0

        jax.lax.fori_loop(0, AB, ang_body, 0, unroll=AB)
        return 0

    jax.lax.fori_loop(0, YB, row_body, 0)


# ---------------------------------------------------------------------------
# K1p: row-packed shear-sum for nz == 1 (the 2D case).  The plain kernel
# puts z on the sublane axis, so a single slice uses 1/8 of the VPU; here
# 8 consecutive image rows ride the sublanes instead.  Per-row shifts
# differ by at most ceil(7*|beta|) + 1 <= 8 lanes within a group, so the
# whole per-row 2-tap placement is folded into a tiny one-hot weight
# matrix W (10, 8): H = W @ rows puts each row's two interpolation taps on
# the diagonal band d = {e_r, e_r + 1}, one *strided* lane roll (shift
# o1_lo + d per sublane d) realises all ten diagonal shifts at once, and a
# sublane reduction yields the accumulated u-line.  MXU does the
# interp/one-hot work; no per-sublane selects (measured 5x slower).
# ---------------------------------------------------------------------------


def _shear_fp_packed_kernel(
    beta_ref, vol_ref, s_ref, *, YBG, U0, NXP, NXR, ny, AB
):
    ab = pl.program_id(0)
    yb = pl.program_id(1)

    @pl.when(yb == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    cy = (ny - 1) / 2.0
    r_row = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1).astype(jnp.float32)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (10, 8), 0)

    def grp_body(i, _):
        y0 = ((yb * YBG + i) * 8).astype(jnp.float32)
        # 8 consecutive image rows, extended in-kernel (see K1 note)
        rows = jnp.pad(vol_ref[i], ((0, 0), (0, NXP - NXR)))  # (8, NXP)
        # bf16x3 operand split hoisted out of the angle loop (see _dot_b3)
        r_hi = rows.astype(jnp.bfloat16)
        r_lo = (rows - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def ang_body(ia, _):
            beta = beta_ref[ab * AB + ia]
            # o_r = U0 - floor(beta*(y0+r-cy)) is monotone in r: the max
            # floor (= min o) is at one of the two ends
            kf_hi = jnp.maximum(
                jnp.floor(beta * (y0 - cy)),
                jnp.floor(beta * (y0 + 7.0 - cy)),
            )
            shift = beta * (y0 + r_row - cy)  # (1, 8)
            kf = jnp.floor(shift)
            f = shift - kf
            e = (kf_hi - kf).astype(jnp.int32)  # (1, 8) in [0, 8]
            o1 = U0 - kf_hi.astype(jnp.int32) - 1
            o1_hi = o1 // 128
            o1_lo = o1 - o1_hi * 128
            # W[d, r]: (1-f_r) at d = e_r+1, f_r at d = e_r, so that
            # s[o_r + j] += (1-f_r) row[r, j] and s[o_r - 1 + j] += f_r ...
            w = jnp.where(d_ids == e + 1, 1.0 - f, 0.0) + jnp.where(
                d_ids == e, f, 0.0
            )
            w_hi = w.astype(jnp.bfloat16)
            w_lo = (w - w_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            h = (
                jnp.dot(w_hi, r_hi, preferred_element_type=jnp.float32)
                + jnp.dot(w_hi, r_lo, preferred_element_type=jnp.float32)
                + jnp.dot(w_lo, r_hi, preferred_element_type=jnp.float32)
            )  # (10, NXP)
            # sublane d rolled by o1_lo + d: all diagonal shifts at once
            h = pltpu.roll(h, o1_lo, 1, stride=1, stride_axis=0)
            line = jnp.sum(h, axis=0, keepdims=True)  # (1, NXP)
            off = pl.multiple_of(o1_hi * 128, 128)
            s_ref[ia, :, pl.ds(off, NXP)] += line
            return 0

        jax.lax.fori_loop(0, AB, ang_body, 0, unroll=AB)
        return 0

    jax.lax.fori_loop(0, YBG, grp_body, 0)


# ---------------------------------------------------------------------------
# K2: resample (FP second pass)   s (A_pad, nz, LU) -> p (A_pad, nz, TP)
# p[t] = |alpha| * sum_u s[u] * hat(U0 + alpha*t + gamma - u)
# ---------------------------------------------------------------------------


def _resample_fp_kernel(alpha_ref, gamma_ref, s_ref, p_ref, *, U0, LU, det_x, TP):
    a = pl.program_id(0)
    alpha = alpha_ref[a]
    gamma = gamma_ref[a]
    # iotas hoisted out of the tile loop (shared by every tile)
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (_TW, _TT), 1).astype(jnp.float32)
    w_ids = jax.lax.broadcasted_iota(jnp.int32, (_TW, _TT), 0).astype(jnp.float32)
    abs_alpha = jnp.abs(alpha)

    def tile_body(tt, _):
        t0 = (tt * _TT).astype(jnp.float32)
        # window start: cover [min pos, max pos] over the tile
        pos_lo = U0 + gamma + jnp.minimum(alpha * t0, alpha * (t0 + _TT - 1))
        u0 = jnp.floor(pos_lo).astype(jnp.int32) - 2
        u0 = jnp.clip(u0, 0, LU - _TW)
        u0 = (u0 // 128) * 128
        u0 = pl.multiple_of(u0, 128)

        win = s_ref[0, :, pl.ds(u0, _TW)]  # (nz, TW); block pre-sliced to a
        # banded interp matrix M[w, t] = |alpha| * hat(pos_t - (u0 + w))
        pos = U0 + gamma + alpha * (t0 + t_ids)
        m = jnp.maximum(
            0.0, 1.0 - jnp.abs(pos - (u0.astype(jnp.float32) + w_ids))
        )
        m = m * abs_alpha
        p_ref[0, :, pl.ds(tt * _TT, _TT)] = _dot_b3(win, m)
        return 0

    jax.lax.fori_loop(0, TP // _TT, tile_body, 0)


# ---------------------------------------------------------------------------
# K3: resample transpose (BP first pass)  p (A_pad, nz, TP) -> q (A_pad, nz, LU)
# q[u] = |alpha| * sum_t p[t] * hat(U0 + alpha*t + gamma - u)
# ---------------------------------------------------------------------------


def _resample_bp_kernel(alpha_ref, gamma_ref, p_ref, q_ref, *, U0, TP, det_x, LU):
    a = pl.program_id(0)
    alpha = alpha_ref[a]
    gamma = gamma_ref[a]
    t_ids = jax.lax.broadcasted_iota(jnp.int32, (_PW, _UT), 0).astype(jnp.float32)
    u_ids = jax.lax.broadcasted_iota(jnp.int32, (_PW, _UT), 1).astype(jnp.float32)
    abs_alpha = jnp.abs(alpha)
    # live u-range of this angle: q[u] != 0 only where some detector
    # sample position U0 + gamma + alpha*t (t in [0, det_x)) is within a
    # hat-tap of u.  Tiles wholly outside are zero-filled and the banded
    # matmul skipped — the worst-case LU covers |beta| = 1, so shallow
    # angles pay for ~(ny - |beta|*ny) dead lanes otherwise.
    e0 = U0 + gamma
    e1 = U0 + gamma + alpha * (det_x - 1.0)
    u_lo = jnp.minimum(e0, e1) - 2.0
    u_hi = jnp.maximum(e0, e1) + 2.0

    def tile_body(ut, _):
        u0 = (ut * _UT).astype(jnp.float32)
        live = (u0 + _UT > u_lo) & (u0 < u_hi)

        @pl.when(~live)
        def _():
            q_ref[0, :, pl.ds(ut * _UT, _UT)] = jnp.zeros(
                (p_ref.shape[1], _UT), jnp.float32
            )

        @pl.when(live)
        def _():
            _tile_live(ut, u0)
        return 0

    def _tile_live(ut, u0):
        # contributing t range: t = (u - U0 - gamma) / alpha over the tile
        tc0 = (u0 - U0 - gamma) / alpha
        tc1 = (u0 + _UT - 1 - U0 - gamma) / alpha
        t_lo = jnp.floor(jnp.minimum(tc0, tc1)).astype(jnp.int32) - 2
        t_lo = jnp.clip(t_lo, 0, TP - _PW)
        t_lo = (t_lo // 128) * 128
        t_lo = pl.multiple_of(t_lo, 128)

        win = p_ref[0, :, pl.ds(t_lo, _PW)]  # (nz, PW); block pre-sliced to a
        pos = U0 + gamma + alpha * (t_lo.astype(jnp.float32) + t_ids)
        m = jnp.maximum(0.0, 1.0 - jnp.abs(pos - (u0 + u_ids)))
        # zero padded-detector region beyond det_x (p is padded to TP lanes)
        valid = (t_lo.astype(jnp.float32) + t_ids) < det_x
        m = jnp.where(valid, m, 0.0) * abs_alpha
        q_ref[0, :, pl.ds(ut * _UT, _UT)] = _dot_b3(win, m)

    jax.lax.fori_loop(0, LU // _UT, tile_body, 0)


# ---------------------------------------------------------------------------
# K4: shear-sum transpose (BP second pass)
# q (A_pad, nz, LU) -> vol_t (ny, nz, NXP)
# vol_row_y[j] = sum_a (1-f)*q[a, o+j] + f*q[a, o+j-1]
# ---------------------------------------------------------------------------


def _unshear_bp_kernel(
    beta_ref, q_ref, vol_ref, qd_ref, *, YB, U0, NXP, NXR, ny, AB
):
    """One dynamic roll per (row, angle):
    (1-f)*q[o+j] + f*q[o+j-1] == q[o+j] - f*d[o+j]  with d[u] = q[u]-q[u-1].
    ``d`` is computed once per (row-block, angle-block) grid step into a
    VMEM scratch (``qd_ref``): a per-(row, angle) roll would cost as much
    as everything else combined, but one static roll per q block amortises
    over YB rows (2*LU/(3*NXP*YB) of the row-loop work, ~2% at YB=64) and
    removes the HBM-streamed qd operand entirely — halving the kernel's
    VMEM working set (z-chunks double) and the q-side HBM traffic."""
    yb = pl.program_id(0)
    ab = pl.program_id(1)

    @pl.when(ab == 0)
    def _():
        vol_ref[...] = jnp.zeros_like(vol_ref)

    q_blk = q_ref[...]
    qd_ref[...] = q_blk - pltpu.roll(q_blk, 1, 2)

    cy = (ny - 1) / 2.0

    def row_body(i, _):
        y = (yb * YB + i).astype(jnp.float32)

        def ang_body(ia, acc):
            beta = beta_ref[ab * AB + ia]
            shift = beta * (y - cy)
            kf = jnp.floor(shift)
            f = shift - kf
            o = U0 - kf.astype(jnp.int32)
            # window based on o-1 so the roll never wraps live data even
            # when (o mod 128) == 0
            o1 = o - 1
            o1_hi = o1 // 128
            o1_lo = o1 - o1_hi * 128
            off = pl.multiple_of(o1_hi * 128, 128)
            win = q_ref[ia, :, pl.ds(off, NXP)]  # (nz, NXP)
            dwin = qd_ref[ia, :, pl.ds(off, NXP)]
            g = win - f * dwin
            return acc + pltpu.roll(g, NXP - o1_lo - 1, 1)  # g[j+o1_lo+1]

        acc = jax.lax.fori_loop(
            0, AB, ang_body,
            jnp.zeros((q_ref.shape[1], NXP), jnp.float32), unroll=AB,
        )
        # the output block is NXR (= nx rounded to lanes) wide: the
        # NXP-NXR roll-headroom lanes are dead weight downstream, and
        # writing them would force an XLA slice copy after the kernel
        vol_ref[i] += acc[:, :NXR]
        return 0

    jax.lax.fori_loop(0, YB, row_body, 0)


# ---------------------------------------------------------------------------
# K4p: row-packed unshear (BP second pass) for nz == 1.  Exact transpose of
# K1p: the shared q window is broadcast to 10 sublanes, one strided roll
# produces the ten left-shifted diagonal reads G2[d''] = q[o1 + 9 - d'' + .]
# (d'' reversed so the strided shift stays non-negative/increasing), and a
# tiny (8, 10) one-hot matrix applies each row's two interpolation taps on
# the MXU.  No qd precompute is needed — the fractional blend lives in M.
#
# BP needs *left* shifts (large right-roll amounts), where the TPU strided
# rotate mis-sources lanes near source-vreg boundaries (measured on v5e;
# the FP direction, base < 128, is exact).  So the ten d-shifted reads are
# prestacked in XLA — qS[a, d] = roll(q[a], d) — and the kernel applies
# only a plain uniform dynamic roll, which is exact.  The output rows land
# at lane offset _BP_OUT_OFF so live lanes stay in the non-wrapped region;
# the kernel slices [_BP_OUT_OFF, _BP_OUT_OFF + NXR) out of the matmul
# result so the output block carries only live lanes.
# ---------------------------------------------------------------------------

_BP_OUT_OFF = 256


def _unshear_bp_packed_kernel(
    beta_ref, qs_ref, vol_ref, *, YBG, U0, NXP, NXR, ny, AB
):
    yb = pl.program_id(0)
    ab = pl.program_id(1)

    @pl.when(ab == 0)
    def _():
        vol_ref[...] = jnp.zeros_like(vol_ref)

    cy = (ny - 1) / 2.0
    r_col = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0).astype(jnp.float32)
    d_ids = jax.lax.broadcasted_iota(jnp.int32, (8, 16), 1)

    def grp_body(i, _):
        y0 = ((yb * YBG + i) * 8).astype(jnp.float32)

        # batch all _AB angles into one matmul triple: the contraction
        # runs over (angle, d) jointly — G stacks the uniformly-rolled
        # bf16 hi/lo window blocks, M the per-angle tap weights.  Manual
        # bf16x3 (hi*hi + hi*lo + lo*hi with exact bf16 products and f32
        # accumulate) keeps ~2^-17 accuracy at 3 single-pass matmuls.
        gh, gl, mh, ml = [], [], [], []
        for ia in range(AB):
            beta = beta_ref[ab * AB + ia]
            kf_hi = jnp.maximum(
                jnp.floor(beta * (y0 - cy)),
                jnp.floor(beta * (y0 + 7.0 - cy)),
            )
            shift = beta * (y0 + r_col - cy)  # (8, 1)
            kf = jnp.floor(shift)
            f = shift - kf
            e = (kf_hi - kf).astype(jnp.int32)  # (8, 1) in [0, 8]
            o1 = U0 - kf_hi.astype(jnp.int32) - 1
            o1_hi = o1 // 128
            o1_lo = o1 - o1_hi * 128
            off = pl.multiple_of(o1_hi * 128, 128)
            # uniform plain roll: out lane _BP_OUT_OFF + j of sublane d
            # holds qS[d][off + j + o1_lo + 9] = q[o1 + 9 - d + j].
            # Dynamic rotate is 32-bit only, so roll f32 then hi/lo split.
            g = pltpu.roll(
                qs_ref[ia, :, pl.ds(off, NXP)], _BP_OUT_OFF - o1_lo - 9, 1
            )
            g_hi = g.astype(jnp.bfloat16)
            gh.append(g_hi)
            gl.append((g - g_hi.astype(jnp.float32)).astype(jnp.bfloat16))
            # M[r, d]: (1-f_r) at d = 8 - e_r (reads q[o_r + j]) and
            # f_r at d = 9 - e_r (reads q[o_r - 1 + j]) — transpose of W
            m = jnp.where(d_ids == 8 - e, 1.0 - f, 0.0) + jnp.where(
                d_ids == 9 - e, f, 0.0
            )
            m_hi = m.astype(jnp.bfloat16)
            mh.append(m_hi)
            ml.append((m - m_hi.astype(jnp.float32)).astype(jnp.bfloat16))
        m_hi = jnp.concatenate(mh, axis=1)  # (8, 16*_AB)
        m_lo = jnp.concatenate(ml, axis=1)
        g_hi = jnp.concatenate(gh, axis=0)  # (16*_AB, NXP)
        g_lo = jnp.concatenate(gl, axis=0)
        out = (
            jnp.dot(m_hi, g_hi, preferred_element_type=jnp.float32)
            + jnp.dot(m_hi, g_lo, preferred_element_type=jnp.float32)
            + jnp.dot(m_lo, g_hi, preferred_element_type=jnp.float32)
        )
        # live output lanes start at _BP_OUT_OFF (see module notes);
        # write only the NXR useful lanes so no XLA slice copy follows
        vol_ref[i] += out[:, _BP_OUT_OFF : _BP_OUT_OFF + NXR]
        return 0

    jax.lax.fori_loop(0, YBG, grp_body, 0)


# ---------------------------------------------------------------------------
# host-side drivers
# ---------------------------------------------------------------------------


def _fp_shear_stage(vol_t: jnp.ndarray, prm: _DrivenParams) -> jnp.ndarray:
    """K1/K1p: shear-sum.  vol_t (ny, nz, NXR) -> s (A_pad, nz, LU).
    NXR is the lane-rounded row width; the kernels extend rows to the NXP
    roll-headroom width in VMEM (see K1 note)."""
    ny, nz, NXR = vol_t.shape
    A_pad = prm.alpha.shape[0]
    YB = _pick_yb(ny, nz, prm.NXP)
    beta = jnp.asarray(prm.beta)

    if prm.packed:
        ny_g = ny // 8
        YBG = _pick_yb(ny_g, 8, prm.NXP)
        vol_g = vol_t.reshape(ny_g, 8, NXR)
        s = pl.pallas_call(
            partial(
                _shear_fp_packed_kernel, YBG=YBG, U0=prm.U0, NXP=prm.NXP,
                NXR=NXR, ny=ny, AB=prm.AB,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(A_pad // prm.AB, ny_g // YBG),
                in_specs=[
                    pl.BlockSpec(
                        (YBG, 8, NXR), lambda ab, yb, *_: (yb, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (prm.AB, nz, prm.LU), lambda ab, yb, *_: (ab, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((A_pad, nz, prm.LU), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_INTERPRET[0],
        )(beta, vol_g)
    else:
        s = pl.pallas_call(
            partial(
                _shear_fp_kernel, YB=YB, U0=prm.U0, NXP=prm.NXP, NXR=NXR,
                ny=ny, AB=prm.AB,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(A_pad // prm.AB, ny // YB),
                in_specs=[
                    pl.BlockSpec(
                        (YB, nz, NXR), lambda ab, yb, *_: (yb, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (prm.AB, nz, prm.LU), lambda ab, yb, *_: (ab, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((A_pad, nz, prm.LU), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_INTERPRET[0],
        )(beta, vol_t)
    return s


def _fp_resample_stage(s: jnp.ndarray, prm: _DrivenParams) -> jnp.ndarray:
    """K2: resample.  s (A_pad, nz, LU) -> p (A_pad, nz, TP)."""
    A_pad, nz, _ = s.shape
    TP = _round_up(prm.det_x, _TT)
    alpha = jnp.asarray(prm.alpha)
    gamma = jnp.asarray(prm.gamma)
    p = pl.pallas_call(
        partial(
            _resample_fp_kernel, U0=prm.U0, LU=prm.LU, det_x=prm.det_x, TP=TP
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A_pad,),
            in_specs=[
                pl.BlockSpec(
                    (1, nz, prm.LU), lambda a, *_: (a, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, nz, TP), lambda a, *_: (a, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((A_pad, nz, TP), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET[0],
    )(alpha, gamma, s)
    return p


def _fp_driven_pallas_t(vol_t: jnp.ndarray, prm: _DrivenParams) -> jnp.ndarray:
    """t-layout core: vol_t (ny, nz, nx) -> p (A, nz, det_x) for one driven
    group.  Both ends are the kernels' native layouts, so no volume or
    sinogram transposes happen here at all."""
    ny, nz, nx = vol_t.shape
    NXR = _round_up(nx, 128)
    if NXR != nx:
        vol_t = jnp.pad(vol_t, ((0, 0), (0, 0), (0, NXR - nx)))
    s = _fp_shear_stage(vol_t, prm)
    p = _fp_resample_stage(s, prm)
    return p[: prm.A, :, : prm.det_x]


def _fp_driven_pallas(vol: jnp.ndarray, prm: _DrivenParams) -> jnp.ndarray:
    """vol (nz, ny, nx) -> sino (nz, A, det_x) for one driven group."""
    p = _fp_driven_pallas_t(jnp.swapaxes(vol, 0, 1), prm)
    return jnp.swapaxes(p, 0, 1)  # (nz, A, det_x)


def _bp_resample_stage(p: jnp.ndarray, prm: _DrivenParams) -> jnp.ndarray:
    """K3: resample transpose.  p (A_pad, nz, TP) -> q (A_pad, nz, LU)."""
    A_pad, nz, TP = p.shape
    alpha = jnp.asarray(prm.alpha)
    gamma = jnp.asarray(prm.gamma)
    return pl.pallas_call(
        partial(
            _resample_bp_kernel, U0=prm.U0, TP=TP, det_x=prm.det_x, LU=prm.LU
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(A_pad,),
            in_specs=[
                pl.BlockSpec(
                    (1, nz, TP), lambda a, *_: (a, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            ],
            out_specs=pl.BlockSpec(
                (1, nz, prm.LU), lambda a, *_: (a, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((A_pad, nz, prm.LU), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET[0],
    )(alpha, gamma, p)


def _bp_unshear_stage(
    q: jnp.ndarray, prm: _DrivenParams, ny: int, nx: int
) -> jnp.ndarray:
    """K4/K4p: shear-sum transpose.  q (A_pad, nz, LU) -> vol_t
    (ny, nz, NXR) with NXR = nx rounded up to a lane multiple (the kernels
    write only the live output lanes, so no post-kernel slice copy)."""
    A_pad, nz, _ = q.shape
    YB = _pick_yb(ny, nz, prm.NXP, _YB_VMEM_BUDGET_BP)
    NXR = _round_up(nx, 128)
    beta = jnp.asarray(prm.beta)

    if prm.packed:
        ny_g = ny // 8
        YBG = _pick_yb(ny_g, 8, prm.NXP)
        # ten statically d-shifted copies of each q line (see K4p notes),
        # padded to 16 sublanes so the in-kernel angle-stacked blocks stay
        # tile aligned; the kernel then needs only one uniform dynamic
        # roll per angle
        qs = jnp.stack(
            [
                jnp.roll(q[:, 0, :], d, axis=-1) if d < 10
                else jnp.zeros_like(q[:, 0, :])
                for d in range(16)
            ],
            axis=1,
        )  # (A_pad, 16, LU)
        vol_g = pl.pallas_call(
            partial(
                _unshear_bp_packed_kernel, YBG=YBG, U0=prm.U0, NXP=prm.NXP,
                NXR=NXR, ny=ny, AB=prm.AB,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ny_g // YBG, A_pad // prm.AB),
                in_specs=[
                    pl.BlockSpec(
                        (prm.AB, 16, prm.LU), lambda yb, ab, *_: (ab, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (YBG, 8, NXR), lambda yb, ab, *_: (yb, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((ny_g, 8, NXR), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_INTERPRET[0],
        )(beta, qs)
        return vol_g.reshape(ny, nz, NXR)

    # backward-difference lines d[u] = q[u] - q[u-1] are built in-kernel
    # (VMEM scratch, one static roll per grid step — see kernel notes).
    # The u = 0 wrap is harmless: windows never start at 0 (U0 headroom).
    return pl.pallas_call(
        partial(
            _unshear_bp_kernel, YB=YB, U0=prm.U0, NXP=prm.NXP, NXR=NXR,
            ny=ny, AB=prm.AB,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ny // YB, A_pad // prm.AB),
            in_specs=[
                pl.BlockSpec(
                    (prm.AB, nz, prm.LU), lambda yb, ab, *_: (ab, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (YB, nz, NXR), lambda yb, ab, *_: (yb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((prm.AB, nz, prm.LU), jnp.float32)
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ny, nz, NXR), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_INTERPRET[0],
    )(beta, q)


def _bp_driven_pallas_t(
    p: jnp.ndarray, prm: _DrivenParams, ny: int, nx: int
) -> jnp.ndarray:
    """t-layout core: p (A, nz, det_x) -> vol_t (ny, nz, nx) for one driven
    group (native layouts at both ends; see :func:`_fp_driven_pallas_t`)."""
    A_pad = prm.alpha.shape[0]
    TP = _round_up(prm.det_x, 128) + _PW  # padded detector lanes
    p = jnp.pad(
        p, ((0, A_pad - prm.A), (0, 0), (0, TP - prm.det_x))
    )  # zero rows for padded angles -> q rows are zero -> no BP contribution
    q = _bp_resample_stage(p, prm)
    vol_t = _bp_unshear_stage(q, prm, ny, nx)
    NXR = vol_t.shape[2]
    return vol_t[:, :, :nx] if NXR != nx else vol_t


def _bp_driven_pallas(sino: jnp.ndarray, prm: _DrivenParams, ny: int, nx: int):
    """sino (nz, A, det_x) -> vol (nz, ny, nx) for one driven group."""
    vol_t = _bp_driven_pallas_t(jnp.swapaxes(sino, 0, 1), prm, ny, nx)
    return jnp.swapaxes(vol_t, 0, 1)  # (nz, ny, nx)


def _partition(angles: np.ndarray):
    from tomobar_tpu.ops.projector import _angle_partition

    idx_x, idx_y = _angle_partition(angles)
    return np.cos(angles), np.sin(angles), idx_x, idx_y


# cap on the per-kernel z extent: the s/q blocks are (_AB, nz, LU) floats
# and must stay well inside VMEM alongside the volume block and pipeline
# double-buffers.  ~6 MB for the angle block keeps the whole working set
# under half of VMEM at production LU sizes.
_Z_BLOCK_BYTES = 6 * 1024 * 1024


def _z_chunk(nz: int, lu: int, ab: int = _AB) -> int:
    cap = max(1, _Z_BLOCK_BYTES // (ab * lu * 4))
    if cap >= 8:
        # z rides the sublane axis inside the kernels: snap chunks to
        # whole 8-sublane tiles so no chunk pads 8-k dead sublanes
        cap = (cap // 8) * 8
    return min(nz, cap)


def _over_z(fn, arrs, nz: int, lu: int, ab: int = _AB, axis: int = 0):
    """Apply fn to z-chunks of the given arrays (along ``axis``) and
    concatenate.  Static Python loop: chunk count is a trace-time
    constant.  ``axis`` is 0 for canonical (nz, ...) arrays and 1 for
    t-layout (rows/angles, nz, ...) arrays."""
    zc = _z_chunk(nz, lu, ab)
    if zc >= nz:
        return fn(*arrs)

    def take(a, z0, z1):
        if axis == 0:
            return a[z0:z1]
        return a[:, z0:z1]

    outs = []
    for z0 in range(0, nz, zc):
        outs.append(fn(*(take(a, z0, min(z0 + zc, nz)) for a in arrs)))
    return jnp.concatenate(outs, axis=axis)


def radon_fp_pallas(vol: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    """Pallas forward projector; drop-in for
    :func:`tomobar_tpu.ops.projector.radon_fp` (two-pass semantics)."""
    squeeze = vol.ndim == 2
    if squeeze:
        vol = vol[None]
    vol = vol.astype(jnp.float32)
    nz, ny, nx = vol.shape
    det_x = geom.detectors_x_total
    cor = geom.cor_horizontal
    cos_v, sin_v, idx_x, idx_y = _partition(geom.angles)

    out = jnp.zeros((nz, geom.n_angles, det_x), dtype=jnp.float32)
    if idx_x.size:
        prm = _driven_params(
            cos_v[idx_x], sin_v[idx_x], cor[idx_x], det_x, ny, nx,
            packed=(nz == 1 and ny % 8 == 0),
            ab=_AB if (nz == 1 and ny % 8 == 0) else _AB_FP,
        )
        px = _over_z(
            lambda v: _fp_driven_pallas(v, prm), (vol,), nz, prm.LU, prm.AB
        )
        out = out.at[:, idx_x, :].set(px)
    if idx_y.size:
        prm = _driven_params(
            sin_v[idx_y], cos_v[idx_y], cor[idx_y], det_x, nx, ny,
            packed=(nz == 1 and nx % 8 == 0),
            ab=_AB if (nz == 1 and nx % 8 == 0) else _AB_FP,
        )
        py = _over_z(
            lambda v: _fp_driven_pallas(v, prm),
            (vol.swapaxes(1, 2),),
            nz,
            prm.LU,
            prm.AB,
        )
        out = out.at[:, idx_y, :].set(py)
    return out[0] if squeeze else out


def radon_bp_pallas(sino: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    """Pallas back projector (exact adjoint of :func:`radon_fp_pallas`)."""
    squeeze = sino.ndim == 2
    if squeeze:
        sino = sino[None]
    sino = sino.astype(jnp.float32)
    nz = sino.shape[0]
    n = geom.recon_size
    det_x = geom.detectors_x_total
    cor = geom.cor_horizontal
    cos_v, sin_v, idx_x, idx_y = _partition(geom.angles)

    vol = jnp.zeros((nz, n, n), dtype=jnp.float32)
    packed = nz == 1 and n % 8 == 0
    if idx_x.size:
        prm = _driven_params(
            cos_v[idx_x], sin_v[idx_x], cor[idx_x], det_x, n, n,
            packed=packed, ab=_AB if packed else _AB_BP,
        )
        vol = vol + _over_z(
            lambda s: _bp_driven_pallas(s, prm, n, n),
            (sino[:, idx_x, :],),
            nz,
            prm.LU,
            prm.AB,
        )
    if idx_y.size:
        prm = _driven_params(
            sin_v[idx_y], cos_v[idx_y], cor[idx_y], det_x, n, n,
            packed=packed, ab=_AB if packed else _AB_BP,
        )
        vol = vol + _over_z(
            lambda s: _bp_driven_pallas(s, prm, n, n),
            (sino[:, idx_y, :],),
            nz,
            prm.LU,
            prm.AB,
        ).swapaxes(1, 2)
    return vol[0] if squeeze else vol

# ---------------------------------------------------------------------------
# t-layout entry points: volumes as (ny, nz, nx), sinograms as
# (angles, nz, det_x) — the layouts the kernels natively produce/consume.
# Running solver state in these layouts removes the per-call volume
# transposes of the canonical API (trace-audited ~5 ms per FP+BP pair at
# 1801x8x2560 on v5e); only the y-driven group still pays one transpose,
# which is intrinsic (its driven axis is x).
# ---------------------------------------------------------------------------


def radon_fp_pallas_t(vol_t: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    """Forward projector on t-layout state: vol_t (ny, nz, nx) ->
    sino_t (n_angles, nz, det_x).  Numerically identical to
    ``swapaxes(radon_fp_pallas(swapaxes(vol_t, 0, 1), geom), 0, 1)``."""
    ny, nz, nx = vol_t.shape
    vol_t = vol_t.astype(jnp.float32)
    det_x = geom.detectors_x_total
    cor = geom.cor_horizontal
    cos_v, sin_v, idx_x, idx_y = _partition(geom.angles)

    out = jnp.zeros((geom.n_angles, nz, det_x), dtype=jnp.float32)
    if idx_x.size:
        packed = nz == 1 and ny % 8 == 0
        prm = _driven_params(
            cos_v[idx_x], sin_v[idx_x], cor[idx_x], det_x, ny, nx,
            packed=packed, ab=_AB if packed else _AB_FP,
        )
        px = _over_z(
            lambda v: _fp_driven_pallas_t(v, prm), (vol_t,),
            nz, prm.LU, prm.AB, axis=1,
        )
        out = out.at[idx_x].set(px)
    if idx_y.size:
        packed = nz == 1 and nx % 8 == 0
        prm = _driven_params(
            sin_v[idx_y], cos_v[idx_y], cor[idx_y], det_x, nx, ny,
            packed=packed, ab=_AB if packed else _AB_FP,
        )
        py = _over_z(
            lambda v: _fp_driven_pallas_t(v, prm),
            (jnp.transpose(vol_t, (2, 1, 0)),),
            nz, prm.LU, prm.AB, axis=1,
        )
        out = out.at[idx_y].set(py)
    return out


def radon_bp_pallas_t(sino_t: jnp.ndarray, geom: Geometry) -> jnp.ndarray:
    """Back projector on t-layout state: sino_t (n_angles, nz, det_x) ->
    vol_t (ny, nz, nx); exact adjoint of :func:`radon_fp_pallas_t`."""
    A, nz, _ = sino_t.shape
    sino_t = sino_t.astype(jnp.float32)
    n = geom.recon_size
    det_x = geom.detectors_x_total
    cor = geom.cor_horizontal
    cos_v, sin_v, idx_x, idx_y = _partition(geom.angles)
    packed = nz == 1 and n % 8 == 0

    vol_t = None
    if idx_x.size:
        prm = _driven_params(
            cos_v[idx_x], sin_v[idx_x], cor[idx_x], det_x, n, n,
            packed=packed, ab=_AB if packed else _AB_BP,
        )
        vol_t = _over_z(
            lambda s: _bp_driven_pallas_t(s, prm, n, n), (sino_t[idx_x],),
            nz, prm.LU, prm.AB, axis=1,
        )
    if idx_y.size:
        prm = _driven_params(
            sin_v[idx_y], cos_v[idx_y], cor[idx_y], det_x, n, n,
            packed=packed, ab=_AB if packed else _AB_BP,
        )
        vy = _over_z(
            lambda s: _bp_driven_pallas_t(s, prm, n, n), (sino_t[idx_y],),
            nz, prm.LU, prm.AB, axis=1,
        )
        vy = jnp.transpose(vy, (2, 1, 0))
        vol_t = vy if vol_t is None else vol_t + vy
    if vol_t is None:
        vol_t = jnp.zeros((n, nz, n), dtype=jnp.float32)
    return vol_t
