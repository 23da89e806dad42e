"""Pallas TPU fast path for the USFFT frequency-domain gridding.

TPU-native re-design of the reference's hardest kernel family
(``tomobar/cuda_kernels/fft_us_kernels.cu:105-527``: ``gather_kernel``,
``gather_kernel_center``, ``gather_kernel_center_angle_based_prune``).
The CUDA code scatters each polar sample into a (2m+1)^2 neighbourhood
with atomics, plus a gather-formulated centre kernel with a
binary-searched per-point angle-range table to bound the work.  None of
that maps to a TPU.  This kernel reformulates the *exact* same gridding
sum as banded MXU matmuls:

For one projection angle ``theta`` the polar samples lie on a straight
line through the grid centre, so for a 128-row block of the output grid
the contributing sample window ``[r0, r0+RW)`` and the touched column
window ``[c0, c0+CW)`` are small and *analytically computable from
scalars* (the TPU translation of the reference's angle-range pruning —
but static, no search).  The separable Gaussian kernel
``w = coeff0 * exp(cc*(l1-Ry)^2) * exp(cc*(l0-Cx)^2)`` factors the
block's contribution into

    out[l1, l0] += (A * g)[l1, r] @ W0[r, l0]

with ``A[l1, r] = coeff0*K1`` (row-side weights), ``W0[r, l0] = K0``
(column-side weights), both built on the fly from iotas.  The Gaussian's
tails at the reference's tap cutoff are ~4e-9 of the peak, so no tap
mask is applied (underflow does the truncation) and the result matches
the XLA scatter oracle (:func:`tomobar_tpu.ops.usfft.usfft_grid`) to
float rounding.

Angles are partitioned by driven axis exactly like the projector: lines
with ``|sin| >= |cos|`` cross grid rows steeply (small per-row sample
windows) and are gridded directly; the rest are gridded into a
*transposed* grid by the same kernel with sin/cos roles swapped, then
transposed back and added.  Wrap-around indexing (the reference's
``mod(ell+n, 2n)``) becomes 128/256-lane margins folded back in XLA.

r5 schedule (89 -> ~49 ms at 1801x8x2560 on v5e; ablation-driven — see
tools/grid_tune.py):

* **Angle stacking** (``_grid_kernel_astack``, the default): all _ACH=8
  sorted-adjacent chunk angles ride the contraction dim of ONE matmul
  per pair-channel (k = 8*128), amortising MXU fill/drain and the
  accumulate count 8x over one-dot-per-angle.
* **Dynamic column-window tiers**: each visit runs at the narrowest
  width of ``_CW_TIERS`` that covers its true span (|c/s|*(RB+2m+2) +
  taps + 128-alignment slack + the chunk's angular spread) — the matmul
  column count is the kernel's largest cost and the worst-case single
  width over-pays ~2x for steep angles.
* **Empty-visit early-out**: samples only reach grid rows
  ``n*(1 -/+ |sin|)`` +- taps, so ~15% of (row-block, angle) visits are
  provably empty and skipped on a scalar test (the TPU analogue of the
  reference's angle-range pruning row bounds).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["usfft_grid_pallas"]

import os as _os

_RB = int(_os.environ.get("TOMOBAR_TPU_USFFT_RB", "128"))  # grid rows per block
_RW = int(_os.environ.get("TOMOBAR_TPU_USFFT_RW", "128"))  # polar-sample window
#   (needs ~0.71*(RB+2m+2)+2; m<=18 fits at the defaults)
_CW = int(_os.environ.get("TOMOBAR_TPU_USFFT_CW", "384"))  # widest column
#   window (covers RB*|c/s| <= RB, + 2m+2 taps + up to 128 alignment loss)
# ascending width tiers; each visit runs at the narrowest covering tier
_CW_TIERS = tuple(
    int(x)
    for x in _os.environ.get("TOMOBAR_TPU_USFFT_TIERS", "128,256,384").split(",")
)
_ACH = int(_os.environ.get("TOMOBAR_TPU_USFFT_ACH", "8"))  # angles per step
_ROW_PAD = 128  # extended-grid row margin (wrap fold)
_COL_PAD = 256  # extended-grid column margin (wrap fold)
# z-pairs per kernel call: the (pch, 2, RB, wt) output block must stay in
# VMEM (~5.9 MB per pair at n=2592) next to the weight temporaries
_PCH = int(_os.environ.get("TOMOBAR_TPU_USFFT_PCH", "4"))
# stack the whole angle chunk on the contraction dim (one dot per channel);
# 0 falls back to the simpler one-dot-per-(angle, channel) kernel
_ASTACK = _os.environ.get("TOMOBAR_TPU_USFFT_ASTACK", "1") == "1"


def _grid_kernel(
    sin_ref, cos_ref, g_ref, out_ref, *, n, npad, m, cc, coeff0, cap, wt,
    npairs, cw_tiers,
):
    """Accumulate one angle-chunk into one 128-row block of the extended
    grid for all ``npairs`` z-pairs at once.  Grid dims:
    (row_block, angle_chunk).  The kernel weights depend only on
    (row_block, angle), so processing every pair per visit builds them
    once; each pair-channel runs one (RB, RW) @ (RW, CW) MXU matmul.

    ``cw_tiers`` is an ascending tuple of column-window widths (e.g.
    ``(256, 384)``).  The matmul's column count is the kernel's largest
    cost, and the width an angle actually needs — its true column span
    |c/s|*(RB+2m+2) + taps, plus up to 127 lanes of 128-alignment slack —
    varies per (angle, block).  Each visit picks the NARROWEST tier that
    covers its span (a scalar-predicated ``pl.when`` branch per tier; at
    the bench geometry ~95% of visits fit the 256 tier and ~37% the 128
    tier, vs. the single worst-case 384 width the r4 kernel always paid).
    """
    rb = pl.program_id(0)
    ach = pl.program_id(1)

    @pl.when(ach == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rb_lo = rb * _RB - _ROW_PAD  # global grid row of tile row 0
    half = n / 2.0

    # int iota + cast: Mosaic's tpu.iota only produces integer vectors.
    # Everything that depends on a single index is computed on (1, W) /
    # (W, 1) vectors and broadcast by the one subtract forming the
    # distance; only the mixing iotas are materialised full-size.
    i_row = jax.lax.broadcasted_iota(jnp.int32, (_RB, _RW), 0).astype(jnp.float32)
    j_vec = jax.lax.broadcasted_iota(jnp.int32, (1, _RW), 1).astype(jnp.float32)
    i_colv = jax.lax.broadcasted_iota(jnp.int32, (_RW, 1), 0).astype(jnp.float32)
    l_cols = {
        cwx: jax.lax.broadcasted_iota(jnp.int32, (_RW, cwx), 1).astype(
            jnp.float32
        )
        for cwx in cw_tiers
    }

    def ang_body(ia, _):
        s = sin_ref[ach * _ACH + ia]
        c = cos_ref[ach * _ACH + ia]

        # ---- empty-visit early-out (scalar) ----
        # samples only reach rows n*(1 -/+ |s|) -/+ taps: blocks outside
        # that band have an all-underflow a_w and contribute nothing, yet
        # cost a full visit (~15% of visits at uniform angles; the TPU
        # analogue of the reference's angle-range pruning row bounds)
        ns = n * jnp.abs(s)
        active = (rb_lo + _RB > n - ns - (m + 1.0)) & (
            rb_lo < n + ns + (m + 1.0)
        )

        @pl.when(active)
        def _active_body():
            _ang_active(ia, s, c)
        return 0

    def _ang_active(ia, s, c):
        # ---- static-per-step window math (scalar) ----
        # Ry(r) = n - 2 s (r - n/2); rows [rb_lo - m - 1, rb_lo + RB + m + 1]
        inv = 0.5 / s
        ra = (n - (rb_lo - m - 1.0)) * inv + half
        rbnd = (n - (rb_lo + _RB + m + 1.0)) * inv + half
        r0f = jnp.floor(jnp.minimum(ra, rbnd)) - 1.0
        r0 = jnp.clip(r0f.astype(jnp.int32), 0, n - _RW)

        # Cx(r) = n + 2 c (r - n/2), evaluated at the TRUE sample-window
        # endpoints (samples beyond rw_a have a_w ~ 0 by Gaussian underflow
        # so they need no column coverage; endpoints are clipped to the
        # existing sample range [0, n) because r0's own clip can shift the
        # window while out-of-range samples carry g = 0).
        rw_a = (_RB + 2.0 * m + 2.0) * jnp.abs(inv) + 3.0
        r_lo_t = jnp.clip(r0f, 0.0, float(n))
        r_hi_t = jnp.clip(r0f + rw_a, 0.0, float(n))
        cx_a = n + 2.0 * c * (r_lo_t - half)
        cx_b = n + 2.0 * c * (r_hi_t - half)
        c0f = jnp.floor(jnp.minimum(cx_a, cx_b)) - (m + 1.0)
        c0 = (c0f.astype(jnp.int32) // 128) * 128  # global column
        # highest column any covered sample can touch (+1 ceil safety)
        c_hi = jnp.maximum(cx_a, cx_b) + (m + 2.0)
        span = c_hi.astype(jnp.int32) - c0

        # ---- row-side weights A (RB, RW): coeff0 * K1.  The reference's
        # hard tap cutoff |l - floor(pos)| <= m is dropped: at the
        # universal eps=1e-4 parameters (m=5, cc=-0.536) the Gaussian at
        # the cutoff is exp(-0.536*36) = 4e-9 of the peak, below float
        # noise, and the masking arithmetic (floor + compares + select)
        # was a large share of the VPU work.  exp2 with log2(e) folded
        # into cc2: the VPU's native base-2 transcendental is cheaper
        # than exp's lowering.
        cc2 = cc * 1.4426950408889634
        rjv = r0.astype(jnp.float32) + j_vec
        ry_v = jnp.minimum(n - 2.0 * s * (rjv - half), cap)  # (1, RW)
        d1 = (rb_lo + i_row) - ry_v
        a_w = coeff0 * jnp.exp2(cc2 * (d1 * d1))

        # per-sample column positions (shared by every tier's w0 build)
        rjc = r0.astype(jnp.float32) + i_colv
        cx_v = jnp.minimum(n + 2.0 * c * (rjc - half), cap)  # (RW, 1)

        # ---- fold g into A per channel and pair.  Mosaic can't
        # vector-load at a dynamic lane offset: one 128-aligned 2*RW load
        # for all pair-channels + dynamic roll (the projector's trick).
        r0a = jnp.clip((r0 // 128) * 128, 0, npad - 2 * _RW)
        dr = r0 - r0a
        gall = g_ref[:, :, ia, pl.ds(pl.multiple_of(r0a, 128), 2 * _RW)]
        gall = gall.reshape(2 * npairs, 2 * _RW)
        gall = pltpu.roll(gall, 2 * _RW - dr, 1)  # [., dr+j] -> j
        aps = [
            a_w * gall[q : q + 1, :_RW] for q in range(2 * npairs)
        ]

        def emit(cwx):
            """Column-side weights + matmuls + accumulate at width cwx."""
            c0t = jnp.clip(c0 + _COL_PAD, 0, wt - cwx)  # tile column
            # the clip never binds for real angle windows (margin
            # analysis above) but hides the 128-multiple fact from Mosaic
            c0t = pl.multiple_of((c0t // 128) * 128, 128)
            c0g = (c0t - _COL_PAD).astype(jnp.float32)
            d0 = (c0g + l_cols[cwx]) - cx_v
            w0 = jnp.exp2(cc2 * (d0 * d0))
            for p in range(npairs):  # static unroll (npairs <= _PCH)
                for ch in range(2):
                    out = jnp.dot(
                        aps[2 * p + ch], w0,
                        preferred_element_type=jnp.float32,
                    )
                    out_ref[p, ch, :, pl.ds(c0t, cwx)] += out

        # narrowest tier that covers the span; the last tier always does
        prev_fits = span <= 0  # False
        for cwx in cw_tiers[:-1]:
            fits = span <= cwx
            pl.when(fits & ~prev_fits)(lambda cwx=cwx: emit(cwx))
            prev_fits = fits
        pl.when(~prev_fits)(lambda: emit(cw_tiers[-1]))

    jax.lax.fori_loop(0, _ACH, ang_body, 0)


def _grid_kernel_astack(
    sin_ref, cos_ref, g_ref, out_ref, *, n, npad, m, cc, coeff0, cap, wt,
    npairs, cw_tiers,
):
    """Angle-stacked variant: all _ACH chunk angles ride the contraction
    dim of ONE matmul per pair-channel (k = _ACH*RW), amortising MXU
    fill/drain and the accumulate count by _ACH.  Requires the chunk's
    column windows to share one tier-wide union (true for sorted adjacent
    angles); chunks whose union does not fit the widest tier (the wrap of
    a driven group's angle range) fall back to per-angle emits."""
    rb = pl.program_id(0)
    ach = pl.program_id(1)

    @pl.when(ach == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rb_lo = rb * _RB - _ROW_PAD
    half = n / 2.0
    cc2 = cc * 1.4426950408889634

    i_row = jax.lax.broadcasted_iota(jnp.int32, (_RB, _RW), 0).astype(jnp.float32)
    j_vec = jax.lax.broadcasted_iota(jnp.int32, (1, _RW), 1).astype(jnp.float32)
    i_colv = jax.lax.broadcasted_iota(jnp.int32, (_RW, 1), 0).astype(jnp.float32)
    l_cols = {
        cwx: jax.lax.broadcasted_iota(jnp.int32, (_RW, cwx), 1).astype(
            jnp.float32
        )
        for cwx in cw_tiers
    }

    big = jnp.float32(1e9)

    # ---- per-angle scalar window math, statically unrolled ----
    angs = []
    for ia in range(_ACH):
        s = sin_ref[ach * _ACH + ia]
        c = cos_ref[ach * _ACH + ia]
        ns = n * jnp.abs(s)
        act = (rb_lo + _RB > n - ns - (m + 1.0)) & (
            rb_lo < n + ns + (m + 1.0)
        )
        inv = 0.5 / s
        ra = (n - (rb_lo - m - 1.0)) * inv + half
        rbnd = (n - (rb_lo + _RB + m + 1.0)) * inv + half
        r0f = jnp.floor(jnp.minimum(ra, rbnd)) - 1.0
        r0 = jnp.clip(r0f.astype(jnp.int32), 0, n - _RW)
        rw_a = (_RB + 2.0 * m + 2.0) * jnp.abs(inv) + 3.0
        r_lo_t = jnp.clip(r0f, 0.0, float(n))
        r_hi_t = jnp.clip(r0f + rw_a, 0.0, float(n))
        cx_a = n + 2.0 * c * (r_lo_t - half)
        cx_b = n + 2.0 * c * (r_hi_t - half)
        c0f = jnp.floor(jnp.minimum(cx_a, cx_b)) - (m + 1.0)
        c_hi = jnp.maximum(cx_a, cx_b) + (m + 2.0)
        # inactive angles must not widen the union window
        c0f = jnp.where(act, c0f, big)
        c_hi = jnp.where(act, c_hi, -big)
        angs.append((ia, s, c, act, r0, c0f, c_hi))

    chunk_act = angs[0][3]
    c0f_u = angs[0][5]
    c_hi_u = angs[0][6]
    for a in angs[1:]:
        chunk_act = chunk_act | a[3]
        c0f_u = jnp.minimum(c0f_u, a[5])
        c_hi_u = jnp.maximum(c_hi_u, a[6])
    c0_u = (c0f_u.astype(jnp.int32) // 128) * 128
    span_u = c_hi_u.astype(jnp.int32) - c0_u

    def build_parts(s, c, r0, ia, c0g, cwx):
        """One angle's a_w-folded g rows and w0 block."""
        rjv = r0.astype(jnp.float32) + j_vec
        ry_v = jnp.minimum(n - 2.0 * s * (rjv - half), cap)
        d1 = (rb_lo + i_row) - ry_v
        a_w = coeff0 * jnp.exp2(cc2 * (d1 * d1))
        rjc = r0.astype(jnp.float32) + i_colv
        cx_v = jnp.minimum(n + 2.0 * c * (rjc - half), cap)
        d0 = (c0g + l_cols[cwx]) - cx_v
        w0 = jnp.exp2(cc2 * (d0 * d0))
        r0a = jnp.clip((r0 // 128) * 128, 0, npad - 2 * _RW)
        dr = r0 - r0a
        gw = g_ref[:, :, ia, pl.ds(pl.multiple_of(r0a, 128), 2 * _RW)]
        gw = gw.reshape(2 * npairs, 2 * _RW)
        gw = pltpu.roll(gw, 2 * _RW - dr, 1)
        aps = [a_w * gw[q : q + 1, :_RW] for q in range(2 * npairs)]
        return aps, w0

    def stacked(cwx):
        c0t = jnp.clip(c0_u + _COL_PAD, 0, wt - cwx)
        c0t = pl.multiple_of((c0t // 128) * 128, 128)
        c0g = (c0t - _COL_PAD).astype(jnp.float32)
        ap_blocks = [[] for _ in range(2 * npairs)]
        w0_blocks = []
        for ia, s, c, act, r0, _, _hi in angs:
            aps, w0 = build_parts(s, c, r0, ia, c0g, cwx)
            w0_blocks.append(w0)
            for q in range(2 * npairs):
                ap_blocks[q].append(aps[q])
        w0_all = jnp.concatenate(w0_blocks, axis=0)  # (ACH*RW, cwx)
        for p in range(npairs):
            for ch in range(2):
                ap_all = jnp.concatenate(ap_blocks[2 * p + ch], axis=1)
                out = jnp.dot(
                    ap_all, w0_all, preferred_element_type=jnp.float32
                )
                out_ref[p, ch, :, pl.ds(c0t, cwx)] += out

    def per_angle_fallback():
        cwx = cw_tiers[-1]
        for ia, s, c, act, r0, c0f, c_hi in angs:
            @pl.when(act)
            def _(ia=ia, s=s, c=c, r0=r0, c0f=c0f):
                c0 = (c0f.astype(jnp.int32) // 128) * 128
                c0t = jnp.clip(c0 + _COL_PAD, 0, wt - cwx)
                c0t = pl.multiple_of((c0t // 128) * 128, 128)
                c0g = (c0t - _COL_PAD).astype(jnp.float32)
                aps, w0 = build_parts(s, c, r0, ia, c0g, cwx)
                for p in range(npairs):
                    for ch in range(2):
                        out = jnp.dot(
                            aps[2 * p + ch], w0,
                            preferred_element_type=jnp.float32,
                        )
                        out_ref[p, ch, :, pl.ds(c0t, cwx)] += out

    @pl.when(chunk_act)
    def _chunk():
        prev = span_u <= 0
        for cwx in cw_tiers[:-1]:
            fits = span_u <= cwx
            pl.when(fits & ~prev)(lambda cwx=cwx: stacked(cwx))
            prev = fits
        last_fits = span_u <= cw_tiers[-1]
        pl.when(last_fits & ~prev)(lambda: stacked(cw_tiers[-1]))
        pl.when(~last_fits)(per_angle_fallback)


def _round_up(x: int, mult: int) -> int:
    return (x + mult - 1) // mult * mult


def _grid_driven(
    g: jnp.ndarray,
    sin_v: np.ndarray,
    cos_v: np.ndarray,
    n: int,
    m: int,
    cc: float,
    coeff0: float,
) -> jnp.ndarray:
    """Grid one driven group.  g: (npairs, 2, n_ang, n) float32 (already
    restricted to the group's angles).  Returns the *extended* grid
    (npairs, 2, 2n + 2*ROW_PAD, 2n + 2*COL_PAD) — caller folds margins."""
    npairs, _, n_ang, _ = g.shape
    two_n = 2 * n
    # rows padded to a whole number of _RB blocks (extra top rows compute
    # empty windows and are sliced away by the margin fold); columns to a
    # 128 lane multiple so dynamic output offsets stay aligned
    nr_ext = _round_up(two_n + 2 * _ROW_PAD, _RB)
    wt = _round_up(two_n + 2 * _COL_PAD, 128)
    npad = _round_up(n, 128) + 128  # lane margin for aligned-load + roll

    a_pad = _round_up(max(n_ang, 1), _ACH)
    sin_p = np.concatenate([sin_v, np.ones(a_pad - n_ang)]).astype(np.float32)
    cos_p = np.concatenate([cos_v, np.zeros(a_pad - n_ang)]).astype(np.float32)
    g = jnp.pad(g, ((0, 0), (0, 0), (0, a_pad - n_ang), (0, npad - n)))

    cap = float(two_n * (0.5 - 1e-5) + n)  # reference's sample clamp
    sin_j, cos_j = jnp.asarray(sin_p), jnp.asarray(cos_p)

    def call(g_chunk):
        pch = g_chunk.shape[0]
        kernel = partial(
            _grid_kernel_astack if _ASTACK else _grid_kernel,
            n=n, npad=npad, m=m, cc=float(cc), coeff0=float(coeff0),
            cap=cap, wt=wt, npairs=pch, cw_tiers=_CW_TIERS,
        )
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nr_ext // _RB, a_pad // _ACH),
                in_specs=[
                    pl.BlockSpec(
                        (pch, 2, _ACH, npad),
                        lambda rb, ach, *_: (0, 0, ach, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (pch, 2, _RB, wt),
                    lambda rb, ach, *_: (0, 0, rb, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct(
                (pch, 2, nr_ext, wt), jnp.float32
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=_INTERPRET[0],
        )(sin_j, cos_j, g_chunk)

    if npairs <= _PCH:
        return call(g)
    outs = [call(g[p : p + _PCH]) for p in range(0, npairs, _PCH)]
    return jnp.concatenate(outs, axis=0)


_INTERPRET = [False]  # test hook: run the kernel in interpret mode


def _fold_margins(ext: jnp.ndarray, n: int) -> jnp.ndarray:
    """Fold the wrap margins of the extended grid back (the reference's
    ``mod(ell + n, 2n)`` indexing, ``fft_us_kernels.cu:11-42``)."""
    two_n = 2 * n
    rp, cp = _ROW_PAD, _COL_PAD
    # explicit slice ends: ext may carry extra alignment padding beyond
    # the wrap margins (rows to _RB blocks, columns to 128 lanes)
    core = ext[..., rp : rp + two_n, cp : cp + two_n]
    core = core.at[..., two_n - rp :, :].add(ext[..., :rp, cp : cp + two_n])
    core = core.at[..., :rp, :].add(
        ext[..., rp + two_n : 2 * rp + two_n, cp : cp + two_n]
    )
    core = core.at[..., :, two_n - cp :].add(
        ext[..., rp : rp + two_n, :cp]
    )
    core = core.at[..., :, :cp].add(
        ext[..., rp : rp + two_n, cp + two_n : 2 * cp + two_n]
    )
    return core


def usfft_grid_pallas(
    data_re: jnp.ndarray,
    data_im: jnp.ndarray,
    n: int,
    theta: np.ndarray,
    eps: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in fast path for :func:`tomobar_tpu.ops.usfft.usfft_grid`
    (same contract: spectra in, (nz2, 2n, 2n) gridded pair out)."""
    from tomobar_tpu.ops.fft_real import fft_pairs

    nz2, nproj, _ = data_re.shape
    mu = -np.log(eps) / (2 * n * n)
    m = int(
        np.ceil(
            2 * n / np.pi * np.sqrt(-mu * np.log(eps) + (mu * n) * (mu * n) / 4)
        )
    )
    if _RW < 0.71 * (_RB + 2 * m + 2) + 3 or n < _RW:
        raise ValueError(
            f"usfft_grid_pallas window too small for m={m}, n={n}"
        )
    coeff0 = float(np.pi / mu)
    cc = float(-np.pi * np.pi / mu / (4.0 * n * n))  # cell-unit exponent

    # STEP1 (same as the oracle): fft along detX + c1dfftshift sign/scale
    sre, sim = fft_pairs(data_re, data_im)
    sign = jnp.where(jnp.arange(n) % 2 == 1, 1.0, -1.0).astype(jnp.float32)
    scale = sign * (4.0 / n)
    g = jnp.stack([sre * scale, sim * scale], axis=1)  # (nz2, 2, nproj, n)

    cos_t = np.cos(theta).astype(np.float64)
    sin_t = np.sin(theta).astype(np.float64)
    # row-driven: the sample line crosses grid rows steeply.  Grid rows
    # advance with py = -2(r - n/2) sin(theta), so the roles relative to
    # the projector partition are: row-driven needs |sin| >= |cos|.
    row_idx = np.where(np.abs(sin_t) >= np.abs(cos_t))[0]
    col_idx = np.where(np.abs(sin_t) < np.abs(cos_t))[0]

    two_n = 2 * n
    fre = jnp.zeros((nz2, two_n, two_n), dtype=jnp.float32)
    fim = jnp.zeros((nz2, two_n, two_n), dtype=jnp.float32)

    if row_idx.size:
        # Ry = n - 2 s (r - n/2) with s = sin(theta); Cx = n + 2 c (r - n/2)
        ext = _grid_driven(
            g[:, :, row_idx, :],
            sin_t[row_idx].astype(np.float32),
            cos_t[row_idx].astype(np.float32),
            n, m, cc, coeff0,
        )
        core = _fold_margins(ext, n)
        fre = fre + core[:, 0]
        fim = fim + core[:, 1]
    if col_idx.size:
        # transposed grid: rows <-> columns, so the "row" position is
        # Cx' = n + 2 c (r - n/2) -> slope roles swap: pass sin' = -cos,
        # cos' = -sin so that n - 2 s' (r - n/2) == n + 2 c (r - n/2)
        # and n + 2 c' (r - n/2) == n - 2 s (r - n/2).
        ext = _grid_driven(
            g[:, :, col_idx, :],
            (-cos_t[col_idx]).astype(np.float32),
            (-sin_t[col_idx]).astype(np.float32),
            n, m, cc, coeff0,
        )
        core = _fold_margins(ext, n)
        fre = fre + jnp.swapaxes(core[:, 0], -1, -2)
        fim = fim + jnp.swapaxes(core[:, 1], -1, -2)
    return fre, fim
