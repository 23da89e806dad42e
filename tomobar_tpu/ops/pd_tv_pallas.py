"""Fused Pallas PD-TV (Chambolle-Pock) iterations for TPU.

TPU equivalent of the reference's fully fused CUDA kernel
(``tomobar/cuda_kernels/primal_dual_for_total_variation.cu:126-301``) — one
kernel launch computing the dual ascent + TV-ball projection + divergence
+ relaxed primal update, with the reference's "recompute neighbour duals"
trick: the kernel evaluates projected duals on an extended row range (one
halo row) instead of a second pass/sync.

**Streaming wavefront design.**  The y-axis halos are carried in VMEM
scratch across the (sequential) grid instead of re-fetching whole
neighbour blocks from HBM, and ``K`` *iterations* ride one sweep as a
row-wavefront: at grid step ``yb``, level ``k`` (k = 1..K) computes block
``yb - k`` of iteration ``k`` from level ``k-1``'s scratch rows plus the
first row of the block level ``k-1`` just produced.  Only level 0 (the
input iterate) is read from HBM and only level K is written back, so HBM
traffic is 9 block-moves per voxel per *sweep* — ``9/K`` per iteration —
versus 14 for the naive prev/centre/next BlockSpec formulation.  On a v5e
the single-iteration kernel measured 322 GB/s effective (HBM-bound); the
wavefront converts that directly into iteration rate until the VPU
stencil work becomes the bound.

Layout: volumes are processed as ``(ny, nz, nx)`` — y is the blocked/grid
axis, z the sublane axis, x the lane axis.  Boundary semantics match
:func:`tomobar_tpu.regularisers.PD_TV` exactly (forward differences
reflect at the far edge, divergence uses zero boundaries at index 0), so
the Pallas and XLA paths agree to float precision and tests can compare
them directly.

Supported when ``nx % 128 == 0`` and ``ny % YB == 0``; the caller falls
back to the XLA path otherwise.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pd_tv_pallas_supported", "pd_tv_pallas"]

_YB = 4  # rows per block (VMEM-bound: in/out windows double-buffered)
# iterations fused per sweep; VMEM scratch grows ~1.7 MB/level at
# production widths (fits easily in the 100 MB limit).  Measured on v5e
# at 8x2560x2560 per 20 iterations: K=3 44.1 ms / K=5 27.7 / K=7 22.5 /
# K=10 23.0.
_K_FUSE = int(os.environ.get("TOMOBAR_TPU_PDTV_FUSE", "7"))


def pd_tv_pallas_supported(shape) -> bool:
    nz, ny, nx = shape
    return nx % 128 == 0 and ny % _YB == 0 and ny >= 2 * _YB


def _level_update(
    c, u_sc, p1_sc, p2_sc, p3_sc, u_next_head, data_blk,
    *, YB, ny, nz, nzl, nx, sigma, tau, lt, theta, method_tv, nonneg,
):
    """One PD-TV iteration for output block ``c`` (rows c*YB .. c*YB+YB-1).

    ``u_sc`` is the previous-level u window (YB+2 rows, global rows
    c*YB-2 .. c*YB+YB-1); ``p*_sc`` the previous-level dual windows
    (YB+1 rows, global rows c*YB-1 .. c*YB+YB-1); ``u_next_head`` the
    previous-level u row c*YB+YB (1, nz, nx).  Returns the new
    (u, p1, p2, p3) blocks, each (YB, nz, nx) float32.  Garbage rows
    (negative / >= ny global rows) never reach valid outputs: every use
    is masked on the global row index.
    """
    u_ext = u_sc[1 : YB + 2]  # rows b0-1 .. b0+YB-1
    u_ext_prev = u_sc[0 : YB + 1]  # rows b0-2 .. b0+YB-2
    u_ext_next = jnp.concatenate(
        [u_sc[2 : YB + 2], u_next_head], axis=0
    )  # rows b0 .. b0+YB

    row_g = c * YB - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (YB + 1, nz, nx), 0
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, (YB + 1, nz, nx), 2)
    zidx = jax.lax.broadcasted_iota(jnp.int32, (YB + 1, nz, nx), 1)

    # ---- forward differences on the ext range (reflect at far edges) ----
    u_xp = pltpu.roll(u_ext, nx - 1, 2)  # u[x+1] (wraps; fixed by mask)
    u_xm = pltpu.roll(u_ext, 1, 2)  # u[x-1]
    dx = jnp.where(lane == nx - 1, u_xm - u_ext, u_xp - u_ext)
    dy = jnp.where(row_g == ny - 1, u_ext_prev - u_ext, u_ext_next - u_ext)
    if nzl > 1:
        u_zp = pltpu.roll(u_ext, nz - 1, 1)
        u_zm = pltpu.roll(u_ext, 1, 1)
        # masks use the LOGICAL slice count: z may be padded to a full
        # 8-sublane tile (physical nz) with garbage slices beyond nzl,
        # which the reflect mask keeps out of the real range
        dz = jnp.where(zidx == nzl - 1, u_zm - u_ext, u_zp - u_ext)
    else:
        dz = jnp.zeros_like(u_ext)

    # ---- dual ascent + projection on the ext range ----
    p1n = p1_sc.astype(jnp.float32) + sigma * dx
    p2n = p2_sc.astype(jnp.float32) + sigma * dy
    p3n = p3_sc.astype(jnp.float32) + sigma * dz
    if method_tv == 0:  # isotropic joint projection
        denom = p1n * p1n + p2n * p2n + (p3n * p3n if nzl > 1 else 0.0)
        scale = jnp.where(
            denom > 1.0, jax.lax.rsqrt(jnp.maximum(denom, 1e-30)), 1.0
        )
        p1n = p1n * scale
        p2n = p2n * scale
        p3n = p3n * scale
    else:  # anisotropic per-component projection
        p1n = p1n / jnp.maximum(jnp.abs(p1n), 1.0)
        p2n = p2n / jnp.maximum(jnp.abs(p2n), 1.0)
        p3n = p3n / jnp.maximum(jnp.abs(p3n), 1.0)

    # centre-block new duals and their backward neighbours
    p1c = p1n[1:]
    p2c = p2n[1:]
    p3c = p3n[1:]
    p2_ym = p2n[:-1]  # y-neighbour: ext rows shifted by one

    # centre-range iotas built directly: slicing the ext-range iotas
    # (lane-replicated layouts) trips a Mosaic extract_strided_slice
    # layout bug when nx > 128
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (YB, nz, nx), 2)
    zidx_c = jax.lax.broadcasted_iota(jnp.int32, (YB, nz, nx), 1)
    row_c = c * YB + jax.lax.broadcasted_iota(jnp.int32, (YB, nz, nx), 0)

    p1_xm = pltpu.roll(p1c, 1, 2)  # P1 at (x-1)
    div = p1c - jnp.where(lane_c == 0, 0.0, p1_xm)
    div = div + p2c - jnp.where(row_c == 0, 0.0, p2_ym)
    if nzl > 1:
        p3_zm = pltpu.roll(p3c, 1, 1)
        div = div + p3c - jnp.where(zidx_c == 0, 0.0, p3_zm)

    # ---- relaxed primal update (DivProj + over-relaxation) ----
    u_c = u_sc[2 : YB + 2]  # rows b0 .. b0+YB-1
    uc = jnp.maximum(u_c, 0.0) if nonneg else u_c
    u_new = (uc + tau * div + lt * data_blk) / (1.0 + lt)
    return u_new + theta * (u_new - uc), p1c, p2c, p3c


def _pd_tv_stream_kernel(
    data_ref, uc_ref, p1c_ref, p2c_ref, p3c_ref,
    uo_ref, p1o_ref, p2o_ref, p3o_ref,
    dring_ref, *scratch,
    K, YB, ny, nz, nzl, nx, sigma, tau, lt, theta, method_tv, nonneg,
):
    """K-level wavefront: at grid step ``yb``, level k computes block
    ``yb - k`` of iteration k from level k-1's scratch; level 0 is the
    HBM-fetched input iterate, level K is written back to HBM.  Each
    level's scratch is rotated right after the next level consumed it,
    bounding temporaries to ~2 levels' blocks."""
    yb = pl.program_id(0)  # 0 .. nb+K-1; output (level-K) block is yb-K
    nslots = K + 1

    # data ring: slot (yb % nslots) <- data block min(yb, nb-1); level k
    # reads slot ((yb - k) % nslots) == its output block's data
    slot = jax.lax.rem(yb, nslots)
    dring_ref[slot] = data_ref[...]

    upd = partial(
        _level_update,
        YB=YB, ny=ny, nz=nz, nzl=nzl, nx=nx, sigma=sigma, tau=tau, lt=lt,
        theta=theta, method_tv=method_tv, nonneg=nonneg,
    )

    def rotate(us_ref, p1s_ref, p2s_ref, p3s_ref, u_blk, p1_blk, p2_blk, p3_blk):
        us_ref[0:2] = us_ref[YB : YB + 2]
        us_ref[2 : YB + 2] = u_blk
        p1s_ref[0:1] = p1s_ref[YB : YB + 1]
        p2s_ref[0:1] = p2s_ref[YB : YB + 1]
        p3s_ref[0:1] = p3s_ref[YB : YB + 1]
        p1s_ref[1 : YB + 1] = p1_blk.astype(p1s_ref.dtype)
        p2s_ref[1 : YB + 1] = p2_blk.astype(p2s_ref.dtype)
        p3s_ref[1 : YB + 1] = p3_blk.astype(p3s_ref.dtype)

    # level k-1 state feeding level k's compute this step
    head = uc_ref[0:1]  # level-0 u row yb*YB (head of the fetched block)
    feed = (uc_ref[...], p1c_ref[...], p2c_ref[...], p3c_ref[...])
    for k in range(1, K + 1):
        us_ref, p1s_ref, p2s_ref, p3s_ref = scratch[4 * (k - 1) : 4 * k]
        dslot = jax.lax.rem(yb - k + nslots, nslots)
        blk = upd(
            yb - k,
            us_ref[...],
            p1s_ref[...], p2s_ref[...], p3s_ref[...],
            head,
            dring_ref[dslot],
        )
        # level k-1's scratch is free now: append the block that fed it
        rotate(us_ref, p1s_ref, p2s_ref, p3s_ref, *feed)
        head = blk[0][0:1]
        feed = blk

    u_out, p1_out, p2_out, p3_out = feed
    uo_ref[...] = u_out
    p1o_ref[...] = p1_out.astype(p1o_ref.dtype)
    p2o_ref[...] = p2_out.astype(p2o_ref.dtype)
    p3o_ref[...] = p3_out.astype(p3o_ref.dtype)


def pd_tv_pallas(
    data: jnp.ndarray,
    regularisation_parameter: float,
    iterations: int,
    methodTV: int = 0,
    nonneg: int = 0,
    lipschitz_const: float = 8.0,
    half_precision: bool = False,
    interpret: bool = False,
    layout: str = "zyx",
) -> jnp.ndarray:
    """Fused PD-TV on (nz, ny, nx) input; numerically matches the XLA path
    of :func:`tomobar_tpu.regularisers.PD_TV` for 3D inputs.

    ``layout="t"``: the input is already in the kernel's internal
    ``(ny, nz, nx)`` layout (t-layout solver state) — the entry and exit
    transposes are skipped and the result is returned in the same layout."""
    if layout == "t":
        ny, nz, nx = data.shape
    else:
        nz, ny, nx = data.shape
    assert pd_tv_pallas_supported((nz, ny, nx))
    dual_dtype = jnp.bfloat16 if half_precision else jnp.float32

    # thin slabs: pad z to a full 8-sublane tile (partial sublane tiles
    # measured ~1.8x SLOWER than full ones on v5e — Mosaic relayouts in
    # the scratch rotations); the z-boundary masks use the logical nzl so
    # the padded garbage slices never couple into the real range
    nzl = nz
    if 1 < nz < 8:
        nz = 8

    tau = float(regularisation_parameter) * 0.1
    sigma = 1.0 / (float(lipschitz_const) * tau)
    theta = 1.0
    lt = tau / float(regularisation_parameter)

    data_t = (
        data.astype(jnp.float32)
        if layout == "t"
        else jnp.swapaxes(data.astype(jnp.float32), 0, 1)
    )  # (ny, nz, nx)
    if nz != nzl:
        data_t = jnp.pad(data_t, ((0, 0), (0, nz - nzl), (0, 0)), mode="edge")
    nb = ny // _YB

    def make_sweep(K: int):
        kernel = partial(
            _pd_tv_stream_kernel,
            K=K, YB=_YB, ny=ny, nz=nz, nzl=nzl, nx=nx,
            sigma=float(sigma), tau=float(tau),
            lt=float(lt), theta=float(theta),
            method_tv=int(methodTV), nonneg=bool(nonneg),
        )

        def out_blk(yb):
            return (jnp.maximum(yb - K, 0), 0, 0)

        def cur_blk(yb):
            return (jnp.minimum(yb, nb - 1), 0, 0)

        blk = (_YB, nz, nx)
        level_scratch = []
        for _ in range(K):
            level_scratch += [
                pltpu.VMEM((_YB + 2, nz, nx), jnp.float32),
                pltpu.VMEM((_YB + 1, nz, nx), dual_dtype),
                pltpu.VMEM((_YB + 1, nz, nx), dual_dtype),
                pltpu.VMEM((_YB + 1, nz, nx), dual_dtype),
            ]
        return pl.pallas_call(
            kernel,
            grid=(nb + K,),
            in_specs=[
                pl.BlockSpec(blk, cur_blk),  # data (into the ring)
                pl.BlockSpec(blk, cur_blk),  # u centre
                pl.BlockSpec(blk, cur_blk),  # p1 centre
                pl.BlockSpec(blk, cur_blk),  # p2 centre
                pl.BlockSpec(blk, cur_blk),  # p3 centre
            ],
            # donate the carried state: output block yb-K is written K grid
            # steps after input block yb-K was last read (cur_blk is
            # monotone, the pipeline prefetches at most one block ahead,
            # K >= 1), so in-place is safe — without this XLA copies all
            # four carry buffers every sweep (~2.5 ms of the ~7.7 ms sweep
            # at 8x2560x2560 on v5e, trace-audited)
            input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3},
            out_specs=[
                pl.BlockSpec(blk, out_blk),
                pl.BlockSpec(blk, out_blk),
                pl.BlockSpec(blk, out_blk),
                pl.BlockSpec(blk, out_blk),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((ny, nz, nx), jnp.float32),
                jax.ShapeDtypeStruct((ny, nz, nx), dual_dtype),
                jax.ShapeDtypeStruct((ny, nz, nx), dual_dtype),
                jax.ShapeDtypeStruct((ny, nz, nx), dual_dtype),
            ],
            scratch_shapes=[pltpu.VMEM((K + 1, _YB, nz, nx), jnp.float32)]
            + level_scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )

    K = max(1, min(_K_FUSE, iterations))
    sweep = make_sweep(K)

    def body(_, carry):
        u, p1, p2, p3 = carry
        return tuple(sweep(data_t, u, p1, p2, p3))

    p0 = jnp.zeros((ny, nz, nx), dtype=dual_dtype)
    carry = (data_t, p0, p0, p0)
    carry = jax.lax.fori_loop(0, iterations // K, body, carry)
    rem = iterations % K
    if rem:
        carry = tuple(make_sweep(rem)(*((data_t,) + tuple(carry[:4]))))
    u = carry[0]
    if layout == "t":
        return u[:, :nzl, :]
    return jnp.swapaxes(u[:, :nzl, :], 0, 1)
