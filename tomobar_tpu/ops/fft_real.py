"""Split-complex FFT built on MXU matmuls — no complex dtype anywhere.

Why this exists: the deployment TPU runtime rejects any HLO that touches
``complex64`` (every op — even ``real(fft(x))`` or a host transfer — fails
with UNIMPLEMENTED), so the reference's cuFFT-centric design
(``tomobar/fourier.py:26-76``, ``methodsDIR_CuPy.py:645-918``) cannot be
"ported" at all: the FFTs themselves have to be re-built TPU-native.  Even
on TPUs with complex support, XLA's FFT is a known soft spot while matmul
is the fastest thing the hardware does, so this module implements the
Bailey four-step Cooley-Tukey factorisation ``n = B*C``:

    X[k1 + B*k2] = DFT_C[n2 -> k2]( T[k1,n2] * DFT_B[n1 -> k1]( x[n1*C+n2] ) )

with both small DFTs applied as real ``(B,B)``/``(C,C)`` matmuls on the MXU
and the twiddle ``T = exp(s*2i*pi*k1*n2/n)`` as an elementwise FMA.  Arrays
are ``(re, im)`` float32 pairs; transforms run along the LAST axis.  Cost is
``n*(B+C)`` MACs per row instead of ``n log n`` flops — at MXU rates this
wins for every size this framework uses.

Sizes: any ``n`` that factors into pieces <= _MAX_MATMUL_N (recursively),
which covers every detector/grid size here (callers pad to friendly sizes).
A Bluestein chirp-z fallback handles pathological (prime) lengths.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fft_pairs",
    "ifft_pairs",
    "fft2_pairs",
    "ifft2_pairs",
    "apply_freq_filter_real",
    "use_native_complex_fft",
]

# single-matmul DFT up to this length; above it, factor n = B*C
_MAX_MATMUL_N = 1024

import os as _os


def use_native_complex_fft() -> bool:
    """True when jnp.fft on the default backend supports complex64
    (CPU/GPU).  TPU backends route through the split implementation."""
    mode = _os.environ.get("TOMOBAR_TPU_FFT", "auto")
    if mode == "native":
        return True
    if mode == "split":
        return False
    try:
        return jax.devices()[0].platform not in ("tpu", "axon")
    except Exception:
        return True


@lru_cache(maxsize=None)
def _dft_mats(n: int, sign: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real/imag parts of the DFT matrix W[j, k] = exp(sign*2i*pi*j*k/n).

    Built in float64 then cast: twiddle accuracy dominates FFT error.
    """
    j = np.arange(n, dtype=np.float64)
    ang = (sign * 2.0 * np.pi / n) * np.outer(j, j)
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


@lru_cache(maxsize=None)
def _twiddle(n: int, B: int, C: int, sign: int) -> Tuple[np.ndarray, np.ndarray]:
    """T[k1, n2] = exp(sign*2i*pi*k1*n2/n), shape (B, C)."""
    k1 = np.arange(B, dtype=np.float64)[:, None]
    n2 = np.arange(C, dtype=np.float64)[None, :]
    ang = (sign * 2.0 * np.pi / n) * (k1 * n2)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _best_split(n: int) -> Tuple[int, int]:
    """Factor n = B*C with C as large as possible but <= _MAX_MATMUL_N,
    preferring multiples of 128 (full MXU tiles).  Returns (0, 0) when no
    nontrivial factorisation exists (prime n)."""
    fallback = (0, 0)
    for c in range(min(n - 1, _MAX_MATMUL_N), 1, -1):
        if n % c == 0:
            if c % 128 == 0:
                return (n // c, c)  # full MXU tiles: take it
            if fallback == (0, 0):
                fallback = (n // c, c)
    return fallback


def _dft_last(re: jnp.ndarray, im, wre, wim):
    """DFT along the last axis by matmul; im may be None (real input)."""
    wre = jnp.asarray(wre)
    wim = jnp.asarray(wim)
    if im is None:
        return re @ wre, re @ wim
    return re @ wre - im @ wim, re @ wim + im @ wre


# B-axis DFTs up to this size run as B^2 scalar-weighted FMAs over
# full-tile (..., C, L) slices in the axis-(-2) transform: every grid
# size this framework meets factors as n = B * C with B <= 8 and C a
# 128 multiple (2560 -> 4x640, 5120 -> 5x1024, 8192 -> 8x1024)
_SMALL_B = 16


def _dft_major_small(re, im, sign: int):
    """DFT over axis -3 of (..., B, C, L): B^2 scalar FMAs on (..., C, L)
    major-axis slices — full lanes/sublanes, no relayouts.  im may be
    None (real input)."""
    B = re.shape[-3]
    wre, wim = _dft_mats(B, sign)
    outs_re, outs_im = [], []
    for k in range(B):
        acc_re = None
        acc_im = None

        def add(acc, term):
            return term if acc is None else acc + term

        for b in range(B):
            cr = float(wre[k, b])
            ci = float(wim[k, b])
            xr = re[..., b, :, :]
            xi = im[..., b, :, :] if im is not None else None
            if cr != 0.0:
                t = xr if cr == 1.0 else (-xr if cr == -1.0 else cr * xr)
                acc_re = add(acc_re, t)
                if xi is not None:
                    t = xi if cr == 1.0 else (-xi if cr == -1.0 else cr * xi)
                    acc_im = add(acc_im, t)
            if ci != 0.0:
                if xi is not None:
                    t = -xi if ci == 1.0 else (xi if ci == -1.0 else -ci * xi)
                    acc_re = add(acc_re, t)
                t = xr if ci == 1.0 else (-xr if ci == -1.0 else ci * xr)
                acc_im = add(acc_im, t)
        outs_re.append(acc_re)
        outs_im.append(
            acc_im if acc_im is not None else jnp.zeros_like(outs_re[-1])
        )
    return jnp.stack(outs_re, axis=-3), jnp.stack(outs_im, axis=-3)


def _dft_axis2(re, im, wre, wim):
    """DFT along axis -2 by LEFT matmul: out[..., k, l] = sum_r W[k, r] *
    x[..., r, l].  The contraction runs over the sublane-side axis with
    the lane axis untouched — the MXU-native operand layout, so XLA
    inserts no transposes (unlike transposing (..., n, L) to put n on the
    lanes, which relayouts the whole array twice per axis)."""
    wre = jnp.asarray(wre)
    wim = jnp.asarray(wim)

    def mm(w, x):
        return jnp.einsum("kr,...rl->...kl", w, x)

    if im is None:
        return mm(wre, re), mm(wim, re)
    return mm(wre, re) - mm(wim, im), mm(wim, re) + mm(wre, im)


_LB = 256  # default lane-strip width of the fused axis-2 pass


def _pick_lb(n: int) -> int:
    """Strip width keeping the kernel's ~13 strip-sized temporaries
    (in/out x re/im + B-DFT/twiddle intermediates) inside the 100 MB
    VMEM limit: n = 8192 at 256 lanes measured 104.5 MB."""
    return _LB if n * _LB * 4 <= 6 * 1024 * 1024 else 128


def _fft_axis2_fused(re: jnp.ndarray, im: jnp.ndarray, sign: int,
                     B: int, C: int):
    """One fused Pallas pass for the axis-(-2) transform of (..., n, L):
    per (batch, lane-strip) grid step the whole Bailey pipeline — small-B
    DFT (static scalar FMAs), twiddle, C-point DFT as an MXU matmul with
    the DFT matrix stationary in VMEM, and the k1/k2 interleave — runs on
    a VMEM-resident strip.  HBM traffic is one read + one write of the
    array (the XLA path pays ~6x that across fusion boundaries: measured
    23.7 ms vs a ~2 ms bandwidth floor for a 4x5120x5120 pair batch)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = re.shape[-2]
    L = re.shape[-1]
    LB = _pick_lb(n)
    batch = re.shape[:-2]
    Z = 1
    for d in batch:
        Z *= d
    re3 = re.reshape(Z, n, L)
    im3 = im.reshape(Z, n, L)

    bre, bim = _dft_mats(B, sign)  # static python scalars below
    wre, wim = _dft_mats(C, sign)
    tre, tim = _twiddle(n, B, C, sign)

    def kernel(tre_ref, tim_ref, wre_ref, wim_ref, re_ref, im_ref,
               ore_ref, oim_ref):
        xr = re_ref[0].reshape(B, C, LB)
        xi = im_ref[0].reshape(B, C, LB)
        # ---- B-point DFT over axis 0 (static scalar FMAs) ----
        yr, yi = [], []
        for k in range(B):
            ar = None
            ai = None
            for b in range(B):
                cr = float(bre[k, b])
                ci = float(bim[k, b])
                tr = cr * xr[b] - ci * xi[b]
                ti = cr * xi[b] + ci * xr[b]
                ar = tr if ar is None else ar + tr
                ai = ti if ai is None else ai + ti
            yr.append(ar)
            yi.append(ai)
        # ---- twiddle + C-point DFT (stationary matrix matmul) ----
        wr = wre_ref[...]
        wi = wim_ref[...]
        outs_r, outs_i = [], []
        for b in range(B):
            tr = tre_ref[b][:, None]
            ti = tim_ref[b][:, None]
            zr = yr[b] * tr - yi[b] * ti
            zi = yr[b] * ti + yi[b] * tr
            pr = (
                jnp.dot(wr, zr, preferred_element_type=jnp.float32)
                - jnp.dot(wi, zi, preferred_element_type=jnp.float32)
            )
            pi = (
                jnp.dot(wr, zi, preferred_element_type=jnp.float32)
                + jnp.dot(wi, zr, preferred_element_type=jnp.float32)
            )
            outs_r.append(pr)
            outs_i.append(pi)
        # ---- X[k1 + B*k2] interleave: (B=k1, C=k2) -> (C, B) ----
        sr = jnp.stack(outs_r, axis=0)  # (B, C, LB)
        si = jnp.stack(outs_i, axis=0)
        ore_ref[0] = jnp.swapaxes(sr, 0, 1).reshape(n, LB)
        oim_ref[0] = jnp.swapaxes(si, 0, 1).reshape(n, LB)

    blk = pl.BlockSpec((1, n, LB), lambda z, l, *_: (z, 0, l))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(Z, L // LB),
            in_specs=[
                pl.BlockSpec((B, C), lambda z, l, *_: (0, 0)),
                pl.BlockSpec((B, C), lambda z, l, *_: (0, 0)),
                pl.BlockSpec((C, C), lambda z, l, *_: (0, 0)),
                pl.BlockSpec((C, C), lambda z, l, *_: (0, 0)),
                blk,
                blk,
            ],
            out_specs=[blk, blk],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Z, n, L), jnp.float32),
            jax.ShapeDtypeStruct((Z, n, L), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_FFT_INTERPRET[0],
    )(
        jnp.asarray(tre), jnp.asarray(tim),
        jnp.asarray(wre), jnp.asarray(wim),
        re3, im3,
    )
    return out[0].reshape(*batch, n, L), out[1].reshape(*batch, n, L)


_FFT_INTERPRET = [False]  # test hook


def _use_fused_axis2(n: int, L: int, im) -> bool:
    if im is None or L % _pick_lb(n) or n > _MAX_MATMUL_N * _SMALL_B:
        return False
    B, C = _best_split(n)
    return B != 0 and 1 < B <= 8 and C <= _MAX_MATMUL_N and not (
        use_native_complex_fft()
    )


def _fft_axis2(re: jnp.ndarray, im, sign: int):
    """Length-n transform along axis -2 of (..., n, L), transpose-free.

    The four-step factorisation runs entirely in the (..., B, C, L)
    layout: small-B DFT as scalar FMAs over major slices, twiddle as a
    broadcast elementwise multiply, C-side DFT as a left matmul.  Only
    the final k1/k2 interleave moves data (one bandwidth-bound copy),
    versus four full lane/sublane relayouts for transpose-and-
    transform-rows."""
    n = re.shape[-2]
    if n <= _MAX_MATMUL_N:
        wre, wim = _dft_mats(n, sign)
        return _dft_axis2(re, im, wre, wim)

    if _use_fused_axis2(n, re.shape[-1], im):
        B, C = _best_split(n)
        return _fft_axis2_fused(re, im, sign, B, C)

    B, C = _best_split(n)
    if B == 0 or B > _SMALL_B:
        # awkward length: fall back to transpose + row transform
        re_t = jnp.swapaxes(re, -1, -2)
        im_t = jnp.swapaxes(im, -1, -2) if im is not None else None
        zre, zim = _fft_last(re_t, im_t, sign)
        return jnp.swapaxes(zre, -1, -2), jnp.swapaxes(zim, -1, -2)

    batch = re.shape[:-2]
    L = re.shape[-1]
    re2 = re.reshape(*batch, B, C, L)
    im2 = im.reshape(*batch, B, C, L) if im is not None else None

    yre, yim = _dft_major_small(re2, im2, sign)  # DFT over B (k1)

    tre, tim = _twiddle(n, B, C, sign)
    tre = jnp.asarray(tre)[..., :, :, None]
    tim = jnp.asarray(tim)[..., :, :, None]
    zre = yre * tre - yim * tim
    zim = yre * tim + yim * tre

    zre, zim = _fft_axis2(zre, zim, sign)  # DFT over C (k2), axis -2

    # X[k1 + B*k2] -> interleave: (..., B=k1, C=k2, L) -> (..., C, B, L)
    zre = jnp.swapaxes(zre, -3, -2).reshape(*batch, n, L)
    zim = jnp.swapaxes(zim, -3, -2).reshape(*batch, n, L)
    return zre, zim


def _fft_last(re: jnp.ndarray, im, sign: int):
    """Length-n transform along the last axis.  im=None means real input."""
    n = re.shape[-1]
    if n <= _MAX_MATMUL_N:
        wre, wim = _dft_mats(n, sign)
        return _dft_last(re, im, wre, wim)

    B, C = _best_split(n)
    if B == 0:
        return _bluestein(re, im, sign)

    batch = re.shape[:-1]
    re2 = re.reshape(*batch, B, C)
    im2 = im.reshape(*batch, B, C) if im is not None else None

    # DFT over the B axis: operate on the transposed view (..., C, B)
    yre, yim = _fft_last(
        jnp.swapaxes(re2, -1, -2),
        jnp.swapaxes(im2, -1, -2) if im2 is not None else None,
        sign,
    )
    yre = jnp.swapaxes(yre, -1, -2)  # (..., B=k1, C=n2)
    yim = jnp.swapaxes(yim, -1, -2)

    tre, tim = _twiddle(n, B, C, sign)
    tre = jnp.asarray(tre)
    tim = jnp.asarray(tim)
    zre = yre * tre - yim * tim
    zim = yre * tim + yim * tre

    # DFT over the C axis
    zre, zim = _fft_last(zre, zim, sign)

    # X[k1 + B*k2] = Z[k1, k2] -> transpose to (k2, k1) and flatten
    zre = jnp.swapaxes(zre, -1, -2).reshape(*batch, n)
    zim = jnp.swapaxes(zim, -1, -2).reshape(*batch, n)
    return zre, zim


@lru_cache(maxsize=None)
def _chirp(n: int, m: int, sign: int):
    """Bluestein chirp tables: a[j]=exp(sign*i*pi*j^2/n) (len n) and the
    pre-FFT'd circular kernel b of length m (returned as numpy spectra)."""
    j = np.arange(n, dtype=np.float64)
    ang = (sign * np.pi / n) * (j * j)
    a_re, a_im = np.cos(ang), np.sin(ang)
    b = np.zeros(m, dtype=np.complex128)
    w = np.exp(-1j * sign * np.pi / n * (j * j))
    b[:n] = w
    b[m - n + 1 :] = w[1:][::-1]
    bs = np.fft.fft(b)
    return (
        a_re.astype(np.float32),
        a_im.astype(np.float32),
        np.real(bs).astype(np.float32),
        np.imag(bs).astype(np.float32),
    )


def _bluestein(re: jnp.ndarray, im, sign: int):
    """Chirp-z FFT for awkward (prime) lengths via a 2^k convolution."""
    n = re.shape[-1]
    m = 1 << int(math.ceil(math.log2(2 * n - 1)))
    a_re, a_im, bs_re, bs_im = _chirp(n, m, sign)
    a_re = jnp.asarray(a_re)
    a_im = jnp.asarray(a_im)
    if im is None:
        xre, xim = re * a_re, re * a_im
    else:
        xre = re * a_re - im * a_im
        xim = re * a_im + im * a_re
    pad = [(0, 0)] * (re.ndim - 1) + [(0, m - n)]
    xre = jnp.pad(xre, pad)
    xim = jnp.pad(xim, pad)
    fre, fim = _fft_last(xre, xim, -1)
    gre = fre * jnp.asarray(bs_re) - fim * jnp.asarray(bs_im)
    gim = fre * jnp.asarray(bs_im) + fim * jnp.asarray(bs_re)
    cre, cim = _fft_last(gre, gim, +1)
    cre = cre[..., :n] / m
    cim = cim[..., :n] / m
    return cre * a_re - cim * a_im, cre * a_im + cim * a_re


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def fft_pairs(re: jnp.ndarray, im=None):
    """Forward FFT along the last axis on an (re, im) float32 pair.
    ``im=None`` treats the input as real."""
    re = re.astype(jnp.float32)
    if im is not None:
        im = im.astype(jnp.float32)
    return _fft_last(re, im, -1)


def ifft_pairs(re: jnp.ndarray, im: jnp.ndarray):
    """Inverse FFT along the last axis (includes the 1/n scale)."""
    n = re.shape[-1]
    zre, zim = _fft_last(re.astype(jnp.float32), im.astype(jnp.float32), +1)
    return zre / n, zim / n


def fft2_pairs(re: jnp.ndarray, im=None):
    """Forward 2-D FFT over the last two axes (rows via matmul-FFT,
    columns via the transpose-free axis-2 transform)."""
    re1, im1 = fft_pairs(re, im)
    return _fft_axis2(re1, im1, -1)


def ifft2_pairs(re: jnp.ndarray, im: jnp.ndarray):
    """Inverse 2-D FFT over the last two axes (includes 1/(n1*n2))."""
    n2 = re.shape[-1]
    n1 = re.shape[-2]
    re1, im1 = _fft_last(re.astype(jnp.float32), im.astype(jnp.float32), +1)
    re2, im2 = _fft_axis2(re1, im1, +1)
    s = 1.0 / (n1 * n2)
    return re2 * s, im2 * s


def apply_freq_filter_real(
    x: jnp.ndarray, w_re: jnp.ndarray, w_im=None
) -> jnp.ndarray:
    """Filter real rows in the frequency domain: ifft(fft(x) * w).real.

    ``x`` is (..., R, n) real; ``w_re``/``w_im`` is the FULL-length (n,)
    spectrum of a Hermitian-symmetric filter (so the output is real).  Rows
    are packed in pairs into the (re, im) slots — the classic
    two-real-transforms-per-complex-FFT trick, same as the reference's
    ``r2c_c1dfftshift`` slice packing (``fft_us_kernels.cu:529-557``) —
    which is exact here because filtering by a Hermitian w maps real rows
    to real rows, so the packed result separates by linearity.

    ``w`` must be exactly Hermitian — in particular the DC and Nyquist bins
    must be real (what ``irfft`` implicitly assumes); a complex Nyquist bin
    leaks between the two rows of a pair.
    """
    *lead, R, n = x.shape
    x2 = x.reshape(-1, R, n)
    odd = R % 2
    if odd:
        x2 = jnp.pad(x2, ((0, 0), (0, 1), (0, 0)))
    re = x2[:, 0::2, :]
    im = x2[:, 1::2, :]
    npairs = re.shape[1]
    # On TPU, route both transforms through the fused axis-(-2) Pallas
    # pass on the transposed layout: two cheap transposes replace the
    # row-transform machinery's per-pass fusion-boundary traffic
    # (measured 26.6 -> ~12 ms on the 14408x8192 FBP filter stage).
    # Rows are padded below to a multiple of _pick_lb(n), so probe the
    # divisibility check with exactly that width (not a magic constant —
    # any multiple of _pick_lb(n) passes by construction).
    use_fused = _use_fused_axis2(n, _pick_lb(n), im)
    if use_fused:
        B, C = _best_split(n)
        re_t = jnp.swapaxes(re.reshape(-1, n), 0, 1)  # (n, rows)
        im_t = jnp.swapaxes(im.reshape(-1, n), 0, 1)
        rows = re_t.shape[1]
        pad = (-rows) % _pick_lb(n)
        if pad:
            re_t = jnp.pad(re_t, ((0, 0), (0, pad)))
            im_t = jnp.pad(im_t, ((0, 0), (0, pad)))
        fre, fim = _fft_axis2_fused(re_t, im_t, -1, B, C)
        wr = w_re[:, None]
        if w_im is None:
            gre = fre * wr
            gim = fim * wr
        else:
            wi = w_im[:, None]
            gre = fre * wr - fim * wi
            gim = fre * wi + fim * wr
        yre, yim = _fft_axis2_fused(gre, gim, +1, B, C)
        s = 1.0 / n
        yre = jnp.swapaxes(yre[:, :rows], 0, 1).reshape(-1, npairs, n) * s
        yim = jnp.swapaxes(yim[:, :rows], 0, 1).reshape(-1, npairs, n) * s
    else:
        fre, fim = fft_pairs(re, im)
        if w_im is None:
            gre = fre * w_re
            gim = fim * w_re
        else:
            gre = fre * w_re - fim * w_im
            gim = fre * w_im + fim * w_re
        yre, yim = ifft_pairs(gre, gim)
    y = jnp.stack([yre, yim], axis=2).reshape(x2.shape[0], R + odd, n)
    if odd:
        y = y[:, :R, :]
    return y.reshape(*lead, R, n).astype(x.dtype)
