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
    """Forward 2-D FFT over the last two axes."""
    re1, im1 = fft_pairs(re, im)
    re1 = jnp.swapaxes(re1, -1, -2)
    im1 = jnp.swapaxes(im1, -1, -2)
    re2, im2 = fft_pairs(re1, im1)
    return jnp.swapaxes(re2, -1, -2), jnp.swapaxes(im2, -1, -2)


def ifft2_pairs(re: jnp.ndarray, im: jnp.ndarray):
    """Inverse 2-D FFT over the last two axes (includes 1/(n1*n2))."""
    re1, im1 = ifft_pairs(re, im)
    re1 = jnp.swapaxes(re1, -1, -2)
    im1 = jnp.swapaxes(im1, -1, -2)
    re2, im2 = ifft_pairs(re1, im1)
    return jnp.swapaxes(re2, -1, -2), jnp.swapaxes(im2, -1, -2)


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
