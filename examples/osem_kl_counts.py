#!/usr/bin/env python3
"""OSEM and FISTA-KL on Poisson count data (emission model).

Demonstrates the two count-statistics solvers the quick-start skips,
using the measurement model they are actually derived for:
``counts ~ Poisson(A x)`` with ``x`` a nonnegative activity map —

* **OSEM** (``RecToolsIRCuPy.OSEM``, reference ``methodsIR_CuPy.py:587``)
  — multiplicative EM updates over ordered subsets (MLEM when OS=1);
  the EM update is the exact maximum-likelihood iteration for this model.
  The demo sets ``osem_normalisation="divide"`` (textbook EM): the
  default ``"reference"`` reproduces the reference's multiply-by-
  sensitivity quirk (``methodsIR_CuPy.py:654``) for golden parity, which
  diverges in scale on real emission data.
* **FISTA with the KL fidelity** (``data_fidelities.py:31-40``: the
  gradient ``A^T(1 - b/clip(Ax))`` with ``b`` the PRE-log raw counts) —
  the same Poisson likelihood, but solvable with TV regularisation and
  momentum, which pure EM lacks.
* **FISTA-LS** at the same iteration budget as the comparison point: the
  Gaussian approximation visibly trails both at low counts.

Run:

    python examples/osem_kl_counts.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tomobar_tpu import RecToolsIRCuPy
from quickstart_2d import shepp_logan


def rel_rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b**2)))


def main():
    N = int(os.environ.get("TOMOBAR_EXAMPLE_N", 256))
    nz = 2
    # mean counts per detector cell at the sinogram's peak; lower = noisier
    peak_counts = float(os.environ.get("TOMOBAR_EXAMPLE_COUNTS", 50.0))
    angles = np.linspace(0, np.pi, int(1.5 * N), endpoint=False)
    phantom = shepp_logan(N)[None] * np.asarray(
        [0.95, 1.05], np.float32
    )[:, None, None]

    rt = RecToolsIRCuPy(
        DetectorsDimH=N,
        DetectorsDimH_pad=0,
        DetectorsDimV=nz,
        CenterRotOffset=0.0,
        AnglesVec=angles,
        ObjSize=N,
        OS_number=8,
    )
    lam = np.asarray(rt.Atools.fp(phantom))  # expected counts (detY,ang,detX)
    scale = peak_counts / lam.max()
    rng = np.random.default_rng(7)
    counts = rng.poisson(lam * scale).astype(np.float32)
    print(
        f"{nz}x{N}^2 activity phantom, {len(angles)} angles, "
        f"peak {peak_counts:g} counts/cell "
        f"(total {counts.sum() / 1e6:.1f}M events)"
    )
    # solvers reconstruct in the projector's native scale
    b = counts / scale

    # ---- OSEM: exact EM for Poisson(Ax) ----------------------------------
    osem = np.asarray(
        rt.OSEM(
            {"projection_data": b},
            {"iterations": 15, "recon_mask_radius": 2.0,
             "osem_normalisation": "divide"},
        )
    )
    print(f"OSEM (OS=8, 15 it)      rel-RMSE: {rel_rmse(osem, phantom):.4f}")

    # ---- MLEM = OSEM with OS_number=1 ------------------------------------
    rt1 = RecToolsIRCuPy(N, 0, nz, 0.0, angles, N, OS_number=1)
    mlem = np.asarray(
        rt1.OSEM(
            {"projection_data": b},
            {"iterations": 30, "recon_mask_radius": 2.0,
             "osem_normalisation": "divide"},
        )
    )
    print(f"MLEM (30 it)            rel-RMSE: {rel_rmse(mlem, phantom):.4f}")

    # ---- FISTA-KL-TV on the same counts ----------------------------------
    # KL's gradient divides by clip(Ax, 1e-8): a zero initialisation makes
    # the first residual ~1e8x too large (true of the reference's KL too),
    # so warm-start from the OSEM estimate — the natural EM -> regularised
    # refinement pipeline.
    kl = np.asarray(
        rt.FISTA(
            {"projection_data": b, "data_fidelity": "KL"},
            {"iterations": 20, "nonnegativity": True, "initialise": osem},
            {"method": "PD_TV", "regul_param": 3e-4, "iterations": 40},
        )
    )
    print(f"FISTA-OS8-KL-TV (20 it) rel-RMSE: {rel_rmse(kl, phantom):.4f}")

    # ---- FISTA-LS-TV comparison (Gaussian approximation) -----------------
    ls = np.asarray(
        rt.FISTA(
            {"projection_data": b},
            {"iterations": 20, "nonnegativity": True},
            {"method": "PD_TV", "regul_param": 3e-4, "iterations": 40},
        )
    )
    print(f"FISTA-OS8-LS-TV (20 it) rel-RMSE: {rel_rmse(ls, phantom):.4f}")


if __name__ == "__main__":
    main()
