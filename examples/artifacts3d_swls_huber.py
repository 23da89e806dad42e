#!/usr/bin/env python3
"""Artifact-robust reconstruction: SWLS + Huber on corrupted 3D data.

Mirrors the reference's artifact-simulation study
(``Demos/methods_IR_legacy/DemoFISTA_artifacts3D.py:204-298``: PWLS-TV,
then Huber-TV, then SWLS-TV on data with noise + stripes + zingers),
rebuilt on the framework's own phantom and artifact simulators:

* **stripes** — a few detector columns get a persistent offset
  (mis-calibrated elements), which backproject into ring artifacts;
* **zingers** — isolated detector hits with huge spurious values.

Three FISTA-OS-TV runs compare the fidelity choices: plain PWLS (hurt by
both artifact types), Huber (clips zinger residuals), and SWLS + Huber
(additionally down-weights the stripe ray families; see
docs/howto/iterative.md for the provenance of the SWLS weight — it
reconstructs the retired RecToolsIR surface from documented intent).

Run:

    python examples/artifacts3d_swls_huber.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tomobar_tpu import RecToolsIRCuPy
from quickstart_2d import shepp_logan


def rel_rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(b**2)))


def add_artifacts(sino: np.ndarray, rng) -> np.ndarray:
    """Noise + stripes + zingers (the DemoFISTA_artifacts3D recipe,
    rebuilt: the reference uses TomoPhantom's artefacts module)."""
    nz, nang, ndet = sino.shape
    out = sino + rng.normal(0, 0.3, sino.shape).astype(np.float32)
    # stripes: 4 random detector columns per slice, persistent offset
    for z in range(nz):
        cols = rng.choice(ndet, size=4, replace=False)
        out[z, :, cols] += rng.uniform(1.5, 3.0, size=(4, 1)).astype(
            np.float32
        )
    # zingers: 60 isolated huge hits
    zi = rng.integers(0, nz, 60), rng.integers(0, nang, 60), rng.integers(
        0, ndet, 60
    )
    out[zi] += rng.uniform(20.0, 60.0, 60).astype(np.float32)
    return out


def main():
    N = int(os.environ.get("TOMOBAR_EXAMPLE_N", 256))
    nz = 2
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
        OS_number=10,
    )
    rng = np.random.default_rng(3)
    sino = add_artifacts(np.asarray(rt.Atools.fp(phantom)), rng)
    print(f"{nz}x{N}^2 phantom, {len(angles)} angles, stripes + zingers")

    _alg_ = {"iterations": 20, "nonnegativity": True}
    _reg_ = {"method": "PD_TV", "regul_param": 3e-4, "iterations": 40}

    # reuse one instance: the Lipschitz constant is computed once and
    # cached (geometry-only), so the three runs share it
    pwls = np.asarray(
        rt.FISTA(
            {"projection_data": sino, "data_fidelity": "PWLS"},
            dict(_alg_), dict(_reg_),
        )
    )
    print(f"FISTA-PWLS-TV           rel-RMSE: {rel_rmse(pwls, phantom):.4f}")

    huber = np.asarray(
        rt.FISTA(
            {
                "projection_data": sino,
                "data_fidelity": "PWLS",
                "huber_threshold": 1.5,
            },
            dict(_alg_), dict(_reg_),
        )
    )
    print(f"FISTA-PWLS-Huber-TV     rel-RMSE: {rel_rmse(huber, phantom):.4f}")

    swls = np.asarray(
        rt.FISTA(
            {
                "projection_data": sino,
                "data_fidelity": "SWLS",
                "beta_SWLS": 0.2,
                "huber_threshold": 1.5,
            },
            dict(_alg_), dict(_reg_),
        )
    )
    print(f"FISTA-SWLS-Huber-TV     rel-RMSE: {rel_rmse(swls, phantom):.4f}")

    assert rel_rmse(swls, phantom) < rel_rmse(pwls, phantom), (
        "robust fidelities should beat plain PWLS on corrupted data"
    )


if __name__ == "__main__":
    main()
