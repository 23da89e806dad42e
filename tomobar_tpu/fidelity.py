"""Data-fidelity gradients for FISTA/ADMM (LS, PWLS, KL).

Equivalent of ``tomobar/data_fidelities.py:7-40`` expressed over the
TPU-native projector pair.  ``b`` is post-log data for LS/PWLS and pre-log
raw counts for KL.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

__all__ = ["grad_data_term"]


def grad_data_term(
    projector,
    x: jnp.ndarray,
    b: jnp.ndarray,
    sub_ind: Optional[int] = None,
    w: Optional[jnp.ndarray] = None,
    fidelity: str = "LS",
) -> jnp.ndarray:
    """Gradient of the data-fidelity term: A^T r with
    r = (Ax - b) [optionally * w] for LS/PWLS, or r = 1 - b/clip(Ax) for KL.

    Args:
        projector: :class:`tomobar_tpu.ops.projector.Projector`.
        x: current volume estimate.
        b: projection data (already subset-sliced when sub_ind is given).
        sub_ind: ordered-subset index; None for the full operator.
        w: PWLS weights (already subset-sliced when sub_ind is given).
        fidelity: "LS" | "PWLS" | "KL".
    """
    use_os = sub_ind is not None

    def Ax(v):
        return projector.fp_sub(v, sub_ind) if use_os else projector.fp(v)

    def Atb(r):
        return projector.bp_sub(r, sub_ind) if use_os else projector.bp(r)

    if fidelity in ("LS", "PWLS"):
        res = Ax(x) - b
        if w is not None:
            res = res * w
    elif fidelity == "KL":
        res = 1.0 - b / jnp.clip(Ax(x), 1e-8, None)
    else:
        raise ValueError(f"Unsupported data fidelity: {fidelity}")
    return Atb(res)
