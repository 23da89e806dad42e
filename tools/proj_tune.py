#!/usr/bin/env python3
"""Projector Pallas kernel stage profiler: times the four stages (K1
shear, K2 resample, K3 resample-T, K4 unshear) separately at the flagship
FISTA subset shape, plus the composed FP/BP, under the TOMOBAR_TPU_* env
knobs.  Run on the real chip:

    TOMOBAR_TPU_AB_BP=32 python tools/proj_tune.py

Shape knobs: TOMOBAR_BENCH_N (2560), _NZ (8), _NPROJ (1801), _OS (10).
The subset geometry mirrors what one FISTA-OS gradient step sees: the
OS-interleaved angle subset 0, split into its two driven groups.
"""

import os
import sys
import timeit

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_bench"
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from tomobar_tpu.geometry import Geometry
    from tomobar_tpu.ops import projector_pallas as PP
    from tomobar_tpu.bench.harness import time_fn

    knobs = {
        k: v
        for k, v in os.environ.items()
        if k.startswith("TOMOBAR_TPU_") and "USFFT" not in k
    }
    print("knobs:", knobs or "(defaults)")

    N = int(os.environ.get("TOMOBAR_BENCH_N", 2560))
    nz = int(os.environ.get("TOMOBAR_BENCH_NZ", 8))
    nproj = int(os.environ.get("TOMOBAR_BENCH_NPROJ", 1801))
    os_n = int(os.environ.get("TOMOBAR_BENCH_OS", 10))

    angles = np.linspace(0, np.pi, nproj, endpoint=False, dtype=np.float64)
    geom = Geometry(
        detectors_x=N, detectors_y=nz, angles=angles, recon_size=N,
        os_number=os_n,
    )
    sub = geom.subset(geom.os_indices()[0])
    cos_v, sin_v, idx_x, idx_y = PP._partition(sub.angles)
    print(
        f"subset 0: {sub.n_angles} angles "
        f"({idx_x.size} x-driven, {idx_y.size} y-driven)"
    )

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((nz, N, N)), jnp.float32)
    sino = jnp.asarray(
        rng.standard_normal((nz, sub.n_angles, N)), jnp.float32
    )

    # composed FP / BP on the subset geometry
    fp = jax.jit(lambda v: PP.radon_fp_pallas(v, sub))
    bp = jax.jit(lambda s: PP.radon_bp_pallas(s, sub))
    t_fp = time_fn(fp, vol, reps=5)
    t_bp = time_fn(bp, sino, reps=5)
    print(f"fp_sub total: {t_fp * 1e3:8.2f} ms")
    print(f"bp_sub total: {t_bp * 1e3:8.2f} ms")

    # per-stage timings on the x-driven group (the y-driven group is the
    # same kernels on swapped axes; its angle count is printed above)
    cor = sub.cor_horizontal
    det_x = sub.detectors_x_total
    for name, idx, ab_fp, ab_bp in (
        ("x-driven", idx_x, PP._AB_FP, PP._AB_BP),
        ("y-driven", idx_y, PP._AB_FP, PP._AB_BP),
    ):
        if not idx.size:
            continue
        prm_fp = PP._driven_params(
            cos_v[idx] if name == "x-driven" else sin_v[idx],
            sin_v[idx] if name == "x-driven" else cos_v[idx],
            cor[idx], det_x, N, N, packed=False, ab=ab_fp,
        )
        prm_bp = prm_fp._replace(AB=ab_bp)
        A_pad = prm_fp.alpha.shape[0]

        vol_t = jnp.asarray(
            rng.standard_normal((N, nz, prm_fp.NXP)), jnp.float32
        )
        s_in = jnp.asarray(
            rng.standard_normal((A_pad, nz, prm_fp.LU)), jnp.float32
        )
        TP = PP._round_up(det_x, 128) + PP._PW
        p_in = jnp.asarray(
            rng.standard_normal((A_pad, nz, TP)), jnp.float32
        )

        k1 = jax.jit(lambda v: PP._fp_shear_stage(v, prm_fp))
        k2 = jax.jit(lambda s: PP._fp_resample_stage(s, prm_fp))
        k3 = jax.jit(lambda p: PP._bp_resample_stage(p, prm_bp))
        k4 = jax.jit(lambda q: PP._bp_unshear_stage(q, prm_bp, N, N))
        t1 = time_fn(k1, vol_t, reps=5)
        t2 = time_fn(k2, s_in, reps=5)
        t3 = time_fn(k3, p_in, reps=5)
        t4 = time_fn(k4, s_in, reps=5)
        print(
            f"{name} ({idx.size} ang): "
            f"K1 shear {t1 * 1e3:7.2f}  K2 resample {t2 * 1e3:7.2f}  "
            f"K3 resample-T {t3 * 1e3:7.2f}  K4 unshear {t4 * 1e3:7.2f} ms"
        )


if __name__ == "__main__":
    main()
