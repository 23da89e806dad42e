#!/usr/bin/env python3
"""USFFT gridding kernel tuner: times usfft_grid_pallas at the bench shape
under the TOMOBAR_TPU_USFFT_* env knobs and checks correctness against the
XLA scatter oracle at a small shape.

Usage:  TOMOBAR_TPU_USFFT_ACH=16 python tools/grid_tune.py [--skip-check]
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

    from tomobar_tpu.ops import usfft as U
    from tomobar_tpu.ops import usfft_pallas as UP
    from tomobar_tpu.bench.harness import time_fn

    knobs = {
        k: v for k, v in os.environ.items() if k.startswith("TOMOBAR_TPU_USFFT")
    }
    print("knobs:", knobs or "(defaults)")

    # --- correctness vs oracle at small shape (compiled, real device) ----
    if "--skip-check" not in sys.argv:
        n_s = 256
        nproj_s = 180
        theta_s = -np.linspace(0, np.pi, nproj_s, endpoint=False)
        rng = np.random.default_rng(0)
        dre = jnp.asarray(rng.standard_normal((2, nproj_s, n_s)), jnp.float32)
        dim = jnp.asarray(rng.standard_normal((2, nproj_s, n_s)), jnp.float32)
        fre_o, fim_o = jax.jit(
            lambda r, i: U.usfft_grid(r, i, n_s, theta_s, 1e-4)
        )(dre, dim)
        fre_p, fim_p = jax.jit(
            lambda r, i: UP.usfft_grid_pallas(r, i, n_s, theta_s, 1e-4)
        )(dre, dim)
        err = float(
            jnp.linalg.norm(fre_p - fre_o) + jnp.linalg.norm(fim_p - fim_o)
        ) / float(jnp.linalg.norm(fre_o) + jnp.linalg.norm(fim_o))
        print(f"oracle rel err: {err:.2e}")
        if err > 5e-3:
            print("FAIL: kernel does not match oracle")
            sys.exit(1)

    # --- timing at the bench shape ---------------------------------------
    N = int(os.environ.get("TOMOBAR_BENCH_N", 2560))
    nz = int(os.environ.get("TOMOBAR_BENCH_NZ", 8))
    nproj = int(os.environ.get("TOMOBAR_BENCH_NPROJ", 1801))
    theta = -np.linspace(0, np.pi, nproj, endpoint=False)
    rng = np.random.default_rng(1)
    dre = jnp.asarray(
        rng.standard_normal((nz // 2, nproj, N)), jnp.float32
    )
    dim = jnp.asarray(
        rng.standard_normal((nz // 2, nproj, N)), jnp.float32
    )
    grid = jax.jit(lambda r, i: UP.usfft_grid_pallas(r, i, N, theta, 1e-4))
    t = time_fn(lambda a: grid(*a), (dre, dim), reps=5)
    print(f"grid stage ({nproj}x{nz}x{N}): {t * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
