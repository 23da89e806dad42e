"""Benchmark harness: FISTA-OS-TV 3D iterations/s on the flagship config.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

The reference publishes no quantitative numbers (BASELINE.md: "published": {});
the driver-defined north-star is FISTA-OS-TV iterations/s on a 2560^2 x 8
TomoPhantom-style 3D problem at GPU-parity wall-clock.  ``vs_baseline`` is
reported against an estimated ASTRA+CuPy FISTA-OS outer-iteration time on a
data-center GPU for the same geometry (~1.0 s/outer-iteration for
1801 angles x 2560^2 x 8 slices, extrapolated from ToMoBAR demo timings);
update when a measured reference number becomes available.

Falls back to a smaller config (and finally to an error record) rather than
dying without output — the driver keys on the JSON line.

Env overrides: TOMOBAR_BENCH_N, _NZ, _NPROJ, _OS, _ITERS, _TV_ITERS.
"""

import json
import os
import timeit
import traceback

import numpy as np


def run_config(N, nz, nproj, os_number, iters, tv_iters):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tomobar_tpu.geometry import Geometry
    from tomobar_tpu.ops.projector import Projector
    from tomobar_tpu.regularisers import PD_TV

    angles = np.linspace(0, np.pi, nproj, endpoint=False)
    geom = Geometry(
        detectors_x=N,
        detectors_y=nz,
        angles=angles,
        recon_size=N,
        os_number=os_number,
    )
    P = Projector(geom)
    n_sub = len(P.subset_indices)
    L_inv = jnp.float32(1.0 / 5000.0)

    def fista_iter(x, x_t, t, sino):
        """One OUTER FISTA iteration: full OS sweep + PD-TV prox."""
        for s in range(n_sub):
            x_old, t_old = x, t
            res = P.fp_sub(x_t, s) - P.sino_subset(sino, s)
            grad = P.bp_sub(res, s)
            x = jnp.maximum(x_t - L_inv * grad, 0.0)
            x = PD_TV(x, 1e-4, tv_iters, 0, 1, 12.0)
            t = (1.0 + jnp.sqrt(1.0 + 4.0 * t * t)) * 0.5
            x_t = x + ((t_old - 1.0) / t) * (x - x_old)
        return x, x_t, t

    step = jax.jit(fista_iter, donate_argnums=(0, 1))

    key = jax.random.PRNGKey(0)
    sino = jax.random.uniform(key, (nz, nproj, N), dtype=jnp.float32)
    x = jnp.zeros((nz, N, N), dtype=jnp.float32)
    x_t = jnp.zeros((nz, N, N), dtype=jnp.float32)
    t = jnp.float32(1.0)

    # warmup / compile
    x, x_t, t = step(x, x_t, t, sino)
    jax.block_until_ready(x)

    t0 = timeit.default_timer()
    for _ in range(iters):
        x, x_t, t = step(x, x_t, t, sino)
    jax.block_until_ready(x)
    dt = (timeit.default_timer() - t0) / iters
    return 1.0 / dt


def main():
    N = int(os.environ.get("TOMOBAR_BENCH_N", 2560))
    nz = int(os.environ.get("TOMOBAR_BENCH_NZ", 8))
    nproj = int(os.environ.get("TOMOBAR_BENCH_NPROJ", 1801))
    os_number = int(os.environ.get("TOMOBAR_BENCH_OS", 10))
    iters = int(os.environ.get("TOMOBAR_BENCH_ITERS", 3))
    tv_iters = int(os.environ.get("TOMOBAR_BENCH_TV_ITERS", 20))

    # estimated reference (ASTRA+CuPy on data-center GPU): ~1.0 s / outer
    # iteration for the full config => 1.0 it/s (no published baseline)
    baseline_its_per_s = 1.0
    configs = [
        (N, nz, nproj, os_number, iters, tv_iters, baseline_its_per_s, ""),
        # fallback: quarter-size problem; the reference-estimate scales
        # roughly with N^2 (per-slice work), so ~16x the iteration rate
        (N // 4, nz, nproj // 4 + 1, os_number, iters, tv_iters,
         baseline_its_per_s * 16.0, " [fallback-small]"),
    ]
    for (cN, cnz, cnp, cos, cit, ctv, base, tag) in configs:
        try:
            its_per_s = run_config(cN, cnz, cnp, cos, cit, ctv)
            print(
                json.dumps(
                    {
                        "metric": f"FISTA-OS{cos}-TV outer iterations/s "
                        f"({cnp}x{cnz}x{cN}, TV{ctv}){tag}",
                        "value": round(its_per_s, 4),
                        "unit": "iter/s",
                        "vs_baseline": round(its_per_s / base, 4),
                    }
                )
            )
            return
        except Exception:
            traceback.print_exc()
            continue
    print(
        json.dumps(
            {
                "metric": "FISTA-OS-TV outer iterations/s",
                "value": 0.0,
                "unit": "iter/s",
                "vs_baseline": 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
