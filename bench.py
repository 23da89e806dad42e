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

    from tomobar_tpu.bench.harness import device_sync

    def k_iters(k):
        """jit: k outer iterations in one executable (lax.fori_loop)."""

        def run(x, x_t, t, sino):
            def body(_, carry):
                return fista_iter(*carry, sino)

            return jax.lax.fori_loop(0, k, body, (x, x_t, t))

        return jax.jit(run)

    key = jax.random.PRNGKey(0)
    sino = jax.random.uniform(key, (nz, nproj, N), dtype=jnp.float32)
    x = jnp.zeros((nz, N, N), dtype=jnp.float32)
    x_t = jnp.zeros((nz, N, N), dtype=jnp.float32)
    t = jnp.float32(1.0)

    # Two loop lengths; the difference cancels dispatch + readback
    # latency (block_until_ready is NOT a barrier on remote-attached
    # devices -- see bench.harness.device_sync).
    k_lo, k_hi = iters, 3 * iters
    f_lo, f_hi = k_iters(k_lo), k_iters(k_hi)
    device_sync(f_lo(x, x_t, t, sino))  # compile + warm
    device_sync(f_hi(x, x_t, t, sino))

    t0 = timeit.default_timer()
    device_sync(f_lo(x, x_t, t, sino))
    t_lo = timeit.default_timer() - t0
    t0 = timeit.default_timer()
    device_sync(f_hi(x, x_t, t, sino))
    t_hi = timeit.default_timer() - t0
    dt = max(t_hi - t_lo, 1e-9) / (k_hi - k_lo)
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
