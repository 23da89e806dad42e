"""Per-component timing breakdown of the flagship FISTA-OS-TV config.

Times FP-subset, BP-subset, PD-TV, and the full outer iteration separately
so perf work can target the dominant term.  Run on the real chip:

    python -m tomobar_tpu.bench.breakdown
"""

import os
import timeit

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_bench")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from tomobar_tpu.geometry import Geometry
    from tomobar_tpu.ops.projector import Projector
    from tomobar_tpu.regularisers import PD_TV

    d = jax.devices()[0]
    print(f"platform={d.platform} kind={getattr(d, 'device_kind', '?')}")

    N = int(os.environ.get("TOMOBAR_BENCH_N", 2560))
    nz = int(os.environ.get("TOMOBAR_BENCH_NZ", 8))
    nproj = int(os.environ.get("TOMOBAR_BENCH_NPROJ", 1801))
    os_number = int(os.environ.get("TOMOBAR_BENCH_OS", 10))
    tv_iters = int(os.environ.get("TOMOBAR_BENCH_TV_ITERS", 20))

    angles = np.linspace(0, np.pi, nproj, endpoint=False)
    geom = Geometry(
        detectors_x=N, detectors_y=nz, angles=angles, recon_size=N,
        os_number=os_number,
    )
    P = Projector(geom)

    key = jax.random.PRNGKey(0)
    sino = jax.random.uniform(key, (nz, nproj, N), dtype=jnp.float32)
    x = jax.random.uniform(key, (nz, N, N), dtype=jnp.float32)
    sub0 = jax.device_put(np.asarray(P.sino_subset(sino, 0)))

    from tomobar_tpu.bench.harness import time_fn as _time_fn

    def time_fn(name, fn, *args, reps=20, bytes_moved=None):
        dt = _time_fn(fn, *args, reps=reps)
        bw = f"  eff-BW={bytes_moved / dt / 1e9:.0f} GB/s" if bytes_moved else ""
        print(f"{name:34s} {dt * 1e3:9.2f} ms{bw}")
        return dt

    vol_b = nz * N * N * 4

    fp0 = jax.jit(lambda v: P.fp_sub(v, 0))
    bp0 = jax.jit(lambda s: P.bp_sub(s, 0))
    tv = jax.jit(lambda v: PD_TV(v, 1e-4, tv_iters, 0, 1, 12.0))
    tv_h = jax.jit(
        lambda v: PD_TV(v, 1e-4, tv_iters, 0, 1, 12.0, half_precision=True)
    )

    t_fp = time_fn("FP subset0", fp0, x)
    t_bp = time_fn("BP subset0", bp0, sub0)
    t_tv = time_fn(
        f"PD-TV x{tv_iters} f32", tv, x, bytes_moved=9 * vol_b * tv_iters
    )
    time_fn(
        f"PD-TV x{tv_iters} bf16 duals", tv_h, x,
        bytes_moved=6 * vol_b * tv_iters,
    )

    est = os_number * (t_fp + t_bp + t_tv)
    print(f"sum estimate ({os_number} subsets):   {est * 1e3:9.2f} ms")


if __name__ == "__main__":
    main()
