import sys, timeit
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tomobar_tpu import RecToolsDIRCuPy

N = int(sys.argv[1]); nz = 8; nproj = int(sys.argv[2])
which = sys.argv[3] if len(sys.argv) > 3 else "finv"
angles = np.linspace(0, np.pi, nproj, endpoint=False)
rt = RecToolsDIRCuPy(N, 0, nz, 0.0, angles, N)
data = jnp.ones((nz, nproj, N), jnp.float32)

def bench(f, name, n=5):
    o = f(); float(jnp.max(o))
    t0 = timeit.default_timer()
    for _ in range(n):
        o = f()
    v = float(jnp.max(o))
    print(f"{name}: {(timeit.default_timer()-t0)/n*1000:.1f} ms (max={v:.3e})")

if which == "finv":
    bench(lambda: rt.FOURIER_INV(data), f"FOURIER_INV {nproj}x8x{N}")
else:
    bench(lambda: rt.FBP(data, data_axes_labels_order=["detY","angles","detX"]), f"FBP {nproj}x8x{N}")
