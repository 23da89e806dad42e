import timeit
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
from tomobar_tpu.geometry import Geometry
from tomobar_tpu.ops.projector import Projector
from tomobar_tpu.regularisers import PD_TV

N, nz, nproj, osn = 2560, 8, 1801, 10
angles = np.linspace(0, np.pi, nproj, endpoint=False)
geom = Geometry(detectors_x=N, detectors_y=nz, angles=angles, recon_size=N, os_number=osn)
P = Projector(geom)
vol = jnp.full((nz, N, N), 1e-3, jnp.float32)

def timeit_n(make_step, x0, n=10, name=""):
    # chain: x -> step(x) -> ... ; one scalar fetch at the end
    step = jax.jit(make_step)
    o = step(x0); float(jnp.max(o))  # warm + compile
    t0 = timeit.default_timer()
    o = x0
    for _ in range(n):
        o = step(o)
    v = float(jnp.max(o))
    dt = (timeit.default_timer() - t0) / n
    print(f"{name}: {dt*1000:.1f} ms   (max={v:.2e})")
    return dt

# FP subset -> normalize back to vol shape via BP (chains naturally)
t_fpbp = timeit_n(lambda v: P.bp_sub(P.fp_sub(v, 0), 0) * 1e-7, vol, name="FP+BP subset (181 ang)")
t_tv   = timeit_n(lambda v: PD_TV(v, 1e-4, 20, 0, 1, 12.0), vol, name="PD_TV 20 iters")
# FP only: chain by adding a scalar derived from output
t_fp = timeit_n(lambda v: v + 1e-12 * jnp.sum(P.fp_sub(v, 0)), vol, name="FP subset only (+eps)")
print(f"outer iter est: {10*(t_fpbp+t_tv):.2f} s")
