import timeit
from functools import partial
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_bench")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import tomobar_tpu.ops.projector_pallas as PP

N, nz = 2560, 8
angles = np.linspace(-np.pi/4+0.01, np.pi/4-0.01, 91)
prm = PP._driven_params(np.cos(angles), np.sin(angles), np.zeros(91), N, N, N)
A_pad = prm.alpha.shape[0]
YB = PP._pick_yb(N, nz, prm.NXP)
TPfp = (N + 127)//128*128
TPbp = TPfp + PP._PW
alpha = jnp.asarray(prm.alpha); beta = jnp.asarray(prm.beta); gamma = jnp.asarray(prm.gamma)

k1 = pl.pallas_call(
    partial(PP._shear_fp_kernel, YB=YB, U0=prm.U0, NXP=prm.NXP, ny=N),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(A_pad // PP._AB, N // YB),
        in_specs=[pl.BlockSpec((YB, nz, prm.NXP), lambda ab, yb, *_: (yb, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((PP._AB, nz, prm.LU), lambda ab, yb, *_: (ab, 0, 0), memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((A_pad, nz, prm.LU), jnp.float32),
)
k2 = pl.pallas_call(
    partial(PP._resample_fp_kernel, U0=prm.U0, LU=prm.LU, det_x=prm.det_x, TP=TPfp),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(A_pad,),
        in_specs=[pl.BlockSpec((1, nz, prm.LU), lambda a, *_: (a, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nz, TPfp), lambda a, *_: (a, 0, 0), memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((A_pad, nz, TPfp), jnp.float32),
)
k3 = pl.pallas_call(
    partial(PP._resample_bp_kernel, U0=prm.U0, TP=TPbp, det_x=prm.det_x, LU=prm.LU),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(A_pad,),
        in_specs=[pl.BlockSpec((1, nz, TPbp), lambda a, *_: (a, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, nz, prm.LU), lambda a, *_: (a, 0, 0), memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((A_pad, nz, prm.LU), jnp.float32),
)
k4 = pl.pallas_call(
    partial(PP._unshear_bp_kernel, YB=YB, U0=prm.U0, NXP=prm.NXP, ny=N),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(N // YB, A_pad // PP._AB),
        in_specs=[pl.BlockSpec((PP._AB, nz, prm.LU), lambda yb, ab, *_: (ab, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((YB, nz, prm.NXP), lambda yb, ab, *_: (yb, 0, 0), memory_space=pltpu.VMEM),
    ),
    out_shape=jax.ShapeDtypeStruct((N, nz, prm.NXP), jnp.float32),
)

REPS = 10
def loop_time(fn, x, name):
    @jax.jit
    def run(x):
        def body(_, c):
            o = fn(c)
            # re-shape o back to c's shape cheaply: scale x by max(o)
            return x * (1.0 + 0.0 * jnp.max(o))
        return jax.lax.fori_loop(0, REPS, body, x)
    o = run(x); float(jnp.max(o))
    t0 = timeit.default_timer()
    o = run(x); v = float(jnp.max(o))
    print(f"{name}: {(timeit.default_timer()-t0)/REPS*1000:.1f} ms")

vol_t = jnp.ones((N, nz, prm.NXP), jnp.float32)
s = jnp.ones((A_pad, nz, prm.LU), jnp.float32)
pfp = jnp.ones((A_pad, nz, TPbp), jnp.float32)
q = jnp.ones((A_pad, nz, prm.LU), jnp.float32)
loop_time(lambda v: k1(beta, v), vol_t, "K1 shear     (96 ang)")
loop_time(lambda s_: k2(alpha, gamma, s_), s, "K2 resample  (96 ang)")
loop_time(lambda p_: k3(alpha, gamma, p_), pfp, "K3 resample-T(96 ang)")
loop_time(lambda q_: k4(beta, q_), q, "K4 unshear   (96 ang)")
