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
beta = jnp.asarray(prm.beta)
_AB = PP._AB
U0, NXP, LU = prm.U0, prm.NXP, prm.LU

def make_variant(mode):
    def kern(beta_ref, q_ref, vol_ref):
        yb = pl.program_id(0); ab = pl.program_id(1)
        @pl.when(ab == 0)
        def _():
            vol_ref[...] = jnp.zeros_like(vol_ref)
        cy = (N - 1) / 2.0
        def row_body(i, _):
            y = (yb * YB + i).astype(jnp.float32)
            def ang_body(ia, acc):
                b = beta_ref[ab * _AB + ia]
                shift = b * (y - cy)
                kf = jnp.floor(shift)
                f = shift - kf
                o = U0 - kf.astype(jnp.int32)
                o1 = o - 1
                o1_hi = o1 // 128
                o1_lo = o1 - o1_hi * 128
                off = pl.multiple_of(o1_hi * 128, 128)
                win = q_ref[ia, :, pl.ds(off, NXP)]
                if mode == "load_only":
                    return acc + f * win
                wr = pltpu.roll(win, NXP - o1_lo - 1, 1)
                if mode == "load_roll":
                    return acc + f * wr
                wr_m1 = pltpu.roll(wr, 1, 1)
                return acc + (wr + f * (wr_m1 - wr))
            acc = jax.lax.fori_loop(0, _AB, ang_body, jnp.zeros_like(vol_ref[i]), unroll=_AB)
            vol_ref[i] += acc
            return 0
        jax.lax.fori_loop(0, YB, row_body, 0)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N // YB, A_pad // _AB),
            in_specs=[pl.BlockSpec((_AB, nz, LU), lambda yb, ab, *_: (ab, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((YB, nz, NXP), lambda yb, ab, *_: (yb, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, nz, NXP), jnp.float32),
    )

q = jnp.ones((A_pad, nz, LU), jnp.float32)
REPS = 10
def loop_time(fn, x, name):
    @jax.jit
    def run(x):
        def body(_, c):
            o = fn(c)
            return x * (1.0 + 0.0 * jnp.max(o))
        return jax.lax.fori_loop(0, REPS, body, x)
    o = run(x); float(jnp.max(o))
    t0 = timeit.default_timer()
    o = run(x); v = float(jnp.max(o))
    print(f"{name}: {(timeit.default_timer()-t0)/REPS*1000:.1f} ms")

for mode in ("load_only", "load_roll", "full"):
    k = make_variant(mode)
    loop_time(lambda q_: k(beta, q_), q, f"K4[{mode}]")

def make_multi_acc(n_acc):
    def kern(beta_ref, q_ref, vol_ref):
        yb = pl.program_id(0); ab = pl.program_id(1)
        @pl.when(ab == 0)
        def _():
            vol_ref[...] = jnp.zeros_like(vol_ref)
        cy = (N - 1) / 2.0
        def row_body(i, _):
            y = (yb * YB + i).astype(jnp.float32)
            def ang_body(ia, accs):
                b = beta_ref[ab * _AB + ia]
                shift = b * (y - cy)
                kf = jnp.floor(shift)
                f = shift - kf
                o = U0 - kf.astype(jnp.int32)
                o1 = o - 1
                o1_hi = o1 // 128
                o1_lo = o1 - o1_hi * 128
                off = pl.multiple_of(o1_hi * 128, 128)
                win = q_ref[ia, :, pl.ds(off, NXP)]
                wr = pltpu.roll(win, NXP - o1_lo - 1, 1)
                wr_m1 = pltpu.roll(wr, 1, 1)
                c = wr + f * (wr_m1 - wr)
                k = ia % n_acc
                return tuple(a + c if j == k else a for j, a in enumerate(accs))
            z = jnp.zeros_like(vol_ref[i])
            accs = (z,) * n_acc
            for ia_ in range(_AB):
                accs = ang_body(ia_, accs)
            tot = accs[0]
            for a in accs[1:]:
                tot = tot + a
            vol_ref[i] += tot
            return 0
        jax.lax.fori_loop(0, YB, row_body, 0)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N // YB, A_pad // _AB),
            in_specs=[pl.BlockSpec((_AB, nz, LU), lambda yb, ab, *_: (ab, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((YB, nz, NXP), lambda yb, ab, *_: (yb, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, nz, NXP), jnp.float32),
    )

for na in (2, 4):
    k = make_multi_acc(na)
    loop_time(lambda q_: k(beta, q_), q, f"K4[acc x{na}]")

def make_static_load():
    def kern(beta_ref, q_ref, vol_ref):
        yb = pl.program_id(0); ab = pl.program_id(1)
        @pl.when(ab == 0)
        def _():
            vol_ref[...] = jnp.zeros_like(vol_ref)
        cy = (N - 1) / 2.0
        def row_body(i, _):
            y = (yb * YB + i).astype(jnp.float32)
            def ang_body(ia, acc):
                b = beta_ref[ab * _AB + ia]
                shift = b * (y - cy)
                kf = jnp.floor(shift)
                f = shift - kf
                o = U0 - kf.astype(jnp.int32)
                o1 = o - 1
                o1_hi = o1 // 128
                o1_lo = o1 - o1_hi * 128
                win = q_ref[ia, :, 0:NXP]   # STATIC load (wrong math, perf probe)
                wr = pltpu.roll(win, NXP - o1_lo - 1, 1)
                wr_m1 = pltpu.roll(wr, 1, 1)
                return acc + (wr + f * (wr_m1 - wr))
            acc = jax.lax.fori_loop(0, _AB, ang_body, jnp.zeros_like(vol_ref[i]), unroll=_AB)
            vol_ref[i] += acc
            return 0
        jax.lax.fori_loop(0, YB, row_body, 0)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N // YB, A_pad // _AB),
            in_specs=[pl.BlockSpec((_AB, nz, LU), lambda yb, ab, *_: (ab, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((YB, nz, NXP), lambda yb, ab, *_: (yb, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, nz, NXP), jnp.float32),
    )
k = make_static_load()
loop_time(lambda q_: k(beta, q_), q, "K4[static-load]")

def make_one_roll():
    # single dynamic roll; derive nothing else (perf probe for roll cost)
    def kern(beta_ref, q_ref, vol_ref):
        yb = pl.program_id(0); ab = pl.program_id(1)
        @pl.when(ab == 0)
        def _():
            vol_ref[...] = jnp.zeros_like(vol_ref)
        cy = (N - 1) / 2.0
        def row_body(i, _):
            y = (yb * YB + i).astype(jnp.float32)
            def ang_body(ia, acc):
                b = beta_ref[ab * _AB + ia]
                shift = b * (y - cy)
                kf = jnp.floor(shift)
                f = shift - kf
                o = U0 - kf.astype(jnp.int32)
                o1 = o - 1
                o1_hi = o1 // 128
                o1_lo = o1 - o1_hi * 128
                off = pl.multiple_of(o1_hi * 128, 128)
                win = q_ref[ia, :, pl.ds(off, NXP)]
                wr = pltpu.roll(win, NXP - o1_lo - 1, 1)
                return acc + (wr + f * wr)
            acc = jax.lax.fori_loop(0, _AB, ang_body, jnp.zeros_like(vol_ref[i]), unroll=_AB)
            vol_ref[i] += acc
            return 0
        jax.lax.fori_loop(0, YB, row_body, 0)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(N // YB, A_pad // _AB),
            in_specs=[pl.BlockSpec((_AB, nz, LU), lambda yb, ab, *_: (ab, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((YB, nz, NXP), lambda yb, ab, *_: (yb, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((N, nz, NXP), jnp.float32),
    )
k = make_one_roll()
loop_time(lambda q_: k(beta, q_), q, "K4[one-roll+2fma]")
