"""Real-chip Pallas kernel goldens (compiled Mosaic, never interpreted).

These only run on the TPU lane::

    TOMOBAR_TPU_TEST_DEVICE=tpu python -m pytest tests/test_tpu_hardware.py

They exist because interpret mode executes kernels with jax/XLA semantics:
Mosaic-only behaviours — dynamic-rotate lowering, strided-roll source
windows, MXU operand rounding — are invisible there.  Each test pins a
behaviour that an actual v5e miscompile or precision regression broke
during development (e.g. the strided rotate mis-sourcing lanes near
source-vreg boundaries for large base shifts, and f32 DEFAULT matmuls
silently rounding operands to bf16).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("TOMOBAR_TPU_TEST_DEVICE") != "tpu",
    reason="real-TPU lane only (TOMOBAR_TPU_TEST_DEVICE=tpu)",
)


def _geom(N, n_ang, cor=0.0, nz=1):
    from tomobar_tpu.geometry import Geometry

    angles = np.linspace(0.0, np.pi, n_ang, endpoint=False)
    return Geometry(
        detectors_x=N, detectors_y=nz, angles=angles,
        center_rot_offset=cor, recon_size=N,
    )


def test_packed_shear_fp_matches_numpy_golden():
    """K1p (row-packed shear-sum) against a direct numpy evaluation of the
    per-row 2-tap placement — catches strided-roll/one-hot-matmul
    miscompiles that agree in interpret mode."""
    import functools
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from tomobar_tpu.ops import projector_pallas as pp

    N = 64
    ny = N
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((ny, N)).astype(np.float32)
    for ang in (0.1, -0.6, 0.75):
        prm = pp._driven_params(
            np.array([np.cos(ang)]), np.array([np.sin(ang)]),
            np.array([0.0]), N, N, N, packed=True,
        )
        A_pad = prm.alpha.shape[0]
        vol_t = np.zeros((ny, 1, prm.NXP), np.float32)
        vol_t[:, 0, :N] = vol
        ny_g = ny // 8
        YBG = pp._pick_yb(ny_g, 8, prm.NXP)
        s = pl.pallas_call(
            functools.partial(
                pp._shear_fp_packed_kernel, YBG=YBG, U0=prm.U0,
                # the test feeds rows pre-padded to NXP, so the kernel's
                # in-VMEM row extension (NXP - NXR) is a no-op here
                NXP=prm.NXP, NXR=prm.NXP, ny=ny, AB=prm.AB,
            ),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(A_pad // prm.AB, ny_g // YBG),
                in_specs=[
                    pl.BlockSpec(
                        (YBG, 8, prm.NXP), lambda ab, yb, *_: (yb, 0, 0),
                        memory_space=pltpu.VMEM,
                    )
                ],
                out_specs=pl.BlockSpec(
                    (prm.AB, 1, prm.LU), lambda ab, yb, *_: (ab, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            out_shape=jax.ShapeDtypeStruct((A_pad, 1, prm.LU), jnp.float32),
        )(jnp.asarray(prm.beta), jnp.asarray(vol_t.reshape(ny_g, 8, prm.NXP)))
        s0 = np.asarray(s[0, 0])

        beta = float(prm.beta[0])
        cy = (ny - 1) / 2.0
        s_ref = np.zeros(prm.LU)
        for y in range(ny):
            sh = beta * (y - cy)
            kf = np.floor(sh)
            f = sh - kf
            o = prm.U0 - int(kf)
            for j in range(N):
                s_ref[o + j] += (1 - f) * vol[y, j]
                s_ref[o - 1 + j] += f * vol[y, j]
        assert np.abs(s0 - s_ref).max() < 2e-4, ang


@pytest.mark.parametrize("nz", [1, 8])
def test_adjointness_on_chip(nz):
    """FP/BP must stay numerical adjoints *as compiled*: bf16-rounded MXU
    resample matmuls broke this at the 1e-3 level before the manual bf16x3
    split."""
    import jax
    import jax.numpy as jnp
    from tomobar_tpu.ops.projector_pallas import (
        radon_bp_pallas, radon_fp_pallas,
    )

    N = 128
    geom = _geom(N, 90, cor=2.5, nz=nz)
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.standard_normal((nz, N, N)), jnp.float32)
    sino = jnp.asarray(rng.standard_normal((nz, 90, N)), jnp.float32)
    lhs = float(jnp.vdot(jax.jit(lambda v: radon_fp_pallas(v, geom))(vol), sino))
    rhs = float(jnp.vdot(vol, jax.jit(lambda s: radon_bp_pallas(s, geom))(sino)))
    assert lhs == pytest.approx(rhs, rel=2e-4)


def test_packed_matches_unpacked_on_chip():
    """Compiled packed (nz=1) path vs compiled unpacked path."""
    import jax
    import jax.numpy as jnp
    from tomobar_tpu.ops import projector_pallas as pp

    N = 128
    geom = _geom(N, 90, cor=2.5, nz=1)
    rng = np.random.default_rng(2)
    vol = jnp.asarray(rng.standard_normal((1, N, N)), jnp.float32)
    sino = jnp.asarray(rng.standard_normal((1, 90, N)), jnp.float32)

    orig = pp._driven_params
    fp_p = np.asarray(jax.jit(lambda v: pp.radon_fp_pallas(v, geom))(vol))
    bp_p = np.asarray(jax.jit(lambda s: pp.radon_bp_pallas(s, geom))(sino))
    pp._driven_params = lambda *a, **k: orig(*a[:6], packed=False)
    try:
        fp_u = np.asarray(jax.jit(lambda v: pp.radon_fp_pallas(v, geom))(vol))
        bp_u = np.asarray(jax.jit(lambda s: pp.radon_bp_pallas(s, geom))(sino))
    finally:
        pp._driven_params = orig
    assert np.abs(fp_p - fp_u).max() < 5e-4 * np.abs(fp_u).max()
    assert np.abs(bp_p - bp_u).max() < 5e-4 * np.abs(bp_u).max()


def test_pd_tv_pallas_matches_xla_on_chip(monkeypatch):
    import jax
    import jax.numpy as jnp
    import tomobar_tpu.ops.pd_tv_pallas as ptp
    from tomobar_tpu.regularisers import PD_TV

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 128)), jnp.float32)
    a = np.asarray(
        jax.jit(lambda v: ptp.pd_tv_pallas(v, 1e-2, 12, 0, 1, 8.0))(x)
    )
    monkeypatch.setattr(ptp, "pd_tv_pallas_supported", lambda shape: False)
    b = np.asarray(jax.jit(lambda v: PD_TV(v, 1e-2, 12, 0, 1, 8.0))(x))
    assert np.abs(a - b).max() < 1e-5 * max(np.abs(b).max(), 1e-30)


def test_sharded_pallas_compiled_on_chip():
    """Pallas kernels under ``shard_map``, COMPILED on the real chip (the
    CPU-lane twin ``test_sharding.py::test_sharded_pallas_path`` only ever
    runs them in interpret mode, which hides Mosaic miscompiles): build a
    1-device mesh on the TPU and require the sharded result to equal the
    single-device Pallas result to the tight 5e-4 bound."""
    import jax
    import jax.numpy as jnp
    from tomobar_tpu.geometry import Geometry
    from tomobar_tpu.ops import projector_pallas
    from tomobar_tpu.parallel.sharding import ShardedProjector, make_mesh

    N, nz, A = 128, 2, 24
    rng = np.random.default_rng(5)
    angles = np.linspace(0, np.pi, A, endpoint=False)
    geom = Geometry(detectors_x=N, detectors_y=nz, angles=angles, recon_size=N)
    vol = jnp.asarray(rng.standard_normal((nz, N, N)), jnp.float32)
    sino = jnp.asarray(rng.standard_normal((nz, A, N)), jnp.float32)

    assert not projector_pallas._INTERPRET[0]
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    sp = ShardedProjector(geom, mesh)
    fp_s = np.asarray(jax.jit(sp.fp)(sp.device_put_vol(vol)))
    bp_s = np.asarray(jax.jit(sp.bp)(sp.device_put_sino(sino)))
    fp_p = np.asarray(jax.jit(lambda v: projector_pallas.radon_fp_pallas(v, geom))(vol))
    bp_p = np.asarray(jax.jit(lambda s: projector_pallas.radon_bp_pallas(s, geom))(sino))
    assert np.abs(fp_s - fp_p).max() < 5e-4 * np.abs(fp_p).max()
    assert np.abs(bp_s - bp_p).max() < 5e-4 * np.abs(bp_p).max()


def test_sharded_direct_compiled_on_chip():
    """ShardedDirect FBP + FOURIER_INV compiled on a 1-device TPU mesh
    (the z-slab shard_map path with the Pallas USFFT gridding inside)
    against the single-device pipeline."""
    import jax
    import jax.numpy as jnp
    from tomobar_tpu.models.direct import RecToolsDIRTPU
    from tomobar_tpu.parallel import ShardedDirect
    from tomobar_tpu.parallel.sharding import make_mesh

    N, nz, A = 128, 4, 32
    rng = np.random.default_rng(6)
    angles = np.linspace(0, np.pi, A, endpoint=False).astype(np.float32)
    rt = RecToolsDIRTPU(N, 0, nz, 0.0, angles, N)
    data = jnp.asarray(rng.standard_normal((nz, A, N)), jnp.float32)

    fi_ref = np.asarray(jax.jit(lambda d: rt.FOURIER_INV(d))(data))
    fbp_ref = np.asarray(
        jax.jit(lambda d: rt.FBP(jnp.swapaxes(d, 0, 1)))(data)
    )
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    sd = ShardedDirect(rt, mesh)
    d = sd.device_put_sino(data)
    fi_s = np.asarray(jax.jit(sd.fourier_inv)(d))
    fbp_s = np.asarray(jax.jit(sd.fbp)(d))
    assert np.abs(fi_s - fi_ref).max() < 5e-4 * np.abs(fi_ref).max()
    assert np.abs(fbp_s - fbp_ref).max() < 5e-4 * np.abs(fbp_ref).max()


def test_strided_roll_nonwrapped_region_exact():
    """Regression probe for the Mosaic strided-rotate artifact: lanes in
    the non-wrapped region must match jnp.roll per sublane exactly for the
    (base < 128, stride 1) configuration the FP kernel relies on."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NXP = 512
    x = np.random.default_rng(4).standard_normal((16, NXP)).astype(np.float32)
    # static strided rolls are verifier-limited to base + in-vreg stride
    # <= 128 ("max shift in a vreg"); the kernels use *dynamic* shifts
    # which bypass that verifier — the packed-FP numpy golden above is
    # what guards the dynamic path at base values up to 127 + d
    for base in (0, 63, 104, 113):
        def k(x_ref, o_ref):
            o_ref[...] = pltpu.roll(
                x_ref[...], base, 1, stride=1, stride_axis=0
            )

        out = np.asarray(
            pl.pallas_call(
                k, out_shape=jax.ShapeDtypeStruct((16, NXP), jnp.float32)
            )(jnp.asarray(x))
        )
        want = np.stack([np.roll(x[d], base + d) for d in range(16)])
        # non-wrapped lanes only: l >= base + d
        for d in range(16):
            lo = base + d
            assert np.array_equal(out[d, lo:], want[d, lo:]), (base, d)
