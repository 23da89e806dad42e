"""TV regulariser tests (modelled on reference tests/test_regularisers.py:
denoising behaviour, shape/squeeze logic, half-precision variant)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tomobar_tpu.regularisers import PD_TV, ROF_TV


@pytest.fixture(scope="module")
def noisy2d(phantom2d):
    rng = np.random.default_rng(0)
    return (phantom2d + 0.2 * rng.standard_normal(phantom2d.shape)).astype(
        np.float32
    )


@pytest.fixture(scope="module")
def noisy3d(phantom3d):
    rng = np.random.default_rng(0)
    return (phantom3d + 0.2 * rng.standard_normal(phantom3d.shape)).astype(
        np.float32
    )


def tv_norm(x):
    x = np.asarray(x, dtype=np.float64)
    gx = np.diff(x, axis=-1)
    gy = np.diff(x, axis=-2)
    return float(np.abs(gx).sum() + np.abs(gy).sum())


class TestPDTV:
    def test_denoises_2d(self, noisy2d, phantom2d):
        out = np.asarray(PD_TV(jnp.asarray(noisy2d), 0.1, 200, 0, 0, 8.0))
        assert out.shape == (1,) + noisy2d.shape  # 2D expanded to 3D (parity)
        out = out[0]
        before = np.sqrt(np.mean((noisy2d - phantom2d) ** 2))
        after = np.sqrt(np.mean((out - phantom2d) ** 2))
        assert after < before
        assert tv_norm(out) < tv_norm(noisy2d)

    def test_denoises_3d(self, noisy3d, phantom3d):
        out = np.asarray(PD_TV(jnp.asarray(noisy3d), 0.1, 100, 0, 0, 8.0))
        assert out.shape == noisy3d.shape
        assert np.sqrt(np.mean((out - phantom3d) ** 2)) < np.sqrt(
            np.mean((noisy3d - phantom3d) ** 2)
        )

    def test_aniso_variant(self, noisy2d):
        out = np.asarray(PD_TV(jnp.asarray(noisy2d), 0.1, 50, 1, 0, 8.0))
        assert np.isfinite(out).all()

    def test_nonneg_variant(self, noisy2d):
        out = np.asarray(PD_TV(jnp.asarray(noisy2d), 0.1, 100, 0, 1, 8.0))
        free = np.asarray(PD_TV(jnp.asarray(noisy2d), 0.1, 100, 0, 0, 8.0))
        # nonneg clamps the primal inside the iteration; the over-relaxation
        # step after the clamp can undershoot slightly (reference behaviour:
        # U_out = U_new + theta*(U_new - clamped U)), so the output is not
        # exactly >= 0 — but the negative mass must be strongly suppressed
        # relative to the unconstrained variant
        neg = lambda a: float(np.abs(a[a < 0]).sum())
        assert out.min() > -0.2
        assert neg(out) < 0.25 * neg(free)

    def test_half_precision_close_to_full(self, noisy2d):
        full = np.asarray(PD_TV(jnp.asarray(noisy2d), 0.1, 50, 0, 0, 8.0))
        half = np.asarray(
            PD_TV(jnp.asarray(noisy2d), 0.1, 50, 0, 0, 8.0, half_precision=True)
        )
        assert np.abs(full - half).mean() < 0.02

    def test_singleton_3d_squeeze(self, noisy2d):
        x3 = jnp.asarray(noisy2d)[None]  # (1, H, W)
        out = np.asarray(PD_TV(x3, 0.1, 20, 0, 0, 8.0))
        assert out.shape == x3.shape


class TestROFTV:
    def test_denoises_2d(self, noisy2d, phantom2d):
        out = np.asarray(
            ROF_TV(jnp.asarray(noisy2d), 0.06, 300, 0.001)
        )
        assert out.shape == (1,) + noisy2d.shape
        out = out[0]
        assert np.sqrt(np.mean((out - phantom2d) ** 2)) < np.sqrt(
            np.mean((noisy2d - phantom2d) ** 2)
        )

    def test_denoises_3d(self, noisy3d, phantom3d):
        out = np.asarray(ROF_TV(jnp.asarray(noisy3d), 0.06, 150, 0.001))
        assert out.shape == noisy3d.shape
        assert np.sqrt(np.mean((out - phantom3d) ** 2)) < np.sqrt(
            np.mean((noisy3d - phantom3d) ** 2)
        )

    def test_bad_ndim_raises(self):
        with pytest.raises(ValueError):
            ROF_TV(jnp.zeros((2, 2, 2, 2)), 0.1, 10, 0.001)
