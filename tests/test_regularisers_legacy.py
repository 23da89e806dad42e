"""Legacy (retired RecToolsIR surface) regularisers: FGP_TV, SB_TV,
LLT_ROF, TGV, NDF, Diff4th, NLTV, wavelet shrinkage, and the prox_regul
method-string dispatch (SURVEY.md §2.4; legacy demos
Demos/methods_IR_legacy/*.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tomobar_tpu.regularisers import PD_TV, prox_regul
from tomobar_tpu.regularisers_legacy import (
    FGP_TV,
    SB_TV,
    LLT_ROF,
    TGV,
    NDF,
    Diff4th,
    NLTV,
    WAVELET_SHRINK,
    patch_select,
)


def _rmse(a, b):
    return float(np.sqrt(np.mean((np.asarray(a) - np.asarray(b)) ** 2)))


@pytest.fixture(scope="module")
def noisy_pair(phantom3d):
    clean = np.asarray(phantom3d[0], np.float32)
    rng = np.random.default_rng(7)
    noisy = clean + 0.08 * rng.standard_normal(clean.shape).astype(np.float32)
    return clean, noisy


@pytest.fixture(scope="module")
def noisy_pair3d(phantom3d):
    clean = np.asarray(phantom3d, np.float32)
    rng = np.random.default_rng(11)
    noisy = clean + 0.08 * rng.standard_normal(clean.shape).astype(np.float32)
    return clean, noisy


class TestFGP:
    def test_denoises_2d(self, noisy_pair):
        clean, noisy = noisy_pair
        out = np.asarray(FGP_TV(jnp.asarray(noisy), 0.04, 150))
        assert out.shape == (1,) + clean.shape  # 2D expands like PD_TV
        assert _rmse(out[0], clean) < 0.75 * _rmse(noisy, clean)

    def test_matches_pd_tv_objective(self, noisy_pair):
        """FGP and PD solve the same problem -> near-identical minimisers."""
        clean, noisy = noisy_pair
        a = np.asarray(FGP_TV(jnp.asarray(noisy), 0.04, 400))
        b = np.asarray(PD_TV(jnp.asarray(noisy), 0.04, 1500, 0, 0, 8.0))
        assert _rmse(a, b) < 0.02 * float(np.abs(b).max())

    def test_nonneg_and_aniso(self, noisy_pair):
        _, noisy = noisy_pair
        out = np.asarray(
            FGP_TV(jnp.asarray(noisy), 0.04, 100, methodTV=1, nonneg=1)
        )
        assert out.min() >= 0.0

    def test_3d(self, noisy_pair3d):
        clean, noisy = noisy_pair3d
        out = np.asarray(FGP_TV(jnp.asarray(noisy), 0.04, 120))
        assert out.shape == clean.shape
        assert _rmse(out, clean) < 0.8 * _rmse(noisy, clean)


class TestSB:
    def test_agrees_with_fgp(self, noisy_pair):
        """Same objective as FGP -> solutions agree within a few %."""
        _, noisy = noisy_pair
        a = np.asarray(SB_TV(jnp.asarray(noisy), 0.04, 120))
        b = np.asarray(FGP_TV(jnp.asarray(noisy), 0.04, 400))
        assert _rmse(a, b) < 0.05 * float(np.abs(b).max())

    def test_denoises_aniso(self, noisy_pair):
        clean, noisy = noisy_pair
        out = np.asarray(SB_TV(jnp.asarray(noisy), 0.04, 80, methodTV=1))
        assert _rmse(out[0], clean) < 0.85 * _rmse(noisy, clean)


class TestLLTROF:
    def test_denoises_2d(self, noisy_pair):
        clean, noisy = noisy_pair
        out = np.asarray(
            LLT_ROF(jnp.asarray(noisy), 0.02, 0.01, 400, 0.0025)
        )
        assert _rmse(out[0], clean) < 0.9 * _rmse(noisy, clean)

    def test_denoises_3d(self, noisy_pair3d):
        clean, noisy = noisy_pair3d
        out = np.asarray(
            LLT_ROF(jnp.asarray(noisy), 0.02, 0.01, 300, 0.0025)
        )
        assert out.shape == clean.shape
        assert _rmse(out, clean) < 0.95 * _rmse(noisy, clean)


class TestTGV:
    def test_denoises_2d(self, noisy_pair):
        clean, noisy = noisy_pair
        out = np.asarray(TGV(jnp.asarray(noisy), 0.04, 1.0, 2.0, 300))
        assert _rmse(out[0], clean) < 0.8 * _rmse(noisy, clean)

    def test_ramp_better_than_tv(self):
        """On a piecewise-affine signal TGV avoids TV's staircasing."""
        x = np.linspace(0, 1, 64, dtype=np.float32)
        ramp = np.tile(x, (64, 1))
        rng = np.random.default_rng(3)
        noisy = ramp + 0.05 * rng.standard_normal(ramp.shape).astype(
            np.float32
        )
        tv = np.asarray(PD_TV(jnp.asarray(noisy), 0.08, 600, 0, 0, 8.0))[0]
        tgv = np.asarray(TGV(jnp.asarray(noisy), 0.08, 1.0, 2.0, 600))[0]
        assert _rmse(tgv, ramp) < _rmse(tv, ramp)

    def test_3d_shape(self, noisy_pair3d):
        _, noisy = noisy_pair3d
        out = np.asarray(TGV(jnp.asarray(noisy), 0.03, 1.0, 2.0, 60, 16.0))
        assert out.shape == noisy.shape


class TestNDF:
    # the exponential penalty (3) decays much faster past the edge
    # threshold than the rational one, so it needs a larger edge
    # parameter for comparable diffusion strength
    @pytest.mark.parametrize(
        "penalty,edge", [(1, 0.02), (2, 0.02), (3, 0.04)]
    )
    def test_denoises(self, noisy_pair, penalty, edge):
        clean, noisy = noisy_pair
        out = np.asarray(
            NDF(jnp.asarray(noisy), 4.0, edge, 300, 0.02, penalty)
        )
        assert _rmse(out[0], clean) < 0.9 * _rmse(noisy, clean)


class TestDiff4th:
    def test_denoises(self, noisy_pair):
        clean, noisy = noisy_pair
        out = np.asarray(Diff4th(jnp.asarray(noisy), 4.0, 0.05, 400, 0.001))
        assert _rmse(out[0], clean) < 0.9 * _rmse(noisy, clean)


class TestNLTV:
    def test_patch_select_shapes_and_bounds(self, noisy_pair):
        _, noisy = noisy_pair
        h_i, h_j, w = patch_select(
            jnp.asarray(noisy), search_window=5, similarity_window=1,
            neighbours=8,
        )
        K = 8
        H, W = noisy.shape
        assert h_i.shape == (K, H, W) and h_j.shape == (K, H, W)
        assert w.shape == (K, H, W)
        assert int(np.asarray(h_i).max()) < H
        assert int(np.asarray(h_j).max()) < W
        assert float(np.asarray(w).min()) >= 0.0

    def test_denoises(self, noisy_pair):
        clean, noisy = noisy_pair
        h_i, h_j, w = patch_select(
            jnp.asarray(noisy), search_window=5, similarity_window=1,
            neighbours=8, edge_parameter=0.3,
        )
        out = np.asarray(
            NLTV(jnp.asarray(noisy), h_i, h_j, w, 0.03, iterations=5)
        )
        assert out.shape == noisy.shape
        assert _rmse(out, clean) < 0.85 * _rmse(noisy, clean)


class TestWavelets:
    @pytest.mark.parametrize("shape", [(64, 64), (63, 61), (4, 32, 32)])
    def test_zero_threshold_is_identity(self, shape):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(shape).astype(np.float32)
        out = np.asarray(WAVELET_SHRINK(jnp.asarray(x), 0.0, levels=3))
        np.testing.assert_allclose(out, x, rtol=1e-5, atol=1e-5)

    def test_denoises(self, noisy_pair):
        clean, noisy = noisy_pair
        out = np.asarray(WAVELET_SHRINK(jnp.asarray(noisy), 0.15, levels=3))
        assert _rmse(out, clean) < 0.9 * _rmse(noisy, clean)


class _FakeSelf:
    nonneg_regul = 0


class TestProxDispatch:
    def _regul(self, method, **extra):
        base = dict(
            method=method, regul_param=0.04, iterations=60,
            time_marching_step=0.02, PD_LipschitzConstant=8.0, methodTV=0,
        )
        base.update(extra)
        return base

    @pytest.mark.parametrize(
        "method", ["FGP_TV", "SB_TV", "LLT_ROF", "TGV", "NDF", "Diff4th"]
    )
    def test_methods_dispatch(self, noisy_pair, method):
        _, noisy = noisy_pair
        extra = {}
        if method == "LLT_ROF":
            extra = dict(regul_param2=0.01)
        if method in ("NDF", "Diff4th"):
            extra = dict(edge_param=0.05)
        out = prox_regul(
            _FakeSelf(), jnp.asarray(noisy), self._regul(method, **extra)
        )
        assert np.asarray(out).ndim in (2, 3)

    def test_nltv_dispatch(self, noisy_pair):
        _, noisy = noisy_pair
        h_i, h_j, w = patch_select(
            jnp.asarray(noisy), search_window=3, similarity_window=1,
            neighbours=4,
        )
        out = prox_regul(
            _FakeSelf(),
            jnp.asarray(noisy),
            self._regul(
                "NLTV", NLTV_H_i=h_i, NLTV_H_j=h_j, NLTV_Weights=w,
                IterNumb=3,
            ),
        )
        assert np.asarray(out).shape == noisy.shape

    def test_pd_tv_wavelets_combo(self, noisy_pair):
        """The legacy combined method string applies TV then wavelet
        shrinkage with regul_param2 (DemoFISTA_real_artifacts3D.py)."""
        clean, noisy = noisy_pair
        tv_only = prox_regul(
            _FakeSelf(), jnp.asarray(noisy), self._regul("PD_TV")
        )
        combo = prox_regul(
            _FakeSelf(),
            jnp.asarray(noisy),
            self._regul("PD_TV_WAVELETS", regul_param2=0.05),
        )
        assert np.asarray(combo).shape == np.asarray(tv_only).shape
        # shrinkage must actually change the result
        assert _rmse(combo, tv_only) > 1e-6

    def test_unknown_method_raises(self, noisy_pair):
        _, noisy = noisy_pair
        with pytest.raises(ValueError):
            prox_regul(
                _FakeSelf(), jnp.asarray(noisy), self._regul("NOT_A_METHOD")
            )
