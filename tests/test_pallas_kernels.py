"""Pallas kernel semantics, validated in interpret mode on CPU (exact
agreement with the XLA reference paths).  Hardware-mode runs are covered
when TOMOBAR_TPU_TEST_DEVICE=tpu."""

import numpy as np
import jax.numpy as jnp
import pytest

from tomobar_tpu.regularisers import PD_TV
from tomobar_tpu.ops.pd_tv_pallas import pd_tv_pallas, pd_tv_pallas_supported


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.standard_normal((4, 32, 128)), dtype=jnp.float32)


class TestPDTVPallas:
    @pytest.mark.parametrize("mtv,nn", [(0, 0), (0, 1), (1, 0), (1, 1)])
    def test_matches_xla(self, vol, mtv, nn):
        a = np.asarray(PD_TV(vol, 0.1, 15, mtv, nn, 8.0))
        b = np.asarray(
            pd_tv_pallas(vol, 0.1, 15, mtv, nn, 8.0, interpret=True)
        )
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    def test_single_slice(self, vol):
        x1 = vol[:1]
        a = np.asarray(PD_TV(x1, 0.1, 15, 0, 0, 8.0))
        b = np.asarray(pd_tv_pallas(x1, 0.1, 15, 0, 0, 8.0, interpret=True))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    def test_bf16_duals_close(self, vol):
        a = np.asarray(
            pd_tv_pallas(vol, 0.1, 15, 0, 0, 8.0, interpret=True)
        )
        b = np.asarray(
            pd_tv_pallas(
                vol, 0.1, 15, 0, 0, 8.0, half_precision=True, interpret=True
            )
        )
        assert np.abs(a - b).mean() < 0.02

    def test_support_predicate(self):
        assert pd_tv_pallas_supported((8, 128, 256))
        assert not pd_tv_pallas_supported((8, 128, 250))  # nx % 128 != 0
        assert not pd_tv_pallas_supported((8, 6, 256))  # ny too small
