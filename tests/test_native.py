"""Native C++ preprocessing runtime: build, bind, and numerically match the
numpy reference path (reference behaviour: suppTools.py:187-264)."""

import numpy as np
import pytest

from tomobar_tpu import native
from tomobar_tpu.utils.tools import normaliser


@pytest.fixture(scope="module")
def raw_stack():
    rng = np.random.default_rng(0)
    data = rng.uniform(100, 60000, (12, 16, 20)).astype(np.float32)
    flats = rng.uniform(50000, 60000, (4, 16, 20)).astype(np.float32)
    darks = rng.uniform(50, 150, (4, 16, 20)).astype(np.float32)
    return data, flats, darks


def _numpy_reference(data, flat, dark, log=True):
    denom = flat - dark
    denom[denom <= 0.0] = 1.0
    nomin = data - dark
    nomin[nomin < 0.0] = 1.0
    out = nomin / denom
    if log:
        out[out > 0.0] = -np.log(out[out > 0.0])
        out[out < 0.0] = 0.0
    return out


class TestNativeBuild:
    def test_builds_and_loads(self):
        # g++ is part of the baked toolchain; the build must succeed here
        assert native.available()


class TestNormalise:
    def test_matches_numpy(self, raw_stack):
        data, flats, darks = raw_stack
        flat = np.mean(flats, axis=0)
        dark = np.mean(darks, axis=0)
        got = native.normalise_native(data, flat, dark, True)
        assert got is not None
        want = _numpy_reference(data.copy(), flat.copy(), dark.copy(), True)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_no_log(self, raw_stack):
        data, flats, darks = raw_stack
        flat = np.mean(flats, axis=0)
        dark = np.mean(darks, axis=0)
        got = native.normalise_native(data, flat, dark, False)
        want = _numpy_reference(data.copy(), flat.copy(), dark.copy(), False)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_normaliser_uses_native(self, raw_stack):
        data, flats, darks = raw_stack
        out = normaliser(data, flats, darks, log=True, method="mean")
        flat = np.mean(flats, axis=0)
        dark = np.mean(darks, axis=0)
        want = _numpy_reference(data.copy(), flat, dark, True)
        np.testing.assert_allclose(out, want, rtol=1e-6, atol=1e-6)


class TestProjStats:
    def test_matches_numpy(self, raw_stack):
        data, _, _ = raw_stack
        res = native.proj_stats_native(data)
        assert res is not None
        mins, maxs, means = res
        np.testing.assert_allclose(mins, data.min(axis=(1, 2)), rtol=1e-6)
        np.testing.assert_allclose(maxs, data.max(axis=(1, 2)), rtol=1e-6)
        np.testing.assert_allclose(means, data.mean(axis=(1, 2)), rtol=1e-5)
