"""Pallas kernel semantics, validated in interpret mode on CPU (exact
agreement with the XLA reference paths).  Hardware-mode runs are covered
when TOMOBAR_TPU_TEST_DEVICE=tpu."""

import numpy as np
import jax.numpy as jnp
import pytest

from tomobar_tpu.geometry import Geometry
from tomobar_tpu.regularisers import PD_TV
from tomobar_tpu.ops.pd_tv_pallas import pd_tv_pallas, pd_tv_pallas_supported
from tomobar_tpu.ops import projector_pallas
from tomobar_tpu.ops.projector import radon_bp, radon_fp
from tomobar_tpu.ops.projector_pallas import radon_bp_pallas, radon_fp_pallas


import os

_ON_TPU = os.environ.get("TOMOBAR_TPU_TEST_DEVICE") == "tpu"


@pytest.fixture()
def pallas_interpret():
    """Interpret mode on CPU; compiled Mosaic when the TPU lane is active
    (TOMOBAR_TPU_TEST_DEVICE=tpu) so miscompiles can't hide behind the
    interpreter (see also tests/test_tpu_hardware.py)."""
    projector_pallas._INTERPRET[0] = not _ON_TPU
    yield
    projector_pallas._INTERPRET[0] = False


class TestProjectorPallas:
    """The two-pass shear/resample kernels vs the XLA Joseph path and vs
    each other (adjointness) — the test matrix test_projector.py runs for
    the XLA backend (reference invariants: test_RecToolsDIRCuPy.py:253-338).
    The two backends use different interpolation (2-pass separable vs
    1-pass Joseph), so the cross-backend comparison is a documented ~1-2%
    tolerance while adjointness within the Pallas pair is float-exact."""

    N = 64

    def _geom(self, cor=0.0, n_ang=45):
        angles = np.linspace(0.0, np.pi, n_ang, endpoint=False)
        return Geometry(
            detectors_x=self.N, detectors_y=2, angles=angles,
            center_rot_offset=cor, recon_size=self.N,
        )

    def test_fp_matches_xla(self, pallas_interpret, phantom3d_small):
        """2-pass separable vs 1-pass Joseph differ at phantom edges
        (max ~13% of peak at N=64, shrinking with N); RMS is the honest
        cross-scheme metric at ~1.7% of peak here."""
        geom = self._geom()
        a = np.asarray(radon_fp(phantom3d_small, geom))
        b = np.asarray(radon_fp_pallas(phantom3d_small, geom))
        peak = np.abs(a).max()
        assert np.sqrt(((a - b) ** 2).mean()) < 0.025 * peak
        assert np.abs(a - b).max() < 0.15 * peak

    def test_bp_matches_xla(self, pallas_interpret, phantom3d_small):
        geom = self._geom()
        sino = radon_fp(phantom3d_small, geom)
        a = np.asarray(radon_bp(sino, geom))
        b = np.asarray(radon_bp_pallas(sino, geom))
        peak = np.abs(a).max()
        assert np.sqrt(((a - b) ** 2).mean()) < 0.02 * peak
        assert np.abs(a - b).max() < 0.1 * peak

    @pytest.mark.parametrize("cor", [0.0, 3.5, "per_angle"])
    def test_adjointness(self, pallas_interpret, cor):
        n_ang = 45
        if cor == "per_angle":
            cor = np.linspace(-2.0, 2.0, n_ang)
        geom = self._geom(cor=cor, n_ang=n_ang)
        rng = np.random.default_rng(3)
        x = jnp.asarray(
            rng.standard_normal((2, self.N, self.N)), dtype=jnp.float32
        )
        y = jnp.asarray(
            rng.standard_normal((2, n_ang, self.N)), dtype=jnp.float32
        )
        lhs = float(jnp.vdot(radon_fp_pallas(x, geom), y))
        rhs = float(jnp.vdot(x, radon_bp_pallas(y, geom)))
        assert lhs == pytest.approx(rhs, rel=1e-4)

    def test_scalar_cor_shifts_sinogram(self, pallas_interpret, phantom3d_small):
        """A CoR offset shifts every projection by the offset along detX
        (detector-shift semantics, supp/funcs.py:22-41)."""
        g0 = self._geom(cor=0.0)
        g4 = self._geom(cor=4.0)
        s0 = np.asarray(radon_fp_pallas(phantom3d_small, g0))
        s4 = np.asarray(radon_fp_pallas(phantom3d_small, g4))
        np.testing.assert_allclose(
            s4[:, :, : self.N - 4], s0[:, :, 4:], rtol=1e-3,
            atol=1e-4 * np.abs(s0).max(),
        )

    @pytest.mark.parametrize("cor", [0.0, 3.7])
    def test_packed_2d_matches_unpacked(self, pallas_interpret, cor):
        """The nz == 1 row-packed kernels (K1p/K4p, 8 image rows on the
        sublane axis, one-hot MXU tap matrices + strided/prestacked
        diagonal shifts) must agree with the plain z-on-sublanes kernels
        to bf16x3 accuracy (~2^-17 relative)."""
        angles = np.linspace(0.0, np.pi, 45, endpoint=False)
        geom = Geometry(
            detectors_x=self.N, detectors_y=1, angles=angles,
            center_rot_offset=cor, recon_size=self.N,
        )
        rng = np.random.default_rng(5)
        vol = jnp.asarray(
            rng.standard_normal((1, self.N, self.N)), jnp.float32
        )
        sino = jnp.asarray(rng.standard_normal((1, 45, self.N)), jnp.float32)

        orig = projector_pallas._driven_params

        def unpacked(*a, **k):
            return orig(*a[:6], packed=False)

        fp_p = np.asarray(radon_fp_pallas(vol, geom))
        bp_p = np.asarray(radon_bp_pallas(sino, geom))
        assert orig(
            np.cos(angles), np.sin(angles), np.full(45, float(cor)),
            self.N, self.N, self.N, packed=True,
        ).packed
        projector_pallas._driven_params = unpacked
        try:
            fp_u = np.asarray(radon_fp_pallas(vol, geom))
            bp_u = np.asarray(radon_bp_pallas(sino, geom))
        finally:
            projector_pallas._driven_params = orig
        assert np.abs(fp_p - fp_u).max() < 2e-4 * np.abs(fp_u).max()
        assert np.abs(bp_p - bp_u).max() < 2e-4 * np.abs(bp_u).max()
        # the packed pair must itself be an adjoint pair
        lhs = float(jnp.vdot(radon_fp_pallas(vol, geom), sino))
        rhs = float(jnp.vdot(vol, radon_bp_pallas(sino, geom)))
        assert lhs == pytest.approx(rhs, rel=2e-4)

    def test_os_subsets_tile_full_fp(self, pallas_interpret, phantom3d_small):
        """Concatenating per-subset FPs reproduces the full FP rows."""
        from tomobar_tpu.ops.projector import Projector

        angles = np.linspace(0.0, np.pi, 44, endpoint=False)
        geom = Geometry(
            detectors_x=self.N, detectors_y=2, angles=angles,
            recon_size=self.N, os_number=4,
        )
        P = Projector(geom)
        full = np.asarray(radon_fp_pallas(phantom3d_small, geom))
        for s, ind in enumerate(P.subset_indices):
            sub = np.asarray(radon_fp_pallas(phantom3d_small, P._sub_geoms[s]))
            np.testing.assert_allclose(
                sub, full[:, ind, :], rtol=1e-5, atol=1e-6
            )


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

    @pytest.mark.parametrize("iters,k", [(7, 3), (2, 4), (5, 1), (4, 4)])
    def test_wavefront_fusion_matches_xla(self, vol, iters, k, monkeypatch):
        import tomobar_tpu.ops.pd_tv_pallas as mod

        monkeypatch.setattr(mod, "_K_FUSE", k)
        a = np.asarray(PD_TV(vol, 0.1, iters, 0, 1, 8.0))
        b = np.asarray(pd_tv_pallas(vol, 0.1, iters, 0, 1, 8.0, interpret=True))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    @pytest.mark.parametrize("nz", [2, 3, 5, 8])
    def test_thin_slab_z_padding_exact(self, nz):
        """1 < nz < 8 pads z to a full 8-sublane tile inside the kernel
        (partial tiles measured ~1.8x slower on chip); the logical-nz
        boundary masks must keep the padded slices out of the result."""
        rng = np.random.default_rng(7)
        v = jnp.asarray(rng.standard_normal((nz, 16, 128)), jnp.float32)
        a = np.asarray(PD_TV(v, 0.1, 11, 0, 1, 8.0))
        b = np.asarray(pd_tv_pallas(v, 0.1, 11, 0, 1, 8.0, interpret=True))
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)

    def test_support_predicate(self):
        assert pd_tv_pallas_supported((8, 128, 256))
        assert not pd_tv_pallas_supported((8, 128, 250))  # nx % 128 != 0
        assert not pd_tv_pallas_supported((8, 6, 256))  # ny too small
