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
from tomobar_tpu.ops.projector_pallas import (
    radon_bp_pallas,
    radon_bp_pallas_t,
    radon_fp_pallas,
    radon_fp_pallas_t,
)


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


class TestTLayout:
    """t-layout entry points (solver-state layouts: volumes (ny, nz, nx),
    sinograms (angles, nz, det)) must agree exactly with the canonical
    entry points up to the axis permutation — the solvers rely on this to
    run their whole state transposed (solvers/core.py _t_mode_ok)."""

    N = 64

    def _geom(self, cor=0.0, n_ang=45, os_number=1):
        angles = np.linspace(0.0, np.pi, n_ang, endpoint=False)
        return Geometry(
            detectors_x=self.N, detectors_y=2, angles=angles,
            center_rot_offset=cor, recon_size=self.N, os_number=os_number,
        )

    @pytest.mark.parametrize("cor", [0.0, 2.5])
    def test_fp_t_matches_canonical(self, pallas_interpret, phantom3d_small, cor):
        geom = self._geom(cor=cor)
        a = np.asarray(radon_fp_pallas(phantom3d_small, geom))
        b = np.asarray(
            radon_fp_pallas_t(jnp.swapaxes(phantom3d_small, 0, 1), geom)
        )
        np.testing.assert_allclose(np.swapaxes(b, 0, 1), a, rtol=0, atol=1e-5)

    @pytest.mark.parametrize("cor", [0.0, -1.5])
    def test_bp_t_matches_canonical(self, pallas_interpret, cor):
        geom = self._geom(cor=cor)
        rng = np.random.default_rng(3)
        sino = jnp.asarray(
            rng.standard_normal((2, geom.n_angles, self.N)), jnp.float32
        )
        a = np.asarray(radon_bp_pallas(sino, geom))
        b = np.asarray(radon_bp_pallas_t(jnp.swapaxes(sino, 0, 1), geom))
        np.testing.assert_allclose(np.swapaxes(b, 0, 1), a, rtol=0, atol=1e-5)

    def test_fp_t_packed_2d(self, pallas_interpret):
        """nz == 1 routes through the row-packed kernels in t-layout too."""
        geom = self._geom()
        rng = np.random.default_rng(4)
        vol = jnp.asarray(rng.standard_normal((1, self.N, self.N)), jnp.float32)
        a = np.asarray(radon_fp_pallas(vol, geom))
        b = np.asarray(radon_fp_pallas_t(jnp.swapaxes(vol, 0, 1), geom))
        np.testing.assert_allclose(np.swapaxes(b, 0, 1), a, rtol=0, atol=1e-5)
        sino = jnp.asarray(
            rng.standard_normal((1, geom.n_angles, self.N)), jnp.float32
        )
        c = np.asarray(radon_bp_pallas(sino, geom))
        d = np.asarray(radon_bp_pallas_t(jnp.swapaxes(sino, 0, 1), geom))
        np.testing.assert_allclose(np.swapaxes(d, 0, 1), c, rtol=0, atol=1e-5)

    def test_t_adjointness(self, pallas_interpret):
        """<A x, y> == <x, A^T y> holds for the t-layout pair directly."""
        geom = self._geom(cor=1.0)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((self.N, 2, self.N)), jnp.float32)
        y = jnp.asarray(
            rng.standard_normal((geom.n_angles, 2, self.N)), jnp.float32
        )
        ax = radon_fp_pallas_t(x, geom)
        aty = radon_bp_pallas_t(y, geom)
        lhs = float(jnp.vdot(ax, y))
        rhs = float(jnp.vdot(x, aty))
        assert abs(lhs - rhs) < 1e-3 * max(abs(lhs), 1.0)

    @pytest.mark.parametrize("solver", ["fista", "admm"])
    def test_solver_t_mode_matches_canonical(self, monkeypatch, solver):
        """Forcing t-mode on the interpret-mode Pallas backend reproduces
        the canonical-layout solver result exactly (the dispatch the real
        TPU path takes via Projector.supports_t)."""
        from tomobar_tpu.ops import projector as proj_mod
        from tomobar_tpu.solvers import core as S

        geom = self._geom(n_ang=8, os_number=2)
        monkeypatch.setattr(proj_mod, "_BACKEND", "pallas")
        projector_pallas._INTERPRET[0] = True
        try:
            P = proj_mod.Projector(geom)
            rng = np.random.default_rng(6)
            sino = jnp.asarray(
                rng.standard_normal((2, geom.n_angles, self.N)), jnp.float32
            )
            fn = S.fista if solver == "fista" else S.admm
            monkeypatch.setattr(
                proj_mod.Projector, "supports_t", lambda self: False
            )
            a = np.asarray(
                fn(P, sino, iterations=2, lipschitz_const=50.0,
                   nonnegativity=True)
            )
            monkeypatch.setattr(
                proj_mod.Projector, "supports_t", lambda self: True
            )
            b = np.asarray(
                fn(P, sino, iterations=2, lipschitz_const=50.0,
                   nonnegativity=True)
            )
        finally:
            projector_pallas._INTERPRET[0] = False
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)

    def test_pd_tv_t_layout_xla(self, vol):
        """PD_TV(layout="t") == transposed PD_TV of the transposed input
        on the XLA path (TV is axis-symmetric)."""
        a = np.asarray(PD_TV(vol, 1e-2, 30))
        b = np.asarray(
            PD_TV(jnp.swapaxes(vol, 0, 1), 1e-2, 30, layout="t")
        )
        np.testing.assert_allclose(np.swapaxes(b, 0, 1), a, rtol=0, atol=2e-5)

    def test_pd_tv_t_layout_kernel(self, vol):
        """pd_tv_pallas(layout="t") skips the entry/exit transposes but
        matches the canonical kernel exactly."""
        a = np.asarray(pd_tv_pallas(vol, 0.1, 15, 0, 0, 8.0, interpret=True))
        b = np.asarray(
            pd_tv_pallas(
                jnp.swapaxes(vol, 0, 1), 0.1, 15, 0, 0, 8.0,
                interpret=True, layout="t",
            )
        )
        np.testing.assert_allclose(np.swapaxes(b, 0, 1), a, rtol=0, atol=0)


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
