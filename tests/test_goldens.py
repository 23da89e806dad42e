"""Frozen golden-value regressions on the fixed synthetic phantom.

The reference's core test philosophy is exact-shape + min/max/mean goldens
with tight rtol on fixed data (``tests/test_RecToolsIRCuPy.py:320-323``);
threshold-only tests cannot catch silent numeric drift between rounds.

Two frozen tables: ``GOLDEN_CPU`` (XLA float32 path) and ``GOLDEN_TPU``
(v5e: Pallas kernels, bf16x3 projector dots, DEFAULT-precision FFT
matmuls — a deliberately different numerical path, so its goldens are
frozen from hardware, not expected to match CPU at 3e-4).  Regenerate
deliberately after an intentional numeric change with::

    python tests/test_goldens.py                       # CPU table
    TOMOBAR_TPU_TEST_DEVICE=tpu python tests/test_goldens.py   # TPU table
"""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import dev_tol, on_real_device

from tomobar_tpu import RecToolsDIRCuPy, RecToolsIRCuPy

RTOL = 3e-4

GOLDEN_CPU = {
    "lc_os5": 1102.98193359375,
    "landweber": (0.0, 0.3156959116458893, 0.10711159557104111),
    "sirt": (-0.08311305195093155, 1.1595118045806885, 0.1213618814945221),
    "cgls": (-0.24761369824409485, 1.347556471824646, 0.1218322142958641),
    "fista_os_tv": (0.0, 1.2763731479644775, 0.12191416323184967),
    "admm_rof": (-0.03473756089806557, 0.7040730118751526, 0.12001736462116241),
    "osem": (0.0, 676.2928466796875, 39.737606048583984),
    "fourier_inv_shepp": (-1.5269206762313843, 3.203871488571167, 0.2956569790840149),
    "fbp_device": (-0.4902627170085907, 2.0110180377960205, 0.06773578375577927),
}

# frozen on a v5e via the regeneration entry point (see module docstring).
# r5 refreeze: (a) the runtime/libtpu shipped between rounds shifted
# FBP's min by ~1e-3 relative (verified: the UNCHANGED r4 snapshot fails
# the r4 value on the new runtime), and (b) the r5 angle-stacked gridding
# kernel intentionally drops the tap mask (tails ~4e-9) and reorders the
# accumulation, moving fourier_inv stats within its oracle tolerance.
GOLDEN_TPU = {
    "lc_os5": 1102.52197265625,
    "landweber": (0.0, 0.30725428462028503, 0.10709908604621887),
    "sirt": (-0.07319526374340057, 1.1466529369354248, 0.1213892325758934),
    "cgls": (-0.2022751122713089, 1.3826395273208618, 0.1217867061495781),
    "fista_os_tv": (0.0, 1.3484827280044556, 0.12198518216609955),
    "admm_rof": (-0.03080042265355587, 0.6806007623672485, 0.12003545463085175),
    "osem": (0.0, 591.0172119140625, 39.64720916748047),
    "fourier_inv_shepp": (-1.4091283082962036, 3.0587525367736816, 0.29604941606521606),
    "fbp_device": (-0.5044039487838745, 1.8665635585784912, 0.06771515309810638),
}


def _golden_table():
    return GOLDEN_TPU if on_real_device() else GOLDEN_CPU



def _stats(x):
    x = np.asarray(x)
    return float(x.min()), float(x.max()), float(x.mean())


def _check(name, rec):
    table = _golden_table()
    if name not in table:
        pytest.skip(f"no {name} golden frozen for this device yet")
    got = _stats(rec)
    want = table[name]
    for g, w, label in zip(got, want, ("min", "max", "mean")):
        assert g == pytest.approx(w, rel=RTOL, abs=1e-7), (
            f"{name}.{label}: got {g!r}, golden {w!r}"
        )


@pytest.fixture(scope="module")
def gp(phantom3d, sino3d, angles180):
    data = {"projection_data": jnp.asarray(sino3d)}
    return dict(
        data=data,
        sino=sino3d,
        os5=RecToolsIRCuPy(64, 0, 4, 0.0, angles180, 64, OS_number=5),
        classic=RecToolsIRCuPy(64, 0, 4, 0.0, angles180, 64),
        direct=RecToolsDIRCuPy(64, 0, 4, 0.0, angles180, 64),
    )


class TestGoldens:
    def test_lipschitz(self, gp):
        table = _golden_table()
        if "lc_os5" not in table:
            pytest.skip("no lc_os5 golden frozen for this device yet")
        lc = float(gp["os5"].powermethod(gp["data"]))
        assert lc == pytest.approx(table["lc_os5"], rel=RTOL)

    def test_landweber(self, gp):
        _check("landweber", gp["classic"].Landweber(gp["data"], {"iterations": 50}))

    def test_sirt(self, gp):
        _check("sirt", gp["classic"].SIRT(gp["data"], {"iterations": 50}))

    def test_cgls(self, gp):
        _check("cgls", gp["classic"].CGLS(gp["data"], {"iterations": 10}))

    def test_fista_os_tv(self, gp):
        _check(
            "fista_os_tv",
            gp["os5"].FISTA(
                gp["data"],
                {"iterations": 8, "nonnegativity": True},
                {"method": "PD_TV", "regul_param": 5e-4, "iterations": 30},
            ),
        )

    def test_admm_rof(self, gp):
        _check(
            "admm_rof",
            gp["os5"].ADMM(
                gp["data"],
                {"iterations": 3},
                {"method": "ROF_TV", "regul_param": 1e-3, "iterations": 40},
            ),
        )

    def test_osem(self, gp):
        _check("osem", gp["os5"].OSEM(gp["data"], {"iterations": 5}))

    def test_fourier_inv(self, gp):
        _check(
            "fourier_inv_shepp",
            gp["direct"].FOURIER_INV(
                jnp.asarray(gp["sino"]), filter_type="shepp"
            ),
        )

    def test_fbp(self, gp):
        _check(
            "fbp_device",
            gp["direct"].FBP(jnp.swapaxes(jnp.asarray(gp["sino"]), 0, 1)),
        )


class TestKLFidelity:
    """KL fidelity on Poisson-like pre-log counts (the reference's KL takes
    raw counts: res = 1 - counts/clip(Ax); data_fidelities.py:7-40)."""

    def test_kl_converges_on_counts(self, phantom3d, sino3d, angles180):
        """KL models the projections as Poisson means directly
        (grad = A^T(1 - b/Ax), so the minimiser satisfies Ax ~ b): feed
        Poisson-corrupted projections of a positive phantom and the KL
        reconstruction must recover it."""
        rng = np.random.default_rng(11)
        scale = 50.0  # mean counts per detector cell ~ 50 x sino values
        counts = rng.poisson(scale * np.asarray(sino3d)).astype(np.float32)
        rt = RecToolsIRCuPy(64, 0, 4, 0.0, angles180, 64, OS_number=5)
        # KL needs a strictly positive start (grad has b/Ax; from zeros the
        # first step is 1/clip(0) ~ 1e8 and diverges — same as the
        # reference, whose OSEM starts from ones for the same reason)
        x0 = 0.1 * np.ones((4, 64, 64), np.float32)
        rec = rt.FISTA(
            {
                "projection_data": jnp.asarray(counts / scale),
                "data_fidelity": "KL",
            },
            {"iterations": 15, "nonnegativity": True, "initialise": x0},
            {"method": "PD_TV", "regul_param": 5e-4, "iterations": 30},
        )
        rec = np.asarray(rec)
        ph = np.asarray(phantom3d)
        corr = np.corrcoef(rec.ravel(), ph.ravel())[0, 1]
        assert corr > dev_tol(0.85, 0.80), corr
        err = np.sqrt(np.mean((rec - ph) ** 2)) / np.sqrt(np.mean(ph**2))
        assert err < dev_tol(0.5, 0.58), err

    def test_kl_matches_reference_gradient_form(self, sino3d, angles180):
        """grad = A^T(1 - b/clip(Ax)) — zero when Ax == b exactly."""
        from tomobar_tpu.fidelity import grad_data_term
        from tomobar_tpu.geometry import Geometry
        from tomobar_tpu.ops.projector import Projector

        geom = Geometry(
            detectors_x=64, detectors_y=4, angles=angles180, recon_size=64
        )
        P = Projector(geom)
        x = jnp.ones((4, 64, 64), dtype=jnp.float32)
        b = P.fp(x)
        g = grad_data_term(P, x, b, fidelity="KL")
        assert float(jnp.abs(g).max()) < 1e-3


def _regenerate():
    """Compute the golden table for the current device and print it
    (paste into GOLDEN_CPU / GOLDEN_TPU above)."""
    import conftest as _cf

    # replicate the conftest fixtures exactly (angles180 is 90 angles;
    # phantom slices scaled 0.8..1.2)
    angles180 = np.linspace(0.0, np.pi, 90, endpoint=False)
    sl = _cf.shepp_logan_slice(64)
    scale = np.linspace(0.8, 1.2, 4, dtype=np.float32)
    ph = (sl[None, :, :] * scale[:, None, None]).astype(np.float32)
    from tomobar_tpu.geometry import Geometry
    from tomobar_tpu.ops.projector import radon_fp

    geom = Geometry(detectors_x=64, detectors_y=4, angles=angles180,
                    recon_size=64)
    sino3d = np.asarray(radon_fp(jnp.asarray(ph), geom))
    data = {"projection_data": jnp.asarray(sino3d)}
    os5 = RecToolsIRCuPy(64, 0, 4, 0.0, angles180, 64, OS_number=5)
    classic = RecToolsIRCuPy(64, 0, 4, 0.0, angles180, 64)
    direct = RecToolsDIRCuPy(64, 0, 4, 0.0, angles180, 64)

    out = {"lc_os5": float(os5.powermethod(dict(data)))}
    out["landweber"] = _stats(classic.Landweber(dict(data), {"iterations": 50}))
    out["sirt"] = _stats(classic.SIRT(dict(data), {"iterations": 50}))
    out["cgls"] = _stats(classic.CGLS(dict(data), {"iterations": 10}))
    out["fista_os_tv"] = _stats(os5.FISTA(
        dict(data), {"iterations": 8, "nonnegativity": True},
        {"method": "PD_TV", "regul_param": 5e-4, "iterations": 30}))
    out["admm_rof"] = _stats(os5.ADMM(
        dict(data), {"iterations": 3},
        {"method": "ROF_TV", "regul_param": 1e-3, "iterations": 40}))
    out["osem"] = _stats(os5.OSEM(dict(data), {"iterations": 5}))
    out["fourier_inv_shepp"] = _stats(direct.FOURIER_INV(
        jnp.asarray(sino3d), filter_type="shepp"))
    out["fbp_device"] = _stats(direct.FBP(
        jnp.swapaxes(jnp.asarray(sino3d), 0, 1)))
    import jax

    print(f"# device: {jax.devices()[0]}")
    for k, v in out.items():
        print(f'    "{k}": {v!r},')


if __name__ == "__main__":
    _regenerate()
