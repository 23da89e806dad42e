"""Roofline-report sanity: no reported utilisation may exceed 1.0 and no
rate may be derived from a ~0 ms timing (VERDICT r4 weak-1/next-3: the r4
bench emitted mxu utilisations of 1.23 and a petabyte/s bandwidth from a
0 ms stage)."""

import numpy as np

from tomobar_tpu.bench.breakdown import (
    _HBM_PEAK,
    _MIN_RATE_DT,
    _VPU_PEAK,
    stage_report,
)


def _check_bounds(rec):
    for k, v in rec.items():
        if k.endswith("_util"):
            assert 0.0 < v <= 1.0, (k, v)


def test_normal_stage_within_bounds(capsys):
    # 10 ms doing half the peak's worth of flops -> util 0.5
    rec = stage_report("half-peak", 1e-2, flops=0.5 * _VPU_PEAK * 1e-2)
    _check_bounds(rec)
    assert abs(rec["vpu_util"] - 0.5) < 1e-6
    capsys.readouterr()


def test_impossible_model_is_clamped_and_flagged(capsys):
    # a broken flop model claiming 3x the peak: reported util must clamp
    # to 1.0 with the raw value kept visible for debugging
    rec = stage_report("broken-model", 1e-2, flops=3.0 * _VPU_PEAK * 1e-2)
    _check_bounds(rec)
    assert rec["vpu_util"] == 1.0
    assert rec["vpu_util_raw"] == 3.0
    capsys.readouterr()


def test_zero_ms_stage_reports_no_rates(capsys):
    rec = stage_report("instant", 1e-7, flops=1e9, bytes_moved=1e9)
    assert "gflops" not in rec and "hbm_gbs" not in rec
    assert "vpu_util" not in rec and "hbm_util" not in rec
    assert rec["below_timer_resolution"] is True
    assert rec["ms"] < _MIN_RATE_DT * 1e3
    capsys.readouterr()


def test_hbm_util_bounded(capsys):
    rec = stage_report(
        "membound", 1e-3, bytes_moved=10.0 * _HBM_PEAK * 1e-3
    )
    _check_bounds(rec)
    assert rec["hbm_util"] == 1.0 and rec["hbm_util_raw"] == 10.0
    capsys.readouterr()


def test_fourier_models_cannot_exceed_peak():
    """The executed-MAC models must sit at or below the physically
    available MAC count: at the r4 measured stage times, the corrected
    models must imply utilisation <= 1 (the r4 models implied 1.23)."""
    from tomobar_tpu.bench.fourier_breakdown import (
        _MXU_FFT_PEAK,
        _fft_macs_per_row,
    )

    nz, nproj, n = 8, 1801, 2560
    ow = 8192
    # corrected filter model: complex pair-packed rows, fwd+inv
    filter_flops = 2 * (nz * ((nproj + 1) // 2)) * 2 * _fft_macs_per_row(ow)
    # r4 measured 24.13 ms for this stage on v5e
    util = filter_flops / 24.13e-3 / _MXU_FFT_PEAK
    assert 0.0 < util <= 1.0, util
    ifft2_flops = 2 * (nz // 2) * 2 * (2 * n) * _fft_macs_per_row(2 * n)
    util2 = ifft2_flops / 23.7e-3 / _MXU_FFT_PEAK
    assert 0.0 < util2 <= 1.0, util2
