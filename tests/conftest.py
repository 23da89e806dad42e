"""Test fixtures: synthetic phantom data (the reference's .npz blobs are not
in the mirror, so we generate our own — see SURVEY.md §4).

Tests run on CPU with 8 virtual devices so sharding tests work anywhere;
set TOMOBAR_TPU_TEST_DEVICE=tpu to run on real hardware.
"""

import os

_USE_CPU = os.environ.get("TOMOBAR_TPU_TEST_DEVICE", "cpu") == "cpu"
if _USE_CPU:
    os.environ["JAX_PLATFORMS"] = "cpu"  # override any ambient axon/tpu setting
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if _USE_CPU:
    # jax may already be imported by a sitecustomize hook (which locks the
    # env-derived platform choice), so set the config directly too.
    jax.config.update("jax_platforms", "cpu")
import numpy as np
import pytest

# persistent compile cache: geometry-specialised projectors recompile often.
# Keyed per-platform: axon remote-compiled AOT blobs are built for a different
# machine-feature set and must not be shared with the host CPU cache.
jax.config.update(
    "jax_compilation_cache_dir",
    f"/tmp/jax_cache_tomobar_tests_{'cpu' if _USE_CPU else 'tpu'}",
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def on_real_device() -> bool:
    """True on the real-TPU test lane (TOMOBAR_TPU_TEST_DEVICE=tpu).

    Cross-kernel comparisons (packed vs unpacked Pallas variants, Pallas
    vs XLA) are bit-identical on the CPU lane but differ at the bf16x3
    matmul precision (~2^-17 relative) on chip; tests widen tolerances
    accordingly."""
    return not _USE_CPU


def dev_tol(cpu_val, tpu_val):
    """Pick a threshold per lane: the chip path is a different discrete
    operator (2-pass separable interpolation, bf16x3 dots) whose recon of
    tiny sharp phantoms carries ~10-25% higher rel-RMSE than the Joseph
    XLA path the CPU thresholds were tuned on."""
    return tpu_val if on_real_device() else cpu_val


def shepp_logan_slice(n: int) -> np.ndarray:
    """A simple Shepp-Logan-like phantom slice (ellipse superposition)."""
    # (value, a, b, x0, y0, phi_deg)
    ellipses = [
        (1.0, 0.69, 0.92, 0.0, 0.0, 0.0),
        (-0.8, 0.6624, 0.874, 0.0, -0.0184, 0.0),
        (-0.2, 0.11, 0.31, 0.22, 0.0, -18.0),
        (-0.2, 0.16, 0.41, -0.22, 0.0, 18.0),
        (0.1, 0.21, 0.25, 0.0, 0.35, 0.0),
        (0.1, 0.046, 0.046, 0.0, 0.1, 0.0),
        (0.1, 0.046, 0.023, -0.08, -0.605, 0.0),
        (0.1, 0.023, 0.046, 0.06, -0.605, 0.0),
    ]
    y, x = np.mgrid[-1 : 1 : n * 1j, -1 : 1 : n * 1j]
    img = np.zeros((n, n), dtype=np.float32)
    for val, a, b, x0, y0, phi in ellipses:
        phi = np.deg2rad(phi)
        xr = (x - x0) * np.cos(phi) + (y - y0) * np.sin(phi)
        yr = -(x - x0) * np.sin(phi) + (y - y0) * np.cos(phi)
        img[(xr / a) ** 2 + (yr / b) ** 2 <= 1.0] += val
    return img


@pytest.fixture(scope="session")
def phantom2d():
    return shepp_logan_slice(64)


@pytest.fixture(scope="session")
def phantom3d():
    sl = shepp_logan_slice(64)
    scale = np.linspace(0.8, 1.2, 4, dtype=np.float32)
    return sl[None, :, :] * scale[:, None, None]


@pytest.fixture(scope="session")
def phantom3d_small():
    """2-slice variant for interpret-mode Pallas kernel tests."""
    import jax.numpy as jnp

    sl = shepp_logan_slice(64)
    scale = np.asarray([0.9, 1.1], dtype=np.float32)
    return jnp.asarray(sl[None, :, :] * scale[:, None, None])


@pytest.fixture(scope="session")
def angles180():
    return np.linspace(0, np.pi, 90, endpoint=False)


@pytest.fixture(scope="session")
def sino2d(phantom2d, angles180):
    """Clean analytic-free sinogram produced by our own projector (used for
    solver convergence tests)."""
    import jax.numpy as jnp

    from tomobar_tpu.geometry import Geometry
    from tomobar_tpu.ops.projector import radon_fp

    geom = Geometry(
        detectors_x=phantom2d.shape[0],
        detectors_y=None,
        angles=angles180,
        recon_size=phantom2d.shape[0],
    )
    return np.asarray(radon_fp(jnp.asarray(phantom2d), geom))


@pytest.fixture(scope="session")
def sino3d(phantom3d, angles180):
    import jax.numpy as jnp

    from tomobar_tpu.geometry import Geometry
    from tomobar_tpu.ops.projector import radon_fp

    geom = Geometry(
        detectors_x=phantom3d.shape[1],
        detectors_y=phantom3d.shape[0],
        angles=angles180,
        recon_size=phantom3d.shape[1],
    )
    return np.asarray(radon_fp(jnp.asarray(phantom3d), geom))


def rmse(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return float(np.sqrt(np.mean((a - b) ** 2)))


@pytest.fixture(scope="session")
def rmse_fn():
    return rmse
