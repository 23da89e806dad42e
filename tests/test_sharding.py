"""Shard-equivalence tests: sharded result == single-device result.

The multi-device checks run in a subprocess with a scrubbed environment:
this image's sitecustomize eagerly registers the single-TPU backend, so the
8-virtual-CPU-device mesh can only be created in a fresh interpreter whose
PYTHONPATH omits the site customisation.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_in_cpu_mesh_subprocess(code: str, timeout=900) -> str:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    out = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        env=env,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert out.returncode == 0, f"subprocess failed:\n{out.stdout}\n{out.stderr}"
    return out.stdout


def test_sharded_projector_equivalence():
    out = run_in_cpu_mesh_subprocess(
        """
        import numpy as np, jax, jax.numpy as jnp
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_tests")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        from tomobar_tpu.geometry import Geometry
        from tomobar_tpu.ops.projector import Projector
        from tomobar_tpu.parallel.sharding import make_mesh, ShardedProjector

        N, nz, A = 32, 8, 40
        rng = np.random.default_rng(0)
        angles = np.linspace(0, np.pi, A, endpoint=False)
        geom = Geometry(detectors_x=N, detectors_y=nz, angles=angles, recon_size=N)
        vol = rng.standard_normal((nz, N, N)).astype(np.float32)
        sino = rng.standard_normal((nz, A, N)).astype(np.float32)
        ref = Projector(geom)
        fp_ref = np.asarray(ref.fp(jnp.asarray(vol)))
        bp_ref = np.asarray(ref.bp(jnp.asarray(sino)))
        for (zm, am) in [(8, 1), (4, 2), (2, 4)]:
            mesh = make_mesh(zm, am)
            sp = ShardedProjector(geom, mesh)
            v = sp.device_put_vol(jnp.asarray(vol))
            s = sp.device_put_sino(jnp.asarray(sino))
            fp_s = np.asarray(jax.jit(sp.fp)(v))
            bp_s = np.asarray(jax.jit(sp.bp)(s))
            assert np.abs(fp_s - fp_ref).max() < 1e-4, (zm, am)
            assert np.abs(bp_s - bp_ref).max() < 1e-4, (zm, am)
        print("EQUIV_OK")
        """
    )
    assert "EQUIV_OK" in out


def test_dryrun_multichip():
    out = run_in_cpu_mesh_subprocess(
        """
        import jax
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tomobar_tests")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        import __graft_entry__ as g
        g.dryrun_multichip(8)
        """
    )
    assert "dryrun_multichip ok" in out
