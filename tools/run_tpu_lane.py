#!/usr/bin/env python3
"""Run the full test suite on the real TPU and record the result.

The CPU lane (default pytest run) exercises everything in interpret/XLA
mode; this runner executes the same suite with
``TOMOBAR_TPU_TEST_DEVICE=tpu`` — compiled-Mosaic kernel goldens,
Pallas-under-shard_map on a 1-device chip mesh, and the frozen goldens
module — and writes a JSON artifact (``TPU_LANE_r{N}.json``) so a green
hardware run is a committed fact rather than an assertion.

Usage:  python tools/run_tpu_lane.py [artifact.json]
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    artifact = sys.argv[1] if len(sys.argv) > 1 else "TPU_LANE.json"
    env = dict(os.environ)
    env["TOMOBAR_TPU_TEST_DEVICE"] = "tpu"
    # PREPEND the repo: the ambient PYTHONPATH carries the site hook that
    # registers the remote-TPU jax plugin — dropping it leaves
    # JAX_PLATFORMS pointing at an unregistered backend
    env["PYTHONPATH"] = REPO + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "--tb=line",
         "-p", "no:cacheprovider"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=7200,
    )
    dt = time.time() - t0
    tail = "\n".join(proc.stdout.strip().splitlines()[-60:])
    summary = ""
    for line in proc.stdout.splitlines()[::-1]:
        if re.search(r"\d+ (passed|failed|error)", line):
            summary = line.strip()
            break
    try:
        import jax

        dev = str(jax.devices()[0])
    except Exception as e:  # pragma: no cover
        dev = f"unavailable: {e}"
    out = {
        "lane": "tpu",
        "device": dev,
        "returncode": proc.returncode,
        "summary": summary,
        "wall_s": round(dt, 1),
        "cmd": "TOMOBAR_TPU_TEST_DEVICE=tpu python -m pytest tests/ -q",
        "tail": tail,
    }
    with open(os.path.join(REPO, artifact), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "tail"}))
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
