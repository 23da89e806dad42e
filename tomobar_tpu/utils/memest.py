"""HBM memory estimation from compiled HLO — the TPU-native equivalent of
the reference's ``DeviceMemStack`` dry-run allocator
(``tomobar/supp/memory_estimator_helpers.py`` + the ``*_estimator`` shadow
methods of ``methodsDIR_CuPy.py``).

Instead of replaying malloc/free sequences by hand, we lower + compile the
actual jitted pipeline with abstract inputs (no data, no execution) and read
XLA's own memory analysis.  This is exact for the compiled program rather
than a hand-maintained model, and is the figure HTTomo-style pipelines need
for slab-size planning.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["estimate_memory", "estimate_fourier_inv_memory", "DeviceMemStack"]


def estimate_memory(fn: Callable, *example_args, **example_kwargs) -> Dict[str, int]:
    """Compile ``fn`` for the given example shapes and return XLA's memory
    analysis in bytes.

    Returns keys: argument, output, temp, generated_code, alias, total.
    """
    shaped = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.result_type(a)),
        (example_args, example_kwargs),
    )
    s_args, s_kwargs = shaped
    compiled = jax.jit(fn).lower(*s_args, **s_kwargs).compile()
    m = compiled.memory_analysis()
    out = {
        "argument": int(m.argument_size_in_bytes),
        "output": int(m.output_size_in_bytes),
        "temp": int(m.temp_size_in_bytes),
        "generated_code": int(m.generated_code_size_in_bytes),
        "alias": int(m.alias_size_in_bytes),
    }
    out["total"] = (
        out["argument"] + out["output"] + out["temp"] + out["generated_code"]
        - out["alias"]
    )
    return out


def estimate_fourier_inv_memory(
    model, data_shape: Tuple[int, int, int], **kwargs
) -> Dict[str, int]:
    """Peak-memory estimate for ``FOURIER_INV`` on a (detY, angles, detX)
    input of the given shape — the use case the reference serves with its
    shape-instead-of-array dry-run mode (``methodsDIR_CuPy.py:253-258``)."""
    from tomobar_tpu.ops.usfft import fourier_inv

    def run(data):
        return fourier_inv(model, data, **kwargs)

    example = jax.ShapeDtypeStruct(data_shape, jnp.float32)
    out_shape = jax.eval_shape(run, example).shape
    compiled = jax.jit(run).lower(example).compile()
    m = compiled.memory_analysis()
    return {
        "argument": int(m.argument_size_in_bytes),
        "output": int(m.output_size_in_bytes),
        "temp": int(m.temp_size_in_bytes),
        "total": int(
            m.argument_size_in_bytes
            + m.output_size_in_bytes
            + m.temp_size_in_bytes
        ),
        "output_shape": tuple(out_shape),
    }


class DeviceMemStack:
    """API-compatible shim of the reference's simulated allocator
    (``memory_estimator_helpers.py:4-44``) for user code that used it as a
    context manager; tracks 512-byte-rounded malloc/free high-water marks."""

    ALLOCATION_UNIT_SIZE = 512
    _instance = None
    _stack_count = 0

    def __enter__(self):
        if DeviceMemStack._stack_count == 0:
            DeviceMemStack._instance = self
        DeviceMemStack._stack_count += 1
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        DeviceMemStack._stack_count -= 1
        if DeviceMemStack._stack_count == 0:
            DeviceMemStack._instance = None

    @classmethod
    def instance(cls):
        return cls._instance

    def __init__(self) -> None:
        self.allocations = []
        self.current = 0
        self.highwater = 0

    def _round_up(self, size: int) -> int:
        unit = self.ALLOCATION_UNIT_SIZE
        return (size + unit - 1) // unit * unit

    def malloc(self, byte_count: int) -> None:
        self.allocations.append(byte_count)
        self.current += self._round_up(byte_count)
        self.highwater = max(self.current, self.highwater)

    def free(self, byte_count: int) -> None:
        assert byte_count in self.allocations
        self.allocations.remove(byte_count)
        self.current -= self._round_up(byte_count)
        assert self.current >= 0
