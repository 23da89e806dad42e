"""Multi-chip sharding: detY slabs x angle subsets over a TPU mesh.

The reference is a single-GPU library (SURVEY.md §2.3: "ToMoBAR in itself
doesn't offer any parallelisation"); scaling happens outside it via MPI
one-process-per-GPU.  Here distribution is a first-class framework layer:

* mesh axes ``("z", "angles")`` — detY slabs are embarrassingly parallel
  for parallel-beam geometry (the invariant the reference proves in its
  blockwise-consistency tests); the angle axis shards the projection/
  backprojection work per slab, with a ``psum`` over the angle axis
  reducing partial backprojections.
* collectives are XLA's native ICI/DCN collectives inserted by
  ``shard_map`` — no NCCL/MPI analogue needed.
* volumes are replicated along the angle axis and sharded along z;
  sinograms are sharded along both.

Use :func:`make_mesh` + :class:`ShardedProjector` in place of
:class:`tomobar_tpu.ops.projector.Projector` to run solvers unchanged on a
mesh (the solver cores only call fp/bp/fp_sub/bp_sub).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from tomobar_tpu.geometry import Geometry
from tomobar_tpu.ops.projector import radon_bp, radon_fp

__all__ = ["make_mesh", "ShardedProjector"]


def make_mesh(
    n_z: Optional[int] = None,
    n_angles: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ("z", "angles") mesh over the available devices.

    By default all devices go to the z (slab) axis — the cheapest axis in
    communication terms (no collectives at all).  Give ``n_angles > 1`` to
    also shard the angle axis (adds a volume-sized psum per BP).
    """
    devices = list(devices if devices is not None else jax.devices())
    n_dev = len(devices)
    if n_z is None and n_angles is None:
        n_z, n_angles = n_dev, 1
    elif n_z is None:
        n_z = n_dev // n_angles
    elif n_angles is None:
        n_angles = n_dev // n_z
    if n_z * n_angles != n_dev:
        raise ValueError(
            f"mesh {n_z}x{n_angles} does not match {n_dev} devices"
        )
    dev_array = np.asarray(devices).reshape(n_z, n_angles)
    return Mesh(dev_array, ("z", "angles"))


def _split_angles(n_angles_total: int, n_shards: int):
    """Contiguous angle blocks per angle-shard (static, equal-size padded).

    Angle counts must divide evenly for static shapes; we enforce this and
    document it (the mesh angle axis is typically 1, 2 or 4).
    """
    if n_angles_total % n_shards != 0:
        raise ValueError(
            f"number of angles {n_angles_total} must be divisible by the "
            f"angle mesh axis {n_shards}"
        )
    block = n_angles_total // n_shards
    return [np.arange(i * block, (i + 1) * block) for i in range(n_shards)]


class ShardedProjector:
    """Projector pair over a ("z", "angles") mesh via shard_map.

    Drop-in for :class:`~tomobar_tpu.ops.projector.Projector` inside the
    solver cores: volumes are sharded (z-slabs, replicated over angles);
    sinograms are sharded over (z, angles); ``bp`` psums partial
    backprojections over the angle axis.
    """

    def __init__(self, geom: Geometry, mesh: Mesh):
        self.geom = geom
        self.mesh = mesh
        self.n_ang_shards = mesh.shape["angles"]
        self.subset_indices = geom.os_indices()
        self._sub_geoms = [geom.subset(ind) for ind in self.subset_indices]
        # per-angle-shard geometries (each shard projects its angle block)
        self._shard_geoms = self._make_shard_geoms(geom)
        self._sub_shard_geoms = [
            self._make_shard_geoms(g) for g in self._sub_geoms
        ]

        self.vol_spec = P("z", None, None)
        self.sino_spec = P("z", "angles", None)

    def _make_shard_geoms(self, geom: Geometry):
        blocks = _split_angles(geom.n_angles, self.n_ang_shards)
        return [geom.subset(b) for b in blocks]

    # -- core sharded ops ----------------------------------------------------

    def _fp_sharded(self, vol, shard_geoms):
        """vol (z-shard, n, n) -> sino (z-shard, angles-shard, detX)."""
        geoms = shard_geoms

        def fp_local(v):
            # every angle shard projects its own block; identical code per
            # shard is required by shard_map, so switch on axis index
            idx = jax.lax.axis_index("angles")
            branches = [partial(radon_fp, geom=g) for g in geoms]
            if len(branches) == 1:
                return branches[0](v)
            return jax.lax.switch(idx, branches, v)

        return shard_map(
            fp_local,
            mesh=self.mesh,
            in_specs=(self.vol_spec,),
            out_specs=self.sino_spec,
            check_vma=False,  # scan carries are unvaried inits; rep check is too strict
        )(vol)

    def _bp_sharded(self, sino, shard_geoms):
        geoms = shard_geoms

        def bp_local(s):
            idx = jax.lax.axis_index("angles")
            branches = [partial(radon_bp, geom=g) for g in geoms]
            if len(branches) == 1:
                part = branches[0](s)
            else:
                part = jax.lax.switch(idx, branches, s)
            # reduce partial backprojections over the angle axis (ICI psum)
            return jax.lax.psum(part, "angles")

        return shard_map(
            bp_local,
            mesh=self.mesh,
            in_specs=(self.sino_spec,),
            out_specs=self.vol_spec,
            check_vma=False,  # scan carries are unvaried inits; rep check is too strict
        )(sino)

    # -- Projector interface -------------------------------------------------

    def fp(self, vol):
        return self._fp_sharded(vol, self._shard_geoms)

    def bp(self, sino):
        return self._bp_sharded(sino, self._shard_geoms)

    def fp_sub(self, vol, sub: int):
        return self._fp_sharded(vol, self._sub_shard_geoms[sub])

    def bp_sub(self, sino, sub: int):
        return self._bp_sharded(sino, self._sub_shard_geoms[sub])

    def sino_subset(self, sino, sub: int):
        ind = self.subset_indices[sub]
        if sino.ndim == 2:
            return sino[ind, :]
        return sino[:, ind, :]

    # -- placement helpers ---------------------------------------------------

    def device_put_vol(self, vol):
        return jax.device_put(vol, NamedSharding(self.mesh, self.vol_spec))

    def device_put_sino(self, sino):
        return jax.device_put(sino, NamedSharding(self.mesh, self.sino_spec))
