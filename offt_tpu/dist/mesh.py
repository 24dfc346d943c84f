"""Device mesh construction — the TPU replacement for the reference's
process-grid builder ``offt_comm_malloc`` (/root/reference/offt-compute.c:57-315).

Where the reference builds `p1 x p2` MPI groups by explicit rank lists
(comm1 = rows of size p2, comm2 = columns of size p1), we build a
``jax.sharding.Mesh`` with named axes ("row", "col"); collectives over
"col" are the phase-1 row-communicator all-to-alls, collectives over "row"
are the phase-2 column ones. On real hardware callers should pass devices
ordered so that both axes ride ICI (mesh_utils handles this upstream).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW = "row"   # size p1: phase-2 communicator (reference comm2)
COL = "col"   # size p2: phase-1 communicator (reference comm1)


def make_mesh(p1: int, p2: int | None = None, devices=None) -> Mesh:
    """Build a (p1, p2) mesh. With p2=None, uses all devices: p2 = n // p1."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if p2 is None:
        if n % p1 != 0:
            raise ValueError(f"p1={p1} does not divide device count {n}")
        p2 = n // p1
    if p1 * p2 > n:
        raise ValueError(f"mesh {p1}x{p2} needs {p1 * p2} devices, have {n}")
    arr = np.asarray(devices[: p1 * p2]).reshape(p1, p2)
    return Mesh(arr, (ROW, COL))


def input_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Input pencil layout: x over rows, y over cols, z local (z-pencils),
    with any leading batch dims replicated."""
    spec = (None,) * (ndim - 3) + (ROW, COL, None)
    return NamedSharding(mesh, P(*spec))


def output_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Output layout after the two transpose phases: x local, y over rows,
    z over cols — the reference's transposed-output convention
    (offt-compute.c:3892-3895,4038-4045)."""
    spec = (None,) * (ndim - 3) + (None, ROW, COL)
    return NamedSharding(mesh, P(*spec))


def mesh_shape(mesh: Mesh) -> tuple[int, int]:
    return mesh.shape[ROW], mesh.shape[COL]
