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

ROW = "row"     # size p1: phase-2 communicator (reference comm2)
COL = "col"     # size p2: phase-1 communicator (reference comm1)
SLICE = "slice"  # multi-slice (DCN) axis: batch-parallel, never a pencil


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


def make_multislice_mesh(slices: int, p1: int, p2: int | None = None,
                         devices=None) -> Mesh:
    """Nested (slice, p1, p2) mesh for multi-slice TPU pods.

    The SLICE axis rides DCN (slow inter-slice network); the (ROW, COL)
    axes ride ICI within each slice. The pencil all_to_alls only ever run
    over ROW/COL, so NO FFT collective crosses DCN — the slice axis shards
    a leading batch dim instead (each slice transforms its own batch
    shard). Devices are grouped by their ``slice_index`` attribute when
    the runtime exposes one (real multi-slice pods); otherwise contiguous
    device blocks model the slices (CPU/virtual testing, SURVEY §4.5)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if p2 is None:
        if p1 <= 0 or (n // slices) % p1 != 0:
            raise ValueError(f"p1={p1} does not divide per-slice count "
                             f"{n // slices}")
        p2 = (n // slices) // p1
    if slices * p1 * p2 > n:
        raise ValueError(f"mesh {slices}x{p1}x{p2} needs "
                         f"{slices * p1 * p2} devices, have {n}")
    idx = getattr(devices[0], "slice_index", None)
    if idx is not None:
        by_slice: dict[int, list] = {}
        for d in devices:
            by_slice.setdefault(d.slice_index, []).append(d)
        groups = [by_slice[k][: p1 * p2] for k in sorted(by_slice)[:slices]]
        if any(len(g) < p1 * p2 for g in groups) or len(groups) < slices:
            raise ValueError("not enough devices per slice")
        arr = np.asarray(groups).reshape(slices, p1, p2)
    else:
        arr = np.asarray(devices[: slices * p1 * p2]).reshape(slices, p1, p2)
    return Mesh(arr, (SLICE, ROW, COL))


def _batch_spec(mesh: Mesh, ndim: int) -> tuple:
    """Leading batch-dim partition entries: the SLICE axis shards the
    first batch dim on multi-slice meshes, remaining batch dims replicate."""
    nbatch = ndim - 3
    if SLICE in mesh.axis_names:
        if nbatch < 1:
            raise ValueError(
                "a multi-slice mesh shards a leading batch axis over the "
                "DCN slice axis: use batch_dims >= 1 (a pure spatial "
                "decomposition must not cross DCN)")
        return (SLICE,) + (None,) * (nbatch - 1)
    return (None,) * nbatch


def input_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Input pencil layout: x over rows, y over cols, z local (z-pencils),
    with leading batch dims replicated (or slice-sharded on a DCN mesh)."""
    spec = _batch_spec(mesh, ndim) + (ROW, COL, None)
    return NamedSharding(mesh, P(*spec))


def output_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Output layout after the two transpose phases: x local, y over rows,
    z over cols — the reference's transposed-output convention
    (offt-compute.c:3892-3895,4038-4045)."""
    spec = _batch_spec(mesh, ndim) + (None, ROW, COL)
    return NamedSharding(mesh, P(*spec))


def mesh_shape(mesh: Mesh) -> tuple[int, int]:
    return mesh.shape[ROW], mesh.shape[COL]
