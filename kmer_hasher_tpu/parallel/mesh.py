"""Device mesh helpers.

Single-axis mesh ("shard") — the k-mer engine's parallelism is key-space
sharding (the reference's ``prefix % thread_n`` owner-computes filter,
src/kmer_reader.c:28-39, lifted to chips) combined with data-parallel input
streaming; both ride one axis. Multi-host topologies get the axis laid out
so all_to_all/psum ride ICI within a slice.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "shard") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_hierarchical_mesh(n_slices: int,
                           chips_per_slice: Optional[int] = None,
                           axes=("dcn", "ici")) -> Mesh:
    """Two-level mesh for multi-slice deployments: the leading axis spans
    DCN-connected slices, the trailing axis the ICI-connected chips within
    a slice. ``ShardedCountStore`` routes key batches hierarchically over
    such a mesh (slice-bucketed all_to_all over DCN, then per-owner
    all_to_all over ICI) so cross-DCN traffic moves in n_slices large
    blocks instead of n_chips fine-grained ones.

    jax.devices() is ordered slice-major on multi-slice TPU deployments,
    so a plain reshape puts each row of the mesh inside one slice."""
    devices = jax.devices()
    if chips_per_slice is None:
        if len(devices) % n_slices:
            raise ValueError(
                f"{len(devices)} devices do not split into {n_slices} slices"
            )
        chips_per_slice = len(devices) // n_slices
    need = n_slices * chips_per_slice
    if need > len(devices):
        raise ValueError(f"requested {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_slices, chips_per_slice)
    return Mesh(arr, tuple(axes))
