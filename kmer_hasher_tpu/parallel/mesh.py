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
