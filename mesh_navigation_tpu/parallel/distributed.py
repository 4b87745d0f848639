"""Multi-host orchestration glue (jax.distributed).

The reference's only inter-process transport is DDS pub/sub (SURVEY.md §5);
there is nothing to port. For TPU pods, multi-host runs use JAX's
multi-controller runtime: every host executes the same program, collectives
ride ICI within a slice and DCN across hosts (BASELINE configs[4]: 10M
vertices, N >= 2 hosts).

Usage on each host:

    from mesh_navigation_tpu.parallel import distributed
    distributed.initialize()                       # env-driven or explicit
    dmesh = distributed.pod_mesh(n_batch=2)        # global ('mesh','batch')
    part  = build_partition(mesh, W, dmesh.shape["mesh"])
    dist  = partitioned_field_solve(part, seeds, dmesh)

Host-local data loading: every host builds identical MeshArrays (the host
preprocessing is deterministic), and `shard_map` places each host's device
shards; no explicit scatter is needed. The halo exchange inside
`partitioned_field_solve` becomes a cross-host all_gather of the export
rings on DCN — the partition is x-sorted, so consecutive shards (and
therefore almost all halo traffic) stay on neighbouring devices of the same
host.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up the multi-controller runtime. No-ops gracefully when running
    single-process (tests, single host). Arguments default to the standard
    JAX env vars (JAX_COORDINATOR_ADDRESS etc.)."""
    if num_processes in (None, 1) and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def pod_mesh(n_batch: int = 1, devices: Optional[list] = None) -> Mesh:
    """Global ('mesh', 'batch') device mesh over all processes' devices.
    The 'mesh' (spatial) axis is laid out so consecutive shards map to
    physically adjacent devices (jax.devices() order), keeping halo exchange
    on ICI where possible."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % n_batch != 0:
        raise ValueError(f"{n} devices not divisible by n_batch={n_batch}")
    arr = np.asarray(devices).reshape(n // n_batch, n_batch)
    return Mesh(arr, ("mesh", "batch"))


def is_primary() -> bool:
    return jax.process_index() == 0
