"""SPMD scale-out: mesh partitioning over the device mesh + batched scenarios.

The reference is a single-process stack whose only concurrency is ROS
executor threads + per-layer mutexes (SURVEY.md §2.3) — nothing distributes.
For TPU pods this module adds the two parallel axes BASELINE.json prescribes:

- **"mesh" axis (spatial model parallelism)**: the [V, D] slot-weight and
  adjacency tables are sharded by vertex block via `shard_map`; each sweep a
  device updates only its block after an `all_gather` of the frontier
  distances (the halo-exchange collective — a full gather today, ring
  `ppermute` of the boundary ring as the mesh outgrows HBM).
- **"batch" axis (scenario data parallelism)**: thousands of start/goal pairs
  sharded across the remaining devices; convergence is a global
  `any(changed)` psum so all shards sweep in lockstep.

Everything compiles under jit with a `jax.sharding.Mesh`; the same code runs
on the 8-device virtual CPU mesh in tests and on pod slices.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mesh_navigation_tpu.mesh.arrays import MeshArrays

INF = jnp.inf


def make_device_mesh(
    n_mesh: int, n_batch: int, devices: Optional[list] = None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_mesh * n_batch > len(devices):
        raise ValueError(
            f"need {n_mesh * n_batch} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[: n_mesh * n_batch]).reshape(n_mesh, n_batch)
    return Mesh(arr, ("mesh", "batch"))


class ShardedMeshWeights(NamedTuple):
    """Vertex-sharded relaxation tables, padded to a multiple of the mesh
    axis. Global vertex ids are preserved (adjacency points into the gathered
    global distance vector)."""
    adj_vertex: jax.Array   # [Vp, D] i32 global neighbour ids
    weights: jax.Array      # [Vp, D] f32 effective slot weights (inf = unusable)
    num_vertices: int       # true V (pre-padding)


def shard_weights(
    mesh: MeshArrays, weights_vd: jax.Array, n_mesh: int
) -> ShardedMeshWeights:
    """Pad the [V, D] tables so the vertex axis divides the mesh axis."""
    V, D = weights_vd.shape
    Vp = -(-V // n_mesh) * n_mesh
    pad = Vp - V
    adj = jnp.pad(mesh.adj_vertex, ((0, pad), (0, 0)))
    w = jnp.pad(weights_vd, ((0, pad), (0, 0)), constant_values=INF)
    return ShardedMeshWeights(adj_vertex=adj, weights=w, num_vertices=V)


def sharded_field_solve(
    sharded: ShardedMeshWeights,
    seeds: jax.Array,          # [B] i32 goal vertices (batch axis)
    device_mesh: Mesh,
    *,
    max_sweeps: int = 0,
    block_sweeps: int = 8,
) -> jax.Array:
    """Batched SSSP fields with the mesh sharded over 'mesh' and scenarios
    over 'batch'. Returns dist [B, Vp] (row b seeded at seeds[b]).

    The inner program runs per (mesh-shard, batch-shard):
      local dist block [b_loc, V_loc] -> all_gather over 'mesh' -> pull
      relaxation of the local block -> psum'd convergence flag.
    """
    Vp, D = sharded.weights.shape
    n_mesh = device_mesh.shape["mesh"]
    B = seeds.shape[0]
    if max_sweeps <= 0:
        max_sweeps = 4 * Vp
    n_blocks = -(-max_sweeps // block_sweeps)

    def local_solve(adj_loc, w_loc, seeds_loc):
        # adj_loc/w_loc: [V_loc, D]; seeds_loc: [b_loc]
        mesh_idx = jax.lax.axis_index("mesh")
        V_loc = adj_loc.shape[0]
        gidx = mesh_idx * V_loc + jnp.arange(V_loc, dtype=jnp.int32)  # global ids

        b_loc = seeds_loc.shape[0]
        dist0 = jnp.where(
            gidx[None, :] == seeds_loc[:, None], 0.0, INF
        ).astype(jnp.float32)                                  # [b_loc, V_loc]

        def one_sweep(dist_loc):
            # halo exchange: gather the full frontier over the mesh axis
            dist_full = jax.lax.all_gather(
                dist_loc, "mesh", axis=1, tiled=True
            )                                                   # [b_loc, Vp]
            cand = dist_full[:, adj_loc] + w_loc[None, :, :]    # [b_loc, V_loc, D]
            best = jnp.min(cand, axis=-1)
            return jnp.minimum(dist_loc, best)

        def block(carry):
            dist_loc, it, _ = carry
            new = jax.lax.fori_loop(
                0, block_sweeps, lambda _, d: one_sweep(d), dist_loc
            )
            changed_local = jnp.any(new < dist_loc)
            # global convergence: every shard must agree (psum over both axes)
            changed = jax.lax.psum(
                changed_local.astype(jnp.int32), ("mesh", "batch")
            ) > 0
            return new, it + block_sweeps, changed

        def cond(carry):
            return carry[2] & (carry[1] < n_blocks * block_sweeps)

        dist, _, _ = jax.lax.while_loop(
            cond, block, (dist0, jnp.int32(0), jnp.bool_(True))
        )
        return dist

    solve = shard_map(
        local_solve,
        mesh=device_mesh,
        in_specs=(P("mesh", None), P("mesh", None), P("batch")),
        out_specs=P("batch", "mesh"),
        check_vma=False,
    )
    return solve(sharded.adj_vertex, sharded.weights, seeds)
