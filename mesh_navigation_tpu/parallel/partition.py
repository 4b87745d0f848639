"""Spatial mesh partitioning with explicit halo (ghost) tables.

`sharded.py` proves the SPMD structure with a full `all_gather` of the
distance vector per sweep. That is O(V) of DCN/ICI traffic per sweep; at 10M
vertices across hosts (BASELINE configs[4]) it dominates. This module builds
the real thing:

1. vertices are spatially sorted (x-major) and cut into contiguous blocks
   (one per shard) so almost all edges are shard-internal;
2. each shard precomputes its *export list* — the local vertices any other
   shard's adjacency references (the halo ring, ~O(sqrt(V·n)) total);
3. shard adjacency is remapped so non-local neighbours index into the
   concatenation [local block | gathered exports];
4. per sweep, only the exports travel: `all_gather` of [X, B] halo values
   (ppermute-ring upgrade is a drop-in once shards outgrow a single gather).

The relaxation inside the shard is the same unrolled-slot pull update as
ops/ordered.batched_field_hybrid; convergence is a global psum.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array

INF = jnp.inf


class MeshPartition(NamedTuple):
    """Host-built partition tables (all leading axes shard over 'mesh')."""
    adj: jax.Array          # [n, Vl, D] i32 remapped: < Vl local, >= Vl ghost slot
    weights: jax.Array      # [n, Vl, D] f32 (inf = unusable/padded)
    export_idx: jax.Array   # [n, X] i32 local indices each shard exports (pad 0)
    perm: jax.Array         # [V] i32 new-order -> original vertex id
    inv_perm: jax.Array     # [V] i32 original -> new order
    num_vertices: int
    block: int              # Vl

    @property
    def n_shards(self) -> int:
        return self.adj.shape[0]


def build_partition(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    n_shards: int,
) -> MeshPartition:
    """Host-side: sort by x (ties y), block-cut, build halo tables."""
    pos = host_array(mesh, "vertices")
    adj = host_array(mesh, "adj_vertex")
    W = np.asarray(weights_vd)
    V, D = adj.shape

    order = np.lexsort((pos[:, 1], pos[:, 0])).astype(np.int32)  # new -> old
    inv = np.empty(V, np.int32)
    inv[order] = np.arange(V, dtype=np.int32)

    Vl = -(-V // n_shards)
    Vp = Vl * n_shards

    # renumbered adjacency (padded tail rows self-loop with inf weight)
    adj_new = np.full((Vp, D), 0, np.int32)
    w_new = np.full((Vp, D), np.inf, np.float32)
    adj_new[:V] = inv[adj[order]]
    w_new[:V] = W[order]

    shard_of = np.arange(Vp) // Vl

    # export sets: for each shard s, local vertices referenced by other shards
    exports: list[np.ndarray] = []
    for s in range(n_shards):
        rows = adj_new[s * Vl : (s + 1) * Vl]
        w_rows = w_new[s * Vl : (s + 1) * Vl]
        ext = rows[(shard_of[rows] != s) & np.isfinite(w_rows)]
        exports.append(ext)
    # a vertex is exported by its OWNER shard if any other shard references it
    referenced = np.unique(np.concatenate(exports)) if exports else np.zeros(0, np.int64)
    per_owner: list[np.ndarray] = [
        referenced[shard_of[referenced] == s] for s in range(n_shards)
    ]
    X = max(1, max((len(p) for p in per_owner), default=1))
    export_idx = np.zeros((n_shards, X), np.int32)
    ghost_slot = np.full(Vp, -1, np.int64)  # global new-id -> slot in gathered halo
    for s, p in enumerate(per_owner):
        export_idx[s, : len(p)] = (p - s * Vl).astype(np.int32)
        ghost_slot[p] = s * X + np.arange(len(p))

    # remap adjacency per shard: local -> [0, Vl); remote -> Vl + ghost_slot
    adj_shard = np.zeros((n_shards, Vl, D), np.int32)
    w_shard = np.zeros((n_shards, Vl, D), np.float32)
    for s in range(n_shards):
        rows = adj_new[s * Vl : (s + 1) * Vl].copy()
        w_rows = w_new[s * Vl : (s + 1) * Vl].copy()
        local = shard_of[rows] == s
        remote = ~local
        usable_remote = remote & np.isfinite(w_rows)
        out = np.where(local, rows - s * Vl, 0)
        out = np.where(usable_remote, Vl + ghost_slot[rows], out)
        # unusable entries point at local 0 with inf weight
        w_rows = np.where(remote & ~usable_remote, np.inf, w_rows)
        adj_shard[s] = out
        w_shard[s] = w_rows
    return MeshPartition(
        adj=jnp.asarray(adj_shard),
        weights=jnp.asarray(w_shard),
        export_idx=jnp.asarray(export_idx),
        perm=jnp.asarray(order),
        inv_perm=jnp.asarray(inv),
        num_vertices=V,
        block=Vl,
    )


def partitioned_field_solve(
    part: MeshPartition,
    seeds: jax.Array,          # [B] i32 ORIGINAL vertex ids
    device_mesh: Mesh,
    *,
    max_sweeps: int = 0,
    block_sweeps: int = 8,
) -> jax.Array:
    """Batched SSSP over the partition: mesh axis = spatial shards with halo
    exchange of export values only; batch axis = scenarios. Returns
    dist [B, V] in ORIGINAL vertex order."""
    n, Vl, D = part.adj.shape
    X = part.export_idx.shape[1]
    B = seeds.shape[0]
    if max_sweeps <= 0:
        max_sweeps = 4 * n * Vl
    n_blocks = -(-max_sweeps // block_sweeps)

    seeds_new = part.inv_perm[seeds]                    # [B] renumbered ids

    def local_solve(adj_loc3, w_loc3, exp_loc2, seeds_loc):
        adj_loc, w_loc, exp_loc = adj_loc3[0], w_loc3[0], exp_loc2[0]
        mesh_idx = jax.lax.axis_index("mesh")
        gidx = mesh_idx * Vl + jnp.arange(Vl, dtype=jnp.int32)
        b_loc = seeds_loc.shape[0]
        dist0 = jnp.where(
            gidx[:, None] == seeds_loc[None, :], 0.0, INF
        ).astype(jnp.float32)                            # [Vl, b_loc]

        adj_cols = [adj_loc[:, j] for j in range(D)]
        w_cols = [w_loc[:, j][:, None] for j in range(D)]

        def one_sweep(dist_loc):
            exports = dist_loc[exp_loc]                  # [X, b_loc]
            ghosts = jax.lax.all_gather(exports, "mesh", axis=0, tiled=True)
            full = jnp.concatenate([dist_loc, ghosts])   # [Vl + n*X, b_loc]
            best = dist_loc
            for j in range(D):
                best = jnp.minimum(best, full[adj_cols[j]] + w_cols[j])
            return best

        def block(carry):
            d, it, _ = carry
            new = jax.lax.fori_loop(0, block_sweeps, lambda _, x: one_sweep(x), d)
            changed = jax.lax.psum(
                jnp.any(new < d).astype(jnp.int32), ("mesh", "batch")
            ) > 0
            return new, it + block_sweeps, changed

        def cond(carry):
            return carry[2] & (carry[1] < n_blocks * block_sweeps)

        dist, _, _ = jax.lax.while_loop(
            cond, block, (one_sweep(dist0), jnp.int32(0), jnp.bool_(True))
        )
        return dist[None]                                # [1, Vl, b_loc]

    solve = shard_map(
        local_solve,
        mesh=device_mesh,
        in_specs=(P("mesh"), P("mesh"), P("mesh"), P("batch")),
        out_specs=P("mesh", None, "batch"),
        check_vma=False,
    )
    dist_new = solve(part.adj, part.weights, part.export_idx, seeds_new)
    dist_new = dist_new.reshape(n * Vl, B).T             # [B, Vp] new order
    # back to original vertex order
    return dist_new[:, part.inv_perm]
