"""Ordered (fast-sweeping-style) Gauss-Seidel relaxation passes.

Plain Jacobi sweeps (ops/sweeps.py) propagate labels one hop per sweep, so a
solve needs O(mesh hop diameter) sweeps — ~400 for a 128x128 terrain. The
fast sweeping method observes that relaxing vertices in a *monotone spatial
order* lets a label cross the entire mesh in a single pass; alternating a
handful of signed coordinate orderings covers all characteristic directions,
converging in a few rounds instead of hundreds.

TPU mapping: vertices are sorted along each signed coordinate key and cut
into *level chunks* of ~one geometric row each. A pass is a `lax.scan` over
chunks that relaxes each chunk against the live distance matrix —
Gauss-Seidel across chunks, Jacobi inside one (n_inner repeats cover
multi-row chunks). Distances live in [V, B] layout so every gather moves
contiguous 128-wide batch rows (lane-friendly), and the scenario batch rides
the minor axis for free.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array

INF = jnp.inf


class SweepPlan(NamedTuple):
    """Static ordering data: chunks[d] rows are level chunks of direction d,
    in monotone key order. Padding entries point at the dummy vertex V."""
    chunks: jax.Array        # [n_dir, n_chunks, C] i32
    num_vertices: int

    @property
    def n_dir(self) -> int:
        return self.chunks.shape[0]


def build_sweep_plan(
    mesh: MeshArrays,
    *,
    chunk: int = 0,
    directions: int = 4,
) -> SweepPlan:
    """Host-side: sort vertices along signed coordinate keys (the FSM
    ordering family). `chunk` defaults to ~sqrt(V) rounded to the VPU lane
    width — about one geometric row per chunk."""
    pos = host_array(mesh, "vertices")
    V = len(pos)
    if chunk <= 0:
        chunk = max(64, int(8 * round(np.sqrt(V) / 8)))
    signs_all = [
        (1, 1, 1), (-1, -1, -1), (1, -1, 1), (-1, 1, -1),
        (1, 1, -1), (-1, -1, 1), (1, -1, -1), (-1, 1, 1),
    ][:directions]
    Vp = -(-V // chunk) * chunk
    n_chunks = Vp // chunk
    out = np.full((len(signs_all), n_chunks, chunk), V, dtype=np.int32)
    for d, s in enumerate(signs_all):
        key = pos[:, 0] * s[0] + pos[:, 1] * s[1] + pos[:, 2] * s[2]
        order = np.argsort(key, kind="stable").astype(np.int32)
        out[d].reshape(-1)[:V] = order
    return SweepPlan(chunks=jnp.asarray(out), num_vertices=V)


class OrderedFieldResult(NamedTuple):
    dist: jax.Array       # [B, V]
    pred: jax.Array       # [B, V]
    rounds: jax.Array
    converged: jax.Array


def batched_field_ordered(
    mesh: MeshArrays,
    weights_vd: jax.Array,     # [V, D] effective slot weights (sweeps.slot_weights)
    plan: SweepPlan,
    seeds: jax.Array,          # [B] i32
    *,
    max_rounds: int = 64,
    n_inner: int = 1,
) -> OrderedFieldResult:
    """Batched SSSP via ordered GS passes; converges to the same fixed point
    as ops.sweeps.shortest_path_field (= heap Dijkstra).

    Predecessors are recovered after convergence by one arg-min relaxation
    against the converged field — cheaper than carrying argmins per chunk.
    """
    V, D = weights_vd.shape
    B = seeds.shape[0]
    adj = mesh.adj_vertex

    # dummy slot V: padded chunk rows gather/scatter here harmlessly
    adj_x = jnp.concatenate([adj, jnp.full((1, D), V - 1, adj.dtype)])
    w_x = jnp.concatenate([weights_vd, jnp.full((1, D), INF, weights_vd.dtype)])

    dist0 = jnp.where(
        jnp.arange(V + 1, dtype=jnp.int32)[:, None] == seeds[None, :], 0.0, INF
    ).astype(jnp.float32)                                      # [V+1, B]

    def chunk_update(d, rows):
        a = adj_x[rows]                        # [C, D]
        w = w_x[rows][..., None]               # [C, D, 1]
        cand = jnp.min(d[a] + w, axis=1)       # [C, B]
        return d.at[rows].set(jnp.minimum(d[rows], cand))

    def chunk_body(d, rows):
        if n_inner == 1:
            return chunk_update(d, rows), None
        return jax.lax.fori_loop(
            0, n_inner, lambda _, dd: chunk_update(dd, rows), d
        ), None

    def one_round(dist):
        def dir_body(d, chunks_d):
            d, _ = jax.lax.scan(chunk_body, d, chunks_d)
            return d, None
        dist, _ = jax.lax.scan(dir_body, dist, plan.chunks)
        return dist

    def cond(carry):
        _, it, changed = carry
        return changed & (it < max_rounds)

    def body(carry):
        dist, it, _ = carry
        new = one_round(dist)
        return new, it + 1, jnp.any(new < dist)

    dist, rounds, changed = jax.lax.while_loop(
        cond, body, (one_round(dist0), jnp.int32(1), jnp.bool_(True))
    )
    dist_v = dist[:V]                                          # [V, B]
    return _finish(mesh, weights_vd, dist_v, rounds, changed)


def _finish(mesh, weights_vd, dist_v, rounds, changed) -> OrderedFieldResult:
    V, D = weights_vd.shape
    adj = mesh.adj_vertex

    # predecessor recovery: pred[v] = neighbour u minimizing dist[u] + w(u,v)
    vidx = jnp.arange(V, dtype=jnp.int32)
    cand = dist_v[adj] + weights_vd[..., None]                 # [V, D, B]
    arg = jnp.argmin(cand, axis=1)                             # [V, B]
    best = jnp.min(cand, axis=1)
    has = (best <= dist_v + 1e-6) & (dist_v > 0) & jnp.isfinite(dist_v)
    pred = jnp.where(has, adj[vidx[:, None], arg], vidx[:, None])
    return OrderedFieldResult(
        dist=dist_v.T, pred=pred.T, rounds=rounds, converged=~changed
    )


def batched_field_hybrid(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    plan: SweepPlan,
    seeds: jax.Array,
    *,
    ordered_rounds: int = 2,
    block_sweeps: int = 16,
    max_sweeps: int = 0,
    init_vb: jax.Array | None = None,
) -> OrderedFieldResult:
    """Hybrid solve: a fixed number of ordered FSM rounds for bulk label
    transport, then batched Jacobi sweeps (one full-width relaxation per
    sweep, far lower per-step overhead than chunk scans) to the exact fixed
    point. Usually the fastest option on TPU: the ordered rounds cut the
    O(diameter) Jacobi tail to a short local-repair tail."""
    V, D = weights_vd.shape
    B = seeds.shape[0]
    adj = mesh.adj_vertex
    if max_sweeps <= 0:
        max_sweeps = 4 * V
    n_blocks = -(-max_sweeps // block_sweeps)

    adj_x = jnp.concatenate([adj, jnp.full((1, D), V - 1, adj.dtype)])
    w_x = jnp.concatenate([weights_vd, jnp.full((1, D), INF, weights_vd.dtype)])

    if init_vb is not None:
        # any valid upper bound converges to the same fixed point (e.g. a
        # prior solve of a nearby cost field); clamp the seeds to zero
        dist0 = jnp.minimum(
            init_vb,
            jnp.where(
                jnp.arange(V + 1, dtype=jnp.int32)[:, None] == seeds[None, :],
                0.0, INF,
            ),
        ).astype(jnp.float32)
    else:
        dist0 = jnp.where(
            jnp.arange(V + 1, dtype=jnp.int32)[:, None] == seeds[None, :], 0.0, INF
        ).astype(jnp.float32)

    def chunk_body(d, rows):
        a = adj_x[rows]
        w = w_x[rows][..., None]
        cand = jnp.min(d[a] + w, axis=1)
        return d.at[rows].set(jnp.minimum(d[rows], cand)), None

    def one_round(dist):
        def dir_body(d, chunks_d):
            d, _ = jax.lax.scan(chunk_body, d, chunks_d)
            return d, None
        dist, _ = jax.lax.scan(dir_body, dist, plan.chunks)
        return dist

    dist = dist0
    for _ in range(ordered_rounds):
        dist = one_round(dist)
    dist_v = dist[:V]

    # Unrolled per-slot relaxation: D separate [V, B] gathers accumulated
    # into a running min — avoids materializing the [V, D, B] candidate
    # buffer (the difference between 6 GB and 1 GB of traffic per sweep on a
    # 1M-vertex mesh) and benches ~1.5x faster than the fused gather.
    adj_cols = [adj[:, j] for j in range(D)]
    w_cols = [weights_vd[:, j][:, None] for j in range(D)]

    def jacobi(d):
        best = d
        for j in range(D):
            best = jnp.minimum(best, d[adj_cols[j]] + w_cols[j])
        return best

    def block(carry):
        d, it, _ = carry
        new = jax.lax.fori_loop(0, block_sweeps, lambda _, x: jacobi(x), d)
        return new, it + block_sweeps, jnp.any(new < d)

    def cond(carry):
        return carry[2] & (carry[1] < n_blocks * block_sweeps)

    dist_v, sweeps_done, changed = jax.lax.while_loop(
        cond, block, (jacobi(dist_v), jnp.int32(1), jnp.bool_(True))
    )
    rounds = jnp.int32(ordered_rounds) + sweeps_done
    return _finish(mesh, weights_vd, dist_v, rounds, changed)
