"""Landmark (two-level) acceleration for batched field solves.

Plain relaxation needs O(hop diameter) sweeps because labels travel one hop
per sweep. This module precomputes, per (mesh, cost field):

1. a Voronoi partition of the vertices around ~L landmark vertices, via one
   multi-source label-carrying solve (`anchor`, `anchor_dist`), and
2. a coarse landmark graph whose edge weights are valid *upper bounds*
   (min over cut edges of A[u] + w(u,v) + A[v]).

A query batch then (a) solves SSSP on the tiny coarse graph, (b) initializes
every fine vertex with the upper bound `coarse[anchor[v]] + anchor_dist[v]`,
and (c) polishes with exact Jacobi sweeps. Because label-correcting
relaxation converges monotonically from ANY upper bound, the result is still
the exact Dijkstra fixed point — the coarse warm start just removes the
long-range transport that costs hundreds of sweeps.

The precompute is itself one multi-source solve (~cluster-diameter sweeps),
amortized over every query batch against the same cost field.

EMPIRICAL NOTE (measured, see tests): because the coarse bound carries slack
almost everywhere (detour-through-anchor per coarse hop), *exact* convergence
still requires the full seed-to-periphery correction chain — warm starting
does NOT reduce Jacobi sweep count for exact solves. The table is therefore
not wired into the default planner path; it is the substrate for (a) a
bounded-suboptimality fast mode (accept `coarse + anchor` labels directly:
instant, within the coarse slack bound) and (b) far-field initialization
when only a region-of-interest needs exactness.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array

INF = jnp.inf


class LandmarkTable(NamedTuple):
    lm_vertex: jax.Array     # [L] i32 landmark vertex ids
    anchor: jax.Array        # [V] i32 index into lm_vertex (nearest landmark)
    anchor_dist: jax.Array   # [V] f32 distance to that landmark
    coarse_adj: jax.Array    # [L, CD] i32 neighbour landmark indices (pad self)
    coarse_w: jax.Array      # [L, CD] f32 upper-bound weights (pad inf)


def select_landmarks(mesh: MeshArrays, num_landmarks: int) -> np.ndarray:
    """Spatially-stratified landmark choice: hash vertices into ~L cells,
    pick the vertex nearest each occupied cell center."""
    pos = host_array(mesh, "vertices")
    V = len(pos)
    num_landmarks = min(num_landmarks, V)
    lo = pos.min(0)
    extent = pos.max(0) - lo + 1e-6
    # choose a grid with about num_landmarks occupied cells (assume surface
    # ~2D: scale xy cell count)
    n_side = max(1, int(np.sqrt(num_landmarks)))
    cell = np.maximum(extent[:2] / n_side, 1e-6)
    cid = (
        np.floor((pos[:, 0] - lo[0]) / cell[0]).astype(np.int64) * (n_side + 1)
        + np.floor((pos[:, 1] - lo[1]) / cell[1]).astype(np.int64)
    )
    # per occupied cell, vertex closest to the cell centroid
    order = np.argsort(cid, kind="stable")
    cids = cid[order]
    starts = np.flatnonzero(np.r_[True, cids[1:] != cids[:-1]])
    lms = []
    for s, e in zip(starts, np.r_[starts[1:], len(cids)]):
        members = order[s:e]
        centroid = pos[members].mean(0)
        lms.append(members[np.argmin(np.linalg.norm(pos[members] - centroid, axis=1))])
    return np.asarray(sorted(lms), dtype=np.int32)


def multi_source_field(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    sources: jax.Array,       # [L] vertex ids
    *,
    max_sweeps: int = 0,
    block_sweeps: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Label-carrying multi-source relaxation: returns (dist [V], label [V])
    where label is the index (into `sources`) of the nearest source."""
    V, D = weights_vd.shape
    if max_sweeps <= 0:
        max_sweeps = 4 * V
    n_blocks = -(-max_sweeps // block_sweeps)
    adj = mesh.adj_vertex

    dist0 = jnp.full(V, INF, jnp.float32).at[sources].set(0.0)
    label0 = jnp.zeros(V, jnp.int32).at[sources].set(
        jnp.arange(sources.shape[0], dtype=jnp.int32)
    )

    adj_cols = [adj[:, j] for j in range(D)]
    w_cols = [weights_vd[:, j] for j in range(D)]

    def sweep(carry):
        d, lab = carry
        for j in range(D):
            cand = d[adj_cols[j]] + w_cols[j]
            better = cand < d
            d = jnp.where(better, cand, d)
            lab = jnp.where(better, lab[adj_cols[j]], lab)
        return d, lab

    def block(carry):
        d, lab, it, _ = carry
        nd, nlab = jax.lax.fori_loop(
            0, block_sweeps, lambda _, c: sweep(c), (d, lab)
        )
        return nd, nlab, it + block_sweeps, jnp.any(nd < d)

    def cond(carry):
        return carry[3] & (carry[2] < n_blocks * block_sweeps)

    d, lab, _, _ = jax.lax.while_loop(
        cond, block, (dist0, label0, jnp.int32(0), jnp.bool_(True))
    )
    return d, lab


def build_landmarks(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    edge_weights: jax.Array,
    *,
    num_landmarks: int = 1024,
) -> LandmarkTable:
    """Precompute the two-level structure for one cost field."""
    lms = select_landmarks(mesh, num_landmarks)
    lm_j = jnp.asarray(lms)
    dist, label = multi_source_field(mesh, weights_vd, lm_j)

    # coarse cut-edge reduction (host; runs once per cost-field update)
    lab = np.asarray(label)
    A = np.asarray(dist)
    edges = host_array(mesh, "edges")
    ew = np.asarray(edge_weights)
    lu, lv = lab[edges[:, 0]], lab[edges[:, 1]]
    cut = (lu != lv) & np.isfinite(ew) & np.isfinite(A[edges[:, 0]]) & np.isfinite(A[edges[:, 1]])
    cu, cv = lu[cut], lv[cut]
    cw = A[edges[cut, 0]] + ew[cut] + A[edges[cut, 1]]
    # both directions
    src = np.concatenate([cu, cv])
    dst = np.concatenate([cv, cu])
    w = np.concatenate([cw, cw])
    L = len(lms)
    # group by (src, dst) taking min
    key = src.astype(np.int64) * L + dst
    order = np.argsort(key, kind="stable")
    key_s, w_s, dst_s = key[order], w[order], dst[order]
    first = np.r_[True, key_s[1:] != key_s[:-1]]
    # min within equal keys: running minimum trick via np.minimum.reduceat
    starts = np.flatnonzero(first)
    wmin = np.minimum.reduceat(w_s, starts) if len(w_s) else np.zeros(0, np.float32)
    s_u = (key_s[starts] // L).astype(np.int32)
    s_v = (key_s[starts] % L).astype(np.int32)
    # pad per-source adjacency
    deg = np.bincount(s_u, minlength=L)
    CD = max(1, int(deg.max()) if len(deg) else 1)
    coarse_adj = np.tile(np.arange(L, dtype=np.int32)[:, None], (1, CD))
    coarse_w = np.full((L, CD), np.inf, np.float32)
    slot = np.zeros(L, np.int64)
    for u, v2, ww in zip(s_u, s_v, wmin):
        coarse_adj[u, slot[u]] = v2
        coarse_w[u, slot[u]] = ww
        slot[u] += 1
    return LandmarkTable(
        lm_vertex=lm_j,
        anchor=label,
        anchor_dist=dist,
        coarse_adj=jnp.asarray(coarse_adj),
        coarse_w=jnp.asarray(coarse_w),
    )


def warm_start(
    table: LandmarkTable,
    seeds: jax.Array,          # [B] fine vertex ids
    *,
    coarse_sweeps: int = 0,
) -> jax.Array:
    """Upper-bound initial distances [V+1, B] from the coarse solve
    (the dummy V row is inf, matching batched_field_hybrid's layout)."""
    L, CD = table.coarse_w.shape
    B = seeds.shape[0]
    if coarse_sweeps <= 0:
        coarse_sweeps = 4 * int(np.sqrt(L)) + 16

    seed_anchor = table.anchor[seeds]               # [B]
    seed_A = table.anchor_dist[seeds]               # [B]
    coarse0 = jnp.full((L, B), INF, jnp.float32)
    coarse0 = coarse0.at[seed_anchor, jnp.arange(B)].set(seed_A)

    adj_cols = [table.coarse_adj[:, j] for j in range(CD)]
    w_cols = [table.coarse_w[:, j][:, None] for j in range(CD)]

    def sweep(_, d):
        best = d
        for j in range(CD):
            best = jnp.minimum(best, d[adj_cols[j]] + w_cols[j])
        return best

    coarse = jax.lax.fori_loop(0, coarse_sweeps, sweep, coarse0)

    init = coarse[table.anchor] + table.anchor_dist[:, None]     # [V, B]
    init = init.at[seeds, jnp.arange(B)].set(0.0)
    V = table.anchor.shape[0]
    return jnp.concatenate([init, jnp.full((1, B), INF, jnp.float32)])
