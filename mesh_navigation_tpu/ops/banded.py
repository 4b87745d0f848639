"""Banded Gauss-Seidel relaxation with min-plus associative scans.

The structured Jacobi solver (ops/structured.py) moves a label at most
max_offset vertices per HBM pass, so a solve costs O(diameter) sweeps — the
measured wall at large meshes (79 solves/s @262k vertices, NOTES_ROUND1.md).
Fast-sweeping orderings fix the asymptotics but the chunk-scan formulation
(ops/ordered.py) relaxes *within* a row by Jacobi, so lateral propagation
still needs many iterations and tiny scan steps dominate.

This module is the TPU-shaped fast-sweeping method for band-structured
meshes (x-major terrain grids — the reference's outdoor domain):

- Vertices form rows of width `n_cols`; [V, B] reshapes to [R, n_cols, B].
- A *down pass* is one `lax.scan` over rows: row r relaxes from row r-1's
  **new** labels through the three down-edge planes (Gauss-Seidel across
  rows), then lateral propagation runs as an exact 1D min-plus closure:

      d'[i] = min(b_i, d'[i-1] + a_i)   (a = edge weight from i-1 to i)

  computed by `lax.associative_scan` with the semiring combine
  (a1,b1)*(a2,b2) = (a1+a2, min(b2, b1+a2)) — a forward scan then a backward
  scan gives the full 1D fixed point of the row (shortest paths in a chain
  are monotone). Labels therefore cross the *entire mesh* in one down + one
  up pass, in two dense HBM passes, with no gathers and no chunk latency.
- Edges outside the six banded offset classes {±1, ±(n-1|n), ±(n|n+1)} go to
  a COO residual relaxed once per round (scatter-min), so every mesh edge is
  enforced by the round operator: the `while_loop` fixed point is exactly
  the Dijkstra fixed point (same argument as ops/sweeps.py — all updates are
  valid relaxations, monotone, and convergence checks the full edge set).

Replaces the reference's Meap-based wavefront (dijkstra_mesh_planner.cpp:
287-348) at large scale; selected automatically by the planner when the
banded coverage is high (see plan_banded_coverage).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array

INF = jnp.inf


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("lat_fwd", "lat_bwd", "down", "up", "res_dst", "res_src", "res_w"),
    meta_fields=("n_rows", "n_cols", "coverage"),
)
@dataclasses.dataclass(frozen=True)
class BandedPlan:
    """Static banded decomposition of a slot-weight table.

    Plane convention (matches ops/structured.py): value at vertex v is the
    weight of the edge ARRIVING at v from the class's source offset; +inf
    where no such edge exists (including band wrap-around rows, which is why
    shifted reads need no masks).
    """
    n_rows: int
    n_cols: int
    lat_fwd: jax.Array   # [R, C] w((r,c-1) -> (r,c))   — offset -1
    lat_bwd: jax.Array   # [R, C] w((r,c+1) -> (r,c))   — offset +1
    down: jax.Array      # [3, R, C] w((r-1,c+s) -> (r,c)), s = -1,0,+1
    up: jax.Array        # [3, R, C] w((r+1,c+s) -> (r,c)), s = -1,0,+1
    res_dst: jax.Array   # [Rz] i32 residual destinations (flat vertex ids)
    res_src: jax.Array   # [Rz] i32 residual sources
    res_w: jax.Array     # [Rz] f32
    coverage: float      # fraction of finite slot weights in the 8 planes


def infer_band_width(mesh: MeshArrays) -> int:
    """Most common |offset| > 2 in the adjacency — the grid minor-axis length
    for x-major terrain meshes. A `band_hint` registered by
    mesh.reorder.reorder_mesh (the row width it binned with) takes
    precedence — on irregular reordered meshes the offset histogram jitters
    around the true width."""
    from mesh_navigation_tpu.mesh.arrays import host_array_opt

    hint = host_array_opt(mesh, "band_hint")
    if hint is not None:
        return int(hint)
    adj = host_array(mesh, "adj_vertex")
    V = adj.shape[0]
    delta = np.abs(adj - np.arange(V)[:, None])
    mask = host_array(mesh, "adj_mask") & (delta > 2)
    if not mask.any():
        return 0
    vals, cnts = np.unique(delta[mask], return_counts=True)
    return int(vals[np.argmax(cnts)])


def build_banded_plan(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    *,
    n_cols: int = 0,
) -> BandedPlan:
    """Host-side classification of the slot-weight table into the six banded
    offset classes (+ residual COO)."""
    adj = host_array(mesh, "adj_vertex")
    W = np.asarray(weights_vd)
    V, D = adj.shape
    if n_cols <= 0:
        n_cols = infer_band_width(mesh)
    if n_cols <= 0:
        raise ValueError("mesh has no band structure")
    n = n_cols
    n_rows = -(-V // n)
    Vp = n_rows * n

    delta = adj - np.arange(V)[:, None]
    usable = np.isfinite(W) & host_array(mesh, "adj_mask")

    def plane(off: int) -> np.ndarray:
        p = np.full(Vp, np.inf, np.float32)
        hit = (delta == off) & usable
        rows, slots = np.nonzero(hit)
        p[rows] = W[rows, slots]
        return p.reshape(n_rows, n), hit

    covered = np.zeros_like(usable)
    lat_fwd, h = plane(-1); covered |= h
    lat_bwd, h = plane(+1); covered |= h
    down = np.empty((3, n_rows, n), np.float32)
    up = np.empty((3, n_rows, n), np.float32)
    for i, s in enumerate((-1, 0, +1)):
        down[i], h = plane(-(n - s)); covered |= h
        up[i], h = plane(n + s); covered |= h

    residual = usable & ~covered
    rows, slots = np.nonzero(residual)
    coverage = 1.0 - len(rows) / max(usable.sum(), 1)
    Rz = max(8, -(-len(rows) // 8) * 8)
    res_dst = np.zeros(Rz, np.int32)
    res_src = np.zeros(Rz, np.int32)
    res_w = np.full(Rz, np.inf, np.float32)
    res_dst[: len(rows)] = rows
    res_src[: len(rows)] = adj[rows, slots]
    res_w[: len(rows)] = W[rows, slots]
    return BandedPlan(
        n_rows=n_rows,
        n_cols=n,
        lat_fwd=jnp.asarray(lat_fwd),
        lat_bwd=jnp.asarray(lat_bwd),
        down=jnp.asarray(down),
        up=jnp.asarray(up),
        res_dst=jnp.asarray(res_dst),
        res_src=jnp.asarray(res_src),
        res_w=jnp.asarray(res_w),
        coverage=float(coverage),
    )


def _minplus_combine(x, y):
    a1, b1 = x
    a2, b2 = y
    return a1 + a2, jnp.minimum(b2, b1 + a2)


def _row_closure(row, w_fwd, w_bwd):
    """Exact 1D min-plus closure of one row. row [C, B]; weights [C, 1]."""
    _, row = jax.lax.associative_scan(_minplus_combine, (w_fwd, row), axis=0)
    wb = jnp.flip(w_bwd, axis=0)
    _, rb = jax.lax.associative_scan(
        _minplus_combine, (wb, jnp.flip(row, axis=0)), axis=0
    )
    return jnp.flip(rb, axis=0)


def _directional_pass(d_rcb, cross_planes, lat_f, lat_b, *, reverse: bool):
    """One GS pass over rows. d_rcb [R, C, B]; cross_planes [3, R, C] are the
    inbound cross-row planes for this direction; reverse sweeps bottom-up."""
    R, C, B = d_rcb.shape
    xs = (
        d_rcb,
        jnp.moveaxis(cross_planes, 0, 1),   # [R, 3, C]
        lat_f,                              # [R, C]
        lat_b,
    )

    def step(prev, x):
        row, cross, wf, wb = x
        # inbound from the previous (already-updated) row, three lanes:
        # source column c-1, c, c+1 — wrap rows carry inf plane weights
        cand = jnp.minimum(
            jnp.minimum(
                jnp.roll(prev, 1, axis=0) + cross[0][:, None],
                prev + cross[1][:, None],
            ),
            jnp.roll(prev, -1, axis=0) + cross[2][:, None],
        )
        row = jnp.minimum(row, cand)
        row = _row_closure(row, wf[:, None], wb[:, None])
        return row, row

    init = jnp.full((C, B), INF, d_rcb.dtype)
    _, out = jax.lax.scan(step, init, xs, reverse=reverse)
    return out


class BandedFieldResult(NamedTuple):
    dist: jax.Array       # [B, V]
    pred: jax.Array       # [B, V]
    rounds: jax.Array
    converged: jax.Array


def batched_field_banded(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    plan: BandedPlan,
    seeds: jax.Array,          # [B] i32
    *,
    max_rounds: int = 256,
    atol: float = 1e-5,
    rtol: float = 1e-5,
) -> BandedFieldResult:
    """Batched SSSP by banded GS rounds.

    One round = down pass + up pass + residual scatter-min; convergence when
    no label improves by more than atol + rtol*|label| in a round (every edge
    relaxation is then satisfied to that tolerance). atol=rtol=0 is the exact
    Dijkstra fixed point; the defaults skip the fp32 summation-jitter tail
    (improvements can't amplify through a relaxation).
    """
    V, D = weights_vd.shape
    B = seeds.shape[0]
    R, C = plan.n_rows, plan.n_cols
    Vp = R * C

    dist0 = jnp.where(
        jnp.arange(V, dtype=jnp.int32)[:, None] == seeds[None, :], 0.0, INF
    ).astype(jnp.float32)
    dist0 = jnp.pad(dist0, ((0, Vp - V), (0, 0)), constant_values=INF)

    has_residual = bool(plan.res_dst.shape[0])

    def one_round(d_flat):
        d = d_flat.reshape(R, C, B)
        d = _directional_pass(d, plan.down, plan.lat_fwd, plan.lat_bwd, reverse=False)
        d = _directional_pass(d, plan.up, plan.lat_fwd, plan.lat_bwd, reverse=True)
        d = d.reshape(Vp, B)
        if has_residual:
            cand = d[plan.res_src] + plan.res_w[:, None]
            d = d.at[plan.res_dst].min(cand)
        return d

    def cond(carry):
        return carry[2] & (carry[1] < max_rounds)

    def body(carry):
        d, it, _ = carry
        new = one_round(d)
        return new, it + 1, jnp.any(new * (1.0 + rtol) + atol < d)

    d, rounds, changed = jax.lax.while_loop(
        cond, body, (one_round(dist0), jnp.int32(1), jnp.bool_(True))
    )
    dist = d[:V]

    from mesh_navigation_tpu.ops.structured import predecessors_from_field

    pred = predecessors_from_field(mesh, weights_vd, dist)
    return BandedFieldResult(
        dist=dist.T, pred=pred.T, rounds=rounds, converged=~changed
    )
