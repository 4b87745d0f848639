"""Structured (offset-classed) relaxation — gather-free sweeps.

After a bandwidth-minimizing vertex ordering (our builders emit x-major
orders; grid-like terrain is natural band form), most adjacency slots share a
handful of constant index offsets δ = neighbour − vertex. Each such class
relaxes as a *shift*:

    best = min(best, roll(dist, -δ) + w_δ)

— a dense VPU op with no gather at all (wrap-around rows carry w_δ = inf, so
the wrapped values are masked arithmetically). Edges outside the top-K offset
classes go into a sparse residual (COO) relaxed by one small scatter-min per
sweep. On TPU this halves sweep time vs the gather formulation (measured
0.32 vs 0.67 ms/sweep at [16k, 256]) and the fixed point is identical.

`build_offset_plan` decides per mesh whether the structured path is worth it
(coverage threshold); `batched_field_structured` is a drop-in for
ordered.batched_field_hybrid.
"""

from __future__ import annotations

import functools

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array

INF = jnp.inf


import dataclasses


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("planes", "res_dst", "res_src", "res_w", "slot_map", "res_slot"),
    meta_fields=("offsets", "coverage"),
)
@dataclasses.dataclass(frozen=True)
class OffsetPlan:
    """Offset classification of a slot-weight table. `offsets` and
    `coverage` are static metadata (jit specializes on them — required since
    shift amounts and kernel shapes derive from the offsets).

    Classification is STRUCTURAL (mesh adjacency only): lethal/inf weights
    flow through as +inf plane entries, so a cost change only needs
    `refresh_offset_planes` (on device), never a host rebuild."""
    offsets: tuple[int, ...]      # static offset classes
    planes: jax.Array             # [K, V] f32 per-class weights (inf = no edge)
    res_dst: jax.Array            # [R] i32 residual edge destinations
    res_src: jax.Array            # [R] i32 residual edge sources
    res_w: jax.Array              # [R] f32
    slot_map: jax.Array           # [K, V] i32 adjacency slot per class (-1 = none)
    res_slot: jax.Array           # [R] i32 adjacency slot per residual (-1 = pad)
    coverage: float               # fraction of edges in offset classes


def build_offset_plan(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    *,
    max_offsets: int = 12,
) -> OffsetPlan:
    """Host-side offset classification of the slot-weight table.

    The class selection and slot maps depend only on the adjacency structure
    (adj_mask), NOT on the weight values: an edge that is lethal today may be
    cleared tomorrow (obstacle removed), so every structural edge must stay
    addressable by refresh_offset_planes."""
    adj = host_array(mesh, "adj_vertex")
    mask = host_array(mesh, "adj_mask")
    W = np.asarray(weights_vd)
    V, D = adj.shape
    delta = adj - np.arange(V)[:, None]
    vals, cnts = np.unique(delta[mask], return_counts=True)
    order = np.argsort(-cnts)
    top = [int(v) for v in vals[order][:max_offsets] if v != 0]
    covered = np.zeros_like(mask)
    planes = np.full((len(top), V), np.inf, np.float32)
    slot_map = np.full((len(top), V), -1, np.int32)
    for k, d in enumerate(top):
        hit = (delta == d) & mask
        rows, slots = np.nonzero(hit)
        planes[k, rows] = W[rows, slots]
        slot_map[k, rows] = slots
        covered |= hit
    residual = mask & ~covered
    rows, slots = np.nonzero(residual)
    coverage = 1.0 - len(rows) / max(mask.sum(), 1)
    # pad residual to a multiple of 8 with self-loops at inf
    R = len(rows)
    Rp = max(8, -(-R // 8) * 8)
    res_dst = np.zeros(Rp, np.int32)
    res_src = np.zeros(Rp, np.int32)
    res_slot = np.full(Rp, -1, np.int32)
    res_w = np.full(Rp, np.inf, np.float32)
    res_dst[:R] = rows
    res_src[:R] = adj[rows, slots]
    res_slot[:R] = slots
    res_w[:R] = W[rows, slots]
    return OffsetPlan(
        offsets=tuple(top),
        planes=jnp.asarray(planes),
        res_dst=jnp.asarray(res_dst),
        res_src=jnp.asarray(res_src),
        res_w=jnp.asarray(res_w),
        slot_map=jnp.asarray(slot_map),
        res_slot=jnp.asarray(res_slot),
        coverage=float(coverage),
    )


def refresh_offset_planes(plan: OffsetPlan, weights_vd: jax.Array) -> OffsetPlan:
    """Re-derive the weight planes + residual weights from a new [V, D]
    slot-weight table — on device, jittable (the live-replan path, same
    contract as pallas_banded.refresh_banded_planes). The static
    classification (offsets, slot maps, residual indices) is reused."""
    W = weights_vd
    # planes[k, v] = W[v, slot_map[k, v]] where a class edge exists, else inf
    planes = jnp.where(
        plan.slot_map >= 0,
        jnp.take_along_axis(W, jnp.maximum(plan.slot_map, 0).T, axis=1).T,
        INF,
    ).astype(jnp.float32)
    res_w = jnp.where(
        plan.res_slot >= 0,
        W[plan.res_dst, jnp.maximum(plan.res_slot, 0)],
        INF,
    ).astype(jnp.float32)
    return dataclasses.replace(plan, planes=planes, res_w=res_w)


class StructuredFieldResult(NamedTuple):
    dist: jax.Array       # [B, V]
    pred: jax.Array       # [B, V]
    sweeps: jax.Array
    converged: jax.Array


def batched_field_structured(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    plan: OffsetPlan,
    seeds: jax.Array,          # [B]
    *,
    block_sweeps: int = 16,
    max_sweeps: int = 0,
    use_pallas: bool | None = None,
    tile: int = 0,
    n_inner: int = 0,
    dtype=jnp.float32,
) -> StructuredFieldResult:
    """Batched SSSP with offset-shift sweeps + residual scatter-min; exact
    Dijkstra fixed point, [V, B] layout. On TPU the sweep runs as the fused
    Pallas kernel (ops/pallas_sweep.py) unless disabled.

    dtype=jnp.bfloat16 halves sweep bandwidth for large meshes at ~0.4% mean
    / <2% worst-case relative label error (opt-in approximate mode — the
    default f32 path is exact; predecessors are recovered in f32 against the
    bf16 labels)."""
    from mesh_navigation_tpu.ops import pallas_sweep

    V, D = weights_vd.shape
    B = seeds.shape[0]
    if max_sweeps <= 0:
        max_sweeps = 4 * V
    n_blocks = -(-max_sweeps // block_sweeps)
    itemsize = jnp.dtype(dtype).itemsize
    if tile <= 0:
        # VMEM budget: 3 window blocks, double-buffered -> keep under ~10MB
        tile = min(1024, max(256, (10 * 2**20) // (24 * B * itemsize)))
        tile = (tile // 256) * 256
    if n_inner <= 0:
        # enough in-kernel iterations for a label to cross the tile
        max_off = max((abs(o) for o in plan.offsets), default=1)
        n_inner = int(np.clip(-(-tile // max(max_off, 1)), 2, 12))
    if use_pallas is None:
        use_pallas = (
            pallas_sweep.pallas_available()
            and bool(plan.offsets)
            and max(abs(o) for o in plan.offsets) <= tile
            and B % 128 == 0
        )

    dist0 = jnp.where(
        jnp.arange(V, dtype=jnp.int32)[:, None] == seeds[None, :], 0.0, INF
    ).astype(dtype)

    K = len(plan.offsets)
    planes = [plan.planes[k][:, None] for k in range(K)]
    # padding residual rows carry inf weights, so applying the residual
    # unconditionally is correct (and free when coverage == 1)
    has_residual = plan.res_dst.shape[0] > 0

    if use_pallas:
        Vp = -(-V // tile) * tile
        planes_p = jnp.pad(
            plan.planes, ((0, 0), (0, Vp - V)), constant_values=INF
        ).astype(dtype)

        def sweep_p(dp):
            dp = pallas_sweep.fused_sweep(
                dp, planes_p, plan.offsets, tile=tile, n_inner=n_inner
            )
            if has_residual:
                cand = dp[plan.res_src + tile] + plan.res_w[:, None].astype(dtype)
                dp = dp.at[plan.res_dst + tile].min(cand)
            return dp

        dp0 = jnp.full((tile + Vp + tile, B), INF, dtype)
        dp0 = dp0.at[tile : tile + V].set(dist0)

        def block_p(carry):
            d, it, _ = carry
            new = jax.lax.fori_loop(0, block_sweeps, lambda _, x: sweep_p(x), d)
            return new, it + block_sweeps, jnp.any(new < d)

        def cond_p(carry):
            return carry[2] & (carry[1] < n_blocks * block_sweeps)

        dp, sweeps_done, changed = jax.lax.while_loop(
            cond_p, block_p, (sweep_p(dp0), jnp.int32(1), jnp.bool_(True))
        )
        dist = dp[tile : tile + V]
    else:
        def sweep(d):
            best = d
            for k, off in enumerate(plan.offsets):
                best = jnp.minimum(
                    best, jnp.roll(d, -off, axis=0) + planes[k].astype(dtype)
                )
            if has_residual:
                cand = d[plan.res_src] + plan.res_w[:, None].astype(dtype)  # [R, B]
                best = best.at[plan.res_dst].min(cand)
            return best

        def block(carry):
            d, it, _ = carry
            new = jax.lax.fori_loop(0, block_sweeps, lambda _, x: sweep(x), d)
            return new, it + block_sweeps, jnp.any(new < d)

        def cond(carry):
            return carry[2] & (carry[1] < n_blocks * block_sweeps)

        dist, sweeps_done, changed = jax.lax.while_loop(
            cond, block, (sweep(dist0), jnp.int32(1), jnp.bool_(True))
        )

    dist = dist.astype(jnp.float32)
    pred_tol = 1e-6 if dtype == jnp.float32 else 1e-2
    pred = predecessors_from_field(mesh, weights_vd, dist, tol=pred_tol)
    return StructuredFieldResult(
        dist=dist.T, pred=pred.T, sweeps=sweeps_done, converged=~changed
    )


def predecessors_from_field(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    dist_vb: jax.Array,
    *,
    tol: float = 1e-6,
) -> jax.Array:
    """Predecessor recovery against a converged [V, B] field, slot-unrolled
    so no [V, D, B] buffer materializes (pred[v] = argmin_u dist[u] + w(u,v),
    the relaxation that produced dist[v] — dijkstra_mesh_planner.cpp:320-347
    semantics)."""
    V, D = weights_vd.shape
    adj = mesh.adj_vertex
    vidx = jnp.arange(V, dtype=jnp.int32)
    best = jnp.full_like(dist_vb, INF)
    arg = jnp.zeros(dist_vb.shape, jnp.int32)
    for j in range(D):
        cand_j = dist_vb[adj[:, j]] + weights_vd[:, j][:, None]
        better = cand_j < best
        best = jnp.where(better, cand_j, best)
        arg = jnp.where(better, j, arg)
    has = (best <= dist_vb * (1 + tol) + tol) & (dist_vb > 0) & jnp.isfinite(dist_vb)
    return jnp.where(has, adj[vidx[:, None], arg], vidx[:, None])
