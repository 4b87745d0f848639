"""Pallas TPU kernel for the banded Gauss-Seidel fast-sweeping solver.

The lax.scan formulation in ops/banded.py is dispatch-bound: every row step
is ~30 tiny VPU ops on a [C, B] slab (~91 us/step measured — microseconds of
work behind milliseconds of overhead). This kernel runs one *directional
pass* (all rows, Gauss-Seidel) as a single pallas_call:

- grid = (batch_blocks, row_blocks); TPU grids execute sequentially with the
  last dimension minor, so the previous row's freshly-updated labels are
  carried across row blocks in a VMEM scratch buffer — Gauss-Seidel over the
  whole mesh with zero HBM round-trips for the carry.
- Each grid step owns an [RB, C, BB] block of the distance field: for every
  row it (1) relaxes the three inbound cross-row lanes from the carried row,
  (2) runs a Hillis-Steele min-plus scan along the row in both directions.
  The chain weights A_k[c] = w(chain c-k -> c) needed at scan step k are
  *distance-independent*, so they are precomputed host-side per plan; each
  in-kernel scan step is shift + add + min on the [C, BB] slab.
- The scan depth is a tunable, not a correctness knob: every scan step is a
  valid relaxation (chain weights are exact path costs) and step 0 alone
  covers the +-1 lateral edges, so the while_loop fixed point equals the
  Dijkstra fixed point at ANY depth >= 1 (same argument as ops/banded.py);
  depth only trades per-round cost against round count.
- The distance block is input_output-aliased (read once, written once) and
  each step emits a changed flag to SMEM, so convergence detection costs no
  extra HBM pass.

Replaces the reference's sequential Meap wavefront
(dijkstra_mesh_planner.cpp:287-348) at large scale.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.ops import banded as _banded
from mesh_navigation_tpu.ops.pallas_sweep import pallas_available

INF = jnp.inf


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=(
        "down", "up", "a_fwd", "a_bwd", "res_dst", "res_src", "res_w",
        "slot_map", "res_slot", "xdown", "xup", "xslot_down", "xslot_up",
        "lat_fwd", "lat_bwd", "dist_lat_fwd", "dist_lat_bwd", "dist_down",
        "dist_up", "xdist_down", "xdist_up", "res_dist",
        "l2_fwd", "l2_bwd", "wback_fwd", "wback_bwd",
        "res_row_map", "res_jump", "res_order", "res_entry_row",
        "res_entry_slot",
    ),
    meta_fields=(
        "n_rows", "n_cols", "n_cols_pad", "n_scan", "coverage", "num_vertices",
        "n_residual", "xlanes_down", "xlanes_up", "n_scan2", "n_res_dst",
    ),
)
@dataclasses.dataclass(frozen=True)
class BandedKernelPlan:
    """2D-padded banded decomposition + precomputed scan chain weights.

    All planes live on the padded [R, Cp] grid (inf in padding columns/rows);
    residual edge indices are remapped to padded flat ids r * Cp + c.

    The *structure* (slot_map, residual indices) depends only on the mesh
    adjacency, not on the weight values: lethal/inf weights flow through the
    planes as +inf. `refresh_banded_planes` therefore re-derives all weight
    planes on device from a new [V, D] slot-weight table — the live-replan
    path (cost layers change -> new edge weights) with zero host round trips.
    """
    n_rows: int          # R (unpadded; kernel pads to the row-block multiple)
    n_cols: int          # C original
    n_cols_pad: int      # Cp (multiple of 8)
    n_scan: int          # scan steps S (spans 1, 2, ..., 2^(S-1))
    coverage: float
    num_vertices: int
    n_residual: int      # REAL residual edge count (res_* are padded to >= 8)
    # row-major leading dim: Mosaic constrains only the LAST TWO block dims,
    # so [R, 3|S, Cp] blocks stay legal for any row-block size rb
    down: jax.Array      # [R, 3, Cp] w((r-1, c+s) -> (r, c)), s = -1, 0, +1
    up: jax.Array        # [R, 3, Cp] w((r+1, c+s) -> (r, c))
    a_fwd: jax.Array     # [R, S, Cp] chain weight of (r, c-2^s) -> (r, c)
    a_bwd: jax.Array     # [R, S, Cp] chain weight of (r, c+2^s) -> (r, c)
    res_dst: jax.Array   # [Rz] i32 padded flat ids
    res_src: jax.Array   # [Rz] i32 padded flat ids
    res_w: jax.Array     # [Rz] f32
    # class order: 0=lat_fwd(-1), 1=lat_bwd(+1), 2..4=down(s=-1,0,+1),
    # 5..7=up(s=-1,0,+1); -1 = vertex has no edge in that class
    slot_map: jax.Array  # [8, V] i32 adjacency slot of each class edge
    res_slot: jax.Array  # [Rz] i32 adjacency slot of each residual edge (-1 pad)
    # EXTENDED lanes (irregular band-reordered meshes): off-core offsets
    # (|dr| <= 2, |dc| <= 4) relaxed densely in-kernel so formerly-residual
    # edges propagate every pass instead of once per round. Lane descriptor
    # (src_sel, dc): src_sel 1 = fresh carried row (|dr| = 1), 2 = second
    # carried row (|dr| = 2), 0 = own row. These edges stay on the residual
    # list too (the scatter + pred machinery is unchanged); the lanes are a
    # pure sweep accelerator, so the fixed point is identical.
    xlanes_down: tuple = ()
    xlanes_up: tuple = ()
    xdown: jax.Array = None    # [R, Lxd, Cp] (or [R, 1, Cp] dummy)
    xup: jax.Array = None      # [R, Lxu, Cp]
    xslot_down: jax.Array = None   # [Lxd, V] i32 (device refresh)
    xslot_up: jax.Array = None     # [Lxu, V]
    # RAW ±1 lateral planes: predecessor recovery must see only real edges.
    # The scan chains (a_fwd/a_bwd) may instead be built from EFFECTIVE
    # lateral weights min(direct, 2-hop detour via the adjacent rows) —
    # real path costs, so the fixed point is identical, but a broken row
    # chain (consecutive vertices without an edge — common on irregular
    # reordered meshes) no longer stalls lateral propagation to ~2
    # columns/pass (measured: 39 -> ~6 rounds at 262k jittered-Delaunay).
    lat_fwd: jax.Array = None  # [R, Cp] w((r, c-1) -> (r, c)) direct only
    lat_bwd: jax.Array = None  # [R, Cp] w((r, c+1) -> (r, c))
    # STATIC per-class Euclidean DISTANCE planes (geometry only; invalid
    # endpoints baked in as inf). They make the live-replan refresh
    # gather-free: a cost change reduces to dense 2D shifts of the cost
    # field (refresh_banded_planes_from_costs) — no [V, D] weight table on
    # the hot path (measured 157 ms of gathers at 1M).
    dist_lat_fwd: jax.Array = None   # [R, Cp]
    dist_lat_bwd: jax.Array = None
    dist_down: jax.Array = None      # [R, 3, Cp]
    dist_up: jax.Array = None
    xdist_down: jax.Array = None     # [R, Lxd, Cp]
    xdist_up: jax.Array = None
    res_dist: jax.Array = None       # [Rz]
    # TWO-LEVEL lateral scan tables (work-efficient scan decomposition:
    # 3 full-slab Hillis-Steele steps cover in-block spans <= 7, then the
    # remaining levels run on the 8x-decimated block-boundary array and one
    # combine step folds the prefix back). n_scan2 = boundary-level steps
    # (0 = flat scan). The in-kernel scans are the VPU bottleneck of the
    # whole solver; this trades 7 full-slab steps for 7 eighth-slab steps
    # + extract/upsample shuffles.
    n_scan2: int = 0
    l2_fwd: jax.Array = None   # [R, S2, NB] chains between fwd boundaries
    # residual-dst CSR (static structure; weights looked up via res_w):
    # row_map[v] = row into the per-dst tables (-1 = v has no residual
    # in-edge); jump[row, slot] = REAL src id; entry_row/entry_slot place
    # each res_* entry (in res_order order) into its (row, slot) cell —
    # up to 8 slots per dst (same probe bound as pred_at_vertices). This
    # is what lets the light path keep int8 class preds on residual
    # (irregular) meshes: class 9 = "follow my residual slot" decoded by
    # extract_paths_cls through jump, instead of a 4x-larger int32 table.
    n_res_dst: int = 0
    res_row_map: jax.Array = None    # [V] i32
    res_jump: jax.Array = None       # [NDp, 8] i32 REAL src ids
    res_order: jax.Array = None      # [Rz] i32 dst-sort order of res entries
    res_entry_row: jax.Array = None  # [Rz] i32 (-1 = padded/overflow entry)
    res_entry_slot: jax.Array = None # [Rz] i32
    l2_bwd: jax.Array = None   # [R, S2, NB]
    wback_fwd: jax.Array = None  # [R, Cp] chain from own block's left
                                 # boundary (prev block's col 7) to c
    wback_bwd: jax.Array = None  # [R, Cp] chain from next block's col 0 to c


def _class_offsets(n: int) -> list[int]:
    """Banded class order (must match BandedKernelPlan.slot_map docs and the
    down/up plane lane order s = -1, 0, +1)."""
    return [-1, +1, -(n + 1), -n, -(n - 1), n - 1, n, n + 1]


def _shift2(x, dr, dc, xp=np):
    """result[r, c] = x[r+dr, c+dc] over [R, Cp], +inf outside."""
    R, C = x.shape
    out = xp.full_like(x, np.inf)
    rs = slice(max(dr, 0), R + min(dr, 0))
    rd = slice(max(-dr, 0), R + min(-dr, 0))
    cs = slice(max(dc, 0), C + min(dc, 0))
    cd = slice(max(-dc, 0), C + min(-dc, 0))
    if xp is np:
        out[rd, cd] = x[rs, cs]
        return out
    return out.at[rd, cd].set(x[rs, cs])


def _effective_laterals(lat_fwd, lat_bwd, down, up, xp=np):
    """min(direct, 2-hop detours through rows r-1 / r+1) for the ±1 lateral
    chain links. Each detour is an exact path cost over real edges, so scan
    chains built from these stay valid relaxations (monotone upper bounds);
    they only ACCELERATE lateral propagation across broken row chains."""
    dn = [down[:, i, :] for i in range(3)]   # s = -1, 0, +1
    u = [up[:, i, :] for i in range(3)]
    S = lambda a, dr, dc: _shift2(a, dr, dc, xp)
    lat_f = lat_fwd
    for cand in (
        S(u[1], -1, -1) + dn[0],     # (r,c-1)->(r-1,c-1)->(r,c)
        S(u[0], -1, 0) + dn[1],      # (r,c-1)->(r-1,c)->(r,c)
        S(dn[1], 1, -1) + u[0],      # (r,c-1)->(r+1,c-1)->(r,c)
        S(dn[0], 1, 0) + u[1],       # (r,c-1)->(r+1,c)->(r,c)
    ):
        lat_f = xp.minimum(lat_f, cand)
    lat_b = lat_bwd
    for cand in (
        S(u[1], -1, 1) + dn[2],      # (r,c+1)->(r-1,c+1)->(r,c)
        S(u[2], -1, 0) + dn[1],      # (r,c+1)->(r-1,c)->(r,c)
        S(dn[1], 1, 1) + u[2],       # (r,c+1)->(r+1,c+1)->(r,c)
        S(dn[2], 1, 0) + u[1],       # (r,c+1)->(r+1,c)->(r,c)
    ):
        lat_b = xp.minimum(lat_b, cand)
    return lat_f, lat_b


def _chain_weights(lat_fwd, lat_bwd, n_scan, xp=np):
    """Min-plus scan chain weights from the +-1 lateral planes ([R, Cp]).
    A_f[s][c] = cost of the lateral chain (c - 2^s) -> c; inf where the chain
    leaves the row (so wrapped/rolled reads never propagate)."""
    def shift_d(x, k):  # result[c] = x[c-k], inf fill
        fill = xp.full(x.shape[:-1] + (k,), np.inf, x.dtype)
        return xp.concatenate([fill, x[..., :-k]], axis=-1)

    def shift_u(x, k):
        fill = xp.full(x.shape[:-1] + (k,), np.inf, x.dtype)
        return xp.concatenate([x[..., k:], fill], axis=-1)

    a_fwd = [lat_fwd]
    a_bwd = [lat_bwd]
    for s in range(1, n_scan):
        k = 1 << (s - 1)
        a_fwd.append(shift_d(a_fwd[-1], k) + a_fwd[-1])
        a_bwd.append(shift_u(a_bwd[-1], k) + a_bwd[-1])
    return xp.stack(a_fwd, axis=1), xp.stack(a_bwd, axis=1)   # [R, S, Cp]


def _two_level_tables(a_fwd, a_bwd, n_scan: int, Cp: int, xp=np):
    """Derive the boundary-level chain tables + back-fill prefix planes from
    the full chain stack. Returns (n_scan2, l2f, l2b, wback_f, wback_b) —
    all None/0 when the column count doesn't decompose into 8-blocks or the
    chain stack is not full-depth."""
    full = n_scan >= max(1, int(np.ceil(np.log2(max(Cp, 2)))))
    if Cp % 8 or Cp < 64 or not full or n_scan <= 3:
        return 0, None, None, None, None
    NB = Cp // 8
    S2 = n_scan - 3
    # fwd boundaries at column 8j+7: chain level 3+t sampled there spans
    # exactly 2^t boundary hops; bwd boundaries at column 8j
    l2f = a_fwd[:, 3:, 7::8]
    l2b = a_bwd[:, 3:, 0::8]
    R = a_fwd.shape[0]
    wf = xp.cumsum(a_fwd[:, 0, :].reshape(R, NB, 8), axis=-1).reshape(R, Cp)
    ab0 = a_bwd[:, 0, :].reshape(R, NB, 8)
    wb = xp.flip(
        xp.cumsum(xp.flip(ab0, axis=-1), axis=-1), axis=-1
    ).reshape(R, Cp)
    return S2, l2f, l2b, wf, wb


def build_banded_kernel_plan(
    mesh: MeshArrays,
    weights_vd,
    *,
    n_cols: int = 0,
    n_scan: int = 0,
    extended: bool | None = None,
) -> BandedKernelPlan:
    """Host-side: classify the adjacency into the eight banded offset classes
    (slot_map), derive the weight planes + min-plus chain weights, and remap
    residual edges to the padded grid.

    `weights_vd` may be a numpy array (preferred at scale — see
    sweeps.slot_weights_np; a device array costs a device->host pull here).
    The classification itself is weight-independent, so a cost change only
    needs `refresh_banded_planes` (on device), not a rebuild.
    """
    from mesh_navigation_tpu.mesh.arrays import host_array

    adj = host_array(mesh, "adj_vertex")
    mask = host_array(mesh, "adj_mask")
    W = np.asarray(weights_vd)
    V, D = adj.shape
    if n_cols <= 0:
        n_cols = _banded.infer_band_width(mesh)
    if n_cols <= 0:
        raise ValueError("mesh has no band structure")
    n = n_cols
    R = -(-V // n)
    Cp = _round_up(n, 8)
    if n_scan <= 0:
        n_scan = max(1, int(np.ceil(np.log2(n))))

    delta = adj - np.arange(V, dtype=np.int64)[:, None]
    offsets = _class_offsets(n)
    # lateral column offset of each class (order matches _class_offsets);
    # an id-delta hit whose source column would cross a row boundary (e.g.
    # delta==-1 at col 0) is NOT relaxable by the shift-based sweep kernel —
    # route it to the residual list so classification == relaxability and
    # the inf-weight assumption in _inbound_tables holds on any mesh.
    class_dc = [-1, +1, -1, 0, +1, -1, 0, +1]
    col = np.arange(V, dtype=np.int64) % n
    slot_map = np.full((8, V), -1, np.int32)
    covered = np.zeros((V, D), bool)
    for k, (off, dc) in enumerate(zip(offsets, class_dc)):
        hit = (delta == off) & mask & ((col + dc >= 0) & (col + dc < n))[:, None]
        rows, slots = np.nonzero(hit)
        slot_map[k, rows] = slots
        covered |= hit

    def plane(k):
        sm = slot_map[k]
        w = np.where(sm >= 0, W[np.arange(V), np.maximum(sm, 0)], np.inf)
        p = np.full(R * n, np.inf, np.float32)
        p[:V] = w
        return np.pad(p.reshape(R, n), ((0, 0), (0, Cp - n)), constant_values=np.inf)

    lat_fwd, lat_bwd = plane(0), plane(1)
    down = np.stack([plane(2), plane(3), plane(4)], axis=1)   # [R, 3, Cp]
    up = np.stack([plane(5), plane(6), plane(7)], axis=1)
    # chains from EFFECTIVE laterals (identical to direct on grids: an inf
    # direct edge there implies an untraversable endpoint, so detours are
    # inf too; on irregular meshes detours bridge broken row chains)
    lat_f_eff, lat_b_eff = _effective_laterals(lat_fwd, lat_bwd, down, up)
    a_fwd, a_bwd = _chain_weights(lat_f_eff, lat_b_eff, n_scan)   # [R, S, Cp]
    n_scan2, l2f, l2b, wbf, wbb = _two_level_tables(a_fwd, a_bwd, n_scan, Cp)

    # residual: structural leftovers (edges outside the eight classes)
    rows, slots = np.nonzero(mask & ~covered)
    coverage = 1.0 - len(rows) / max(mask.sum(), 1)

    # extended lanes (auto-on when the core classes leave a real residual —
    # irregular reordered meshes): classify leftovers at |dr| <= 2,
    # |dc| <= 4 and relax them as dense in-kernel lanes; prune lanes with
    # negligible population. NOTE: these edges stay on the residual list.
    if extended is None:
        extended = coverage < 0.995
    xlanes_down: list = []
    xlanes_up: list = []
    xplanes_down: list = []
    xplanes_up: list = []
    xslots_down: list = []
    xslots_up: list = []
    if extended and len(rows):
        leftover = mask & ~covered
        min_hits = max(16, int(2e-4 * mask.sum()))
        core = {(0, -1), (0, 1), (-1, -1), (-1, 0), (-1, 1),
                (1, -1), (1, 0), (1, 1), (0, 0)}
        for dr in (-2, -1, 0, 1, 2):
            for dc in range(-4, 5):
                if (dr, dc) in core:
                    continue
                off = dr * n + dc
                hit = (
                    (delta == off) & leftover
                    & ((col + dc >= 0) & (col + dc < n))[:, None]
                )
                n_hit = int(hit.sum())
                if n_hit < min_hits:
                    continue
                vrows, vslots = np.nonzero(hit)
                xsm = np.full(V, -1, np.int32)
                xsm[vrows] = vslots
                w = np.where(xsm >= 0, W[np.arange(V), np.maximum(xsm, 0)], np.inf)
                p = np.full(R * n, np.inf, np.float32)
                p[:V] = w
                p = np.pad(
                    p.reshape(R, n), ((0, 0), (0, Cp - n)),
                    constant_values=np.inf,
                )
                sel = abs(dr)        # 0 = own row, 1 = carried, 2 = 2nd carried
                if dr <= 0:
                    xlanes_down.append((sel, dc))
                    xplanes_down.append(p)
                    xslots_down.append(xsm)
                if dr >= 0:
                    xlanes_up.append((sel, dc))
                    xplanes_up.append(p)
                    xslots_up.append(xsm)
    Rz = max(8, -(-len(rows) // 8) * 8)
    res_dst = np.zeros(Rz, np.int32)
    res_src = np.zeros(Rz, np.int32)
    res_slot = np.full(Rz, -1, np.int32)
    res_w = np.full(Rz, np.inf, np.float32)
    srcs = adj[rows, slots]
    res_dst[: len(rows)] = (rows // n) * Cp + rows % n
    res_src[: len(rows)] = (srcs // n) * Cp + srcs % n
    res_slot[: len(rows)] = slots
    res_w[: len(rows)] = W[rows, slots]

    def xstack(planes):
        if planes:
            return jnp.asarray(np.stack(planes, axis=1), jnp.float32)
        return jnp.full((R, 1, Cp), np.inf, jnp.float32)   # dummy lane

    def xslot(slots):
        if slots:
            return jnp.asarray(np.stack(slots, axis=0))
        return jnp.full((1, V), -1, jnp.int32)

    # static geometry planes: per-slot Euclidean edge lengths with invalid
    # endpoints baked in as inf (they never change with costs)
    adj_e = host_array(mesh, "adj_edge")
    invalid = host_array(mesh, "invalid")
    edist = host_array(mesh, "edge_dist")
    D_slots = np.where(
        mask & ~invalid[adj] & ~invalid[:, None], edist[adj_e], np.inf
    ).astype(np.float32)

    def dplane(sm):
        w = np.where(sm >= 0, D_slots[np.arange(V), np.maximum(sm, 0)], np.inf)
        p = np.full(R * n, np.inf, np.float32)
        p[:V] = w
        return np.pad(
            p.reshape(R, n), ((0, 0), (0, Cp - n)), constant_values=np.inf
        )

    dist_lat_fwd = dplane(slot_map[0])
    dist_lat_bwd = dplane(slot_map[1])
    dist_down = np.stack([dplane(slot_map[2 + i]) for i in range(3)], axis=1)
    dist_up = np.stack([dplane(slot_map[5 + i]) for i in range(3)], axis=1)
    xdist_down_l = [dplane(s) for s in xslots_down]
    xdist_up_l = [dplane(s) for s in xslots_up]
    res_dist = np.where(
        res_slot >= 0,
        D_slots[
            (res_dst // Cp) * n + res_dst % Cp, np.maximum(res_slot, 0)
        ],
        np.inf,
    ).astype(np.float32)

    def xstack_np(planes):
        if planes:
            return jnp.asarray(np.stack(planes, axis=1), jnp.float32)
        return jnp.full((R, 1, Cp), np.inf, jnp.float32)

    # residual-dst CSR + jump table (int8-class pred encoding on residual
    # meshes): sort entries by dst, cap at 8 slots per dst
    n_real = len(rows)
    res_order_np = np.argsort(res_dst[:n_real], kind="stable")
    res_order_np = np.concatenate(
        [res_order_np, np.arange(n_real, Rz)]
    ).astype(np.int32)
    sorted_dst = res_dst[res_order_np[:n_real]]
    uniq_dst, start_idx = np.unique(sorted_dst, return_index=True)
    n_res_dst = len(uniq_dst)
    NDp = max(8, n_res_dst)
    row_map_np = np.full(V, -1, np.int32)
    uniq_real = (uniq_dst // Cp) * n + uniq_dst % Cp
    row_map_np[uniq_real] = np.arange(n_res_dst, dtype=np.int32)
    entry_row = np.full(Rz, -1, np.int32)
    entry_slot = np.zeros(Rz, np.int32)
    if n_real:
        rows_of_sorted = np.searchsorted(uniq_dst, sorted_dst).astype(np.int32)
        slots_of_sorted = (np.arange(n_real) - start_idx[rows_of_sorted]).astype(np.int32)
        ok_slot = slots_of_sorted < 8
        entry_row[:n_real] = np.where(ok_slot, rows_of_sorted, -1)
        entry_slot[:n_real] = np.where(ok_slot, slots_of_sorted, 0)
    jump_np = np.zeros((NDp, 8), np.int32)
    if n_real:
        srcs_sorted = res_src[res_order_np[:n_real]]
        src_real_sorted = (srcs_sorted // Cp) * n + srcs_sorted % Cp
        ok = entry_row[:n_real] >= 0
        jump_np[entry_row[:n_real][ok], entry_slot[:n_real][ok]] = (
            src_real_sorted[ok]
        )

    return BandedKernelPlan(
        n_rows=R,
        n_cols=n,
        n_cols_pad=Cp,
        n_scan=n_scan,
        coverage=float(coverage),
        num_vertices=V,
        n_residual=int(len(rows)),
        down=jnp.asarray(down, jnp.float32),
        up=jnp.asarray(up, jnp.float32),
        a_fwd=jnp.asarray(a_fwd, jnp.float32),
        a_bwd=jnp.asarray(a_bwd, jnp.float32),
        res_dst=jnp.asarray(res_dst),
        res_src=jnp.asarray(res_src),
        res_w=jnp.asarray(res_w),
        slot_map=jnp.asarray(slot_map),
        res_slot=jnp.asarray(res_slot),
        lat_fwd=jnp.asarray(lat_fwd, jnp.float32),
        lat_bwd=jnp.asarray(lat_bwd, jnp.float32),
        xlanes_down=tuple(xlanes_down),
        xlanes_up=tuple(xlanes_up),
        xdown=xstack(xplanes_down),
        xup=xstack(xplanes_up),
        xslot_down=xslot(xslots_down),
        xslot_up=xslot(xslots_up),
        dist_lat_fwd=jnp.asarray(dist_lat_fwd),
        dist_lat_bwd=jnp.asarray(dist_lat_bwd),
        dist_down=jnp.asarray(dist_down),
        dist_up=jnp.asarray(dist_up),
        xdist_down=xstack_np(xdist_down_l),
        xdist_up=xstack_np(xdist_up_l),
        res_dist=jnp.asarray(res_dist),
        n_scan2=n_scan2,
        l2_fwd=None if l2f is None else jnp.asarray(l2f, jnp.float32),
        l2_bwd=None if l2b is None else jnp.asarray(l2b, jnp.float32),
        wback_fwd=None if wbf is None else jnp.asarray(wbf, jnp.float32),
        wback_bwd=None if wbb is None else jnp.asarray(wbb, jnp.float32),
        n_res_dst=int(n_res_dst),
        res_row_map=jnp.asarray(row_map_np),
        res_jump=jnp.asarray(jump_np),
        res_order=jnp.asarray(res_order_np),
        res_entry_row=jnp.asarray(entry_row),
        res_entry_slot=jnp.asarray(entry_slot),
    )


def refresh_banded_planes(
    plan: BandedKernelPlan, weights_vd: jax.Array
) -> BandedKernelPlan:
    """Re-derive all weight planes from a new [V, D] slot-weight table — on
    device, jittable. This is the live-replan path: when cost layers change
    (obstacle/inflation cascade -> new edge weights, SURVEY.md §3.5) the
    banded solve stays available without any host round trip. The static
    classification (slot_map, residual indices) is reused; lethal edges show
    up as +inf plane entries exactly as in a host rebuild."""
    V = plan.num_vertices
    R, C, Cp, S = plan.n_rows, plan.n_cols, plan.n_cols_pad, plan.n_scan
    W = weights_vd

    def plane(k):
        sm = plan.slot_map[k]
        w = jnp.where(
            sm >= 0,
            jnp.take_along_axis(W, jnp.maximum(sm, 0)[:, None], axis=1)[:, 0],
            INF,
        ).astype(jnp.float32)
        p = jnp.full((R * C,), INF, jnp.float32).at[:V].set(w).reshape(R, C)
        return jnp.pad(p, ((0, 0), (0, Cp - C)), constant_values=INF)

    lat_fwd, lat_bwd = plane(0), plane(1)
    down = jnp.stack([plane(2), plane(3), plane(4)], axis=1)
    up = jnp.stack([plane(5), plane(6), plane(7)], axis=1)
    lat_f_eff, lat_b_eff = _effective_laterals(lat_fwd, lat_bwd, down, up, xp=jnp)
    a_fwd, a_bwd = _chain_weights(lat_f_eff, lat_b_eff, S, xp=jnp)
    _, l2f, l2b, wbf, wbb = (
        _two_level_tables(a_fwd, a_bwd, S, Cp, xp=jnp)
        if plan.n_scan2 else (0, None, None, None, None)
    )

    res_v = (plan.res_dst // Cp) * C + plan.res_dst % Cp
    res_w = jnp.where(
        plan.res_slot >= 0,
        W[res_v, jnp.maximum(plan.res_slot, 0)],
        INF,
    ).astype(jnp.float32)

    def xplane(sm):
        w = jnp.where(
            sm >= 0,
            jnp.take_along_axis(W, jnp.maximum(sm, 0)[:, None], axis=1)[:, 0],
            INF,
        ).astype(jnp.float32)
        p = jnp.full((R * C,), INF, jnp.float32).at[:V].set(w).reshape(R, C)
        return jnp.pad(p, ((0, 0), (0, Cp - C)), constant_values=INF)

    xdown = plan.xdown
    xup = plan.xup
    if plan.xlanes_down:
        xdown = jnp.stack(
            [xplane(plan.xslot_down[k]) for k in range(len(plan.xlanes_down))],
            axis=1,
        )
    if plan.xlanes_up:
        xup = jnp.stack(
            [xplane(plan.xslot_up[k]) for k in range(len(plan.xlanes_up))],
            axis=1,
        )
    return dataclasses.replace(
        plan, down=down, up=up, a_fwd=a_fwd, a_bwd=a_bwd, res_w=res_w,
        xdown=xdown, xup=xup, lat_fwd=lat_fwd, lat_bwd=lat_bwd,
        l2_fwd=l2f, l2_bwd=l2b, wback_fwd=wbf, wback_bwd=wbb,
    )


def refresh_banded_planes_from_costs(
    plan: BandedKernelPlan,
    vertex_costs: jax.Array,
    *,
    edge_cost_factor: float | jax.Array = 0.0,
    cost_limit: float | jax.Array = 1.0,
) -> BandedKernelPlan:
    """GATHER-FREE live-replan refresh: derive every weight plane directly
    from the [V] cost field using the plan's static distance planes.

    w(u -> v) = dist * (1 + factor * (c_u + c_v) / 2), +inf when either cost
    is inf, when the source cost exceeds cost_limit (the popped-vertex skip,
    dijkstra_mesh_planner.cpp:302-303), or when the edge is absent/invalid
    (baked into the static planes). Because each class's source offset is a
    CONSTANT (dr, dc), the source cost field is a dense 2D shift of the
    destination cost field — no [V, D] weight table and no gathers except
    the tiny residual list. Measured at 1M: the slot-weight path spends
    157 ms in gathers per update; this is pure VPU + ~30 MB of traffic.

    Exactly equivalent to
    refresh_banded_planes(plan, slot_weights(compute_edge_weights(...)))."""
    V = plan.num_vertices
    R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad

    cost_pad = (
        jnp.full((R * C,), INF, jnp.float32)
        .at[:V].set(vertex_costs.astype(jnp.float32))
        .reshape(R, C)
    )
    cost_pad = jnp.pad(cost_pad, ((0, 0), (0, Cp - C)), constant_values=INF)

    planes = _planes_from_cost_plane(
        plan, cost_pad,
        plan.dist_lat_fwd, plan.dist_lat_bwd, plan.dist_down, plan.dist_up,
        plan.xdist_down, plan.xdist_up,
        edge_cost_factor, cost_limit,
    )
    res_w = _residual_weights_from_costs(
        plan, cost_pad, edge_cost_factor, cost_limit
    )
    return dataclasses.replace(plan, res_w=res_w, **planes)


def _planes_from_cost_plane(
    plan: BandedKernelPlan,
    cost_pad: jax.Array,          # [Rs, Cp] (full plane or row slab)
    dist_lat_fwd, dist_lat_bwd, dist_down, dist_up, xdist_down, xdist_up,
    f, cost_limit,
):
    """All dense weight planes from a cost plane — shared by the full and
    row-windowed refresh; works on any row count (the computation is local
    to +-2 rows, so a slab with 3 halo rows reproduces the full result on
    its interior)."""
    S, Cp = plan.n_scan, plan.n_cols_pad

    def weigh(dist_p, dr, dc):
        cu = _shift2(cost_pad, dr, dc, xp=jnp)          # source cost
        w = dist_p * (1.0 + f * 0.5 * (cost_pad + cu))
        ok = (
            jnp.isfinite(dist_p)
            & jnp.isfinite(cost_pad)
            & jnp.isfinite(cu)
            & (cu <= cost_limit)
        )
        return jnp.where(ok, w, INF).astype(jnp.float32)

    lat_fwd = weigh(dist_lat_fwd, 0, -1)
    lat_bwd = weigh(dist_lat_bwd, 0, 1)
    down = jnp.stack(
        [weigh(dist_down[:, i, :], -1, i - 1) for i in range(3)], axis=1
    )
    up = jnp.stack(
        [weigh(dist_up[:, i, :], 1, i - 1) for i in range(3)], axis=1
    )
    lf_eff, lb_eff = _effective_laterals(lat_fwd, lat_bwd, down, up, xp=jnp)
    a_fwd, a_bwd = _chain_weights(lf_eff, lb_eff, S, xp=jnp)
    _, l2f, l2b, wbf, wbb = (
        _two_level_tables(a_fwd, a_bwd, S, Cp, xp=jnp)
        if plan.n_scan2 else (0, None, None, None, None)
    )

    xdown = plan.xdown
    xup = plan.xup
    if plan.xlanes_down:
        xdown = jnp.stack(
            [
                weigh(xdist_down[:, i, :], -sel, dc)
                for i, (sel, dc) in enumerate(plan.xlanes_down)
            ],
            axis=1,
        )
    if plan.xlanes_up:
        xup = jnp.stack(
            [
                weigh(xdist_up[:, i, :], sel, dc)
                for i, (sel, dc) in enumerate(plan.xlanes_up)
            ],
            axis=1,
        )
    return dict(
        down=down, up=up, a_fwd=a_fwd, a_bwd=a_bwd,
        xdown=xdown, xup=xup, lat_fwd=lat_fwd, lat_bwd=lat_bwd,
        l2_fwd=l2f, l2_bwd=l2b, wback_fwd=wbf, wback_bwd=wbb,
    )


def _residual_weights_from_costs(plan, cost_pad, f, cost_limit):
    cflat = cost_pad.reshape(-1)
    c_dst = cflat[plan.res_dst]
    c_src = cflat[plan.res_src]
    w = plan.res_dist * (1.0 + f * 0.5 * (c_dst + c_src))
    ok = (
        jnp.isfinite(plan.res_dist)
        & jnp.isfinite(c_dst)
        & jnp.isfinite(c_src)
        & (c_src <= cost_limit)
    )
    return jnp.where(ok, w, INF).astype(jnp.float32)


_REFRESH_HALO = 3   # costs reach plane rows via eff-laterals (+-2) and
                    # extended lanes (|dr| <= 2); 3 covers both with slack


def refresh_banded_planes_rows(
    base_plan: BandedKernelPlan,
    base_costs: jax.Array,        # [V] the costs base_plan was refreshed at
    vertex_costs: jax.Array,      # [V] new costs
    *,
    edge_cost_factor: float | jax.Array = 0.0,
    cost_limit: float | jax.Array = 1.0,
    row_window: int = 64,
) -> BandedKernelPlan:
    """INCREMENTAL plane refresh (live-replan fast path): update only the
    plane rows whose costs changed vs `base_costs`.

    `base_plan` must be `refresh_banded_planes_from_costs(plan, base_costs)`
    output (any plan whose planes correspond to base_costs). A cost change
    confined to rows [a, b] only affects plane rows [a-2, b+2]
    (_REFRESH_HALO), so a static-shape row slab positioned at runtime
    rewrites exactly those rows on top of the cached base planes — at 1M the
    full refresh moves ~60 MB of VPU traffic per update for a 5-row obstacle
    disc. Falls back to the full refresh inside the same jit when the
    changed rows don't fit the slab. Exact: slab interior rows see the same
    +-3-row cost context as the full computation."""
    V = base_plan.num_vertices
    R, C, Cp = base_plan.n_rows, base_plan.n_cols, base_plan.n_cols_pad
    PR = row_window
    H = _REFRESH_HALO
    if R < PR + 2 * H:
        return refresh_banded_planes_from_costs(
            base_plan, vertex_costs,
            edge_cost_factor=edge_cost_factor, cost_limit=cost_limit,
        )

    def pad_plane(costs):
        p = (
            jnp.full((R * C,), INF, jnp.float32)
            .at[:V].set(costs.astype(jnp.float32))
            .reshape(R, C)
        )
        return jnp.pad(p, ((0, 0), (0, Cp - C)), constant_values=INF)

    cost_pad = pad_plane(vertex_costs)
    base_pad = pad_plane(base_costs)

    row_changed = jnp.any(cost_pad != base_pad, axis=1)          # [R]
    idx = jnp.arange(R)
    a = jnp.min(jnp.where(row_changed, idx, R))
    b = jnp.max(jnp.where(row_changed, idx, -1))
    fits = b - a + 1 + 2 * H <= PR - 2       # changed rows + halo in slab
    p0 = jnp.clip(a - H - 1, 0, R - PR)

    def full():
        planes = _planes_from_cost_plane(
            base_plan, cost_pad,
            base_plan.dist_lat_fwd, base_plan.dist_lat_bwd,
            base_plan.dist_down, base_plan.dist_up,
            base_plan.xdist_down, base_plan.xdist_up,
            edge_cost_factor, cost_limit,
        )
        return tuple(planes[k] for k in _PLANE_KEYS)

    def windowed():
        CS = PR + 2 * H

        def slab(x, row_axis=0):
            # rows [p0-H, p0+PR+H) of x via an H-row inf extension
            padw = [(0, 0)] * x.ndim
            padw[row_axis] = (H, H)
            ext = jnp.pad(x, padw, constant_values=INF)
            start = [0] * x.ndim
            start[row_axis] = p0
            size = list(x.shape)
            size[row_axis] = CS
            return jax.lax.dynamic_slice(ext, start, size)

        planes = _planes_from_cost_plane(
            base_plan, slab(cost_pad),
            slab(base_plan.dist_lat_fwd), slab(base_plan.dist_lat_bwd),
            slab(base_plan.dist_down), slab(base_plan.dist_up),
            slab(base_plan.xdist_down) if base_plan.xlanes_down
            else base_plan.xdist_down,
            slab(base_plan.xdist_up) if base_plan.xlanes_up
            else base_plan.xdist_up,
            edge_cost_factor, cost_limit,
        )

        def write(base, part):
            if part is None or base is None:
                return base
            if part is base:          # untouched placeholder (no xlanes)
                return base
            interior = jax.lax.slice_in_dim(part, H, H + PR, axis=0)
            start = (p0,) + (0,) * (base.ndim - 1)
            return jax.lax.dynamic_update_slice(base, interior, start)

        return tuple(
            write(getattr(base_plan, k), planes[k]) for k in _PLANE_KEYS
        )

    outs = jax.lax.cond(fits, windowed, full)
    res_w = _residual_weights_from_costs(
        base_plan, cost_pad, edge_cost_factor, cost_limit
    )
    return dataclasses.replace(
        base_plan, res_w=res_w, **dict(zip(_PLANE_KEYS, outs))
    )


_PLANE_KEYS = (
    "down", "up", "a_fwd", "a_bwd", "xdown", "xup", "lat_fwd", "lat_bwd",
    "l2_fwd", "l2_bwd", "wback_fwd", "wback_bwd",
)


def _shift_down(x: jax.Array, k: int) -> jax.Array:
    """result[c] = x[c-k] along axis 0, +inf fill (never propagates)."""
    fill = jnp.full((k,) + x.shape[1:], INF, x.dtype)
    return jnp.concatenate([fill, x[:-k]], axis=0)


def _shift_up(x: jax.Array, k: int) -> jax.Array:
    fill = jnp.full((k,) + x.shape[1:], INF, x.dtype)
    return jnp.concatenate([x[k:], fill], axis=0)


def _pass_kernel(
    rb: int, n_scan: int, n_scan2: int, reverse: bool, atol: float,
    rtol: float, skip: bool, force: bool, use_dirty: bool, xlanes: tuple,
    defer: bool, warm_cut: bool,
    dist_ref, cross_ref, af_ref, ab_ref, xcross_ref, l2f_ref, l2b_ref,
    wback_ref, dirty_in_ref, cutlb_ref, cutth_ref, seedrc_ref,
    out_ref, chg_ref, dirty_out_ref, prev_ref, prev2_ref,
):
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    # dirty_{in,out}_ref are the WHOLE [n_j, Rp] table in SMEM (constant
    # index map — Mosaic requires SMEM blocks be full-dim, and the table is
    # tiny); rows are addressed globally. With use_dirty=False (full scan
    # depth + no residual edges — the headline grid path) the dirty table is
    # a (1, 1) dummy and every dirty read/write compiles away: a full-depth
    # scan IS the exact lateral fixed point, so no re-scan flag is needed.
    row_base = ((n_i - 1 - i) if reverse else i) * rb

    @pl.when((j == 0) & (i == 0))
    def _():
        chg_ref[0, 0] = jnp.int32(0)

    @pl.when(i == 0)
    def _():
        prev_ref[:] = jnp.full(prev_ref.shape, INF, prev_ref.dtype)
        prev2_ref[:] = jnp.full(prev2_ref.shape, INF, prev2_ref.dtype)

    prev = prev_ref[:]                       # [Cp, BB] f32 carry
    prev2 = prev2_ref[:]                     # second carried row (|dr| = 2)
    changed = jnp.bool_(False)
    rows = range(rb - 1, -1, -1) if reverse else range(rb)
    for r in rows:
        # compute in f32 regardless of the storage dtype (Mosaic can't
        # broadcast-insert minor dims on 16-bit types, and f32 VPU math
        # costs the same — bf16 only saves HBM/VMEM traffic on the field)
        cur = dist_ref[r].astype(jnp.float32)   # [Cp, BB]
        if warm_cut:
            # warm incremental resolve: apply the raise-invalidation cut +
            # seed re-insertion AT LOAD instead of materializing a separate
            # d_start field (saves one full field read+write round trip).
            # cut = lb[row plane] + per-lane threshold; labels >= cut may
            # have routed through a changed edge and re-solve from inf
            cutv = cutlb_ref[r, 0, :][:, None] + cutth_ref[0, :][None, :]
            cur = jnp.where(cur >= cutv, INF, cur)
            g_row = row_base + r
            cols_i = jax.lax.broadcasted_iota(jnp.int32, cur.shape, 0)
            hit = (
                (seedrc_ref[0, :][None, :] == g_row)
                & (seedrc_ref[1, :][None, :] == cols_i)
            )
            cur = jnp.where(hit, 0.0, cur)
        cross = cross_ref[r]                 # [3, Cp] f32
        # inbound from the carried row: source columns c-1, c, c+1
        cand = jnp.minimum(
            jnp.minimum(
                _shift_down(prev, 1) + cross[0][:, None],
                prev + cross[1][:, None],
            ),
            _shift_up(prev, 1) + cross[2][:, None],
        )
        # extended lanes: off-core offsets relaxed densely (irregular
        # meshes); sel 1 = carried row, 2 = second carried row, 0 = own row
        for li, (sel, dc) in enumerate(xlanes):
            xsrc = prev if sel == 1 else (prev2 if sel == 2 else cur)
            if dc < 0:
                xsrc = _shift_down(xsrc, -dc)
            elif dc > 0:
                xsrc = _shift_up(xsrc, dc)
            cand = jnp.minimum(cand, xsrc + xcross_ref[r, li, :][:, None])
        row0 = jnp.minimum(cur, cand)
        # tolerance applies to the FLAG only (flagged writes stay monotone):
        # fp32 summation-order jitter otherwise drags the loop through many
        # ~1e-5 "improvement" rounds after the true wavefront has converged
        # (measured: 14 vs 2 real rounds on a 16k terrain)
        imp = jnp.any(cand * (1.0 + rtol) + atol < cur)

        def scan_row(row):
            # lateral min-plus scans (precomputed chain weights). At full
            # depth (n_scan = ceil(log2 C)) one application reaches the
            # exact 1D lateral fixed point; at partial depth a scan covers
            # chains up to 2^n_scan - 1 columns and the DIRTY flag marks
            # rows whose scan still improved — they re-scan next pass, so
            # the fixed point is reached at any depth (span-1 is the ±1
            # edge relaxation itself; no scan improvement ⇒ lateral edges
            # satisfied ⇒ true lateral fixed point).
            if n_scan2 > 0:
                # TWO-LEVEL (work-efficient) full-depth scan: 3 full-slab
                # steps (spans <= 7), then the remaining levels on the
                # 8x-decimated block-boundary array, then one combine step
                # folds the boundary prefix back into every column. Same
                # min-plus coverage (every span 1..Cp-1 decomposes into
                # in-block part + boundary chain) => identical fixed point,
                # ~60% fewer full-slab VPU ops.
                Cp_, bb_ = row.shape
                NB = Cp_ // 8
                for s in range(3):
                    row = jnp.minimum(
                        row, _shift_down(row, 1 << s) + af_ref[r, s, :][:, None]
                    )
                yb = row.reshape(NB, 8, bb_)[:, 7, :]        # [NB, bb]
                for t in range(n_scan2):
                    yb = jnp.minimum(
                        yb,
                        _shift_down(yb, 1 << t)
                        + l2f_ref[r, t, :][:NB][:, None],
                    )
                zprev = _shift_down(yb, 1)
                zup = jnp.broadcast_to(
                    zprev[:, None, :], (NB, 8, bb_)
                ).reshape(Cp_, bb_)
                row = jnp.minimum(row, zup + wback_ref[r, 0, :][:, None])
                # backward direction on the fwd-updated row (monotone 1D
                # optimal paths => fwd-then-bwd covers all in-row chains)
                for s in range(3):
                    row = jnp.minimum(
                        row, _shift_up(row, 1 << s) + ab_ref[r, s, :][:, None]
                    )
                yb = row.reshape(NB, 8, bb_)[:, 0, :]
                for t in range(n_scan2):
                    yb = jnp.minimum(
                        yb,
                        _shift_up(yb, 1 << t)
                        + l2b_ref[r, t, :][:NB][:, None],
                    )
                znext = _shift_up(yb, 1)
                zup = jnp.broadcast_to(
                    znext[:, None, :], (NB, 8, bb_)
                ).reshape(Cp_, bb_)
                row = jnp.minimum(row, zup + wback_ref[r, 1, :][:, None])
                return row
            for s in range(n_scan):
                row = jnp.minimum(
                    row, _shift_down(row, 1 << s) + af_ref[r, s, :][:, None]
                )
            for s in range(n_scan):
                row = jnp.minimum(
                    row, _shift_up(row, 1 << s) + ab_ref[r, s, :][:, None]
                )
            return row

        if defer:
            # scan-DEFERRING pass (scan_dirs="up"): apply only the cross
            # relaxation and leave the row's lateral scan to the scanning
            # pass of the same round, marking the row dirty so that pass
            # cannot skip it. Halves the VPU-bound scan work per round —
            # correctness unchanged because convergence still requires a
            # full round with no improvement, and the scanning pass covers
            # every lateral edge (scan step 0 is the ±1 edge relaxation).
            need = imp
            if force:
                need |= jnp.any(row0 < jnp.inf)

            @pl.when(need)
            def _():
                out_ref[r] = row0.astype(out_ref.dtype)

            @pl.when(jnp.logical_not(need))
            def _():
                out_ref[r] = cur.astype(out_ref.dtype)

            # preserve pending-dirty rows; add freshly-written ones
            dirty_out_ref[j, row_base + r] = jnp.maximum(
                dirty_in_ref[j, row_base + r], need.astype(jnp.int32)
            )
            changed |= imp
            prev2 = prev
            prev = out_ref[r].astype(jnp.float32)
        elif skip:
            # A row needs re-scanning when the carried row improved it
            # (cross), when its own last scan was still improving (dirty —
            # partial scan depth), or when a residual scatter-min touched it
            # (dirty, set by the solver between passes). `force` (first pass
            # of the solve) additionally scans any row holding finite
            # labels — freshly-injected seeds have no cross improvement to
            # flag them.
            need = imp
            if use_dirty:
                need |= dirty_in_ref[j, row_base + r] > 0
            if force:
                # labels are finite or +inf by construction (no NaN), and
                # Mosaic's is_finite only lowers for f32 — compare instead
                need |= jnp.any(row0 < jnp.inf)

            # writes and scans gate TOGETHER: a sub-tolerance improvement
            # is dropped (its base is re-written) rather than stored
            # unflagged — otherwise an unscanned row could drift below its
            # lateral fixed point by ~rounds*atol without ever setting imp.
            # Labels stay monotone upper bounds either way.
            @pl.when(need)
            def _():
                if use_dirty:
                    base = jnp.where(imp, row0, cur)
                    scanned = scan_row(base)
                    simp = jnp.any(scanned * (1.0 + rtol) + atol < base)
                    out_ref[r] = jnp.where(simp, scanned, base).astype(
                        out_ref.dtype
                    )
                    dirty_out_ref[j, row_base + r] = simp.astype(jnp.int32)
                    chg_ref[0, 0] |= simp.astype(jnp.int32)
                else:
                    # full depth: one scan reaches the exact lateral fixed
                    # point; need ⇒ imp|force so the write is supra-tol
                    out_ref[r] = scan_row(row0).astype(out_ref.dtype)

            @pl.when(jnp.logical_not(need))
            def _():
                out_ref[r] = cur.astype(out_ref.dtype)
                if use_dirty:
                    dirty_out_ref[j, row_base + r] = jnp.int32(0)

            changed |= imp
            prev2 = prev
            prev = out_ref[r].astype(jnp.float32)
        else:
            row = scan_row(row0)
            changed |= jnp.any(row * (1.0 + rtol) + atol < cur)
            out_ref[r] = row.astype(out_ref.dtype)
            if use_dirty:
                dirty_out_ref[j, row_base + r] = jnp.int32(0)
            prev2 = prev
            prev = row
    prev_ref[:] = prev
    prev2_ref[:] = prev2
    chg_ref[0, 0] |= changed.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "reverse", "rb", "bb", "n_scan", "n_scan2", "atol", "rtol",
        "interpret", "skip", "force", "use_dirty", "xlanes", "defer",
    ),
)
def _directional_pass_pallas(
    d: jax.Array,        # [Rp, Cp, Bp] f32
    cross: jax.Array,    # [3, Rp, Cp]
    a_fwd: jax.Array,    # [S, Rp, Cp]
    a_bwd: jax.Array,    # [S, Rp, Cp]
    xcross: jax.Array,   # [Rp, Lx, Cp] extended-lane planes (dummy 1 lane ok)
    l2f: jax.Array,      # [Rp, S2|1, NB|8] boundary chains (dummy if flat)
    l2b: jax.Array,
    wback: jax.Array,    # [Rp, 2, Cp]
    dirty: jax.Array,    # [n_j, Rp] i32 rows whose last scan still improved
    warm_cut_args=None,  # (cutlb [Rp, Cp] f32, cutth [1, Bp] f32,
                         #  seedrc [2, Bp] i32) -> fold raise-invalidation +
                         # reseed into the load (warm resolve fast path)
    *,
    reverse: bool,
    rb: int,
    bb: int,
    n_scan: int,
    n_scan2: int = 0,
    atol: float = 0.0,
    rtol: float = 0.0,
    interpret: bool = False,
    skip: bool = False,
    force: bool = False,
    use_dirty: bool = True,
    xlanes: tuple = (),
    defer: bool = False,
):
    assert not defer or (skip and use_dirty), "defer requires skip+dirty"
    Rp, Cp, Bp = d.shape
    S = a_fwd.shape[1]
    Lx = xcross.shape[1]
    S2 = l2f.shape[1]
    NB = l2f.shape[2]
    n_i = Rp // rb
    n_j = Bp // bb
    dirty_shape = dirty.shape

    if reverse:
        def dmap(j, i):
            return (n_i - 1 - i, 0, j)
        def pmap(j, i):
            return (n_i - 1 - i, 0, 0)
    else:
        def dmap(j, i):
            return (i, 0, j)
        def pmap(j, i):
            return (i, 0, 0)

    def ymap(j, i):
        return (0, 0)

    # wide bands: the per-row scan temporaries ([Cp, bb] slabs) can exceed
    # the 16 MB scoped-vmem default — size the per-kernel limit to the block
    # model (v5e VMEM = 128 MB)
    vmem_need = (
        (18 + Lx) * Cp * bb * 4
        + 4 * rb * Cp * bb * jnp.dtype(d.dtype).itemsize
        + (4 << 20)
    )
    compiler_params = (
        None if interpret or vmem_need <= (16 << 20)
        else pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_need, 100 << 20))
        )
    )
    warm_cut = warm_cut_args is not None
    if warm_cut:
        cutlb, cutth, seedrc = warm_cut_args
        cutlb = cutlb[:, None, :]           # [Rp, 1, Cp]: 2D (rb, Cp)
        # blocks violate the Mosaic (8, 128)-divisibility rule at small rb
        cut_specs = [
            pl.BlockSpec((rb, 1, Cp), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bb), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, bb), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ]
    else:
        cutlb = jnp.zeros((1, 1, 8), jnp.float32)
        cutth = jnp.zeros((1, 8), jnp.float32)
        seedrc = jnp.zeros((2, 8), jnp.int32)
        cut_specs = [
            pl.BlockSpec((1, 1, 8), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8), ymap, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 8), ymap, memory_space=pltpu.VMEM),
        ]
    out, chg, dirty_out = pl.pallas_call(
        functools.partial(
            _pass_kernel, rb, n_scan, n_scan2, reverse, atol, rtol, skip,
            force, use_dirty, xlanes, defer, warm_cut,
        ),
        compiler_params=compiler_params,
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((rb, Cp, bb), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 3, Cp), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, Cp), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S, Cp), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, Lx, Cp), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S2, NB), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, S2, NB), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 2, Cp), pmap, memory_space=pltpu.VMEM),
            pl.BlockSpec(dirty_shape, ymap, memory_space=pltpu.SMEM),
        ] + cut_specs,
        out_specs=[
            pl.BlockSpec((rb, Cp, bb), dmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(dirty_shape, ymap, memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Rp, Cp, Bp), d.dtype),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
            jax.ShapeDtypeStruct(dirty_shape, jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Cp, bb), jnp.float32),
            pltpu.VMEM((Cp, bb), jnp.float32),
        ],
        input_output_aliases={0: 0, 8: 2},
        interpret=interpret,
    )(d, cross, a_fwd, a_bwd, xcross, l2f, l2b, wback, dirty,
      cutlb, cutth, seedrc)
    return out, chg[0, 0] > 0, dirty_out


def _pick_pred_blocks(Rp: int, Cp: int, *, dtype=jnp.float32):
    """Block sizes for the predecessor kernel. Its VMEM model differs from
    the sweep kernel's: ~14 [Cp, bb] temporaries (no 16-deep scan stack),
    but THREE double-buffered input streams of the field (center rows +
    up/dn halo rows) plus the w8 planes and the (int8) output. rb=4 fits at
    Cp=1024 and halves the halo re-read factor vs the sweep picker's rb=2."""
    bb = 128
    itemsize = jnp.dtype(dtype).itemsize
    temps = 14 * Cp * bb * 4
    for rb in (8, 4, 2, 1):
        if Rp % rb:
            continue
        streams = (
            2 * rb * Cp * bb * itemsize      # center in, double-buffered
            + 2 * 2 * Cp * bb * itemsize     # up + dn halo rows
            + 2 * rb * 8 * Cp * 4            # w8 planes
            + 2 * rb * Cp * bb               # int8 out
        )
        if streams + temps <= (15 << 20):
            return rb, bb
    return 1, bb


def _pick_blocks(Cp: int, *, vmem_total: int | None = None, dtype=jnp.float32,
                 extra_lanes: int = 0):
    """Row-block / batch-block sizes under the 16M VMEM limit. Budget model
    (validated against Mosaic's scoped-vmem accounting at Cp=1024): dist
    blocks are double-buffered in AND out (4 copies), and the unrolled
    per-row compute keeps ~16 [Cp, bb] temporaries on the scoped stack —
    plus ~1 more per extended relaxation lane (measured: 7 lanes pushed the
    no-skip variant 1.98M over the 16M scoped limit at Cp=512)."""
    if vmem_total is None:
        vmem_total = 15 << 20
    itemsize = jnp.dtype(dtype).itemsize
    bb = 128
    temp_estimate = (16 + extra_lanes) * Cp * bb * 4
    budget = vmem_total - temp_estimate - (1 << 20)  # planes + scratch slack
    for rb in (16, 8, 4, 2, 1):
        if 4 * rb * Cp * bb * itemsize <= budget:
            return rb, bb
    # very wide bands (Cp ≳ 3k): the scan temporaries alone exceed the
    # 16 MB scoped-vmem DEFAULT; keep full lanes — the pass raises its own
    # per-kernel limit via CompilerParams(vmem_limit_bytes) (v5e VMEM is
    # 128 MB)
    return 1, bb


def predecessors_banded(
    plan: BandedKernelPlan,
    dist_vb: jax.Array,      # [V, B] converged field
    *,
    tol: float = 1e-5,
    max_lanes: int = 0,
) -> jax.Array:
    """Gather-free predecessor recovery: argmin over the eight banded offset
    classes via dense rolls (+ tiny residual scatter). Same contract as
    structured.predecessors_from_field (pred[v] = argmin_u dist[u] + w(u,v),
    dijkstra_mesh_planner.cpp:320-347) but ~35x faster at 262k vertices —
    slot gathers over [V, B] were costing 35x the entire field solve.

    The recovery keeps ~6 [V, lanes] live buffers; `max_lanes` caps the batch
    lanes processed at once so peak memory stays bounded at 1M+ vertices
    (default: whatever keeps the live set under ~2 GB)."""
    V, B = dist_vb.shape
    if max_lanes <= 0:
        max_lanes = max(32, min(B, (2 << 30) // max(24 * V, 1) // 32 * 32))
    if B > max_lanes:
        n_chunks = -(-B // max_lanes)
        parts = [
            predecessors_banded(
                plan,
                jax.lax.dynamic_slice_in_dim(
                    dist_vb, i * max_lanes, min(max_lanes, B - i * max_lanes), 1
                ),
                tol=tol,
                max_lanes=max_lanes,
            )
            for i in range(n_chunks)
        ]
        return jnp.concatenate(parts, axis=1)
    R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
    d = jnp.pad(dist_vb, ((0, R * C - V), (0, 0)), constant_values=INF)
    d3 = d.reshape(R, C, B)
    d3 = jnp.pad(d3, ((0, 0), (0, Cp - C), (0, 0)), constant_values=INF)

    r_idx = jax.lax.broadcasted_iota(jnp.int32, (R, Cp), 0)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (R, Cp), 1)

    classes = [(0, -1, plan.lat_fwd), (0, 1, plan.lat_bwd)]
    for i, s in enumerate((-1, 0, 1)):
        classes.append((-1, s, plan.down[:, i, :]))
        classes.append((1, s, plan.up[:, i, :]))

    best = jnp.full((R, Cp, B), INF, jnp.float32)
    pred = jnp.zeros((R, Cp, B), jnp.int32)
    for dr, dc, plane in classes:
        # source value at (r+dr, c+dc): wrap reads are killed by inf planes
        src = jnp.roll(d3, (-dr, -dc), axis=(0, 1))
        cand = src + plane[:, :, None]
        src_flat = ((r_idx + dr) * C + (c_idx + dc))[:, :, None]
        better = cand < best
        best = jnp.where(better, cand, best)
        pred = jnp.where(better, src_flat, pred)

    if plan.res_dst.shape[0]:
        # residual ids are padded-flat; convert to original-flat
        dst = (plan.res_dst // Cp) * C + plan.res_dst % Cp
        src = (plan.res_src // Cp) * C + plan.res_src % Cp
        cand = d[src] + plan.res_w[:, None]
        pflat = pred.reshape(R * Cp, B)
        bfull = best.reshape(R * Cp, B)
        bfull = bfull.at[plan.res_dst].min(cand)
        take = (cand <= bfull[plan.res_dst]) & jnp.isfinite(cand)
        pflat = pflat.at[plan.res_dst].set(
            jnp.where(take, src[:, None], pflat[plan.res_dst])
        )
        best = bfull.reshape(R, Cp, B)
        pred = pflat.reshape(R, Cp, B)

    d3v = d3
    has = (best <= d3v * (1.0 + tol) + tol) & (d3v > 0) & jnp.isfinite(d3v)
    self_flat = (r_idx * C + c_idx)[:, :, None]
    pred = jnp.where(has, pred, self_flat)
    return pred[:, :C, :].reshape(R * C, B)[:V]


class PaddedProblem(NamedTuple):
    """Block-padded field + planes for the directional pass (shared by the
    solver and scripts/debug_pallas_banded.py so the grid layout and inf
    padding live in exactly one place)."""
    d0: jax.Array        # [Rp, Cp, Bp] seeded distance field
    down: jax.Array      # [Rp, 3, Cp]
    up: jax.Array        # [Rp, 3, Cp]
    a_fwd: jax.Array     # [Rp, S, Cp]
    a_bwd: jax.Array     # [Rp, S, Cp]
    rb: int
    bb: int
    xdown: jax.Array = None   # [Rp, Lxd, Cp] extended-lane planes
    xup: jax.Array = None     # [Rp, Lxu, Cp]
    l2_fwd: jax.Array = None   # [Rp, S2, NB] boundary-level chains
    l2_bwd: jax.Array = None
    wback: jax.Array = None    # [Rp, 2, Cp] (fwd, bwd) back-fill prefixes


def prepare_padded(
    plan: BandedKernelPlan,
    seeds: jax.Array,
    *,
    rb: int = 0,
    bb: int = 0,
    dtype=jnp.float32,
) -> PaddedProblem:
    """Pad the plan's planes to the row-block multiple and seed the padded
    [Rp, Cp, Bp] distance field (padding rows/lanes stay all-inf)."""
    B = seeds.shape[0]
    R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
    if rb <= 0 or bb <= 0:
        rb, bb = _pick_blocks(
            Cp, dtype=dtype,
            extra_lanes=max(len(plan.xlanes_down), len(plan.xlanes_up)),
        )
    Rp = _round_up(R, rb)
    Bp = _round_up(B, bb)

    def pad_rows(p):  # [R, .., Cp] -> [Rp, .., Cp] inf rows; planes stay
        # f32 — only the distance field itself takes the storage dtype
        padw = [(0, Rp - R)] + [(0, 0)] * (p.ndim - 1)
        return jnp.pad(p, padw, constant_values=INF).astype(jnp.float32)

    rows = seeds // C
    cols = seeds % C
    flat_pad = rows * Cp + cols
    d0 = jnp.full((Rp * Cp, Bp), INF, dtype)
    d0 = d0.at[flat_pad, jnp.arange(B)].set(0.0)
    if plan.n_scan2:
        NB = Cp // 8
        NBp = _round_up(NB, 128)   # Mosaic-friendly minor dim
        l2f = pad_rows(jnp.pad(
            plan.l2_fwd, ((0, 0), (0, 0), (0, NBp - NB)), constant_values=INF
        ))
        l2b = pad_rows(jnp.pad(
            plan.l2_bwd, ((0, 0), (0, 0), (0, NBp - NB)), constant_values=INF
        ))
        wback = pad_rows(
            jnp.stack([plan.wback_fwd, plan.wback_bwd], axis=1)
        )
    else:
        l2f = l2b = jnp.full((Rp, 1, 128), INF, jnp.float32)
        wback = jnp.full((Rp, 2, Cp), INF, jnp.float32)
    return PaddedProblem(
        d0=d0.reshape(Rp, Cp, Bp),
        down=pad_rows(plan.down),
        up=pad_rows(plan.up),
        a_fwd=pad_rows(plan.a_fwd),
        a_bwd=pad_rows(plan.a_bwd),
        rb=rb,
        bb=bb,
        xdown=pad_rows(plan.xdown),
        xup=pad_rows(plan.xup),
        l2_fwd=l2f,
        l2_bwd=l2b,
        wback=wback,
    )


class BandedPallasResult(NamedTuple):
    dist: jax.Array       # [B, V]
    pred: jax.Array       # [B, V]
    rounds: jax.Array
    converged: jax.Array


class BandedPaddedResult(NamedTuple):
    """Converged field still on the padded [Rp, Cp, Bp] grid — the zero-copy
    contract for the light planning path (descend_paths / pred_at_vertices
    consume padded flat ids directly; no [V, B] unpad, no [B, V] pred)."""
    d_pad: jax.Array      # [Rp, Cp, Bp]
    rounds: jax.Array
    converged: jax.Array
    # converge="pred" only: int8 class-predecessor table [V, Bp] — the
    # convergence certificate IS the pred recovery, so the table comes out
    # of the solve for free (no separate pred pass)
    cls: jax.Array | None = None


def banded_solve_padded(
    plan: BandedKernelPlan,
    seeds: jax.Array,          # [B] i32
    *,
    max_rounds: int = 256,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    interpret: bool | None = None,
    dtype=jnp.float32,
    skip_rows: bool | None = None,
    scan_steps: int = 0,
    four_dir: bool | None = None,
    plan_t: "BandedKernelPlan | None" = None,
    scan_dirs: str = "both",
    converge: str = "round",
    warm_d: jax.Array | None = None,
    warm_changed: jax.Array | None = None,
    warm_raised: jax.Array | None = None,
    warm_pos: jax.Array | None = None,
    warm_window: int | None = None,
    init_pad: jax.Array | None = None,
) -> BandedPaddedResult:
    """Run banded GS rounds to convergence, returning the padded field.

    `init_pad` ([R', Cp, Bp'] padded field, any row/lane padding) switches
    the solve into PROPAGATION mode: the field starts from init_pad verbatim
    (seeds are NOT injected at zero — pass any [B] int array for `seeds`,
    only its length matters) and min-plus rounds run to the fixed point of
    the graph constraints FROM that start. Used as the long-range transport
    stage of the hybrid eikonal solve (pallas_eikonal.eikonal_solve_padded
    graph_plan): a Sethian round's local corner-cut improvements ride the
    lateral min-plus scans across the whole mesh in one cheap graph round
    instead of crawling one chunk per Sethian pass. Labels that start as
    valid upper bounds of any metric whose fixed point satisfies the edge
    inequalities (the eikonal one does — the triangle update lower-bounds
    the edge relaxation) stay valid upper bounds.

    `four_dir` adds column-direction passes on the transposed field each
    round (see transpose_banded_plan) — default ON for residual (irregular)
    meshes where row-only rounds refine zigzag geodesics ~2 hops/pass, OFF
    for clean grids (row rounds already converge in O(winding)).

    Shared core of batched_field_banded_pallas; the residual scatter-min only
    runs when the plan has REAL residual edges (the res_* buffers are padded
    to >= 8 entries, so their shape alone can't gate it — on clean terrain
    grids there are zero residuals and the [Rp*Cp, Bp] scatter round-trip is
    pure waste).

    `scan_steps` caps the in-kernel lateral scan depth (default: the plan's
    full depth, ceil(log2 C)). The scans dominate VPU time (~60 of ~66
    per-row ops at C=1024), and a wavefront usually advances row-wise, so
    partial depth (e.g. 5-6) cuts per-pass cost; correctness is preserved by
    the dirty-row mechanism (rows whose scan still improved re-scan next
    pass), and residual scatter improvements likewise mark their rows dirty —
    so the row-skip fast path is valid for ANY depth and ANY residual count.

    `scan_dirs` picks which directional passes run the lateral scans:
    "both" (default) or "up" (the down pass applies only the cross
    relaxation and defers each written row's lateral scan to the same
    round's up pass via the dirty table). "up" halves the scan count per
    round but was MEASURED LOSING at 1M x 1024: 959 ms / 12 rounds vs
    226 ms / 3 rounds — the down pass's scan-after-each-carried-row is what
    lets a wavefront descend AND spread in a single pass (2D Gauss-Seidel
    compounding); deferring the scans serializes that into one
    row-of-progress per round. Kept as an option because the trade could
    flip on tall-thin bands (R >> C). Convergence is sound either way.
    """
    B = seeds.shape[0]
    C, Cp = plan.n_cols, plan.n_cols_pad
    if interpret is None:
        interpret = not pallas_available()
    if dtype == jnp.bfloat16:
        atol = max(atol, 1e-3)
        rtol = max(rtol, 4e-3)

    # interpret mode (CPU tests): the kernel unrolls rb rows of VPU code
    # into the traced program and pads lanes to bb — both are Mosaic tiling
    # constraints that do not apply to the interpreter, and a 16-row unroll
    # makes test tracing minutes-slow. Use tiny blocks there.
    if interpret:
        prob = prepare_padded(plan, seeds, rb=2, bb=8, dtype=dtype)
    else:
        prob = prepare_padded(plan, seeds, dtype=dtype)
    (d0, down, up, a_fwd, a_bwd, rb, bb, xdown, xup,
     l2f, l2b, wback) = prob
    Rp, _, Bp = d0.shape
    if init_pad is not None:
        # propagation mode: conform the caller's padded field to this
        # solve's row/lane padding and START from it (no zero seeding)
        ip = init_pad.astype(dtype)
        if ip.shape[0] > Rp:
            ip = ip[:Rp]
        elif ip.shape[0] < Rp:
            ip = jnp.pad(
                ip, ((0, Rp - ip.shape[0]), (0, 0), (0, 0)),
                constant_values=INF,
            )
        if ip.shape[2] > Bp:
            ip = ip[:, :, :Bp]
        elif ip.shape[2] < Bp:
            ip = jnp.pad(
                ip, ((0, 0), (0, 0), (0, Bp - ip.shape[2])),
                constant_values=INF,
            )
        d0 = ip
    n_j = Bp // bb
    if scan_steps and scan_steps < plan.n_scan:
        a_fwd = a_fwd[:, :scan_steps]
        a_bwd = a_bwd[:, :scan_steps]
    n_scan = a_fwd.shape[1]
    # two-level scan only at full depth (partial depth already truncates)
    n_scan2 = plan.n_scan2 if n_scan >= plan.n_scan else 0
    if n_scan2:
        a_fwd = a_fwd[:, :3]
        a_bwd = a_bwd[:, :3]
        n_scan = 3

    has_residual = plan.n_residual > 0
    skip = True if skip_rows is None else skip_rows
    if four_dir is None:
        # measured at 262k jittered-Delaunay: 4-dir halves ROUNDS (38 -> 21
        # exact) but the transposed passes + transposes double round cost, so
        # 2-dir + stopping tolerance wins at every operating point (161 vs
        # 285 ms at rtol 3e-3). Kept as an opt-in strategy.
        four_dir = False
    # dirty machinery only pays its way when a scanned row can fail to reach
    # its lateral fixed point (partial depth), be invalidated from outside
    # (residual scatter / a transposed-direction pass), or carry a DEFERRED
    # scan from a scan-free down pass (scan_dirs="up").
    warm = warm_d is not None
    defer_down = scan_dirs == "up" and skip
    full_depth = n_scan >= max(1, int(np.ceil(np.log2(max(C, 2)))))
    use_dirty = skip and (
        has_residual or not full_depth or four_dir or defer_down or warm
    )

    res_rows = plan.res_dst // Cp            # [Rz] padded-grid row of each dst
    res_cols = plan.res_dst % Cp

    if four_dir:
        pt = plan_t if plan_t is not None else transpose_banded_plan(plan)
        if interpret:
            rb_t, bb_t = 2, 8
        else:
            rb_t, bb_t = _pick_blocks(
                Rp, dtype=dtype,
                extra_lanes=max(len(pt.xlanes_down), len(pt.xlanes_up)),
            )
        Ctp = _round_up(Cp, rb_t)
        n_j_t = Bp // bb_t

        def pad_t(p):  # rows C -> Ctp; width Rt -> Rp (pad or trim: the
            # plane rows beyond R are inf padding either way)
            if p.shape[-1] > Rp:
                p = p[..., :Rp]
            padw = [(0, Ctp - p.shape[0])] + [(0, 0)] * (p.ndim - 2) + [
                (0, Rp - p.shape[-1])
            ]
            return jnp.pad(p, padw, constant_values=INF).astype(jnp.float32)

        down_t = pad_t(pt.down)
        up_t = pad_t(pt.up)
        a_fwd_t = pad_t(pt.a_fwd)
        a_bwd_t = pad_t(pt.a_bwd)
        xdown_t = pad_t(pt.xdown)
        xup_t = pad_t(pt.xup)
        if scan_steps and scan_steps < pt.n_scan:
            a_fwd_t = a_fwd_t[:, :scan_steps]
            a_bwd_t = a_bwd_t[:, :scan_steps]
        n_scan_t = a_fwd_t.shape[1]
        l2f_t = l2b_t = jnp.full((Ctp, 1, 128), INF, jnp.float32)
        wback_t = jnp.full((Ctp, 2, Rp), INF, jnp.float32)

    def one_round(d, dirty, dirty_t, force=False, cut=None):
        d_round_start = d
        d, chg_dn, dirty = _directional_pass_pallas(
            d, down,
            a_fwd[:, :1] if defer_down else a_fwd,
            a_bwd[:, :1] if defer_down else a_bwd,
            xdown, l2f, l2b, wback, dirty, cut, reverse=False, rb=rb, bb=bb,
            n_scan=0 if defer_down else n_scan,
            n_scan2=0 if defer_down else n_scan2,
            atol=atol, rtol=rtol, interpret=interpret,
            skip=skip, force=force, use_dirty=use_dirty,
            xlanes=plan.xlanes_down, defer=defer_down,
        )
        d, chg_up, dirty = _directional_pass_pallas(
            d, up, a_fwd, a_bwd, xup, l2f, l2b, wback, dirty,
            reverse=True, rb=rb, bb=bb,
            n_scan=n_scan, n_scan2=n_scan2,
            atol=atol, rtol=rtol, interpret=interpret,
            skip=skip, use_dirty=use_dirty, xlanes=plan.xlanes_up,
        )
        changed = chg_dn | chg_up
        if four_dir:
            # column-direction passes on the transposed field. A change made
            # by one orientation invalidates the OTHER orientation's lateral
            # fixed points, but only on the lines that actually changed —
            # derive those exactly with a compare-reduce over the field (one
            # extra field read per orientation, vs all-dirty which defeats
            # the row skip entirely: measured 33 ms/round -> sparse again)
            if use_dirty and not force:
                delta = d != d_round_start                     # [Rp, Cp, Bp]
                colj = (
                    delta.any(axis=0).reshape(Cp, n_j_t, bb_t).any(axis=2)
                )                                              # [Cp, n_j_t]
                dirty_t = jnp.maximum(
                    dirty_t,
                    jnp.pad(colj.T, ((0, 0), (0, Ctp - Cp))).astype(jnp.int32),
                )
            elif use_dirty:
                dirty_t = jnp.maximum(dirty_t, jnp.int32(1))
            dt = jnp.swapaxes(d, 0, 1)                 # [Cp, Rp, Bp]
            if Ctp > Cp:
                dt = jnp.pad(
                    dt, ((0, Ctp - Cp), (0, 0), (0, 0)), constant_values=INF
                )
            dt_before = dt
            dt, chg_l, dirty_t = _directional_pass_pallas(
                dt, down_t, a_fwd_t, a_bwd_t, xdown_t, l2f_t, l2b_t,
                wback_t, dirty_t,
                reverse=False, rb=rb_t, bb=bb_t, n_scan=n_scan_t,
                atol=atol, rtol=rtol, interpret=interpret,
                skip=skip, force=force, use_dirty=use_dirty,
                xlanes=pt.xlanes_down,
            )
            dt, chg_r, dirty_t = _directional_pass_pallas(
                dt, up_t, a_fwd_t, a_bwd_t, xup_t, l2f_t, l2b_t,
                wback_t, dirty_t,
                reverse=True, rb=rb_t, bb=bb_t, n_scan=n_scan_t,
                atol=atol, rtol=rtol, interpret=interpret,
                skip=skip, use_dirty=use_dirty, xlanes=pt.xlanes_up,
            )
            col_changed = chg_l | chg_r
            if use_dirty:
                delta_t = dt != dt_before                      # [Ctp, Rp, Bp]
                rowj = (
                    delta_t.any(axis=0).reshape(Rp, n_j, bb).any(axis=2)
                )                                              # [Rp, n_j]
                dirty = jnp.maximum(dirty, rowj.T.astype(jnp.int32))
            d = jnp.swapaxes(dt[:Cp], 0, 1)
            changed = changed | col_changed
        if has_residual:
            flat = d.reshape(Rp * Cp, Bp)
            cand = flat[plan.res_src] + plan.res_w[:, None].astype(dtype)
            old = flat[plan.res_dst]
            imp = (
                cand.astype(jnp.float32) * (1.0 + rtol) + atol
                < old.astype(jnp.float32)
            )                                            # [Rz, Bp]
            new = flat.at[plan.res_dst].min(cand)
            changed |= jnp.any(imp)
            d = new.reshape(Rp, Cp, Bp)
            # a residual improvement invalidates the row's lateral fixed
            # point for the touched batch blocks -> mark dirty so the next
            # pass re-scans it (keeps row-skip sound with residual edges)
            if use_dirty:
                impj = imp.reshape(-1, n_j, bb).any(axis=2).astype(jnp.int32)
                dirty = dirty.at[:, res_rows].max(impj.T)
                if four_dir:
                    impjt = imp.reshape(-1, n_j_t, bb_t).any(axis=2).astype(
                        jnp.int32
                    )
                    dirty_t = dirty_t.at[:, res_cols].max(impjt.T)
        return d, dirty, dirty_t, changed

    def cond(carry):
        return carry[4] & (carry[3] < max_rounds)

    dirty0 = jnp.zeros((n_j, Rp) if use_dirty else (1, 1), jnp.int32)
    dirty0_t = jnp.zeros(
        (n_j_t, Ctp) if (four_dir and use_dirty) else (1, 1), jnp.int32
    )
    if warm:
        # INCREMENTAL RESOLVE (changed-region replan,
        # mesh_map.cpp:563-618 / layer_manager.cpp:202-263 semantics):
        # warm-start from the previous converged field. Weight RAISES can
        # strand stale-low labels, so invalidate every label that could have
        # routed through a changed edge: any affected label satisfies
        # d_prev[x] >= d_prev[u] for some changed-edge endpoint u (labels
        # increase along shortest paths), hence >= the per-lane min of
        # d_prev over the dilated changed set. Labels below that threshold
        # are EXACT under the new weights and are kept; the rest re-solve
        # from the intact frontier. Weight DROPS propagate by ordinary
        # relaxation from the dirty-seeded changed rows. The "check"
        # convergence certificate then verifies every edge of the final
        # field, so the warm start cannot silently under-solve.
        assert converge == "check", "warm resolve requires converge='check'"
        mask = _dilate_changed(plan, warm_changed)
        mask_p = jnp.pad(
            mask, ((0, Rp - mask.shape[0]), (0, 0)), constant_values=False
        )
        # invalidation is needed only for weight RAISES (a label is
        # stale-low iff its old path crossed a raised edge); drops resolve
        # by relaxation from the dirty rows. With `warm_raised` the
        # threshold/shadow cut restricts to the raised set — a pure CLEAR
        # update then cuts nothing and its passes skip almost every row.
        if warm_raised is not None:
            raise_p = jnp.pad(
                _dilate_changed(plan, warm_raised),
                ((0, Rp - warm_raised.shape[0]), (0, 0)),
                constant_values=False,
            )
        else:
            raise_p = mask_p
        wd32 = warm_d.astype(jnp.float32)
        # per-lane threshold = min d_prev over the raised set. The masked
        # min only needs the raised ROWS — slice a static window around
        # them (a sensed obstacle spans a few rows; full-field min costs a
        # whole 0.5 GB read at 1M x 128) with an in-jit full fallback
        WT = 32
        rows_m = raise_p.any(axis=1)
        ridx = jnp.arange(Rp)
        r_a = jnp.min(jnp.where(rows_m, ridx, Rp))
        r_b = jnp.max(jnp.where(rows_m, ridx, -1))
        fits_t = (r_b >= r_a) & (r_b - r_a + 1 <= WT) & (Rp >= WT)
        t0r = jnp.clip(r_a, 0, max(Rp - WT, 0))

        def th_win():
            wd_w = jax.lax.dynamic_slice(
                wd32, (t0r, 0, 0), (min(WT, Rp), Cp, Bp)
            )
            m_w = jax.lax.dynamic_slice(
                raise_p, (t0r, 0), (min(WT, Rp), Cp)
            )
            return jnp.min(jnp.where(m_w[:, :, None], wd_w, INF), axis=(0, 1))

        def th_full():
            return jnp.min(jnp.where(raise_p[:, :, None], wd32, INF), axis=(0, 1))

        thresh = jax.lax.cond(fits_t, th_win, th_full)       # [Bp]
        # the previous solve is only tolerance-exact, so shave the
        # threshold by the tolerance envelope — over-invalidation costs a
        # little re-solve work, under-invalidation would leave labels up to
        # ~rtol below their new true distance (invisible to the check,
        # which only certifies labels from above)
        thresh = thresh * (1.0 - 2.0 * rtol) - 2.0 * atol
        lb_plane = jnp.zeros((Rp, Cp), jnp.float32)
        if warm_pos is not None:
            # geodesic-SHADOW refinement: an affected label's old path
            # entered the changed set at some u, so d_prev[x] >=
            # d_prev[u] + geo(u, x) >= thresh + |x - c| - r_enc for the
            # changed set's bounding sphere (c, r_enc) — the global
            # threshold alone invalidates the whole far field (warm
            # resolve MEASURED 99 ms vs 68 cold at 1M without this; the
            # shadow bound restricts re-solving to the cone behind the
            # obstacle)
            chm = raise_p
            pos = jnp.pad(
                warm_pos,
                ((0, 0), (0, Rp - warm_pos.shape[1]), (0, 0)),
                constant_values=INF,
            ) if warm_pos.shape[1] < Rp else warm_pos        # [3, Rp, Cp]
            n_ch = jnp.maximum(chm.sum(), 1)
            ctr = (
                jnp.sum(jnp.where(chm[None], pos, 0.0), axis=(1, 2)) / n_ch
            )                                                # [3]
            dc = jnp.sqrt(
                jnp.sum((pos - ctr[:, None, None]) ** 2, axis=0)
            )                                                # [Rp, Cp]
            r_enc = jnp.max(jnp.where(chm, dc, 0.0))
            lb_plane = jnp.maximum(dc - r_enc, 0.0)
        # the cut (invalidate labels >= lb + thresh) and the seed
        # re-insertion are FOLDED into the first down pass's loads
        # (warm_cut_args) — materializing d_start separately costs one full
        # field read+write round trip (~1 GB at 1M x 128)
        rows_s = seeds // C
        cols_s = seeds % C
        seedrc = jnp.full((2, Bp), -1, jnp.int32)
        seedrc = seedrc.at[0, :B].set(rows_s.astype(jnp.int32))
        seedrc = seedrc.at[1, :B].set(cols_s.astype(jnp.int32))
        cutth = thresh[None, :].astype(jnp.float32)          # [1, Bp]
        row_dirty = mask_p.any(axis=1)
        row_dirty = row_dirty.at[rows_s].set(True)
        dirty0 = jnp.broadcast_to(
            row_dirty[None, :].astype(jnp.int32), (n_j, Rp)
        )
        # ---- windowed warm resolve (live-replan fast path) ----
        # The cut footprint of a local update usually spans a few dozen
        # rows; the full-field rounds still read+write every row (the skip
        # machinery saves VPU scans, not HBM traffic). With `warm_window`
        # the cut+re-solve rounds run on a W-row slab sliced around the
        # exact affected rows, certified by (a) the slab's own fixed-point
        # check and (b) a bit-exact seam test on the GH ghost border rows
        # (skip-gated writes re-write the base value on sub-tolerance
        # improvement, so "unchanged" IS exact equality); if the footprint
        # doesn't fit or corrections want to cross the window edge, the
        # full loop below finishes from the slab-written field — every
        # slab write is a monotone relaxation from valid upper bounds, so
        # the partial state stays correct for the fallback.
        _win_state = None
        use_win = (
            warm_window is not None
            and not has_residual and not four_dir and not defer_down
            and converge == "check" and warm_window < Rp
        )
        if use_win:
            WW = int(warm_window)
            assert WW % 128 == 0 and WW > 0, (
                "warm_window must be a positive multiple of 128", WW
            )
            GH = 8
            wd_t = warm_d.astype(d0.dtype)
            # exact per-row cut footprint: rows holding ANY label the cut
            # can CHANGE (one fused compare+reduce field read). INF labels
            # satisfy the cut predicate trivially but cut to INF — a no-op
            # (raises keep unreachable unreachable; drop-side reactivation
            # propagates from the changed rows and is caught by the seam
            # certificate) — so they must not widen the footprint
            cut_rows = jnp.any(
                (wd32 >= lb_plane[:, :, None] + cutth[0][None, None, :])
                & (wd32 < INF),
                axis=(1, 2),
            )
            aff = cut_rows | mask_p.any(axis=1)
            r_lo = jnp.min(jnp.where(aff, ridx, Rp))
            r_hi = jnp.max(jnp.where(aff, ridx, -1))
            fits_w = (r_hi >= r_lo) & (r_hi - r_lo + 1 + 2 * GH <= WW)
            lo_w = jnp.clip(r_lo - GH, 0, Rp - WW)
            w8s_full = _w8_planes(plan, Rp)
            if interpret:
                rbc, bbc = 2, Bp
            else:
                rbc, bbc = _pick_pred_blocks(WW, Cp, dtype=d0.dtype)

            def _slc(a):
                return jax.lax.dynamic_slice_in_dim(a, lo_w, WW, axis=0)

            def win_branch(_):
                d_s = jax.lax.dynamic_slice(wd_t, (lo_w, 0, 0), (WW, Cp, Bp))
                down_s, up_s = _slc(down), _slc(up)
                af_s, ab_s = _slc(a_fwd), _slc(a_bwd)
                xd_s, xu_s = _slc(xdown), _slc(xup)
                l2f_s, l2b_s, wb_s = _slc(l2f), _slc(l2b), _slc(wback)
                lb_s = jax.lax.dynamic_slice(lb_plane, (lo_w, 0), (WW, Cp))
                w8_s = _slc(w8s_full)
                sr = seedrc[0] - lo_w
                ok_s = (seedrc[0] >= 0) & (sr >= 0) & (sr < WW)
                seedrc_s = jnp.stack(
                    [jnp.where(ok_s, sr, -1), seedrc[1]], axis=0
                )
                dirty_s = jnp.broadcast_to(
                    jax.lax.dynamic_slice_in_dim(
                        row_dirty, lo_w, WW, axis=0
                    )[None, :].astype(jnp.int32),
                    (n_j, WW),
                )

                def round_s(d_c, dirty_c, cut):
                    d_c, _, dirty_c = _directional_pass_pallas(
                        d_c, down_s, af_s, ab_s, xd_s, l2f_s, l2b_s, wb_s,
                        dirty_c, cut, reverse=False, rb=rb, bb=bb,
                        n_scan=n_scan, n_scan2=n_scan2, atol=atol,
                        rtol=rtol, interpret=interpret, skip=skip,
                        use_dirty=True, xlanes=plan.xlanes_down,
                    )
                    d_c, _, dirty_c = _directional_pass_pallas(
                        d_c, up_s, af_s, ab_s, xu_s, l2f_s, l2b_s, wb_s,
                        dirty_c, reverse=True, rb=rb, bb=bb,
                        n_scan=n_scan, n_scan2=n_scan2, atol=atol,
                        rtol=rtol, interpret=interpret, skip=skip,
                        use_dirty=True, xlanes=plan.xlanes_up,
                    )
                    return d_c, dirty_c

                def chk_s(d_c):
                    return _check_pallas_padded(
                        d_c, w8_s, rb=rbc, bb=bbc, atol=atol, rtol=rtol,
                        interpret=interpret,
                    )

                top_in = jax.lax.dynamic_slice(
                    wd_t, (lo_w, 0, 0), (GH, Cp, Bp)
                )
                bot_in = jax.lax.dynamic_slice(
                    wd_t, (lo_w + WW - GH, 0, 0), (GH, Cp, Bp)
                )

                def border_ok(d_c):
                    return jnp.all(d_c[:GH] == top_in) & jnp.all(
                        d_c[WW - GH:] == bot_in
                    )

                d_s1, dirty_s1 = round_s(
                    d_s, dirty_s, (lb_s, cutth, seedrc_s)
                )

                def body_s(c):
                    d_c, dirty_c, it, _, _ = c
                    d_c, dirty_c = round_s(d_c, dirty_c, None)
                    bok = border_ok(d_c)
                    return d_c, dirty_c, it + 1, ~chk_s(d_c), bok

                # the seam test runs EVERY round: a correction that wants to
                # cross the window edge (a down pass carries a drop across
                # the whole slab in one sweep) must abort to the full loop
                # immediately, not after burning the round budget
                bok1 = border_ok(d_s1)
                d_sf, _, it_s, viol_sf, bok_f = jax.lax.while_loop(
                    lambda c: c[3] & c[4] & (c[2] < 16), body_s,
                    (d_s1, dirty_s1, jnp.int32(1), ~chk_s(d_s1), bok1),
                )
                d_back = jax.lax.dynamic_update_slice(
                    wd_t, d_sf, (lo_w, 0, 0)
                )
                done = bok_f & ~viol_sf
                # fallback dirty: labels changed only inside the slab, and
                # outside rows get scanned via the pass's own improvement
                # flags — mark the slab rows + the original changed/seed
                # rows dirty (all-ones would force a full-scan round)
                slab_rows = (ridx >= lo_w) & (ridx < lo_w + WW)
                dirty_b = jnp.where(
                    done,
                    jnp.zeros((n_j, Rp), jnp.int32),
                    jnp.broadcast_to(
                        (row_dirty | slab_rows)[None, :].astype(jnp.int32),
                        (n_j, Rp),
                    ),
                )
                return d_back, dirty_b, it_s, ~done

            def full_branch(_):
                d1f, dirty1f, _dt, _c = one_round(
                    wd_t, dirty0, dirty0_t, cut=(lb_plane, cutth, seedrc)
                )
                v = ~check_converged_banded(
                    plan, d1f, atol=atol, rtol=rtol, interpret=interpret
                )
                return d1f, dirty1f, jnp.int32(1), v

            _win_state = jax.lax.cond(fits_w, win_branch, full_branch, None)
            d1, dirty1, dirty1_t = _win_state[0], _win_state[1], dirty0_t
        else:
            d1, dirty1, dirty1_t, chg0 = one_round(
                warm_d.astype(d0.dtype), dirty0, dirty0_t,
                cut=(lb_plane, cutth, seedrc),
            )
    else:
        d1, dirty1, dirty1_t, chg0 = one_round(d0, dirty0, dirty0_t, force=True)

    if converge == "pred":
        # the int8 class-pred kernel doubles as the fixed-point certificate
        # (its `best` IS the tightest in-edge relaxation): the loop runs
        # exactly the label-changing rounds and the terminating certificate
        # pass EMITS the predecessor table — solve+pred in one budget
        # (measured 1M x 1024: 167 solve + 43 pred -> ~160 combined when
        # rtol ends the loop after round 1). Residual-free plans only
        # (class tables cannot represent residual predecessors); same
        # positive-tolerance requirement as converge="check".
        assert plan.n_residual == 0, "converge='pred' needs n_residual == 0"
        assert not four_dir, "converge='pred' excludes four_dir"
        assert atol > 0 or rtol > 0, "converge='pred' needs tolerance > 0"
        pred_tol = max(atol, 3.0 * rtol)

        def classes_ok(d):
            return predecessors_banded_classes(
                plan, d, tol=pred_tol, interpret=interpret,
                check=(atol, rtol),
            )

        cls1, ok1 = classes_ok(d1)

        def body_p(carry):
            d, dirty, dirty_t, it, _, _ = carry
            d, dirty, dirty_t, _ = one_round(d, dirty, dirty_t)
            cls, ok = classes_ok(d)
            return d, dirty, dirty_t, it + 1, ~ok, cls

        def cond_p(carry):
            return carry[4] & (carry[3] < max_rounds)

        d, _, _, rounds, viol, cls = jax.lax.while_loop(
            cond_p, body_p,
            (d1, dirty1, dirty1_t, jnp.int32(1), ~ok1, cls1),
        )
        return BandedPaddedResult(
            d_pad=d, rounds=rounds, converged=~viol, cls=cls
        )

    if converge == "check":
        # fixed-point certificate instead of a confirmation round — the
        # loop runs exactly the rounds that change labels, and the final
        # field carries a per-EDGE optimality proof. MEASURED SLOWER than
        # "round" on the 1M headline (272 vs 226 ms: the read-only check is
        # VPU-bound like every stencil here, ~40 ms vs the ~38 ms confirm
        # round it replaces, and it runs twice) — kept as the certificate
        # mode for the incremental warm resolve, where the certificate
        # guards the invalidation logic and rounds are few. Requires a
        # POSITIVE tolerance: at atol=rtol=0 a 1-ulp difference between a
        # chain-weight write and the check's single-edge recomputation can
        # flag a "violation" on a row the skip machinery will never rescan
        # (the field is at the true fixed point; the certificate is
        # ulp-strict), live-locking the loop.
        assert atol > 0 or rtol > 0, "converge='check' needs tolerance > 0"
        def body_c(carry):
            d, dirty, dirty_t, it, _ = carry
            d, dirty, dirty_t, _ = one_round(d, dirty, dirty_t)
            ok = check_converged_banded(
                plan, d, atol=atol, rtol=rtol, interpret=interpret
            )
            return d, dirty, dirty_t, it + 1, ~ok

        if warm and _win_state is not None:
            # windowed warm resolve: the slab already carries its own
            # certificate (slab check + bit-exact seam); the full loop only
            # runs on window-miss / seam-crossing corrections
            _, _, r_init, viol0 = _win_state
        else:
            r_init = jnp.int32(1)
            viol0 = ~check_converged_banded(
                plan, d1, atol=atol, rtol=rtol, interpret=interpret
            )
        d, _, _, rounds, viol = jax.lax.while_loop(
            cond, body_c, (d1, dirty1, dirty1_t, r_init, viol0)
        )
        return BandedPaddedResult(d_pad=d, rounds=rounds, converged=~viol)

    def body(carry):
        d, dirty, dirty_t, it, _ = carry
        new, dirty, dirty_t, changed = one_round(d, dirty, dirty_t)
        return new, dirty, dirty_t, it + 1, changed

    d, _, _, rounds, changed = jax.lax.while_loop(
        cond, body, (d1, dirty1, dirty1_t, jnp.int32(1), chg0)
    )
    return BandedPaddedResult(d_pad=d, rounds=rounds, converged=~changed)


def group_lanes(goal_v: jax.Array, num_vertices: int, n_buckets: int = 128):
    """Stable bucket-grouping permutation by quantized goal id — the cheap
    stand-in for `argsort(goal_v)` on the light path.

    The solve only needs NEIGHBORING wavefronts grouped into the same
    128-lane batch block (so the active-row skip prunes whole blocks); with
    B lanes uniform over R rows, grouping into n_buckets >= B/8 id-quantile
    buckets yields the same ~R*128/B row span per block as a true sort, and
    it is pure dense VPU work (one-hot + cumsum + scatter) instead of an XLA
    sort — measured 6.9 ms -> ~0.2 ms at B=1024.

    Returns (order, inv): `x[order]` groups robot lanes; `y[inv]` restores
    robot order from grouped outputs."""
    B = goal_v.shape[0]
    bucket_w = max(1, -(-num_vertices // n_buckets))   # static ceil-div
    q = jnp.clip(goal_v // bucket_w, 0, n_buckets - 1).astype(jnp.int32)
    oh = jax.nn.one_hot(q, n_buckets, dtype=jnp.int32)        # [B, nb]
    rank = jnp.take_along_axis(
        jnp.cumsum(oh, axis=0), q[:, None], axis=1
    )[:, 0] - 1                                               # rank within bucket
    start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(oh.sum(axis=0))[:-1].astype(jnp.int32)]
    )
    inv = start[q] + rank                                     # dest slot of lane i
    order = jnp.zeros(B, jnp.int32).at[inv].set(jnp.arange(B, dtype=jnp.int32))
    return order, inv


def position_planes(plan: BandedKernelPlan, mesh: MeshArrays) -> jax.Array:
    """[3, R, Cp] vertex-position planes (padding = +inf) — static geometry
    used by the warm resolve's shadow bound."""
    R, C, Cp, V = plan.n_rows, plan.n_cols, plan.n_cols_pad, plan.num_vertices
    out = []
    for k in range(3):
        p = jnp.full(R * C, INF, jnp.float32).at[:V].set(mesh.vertices[:, k])
        out.append(
            jnp.pad(p.reshape(R, C), ((0, 0), (0, Cp - C)), constant_values=INF)
        )
    return jnp.stack(out)


def changed_plane_from_costs(
    plan: BandedKernelPlan, old_costs: jax.Array, new_costs: jax.Array
) -> jax.Array:
    """[R, Cp] bool plane of vertices whose cost changed — the input to
    banded_resolve_padded (the changed-vertex set of
    mesh_map.cpp:563-618 / layer_manager.cpp:202-263, as a dense plane)."""
    R, C, Cp, V = plan.n_rows, plan.n_cols, plan.n_cols_pad, plan.num_vertices
    ch = jnp.zeros(R * C, bool).at[:V].set(
        ~((old_costs == new_costs) | (jnp.isnan(old_costs) & jnp.isnan(new_costs)))
    )
    return jnp.pad(
        ch.reshape(R, C), ((0, 0), (0, Cp - C)), constant_values=False
    )


def raised_plane_from_costs(
    plan: BandedKernelPlan, old_costs: jax.Array, new_costs: jax.Array
) -> jax.Array:
    """[R, Cp] bool plane of vertices whose cost INCREASED. Only raises can
    strand stale-low labels (a label is stale-low iff its old shortest path
    crossed an edge whose weight went UP — the slot-weight formula is
    monotone in both endpoint costs), so the warm resolve's
    raise-invalidation threshold should be computed over this set, not over
    all changes: a pure CLEAR update then invalidates nothing and resolves
    by relaxation from the dirty rows alone."""
    R, C, Cp, V = plan.n_rows, plan.n_cols, plan.n_cols_pad, plan.num_vertices
    up = jnp.zeros(R * C, bool).at[:V].set(
        (new_costs > old_costs) | (jnp.isnan(new_costs) & ~jnp.isnan(old_costs))
    )
    return jnp.pad(
        up.reshape(R, C), ((0, 0), (0, Cp - C)), constant_values=False
    )


def _dilate_changed(plan: BandedKernelPlan, changed_rc: jax.Array) -> jax.Array:
    """Dilate the changed-vertex plane to cover every endpoint of every
    weight-changed edge: dense classes and extended lanes reach (|dr| <= 2,
    |dc| <= 4); residual endpoints are handled exactly via the res lists."""
    def shift_b(x, dr, dc):   # bool shift, False fill
        R, C = x.shape
        out = jnp.zeros_like(x)
        rs = slice(max(dr, 0), R + min(dr, 0))
        rd = slice(max(-dr, 0), R + min(-dr, 0))
        cs = slice(max(dc, 0), C + min(dc, 0))
        cd = slice(max(-dc, 0), C + min(-dc, 0))
        return out.at[rd, cd].set(x[rs, cs])

    m = changed_rc
    acc = m
    for dr in (-2, -1, 1, 2):
        acc = acc | shift_b(m, dr, 0)
    m = acc
    for dc in (-4, -3, -2, -1, 1, 2, 3, 4):
        acc = acc | shift_b(m, 0, dc)
    if plan.n_residual:
        flat = acc.reshape(-1)
        ch_flat = changed_rc.reshape(-1)
        touched = ch_flat[plan.res_src] | ch_flat[plan.res_dst]
        flat = flat.at[plan.res_src].max(touched)
        flat = flat.at[plan.res_dst].max(touched)
        acc = flat.reshape(changed_rc.shape)
    return acc


def _inbound_tables(plan: BandedKernelPlan):
    """In-edge weight lookup for the eight banded classes.

    Returns (W8 [8, R*Cp] f32 padded-flat weight table, offs [8] i32 REAL
    flat-id offsets). For destination REAL id v the candidate predecessors
    are v + offs[k] (on the [R, C] grid) with weight W8[k, padded(v)];
    structurally-absent edges are +inf (exactly the plane construction), so
    row-wrapped / out-of-grid candidates never win."""
    C = plan.n_cols
    offs = jnp.asarray(
        [-1, 1, -C - 1, -C, -C + 1, C - 1, C, C + 1], jnp.int32
    )
    W8 = jnp.stack(
        [
            plan.lat_fwd.reshape(-1),
            plan.lat_bwd.reshape(-1),
            plan.down[:, 0, :].reshape(-1),
            plan.down[:, 1, :].reshape(-1),
            plan.down[:, 2, :].reshape(-1),
            plan.up[:, 0, :].reshape(-1),
            plan.up[:, 1, :].reshape(-1),
            plan.up[:, 2, :].reshape(-1),
        ]
    ).astype(jnp.float32)
    return W8, offs


def _to_padded_flat(plan: BandedKernelPlan, v: jax.Array) -> jax.Array:
    return (v // plan.n_cols) * plan.n_cols_pad + v % plan.n_cols


def _pred_kernel(
    rb: int, C: int, tol: float, as_class: bool, check,
    dist_ref,    # [rb, Cp, bb] center rows
    up_ref,      # [1, Cp, bb] row above the block (clamped at the top)
    dn_ref,      # [1, Cp, bb] row below the block (clamped at the bottom)
    w8_ref,      # [rb, 8, Cp] in-edge weight planes (row-major so the
                 # blocked trailing dims are (8, Cp) — Mosaic full-dim rule)
    pred_ref,    # [rb, Cp, bb] out: REAL-id predecessor (i32), or the
                 # winning class index 0..7 / 8 = self (i8, as_class=True)
    *check_refs,  # ([1, 1] SMEM viol flag) when check=(atol, rtol)
):
    j = pl.program_id(0)
    i = pl.program_id(1)
    if check is not None:
        viol_ref = check_refs[0]

        @pl.when((j == 0) & (i == 0))
        def _():
            viol_ref[0, 0] = jnp.int32(0)
    viol = jnp.bool_(False)
    Cp, bb = dist_ref.shape[1], dist_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (Cp, bb), 0)
    # real flat id of each destination element (pad columns c >= C emit
    # garbage ids but their weights are all inf -> pred = self, trimmed
    # by the [:R, :C] slice outside)
    off_real = (-1, 1, -C - 1, -C, -C + 1, C - 1, C, C + 1)

    for r in range(rb):
        cur = dist_ref[r].astype(jnp.float32)              # [Cp, bb]
        up_row = (dist_ref[r - 1] if r > 0 else up_ref[0]).astype(jnp.float32)
        dn_row = (dist_ref[r + 1] if r + 1 < rb else dn_ref[0]).astype(
            jnp.float32
        )
        # candidate source values per class (shift = source column offset)
        srcs = (
            _shift_down(cur, 1),               # (r, c-1)
            _shift_up(cur, 1),                 # (r, c+1)
            _shift_down(up_row, 1),            # (r-1, c-1)
            up_row,                            # (r-1, c)
            _shift_up(up_row, 1),              # (r-1, c+1)
            _shift_down(dn_row, 1),            # (r+1, c-1)
            dn_row,                            # (r+1, c)
            _shift_up(dn_row, 1),              # (r+1, c+1)
        )
        best = jnp.full((Cp, bb), INF, jnp.float32)
        rel = jnp.zeros((Cp, bb), jnp.int32)
        for k in range(8):
            cand = srcs[k] + w8_ref[r, k, :][:, None]
            take = cand < best
            best = jnp.where(take, cand, best)
            rel = jnp.where(
                take, jnp.int32(k if as_class else off_real[k]), rel
            )
        has = (best <= cur * (1.0 + tol) + tol) & (cur > 0) & jnp.isfinite(cur)
        if check is not None:
            # the pred pass doubles as the fixed-point certificate: best
            # already holds the tightest in-edge relaxation, so the
            # convergence check is two extra VPU ops — fusing it here saves
            # the solver a whole confirmation round (or a separate check
            # pass) per solve
            viol |= jnp.any(best * (1.0 + check[1]) + check[0] < cur)
        if as_class:
            # 4x less HBM than the int32 id table — the [V, B] pred write
            # is bandwidth-bound, so classes cut the pred stage ~4x; the
            # path walk decodes id = v + delta[class] (extract_paths_cls)
            pred_ref[r] = jnp.where(has, rel, 8).astype(jnp.int8)
        else:
            self_real = ((i * rb + r) * C + col).astype(jnp.int32)
            pred_ref[r] = self_real + jnp.where(has, rel, 0)
    if check is not None:
        viol_ref[0, 0] |= viol.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=(
        "C", "rb", "bb", "tol", "interpret", "as_class", "check",
    )
)
def _predecessors_pallas_padded(
    d: jax.Array,        # [Rp, Cp, Bp] converged field
    w8: jax.Array,       # [Rp, 8, Cp] in-edge weight planes
    *,
    C: int,
    rb: int,
    bb: int,
    tol: float,
    interpret: bool = False,
    as_class: bool = False,
    check: tuple | None = None,   # (atol, rtol) -> also emit a viol flag
):
    Rp, Cp, Bp = d.shape
    n_i = Rp // rb
    n_j = Bp // bb

    out_specs = [
        pl.BlockSpec((rb, Cp, bb), lambda j, i: (i, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((Rp, Cp, Bp), jnp.int8 if as_class else jnp.int32),
    ]
    if check is not None:
        out_specs.append(
            pl.BlockSpec((1, 1), lambda j, i: (0, 0), memory_space=pltpu.SMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))

    outs = pl.pallas_call(
        functools.partial(_pred_kernel, rb, C, tol, as_class, check),
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((rb, Cp, bb), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, bb),
                         lambda j, i, rb=rb: (jnp.maximum(i * rb - 1, 0), 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, bb),
                         lambda j, i, rb=rb, last=Rp - 1: (
                             jnp.minimum((i + 1) * rb, last), 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8, Cp), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(d, d, d, w8)
    if check is not None:
        pred, viol = outs
        return pred, viol[0, 0] > 0
    return outs[0]


def _check_kernel(
    rb: int, atol: float, rtol: float,
    dist_ref,    # [rb, Cp, bb] center rows
    up_ref,      # [1, Cp, bb] row above the block
    dn_ref,      # [1, Cp, bb] row below the block
    w8_ref,      # [rb, 8, Cp] in-edge weight planes
    viol_ref,    # [1, 1] SMEM: any supra-tolerance violation
):
    # NOTE a sublane-major [rb, Cp, 8] weight layout (to skip the per-class
    # lane->sublane broadcast relayout) ICEs the Mosaic compiler (8-lane
    # minor dim); measured anyway: rb 4..32 all land at ~8 ms at 1M x 128 —
    # the kernel is VPU-op-bound (~35 op-steps/element), not relayout-bound
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        viol_ref[0, 0] = jnp.int32(0)

    acc = None
    for r in range(rb):
        cur = dist_ref[r].astype(jnp.float32)
        up_row = (dist_ref[r - 1] if r > 0 else up_ref[0]).astype(jnp.float32)
        dn_row = (dist_ref[r + 1] if r + 1 < rb else dn_ref[0]).astype(
            jnp.float32
        )
        srcs = (
            _shift_down(cur, 1), _shift_up(cur, 1),
            _shift_down(up_row, 1), up_row, _shift_up(up_row, 1),
            _shift_down(dn_row, 1), dn_row, _shift_up(dn_row, 1),
        )
        best = jnp.full(cur.shape, INF, jnp.float32)
        for k in range(8):
            best = jnp.minimum(best, srcs[k] + w8_ref[r, k, :][:, None])
        bad = best * (1.0 + rtol) + atol < cur
        acc = bad if acc is None else (acc | bad)   # one reduce per block
    viol_ref[0, 0] |= jnp.any(acc).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("rb", "bb", "atol", "rtol", "interpret")
)
def _check_pallas_padded(
    d: jax.Array,        # [Rp, Cp, Bp]
    w8s: jax.Array,      # [Rp, 8, Cp]
    *,
    rb: int,
    bb: int,
    atol: float,
    rtol: float,
    interpret: bool = False,
):
    Rp, Cp, Bp = d.shape
    # block model: double-buffered center rows + halos + w8 planes + ~14
    # scoped temporaries + one live `bad` accumulator slab per unrolled row
    # (the deferred any() keeps them alive) — size the per-kernel limit to
    # it (v5e VMEM = 128 MB)
    vmem_need = (
        2 * rb * Cp * bb * jnp.dtype(d.dtype).itemsize
        + 4 * Cp * bb * 4 + 2 * rb * 8 * Cp * 4
        + (14 + rb) * Cp * bb * 4 + (8 << 20)   # +slack: Mosaic's scoped
        # accounting measured 20.2M at rb=4/Cp=1024/bb=128 vs 17.3M modeled
    )
    compiler_params = (
        None if interpret
        else pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_need, 100 << 20))
        )
    )
    viol = pl.pallas_call(
        functools.partial(_check_kernel, rb, atol, rtol),
        compiler_params=compiler_params,
        grid=(Bp // bb, Rp // rb),
        in_specs=[
            pl.BlockSpec((rb, Cp, bb), lambda j, i: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, bb),
                         lambda j, i, rb=rb: (jnp.maximum(i * rb - 1, 0), 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp, bb),
                         lambda j, i, rb=rb, last=Rp - 1: (
                             jnp.minimum((i + 1) * rb, last), 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 8, Cp), lambda j, i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda j, i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        interpret=interpret,
    )(d, d, d, w8s)
    return viol[0, 0] > 0


def _w8_planes(plan: BandedKernelPlan, Rp: int, *, axis: int = 1) -> jax.Array:
    """In-edge weight planes in _class_offsets order: [Rp, 8, Cp] (axis=1,
    the pred kernel's layout) or [Rp, Cp, 8] (axis=2, sublane-major for the
    check kernel's lane-broadcasts)."""
    def pad_rows(p):
        return jnp.pad(
            p, [(0, Rp - plan.n_rows)] + [(0, 0)] * (p.ndim - 1),
            constant_values=INF,
        )

    return jnp.stack(
        [
            pad_rows(plan.lat_fwd),
            pad_rows(plan.lat_bwd),
            pad_rows(plan.down[:, 0, :]),
            pad_rows(plan.down[:, 1, :]),
            pad_rows(plan.down[:, 2, :]),
            pad_rows(plan.up[:, 0, :]),
            pad_rows(plan.up[:, 1, :]),
            pad_rows(plan.up[:, 2, :]),
        ],
        axis=axis,
    )


def check_converged_banded(
    plan: BandedKernelPlan,
    d_pad: jax.Array,        # [Rp, Cp, Bp]
    *,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """READ-ONLY fixed-point certificate: True iff every in-edge relaxation
    (eight banded classes + residual list — i.e. every edge of the mesh)
    is satisfied within tolerance. Replaces the solver's confirmation round
    (2 full read+write passes) with one ~1.5x-field read — the direct
    statement of the Dijkstra fixed point instead of its "a round changed
    nothing" proxy."""
    if interpret is None:
        interpret = not pallas_available()
    Rp, Cp, Bp = d_pad.shape
    w8s = _w8_planes(plan, Rp)
    if interpret:
        rb, bb = 2, Bp
    else:
        rb, bb = _pick_pred_blocks(Rp, Cp, dtype=d_pad.dtype)
    viol = _check_pallas_padded(
        d_pad, w8s, rb=rb, bb=bb, atol=atol, rtol=rtol, interpret=interpret
    )
    if plan.n_residual:
        dflat = d_pad.reshape(Rp * Cp, Bp).astype(jnp.float32)
        cand = dflat[plan.res_src] + plan.res_w[:, None]
        viol |= jnp.any(
            cand * (1.0 + rtol) + atol < dflat[plan.res_dst]
        )
    return ~viol


def predecessors_banded_pallas(
    plan: BandedKernelPlan,
    d_pad: jax.Array,        # [Rp, Cp, Bp] converged padded field
    *,
    tol: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """Full [V, B] predecessor recovery as a single Pallas pass — one read of
    the field + one int32 write (the roll-based predecessors_banded costs
    ~20x that in HBM round trips: 175 ms vs the whole 3-round field solve at
    1M x 256). Same contract as predecessors_banded (argmin class neighbor,
    self when unexplained). Residual edges are reconciled by a small
    post-pass: where the kernel found no class explanation (pred = self) but
    a residual in-edge explains the label, that source wins."""
    if interpret is None:
        interpret = not pallas_available()
    Rp, Cp, Bp = d_pad.shape
    R, C, V = plan.n_rows, plan.n_cols, plan.num_vertices

    def pad_rows(p):
        return jnp.pad(
            p, [(0, Rp - R)] + [(0, 0)] * (p.ndim - 1), constant_values=INF
        )

    w8 = jnp.stack(
        [
            pad_rows(plan.lat_fwd),
            pad_rows(plan.lat_bwd),
            pad_rows(plan.down[:, 0, :]),
            pad_rows(plan.down[:, 1, :]),
            pad_rows(plan.down[:, 2, :]),
            pad_rows(plan.up[:, 0, :]),
            pad_rows(plan.up[:, 1, :]),
            pad_rows(plan.up[:, 2, :]),
        ],
        axis=1,
    )                                                       # [Rp, 8, Cp]
    if interpret:
        rb, bb = 2, d_pad.shape[2]
    else:
        rb, bb = _pick_pred_blocks(Rp, Cp, dtype=d_pad.dtype)
    pred = _predecessors_pallas_padded(
        d_pad, w8, C=C, rb=rb, bb=bb, tol=tol, interpret=interpret
    )
    pred = pred[:R, :C, :].reshape(R * C, Bp)[:V]
    if plan.n_residual:
        dflat = d_pad.reshape(Rp * Cp, Bp).astype(jnp.float32)
        cand = dflat[plan.res_src] + plan.res_w[:, None]      # [Rz, Bp]
        dv = dflat[plan.res_dst]
        explains = (
            (cand <= dv * (1.0 + tol) + tol) & (dv > 0) & jnp.isfinite(cand)
        )
        dst_real = (plan.res_dst // Cp) * C + plan.res_dst % Cp
        src_real = (plan.res_src // Cp) * C + plan.res_src % Cp
        # collect one explaining residual source per (dst, lane): scatter-max
        # into -1-initialized table (any explaining source is a valid pred;
        # ties between residual edges resolve arbitrarily, matching the
        # tolerance-argmin contract)
        res_pred = jnp.full((V, Bp), -1, jnp.int32)
        res_pred = res_pred.at[dst_real].max(
            jnp.where(explains, src_real[:, None], -1).astype(jnp.int32)
        )
        self_ids = jnp.arange(V, dtype=jnp.int32)[:, None]
        pred = jnp.where((pred == self_ids) & (res_pred >= 0), res_pred, pred)
    # lanes stay padded ([V, Bp]); callers slice [:, :B]
    return pred


def predecessors_banded_classes(
    plan: BandedKernelPlan,
    d_pad: jax.Array,        # [Rp, Cp, Bp] converged padded field
    *,
    tol: float = 1e-5,
    interpret: bool | None = None,
    check: tuple | None = None,   # (atol, rtol): also return the converged flag
):
    """predecessors_banded_pallas, but the [V, Bp] table holds the winning
    in-edge CLASS (int8, 0..7 in _pred_kernel's off_real order, 8 = self)
    instead of the int32 vertex id — 4x less HBM on the bandwidth-bound
    pred write. Decode: pred_id = v + delta[class] with delta =
    (-1, 1, -C-1, -C, -C+1, C-1, C, C+1, 0) (extract_paths_cls does this
    per step). Only valid when the plan has no residual edges (residual
    predecessors are not class-representable)."""
    if plan.n_residual:
        raise ValueError("class pred table requires n_residual == 0")
    if interpret is None:
        interpret = not pallas_available()
    Rp, Cp, Bp = d_pad.shape
    R, C, V = plan.n_rows, plan.n_cols, plan.num_vertices

    def pad_rows(p):
        return jnp.pad(
            p, [(0, Rp - R)] + [(0, 0)] * (p.ndim - 1), constant_values=INF
        )

    w8 = jnp.stack(
        [
            pad_rows(plan.lat_fwd),
            pad_rows(plan.lat_bwd),
            pad_rows(plan.down[:, 0, :]),
            pad_rows(plan.down[:, 1, :]),
            pad_rows(plan.down[:, 2, :]),
            pad_rows(plan.up[:, 0, :]),
            pad_rows(plan.up[:, 1, :]),
            pad_rows(plan.up[:, 2, :]),
        ],
        axis=1,
    )                                                       # [Rp, 8, Cp]
    if interpret:
        rb, bb = 2, d_pad.shape[2]
    else:
        rb, bb = _pick_pred_blocks(Rp, Cp, dtype=d_pad.dtype)
    if check is not None:
        cls, viol = _predecessors_pallas_padded(
            d_pad, w8, C=C, rb=rb, bb=bb, tol=tol, interpret=interpret,
            as_class=True, check=check,
        )
        return cls[:R, :C, :].reshape(R * C, Bp)[:V], ~viol
    cls = _predecessors_pallas_padded(
        d_pad, w8, C=C, rb=rb, bb=bb, tol=tol, interpret=interpret,
        as_class=True,
    )
    return cls[:R, :C, :].reshape(R * C, Bp)[:V]


def predecessors_banded_classes_residual(
    plan: BandedKernelPlan,
    d_pad: jax.Array,        # [Rp, Cp, Bp] converged padded field
    *,
    tol: float = 1e-5,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """int8 class-pred recovery on RESIDUAL (irregular) plans: the Pallas
    kernel fills classes 0..8, then a residual reconcile pass upgrades
    dsts whose label is explained only by a residual in-edge to class 9
    and records the winning CSR slot in a compact [n_res_dst, Bp] int8
    table (extract_paths_cls decodes 9 through plan.res_jump). Replaces
    the int32 predecessors_banded_pallas table: 4 GB -> 1 GB + ~n_res/V
    at 1M x 1024, which is what frees the irregular light path to run the
    full 1024-lane batch.
    Returns (cls_vb [V, Bp] i8, res_choice [NDp, Bp] i8)."""
    if interpret is None:
        interpret = not pallas_available()
    Rp, Cp, Bp = d_pad.shape
    R, C, V = plan.n_rows, plan.n_cols, plan.num_vertices
    w8 = _w8_planes(plan, Rp)
    if interpret:
        rb, bb = 2, Bp
    else:
        rb, bb = _pick_pred_blocks(Rp, Cp, dtype=d_pad.dtype)
    cls = _predecessors_pallas_padded(
        d_pad, w8, C=C, rb=rb, bb=bb, tol=tol, interpret=interpret,
        as_class=True,
    )
    cls_vb = cls[:R, :C, :].reshape(R * C, Bp)[:V]
    NDp = plan.res_jump.shape[0]
    dflat = d_pad.reshape(Rp * Cp, Bp).astype(jnp.float32)
    cand = dflat[plan.res_src] + plan.res_w[:, None]          # [Rz, Bp]
    dv = dflat[plan.res_dst]
    explains = (
        (cand <= dv * (1.0 + tol) + tol) & (dv > 0) & jnp.isfinite(cand)
        & (plan.res_entry_row >= 0)[:, None]
    )
    # any explaining slot is a valid pred (tolerance-argmin contract);
    # scatter-max picks the highest-numbered one deterministically
    choice = jnp.full((NDp, Bp), -1, jnp.int32)
    choice = choice.at[jnp.maximum(plan.res_entry_row, 0)].max(
        jnp.where(explains, plan.res_entry_slot[:, None], -1)
    )
    has_res = choice >= 0                                     # [NDp, Bp]
    # upgrade cls to 9 where the kernel found no class pred but a residual
    # edge explains the label — only residual dsts can change
    rowm = plan.res_row_map                                   # [V]
    is_dst = rowm >= 0
    res_explains_v = has_res[jnp.maximum(rowm, 0)] & is_dst[:, None]
    cls_vb = jnp.where((cls_vb == 8) & res_explains_v, 9, cls_vb).astype(
        jnp.int8
    )
    return cls_vb, choice.astype(jnp.int8)


def extract_paths_cls(
    cls_vb: jax.Array,       # [V, B] i8 class table (lane-minor)
    start_v: jax.Array,      # [B]
    goal_v: jax.Array,       # [B]
    max_len: int,
    C: int,
    *,
    k_steps: int = 1,
    res_row_map: jax.Array | None = None,   # [V] i32 (residual decode)
    res_jump: jax.Array | None = None,      # [NDp, 8] i32
    res_choice: jax.Array | None = None,    # [NDp, B] i8
) -> tuple[jax.Array, jax.Array]:
    """extract_paths_vb over a class table, `k_steps` walk steps per gather.

    With the residual tables (predecessors_banded_classes_residual), class
    9 decodes through the jump table: next = res_jump[res_row_map[v],
    res_choice[row, lane]] — three extra point-gathers per step, only paid
    on residual (irregular) plans.

    k_steps=1 (default): one int8 gather per lane per step. k_steps=K>1
    gathers the (2K+1)^2 class PATCH around the current vertex and decodes
    K hops in-register via one-hot selects — MEASURED SLOWER at 1M x 1024
    (213 ms K=1-patch / 376 ms K=3 vs 31 ms plain): XLA's scalar-gather
    cost scales with gathered ELEMENTS, not dispatches, so trading 1
    gathered byte/lane/step for (2K+1)^2/K is a loss. Kept because the
    trade flips for meshes small enough to sit in cache. Decode: next id =
    v + delta[class]; class 8 terminates (pred == self)."""
    B = start_v.shape[0]
    lane = jnp.arange(B, dtype=jnp.int32)
    K = max(1, k_steps)
    residual = res_row_map is not None
    if residual:
        assert K == 1, "residual decode only on the plain (K=1) chase"
    if K == 1:
        # plain chase: one int8 point-gather per lane per step
        delta1 = jnp.asarray(
            [-1, 1, -C - 1, -C, -C + 1, C - 1, C, C + 1, 0, 0], jnp.int32
        )
        chunk = 256
        n_chunks = -(-max_len // chunk)
        L1 = n_chunks * chunk
        if residual:
            NDc = res_jump.shape[0] - 1

        def step1(carry, _):
            v, alive = carry
            k = cls_vb[v, lane].astype(jnp.int32)
            nxt = v + delta1[k]
            if residual:
                row = jnp.clip(res_row_map[v], 0, NDc)
                slot = jnp.clip(
                    res_choice[row, lane].astype(jnp.int32), 0, 7
                )
                nxt = jnp.where(k == 9, res_jump[row, slot], nxt)
            reached_end = (v == goal_v) | (k == 8)
            new_alive = alive & ~reached_end
            return (jnp.where(new_alive, nxt, v), new_alive), (v, alive)

        def body1(carry):
            v, alive, j, path, valid = carry
            (v, alive), (p_c, a_c) = jax.lax.scan(
                step1, (v, alive), None, length=chunk
            )
            path = jax.lax.dynamic_update_slice_in_dim(path, p_c, j * chunk, 0)
            valid = jax.lax.dynamic_update_slice_in_dim(valid, a_c, j * chunk, 0)
            return v, alive, j + 1, path, valid

        def cond1(carry):
            v, alive, j, _, _ = carry
            return jnp.any(alive) & (j < n_chunks)

        path0 = jnp.broadcast_to(start_v[None, :], (L1, B))
        valid0 = jnp.zeros((L1, B), bool)
        v, alive, _, path, valid = jax.lax.while_loop(
            cond1, body1,
            (start_v, jnp.ones(B, bool), jnp.int32(0), path0, valid0),
        )
        fill = jnp.where(valid, path, v[None, :])
        return fill[:max_len].T, valid[:max_len].T
    W = 2 * K + 1
    # real-id and patch-index offsets of the 9 decode classes
    dr9 = jnp.asarray([0, 0, -1, -1, -1, 1, 1, 1, 0], jnp.int32)
    dc9 = jnp.asarray([-1, 1, -1, 0, 1, -1, 0, 1, 0], jnp.int32)
    delta = dr9 * C + dc9
    pdelta = dr9 * W + dc9
    # patch gather offsets (row-major over the (2K+1)^2 window)
    pr = jnp.arange(-K, K + 1, dtype=jnp.int32)
    offs = (pr[:, None] * C + pr[None, :]).reshape(-1)        # [W*W]
    Vtot = cls_vb.shape[0]
    center = jnp.int32(K * W + K)
    patch_iota = jnp.arange(W * W, dtype=jnp.int32)[:, None]  # [W*W, 1]

    sup_chunk = max(1, 256 // K)
    n_sup = -(-max_len // (K * sup_chunk))
    L = n_sup * sup_chunk * K

    def super_step(carry, _):
        v, alive = carry
        idx = jnp.clip(v[None, :] + offs[:, None], 0, Vtot - 1)   # [W*W, B]
        patch = cls_vb[idx, lane[None, :]].astype(jnp.int32)      # [W*W, B]
        pos = jnp.broadcast_to(center, (B,))
        outs_v = []
        outs_a = []
        for _s in range(K):
            # class at the current patch position: dense one-hot select
            k = jnp.sum(
                jnp.where(patch_iota == pos[None, :], patch, 0), axis=0
            )
            outs_v.append(v)
            outs_a.append(alive)
            reached_end = (v == goal_v) | (k == 8)
            new_alive = alive & ~reached_end
            v = jnp.where(new_alive, v + delta[k], v)
            pos = jnp.where(new_alive, pos + pdelta[k], pos)
            alive = new_alive
        return (v, alive), (jnp.stack(outs_v), jnp.stack(outs_a))

    def body(carry):
        v, alive, j, path, valid = carry
        (v, alive), (p_c, a_c) = jax.lax.scan(
            super_step, (v, alive), None, length=sup_chunk
        )                                      # [sup_chunk, K, B]
        p_c = p_c.reshape(sup_chunk * K, B)
        a_c = a_c.reshape(sup_chunk * K, B)
        path = jax.lax.dynamic_update_slice_in_dim(path, p_c, j * sup_chunk * K, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(valid, a_c, j * sup_chunk * K, 0)
        return v, alive, j + 1, path, valid

    def cond(carry):
        v, alive, j, _, _ = carry
        return jnp.any(alive) & (j < n_sup)

    path0 = jnp.broadcast_to(start_v[None, :], (L, B))
    valid0 = jnp.zeros((L, B), bool)
    v, alive, _, path, valid = jax.lax.while_loop(
        cond, body, (start_v, jnp.ones(B, bool), jnp.int32(0), path0, valid0)
    )
    fill = jnp.where(valid, path, v[None, :])
    return fill[:max_len].T, valid[:max_len].T


def extract_paths_vb(
    pred_vb: jax.Array,      # [V, B] i32 predecessor map (lane-minor)
    start_v: jax.Array,      # [B]
    goal_v: jax.Array,       # [B]
    max_len: int,
) -> tuple[jax.Array, jax.Array]:
    """sweeps.extract_path over a lane-minor [V, B] pred table — one [B]
    point-gather per step, no [B, V] transpose. Chunked with an early-exit
    while_loop: max_len bounds the WORST lane, but typical batches finish in
    ~half that, and every chunk skipped saves its sequential gather chain.
    Returns ([B, L], [B, L])."""
    B = start_v.shape[0]
    lane = jnp.arange(B, dtype=jnp.int32)
    chunk = 256
    n_chunks = -(-max_len // chunk)
    L = n_chunks * chunk

    def step(carry, _):
        v, alive = carry
        nxt = pred_vb[v, lane]
        reached_end = (v == goal_v) | (nxt == v)
        new_alive = alive & ~reached_end
        return (jnp.where(new_alive, nxt, v), new_alive), (v, alive)

    def body(carry):
        v, alive, k, path, valid = carry
        (v, alive), (p_c, a_c) = jax.lax.scan(
            step, (v, alive), None, length=chunk
        )
        path = jax.lax.dynamic_update_slice_in_dim(path, p_c, k * chunk, 0)
        valid = jax.lax.dynamic_update_slice_in_dim(valid, a_c, k * chunk, 0)
        return v, alive, k + 1, path, valid

    def cond(carry):
        v, alive, k, _, _ = carry
        return jnp.any(alive) & (k < n_chunks)

    path0 = jnp.broadcast_to(start_v[None, :], (L, B))
    # dead-lane padding repeats the terminal vertex with valid=False
    valid0 = jnp.zeros((L, B), bool)
    v, alive, _, path, valid = jax.lax.while_loop(
        cond, body, (start_v, jnp.ones(B, bool), jnp.int32(0), path0, valid0)
    )
    # unfilled tail chunks hold start_v placeholders; overwrite with the
    # terminal vertex so positions stay on-path (valid already False there)
    fill = jnp.where(valid, path, v[None, :])
    return fill[:max_len].T, valid[:max_len].T


def pred_at_vertices(
    plan: BandedKernelPlan,
    dist_bv: jax.Array,      # [B, V] labels; [V, Bp] when lane_minor=True
    vids: jax.Array,         # [B, K] REAL vertex ids (per batch lane)
    *,
    tol: float = 1e-5,
    lane_minor: bool = False,
    lane_map: jax.Array | None = None,  # [B] column per robot (lane_minor)
    padded_flat: bool = False,
) -> jax.Array:
    """On-the-fly predecessor lookup for a handful of vertices per lane —
    pred[v] = argmin_u dist[u] + w(u, v) over the eight banded classes
    (dijkstra_mesh_planner.cpp:320-347 relaxation inverted), pred = self when
    no neighbor explains the label (source / isolated semantics of
    predecessors_banded). Returns REAL vertex ids [B, K].

    This replaces the full [B, V] predecessors_banded recovery on the light
    path: the controller only needs preds at the tracked face's 3 vertices
    (175 ms -> microseconds at 1M x 256).

    lane_minor=True reads the solver's native [V, B] layout directly — no
    [B, V] transpose of the 1 GB potential ever materializes; padded_flat
    additionally takes the RAW padded field ([Rp*Cp, Bp] — d_pad
    reshaped), so not even the [V, B] slice-copy of the field is built.
    lane_map remaps robots to solver lanes when the solve ran in
    sorted-goal order (PlanResult.lane_map)."""
    B, K = vids.shape
    V = plan.num_vertices
    W8, offs = _inbound_tables(plan)

    lane = jnp.arange(B, dtype=jnp.int32)
    if lane_map is not None:
        lane = lane_map.astype(jnp.int32)
    lane = lane[:, None]                                   # [B, 1]
    u = vids[None, :, :] + offs[:, None, None]             # [8, B, K]
    u_cl = jnp.clip(u, 0, V - 1)
    if padded_flat:
        du = dist_bv[_to_padded_flat(plan, u_cl), lane[None]]
        dv = dist_bv[_to_padded_flat(plan, vids), lane]
    elif lane_minor:
        du = dist_bv[u_cl, lane[None]]                     # [8, B, K]
        dv = dist_bv[vids, lane]
    else:
        du = dist_bv[lane[None], u_cl]                     # [8, B, K]
        dv = dist_bv[lane, vids]
    cand = du + W8[:, _to_padded_flat(plan, vids)]
    best = jnp.min(cand, axis=0)
    arg = jnp.argmin(cand, axis=0)
    u_best = jnp.take_along_axis(u_cl, arg[None], axis=0)[0]   # [B, K]

    if plan.n_residual:
        # residual in-edges at the queried vertices (irregular meshes):
        # without these, vertices whose label is explained only by a
        # residual edge read pred = self and the controller samples a zero
        # direction row. Trace-time CSR: sort residual edges by dst, probe
        # up to 8 slots per vertex (res_* padding has w = inf, and >8
        # residual in-edges on one vertex does not occur on band-reordered
        # meshes — the dense classes absorb the near offsets).
        C, Cp = plan.n_cols, plan.n_cols_pad
        order = jnp.argsort(plan.res_dst)
        rd = plan.res_dst[order]
        rs = plan.res_src[order]
        rw = plan.res_w[order]
        vp = _to_padded_flat(plan, vids)                   # [B, K]
        lo = jnp.searchsorted(rd, vp)                      # [B, K]
        P = 8
        idx = lo[..., None] + jnp.arange(P, dtype=jnp.int32)   # [B, K, P]
        idx_cl = jnp.clip(idx, 0, rd.shape[0] - 1)
        okr = (idx < rd.shape[0]) & (rd[idx_cl] == vp[..., None])
        srcp = rs[idx_cl]                                  # padded flat ids
        src_real = (srcp // Cp) * C + srcp % Cp
        src_real = jnp.clip(src_real, 0, V - 1)
        if padded_flat:
            du_r = dist_bv[srcp, lane[..., None]]          # [B, K, P]
        elif lane_minor:
            du_r = dist_bv[src_real, lane[..., None]]      # [B, K, P]
        else:
            du_r = dist_bv[lane[..., None], src_real]
        cand_r = jnp.where(okr, du_r + rw[idx_cl], INF)
        best_r = jnp.min(cand_r, axis=-1)                  # [B, K]
        arg_r = jnp.argmin(cand_r, axis=-1)
        u_r = jnp.take_along_axis(src_real, arg_r[..., None], axis=-1)[..., 0]
        u_best = jnp.where(best_r < best, u_r, u_best)
        best = jnp.minimum(best, best_r)

    has = (best <= dv * (1.0 + tol) + tol) & (dv > 0) & jnp.isfinite(dv)
    return jnp.where(has, u_best, vids)


def descend_paths(
    plan: BandedKernelPlan,
    dist_bv: jax.Array,      # [B, V] converged labels (PlanResult.potential)
    start_v: jax.Array,      # [B] REAL vertex ids
    goal_v: jax.Array,       # [B] REAL vertex ids (the seeds)
    max_len: int,
    *,
    tol: float = 1e-5,
) -> tuple[jax.Array, jax.Array]:
    """Greedy steepest-descent path extraction straight from the distance
    field — the predecessor chain recomputed on the fly, one wavefront vertex
    per step (pred backtracking contract of dijkstra_mesh_planner.cpp:367-373
    and sweeps.extract_path, without ever materializing the [B, V] pred map).

    Each step gathers the eight class-neighbor labels + in-edge weights as
    two stacked [8, B] gathers and steps to the argmin. Descent stalls (no
    finite improving neighbor — only possible off the banded classes or on
    unreached lanes) end the chain with valid=False, matching extract_path's
    termination-at-self behavior. Returns (path [B, max_len] REAL ids,
    valid [B, max_len])."""
    B = start_v.shape[0]
    V = plan.num_vertices
    W8, offs = _inbound_tables(plan)
    lane = jnp.arange(B, dtype=jnp.int32)

    def step(carry, _):
        v, alive = carry                                   # [B]
        dv = dist_bv[lane, v]
        u = v[None, :] + offs[:, None]                     # [8, B]
        u_cl = jnp.clip(u, 0, V - 1)
        cand = dist_bv[lane[None], u_cl] + W8[:, _to_padded_flat(plan, v)]
        best = jnp.min(cand, axis=0)
        nxt = jnp.take_along_axis(
            u_cl, jnp.argmin(cand, axis=0)[None], axis=0
        )[0]
        descends = (best <= dv * (1.0 + tol) + tol) & (dv > 0) & jnp.isfinite(dv)
        reached_end = (v == goal_v) | ~descends
        new_alive = alive & ~reached_end
        return (jnp.where(new_alive, nxt, v), new_alive), (v, alive)

    (_, _), (path_v, valid) = jax.lax.scan(
        step, (start_v, jnp.ones(B, bool)), None, length=max_len
    )
    return path_v.T, valid.T                               # [B, L]


def batched_field_banded_pallas(
    mesh: MeshArrays,
    weights_vd: jax.Array,
    plan: BandedKernelPlan,
    seeds: jax.Array,          # [B] i32
    *,
    max_rounds: int = 256,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    interpret: bool | None = None,
    dtype=jnp.float32,
    scan_steps: int = 0,
) -> BandedPallasResult:
    """Batched SSSP by Pallas banded GS rounds.

    One round = down pass + up pass + residual scatter-min; converged when no
    label improves by more than atol + rtol*|label| in a round (then every
    edge relaxation is satisfied to that tolerance: scan step 0 covers
    lateral edges, cross planes the inter-row edges, the residual the rest).
    atol=rtol=0 gives the exact Dijkstra fixed point; the small defaults cut
    the fp32 jitter tail (improvements can't amplify through a relaxation, so
    sub-tolerance residual error stays at noise scale, ~1e-4 observed).

    dtype=jnp.bfloat16 runs the whole relaxation in bf16 (half the HBM/VMEM
    traffic) at ~0.4% mean label error — opt-in approximate mode, same
    contract as the structured solver's bf16 path; predecessors are still
    recovered in f32 against the bf16 labels."""
    V = plan.num_vertices
    B = seeds.shape[0]
    R, C = plan.n_rows, plan.n_cols
    res = banded_solve_padded(
        plan, seeds, max_rounds=max_rounds, atol=atol, rtol=rtol,
        interpret=interpret, dtype=dtype, scan_steps=scan_steps,
    )

    # unpad: [Rp, Cp, Bp] -> [V, B]
    dist = res.d_pad[:R, :C, :B].reshape(R * C, B)[:V].astype(jnp.float32)

    pred_tol = 1e-2 if dtype == jnp.bfloat16 else max(atol, 1e-6)
    pred = predecessors_banded(plan, dist, tol=pred_tol)
    return BandedPallasResult(
        dist=dist.T, pred=pred.T, rounds=res.rounds, converged=res.converged
    )


def transpose_banded_plan(plan: BandedKernelPlan) -> BandedKernelPlan:
    """The same relaxation system on the TRANSPOSED [C, R] grid — the
    column-direction Gauss-Seidel passes of a 4-directional fast sweep.

    Why: on irregular band-reordered meshes, east-west geodesics physically
    zigzag between adjacent rank-rows (triangle strips), and a row-direction
    GS pass advances such a path only ~2 hops per pass (measured: 1-round
    coverage then ~38 refinement rounds at 262k). A column-direction pass
    walks those same paths monotonically, so alternating orientations
    converges in O(true winding) rounds — the min-plus analog of the classic
    4-sweep FSM (and of ops/pallas_eikonal.py's round structure).

    Pure jnp; class mapping (source offset (dr, dc) -> transposed (dc, dr)):
    T-lat_fwd = orig down s=0, T-down = [down s=-1, lat_fwd, up s=-1],
    T-up = [down s=+1, lat_bwd, up s=+1], extended lanes transpose by the
    same rule. Residual ids remap to the transposed padded grid. Predecessor
    recovery always uses the ORIGINAL plan (this object is solve-only)."""
    R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
    Rt = _round_up(R, 8)

    def T(p):  # [R, Cp] -> [C, Rt]
        return jnp.pad(
            p[:, :C].T, ((0, 0), (0, Rt - R)), constant_values=INF
        )

    lat_fwd_t = T(plan.down[:, 1, :])
    lat_bwd_t = T(plan.up[:, 1, :])
    down_t = jnp.stack(
        [T(plan.down[:, 0, :]), T(plan.lat_fwd), T(plan.up[:, 0, :])], axis=1
    )
    up_t = jnp.stack(
        [T(plan.down[:, 2, :]), T(plan.lat_bwd), T(plan.up[:, 2, :])], axis=1
    )
    n_scan_t = max(1, int(np.ceil(np.log2(max(R, 2)))))
    lf_eff, lb_eff = _effective_laterals(lat_fwd_t, lat_bwd_t, down_t, up_t, xp=jnp)
    a_fwd_t, a_bwd_t = _chain_weights(lf_eff, lb_eff, n_scan_t, xp=jnp)

    # extended lanes: original (dr, dc) -> transposed (dc, dr)
    all_lanes = [(-sel, dc, plan.xdown[:, i, :])
                 for i, (sel, dc) in enumerate(plan.xlanes_down)]
    all_lanes += [(sel, dc, plan.xup[:, i, :])
                  for i, (sel, dc) in enumerate(plan.xlanes_up) if sel != 0]
    xl_down, xp_down, xl_up, xp_up = [], [], [], []
    for dr, dc, p in all_lanes:
        dr_t, dc_t = dc, dr
        pt = T(p)
        if dr_t <= 0:
            xl_down.append((abs(dr_t), dc_t))
            xp_down.append(pt)
        if dr_t >= 0:
            xl_up.append((abs(dr_t), dc_t))
            xp_up.append(pt)

    def xstack(ps):
        if ps:
            return jnp.stack(ps, axis=1)
        return jnp.full((C, 1, Rt), INF, jnp.float32)

    res_r = plan.res_dst // Cp
    res_c = plan.res_dst % Cp
    res_dst_t = res_c * Rt + res_r
    src_r = plan.res_src // Cp
    src_c = plan.res_src % Cp
    res_src_t = src_c * Rt + src_r

    return BandedKernelPlan(
        n_rows=C,
        n_cols=R,
        n_cols_pad=Rt,
        n_scan=n_scan_t,
        coverage=plan.coverage,
        num_vertices=plan.num_vertices,
        n_residual=plan.n_residual,
        down=down_t,
        up=up_t,
        a_fwd=a_fwd_t,
        a_bwd=a_bwd_t,
        res_dst=res_dst_t,
        res_src=res_src_t,
        res_w=plan.res_w,
        slot_map=plan.slot_map,        # NOT valid in T layout; solve-only
        res_slot=plan.res_slot,
        lat_fwd=lat_fwd_t,
        lat_bwd=lat_bwd_t,
        xlanes_down=tuple(xl_down),
        xlanes_up=tuple(xl_up),
        xdown=xstack(xp_down),
        xup=xstack(xp_up),
        xslot_down=plan.xslot_down,    # solve-only (refresh re-transposes)
        xslot_up=plan.xslot_up,
    )
