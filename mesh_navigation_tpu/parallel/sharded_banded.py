"""Sharded banded GS solver: the PRODUCTION kernel over a device mesh.

parallel/partition.py shards the D-slot gather solver — the tier the
single-chip path left behind two rounds ago. This module shards the banded
Pallas kernel itself (ops/pallas_banded.py): rows are cut into contiguous
RANGE shards (one per device), each device runs the unmodified directional
pass over its rows plus G GHOST rows on each side, and per round the 2*G
boundary rows travel by `jax.lax.ppermute` neighbor shifts (O(G * Cp * B)
per device per round — the dcn_plan's design). Convergence is a global
`psum` of the change flag.

Round semantics: within a round each shard is Gauss-Seidel over its own
rows (the carried-row machinery, untouched) and block-Jacobi across shard
boundaries (ghosts hold the neighbor's PRE-round boundary rows), so a
wavefront crosses one cut per round — rounds grow by the number of shard
boundaries an optimal path crosses, everything else is unchanged. The fixed
point is the same monotone Dijkstra fixed point (ghost rows only ever carry
true label values; every relaxation is a real path cost).

IRREGULAR (residual) meshes: residual edges and extended relaxation lanes
shard along rows too. NEAR residuals (row reach <= the ghost width G) relax
locally — each shard keeps the entries whose DESTINATION row it owns, and
sources resolve into owned-or-ghost rows. FAR residuals (band reordering
leaves a small tail of long boundary/sliver edges whose endpoints land many
rows apart — measured ~5% of residuals, max reach ~0.05*R) ride a compact
FAR-SOURCE TABLE instead: each round, every shard contributes the field
values of the far sources it owns and a `lax.pmin` all-reduce makes the
table globally fresh ([n_far, B] floats — a few MB at 1M, vs widening the
halo to half the mesh). Residual improvements mark their rows dirty so the
row-skip machinery re-scans them — the same soundness contract as the
single-device solver.

SURVEY.md §2.3 halo-exchange requirement on the production kernel; replaces
lvr2::Meap at multi-host scale (configs[4]).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from mesh_navigation_tpu.ops import pallas_banded as pb

INF = jnp.inf

# ghost rows are a per-round ppermute payload (G * Cp * B each way); cap the
# width so a pathological reorder can't silently turn the halo into a full
# field exchange
MAX_GHOST = 4


class ShardedBandedPlan(NamedTuple):
    """Per-shard plane stacks (leading axis = shard). Each shard owns rows
    [k*Rs, (k+1)*Rs) plus G ghost rows on each side; plane rows cover the
    ghost rows too (a ghost row is a real destination during the pass — its
    writes are discarded at the next exchange, but its PLANES must be real
    so its relaxations stay valid path costs)."""
    down: jax.Array      # [n, RpL, 3, Cp]
    up: jax.Array
    a_fwd: jax.Array     # [n, RpL, S, Cp]
    a_bwd: jax.Array
    l2_fwd: jax.Array    # [n, RpL, S2, NBp] (dummy when n_scan2 == 0)
    l2_bwd: jax.Array
    wback: jax.Array     # [n, RpL, 2, Cp]
    xdown: jax.Array     # [n, RpL, Lx, Cp] extended-lane planes (dummy lane
    xup: jax.Array       #   when the plan has none)
    res_src: jax.Array   # [n, Rz] i32 LOCAL padded-flat ids (pad: 0)
    res_dst: jax.Array   # [n, Rz] i32 LOCAL padded-flat ids (pad: 0)
    res_w: jax.Array     # [n, Rz] f32 (pad: +inf)
    far_src: jax.Array   # [n, Nf] i32 LOCAL flat id of owned far sources
    far_own: jax.Array   # [n, Nf] bool — this shard owns far source i
    far_idx: jax.Array   # [n, Rzf] i32 index into the far table (pad: 0)
    far_dst: jax.Array   # [n, Rzf] i32 LOCAL padded-flat dst (pad: 0)
    far_w: jax.Array     # [n, Rzf] f32 (pad: +inf)
    xlanes_down: tuple   # static (sel, dc) descriptors
    xlanes_up: tuple
    n_residual: int      # max per-shard NEAR residual count (0 = none)
    n_far: int           # far-source table size (0 = none)
    ghost: int           # G ghost rows each side
    n_shards: int
    rows_per_shard: int  # Rs (owned)
    rp_local: int        # padded local rows (Rs + 2G ghosts, rb multiple)
    rb: int
    bb: int
    n_scan: int
    n_scan2: int
    n_rows: int          # global R
    n_cols: int
    n_cols_pad: int
    num_vertices: int


def build_sharded_banded_plan(
    plan: pb.BandedKernelPlan, n_shards: int, *, interpret: bool = False
) -> ShardedBandedPlan:
    """Host-side: stack per-shard plane slices with G-row ghost overlap and
    split the residual list by destination-row owner."""
    R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
    Rs = -(-R // n_shards)

    # ghost width: the maximum row reach of any relaxation source — 1 for
    # the dense classes, up to 2 for extended lanes, the measured max |dr|
    # for residual edges
    ghost = 1
    if plan.xlanes_down or plan.xlanes_up:
        ghost = max(
            ghost,
            *[abs(sel) for sel, _ in plan.xlanes_down + plan.xlanes_up],
        )
    n_res_real = int(plan.n_residual)
    if n_res_real:
        src_rows = np.asarray(plan.res_src[:n_res_real]) // Cp
        dst_rows = np.asarray(plan.res_dst[:n_res_real]) // Cp
        reach = np.abs(src_rows - dst_rows)
        # ghosts cover the bulk (reach <= MAX_GHOST); the long tail of
        # boundary/sliver edges goes to the far-source table
        ghost = max(ghost, int(min(reach.max(initial=0), MAX_GHOST)))
    G = ghost

    if interpret:
        rb, bb = 2, 8
    else:
        rb, bb = pb._pick_blocks(
            Cp, extra_lanes=max(len(plan.xlanes_down), len(plan.xlanes_up)),
        )
    rp_local = -(-(Rs + 2 * G) // rb) * rb

    if plan.n_scan2:
        NB = Cp // 8
        NBp = -(-NB // 128) * 128
        l2f_full = jnp.pad(
            plan.l2_fwd, ((0, 0), (0, 0), (0, NBp - NB)), constant_values=INF
        )
        l2b_full = jnp.pad(
            plan.l2_bwd, ((0, 0), (0, 0), (0, NBp - NB)), constant_values=INF
        )
        wb_full = jnp.stack([plan.wback_fwd, plan.wback_bwd], axis=1)
    else:
        l2f_full = l2b_full = jnp.full((R, 1, 128), INF, jnp.float32)
        wb_full = jnp.full((R, 2, Cp), INF, jnp.float32)

    def shard_rows(p):
        """[R, ...] -> [n, rp_local, ...]: rows k*Rs-G .. k*Rs+Rs+G (ghosts),
        inf-padded outside [0, R)."""
        pp = jnp.pad(
            p, [(G, rp_local)] + [(0, 0)] * (p.ndim - 1), constant_values=INF
        )
        return jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(pp, k * Rs, rp_local, 0)
                for k in range(n_shards)
            ]
        )

    # residual split by destination owner; NEAR sources resolve into the
    # owner's local frame (owned or ghost rows — reach <= G), FAR sources go
    # through the all-reduced table
    def _empty_res():
        return (
            jnp.zeros((n_shards, 8), jnp.int32),
            jnp.zeros((n_shards, 8), jnp.int32),
            jnp.full((n_shards, 8), np.inf, jnp.float32),
        )

    n_residual = n_far = 0
    res_src_s, res_dst_s, res_w_s = _empty_res()
    far_idx_s, far_dst_s, far_w_s = _empty_res()
    far_src_s = jnp.zeros((n_shards, 8), jnp.int32)
    far_own_s = jnp.zeros((n_shards, 8), bool)
    if n_res_real:
        res_src_np = np.asarray(plan.res_src[:n_res_real])
        res_dst_np = np.asarray(plan.res_dst[:n_res_real])
        res_w_np = np.asarray(plan.res_w[:n_res_real])
        dst_owner = np.minimum(dst_rows // Rs, n_shards - 1)
        src_owner = np.minimum(src_rows // Rs, n_shards - 1)
        # an entry is NEAR when its source row lies inside its dst owner's
        # ghost-extended range (NOT merely |reach| <= G: a dst near a shard
        # edge reaches across the cut)
        lo = dst_owner * Rs - G
        hi = dst_owner * Rs + Rs + G
        near = (src_rows >= lo) & (src_rows < hi)
        far = ~near

        per = [np.nonzero(near & (dst_owner == k))[0] for k in range(n_shards)]
        Rz = max(8, -(-max((len(ix) for ix in per), default=1) // 8) * 8)
        src_l = np.zeros((n_shards, Rz), np.int32)
        dst_l = np.zeros((n_shards, Rz), np.int32)
        w_l = np.full((n_shards, Rz), np.inf, np.float32)
        for k, ix in enumerate(per):
            base = k * Rs - G           # global row of local row 0
            sl = res_src_np[ix] - base * Cp
            dl = res_dst_np[ix] - base * Cp
            assert (sl >= 0).all() and (sl < rp_local * Cp).all()
            assert (dl >= 0).all() and (dl < rp_local * Cp).all()
            src_l[k, : len(ix)] = sl
            dst_l[k, : len(ix)] = dl
            w_l[k, : len(ix)] = res_w_np[ix]
        n_residual = int(Rz)
        res_src_s = jnp.asarray(src_l)
        res_dst_s = jnp.asarray(dst_l)
        res_w_s = jnp.asarray(w_l)

        if far.any():
            fsrc_g, finv = np.unique(res_src_np[far], return_inverse=True)
            Nf = max(8, -(-len(fsrc_g) // 8) * 8)
            fsrc_rows = fsrc_g // Cp
            fsrc_owner = np.minimum(fsrc_rows // Rs, n_shards - 1)
            fown = np.zeros((n_shards, Nf), bool)
            fsrc_local = np.zeros((n_shards, Nf), np.int32)
            for k in range(n_shards):
                own = fsrc_owner == k
                fown[k, : len(fsrc_g)] = own
                fsrc_local[k, : len(fsrc_g)] = np.where(
                    own, fsrc_g - (k * Rs - G) * Cp, 0
                )
            fper = [
                np.nonzero(far & (dst_owner == k))[0] for k in range(n_shards)
            ]
            far_of = np.zeros(n_res_real, np.int64)
            far_of[np.nonzero(far)[0]] = finv
            Rzf = max(8, -(-max((len(ix) for ix in fper), default=1) // 8) * 8)
            fidx_l = np.zeros((n_shards, Rzf), np.int32)
            fdst_l = np.zeros((n_shards, Rzf), np.int32)
            fw_l = np.full((n_shards, Rzf), np.inf, np.float32)
            for k, ix in enumerate(fper):
                base = k * Rs - G
                fdl = res_dst_np[ix] - base * Cp
                assert (fdl >= 0).all() and (fdl < rp_local * Cp).all()
                fidx_l[k, : len(ix)] = far_of[ix]
                fdst_l[k, : len(ix)] = fdl
                fw_l[k, : len(ix)] = res_w_np[ix]
            n_far = int(Nf)
            far_src_s = jnp.asarray(fsrc_local)
            far_own_s = jnp.asarray(fown)
            far_idx_s = jnp.asarray(fidx_l)
            far_dst_s = jnp.asarray(fdst_l)
            far_w_s = jnp.asarray(fw_l)

    return ShardedBandedPlan(
        down=shard_rows(plan.down),
        up=shard_rows(plan.up),
        a_fwd=shard_rows(plan.a_fwd),
        a_bwd=shard_rows(plan.a_bwd),
        l2_fwd=shard_rows(l2f_full),
        l2_bwd=shard_rows(l2b_full),
        wback=shard_rows(wb_full),
        xdown=shard_rows(plan.xdown),
        xup=shard_rows(plan.xup),
        res_src=res_src_s,
        res_dst=res_dst_s,
        res_w=res_w_s,
        far_src=far_src_s,
        far_own=far_own_s,
        far_idx=far_idx_s,
        far_dst=far_dst_s,
        far_w=far_w_s,
        xlanes_down=plan.xlanes_down,
        xlanes_up=plan.xlanes_up,
        n_residual=n_residual,
        n_far=n_far,
        ghost=G,
        n_shards=n_shards,
        rows_per_shard=Rs,
        rp_local=rp_local,
        rb=rb,
        bb=bb,
        n_scan=plan.n_scan,
        n_scan2=plan.n_scan2,
        n_rows=R,
        n_cols=C,
        n_cols_pad=Cp,
        num_vertices=plan.num_vertices,
    )


def sharded_banded_solve(
    splan: ShardedBandedPlan,
    seeds: jax.Array,          # [B] i32 global REAL vertex ids
    device_mesh: Mesh,
    *,
    max_rounds: int = 256,
    atol: float = 0.0,
    rtol: float = 0.0,
    interpret: bool = False,
    axis_name: str = "shard",
):
    """Run sharded banded GS rounds to global convergence.

    Returns (dist [V, B] f32 on the host mesh layout, rounds, converged).
    The per-device body is the unmodified `_directional_pass_pallas` (+ the
    per-shard residual scatter on irregular meshes); the only cross-device
    traffic is 2*G boundary rows per round (`ppermute`) plus the `psum`
    convergence bit.
    """
    n, Rs, RpL = splan.n_shards, splan.rows_per_shard, splan.rp_local
    C, Cp, V = splan.n_cols, splan.n_cols_pad, splan.num_vertices
    G = splan.ghost
    B = seeds.shape[0]
    rb, bb = splan.rb, splan.bb
    Bp = -(-B // bb) * bb
    n_j = Bp // bb
    n_scan = splan.n_scan
    n_scan2 = splan.n_scan2
    if n_scan2:
        a_f = splan.a_fwd[:, :, :3]
        a_b = splan.a_bwd[:, :, :3]
        n_scan_eff = 3
    else:
        a_f, a_b = splan.a_fwd, splan.a_bwd
        n_scan_eff = n_scan
    has_residual = splan.n_residual > 0
    has_far = splan.n_far > 0
    has_x = bool(splan.xlanes_down or splan.xlanes_up)
    # the row-skip machinery needs the dirty table whenever residual
    # scatters or partial-depth scans can leave a row below its lateral
    # fixed point (same condition as the single-device solver)
    full_depth = n_scan >= max(1, int(np.ceil(np.log2(max(C, 2)))))
    use_dirty = has_residual or not full_depth

    # seed field per shard: local row = global_row - k*Rs + G (ghost offset)
    rows_g = seeds // C
    cols_g = seeds % C

    def body(shard_id, down, up, af, ab, l2f, l2b, wb, xdn, xup,
             rsrc, rdst, rw, fsrc, fown, fidx, fdst, fw):
        # shard_map keeps the sharded leading axis as size-1: drop it
        down, up, af, ab = down[0], up[0], af[0], ab[0]
        l2f, l2b, wb = l2f[0], l2b[0], wb[0]
        xdn, xup = xdn[0], xup[0]
        rsrc, rdst, rw = rsrc[0], rdst[0], rw[0]
        fsrc, fown, fidx, fdst, fw = (
            fsrc[0], fown[0], fidx[0], fdst[0], fw[0]
        )
        # shard-local seeded field [RpL, Cp, Bp]
        k = shard_id[0]
        local_row = rows_g - k * Rs + G
        own = (local_row >= G) & (local_row < G + Rs)
        flat = jnp.where(own, local_row * Cp + cols_g, 0)
        d0 = jnp.full((RpL * Cp, Bp), INF, jnp.float32)
        d0 = d0.at[flat, jnp.arange(B)].min(jnp.where(own, 0.0, INF))
        d = d0.reshape(RpL, Cp, Bp)
        dirty0 = jnp.zeros((n_j, RpL) if use_dirty else (1, 1), jnp.int32)
        res_rows_l = rdst // Cp
        far_rows_l = fdst // Cp

        def exchange(d):
            # ghost refresh: rows [G, G+Rs) are owned; ghosts at [0, G) and
            # [G+Rs, G+Rs+G)
            top_from_prev = jax.lax.ppermute(
                d[Rs : Rs + G],                    # prev's LAST G owned rows
                axis_name, [(i, (i + 1) % n) for i in range(n)]
            )
            bot_from_next = jax.lax.ppermute(
                d[G : 2 * G],                      # next's FIRST G owned rows
                axis_name, [(i, (i - 1) % n) for i in range(n)]
            )
            # wrap-around ghosts are not real neighbors: kill with inf
            top_from_prev = jnp.where(k == 0, INF, top_from_prev)
            bot_from_next = jnp.where(k == n - 1, INF, bot_from_next)
            d = jax.lax.dynamic_update_slice(d, top_from_prev, (0, 0, 0))
            d = jax.lax.dynamic_update_slice(
                d, bot_from_next, (G + Rs, 0, 0)
            )
            return d

        xdummy = jnp.full((RpL, 1, Cp), INF, jnp.float32)
        xdn_eff = xdn if has_x else xdummy
        xup_eff = xup if has_x else xdummy

        def one_round(d, dirty, force=False):
            # ghost updates need no dirty flags: a fresher ghost improves
            # the first owned row via the pass's own cross-imp carry, so the
            # row skip stays sound (the in-shard lateral fixed-point
            # invariant is untouched by the exchange)
            d = exchange(d)
            d, chg_dn, dirty = pb._directional_pass_pallas(
                d, down, af, ab, xdn_eff, l2f, l2b, wb,
                dirty, reverse=False, rb=rb, bb=bb,
                n_scan=n_scan_eff, n_scan2=n_scan2,
                atol=atol, rtol=rtol, interpret=interpret,
                skip=True, force=force, use_dirty=use_dirty,
                xlanes=splan.xlanes_down,
            )
            d, chg_up, dirty = pb._directional_pass_pallas(
                d, up, af, ab, xup_eff, l2f, l2b, wb,
                dirty, reverse=True, rb=rb, bb=bb,
                n_scan=n_scan_eff, n_scan2=n_scan2,
                atol=atol, rtol=rtol, interpret=interpret,
                skip=True, use_dirty=use_dirty, xlanes=splan.xlanes_up,
            )
            changed_l = chg_dn | chg_up
            if has_residual:
                flat_d = d.reshape(RpL * Cp, Bp)
                cand = flat_d[rsrc] + rw[:, None]
                old = flat_d[rdst]
                imp = cand * (1.0 + rtol) + atol < old          # [Rz, Bp]
                new = flat_d.at[rdst].min(cand)
                changed_l |= jnp.any(imp)
                d = new.reshape(RpL, Cp, Bp)
                if use_dirty:
                    impj = imp.reshape(-1, n_j, bb).any(axis=2).astype(
                        jnp.int32
                    )
                    dirty = dirty.at[:, res_rows_l].max(impj.T)
            if has_far:
                # far residuals: all-reduce-min the owned far-source values
                # into a globally fresh table, relax against it
                flat_d = d.reshape(RpL * Cp, Bp)
                vals = jnp.where(fown[:, None], flat_d[fsrc], INF)
                table = jax.lax.pmin(vals, axis_name)           # [Nf, Bp]
                cand = table[fidx] + fw[:, None]                # [Rzf, Bp]
                old = flat_d[fdst]
                imp = cand * (1.0 + rtol) + atol < old
                new = flat_d.at[fdst].min(cand)
                changed_l |= jnp.any(imp)
                d = new.reshape(RpL, Cp, Bp)
                if use_dirty:
                    impj = imp.reshape(-1, n_j, bb).any(axis=2).astype(
                        jnp.int32
                    )
                    dirty = dirty.at[:, far_rows_l].max(impj.T)
            changed = jax.lax.psum(changed_l.astype(jnp.int32), axis_name)
            return d, dirty, changed > 0

        def cond(carry):
            return carry[3] & (carry[2] < max_rounds)

        def loop(carry):
            d, dirty, it, _ = carry
            d, dirty, changed = one_round(d, dirty)
            return d, dirty, it + 1, changed

        d, dirty, chg0 = one_round(d, dirty0, force=True)
        d, _, rounds, changed = jax.lax.while_loop(
            cond, loop, (d, dirty, jnp.int32(1), chg0)
        )
        # return owned rows only
        return jax.lax.dynamic_slice(
            d, (G, 0, 0), (Rs, Cp, Bp)
        ), rounds, changed

    shard_ids = jnp.arange(n, dtype=jnp.int32)
    out, rounds, changed = shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(axis_name),) * 18,
        out_specs=(P(axis_name), P(), P()),
        check_vma=False,
    )(
        shard_ids, splan.down, splan.up, a_f, a_b,
        splan.l2_fwd, splan.l2_bwd, splan.wback,
        splan.xdown, splan.xup,
        splan.res_src, splan.res_dst, splan.res_w,
        splan.far_src, splan.far_own, splan.far_idx, splan.far_dst,
        splan.far_w,
    )
    # out: [n*Rs, Cp, Bp] global rows
    dist = out[: splan.n_rows, :C, :B].reshape(-1, B)[:V]
    return dist, rounds, ~changed
