"""Sharded banded GS solver: the PRODUCTION kernel over a device mesh.

parallel/partition.py shards the D-slot gather solver — the tier the
single-chip path left behind two rounds ago. This module shards the banded
Pallas kernel itself (ops/pallas_banded.py): rows are cut into contiguous
RANGE shards (one per device), each device runs the unmodified directional
pass over its rows plus one GHOST row on each side, and per round the two
boundary rows travel by `jax.lax.ppermute` neighbor shifts (O(Cp * B) per
device per round — the dcn_plan's design). Convergence is a global `psum`
of the change flag.

Round semantics: within a round each shard is Gauss-Seidel over its own
rows (the carried-row machinery, untouched) and block-Jacobi across shard
boundaries (ghosts hold the neighbor's PRE-round boundary rows), so a
wavefront crosses one cut per round — rounds grow by the number of shard
boundaries an optimal path crosses, everything else is unchanged. The fixed
point is the same monotone Dijkstra fixed point (ghost rows only ever carry
true label values; every relaxation is a real path cost).

Scope: residual-free, extended-lane-free plans (clean band meshes — the
headline class). SURVEY.md §2.3 halo-exchange requirement on the production
kernel; replaces lvr2::Meap at multi-host scale (configs[4]).
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


class ShardedBandedPlan(NamedTuple):
    """Per-shard plane stacks (leading axis = shard). Each shard owns rows
    [k*Rs, (k+1)*Rs) plus one ghost row on each side; plane rows cover the
    ghost rows too (a ghost row is a real destination during the pass — its
    writes are discarded at the next exchange, but its PLANES must be real
    so its relaxations stay valid path costs)."""
    down: jax.Array      # [n, Rs+2+pad, 3, Cp]
    up: jax.Array
    a_fwd: jax.Array     # [n, Rs+2+pad, S, Cp]
    a_bwd: jax.Array
    l2_fwd: jax.Array    # [n, Rs+2+pad, S2, NBp] (dummy when n_scan2 == 0)
    l2_bwd: jax.Array
    wback: jax.Array     # [n, Rs+2+pad, 2, Cp]
    n_shards: int
    rows_per_shard: int  # Rs (owned)
    rp_local: int        # padded local rows (Rs + 2 ghosts, rb multiple)
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
    """Host-side: stack per-shard plane slices with 1-row ghost overlap."""
    if plan.n_residual:
        raise ValueError("sharded banded solve requires n_residual == 0")
    if plan.xlanes_down or plan.xlanes_up:
        raise ValueError("sharded banded solve requires no extended lanes")
    R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
    Rs = -(-R // n_shards)
    if interpret:
        rb, bb = 2, 8
    else:
        rb, bb = pb._pick_blocks(Cp)
    rp_local = -(-(Rs + 2) // rb) * rb

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
        """[R, ...] -> [n, rp_local, ...]: rows k*Rs-1 .. k*Rs+Rs (ghosts),
        inf-padded outside [0, R)."""
        pp = jnp.pad(
            p, [(1, rp_local)] + [(0, 0)] * (p.ndim - 1), constant_values=INF
        )
        return jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(pp, k * Rs, rp_local, 0)
                for k in range(n_shards)
            ]
        )

    return ShardedBandedPlan(
        down=shard_rows(plan.down),
        up=shard_rows(plan.up),
        a_fwd=shard_rows(plan.a_fwd),
        a_bwd=shard_rows(plan.a_bwd),
        l2_fwd=shard_rows(l2f_full),
        l2_bwd=shard_rows(l2b_full),
        wback=shard_rows(wb_full),
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
    The per-device body is the unmodified `_directional_pass_pallas`; the
    only cross-device traffic is two boundary rows per round (`ppermute`)
    plus the `psum` convergence bit.
    """
    n, Rs, RpL = splan.n_shards, splan.rows_per_shard, splan.rp_local
    C, Cp, V = splan.n_cols, splan.n_cols_pad, splan.num_vertices
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

    # seed field per shard: local row = global_row - k*Rs + 1 (ghost offset)
    rows_g = seeds // C
    cols_g = seeds % C

    def body(shard_id, down, up, af, ab, l2f, l2b, wb):
        # shard_map keeps the sharded leading axis as size-1: drop it
        down, up, af, ab = down[0], up[0], af[0], ab[0]
        l2f, l2b, wb = l2f[0], l2b[0], wb[0]
        # shard-local seeded field [RpL, Cp, Bp]
        k = shard_id[0]
        local_row = rows_g - k * Rs + 1
        own = (local_row >= 1) & (local_row <= Rs)
        flat = jnp.where(own, local_row * Cp + cols_g, 0)
        d0 = jnp.full((RpL * Cp, Bp), INF, jnp.float32)
        d0 = d0.at[flat, jnp.arange(B)].min(jnp.where(own, 0.0, INF))
        d = d0.reshape(RpL, Cp, Bp)
        dirty0 = jnp.zeros((1, 1), jnp.int32)

        def exchange(d):
            # ghost refresh: row 1..Rs are owned; ghosts at 0 and Rs+1
            top_from_prev = jax.lax.ppermute(
                d[Rs], axis_name, [(i, (i + 1) % n) for i in range(n)]
            )
            bot_from_next = jax.lax.ppermute(
                d[1], axis_name, [(i, (i - 1) % n) for i in range(n)]
            )
            # wrap-around ghosts are not real neighbors: kill with inf
            top_from_prev = jnp.where(k == 0, INF, top_from_prev)
            bot_from_next = jnp.where(k == n - 1, INF, bot_from_next)
            d = d.at[0].set(top_from_prev)
            d = d.at[Rs + 1].set(bot_from_next)
            return d

        xdummy = jnp.full((RpL, 1, Cp), INF, jnp.float32)

        def one_round(d, force=False):
            # ghost updates need no dirty flags: a fresher ghost improves
            # row 1 via the pass's own cross-imp carry, so the row skip
            # stays sound (the in-shard lateral fixed-point invariant is
            # untouched by the exchange)
            d = exchange(d)
            d, chg_dn, _ = pb._directional_pass_pallas(
                d, down, af, ab, xdummy, l2f, l2b, wb,
                dirty0, reverse=False, rb=rb, bb=bb,
                n_scan=n_scan_eff, n_scan2=n_scan2,
                atol=atol, rtol=rtol, interpret=interpret,
                skip=True, force=force, use_dirty=False, xlanes=(),
            )
            d, chg_up, _ = pb._directional_pass_pallas(
                d, up, af, ab, xdummy, l2f, l2b, wb,
                dirty0, reverse=True, rb=rb, bb=bb,
                n_scan=n_scan_eff, n_scan2=n_scan2,
                atol=atol, rtol=rtol, interpret=interpret,
                skip=True, force=force, use_dirty=False, xlanes=(),
            )
            changed = jax.lax.psum(
                (chg_dn | chg_up).astype(jnp.int32), axis_name
            )
            return d, changed > 0

        def cond(carry):
            return carry[2] & (carry[1] < max_rounds)

        def loop(carry):
            d, it, _ = carry
            d, changed = one_round(d)
            return d, it + 1, changed

        d, chg0 = one_round(d, force=True)
        d, rounds, changed = jax.lax.while_loop(
            cond, loop, (d, jnp.int32(1), chg0)
        )
        # return owned rows only
        return d[1 : Rs + 1], rounds, changed

    shard_ids = jnp.arange(n, dtype=jnp.int32)
    out, rounds, changed = shard_map(
        body,
        mesh=device_mesh,
        in_specs=(P(axis_name),) * 8,
        out_specs=(P(axis_name), P(), P()),
        check_vma=False,
    )(
        shard_ids, splan.down, splan.up, a_f, a_b,
        splan.l2_fwd, splan.l2_bwd, splan.wback,
    )
    # out: [n*Rs, Cp, Bp] global rows
    dist = out[: splan.n_rows, :C, :B].reshape(-1, B)[:V]
    return dist, rounds, ~changed
