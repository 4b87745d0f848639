"""Shift-based Sethian inflation solve for band-ordered meshes.

The inflation layer's wavefront (inflation_layer.cpp:341-491) is a geodesic
distance transform from the lethal set, bounded by the inflation radius —
at 1M vertices the face-gather eikonal solver (ops/eikonal.py) pays ~100 ms
of [F, 3] gathers per sweep for a wave that only ever travels a few edge
lengths. On a band-ordered mesh every triangle corner's two support vertices
sit at small (dr, dc) grid offsets, so the whole Sethian update becomes a
handful of dense 2D SHIFTS of the distance plane per "pattern"
(= (dr1, dc1, dr2, dc2) offset signature), evaluated with the same
vectorized `sethian_candidates` the gather solver uses — identical fixed
point, zero gathers on the dense path. Off-pattern corners go to a small
residual gather list, so any mesh is handled exactly.

Single field [R, Cp] (inflation is not batched over scenarios), Jacobi
label-correcting rounds: each round every pattern relaxes every vertex; the
wave advances >= one ring per round, so rounds ~ inflation_radius /
min_edge + slack. Typical cost at 1M: ~10 patterns x ~30 VPU flops x 1M =
sub-ms per round.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays, host_array
from mesh_navigation_tpu.ops import banded as _banded
from mesh_navigation_tpu.ops.eikonal import sethian_candidates

INF = jnp.inf


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=("pat_a", "pat_b", "pat_c", "res_v3", "res_v1", "res_v2",
                 "res_a", "res_b", "res_c", "invalid_plane"),
    meta_fields=("n_rows", "n_cols", "n_cols_pad", "num_vertices", "patterns",
                 "n_residual"),
)
@dataclasses.dataclass(frozen=True)
class SethianPlan:
    """Per-pattern triangle side-length planes on the padded [R, Cp] grid.

    Pattern p = (dr1, dc1, dr2, dc2): for free vertex v at (r, c), support
    vertices v1 at (r+dr1, c+dc1) and v2 at (r+dr2, c+dc2). Side lengths
    (a = |v2 v3|, b = |v1 v3|, c = |v1 v2| — inflation_layer.cpp:423-441
    edge naming) are +inf where the pattern has no face, so those slots
    never produce finite candidates."""
    n_rows: int
    n_cols: int
    n_cols_pad: int
    num_vertices: int
    patterns: tuple          # ((dr1, dc1, dr2, dc2), ...)
    n_residual: int
    pat_a: jax.Array         # [P, R, Cp] f32
    pat_b: jax.Array
    pat_c: jax.Array
    res_v3: jax.Array        # [Rz] i32 REAL ids (padded w/ 0, side inf)
    res_v1: jax.Array
    res_v2: jax.Array
    res_a: jax.Array         # [Rz] f32
    res_b: jax.Array
    res_c: jax.Array
    invalid_plane: jax.Array  # [R, Cp] bool — invalid vertices never update


# dense-pattern reach: _decompose bounds |dr| / |dc|, and the windowed
# solve's border-certificate widths and margin are DERIVED from these so the
# coupling can't silently break (see sethian_distances_banded)
MAX_DR = 2
MAX_DC = 4


def _decompose(off: int, n: int, col: np.ndarray):
    """Split id-offset `off` into (dr, dc) with the column staying in-band.
    Returns (dr, dc, valid_mask_per_row_position)."""
    best = None
    for dr in range(-MAX_DR, MAX_DR + 1):
        dc = off - dr * n
        if abs(dc) <= MAX_DC:
            ok = (col + dc >= 0) & (col + dc < n)
            if best is None or abs(dc) < abs(best[1]):
                best = (dr, dc, ok)
    return best


def build_sethian_plan(
    mesh: MeshArrays, *, n_cols: int = 0, min_hits_frac: float = 2e-4
) -> SethianPlan:
    """Host-side classification of every (face, free-corner) triple into
    dense shift patterns + residual list. Geometry only (edge_distances,
    inflation_layer.cpp:452) — reusable across all cost updates."""
    faces = host_array(mesh, "faces")
    face_edges = host_array(mesh, "face_edges")
    edist = host_array(mesh, "edge_dist")
    invalid = host_array(mesh, "invalid")
    V = mesh.num_vertices
    if n_cols <= 0:
        n_cols = _banded.infer_band_width(mesh)
    if n_cols <= 0:
        raise ValueError("mesh has no band structure")
    n = n_cols
    R = -(-V // n)
    Cp = -(-n // 8) * 8
    F = faces.shape[0]

    # corner-major tables: free corner k, supports k+1, k+2
    pats: dict = {}
    residual = []
    col_all = np.arange(V, dtype=np.int64) % n
    for k in range(3):
        v3 = faces[:, k]
        v1 = faces[:, (k + 1) % 3]
        v2 = faces[:, (k + 2) % 3]
        c_len = edist[face_edges[:, k]]
        b_len = edist[face_edges[:, (k + 2) % 3]]
        a_len = edist[face_edges[:, (k + 1) % 3]]
        o1 = (v1 - v3).astype(np.int64)
        o2 = (v2 - v3).astype(np.int64)
        col3 = col_all[v3]
        # vectorize by unique (o1, o2) pairs
        pair_key = o1 * (4 * V) + o2
        uniq, inv = np.unique(pair_key, return_inverse=True)
        for ui, key in enumerate(uniq):
            sel = np.nonzero(inv == ui)[0]
            off1 = int(uniq[ui]) // (4 * V)
            off2 = int(uniq[ui]) - off1 * (4 * V)
            if off2 > 2 * V:
                off1 += 1
                off2 -= 4 * V
            d1 = _decompose(off1, n, col3[sel])
            d2 = _decompose(off2, n, col3[sel])
            dense_ok = d1 is not None and d2 is not None
            if dense_ok:
                ok = d1[2] & d2[2]
                good = sel[ok]
                bad = sel[~ok]
            else:
                good = np.empty(0, np.int64)
                bad = sel
            if len(good) and len(good) >= max(8, int(min_hits_frac * F)):
                pk = (d1[0], d1[1], d2[0], d2[1])
                entry = pats.setdefault(pk, [])
                entry.append(
                    (v3[good], v1[good], v2[good],
                     a_len[good], b_len[good], c_len[good])
                )
            elif len(good):
                bad = sel
                good = np.empty(0, np.int64)
            if len(bad):
                residual.append(
                    (v3[bad], v1[bad], v2[bad], a_len[bad], b_len[bad], c_len[bad])
                )

    def plane_of(vids, vals):
        p = np.full(R * n, np.inf, np.float32)
        p[vids] = vals
        p = p.reshape(R, n)
        return np.pad(p, ((0, 0), (0, Cp - n)), constant_values=np.inf)

    pat_keys = sorted(pats.keys())
    pa, pb, pc = [], [], []
    for pk in pat_keys:
        cols = [np.concatenate([e[i] for e in pats[pk]]) for i in range(6)]
        vids = cols[0]
        # a vertex can be the free corner of two faces with the SAME offset
        # signature on irregular meshes; the dense plane holds one entry per
        # vertex, so duplicates fall back to the exact residual list
        _, first_idx = np.unique(vids, return_index=True)
        dup = np.ones(len(vids), bool)
        dup[first_idx] = False
        if dup.any():
            residual.append(tuple(col[dup] for col in cols))
        keep = ~dup
        pa.append(plane_of(vids[keep], cols[3][keep]))
        pb.append(plane_of(vids[keep], cols[4][keep]))
        pc.append(plane_of(vids[keep], cols[5][keep]))
    if not pat_keys:
        pat_keys = [(0, 0, 0, 0)]
        pa = pb = pc = [np.full((R, Cp), np.inf, np.float32)]

    if residual:
        rv3 = np.concatenate([r[0] for r in residual]).astype(np.int32)
        rv1 = np.concatenate([r[1] for r in residual]).astype(np.int32)
        rv2 = np.concatenate([r[2] for r in residual]).astype(np.int32)
        ra = np.concatenate([r[3] for r in residual]).astype(np.float32)
        rb = np.concatenate([r[4] for r in residual]).astype(np.float32)
        rc = np.concatenate([r[5] for r in residual]).astype(np.float32)
    else:
        rv3 = rv1 = rv2 = np.zeros(0, np.int32)
        ra = rb = rc = np.zeros(0, np.float32)
    n_res = len(rv3)
    Rz = max(8, -(-max(n_res, 1) // 8) * 8)
    pad = Rz - n_res
    rv3 = np.pad(rv3, (0, pad))
    rv1 = np.pad(rv1, (0, pad))
    rv2 = np.pad(rv2, (0, pad))
    ra = np.pad(ra, (0, pad), constant_values=np.inf)
    rb = np.pad(rb, (0, pad), constant_values=np.inf)
    rc = np.pad(rc, (0, pad), constant_values=np.inf)

    inv_plane = np.zeros(R * n, bool)
    inv_plane[:V] = invalid.astype(bool)
    inv_plane = np.pad(
        inv_plane.reshape(R, n), ((0, 0), (0, Cp - n)), constant_values=True
    )

    return SethianPlan(
        n_rows=R,
        n_cols=n,
        n_cols_pad=Cp,
        num_vertices=V,
        patterns=tuple(pat_keys),
        n_residual=n_res,
        pat_a=jnp.asarray(np.stack(pa)),
        pat_b=jnp.asarray(np.stack(pb)),
        pat_c=jnp.asarray(np.stack(pc)),
        res_v3=jnp.asarray(rv3),
        res_v1=jnp.asarray(rv1),
        res_v2=jnp.asarray(rv2),
        res_a=jnp.asarray(ra),
        res_b=jnp.asarray(rb),
        res_c=jnp.asarray(rc),
        invalid_plane=jnp.asarray(inv_plane),
    )


def _shift2j(x: jax.Array, dr: int, dc: int) -> jax.Array:
    """result[r, c] = x[r+dr, c+dc], +inf outside (jnp; static shifts)."""
    R, C = x.shape
    out = jnp.full_like(x, INF)
    rs = slice(max(dr, 0), R + min(dr, 0))
    rd = slice(max(-dr, 0), R + min(-dr, 0))
    cs = slice(max(dc, 0), C + min(dc, 0))
    cd = slice(max(-dc, 0), C + min(-dc, 0))
    return out.at[rd, cd].set(x[rs, cs])


@functools.partial(
    jax.jit, static_argnames=("max_rounds", "window")
)
def sethian_distances_banded(
    plan: SethianPlan,
    seed_dist: jax.Array,     # [V] f32, inf except seeds (0 at lethals)
    *,
    source_cap: float | jax.Array = jnp.inf,
    max_rounds: int = 64,
    atol: float = 1e-6,
    window: tuple[int, int] | None = None,
) -> jax.Array:
    """Label-correcting Jacobi rounds of the dense-pattern Sethian update —
    the same fixed point as ops/eikonal.eikonal_field(update="sethian",
    source_cap=...) (both are monotone relaxations of the identical
    candidate set). Returns dist [V].

    With `window=(wr, wc)` the rounds run on a static-shape sub-plane
    positioned (at runtime) around the seed bounding box — the live-replan
    fast path: a sensed obstacle's wave only ever travels inflation_radius,
    so full-field rounds waste >99% of the work at 1M vertices. EXACTNESS is
    certified, not assumed: the windowed result (extended by +inf) is
    accepted only if (1) the inner border band of the window (the dense
    patterns' maximal shift reach: 2 rows / 4 cols) stayed +inf, so no dense
    candidate can escape, and (2) no residual-list support vertex holds a
    finite label, so no residual candidate fires anywhere. Both conditions
    make the extended field a fixed point of the FULL relaxation agreeing
    with the seeds, which is unique (monotone min-system) — otherwise the
    solve falls back to full-plane rounds inside the same jit (lax.cond)."""
    R, C, Cp, V = plan.n_rows, plan.n_cols, plan.n_cols_pad, plan.num_vertices

    d0 = jnp.full(R * C, INF, jnp.float32).at[:V].set(seed_dist)
    d0 = jnp.pad(d0.reshape(R, C), ((0, 0), (0, Cp - C)), constant_values=INF)
    is_seed = jnp.isfinite(d0)
    has_res = plan.n_residual > 0

    def rounds(d_init, seed_mask, pa, pb, pc, invalid, res_flat=None):
        """Jacobi rounds over an arbitrary (full or windowed) plane."""
        def one_round(d):
            best = d
            for p, (dr1, dc1, dr2, dc2) in enumerate(plan.patterns):
                u1 = _shift2j(d, dr1, dc1)
                u2 = _shift2j(d, dr2, dc2)
                cand = sethian_candidates(u1, u2, pa[p], pb[p], pc[p]).value
                cand = jnp.where(
                    (u1 <= source_cap) & (u2 <= source_cap), cand, INF
                )
                best = jnp.minimum(best, cand)
            best = jnp.where(invalid | seed_mask, d, best)
            if res_flat is not None:
                flat = best.reshape(-1)
                u1 = flat[res_flat[0]]
                u2 = flat[res_flat[1]]
                cand = sethian_candidates(
                    u1, u2, plan.res_a, plan.res_b, plan.res_c
                ).value
                cand = jnp.where(
                    (u1 <= source_cap) & (u2 <= source_cap), cand, INF
                )
                tgt = res_flat[2]
                keep = ~(invalid.reshape(-1)[tgt] | seed_mask.reshape(-1)[tgt])
                cand = jnp.where(keep, cand, INF)
                flat = flat.at[tgt].min(cand)
                best = flat.reshape(d.shape)
            return best

        def cond(carry):
            d, it, changed = carry
            return changed & (it < max_rounds)

        def body(carry):
            d, it, _ = carry
            new = one_round(d)
            return new, it + 1, jnp.any(new + atol < d)

        d, _, _ = jax.lax.while_loop(
            cond, body, (d_init, jnp.int32(0), jnp.bool_(True))
        )
        return d

    pf = lambda v: (v // C) * Cp + v % C
    res_flat = (
        (pf(plan.res_v1), pf(plan.res_v2), pf(plan.res_v3))
        if has_res else None
    )

    def full_solve():
        return rounds(d0, is_seed, plan.pat_a, plan.pat_b, plan.pat_c,
                      plan.invalid_plane, res_flat)

    if window is None:
        d = full_solve()
        return d[:, :C].reshape(-1)[:V]

    wr, wc = min(window[0], R), min(window[1], Cp)

    # seed bounding box (runtime) -> static-shape window position
    rows_any = is_seed.any(axis=1)
    cols_any = is_seed.any(axis=0)
    idx_r = jnp.arange(R)
    idx_c = jnp.arange(Cp)
    rmin = jnp.min(jnp.where(rows_any, idx_r, R))
    rmax = jnp.max(jnp.where(rows_any, idx_r, -1))
    cmin = jnp.min(jnp.where(cols_any, idx_c, Cp))
    cmax = jnp.max(jnp.where(cols_any, idx_c, -1))
    has_seeds = jnp.any(rows_any)
    margin = 8  # room for the wave to grow before the border certificate
    # the border certificate's seed exclusion (fin & border & ~sw) is sound
    # only while the seed bbox sits >= the border widths away from the
    # window edges; margin enforces that, so it must dominate the pattern
    # reach the border bands are sized to
    assert margin >= max(MAX_DR, MAX_DC), (margin, MAX_DR, MAX_DC)
    fits = (
        has_seeds
        & (rmax - rmin + 1 + 2 * margin <= wr)
        & (cmax - cmin + 1 + 2 * margin <= wc)
    )
    r0 = jnp.clip((rmin + rmax + 1 - wr) // 2, 0, R - wr)
    c0 = jnp.clip((cmin + cmax + 1 - wc) // 2, 0, Cp - wc)

    def windowed_solve():
        dw0 = jax.lax.dynamic_slice(d0, (r0, c0), (wr, wc))
        sw = jax.lax.dynamic_slice(is_seed, (r0, c0), (wr, wc))
        invw = jax.lax.dynamic_slice(plan.invalid_plane, (r0, c0), (wr, wc))
        paw = jax.lax.dynamic_slice(plan.pat_a, (0, r0, c0),
                                    (plan.pat_a.shape[0], wr, wc))
        pbw = jax.lax.dynamic_slice(plan.pat_b, (0, r0, c0),
                                    (plan.pat_b.shape[0], wr, wc))
        pcw = jax.lax.dynamic_slice(plan.pat_c, (0, r0, c0),
                                    (plan.pat_c.shape[0], wr, wc))
        dw = rounds(dw0, sw, paw, pbw, pcw, invw, None)

        # escape certificates (see docstring)
        fin = jnp.isfinite(dw)
        rr = jnp.arange(wr)[:, None]
        cc = jnp.arange(wc)[None, :]
        # a band touching the PLANE edge borders +inf padding anyway, but
        # keeping the check there is harmless (seeds are excluded; a seed
        # hugging the map border stays on the full-solve path via `fits`)
        border = (
            (rr < MAX_DR) | (rr >= wr - MAX_DR)
            | (cc < MAX_DC) | (cc >= wc - MAX_DC)
        )
        dense_clean = ~jnp.any(fin & border & ~sw)
        if has_res:
            def in_win_val(ids_flat):
                rws = ids_flat // Cp - r0
                cws = ids_flat % Cp - c0
                inside = (rws >= 0) & (rws < wr) & (cws >= 0) & (cws < wc)
                v = dw[jnp.clip(rws, 0, wr - 1), jnp.clip(cws, 0, wc - 1)]
                return jnp.where(inside, v, INF)
            pad_ok = jnp.isfinite(plan.res_a)  # padded rows have inf sides
            res_clean = ~jnp.any(
                (jnp.isfinite(in_win_val(res_flat[0]))
                 | jnp.isfinite(in_win_val(res_flat[1]))) & pad_ok
            )
        else:
            res_clean = jnp.bool_(True)

        def accept():
            return jax.lax.dynamic_update_slice(
                jnp.full((R, Cp), INF, jnp.float32), dw, (r0, c0)
            )
        return jax.lax.cond(dense_clean & res_clean, accept, full_solve)

    d = jax.lax.cond(fits, windowed_solve, full_solve)
    return d[:, :C].reshape(-1)[:V]
