"""Face-parallel eikonal / wavefront sweeps (CVP + inflation kernels).

The reference advances a fast-marching wavefront over triangle interiors with
an addressable min-heap, applying one of two triangle update rules:

- the CVP geometric *unfolding* update (cvp_mesh_planner.cpp:369-556): embed
  the virtual source S and the free vertex in the triangle plane from the two
  known distances and the three side lengths, take the straight-line distance,
  with obtuse-corner fallbacks `u1 + b` / `u2 + a`, recording the predecessor
  and the rotation angle θ of the optimal direction;
- the Sethian quadratic update (inflation_layer.cpp:181-234) used by the
  geodesic inflation layer.

Here every (face, corner) pair computes its candidate *simultaneously* and
each vertex takes the min over its incident (face, corner) candidates — a
pure gather/row-min pipeline (fast-iterative-method), iterated to the same
fixed point. No scatter, no heap, deterministic tie-breaks (lowest slot).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh.arrays import MeshArrays

INF = jnp.inf
_EPS = 1e-12


def _face_corner_tables(mesh: MeshArrays):
    """Per-(face, corner k) views: free vertex v3 = faces[:, k] and its
    supporting vertices v1 = faces[:, k+1], v2 = faces[:, k+2] (the C++ update
    argument order at cvp_mesh_planner.cpp:814-876), plus side lengths indices:
    c = |v1 v2| (edge opposite k), b = |v1 v3|, a = |v2 v3|.
    """
    f = mesh.faces
    e = mesh.face_edges
    v3 = f                                       # [F, 3] corner k
    v1 = jnp.roll(f, -1, axis=1)                 # corner k+1
    v2 = jnp.roll(f, -2, axis=1)                 # corner k+2
    ec = e                                       # edge opposite k   = (v1, v2)
    eb = jnp.roll(e, -2, axis=1)                 # edge opposite k+2 = (v1, v3)
    ea = jnp.roll(e, -1, axis=1)                 # edge opposite k+1 = (v2, v3)
    return v1, v2, v3, ea, eb, ec


class TriangleCandidates(NamedTuple):
    """Per-(face, corner) update proposal for the corner's free vertex."""
    value: jax.Array       # [F, 3] f32 candidate distance (inf = no update)
    pred_is_v1: jax.Array  # [F, 3] bool which supporting vertex is predecessor
    theta: jax.Array       # [F, 3] f32 rotation angle of optimal direction


def unfolding_candidates(
    u1: jax.Array, u2: jax.Array,
    a: jax.Array, b: jax.Array, c: jax.Array,
) -> TriangleCandidates:
    """CVP geometric-unfolding triangle update, vectorized.

    Parity with CVPMeshPlanner::waveFrontUpdate (cvp_mesh_planner.cpp:369-556)
    evaluated in f64 like the C++ (which computes in double): planar
    coordinates of the virtual source S = (sx, sy) and of the free vertex
    (p, hc); u3 = |S - v3|; obtuse-angle corner fallbacks; θ bookkeeping.
    Infinite u1/u2 yield an infinite candidate (the sequential algorithm only
    fires faces whose two supporting vertices are fixed).
    """
    f8 = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    u1, u2, a, b, c = (x.astype(f8) for x in (u1, u2, a, b, c))
    both_finite = jnp.isfinite(u1) & jnp.isfinite(u2)
    u1s = jnp.where(both_finite, u1, 0.0)  # guarded values for NaN-free math
    u2s = jnp.where(both_finite, u2, 0.0)

    c_safe = jnp.maximum(c, _EPS)
    sx = (c * c + u1s * u1s - u2s * u2s) / (2.0 * c_safe)
    sy = -jnp.sqrt(jnp.maximum(u1s * u1s - sx * sx, 0.0))
    p = (b * b + c * c - a * a) / (2.0 * c_safe)
    hc = jnp.sqrt(jnp.maximum(b * b - p * p, 0.0))
    dx = p - sx
    dy = hc - sy
    u3_sq = dx * dx + dy * dy
    u3 = jnp.sqrt(u3_sq)

    u3_safe = jnp.maximum(u3, _EPS)
    t0a = (a * a + b * b - c * c) / jnp.maximum(2.0 * a * b, _EPS)
    t1a = (u3_sq + b * b - u1s * u1s) / (2.0 * u3_safe * jnp.maximum(b, _EPS))
    t2a = (a * a + u3_sq - u2s * u2s) / (2.0 * jnp.maximum(a, _EPS) * u3_safe)

    theta0 = jnp.arccos(jnp.clip(t0a, -1.0, 1.0))
    theta1 = jnp.arccos(jnp.clip(t1a, -1.0, 1.0))
    theta2 = jnp.arccos(jnp.clip(t2a, -1.0, 1.0))

    fb1 = u1 + b    # fallback via vertex v1 (cvp_mesh_planner.cpp:419-436)
    fb2 = u2 + a    # fallback via vertex v2 (cvp_mesh_planner.cpp:438-455)

    corner1 = jnp.abs(t1a) > 1.0
    corner2 = jnp.abs(t2a) > 1.0
    interior_ok = (theta1 < theta0) & (theta2 < theta0)
    prefer_v1 = theta1 < theta2

    # Decision cascade, in the C++ order:
    value = jnp.where(
        corner1, fb1,
        jnp.where(
            corner2, fb2,
            jnp.where(interior_ok, u3, jnp.where(prefer_v1, fb1, fb2)),
        ),
    )
    pred_is_v1 = jnp.where(
        corner1, True,
        jnp.where(corner2, False, jnp.where(interior_ok, prefer_v1, prefer_v1)),
    )
    theta = jnp.where(
        ~corner1 & ~corner2 & interior_ok,
        jnp.where(prefer_v1, theta1, -theta2),
        0.0,
    )
    value = jnp.where(both_finite & jnp.isfinite(value), value, INF)
    return TriangleCandidates(
        value=value.astype(jnp.float32),
        pred_is_v1=pred_is_v1,
        theta=theta.astype(jnp.float32),
    )


def sethian_candidates(
    u1: jax.Array, u2: jax.Array,
    a: jax.Array, b: jax.Array, c: jax.Array,
    speed: float = 1.0,
) -> TriangleCandidates:
    """Sethian quadratic triangle update, vectorized.

    Parity with InflationLayer::computeUpdateSethianMethod
    (inflation_layer.cpp:181-234) including its branch structure: solve
    f2·t² + 2·f1·t + f0 = 0 for the arrival time at the free vertex, check the
    monotonicity window, else fall back to edge relaxation
    `min(b·F + u1, a·F + u2)`.
    """
    eps = 1e-7  # mesh_layers::EPSILON analog for the |f2| guard
    both_finite = jnp.isfinite(u1) & jnp.isfinite(u2)
    u1s = jnp.where(both_finite, u1, 0.0)
    u2s = jnp.where(both_finite, u2, 0.0)
    F = speed

    dot = (a * a + b * b - c * c) / jnp.maximum(2.0 * a * b, _EPS)
    dot = jnp.clip(dot, -1.0, 1.0)
    r_cos = dot
    r_sin = jnp.sqrt(jnp.maximum(1.0 - dot * dot, 0.0))

    u = u2s - u1s
    f2 = a * a + b * b - 2.0 * a * b * r_cos
    f1 = b * u * (a * r_cos - b)
    f0 = b * b * (u * u - F * F * a * a * r_sin * r_sin)
    delta = f1 * f1 - f0 * f2

    sqrt_delta = jnp.sqrt(jnp.maximum(delta, 0.0))
    f2_safe = jnp.where(jnp.abs(f2) > eps, f2, 1.0)
    t_minus = (-f1 - sqrt_delta) / f2_safe
    t_plus = (-f1 + sqrt_delta) / f2_safe
    t_ratio = jnp.where(jnp.abs(f1) > _EPS, -f0 / jnp.where(jnp.abs(f1) > _EPS, f1, 1.0), -INF)

    t = t_minus
    t_div = jnp.maximum(jnp.abs(t), _EPS) * jnp.sign(jnp.where(t == 0, 1.0, t))
    retry = (t < u) | (b * (t - u) / t_div < a * r_cos) | (a / jnp.where(jnp.abs(r_cos) > _EPS, r_cos, _EPS) < b * (t - u) / 2.0)
    t = jnp.where(retry, t_plus, t_ratio)
    t = jnp.where(jnp.abs(f2) > eps, t, INF)
    t = jnp.where(delta >= 0.0, t, -INF)

    t_div = jnp.where(jnp.abs(t) > _EPS, t, _EPS)
    window = (
        (u < t)
        & (a * r_cos < b * (t - u) / t_div)
        & (b * (t - u) / t_div < a / jnp.where(jnp.abs(r_cos) > _EPS, r_cos, _EPS))
    )
    interior = t + u1s
    fallback = jnp.minimum(b * F + u1s, a * F + u2s)
    value = jnp.where(window & jnp.isfinite(interior), interior, fallback)
    pred_is_v1 = jnp.where(window, True, b * F + u1s <= a * F + u2s)
    value = jnp.where(both_finite & jnp.isfinite(value), value, INF)
    return TriangleCandidates(
        value=value.astype(jnp.float32),
        pred_is_v1=pred_is_v1,
        theta=jnp.zeros_like(value, dtype=jnp.float32),
    )


def fmm_candidates(
    u1: jax.Array, u2: jax.Array,
    a: jax.Array, b: jax.Array, c: jax.Array,
) -> TriangleCandidates:
    """Textbook FMM quadratic update — the reference's USE_UPDATE_FMM
    variant (CVPMeshPlanner::waveFrontUpdateFMM, cvp_mesh_planner.cpp:
    559-649): order the supporting vertices so u1 <= u2, solve
    k0·t² + k1·t + k2 = 0, check the monotonicity window (a·cosθ < e < a/cosθ
    with e = b(t-Δu)/t), else fall back to the cheaper of u1+b / u2+a.
    θ bookkeeping follows the same θ+φ-π/2 formula."""
    both_finite = jnp.isfinite(u1) & jnp.isfinite(u2)
    # swap so the first supporting vertex has the smaller distance; remember
    # the swap for predecessor attribution (and side lengths follow: if
    # swapped, b' = a, a' = b)
    swap = u2 < u1
    lo = jnp.where(swap, u2, u1)
    hi = jnp.where(swap, u1, u2)
    b_eff = jnp.where(swap, a, b)
    a_eff = jnp.where(swap, b, a)
    lo_s = jnp.where(both_finite, lo, 0.0)
    hi_s = jnp.where(both_finite, hi, 0.0)

    du = hi_s - lo_s
    cos_t = (a_eff * a_eff + b_eff * b_eff - c * c) / jnp.maximum(
        2.0 * a_eff * b_eff, _EPS
    )
    cos_t = jnp.clip(cos_t, -1.0, 1.0)
    k0 = a_eff * a_eff + b_eff * b_eff - 2.0 * a_eff * b_eff * cos_t
    k1 = 2.0 * b_eff * du * (a_eff * cos_t - b_eff)
    k2 = b_eff * b_eff * (du * du - a_eff * a_eff * (1.0 - cos_t * cos_t))
    r = k1 * k1 - 4.0 * k0 * k2
    k0_safe = jnp.where(jnp.abs(k0) > _EPS, k0, _EPS)
    t = jnp.where(
        r < 0.0, -k1 / (2.0 * k0_safe), (-k1 + jnp.sqrt(jnp.maximum(r, 0.0))) / (2.0 * k0_safe)
    )
    t_safe = jnp.where(jnp.abs(t) > _EPS, t, _EPS)
    e = b_eff * (t - du) / t_safe
    cos_safe = jnp.where(jnp.abs(cos_t) > _EPS, cos_t, _EPS)
    window = (du < t) & (e < a_eff / cos_safe) & (e > a_eff * cos_t)

    interior = lo_s + t
    fb_lo = lo_s + b_eff
    fb_hi = hi_s + a_eff
    fb = jnp.minimum(fb_lo, fb_hi)
    value = jnp.where(window & jnp.isfinite(interior), interior, fb)
    pred_is_lo = jnp.where(window, True, fb_lo <= fb_hi)
    # attribute back through the swap: predecessor "v1" means the original v1
    pred_is_v1 = jnp.where(swap, ~pred_is_lo, pred_is_lo)

    theta_ang = jnp.arccos(cos_t)
    phi_denom = jnp.sqrt(
        jnp.maximum(a_eff * a_eff * e * e - 2.0 * a_eff * cos_t, _EPS)
    )
    phi = jnp.arcsin(jnp.clip(e * jnp.sin(theta_ang) / phi_denom, -1.0, 1.0))
    theta = jnp.where(window, theta_ang + phi - jnp.pi / 2.0, 0.0)

    value = jnp.where(both_finite & jnp.isfinite(value), value, INF)
    return TriangleCandidates(
        value=value.astype(jnp.float32),
        pred_is_v1=pred_is_v1,
        theta=theta.astype(jnp.float32),
    )


def with_s_candidates(
    u1: jax.Array, u2: jax.Array,
    a: jax.Array, b: jax.Array, c: jax.Array,
) -> TriangleCandidates:
    """Unfolding update with explicit Heron-area terms — the reference's
    USE_UPDATE_WITH_S variant (CVPMeshPlanner::waveFrontUpdateWithS,
    cvp_mesh_planner.cpp:249-367): areas A (source triangle) and B (face)
    give sy = -A/2c, hc = B/2c; acceptance is by the sign of the
    S = sy·p - sx·hc (resp. the v2-sided analog) orientation test plus a
    |cos| <= 1 angle check, else the edge fallback through the *nearer*
    supporting vertex."""
    both_finite = jnp.isfinite(u1) & jnp.isfinite(u2)
    u1s = jnp.where(both_finite, u1, 0.0)
    u2s = jnp.where(both_finite, u2, 0.0)

    c_safe = jnp.maximum(c, _EPS)
    heron_a = jnp.sqrt(jnp.maximum(
        (-u1s + u2s + c) * (u1s - u2s + c) * (u1s + u2s - c) * (u1s + u2s + c), 0.0
    ))
    heron_b = jnp.sqrt(jnp.maximum(
        (-a + b + c) * (a - b + c) * (a + b - c) * (a + b + c), 0.0
    ))
    sx = (c * c + u1s * u1s - u2s * u2s) / (2.0 * c_safe)
    sy = -heron_a / (2.0 * c_safe)
    p = (-a * a + b * b + c * c) / (2.0 * c_safe)
    hc = heron_b / (2.0 * c_safe)
    dx = p - sx
    dy = hc - sy
    u3_sq = dx * dx + dy * dy
    u3 = jnp.sqrt(u3_sq)
    u3_safe = jnp.maximum(u3, _EPS)

    v1_nearer = u1s < u2s
    s1 = sy * p - sx * hc
    s2 = sx * hc - hc * c + sy * c - sy * p
    t1cos = (u3_sq + b * b - u1s * u1s) / (2.0 * u3_safe * jnp.maximum(b, _EPS))
    t2cos = (a * a + u3_sq - u2s * u2s) / (2.0 * jnp.maximum(a, _EPS) * u3_safe)

    ok1 = (s1 <= 0.0) & (jnp.abs(t1cos) <= 1.0)
    ok2 = (s2 <= 0.0) & (jnp.abs(t2cos) <= 1.0)
    accept_interior = jnp.where(v1_nearer, ok1, ok2)
    fb = jnp.where(v1_nearer, u1s + b, u2s + a)
    value = jnp.where(accept_interior, u3, fb)
    pred_is_v1 = v1_nearer
    theta = jnp.where(
        accept_interior,
        jnp.where(
            v1_nearer,
            jnp.arccos(jnp.clip(t1cos, -1.0, 1.0)),
            -jnp.arccos(jnp.clip(t2cos, -1.0, 1.0)),
        ),
        0.0,
    )
    value = jnp.where(both_finite & jnp.isfinite(value), value, INF)
    return TriangleCandidates(
        value=value.astype(jnp.float32),
        pred_is_v1=pred_is_v1,
        theta=theta.astype(jnp.float32),
    )


_UPDATE_FNS = {
    "unfolding": unfolding_candidates,
    "sethian": sethian_candidates,
    "fmm": fmm_candidates,
    "with_s": with_s_candidates,
}


class EikonalResult(NamedTuple):
    dist: jax.Array           # [V] f32 potential
    pred: jax.Array           # [V] i32 predecessor vertex (self = none)
    theta: jax.Array          # [V] f32 direction rotation angle (CVP)
    cutting_face: jax.Array   # [V] i32 face of the winning update (-1 = none)
    sweeps: jax.Array
    converged: jax.Array


def eikonal_field(
    mesh: MeshArrays,
    side_lengths: jax.Array,
    seed_dist: jax.Array,
    *,
    update: str = "unfolding",
    target_mask: jax.Array | None = None,
    source_cap: float | jax.Array = jnp.inf,
    max_sweeps: int = 0,
    block_sweeps: int = 8,
) -> EikonalResult:
    """Fast-iterative eikonal solve over triangle interiors.

    Args:
      side_lengths: [E] per-edge metric (CVP: cost-weighted edge weights,
        cvp_mesh_planner.cpp:746; inflation: raw edge distances,
        inflation_layer.cpp:452).
      seed_dist: [V] initial distances — inf everywhere except seeds
        (goal-face vertices at their Euclidean distance for CVP,
        cvp_mesh_planner.cpp:716-728; lethal vertices at 0 for inflation).
        Seeds are clamped every sweep (the sequential algorithm marks them
        fixed immediately).
      update: "unfolding" (CVP default) or "sethian" (inflation).
      target_mask: [V] bool — vertices allowed to receive updates. Encodes
        the cost-limit skip on free vertices (cvp_mesh_planner.cpp:802-851)
        and the invalid-vertex skip.
      source_cap: suppress updates whose supporting distances exceed this
        (inflation bounds the wave to the inflation radius via its return
        value gating queue insertion, inflation_layer.cpp:310-312).
    """
    V = mesh.num_vertices
    if max_sweeps <= 0:
        max_sweeps = 4 * V
    n_blocks = -(-max_sweeps // block_sweeps)

    v1t, v2t, v3t, ea, eb, ec = _face_corner_tables(mesh)
    a_len = side_lengths[ea]
    b_len = side_lengths[eb]
    c_len = side_lengths[ec]
    cand_fn = _UPDATE_FNS[update]

    vidx = jnp.arange(V, dtype=jnp.int32)
    is_seed = jnp.isfinite(seed_dist)
    if target_mask is None:
        target_mask = ~mesh.invalid
    else:
        target_mask = target_mask & ~mesh.invalid

    vf = mesh.vertex_faces           # [V, FD]
    vc = mesh.vertex_face_corner     # [V, FD]
    vf_mask = mesh.vertex_faces_mask

    def one_sweep(carry):
        dist, pred, theta, cface = carry
        u1 = dist[v1t]
        u2 = dist[v2t]
        cands = cand_fn(u1, u2, a_len, b_len, c_len)
        value = cands.value
        # bound the wave (inflation): sources beyond the cap don't propagate
        value = jnp.where((u1 <= source_cap) & (u2 <= source_cap), value, INF)
        # gather per-vertex incident candidates
        cand_v = jnp.where(vf_mask, value[vf, vc], INF)          # [V, FD]
        best = jnp.min(cand_v, axis=1)
        arg = jnp.argmin(cand_v, axis=1)
        win_f = vf[vidx, arg]
        win_c = vc[vidx, arg]
        improved = (best < dist) & target_mask & ~is_seed
        new_dist = jnp.where(improved, best, dist)
        win_pred = jnp.where(cands.pred_is_v1[win_f, win_c], v1t[win_f, win_c], v2t[win_f, win_c])
        new_pred = jnp.where(improved, win_pred, pred)
        new_theta = jnp.where(improved, cands.theta[win_f, win_c], theta)
        new_cface = jnp.where(improved, win_f, cface)
        # clamp seeds (fixed from the start)
        new_dist = jnp.where(is_seed, seed_dist, new_dist)
        return new_dist, new_pred, new_theta, new_cface

    dist0 = jnp.where(is_seed, seed_dist, INF).astype(jnp.float32)
    pred0 = vidx
    theta0 = jnp.zeros(V, jnp.float32)
    cface0 = jnp.full(V, -1, jnp.int32)

    def blockf(carry):
        dist, pred, theta, cface, it, _ = carry
        new = jax.lax.fori_loop(
            0, block_sweeps, lambda _, c: one_sweep(c), (dist, pred, theta, cface)
        )
        changed = jnp.any(new[0] < dist)
        return (*new, it + block_sweeps, changed)

    def cond(carry):
        return carry[5] & (carry[4] < n_blocks * block_sweeps)

    dist, pred, theta, cface, sweeps, changed = jax.lax.while_loop(
        cond, blockf, (dist0, pred0, theta0, cface0, jnp.int32(0), jnp.bool_(True))
    )
    return EikonalResult(
        dist=dist, pred=pred, theta=theta, cutting_face=cface,
        sweeps=sweeps, converged=~changed,
    )


class BatchedEikonalResult(NamedTuple):
    dist: jax.Array           # [B, V]
    pred: jax.Array           # [B, V]
    theta: jax.Array          # [B, V]
    cutting_face: jax.Array   # [B, V]
    sweeps: jax.Array
    converged: jax.Array


def batched_eikonal_field(
    mesh: MeshArrays,
    side_lengths: jax.Array,     # [E]
    seed_dist: jax.Array,        # [B, V] — inf except seeds
    *,
    update: str = "unfolding",
    target_mask: jax.Array | None = None,   # [V]
    source_cap: float | jax.Array = jnp.inf,
    max_sweeps: int = 0,
    block_sweeps: int = 16,
) -> BatchedEikonalResult:
    """Batch-of-scenarios eikonal solve in [V, B] layout: one while_loop for
    the whole batch (shared convergence), batch riding the 128-lane minor
    axis — the CVP analog of ordered.batched_field_hybrid. Same per-triangle
    update math and masks as `eikonal_field`; pred/θ/cutting-face recovered
    by one candidate pass against the converged field."""
    V = mesh.num_vertices
    B = seed_dist.shape[0]
    if max_sweeps <= 0:
        max_sweeps = 4 * V
    n_blocks = -(-max_sweeps // block_sweeps)

    v1t, v2t, v3t, ea, eb, ec = _face_corner_tables(mesh)
    a_len = side_lengths[ea][..., None]      # [F, 3, 1]
    b_len = side_lengths[eb][..., None]
    c_len = side_lengths[ec][..., None]
    cand_fn = _UPDATE_FNS[update]

    if target_mask is None:
        target_mask = ~mesh.invalid
    else:
        target_mask = target_mask & ~mesh.invalid

    vf, vc, vf_mask = mesh.vertex_faces, mesh.vertex_face_corner, mesh.vertex_faces_mask
    seed_vb = seed_dist.T                    # [V, B]
    is_seed = jnp.isfinite(seed_vb)
    dist0 = jnp.where(is_seed, seed_vb, INF).astype(jnp.float32)

    def candidate_values(dist_vb):
        u1 = dist_vb[v1t]                    # [F, 3, B]
        u2 = dist_vb[v2t]
        cands = cand_fn(u1, u2, a_len, b_len, c_len)
        value = jnp.where((u1 <= source_cap) & (u2 <= source_cap), cands.value, INF)
        return value, cands

    def one_sweep(dist_vb):
        value, _ = candidate_values(dist_vb)
        cand_v = jnp.where(vf_mask[..., None], value[vf, vc], INF)   # [V, FD, B]
        best = jnp.min(cand_v, axis=1)                               # [V, B]
        best = jnp.where(target_mask[:, None], best, INF)
        new = jnp.minimum(dist_vb, best)
        return jnp.where(is_seed, seed_vb, new)

    def block(carry):
        d, it, _ = carry
        new = jax.lax.fori_loop(0, block_sweeps, lambda _, x: one_sweep(x), d)
        return new, it + block_sweeps, jnp.any(new < d)

    def cond(carry):
        return carry[2] & (carry[1] < n_blocks * block_sweeps)

    dist_vb, sweeps_done, changed = jax.lax.while_loop(
        cond, block, (one_sweep(dist0), jnp.int32(1), jnp.bool_(True))
    )

    # winner recovery against the converged field
    value, cands = candidate_values(dist_vb)
    cand_v = jnp.where(vf_mask[..., None], value[vf, vc], INF)       # [V, FD, B]
    arg = jnp.argmin(cand_v, axis=1)                                 # [V, B]
    best = jnp.min(cand_v, axis=1)
    vidx = jnp.arange(V, dtype=jnp.int32)
    win_f = vf[vidx[:, None], arg]                                   # [V, B]
    win_c = vc[vidx[:, None], arg]
    has = (best <= dist_vb + 1e-6) & jnp.isfinite(dist_vb) & ~is_seed
    bidx = jnp.arange(B)[None, :]
    win_pred = jnp.where(
        cands.pred_is_v1[win_f, win_c, bidx], v1t[win_f, win_c], v2t[win_f, win_c]
    )
    pred = jnp.where(has, win_pred, vidx[:, None])
    theta = jnp.where(has, cands.theta[win_f, win_c, bidx], 0.0)
    cface = jnp.where(has, win_f, -1)
    return BatchedEikonalResult(
        dist=dist_vb.T, pred=pred.T, theta=theta.T, cutting_face=cface.T,
        sweeps=sweeps_done, converged=~changed,
    )


def cvp_vector_map(mesh: MeshArrays, result: EikonalResult) -> jax.Array:
    """Per-vertex direction field: (pos[pred] - pos[v]) rotated by θ around
    the vertex normal, normalized — parity with
    CVPMeshPlanner::computeVectorMap (cvp_mesh_planner.cpp:204-239)."""
    from mesh_navigation_tpu.mesh import geometry

    vidx = jnp.arange(mesh.num_vertices, dtype=jnp.int32)
    has = (result.pred != vidx) & (result.cutting_face >= 0)
    d = mesh.vertices[result.pred] - mesh.vertices
    rotated = geometry.rotate_about_axis(d, mesh.vertex_normals, result.theta)
    unit = rotated / jnp.maximum(jnp.linalg.norm(rotated, axis=-1, keepdims=True), 1e-12)
    return jnp.where(has[:, None], unit, 0.0)
