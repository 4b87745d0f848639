"""Geodesic inflation layer: wavefront distance from lethal seeds + cost
fading + repulsive vector field.

Parity with mesh_layers/src/inflation_layer.cpp: seeds every input-layer
lethal vertex at distance 0 and advances a Sethian fast-marching wave over
triangles bounded by the inflation radius (341-491); converts distance to
cost with the costmap_2d-style decay (315-339); accumulates a unit repulsive
field pointing away from obstacles (277-308) that `meshAhead` and the
controller blend into the planner field (493-561).

TPU re-design: the heap wave becomes the face-parallel `eikonal_field` sweep
(ops/eikonal.py) with the *same* Sethian update; the order-dependent vector
accumulation becomes (a) one seed-face pass and (b) a distance-ordered
fixed-point propagation of `normalize(vec[v1]·d31 + vec[v2]·d32)` along the
winning updates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.config import LayerConfig
from mesh_navigation_tpu.layers.base import LayerOutput, register_layer, zero_vectors
from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.mesh import geometry
from mesh_navigation_tpu.ops import eikonal

INF = jnp.inf


class InflationParams(NamedTuple):
    """inflation_layer.h:240-248 defaults."""
    inscribed_radius: float = 0.25
    inflation_radius: float = 0.4
    lethal_value: float = 1.0
    inscribed_value: float = 0.99
    cost_scaling_factor: float = 1.0
    repulsive_field: bool = True


def fading(distance: jax.Array, p: InflationParams) -> jax.Array:
    """Distance -> cost decay, exact piecewise contract of
    InflationLayer::fading (inflation_layer.cpp:315-339)."""
    decay = p.inscribed_value * jnp.exp(
        -p.cost_scaling_factor * (distance - p.inscribed_radius)
    )
    return jnp.where(
        distance > p.inflation_radius,
        0.0,
        jnp.where(
            distance > p.inscribed_radius,
            decay,
            jnp.where(distance > 0.0, p.inscribed_value, p.lethal_value),
        ),
    ).astype(jnp.float32)


def inflation_distances(
    mesh: MeshArrays, lethal: jax.Array, p: InflationParams,
    *, max_sweeps: int = 0, sethian_plan=None, window=None,
) -> eikonal.EikonalResult:
    """Geodesic distance from the lethal set over raw edge distances
    (inflation uses `edge_distances`, not cost weights —
    inflation_layer.cpp:452).

    With a `sethian_plan` (band-ordered meshes) the wave runs as the
    shift-based dense-pattern solve (ops/banded_sethian.py) — same fixed
    point, no [F, 3] gathers; the cap keeps it a few rounds at any scale.
    `window` positions a static-shape sub-plane around the lethal set
    (live-replan fast path, certified exact with in-jit fallback). Default
    None = full-plane rounds: the windowed path is OPT-IN (the replan
    cascade passes it via layer state) because for global static lethal
    sets the bbox never fits the window and the nested fallback conds trace
    the full solve twice, bloating HLO and compile time for pure overhead.
    """
    seed = jnp.where(lethal, 0.0, INF).astype(jnp.float32)
    if sethian_plan is not None:
        from mesh_navigation_tpu.ops import banded_sethian as _bs

        dist = _bs.sethian_distances_banded(
            sethian_plan, seed, source_cap=p.inflation_radius,
            window=window,
        )
        vidx = jnp.arange(mesh.num_vertices, dtype=jnp.int32)
        return eikonal.EikonalResult(
            dist=dist, pred=vidx, theta=jnp.zeros_like(dist),
            cutting_face=jnp.full_like(vidx, -1),
            sweeps=jnp.int32(0), converged=jnp.bool_(True),
        )
    return eikonal.eikonal_field(
        mesh,
        mesh.edge_dist,
        seed,
        update="sethian",
        source_cap=p.inflation_radius,
        max_sweeps=max_sweeps,
    )


def repulsive_field(
    mesh: MeshArrays,
    dist: jax.Array,
    *,
    max_sweeps: int = 64,
) -> jax.Array:
    """Unit repulsive vectors pointing away from the lethal set.

    Mirrors the accumulation inside InflationLayer::waveFrontUpdate
    (inflation_layer.cpp:277-308):
    - faces with two seed corners (u1 == u2 == 0, u3 > 0) push
      dir = normalize((v3-v2) + (v3-v1)) onto all three corners;
    - every other updated vertex takes normalize(vec[v1]·d31 + vec[v2]·d32)
      through its winning face, propagated to a fixed point in distance order.
    """
    V = mesh.num_vertices
    v1t, v2t, v3t, ea, eb, ec = eikonal._face_corner_tables(mesh)
    pos = mesh.vertices

    u1 = dist[v1t]          # [F, 3]
    u2 = dist[v2t]
    u3 = dist[v3t]

    # ---- seed contributions ------------------------------------------------
    seed_face = (u1 == 0.0) & (u2 == 0.0) & (u3 > 0.0)          # [F, 3]
    d31 = pos[v3t] - pos[v1t]
    d32 = pos[v3t] - pos[v2t]
    dir_fk = geometry.normalize(d31 + d32)                       # [F, 3, 3]
    contrib = jnp.where(seed_face[..., None], dir_fk, 0.0)

    # scatter-add onto v1, v2, v3 via pull over incident faces
    vf, vc, vfm = mesh.vertex_faces, mesh.vertex_face_corner, mesh.vertex_faces_mask
    vidx = jnp.arange(V, dtype=jnp.int32)

    def pull_sum(field_fk):   # [F, 3, 3] contributions addressed to v1/v2/v3
        # For vertex v and incident (f, corner c of v): v appears as v3 of
        # corner c, as v1 of corner c-1, as v2 of corner c-2.
        out = jnp.zeros((V, 3), jnp.float32)
        for role_shift in (0, 1, 2):
            # role_shift 0: v == v3t[f, k] at k = c
            # role_shift 1: v == v1t[f, k] at k = c - 1 (mod 3)
            # role_shift 2: v == v2t[f, k] at k = c - 2 (mod 3)
            k = jnp.mod(vc - role_shift, 3)
            g = field_fk[vf, k]                                  # [V, FD, 3]
            out = out + jnp.sum(jnp.where(vfm[..., None], g, 0.0), axis=1)
        return out

    seed_vec = geometry.normalize(pull_sum(contrib))
    seed_touched = jnp.any(pull_sum(jnp.where(seed_face[..., None], 1.0, 0.0)) > 0, axis=-1)
    vec0 = jnp.where(seed_touched[:, None], seed_vec, 0.0)

    # ---- winning-face propagation -----------------------------------------
    # Weights of the winning combination: d31 = dist[v3]-dist[v1], etc.
    w31 = (u3 - u1)
    w32 = (u3 - u2)

    cand_match = jnp.isfinite(u3) & jnp.isfinite(u1) & jnp.isfinite(u2) & (u3 > 0.0) & ~seed_face
    nonseed_parent = (u1 != 0.0) | (u2 != 0.0)

    def sweep(vec):
        # candidate vector through each (f, k): vec[v1]*w31 + vec[v2]*w32
        cand_vec = vec[v1t] * w31[..., None] + vec[v2t] * w32[..., None]  # [F,3,3]
        has_parent_vec = (
            (jnp.any(vec[v1t] != 0.0, axis=-1) | jnp.any(vec[v2t] != 0.0, axis=-1))
            & cand_match & nonseed_parent
        )
        # choose, per vertex, the incident candidate whose parents are closest
        # (smallest u1+u2 ≈ the face that fired last in the sequential order)
        score = jnp.where(has_parent_vec, u1 + u2, INF)           # [F, 3]
        score_v = jnp.where(vfm, score[vf, vc], INF)              # [V, FD]
        best = jnp.argmin(score_v, axis=1)
        ok = jnp.isfinite(jnp.min(score_v, axis=1)) & ~seed_touched
        wf, wc = vf[vidx, best], vc[vidx, best]
        new = geometry.normalize(cand_vec[wf, wc])
        return jnp.where(ok[:, None], new, vec)

    def cond(carry):
        vec, prev, it = carry
        return (it < max_sweeps) & jnp.any(jnp.abs(vec - prev) > 1e-6)

    def body(carry):
        vec, _, it = carry
        return sweep(vec), vec, it + 1

    vec, _, _ = jax.lax.while_loop(
        cond, body, (sweep(vec0), vec0, jnp.int32(0))
    )
    return vec


def repulsive_vector_at(
    dist: jax.Array,
    vecmap: jax.Array,
    face_vertex_ids: jax.Array,   # [..., 3] i32
    bary: jax.Array,              # [..., 3]
    p: InflationParams,
) -> jax.Array:
    """Barycentric repulsive-vector lookup with cosine fade — parity with
    InflationLayer::vectorAt (inflation_layer.cpp:493-531), including its
    `sqrt(distance)` in the fade argument (reproduced as-is)."""
    if not p.repulsive_field:
        return jnp.zeros(bary.shape[:-1] + (3,), jnp.float32)
    d = geometry.bary_interpolate(dist[face_vertex_ids], bary)
    vec = geometry.bary_interpolate(vecmap[face_vertex_ids], bary)
    alpha = (
        (jnp.sqrt(jnp.maximum(d, 0.0)) - p.inscribed_radius)
        / (p.inflation_radius - p.inscribed_radius)
        * jnp.pi
    )
    fade = p.inscribed_value * (jnp.cos(alpha) + 1.0) / 2.0
    scale = jnp.where(
        d > p.inflation_radius,
        0.0,
        jnp.where(
            d > p.inscribed_radius,
            fade,
            jnp.where(d > 0.0, p.inscribed_value, p.lethal_value),
        ),
    )
    return vec * scale[..., None]


def params_from_config(cfg: LayerConfig) -> InflationParams:
    return InflationParams(
        inscribed_radius=cfg.param("inscribed_radius", 0.25),
        inflation_radius=cfg.param("inflation_radius", 0.4),
        lethal_value=cfg.param("lethal_value", 1.0),
        inscribed_value=cfg.param("inscribed_value", 0.99),
        cost_scaling_factor=cfg.param("cost_scaling_factor", 1.0),
        repulsive_field=bool(cfg.param("repulsive_field", 1.0)),
    )


@register_layer("inflation")
def make_inflation(cfg: LayerConfig):
    p = params_from_config(cfg)

    def fn(mesh: MeshArrays, inputs: dict, state) -> LayerOutput:
        if inputs:
            lethal = jnp.stack([o.lethal for o in inputs.values()]).any(axis=0)
        else:
            lethal = jnp.zeros(mesh.num_vertices, bool)
        res = inflation_distances(
            mesh, lethal, p, sethian_plan=state.get("__sethian_plan__"),
            window=state.get("__inflation_window__"),
        )
        costs = jnp.where(jnp.isfinite(res.dist), fading(res.dist, p), 0.0)
        vectors = (
            repulsive_field(mesh, res.dist) if p.repulsive_field
            else zero_vectors(mesh)
        )
        # expose distances for vectorAt-style lookups
        state[f"inflation:{cfg.name}"] = (res.dist, vectors)
        return LayerOutput(costs=costs, lethal=lethal, vectors=vectors)

    def prepare(m: MeshArrays) -> dict:
        from mesh_navigation_tpu.ops import banded_sethian as _bs

        try:
            return {"__sethian_plan__": _bs.build_sethian_plan(m)}
        except ValueError:
            return {}  # no band structure: the gather eikonal path stays

    fn.prepare = prepare  # type: ignore[attr-defined]
    return fn
