"""Continuous Vector Field Planner (CVP) — fast-marching over triangle
interiors as face-parallel sweeps.

Capability parity with cvp_mesh_planner (SURVEY.md §2.1 C14, Pütz ICRA'21):
seed the three vertices of the goal's containing face with Euclidean
distances (cvp_mesh_planner.cpp:716-728), propagate the wavefront with the
geometric-unfolding triangle update recording predecessor/θ/cutting-face
(:369-556), derive the vector field by rotating predecessor directions by θ
around the vertex normal (:204-239), then extract the path by *vector-field
back-tracking* from the start with `meshAhead` surface walking (:920-951).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.mesh import geometry, query
from mesh_navigation_tpu.ops import eikonal, sweeps
from mesh_navigation_tpu.control import tracking
from mesh_navigation_tpu.planners.common import PlanResult, pose_chain


class CVPPlanner:
    """MeshPlanner-shaped facade running the CVP wavefront."""

    def __init__(
        self,
        mesh: MeshArrays,
        config: PlannerConfig = PlannerConfig(),
        *,
        grid: Optional[query.SpatialGrid] = None,
        max_path_len: int = 1024,
        update: str = "unfolding",
    ):
        self.mesh = mesh
        self.config = config
        self.grid = grid if grid is not None else query.build_grid(mesh)
        self.max_path_len = max_path_len
        self.update = update
        self._cancel = False

    def cancel(self) -> bool:
        self._cancel = True
        return True

    def prepare_weights(
        self, vertex_costs: jax.Array, edge_cost_factor: float = 0.0
    ) -> jax.Array:
        """CVP consumes the combined *edge weights* as triangle side lengths
        (waveFrontPropagation passes mesh_map->edgeWeights(),
        cvp_mesh_planner.cpp:746)."""
        return sweeps.compute_edge_weights(self.mesh, vertex_costs, edge_cost_factor)

    @functools.partial(jax.jit, static_argnums=0)
    def plan_one(
        self,
        edge_weights: jax.Array,  # [E]
        vertex_costs: jax.Array,  # [V]
        start: jax.Array,         # [3]
        goal: jax.Array,          # [3]
        layer_vectors: jax.Array | None = None,
    ) -> PlanResult:
        mesh = self.mesh
        cfg = self.config

        # --- containing faces of start and goal (cvp:674-706) --------------
        s_face, s_bary, _, s_found = query.containing_face(mesh, self.grid, start)
        g_face, g_bary, _, g_found = query.containing_face(mesh, self.grid, goal)

        # --- seed goal-face vertices with Euclidean distances (cvp:716-728)
        g_vids = mesh.faces[jnp.maximum(g_face, 0)]
        seed_d = jnp.linalg.norm(mesh.vertices[g_vids] - goal, axis=-1)
        seed = jnp.full(mesh.num_vertices, jnp.inf, jnp.float32)
        seed = seed.at[g_vids].set(seed_d.astype(jnp.float32))

        target_mask = vertex_costs < cfg.cost_limit  # cvp:802-851 free-vertex skip
        field = eikonal.eikonal_field(
            mesh, edge_weights, seed,
            update=self.update,
            target_mask=target_mask,
            max_sweeps=cfg.max_sweeps,
            block_sweeps=cfg.block_sweeps,
        )
        vector_map = eikonal.cvp_vector_map(mesh, field)
        # seed vertices point straight at the goal (cvp:723 vector_map_ = diff)
        seed_dirs = geometry.normalize(goal - mesh.vertices[g_vids])
        vector_map = vector_map.at[g_vids].set(seed_dirs)
        return self._backtrack(
            vector_map, field.dist, field.pred,
            start, s_face, s_found, goal, g_face, g_found, layer_vectors,
        )

    def _backtrack(
        self, vector_map, dist, pred,
        start, s_face, s_found, goal, g_face, g_found, layer_vectors,
    ) -> PlanResult:
        """Vector-field back-tracking from the start (cvp:920-951) + pose
        chain + outcome mapping — shared by plan_one and plan_batch."""
        mesh = self.mesh
        cfg = self.config
        step = cfg.step_width

        def walk(carry, _):
            pos, face, alive = carry
            # reference termination: squared distance to goal <= step_width
            # (cvp_mesh_planner.cpp:925 uses distance2 vs step_width as-is)
            done = jnp.sum((pos - goal) ** 2) <= step
            new_pos, new_face, ok = tracking.mesh_ahead(
                mesh, self.grid, vector_map, pos, face, step,
                layer_vectors=layer_vectors,
            )
            still = alive & ~done & ok
            return (
                jnp.where(still, new_pos, pos),
                jnp.where(still, new_face, face),
                still,
            ), (pos, face, alive)

        init = (start, s_face, s_found & g_found)
        (last_pos, last_face, _), (path_pos, path_face, path_alive) = jax.lax.scan(
            walk, init, None, length=self.max_path_len - 1
        )
        # close the chain with the goal pose (cvp makePlan appends the goal)
        positions = jnp.concatenate([path_pos, goal[None, :]], axis=0)
        reached = jnp.sum((last_pos - goal) ** 2) <= step
        valid = jnp.concatenate([path_alive, reached[None]])
        # collapse padded/frozen entries onto the goal so the pose chain stays
        # contiguous (the walk stops within step_width of the goal and the
        # goal pose is appended, cvp makePlan:118-124) — segment costs then
        # include the final approach and padding contributes zero length.
        positions = jnp.where(valid[:, None], positions, goal[None, :])

        # poses oriented by the face normals along the back-tracked face
        # sequence (cvp makePlan:101-124)
        path_face_full = jnp.concatenate([path_face, jnp.maximum(g_face, 0)[None]])
        normals = mesh.face_normals[jnp.maximum(path_face_full, 0)]
        quats, cost = pose_chain(positions, jnp.ones_like(valid), normals)

        outcome = jnp.where(
            ~(s_found & g_found),
            jnp.where(~s_found, Outcome.INVALID_START, Outcome.INVALID_GOAL),
            jnp.where(reached, Outcome.SUCCESS, Outcome.NO_PATH_FOUND),
        ).astype(jnp.int32)
        return PlanResult(
            outcome=outcome,
            path_positions=positions,
            path_quats=quats,
            path_valid=valid,
            cost=jnp.where(reached, cost, jnp.inf),
            potential=dist,
            vector_map=vector_map,
            pred=pred,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def plan_batch(
        self,
        edge_weights: jax.Array,
        vertex_costs: jax.Array,
        starts: jax.Array,
        goals: jax.Array,
    ) -> PlanResult:
        """Batched CVP: all scenarios share one [V, B] fixed-point solve
        (ops/eikonal.batched_eikonal_field), then the vector maps and
        surface-walk backtracking run under vmap."""
        mesh = self.mesh
        cfg = self.config

        def locate_goal(g):
            g_face, g_bary, _, g_found = query.containing_face(mesh, self.grid, g)
            g_vids = mesh.faces[jnp.maximum(g_face, 0)]
            seed_d = jnp.linalg.norm(mesh.vertices[g_vids] - g, axis=-1)
            seed = jnp.full(mesh.num_vertices, jnp.inf, jnp.float32)
            seed = seed.at[g_vids].set(seed_d.astype(jnp.float32))
            return seed, g_face, g_vids, g_found

        seeds, g_faces, g_vids, g_found = jax.vmap(locate_goal)(goals)
        target_mask = vertex_costs < cfg.cost_limit
        field = eikonal.batched_eikonal_field(
            mesh, edge_weights, seeds,
            update=self.update,
            target_mask=target_mask,
            max_sweeps=cfg.max_sweeps,
            block_sweeps=max(cfg.block_sweeps, 16),
        )

        def finish(dist, pred, theta, cface, s, g, g_face, gv, gf_ok):
            res1 = eikonal.EikonalResult(
                dist=dist, pred=pred, theta=theta, cutting_face=cface,
                sweeps=field.sweeps, converged=field.converged,
            )
            vector_map = eikonal.cvp_vector_map(mesh, res1)
            seed_dirs = geometry.normalize(g - mesh.vertices[gv])
            vector_map = vector_map.at[gv].set(seed_dirs)
            s_face, _, _, s_found = query.containing_face(mesh, self.grid, s)
            return self._backtrack(
                vector_map, dist, pred, s, s_face, s_found, g, g_face, gf_ok, None
            )

        return jax.vmap(finish)(
            field.dist, field.pred, field.theta, field.cutting_face,
            starts, goals, g_faces, g_vids, g_found,
        )

    # ------------------------------------------------------------------
    # banded fast-sweeping scale path (ops/pallas_eikonal.py)
    # ------------------------------------------------------------------
    def prepare_eikonal_plan(
        self, side_lengths_np, vertex_costs_np=None, *, warm_start: bool = True
    ):
        """Banded eikonal kernel plan for band-ordered meshes (the CVP analog
        of DijkstraPlanner.prepare_banded_plan); host-side classification,
        reused across solves. `vertex_costs_np` applies the cost-limit
        free-vertex skip (cvp_mesh_planner.cpp:802-851) at build time.

        warm_start additionally builds a banded DIJKSTRA plan over the same
        side lengths (with the CVP '>=' cost skip): graph distances upper-
        bound the triangle-interior eikonal distances, so one cheap Dijkstra
        solve warm-starts the eikonal rounds (plan_batch_banded)."""
        import numpy as np

        from mesh_navigation_tpu.mesh.arrays import host_array
        from mesh_navigation_tpu.ops import pallas_banded as _pb
        from mesh_navigation_tpu.ops import pallas_eikonal as _pe

        try:
            plan = _pe.build_eikonal_kernel_plan(self.mesh, side_lengths_np)
        except ValueError:
            return None
        self._dij_plan = None
        self._target_ok = None
        if vertex_costs_np is not None:
            costs = np.asarray(vertex_costs_np, np.float32)
            plan = _pe.apply_target_mask(plan, costs < self.config.cost_limit)
            self._target_ok = jnp.asarray(costs < self.config.cost_limit)
            if warm_start:
                ew = np.asarray(side_lengths_np, np.float32)
                adj_v = host_array(self.mesh, "adj_vertex")
                adj_e = host_array(self.mesh, "adj_edge")
                adj_m = host_array(self.mesh, "adj_mask")
                invalid = host_array(self.mesh, "invalid")
                # CVP skip semantics on BOTH endpoints ('>=' — cvp:757,
                # 802-851): a more restrictive graph only raises the warm
                # bound, never breaks it
                blocked = (costs >= self.config.cost_limit) | invalid.astype(bool)
                usable = adj_m & ~blocked[adj_v] & ~blocked[:, None]
                W = np.where(usable, ew[adj_e], np.inf).astype(np.float32)
                try:
                    self._dij_plan = _pb.build_banded_kernel_plan(self.mesh, W)
                except ValueError:
                    self._dij_plan = None
        return plan

    def plan_batch_banded(
        self,
        edge_weights: jax.Array,   # [E] (side lengths; lazy path re-derivation)
        kernel_plan,               # ops.pallas_eikonal.EikonalKernelPlan
        starts: jax.Array,         # [B, 3]
        goals: jax.Array,          # [B, 3]
        warm_plan=None,            # BandedKernelPlan (pass self._dij_plan)
        atol: float = 1e-4,
        rtol: float = 1e-3,
    ) -> PlanResult:
        """Batched CVP at scale: the wavefront runs as four-directional
        banded GS fast sweeps (O(winding) rounds, no [F, 3, B] gather
        tensors); the path is recovered by LAZY triangle-update descent
        (cvp_descend_paths) so no [B, V] pred map, θ map, or [B, V, 3]
        vector field ever materializes. potential/cost match
        waveFrontPropagation's fixed point; vector_map/pred are None.

        EVERY mesh-sized table (MeshArrays, SpatialGrid, the target mask,
        the warm-start Dijkstra plan) rides as a jit ARGUMENT of the
        module-level `_plan_batch_banded_impl` — closed-over device arrays
        get baked into the serialized HLO as constants, which at 1M is
        ~hundreds of MB and trips the remote-compile transport (HTTP 413;
        the make_replan_step lesson, api/server.py)."""
        if warm_plan is None:
            warm_plan = getattr(self, "_dij_plan", None)
        return _plan_batch_banded_impl(
            self.mesh, self.grid, edge_weights, kernel_plan,
            starts, goals, warm_plan, getattr(self, "_target_ok", None),
            max_path_len=self.max_path_len, atol=atol, rtol=rtol,
        )


@functools.partial(
    jax.jit, static_argnames=("max_path_len", "atol", "rtol")
)
def _plan_batch_banded_impl(
    mesh: MeshArrays,
    grid: query.SpatialGrid,
    edge_weights: jax.Array,
    kernel_plan,
    starts: jax.Array,
    goals: jax.Array,
    warm_plan,
    target_ok,
    *,
    max_path_len: int,
    atol: float = 1e-4,
    rtol: float = 1e-3,
) -> PlanResult:
    """Jitted body of CVPPlanner.plan_batch_banded (see its docstring).
    mesh/grid/warm_plan/target_ok are pytree arguments by design — do not
    close over them (remote-compile program-size limit)."""
    from mesh_navigation_tpu.ops import pallas_eikonal as _pe

    B = starts.shape[0]

    def locate_goal(g):
        g_face, _, _, g_found = query.containing_face(mesh, grid, g)
        g_vids = mesh.faces[jnp.maximum(g_face, 0)]
        seed_d = jnp.linalg.norm(mesh.vertices[g_vids] - g, axis=-1)
        return g_vids, seed_d.astype(jnp.float32), g_found

    g_vids, seed_d, g_found = jax.vmap(locate_goal)(goals)   # [B,3],[B,3]
    seed_d = jnp.where(g_found[:, None], seed_d, jnp.inf)
    # warm start: one banded Dijkstra solve bounds the eikonal field
    # from above (graph paths are triangle paths too); the eikonal
    # rounds then only close the corner-cutting gap
    init_vb = None
    if warm_plan is not None:
        from mesh_navigation_tpu.ops import pallas_banded as _pb

        dp = warm_plan
        dres = _pb.banded_solve_padded(
            dp, g_vids[:, 0], max_rounds=64, atol=1e-4, rtol=2e-3
        )
        Rd, Cd = dp.n_rows, dp.n_cols
        dij_vb = (
            dres.d_pad[:Rd, :Cd, :B].reshape(Rd * Cd, B)[: mesh.num_vertices]
        )                                                   # [V, B]
        init_vb = dij_vb + seed_d[:, 0][None, :]
        if target_ok is not None:
            init_vb = jnp.where(target_ok[:, None], init_vb, jnp.inf)
    # cw = n_inner = 8: FULL in-chunk Gauss-Seidel freshness — a wave
    # crosses a whole row per pass in the chunk direction AND the
    # opposite direction, so the 4-ordering FSM converges in O(winding)
    # rounds as designed. Measured at 1M x 128 (dij-warm): rounds
    # 41 -> 3, solve 9.26 s -> 1.83 s. Partial freshness loses hard:
    # (cw=16, n_inner=8) -> 11 rounds / 4.6 s; the r3 default
    # (32, 4) was the 41-round configuration.
    # orderings=2 (alternating diagonal pairs): measured 1.60 s/3 rounds
    # -> 1.17 s/4 rounds at 1M x 128
    # rtol default 1e-3 (NOT the Dijkstra path's 2e-3): sub-tolerance
    # improvements compound over the remaining rounds on long wavefronts —
    # measured at 1M x 128, rtol 2e-3 left an 8k-vertex far-field region
    # (od ~290-490) sitting +1.5% high, over the 1% oracle gate; the bench
    # gates the field vs the native FMM oracle at 1% either way
    res = _pe.eikonal_solve_padded(
        kernel_plan, g_vids, seed_d, atol=atol, rtol=rtol,
        init_vb=init_vb, cw=8, n_inner=8, orderings=2,
    )
    R, C, Cp = kernel_plan.n_rows, kernel_plan.n_cols, kernel_plan.n_cols_pad
    V = kernel_plan.num_vertices
    dist = res.d_pad[:R, :C, :B].reshape(R * C, B)[:V].T     # [B, V]

    start_v = query.nearest_vertex_batch(mesh, grid, starts)[0]
    lane = jnp.arange(B)
    seed_mask = jnp.zeros((B, V), bool).at[lane[:, None], g_vids].set(True)
    path, valid = _pe.cvp_descend_paths(
        mesh, edge_weights, dist, start_v, seed_mask, max_path_len,
        tol=5e-3,
    )
    positions = mesh.vertices[path]
    quats, cost = jax.vmap(pose_chain)(
        positions, valid, mesh.vertex_normals[path]
    )
    reached = jnp.isfinite(dist[lane, start_v]) & g_found
    outcome = jnp.where(
        ~g_found,
        Outcome.INVALID_GOAL,
        jnp.where(reached, Outcome.SUCCESS, Outcome.NO_PATH_FOUND),
    ).astype(jnp.int32)
    return PlanResult(
        outcome=outcome,
        path_positions=positions,
        path_quats=quats,
        path_valid=valid & reached[:, None],
        # cost = WALKED path cost (summed segment lengths over the
        # descended chain, same contract as the Dijkstra path and the
        # reference's returned plan cost), not the potential at the
        # start vertex — the two differ when the descent terminates
        # early or the tolerance reroutes a hop
        cost=jnp.where(reached, cost, jnp.inf),
        potential=dist,
        vector_map=None,
        pred=None,
    )
