"""Dijkstra-parity global planner as batched label-correcting sweeps.

Capability parity with dijkstra_mesh_planner (SURVEY.md §2.1 C13): snap start
and goal to nearest vertices, solve the single-source problem seeded at the
*goal* (so the potential/vector field points toward it,
dijkstra_mesh_planner.cpp:80-81), build the predecessor path, the potential
field and the per-vertex direction field. The priority-queue loop
(dijkstra_mesh_planner.cpp:287-348) is replaced by `ops.sweeps`; everything
here is jit-compiled and vmap-batched over scenarios.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.mesh import query
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners.common import PlanResult, pose_chain


class DijkstraPlanner:
    """MeshPlanner-shaped facade (mbf_mesh_core/mesh_planner.h:50-96)."""

    def __init__(
        self,
        mesh: MeshArrays,
        config: PlannerConfig = PlannerConfig(),
        *,
        grid: Optional[query.SpatialGrid] = None,
        max_path_len: int = 1024,
    ):
        self.mesh = mesh
        self.config = config
        self.grid = grid if grid is not None else query.build_grid(mesh)
        self.max_path_len = max_path_len
        self._cancel = False
        if config.method == "batched":
            from mesh_navigation_tpu.ops import ordered as _ordered

            self.sweep_plan = _ordered.build_sweep_plan(
                mesh, directions=config.sweep_directions
            ) if config.ordered_rounds > 0 else _ordered.SweepPlan(
                chunks=jnp.zeros((1, 1, 1), jnp.int32),
                num_vertices=mesh.num_vertices,
            )
        else:
            self.sweep_plan = None

    # -- MeshPlanner::cancel (cooperative; honored between jit dispatches) ---
    def cancel(self) -> bool:
        self._cancel = True
        return True

    def prepare_weights(
        self, vertex_costs: jax.Array, edge_cost_factor: float = 0.0
    ) -> jax.Array:
        """Edge weights + slot table for the current cost field — the
        MeshMap::computeEdgeWeights product (mesh_map.cpp:517-561)."""
        ew = sweeps.compute_edge_weights(self.mesh, vertex_costs, edge_cost_factor)
        return sweeps.slot_weights(self.mesh, ew, vertex_costs, self.config.cost_limit)

    @functools.partial(jax.jit, static_argnums=0)
    def plan_one(
        self,
        weights_vd: jax.Array,
        start: jax.Array,     # [3]
        goal: jax.Array,      # [3]
    ) -> PlanResult:
        mesh = self.mesh
        start_v, start_d2 = query.nearest_vertex(mesh, self.grid, start)
        goal_v, goal_d2 = query.nearest_vertex(mesh, self.grid, goal)

        field = sweeps.shortest_path_field(
            mesh, weights_vd, goal_v,
            max_sweeps=self.config.max_sweeps,
            block_sweeps=self.config.block_sweeps,
        )
        vector_map = sweeps.vector_map_from_predecessors(mesh, field.pred)
        path, valid = sweeps.extract_path(
            field.pred, start_v, goal_v, self.max_path_len
        )
        positions = mesh.vertices[path]
        normals = mesh.vertex_normals[path]
        quats, cost = pose_chain(positions, valid, normals)

        reached = jnp.isfinite(field.dist[start_v])
        outcome = jnp.where(
            reached, Outcome.SUCCESS, Outcome.NO_PATH_FOUND
        ).astype(jnp.int32)
        valid = valid & reached
        return PlanResult(
            outcome=outcome,
            path_positions=positions,
            path_quats=quats,
            path_valid=valid,
            cost=jnp.where(reached, cost, jnp.inf),
            potential=field.dist,
            vector_map=vector_map,
            pred=field.pred,
        )

    @functools.partial(jax.jit, static_argnums=0)
    def plan_batch(
        self,
        weights_vd: jax.Array,
        starts: jax.Array,    # [B, 3]
        goals: jax.Array,     # [B, 3]
    ) -> PlanResult:
        """Thousands of start/goal scenarios per step (BASELINE.json
        configs[1]/[3]) — the batch axis the reference's one-goal action loop
        never had. With method="ordered" the whole batch shares one
        fast-sweeping solve (ops/ordered.py) instead of per-scenario
        while_loops."""
        if self.sweep_plan is None:
            return jax.vmap(lambda s, g: self.plan_one(weights_vd, s, g))(starts, goals)

        from mesh_navigation_tpu.ops import ordered as _ordered

        mesh = self.mesh
        start_v = query.nearest_vertex_batch(mesh, self.grid, starts)[0]
        goal_v = query.nearest_vertex_batch(mesh, self.grid, goals)[0]
        field = _ordered.batched_field_hybrid(
            mesh, weights_vd, self.sweep_plan, goal_v,
            ordered_rounds=self.config.ordered_rounds,
            block_sweeps=max(self.config.block_sweeps, 16),
            max_sweeps=self.config.max_sweeps,
        )
        return jax.vmap(self._finish_batch)(field.dist, field.pred, start_v, goal_v)

    def _finish_batch(self, dist, pred, sv, gv) -> PlanResult:
        mesh = self.mesh
        vector_map = sweeps.vector_map_from_predecessors(mesh, pred)
        path, valid = sweeps.extract_path(pred, sv, gv, self.max_path_len)
        positions = mesh.vertices[path]
        quats, cost = pose_chain(positions, valid, mesh.vertex_normals[path])
        reached = jnp.isfinite(dist[sv])
        outcome = jnp.where(
            reached, Outcome.SUCCESS, Outcome.NO_PATH_FOUND
        ).astype(jnp.int32)
        return PlanResult(
            outcome=outcome,
            path_positions=positions,
            path_quats=quats,
            path_valid=valid & reached,
            cost=jnp.where(reached, cost, jnp.inf),
            potential=dist,
            vector_map=vector_map,
            pred=pred,
        )

    def prepare_banded_plan(self, weights_vd: jax.Array, *, min_coverage: float = 0.9):
        """Banded kernel plan (ops/pallas_banded.py) when the vertex order has
        usable band structure (x-major terrain grids), else None. Rebuild
        whenever the cost field changes."""
        from mesh_navigation_tpu.ops import pallas_banded as _pb

        try:
            plan = _pb.build_banded_kernel_plan(self.mesh, weights_vd)
        except ValueError:
            return None
        return plan if plan.coverage >= min_coverage else None

    @functools.partial(
        jax.jit, static_argnums=0,
        static_argnames=("light", "dtype", "scan_steps", "atol", "rtol"),
    )
    def plan_batch_banded(
        self,
        weights_vd: jax.Array,
        kernel_plan,
        starts: jax.Array,
        goals: jax.Array,
        *,
        light: bool = False,
        dtype=jnp.float32,
        scan_steps: int = 0,
        atol: float = 1e-5,
        rtol: float = 1e-5,
        grid: "query.SpatialGrid | None" = None,
    ) -> PlanResult:
        """Batch planning via banded GS fast sweeping (ops/pallas_banded.py)
        — the fastest path on band-structured meshes: O(path winding) rounds
        instead of O(diameter) sweeps.

        light=True skips the [B, V, 3] vector field (3 GB at 1M x 256 —
        vector_map is None in the result) and the roll-based pred recovery:
        predecessors come from the single-pass Pallas recovery
        (predecessors_banded_pallas, one field read + one int32 write,
        ~20x cheaper than the roll path) feeding extract_paths_vb, and the
        controller samples directions on the fly via
        compute_velocity_banded (the result's pred is None; the [V, B]
        table lives only inside this call).
        dtype=jnp.bfloat16 opts into the approximate half-bandwidth solve."""
        from mesh_navigation_tpu.ops import pallas_banded as _pb

        mesh = self.mesh
        # `grid` as an ARGUMENT keeps the dense snap cell tables (~100 MB at
        # 1M) out of the serialized HLO — closure constants of a
        # static-self jit get baked in, which the remote-compile transport
        # rejects (HTTP 413)
        if grid is None:
            grid = self.grid
        start_v = query.nearest_vertex_batch(mesh, grid, starts)[0]
        goal_v = query.nearest_vertex_batch(mesh, grid, goals)[0]
        max_rounds = max(self.config.max_sweeps // 2, 64)
        if not light:
            field = _pb.batched_field_banded_pallas(
                mesh, weights_vd, kernel_plan, goal_v,
                max_rounds=max_rounds, dtype=dtype, scan_steps=scan_steps,
                atol=atol, rtol=rtol,
            )
            return jax.vmap(self._finish_batch)(
                field.dist, field.pred, start_v, goal_v
            )

        # Group scenarios by goal vertex (row-major id => by mesh row): the
        # kernel's 128-lane batch blocks then hold NEIGHBORING wavefronts,
        # so the active-row skip prunes whole blocks instead of being
        # defeated by one far-away lane per block. Bucket grouping (not a
        # full sort — see group_lanes) gives the same block row span for a
        # fraction of the cost. Outputs are un-permuted at the end —
        # callers never see the grouped order.
        B = start_v.shape[0]
        order, inv = _pb.group_lanes(goal_v, mesh.num_vertices)
        goal_s = goal_v[order]
        start_s = start_v[order]

        tol = 1e-2 if dtype == jnp.bfloat16 else max(1e-5, 3.0 * rtol)
        use_pred_conv = (
            kernel_plan.n_residual == 0
            and dtype != jnp.bfloat16
            and (atol > 0 or rtol > 0)
        )
        res = _pb.banded_solve_padded(
            kernel_plan, goal_s, max_rounds=max_rounds, dtype=dtype,
            scan_steps=scan_steps, atol=atol, rtol=rtol,
            converge="pred" if use_pred_conv else "round",
        )
        R, C = kernel_plan.n_rows, kernel_plan.n_cols
        V = kernel_plan.num_vertices
        potential_vb = (
            res.d_pad[:R, :C, :B].reshape(R * C, B)[:V].astype(jnp.float32)
        )                                                   # [V, B] sorted
        potential = potential_vb.T                          # [B, V] sorted
        if kernel_plan.n_residual == 0:
            # int8 class table + decode-as-you-walk: 4x less pred HBM; with
            # converge="pred" the table came out of the solve's certificate
            # pass for free
            if use_pred_conv:
                cls_vb = res.cls[:, :B]
            else:
                cls_vb = _pb.predecessors_banded_classes(
                    kernel_plan, res.d_pad, tol=tol
                )[:, :B]
            path, valid = _pb.extract_paths_cls(
                cls_vb, start_s, goal_s, self.max_path_len, C
            )                                               # [B, L] sorted
        else:
            # irregular (residual) meshes: int8 classes + compact residual
            # slot table — 4x less pred HBM than the int32 id table, which
            # frees the lanes for the full batch
            cls_vb, res_choice = _pb.predecessors_banded_classes_residual(
                kernel_plan, res.d_pad, tol=tol
            )
            path, valid = _pb.extract_paths_cls(
                cls_vb[:, :B], start_s, goal_s, self.max_path_len, C,
                res_row_map=kernel_plan.res_row_map,
                res_jump=kernel_plan.res_jump,
                res_choice=res_choice[:, :B],
            )                                               # [B, L] sorted
        # one gather of fused [V, 6] position+normal rows instead of two
        # 12-byte-row gathers — the pose stage is gather-row bound (the
        # concat is rebuilt in-jit so no extra 25 MB constant ships in the
        # serialized HLO)
        pos_normals = jnp.concatenate(
            [mesh.vertices, mesh.vertex_normals], axis=1
        )
        pn = pos_normals[path]
        positions = pn[..., :3]
        quats, cost = jax.vmap(pose_chain)(positions, valid, pn[..., 3:])
        # read reachability from the raw padded field so the light path
        # never forces the [V, B] potential_vb copy to materialize
        Cp = kernel_plan.n_cols_pad
        reached = jnp.isfinite(
            res.d_pad.reshape(-1, res.d_pad.shape[-1])[
                (start_s // C) * Cp + start_s % C,
                jnp.arange(B, dtype=jnp.int32),
            ]
        )
        outcome = jnp.where(
            reached, Outcome.SUCCESS, Outcome.NO_PATH_FOUND
        ).astype(jnp.int32)
        return PlanResult(
            outcome=outcome[inv],
            path_positions=positions[inv],
            path_quats=quats[inv],
            path_valid=(valid & reached[:, None])[inv],
            cost=jnp.where(reached, cost, jnp.inf)[inv],
            potential=potential[inv],
            vector_map=None,
            pred=None,
            potential_vb=potential_vb,
            lane_map=inv,
            d_pad=res.d_pad,
        )

    def prepare_offset_plan(self, weights_vd: jax.Array):
        """Host-side offset classification for the structured (gather-free)
        solver; rebuild whenever the cost field changes."""
        from mesh_navigation_tpu.ops import structured as _structured

        return _structured.build_offset_plan(self.mesh, weights_vd)

    @functools.partial(jax.jit, static_argnums=0)
    def plan_batch_structured(
        self,
        weights_vd: jax.Array,
        offset_plan,
        starts: jax.Array,
        goals: jax.Array,
    ) -> PlanResult:
        """Batch planning with offset-shift sweeps (ops/structured.py) — the
        fastest path on band-ordered meshes (~2x over the gather solver)."""
        from mesh_navigation_tpu.ops import structured as _structured

        mesh = self.mesh
        start_v = query.nearest_vertex_batch(mesh, self.grid, starts)[0]
        goal_v = query.nearest_vertex_batch(mesh, self.grid, goals)[0]
        field = _structured.batched_field_structured(
            mesh, weights_vd, offset_plan, goal_v,
            block_sweeps=max(self.config.block_sweeps, 16),
            max_sweeps=self.config.max_sweeps,
        )
        return jax.vmap(self._finish_batch)(field.dist, field.pred, start_v, goal_v)
