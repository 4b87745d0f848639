"""MeshNav navigation facade — the action-server surface, TPU-side.

Capability parity with mbf_mesh_nav's MeshNavigationServer (SURVEY.md §2.1
C17): construct one shared map (mesh + layer DAG + combined costs + edge
weights), load the configured planner/controller "plugins", and expose the
GetPath / ExePath / Recovery verbs:

  get_path(start, goal)                  -> PlanResult        (GetPath)
  exe_path_step(pose, quat, state)       -> (cmd, state)      (ExePath cycle)
  is_goal_reached(pose, quat, state, .)  -> bool
  recovery(name)                         -> Outcome           (Recovery)
  clear_mesh()                           -> reset dynamic layers
  save_map(path)                         -> persist layer channels

The ROS action protocol, executors and DDS topics are out of scope by design
(observability is returned data, not topics); per-goal worker threads become
`vmap` batches.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.config import (
    ControllerConfig, LayerConfig, NavConfig, PlannerConfig,
)
from mesh_navigation_tpu.control import MeshController
from mesh_navigation_tpu.control.controller import ControllerState, initial_state
from mesh_navigation_tpu.layers import LayerStack
from mesh_navigation_tpu.mesh import query
from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners import CVPPlanner, DijkstraPlanner
from mesh_navigation_tpu.planners.common import PlanResult


PLANNER_KINDS = {"dijkstra": DijkstraPlanner, "cvp": CVPPlanner}


@functools.partial(jax.jit, static_argnames=("factor", "cost_limit"))
def _refresh_base_planes(plan0, combined0, factor, cost_limit):
    """Full-plane weight refresh for make_replan_step's no-obstacle base —
    module-level so repeated step-builder calls hit the jit cache instead of
    recompiling the ~60 MB refresh each time (a fresh jit(lambda) has a new
    identity every call)."""
    from mesh_navigation_tpu.ops import pallas_banded as _pb

    return _pb.refresh_banded_planes_from_costs(
        plan0, combined0, edge_cost_factor=factor, cost_limit=cost_limit
    )


class MeshNavServer:
    """One shared map + plugin planners/controllers (C17).

    The reference loads pluginlib classes by name
    (mesh_navigation_server.cpp:74-124); here `planner_kind` picks from
    PLANNER_KINDS and new planners register by insertion.
    """

    def __init__(
        self,
        mesh: MeshArrays,
        config: NavConfig = NavConfig(),
        *,
        planner_kind: str = "cvp",
        max_path_len: int = 1024,
    ):
        self.mesh = mesh
        self.config = config
        self.grid = query.build_grid(mesh)
        self.stack = (
            LayerStack.from_configs(config.layers, config.mesh_map.default_layer or None)
            if config.layers
            else None
        )
        self.layer_state: dict = self.stack.prepare(mesh) if self.stack else {}
        self.planner_kind = planner_kind
        cls = PLANNER_KINDS[planner_kind]
        self.planner = cls(mesh, config.planner, grid=self.grid, max_path_len=max_path_len)
        self.controller = MeshController(mesh, config.controller, grid=self.grid)
        self._refresh_costs()

    # ------------------------------------------------------------------
    # map / layer plumbing (MeshMap::readMap tail, mesh_map.cpp:434-452)
    # ------------------------------------------------------------------
    def _refresh_costs(self, *, structural: bool = True) -> None:
        """Recompute layer outputs -> combined costs -> edge/slot weights.

        structural=True (init, layer-graph/param changes) additionally
        rebuilds the host-side offset/banded classifications. The hot path
        (update_point_cloud) passes structural=False: the classification
        depends only on the mesh adjacency, so only the weight PLANES are
        re-derived — on device, via refresh_banded_planes /
        refresh_offset_planes, with zero device->host pulls (the
        layer_manager.cpp:202-263 change fan-out at replanning rate)."""
        if self.stack is not None:
            self.layer_outputs, self.vertex_costs = self.stack.compute(
                self.mesh, self.layer_state
            )
            self.layer_vectors = self.stack.combined_vectors(self.mesh, self.layer_outputs)
        else:
            self.layer_outputs = {}
            self.vertex_costs = jnp.zeros(self.mesh.num_vertices, jnp.float32)
            self.layer_vectors = jnp.zeros((self.mesh.num_vertices, 3), jnp.float32)
        factor = self.config.mesh_map.edge_cost_factor
        self.edge_weights = sweeps.compute_edge_weights(
            self.mesh, self.vertex_costs, factor
        )
        self.slot_weights = sweeps.slot_weights(
            self.mesh, self.edge_weights, self.vertex_costs,
            self.config.planner.cost_limit,
        )
        if not isinstance(self.planner, DijkstraPlanner):
            self.offset_plan = None
            self.banded_plan = None
            # CVP's at-scale path (banded fast-sweeping eikonal kernel):
            # classification is host-side and weight-dependent, so it is
            # (re)built on structural refreshes; the default planner then
            # actually reaches ops/pallas_eikonal.py through
            # get_path_batch instead of the gather solver
            if structural or getattr(self, "eikonal_plan", None) is None:
                self.eikonal_plan = self.planner.prepare_eikonal_plan(
                    np.asarray(self.edge_weights), np.asarray(self.vertex_costs)
                )
            return
        if structural or (self.offset_plan is None and self.banded_plan is None):
            # one host transfer at build time; classification is reused by
            # every subsequent device-side refresh. The offset plan is the
            # banded plan's fallback — skip its build when banded exists
            # (at 1M each host classification costs tens of seconds)
            self.banded_plan = self.planner.prepare_banded_plan(self.slot_weights)
            self.offset_plan = (
                None if self.banded_plan is not None
                else self.planner.prepare_offset_plan(self.slot_weights)
            )
        else:
            from mesh_navigation_tpu.ops import pallas_banded as _pb
            from mesh_navigation_tpu.ops import structured as _structured

            if self.banded_plan is not None:
                # gather-free: planes straight from the cost field (the
                # weight-table path costs ~157 ms of gathers at 1M)
                self.banded_plan = _pb.refresh_banded_planes_from_costs(
                    self.banded_plan, self.vertex_costs,
                    edge_cost_factor=factor,
                    cost_limit=self.config.planner.cost_limit,
                )
            if self.offset_plan is not None:
                self.offset_plan = _structured.refresh_offset_planes(
                    self.offset_plan, self.slot_weights
                )

    def update_point_cloud(self, layer_name: str, points: jax.Array) -> None:
        """Obstacle-layer sensor update -> layer cascade re-evaluation
        (the §3.5 change path, minus DDS). Runs entirely on device: the
        banded/offset solver plans are refreshed via their slot maps
        (structural=False), never rebuilt host-side."""
        self.layer_state[f"obstacle:{layer_name}:points"] = points
        self._refresh_costs(structural=False)
        self.layer_state.pop(f"obstacle:{layer_name}:points", None)

    def make_replan_step(self, layer_name: str, *,
                         inflation_window=(64, 128),
                         warm_window: int | None = None):
        """One-jit live-replan cascade — the FULL §3.5 change path at
        replanning rate: point cloud -> obstacle raycast (process_point_cloud)
        -> layer DAG re-evaluation (inflation wavefront, combination) ->
        edge-weight plane refresh -> INCREMENTAL warm-started field solve
        (banded_solve_padded warm_d/warm_changed with the per-edge
        convergence certificate).

        Returns a jitted `step(points, prev_costs, d_prev, seeds) ->
        (new_costs, d_pad, rounds)`; chain calls by feeding each result's
        (new_costs, d_pad) into the next. Requires a Dijkstra banded plan
        (the headline scale path). The layer cascade mirrors
        layer_manager.cpp:202-263; the incremental solve replaces the
        reference's updateEdgeWeights + full re-plan
        (mesh_map.cpp:563-618).

        `warm_window` (rows, multiple of 128) opts the warm resolve into the
        row-slab windowed solve — worthwhile for SMALL cohorts (a few
        robots) whose shadow cones cluster; at large B the union of
        per-lane shadow cones spans the mesh (measured: a 512-point
        obstacle invalidates labels on all 1024 rows at B=128), the window
        never fits, and its cut-footprint scan costs a field read per
        step — hence default None."""
        if self.stack is None or self.banded_plan is None:
            raise ValueError("replan step needs a layer stack + banded plan")
        from mesh_navigation_tpu.ops import pallas_banded as _pb

        mesh = self.mesh
        stack = self.stack
        base_state = dict(self.layer_state)
        plan0 = self.banded_plan
        pos_planes = _pb.position_planes(plan0, mesh)
        factor = self.config.mesh_map.edge_cost_factor
        cost_limit = self.config.planner.cost_limit
        key_pts = f"obstacle:{layer_name}:points"

        # the reference's change fan-out re-evaluates only DEPENDENTS of
        # the changed layer (layer_manager.cpp:202-263): static layers'
        # outputs are cached at build and only the obstacle-downstream
        # sub-DAG recomputes per update
        affected = {layer_name}
        grew = True
        while grew:
            grew = False
            for c in stack.configs:
                if c.name not in affected and any(
                    i in affected for i in c.inputs
                ):
                    affected.add(c.name)
                    grew = True
        cached_outputs, combined0 = stack.compute(mesh, dict(base_state))
        cached_outputs = {
            n: o for n, o in cached_outputs.items() if n not in affected
        }
        # base planes for the NO-OBSTACLE combined costs, cached once: each
        # update's combined field differs from this base only around the
        # sensed obstacle, so the per-step refresh rewrites just those plane
        # rows (refresh_banded_planes_rows) instead of all ~60 MB of planes.
        # NOTE the module-level jitted helper (not a fresh jit(lambda) per
        # call, which would defeat the jit cache and recompile the ~60 MB
        # refresh every time a step builder is made); the base planes stay
        # resident for the life of the returned step — ~60 MB at 1M on top
        # of the live planes, the price of the rows-only refresh
        base_planes = _refresh_base_planes(
            plan0, combined0, factor, cost_limit
        )

        # base_planes/combined0 ride as jit ARGUMENTS (closure device arrays
        # get baked into the serialized HLO — ~120 MB of planes would trip
        # the remote-compile transport, the r3 CVP lesson)
        def _step(bplanes, comb0, points, prev_costs, d_prev, seeds):
            st = dict(base_state)
            st[key_pts] = points
            # live replan = small changed region: opt the inflation wavefront
            # into the windowed sub-plane solve (full-plane fallback stays
            # in-jit; static builds keep the plain full solve by default)
            st["__inflation_window__"] = inflation_window
            st["__factors__"] = {c.name: c.factor for c in stack.configs}
            outputs = dict(cached_outputs)
            for name in stack.order:
                if name not in affected:
                    continue
                cfg = next(c for c in stack.configs if c.name == name)
                inputs = {i: outputs[i] for i in cfg.inputs}
                outputs[name] = stack.fns[name](mesh, inputs, st)
            combined = outputs[stack.default_layer].costs
            kp = _pb.refresh_banded_planes_rows(
                bplanes, comb0, combined,
                edge_cost_factor=factor, cost_limit=cost_limit,
            )
            changed = _pb.changed_plane_from_costs(plan0, prev_costs, combined)
            # raises and drops are asymmetric: only raised costs can strand
            # stale-low labels, so the invalidation cut keys on the raised
            # plane — a pure CLEAR update (obstacle left the scene) then
            # invalidates nothing and re-solves by relaxation alone
            raised = _pb.raised_plane_from_costs(plan0, prev_costs, combined)
            res = _pb.banded_solve_padded(
                kp, seeds, max_rounds=64, atol=1e-4, rtol=2e-3,
                warm_d=d_prev, warm_changed=changed, warm_raised=raised,
                warm_pos=pos_planes,
                warm_window=warm_window, converge="check",
            )
            return combined, res.d_pad, res.rounds

        jstep = jax.jit(_step)

        def step(points, prev_costs, d_prev, seeds):
            return jstep(base_planes, combined0, points, prev_costs,
                         d_prev, seeds)

        return step

    # ------------------------------------------------------------------
    # GetPath
    # ------------------------------------------------------------------
    def get_path(self, start: jax.Array, goal: jax.Array) -> PlanResult:
        if isinstance(self.planner, DijkstraPlanner):
            return self.planner.plan_one(self.slot_weights, start, goal)
        return self.planner.plan_one(
            self.edge_weights, self.vertex_costs, start, goal,
            layer_vectors=self.layer_vectors,
        )

    def get_path_batch(self, starts: jax.Array, goals: jax.Array) -> PlanResult:
        if isinstance(self.planner, DijkstraPlanner):
            if self.banded_plan is not None:
                return self.planner.plan_batch_banded(
                    self.slot_weights, self.banded_plan, starts, goals
                )
            if self.offset_plan is not None and self.offset_plan.coverage > 0.5:
                return self.planner.plan_batch_structured(
                    self.slot_weights, self.offset_plan, starts, goals
                )
            return self.planner.plan_batch(self.slot_weights, starts, goals)
        if getattr(self, "eikonal_plan", None) is not None:
            return self.planner.plan_batch_banded(
                self.edge_weights, self.eikonal_plan, starts, goals
            )
        return self.planner.plan_batch(self.edge_weights, self.vertex_costs, starts, goals)

    # ------------------------------------------------------------------
    # ExePath
    # ------------------------------------------------------------------
    def set_plan(self, plan: PlanResult) -> ControllerState:
        """setPlan: record the goal pose, reset tracking
        (mesh_controller.cpp:179-193). The vector field travels with the
        PlanResult instead of being copied out of the map."""
        valid = plan.path_valid
        last = jnp.maximum(jnp.sum(valid.astype(jnp.int32)) - 1, 0)
        goal_pos = plan.path_positions[last]
        from mesh_navigation_tpu.mesh import geometry
        goal_dir = geometry.direction_from_pose(plan.path_quats[last])
        return initial_state(goal_pos, goal_dir)

    def exe_path_step(
        self,
        plan: PlanResult,
        position: jax.Array,
        orientation: jax.Array,
        state: ControllerState,
    ):
        return self.controller.compute_velocity(
            plan.vector_map, self.vertex_costs, position, orientation, state
        )

    def is_goal_reached(
        self, position, orientation, state, dist_tol=0.2, angle_tol=0.5
    ):
        return self.controller.is_goal_reached(
            position, orientation, state, dist_tol, angle_tol
        )

    # ------------------------------------------------------------------
    # MoveBase (the combined action MBF builds from GetPath + ExePath +
    # Recovery with patience/retry logic — SURVEY.md §2.2 MBF substrate)
    # ------------------------------------------------------------------
    def navigate(
        self,
        position: jax.Array,
        orientation: jax.Array,
        goal: jax.Array,
        *,
        dist_tolerance: float = 0.3,
        angle_tolerance: float = 3.2,
        max_cycles: int = 2048,
        replan_every: int = 256,
        max_recoveries: int = 2,
        dt: float = 0.05,
    ) -> dict:
        """Closed-loop navigate-to-goal: plan, follow the vector field with
        the controller, replan periodically, and fall back to the recovery
        chain (clear -> rotate) on controller failure — the MoveBase action
        state machine as a host loop over jitted steps.

        Returns {outcome, cycles, recoveries, final_position, path_cost}.
        """
        from mesh_navigation_tpu.control.controller import _quat_mul
        from mesh_navigation_tpu.mesh import geometry

        recoveries = 0
        plan = self.get_path(position, goal)
        if int(plan.outcome) != Outcome.SUCCESS:
            return {
                "outcome": Outcome(int(plan.outcome)), "cycles": 0,
                "recoveries": 0, "final_position": position, "path_cost": float("inf"),
            }
        state = self.set_plan(plan)
        cycles = 0
        while cycles < max_cycles:
            if bool(self.is_goal_reached(position, orientation, state,
                                         dist_tolerance, angle_tolerance)):
                return {
                    "outcome": Outcome.SUCCESS, "cycles": cycles,
                    "recoveries": recoveries, "final_position": position,
                    "path_cost": float(plan.cost),
                }
            cmd, state = self.exe_path_step(plan, position, orientation, state)
            oc = int(cmd.outcome)
            if oc != Outcome.SUCCESS:
                if recoveries >= max_recoveries:
                    return {
                        "outcome": Outcome(oc), "cycles": cycles,
                        "recoveries": recoveries, "final_position": position,
                        "path_cost": float(plan.cost),
                    }
                recoveries += 1
                self.recovery("clear")
                plan = self.get_path(position, goal)
                if int(plan.outcome) != Outcome.SUCCESS:
                    return {
                        "outcome": Outcome(int(plan.outcome)), "cycles": cycles,
                        "recoveries": recoveries, "final_position": position,
                        "path_cost": float("inf"),
                    }
                state = self.set_plan(plan)
                continue
            # integrate the unicycle step
            fwd = geometry.direction_from_pose(orientation)
            up = geometry.direction_from_pose(
                orientation, jnp.asarray([0.0, 0.0, 1.0], orientation.dtype)
            )
            position = position + fwd * cmd.linear * dt
            half = cmd.angular * dt * 0.5
            dq = jnp.concatenate([up * jnp.sin(half), jnp.cos(half)[None]])
            orientation = geometry.normalize(_quat_mul(dq, orientation))
            cycles += 1
            if replan_every and cycles % replan_every == 0:
                plan = self.get_path(position, goal)
                if int(plan.outcome) == Outcome.SUCCESS:
                    state = self.set_plan(plan)._replace(
                        current_face=state.current_face
                    )
        return {
            "outcome": Outcome.PAT_EXCEEDED, "cycles": cycles,
            "recoveries": recoveries, "final_position": position,
            "path_cost": float(plan.cost),
        }

    # ------------------------------------------------------------------
    # services (mesh_navigation_server.cpp:303-328)
    # ------------------------------------------------------------------
    def check_pose_cost(self, position: jax.Array) -> jax.Array:
        """The declared-but-TODO service (mesh_navigation_server.cpp:315-323),
        implemented: combined cost at the surface position (NaN off-map)."""
        from mesh_navigation_tpu.control import tracking

        fix = tracking.locate(self.mesh, self.grid, position, jnp.int32(-1))
        cost = tracking.cost_at(self.mesh, self.vertex_costs, fix.face, fix.bary)
        return jnp.where(fix.found, cost, jnp.nan)

    def check_path_cost(self, positions: jax.Array) -> jax.Array:
        return jax.vmap(self.check_pose_cost)(positions)

    def clear_mesh(self) -> bool:
        """clear_mesh service -> resetLayers (mesh_navigation_server.cpp:
        325-328; the reference's resetLayers is an unimplemented TODO,
        mesh_map.cpp:1307-1310 — implemented here)."""
        for key in [k for k in self.layer_state if k.startswith("obstacle:")]:
            del self.layer_state[key]
        self._refresh_costs(structural=False)
        return True

    # ------------------------------------------------------------------
    # live reconfiguration (the add_on_set_parameters_callback surface:
    # mesh_map.cpp:1362-1400, planner/controller/layer reconfigureCallback)
    # ------------------------------------------------------------------
    def set_parameters(self, params: dict[str, float | str]) -> bool:
        """Apply dotted-name parameter updates and trigger the same targeted
        recomputation the reference does: `mesh_map.edge_cost_factor` ->
        edge-weight recompute (mesh_map.cpp:1362-1400); `<layer>.<param>` ->
        layer re-evaluation cascade (e.g. border_layer.cpp:117-157,
        inflation_layer.cpp:603-667); planner/controller scalars update in
        place."""
        refresh_costs = False
        refresh_layers = False
        for name, value in params.items():
            scope, _, key = name.partition(".")
            if scope == "mesh_map":
                self.config = dataclasses.replace(
                    self.config,
                    mesh_map=dataclasses.replace(self.config.mesh_map, **{key: value}),
                )
                refresh_costs = True
            elif scope == "planner":
                self.config = dataclasses.replace(
                    self.config,
                    planner=dataclasses.replace(self.config.planner, **{key: value}),
                )
                self.planner.config = self.config.planner
                refresh_costs = True  # cost_limit affects slot weights
            elif scope == "controller":
                self.config = dataclasses.replace(
                    self.config,
                    controller=dataclasses.replace(self.config.controller, **{key: value}),
                )
                self.controller.config = self.config.controller
            else:
                # layer-scoped: rebuild that layer's config params
                layers = []
                found = False
                for lc in self.config.layers:
                    if lc.name == scope:
                        found = True
                        params_new = tuple(
                            (k, v) for k, v in lc.params if k != key
                        ) + ((key, float(value)),)
                        layers.append(dataclasses.replace(lc, params=params_new))
                    else:
                        layers.append(lc)
                if not found:
                    return False
                self.config = dataclasses.replace(self.config, layers=tuple(layers))
                refresh_layers = True
        if refresh_layers:
            # rebuild the stack so per-layer closures capture the new params
            self.stack = LayerStack.from_configs(
                self.config.layers, self.config.mesh_map.default_layer or None
            )
            prepared = self.stack.prepare(self.mesh)
            # keep dynamic state (obstacle masks), refresh precomputes
            self.layer_state.update(prepared)
            refresh_costs = True
        if refresh_costs:
            self._refresh_costs()
        return True

    def recovery(self, name: str = "clear", orientation: jax.Array | None = None):
        """Recovery behaviors (mbf_mesh_core/mesh_recovery.h:54-93; the
        reference ships no concrete plugin). 'clear' re-evaluates the layer
        DAG after dropping dynamic obstacle state; 'rotate' returns the
        rotate-in-place command sequence (control/recovery.py)."""
        if name == "clear":
            self.clear_mesh()
            return Outcome.SUCCESS
        if name == "rotate":
            from mesh_navigation_tpu.control import recovery as _recovery

            if orientation is None:
                orientation = jnp.asarray([0.0, 0.0, 0.0, 1.0])
            return _recovery.rotate_in_place(_recovery.RotateRecovery(), orientation)
        return Outcome.INVALID_PLUGIN

    def save_map(self, path: str) -> bool:
        """save_map Trigger service (mesh_map.cpp:141-146): persist the mesh
        bundle + one channel per layer."""
        from mesh_navigation_tpu.mesh import io

        channels = {
            name: np.asarray(out.costs) for name, out in self.layer_outputs.items()
        }
        channels["vertex_costs"] = np.asarray(self.vertex_costs)
        io.save_working_file(path, self.mesh, channels)
        return True
