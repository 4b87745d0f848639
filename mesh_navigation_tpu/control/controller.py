"""Vector-field-following local controller, batched over poses.

Capability parity with mesh_controller (SURVEY.md §2.1 C15): per control
cycle, track the robot's face on the surface, sample the planner's direction
field and the combined cost at the barycentric position, and emit (linear,
angular) velocities via the `naiveControl` law (mesh_controller.cpp:225-242).
The reference runs one robot per MBF execution thread; here the step is a
pure function `(state, pose) -> (cmd, state)` that `vmap`s across thousands
of simultaneous rollouts (BASELINE.json configs[2]).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.config import ControllerConfig
from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.mesh import geometry, query
from mesh_navigation_tpu.control import tracking


class ControllerState(NamedTuple):
    """Per-agent tracking state (MeshController's current_face_ / goal,
    mesh_controller.h + setPlan, mesh_controller.cpp:179-193)."""
    current_face: jax.Array  # [] i32 (-1 = unknown -> global search)
    goal_pos: jax.Array      # [3]
    goal_dir: jax.Array      # [3]
    cancel: jax.Array        # [] bool


class VelocityCommand(NamedTuple):
    linear: jax.Array    # [] f32 (m/s along +x)
    angular: jax.Array   # [] f32 (rad/s around +z)
    outcome: jax.Array   # [] i32
    cost: jax.Array      # [] f32 combined cost under the robot
    heading_error: jax.Array  # [] f32 φ (published as ~/current_angle)


def initial_state(plan_goal_pos: jax.Array, plan_goal_dir: jax.Array) -> ControllerState:
    """setPlan equivalent: record the goal pose, reset the tracked face
    (mesh_controller.cpp:179-193)."""
    return ControllerState(
        current_face=jnp.int32(-1),
        goal_pos=plan_goal_pos,
        goal_dir=geometry.normalize(plan_goal_dir),
        cancel=jnp.bool_(False),
    )


def naive_control(
    robot_dir: jax.Array,
    mesh_dir: jax.Array,
    mesh_normal: jax.Array,
    config: ControllerConfig,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """The reference control law (MeshController::naiveControl,
    mesh_controller.cpp:225-242): heading error φ = acos(mesh_dir·robot_dir)
    signed by (mesh_dir × robot_dir)·normal; angular ∝ φ; linear fades
    linearly to 0 as φ -> max_angle. Returns (linear, angular, φ)."""
    cosphi = jnp.clip(jnp.sum(mesh_dir * robot_dir), -1.0, 1.0)
    phi = jnp.arccos(cosphi)
    sign_phi = jnp.sum(jnp.cross(mesh_dir, robot_dir) * mesh_normal)
    angular = jnp.copysign(
        phi * config.max_ang_velocity / jnp.pi, -sign_phi
    )
    max_angle = config.max_angle * jnp.pi / 180.0
    linear = jnp.where(
        phi <= max_angle,
        config.max_lin_velocity - phi * config.max_lin_velocity / max_angle,
        0.0,
    )
    return linear, angular, phi


class MeshController:
    """MeshController-shaped facade (mbf_mesh_core/mesh_controller.h:51-115)."""

    def __init__(
        self,
        mesh: MeshArrays,
        config: ControllerConfig = ControllerConfig(),
        *,
        grid: Optional[query.SpatialGrid] = None,
    ):
        self.mesh = mesh
        self.config = config
        self.grid = grid if grid is not None else query.build_grid(mesh)

    @functools.partial(jax.jit, static_argnums=0)
    def compute_velocity(
        self,
        vector_map: jax.Array,    # [V, 3] planner field (copied at setPlan)
        vertex_costs: jax.Array,  # [V]
        position: jax.Array,      # [3] robot position
        orientation: jax.Array,   # [4] robot quaternion (x,y,z,w)
        state: ControllerState,
    ) -> tuple[VelocityCommand, ControllerState]:
        """One control cycle (MeshController::computeVelocityCommands,
        mesh_controller.cpp:67-170)."""
        fix = tracking.locate(
            self.mesh, self.grid, position, state.current_face,
            max_dist=self.config.max_search_distance,
        )
        raw_dir = tracking.direction_at(self.mesh, vector_map, fix.face, fix.bary)
        return self._finish_velocity(fix, raw_dir, vertex_costs, orientation, state)

    @functools.partial(jax.jit, static_argnums=0)
    def compute_velocity_pred(
        self,
        pred: jax.Array,          # [V] i32 predecessor map (Dijkstra field)
        vertex_costs: jax.Array,
        position: jax.Array,
        orientation: jax.Array,
        state: ControllerState,
    ) -> tuple[VelocityCommand, ControllerState]:
        """Control cycle sampling the direction field directly from the
        predecessor map (normalize(pos[pred]-pos), the Dijkstra vector-map
        definition, dijkstra_mesh_planner.cpp:189-209) at just the tracked
        face's vertices — the large-mesh path where materializing a per-
        scenario [V, 3] field (3 GB at 1M x 256) is off the table."""
        from mesh_navigation_tpu.ops import sweeps as _sweeps

        fix = tracking.locate(
            self.mesh, self.grid, position, state.current_face,
            max_dist=self.config.max_search_distance,
        )
        vids = self.mesh.faces[jnp.maximum(fix.face, 0)]
        rows = _sweeps.vector_rows_from_predecessors(self.mesh, pred, vids)
        raw_dir = geometry.bary_interpolate(rows, fix.bary)
        return self._finish_velocity(fix, raw_dir, vertex_costs, orientation, state)

    @functools.partial(
        jax.jit, static_argnums=0,
        static_argnames=("tol", "lane_minor", "padded_flat"),
    )
    def compute_velocity_banded(
        self,
        kernel_plan,              # ops.pallas_banded.BandedKernelPlan
        dist_bv: jax.Array,       # [B, V] labels; [V, B] when lane_minor
                                  # (PlanResult.potential_vb + lane_map —
                                  # skips the 1 GB potential transpose)
        vertex_costs: jax.Array,  # [V]
        positions: jax.Array,     # [B, 3]
        orientations: jax.Array,  # [B, 4]
        states: ControllerState,  # batched ([B] leaves)
        *,
        tol: float = 1e-5,
        lane_minor: bool = False,
        lane_map: jax.Array | None = None,
        padded_flat: bool = False,
    ) -> tuple[VelocityCommand, ControllerState]:
        """Batched control cycle on the banded solver's label field: the
        direction rows are recovered on the fly (pred_at_vertices) at just
        the tracked face's 3 vertices per lane — no [B, V] pred map and no
        [B, V, 3] vector field ever materialize (the 1M x 256 light path).
        Same control law as compute_velocity_pred, batched over lanes.

        `tol` must match the solve dtype: labels from a bfloat16 solve carry
        ~0.4% relative error, so the "neighbor explains the label" check in
        pred_at_vertices needs tol=1e-2 (the same dtype-dependent tolerance
        plan_batch_banded uses); the f32 default is 1e-5."""
        from mesh_navigation_tpu.ops import pallas_banded as _pb

        mesh = self.mesh
        fix = tracking.locate_batch(
            mesh, self.grid, positions, states.current_face,
            max_dist=self.config.max_search_distance,
        )
        vids = mesh.faces[jnp.maximum(fix.face, 0)]            # [B, 3]
        preds = _pb.pred_at_vertices(
            kernel_plan, dist_bv, vids, tol=tol,
            lane_minor=lane_minor, lane_map=lane_map, padded_flat=padded_flat,
        )                                                      # [B, 3]
        d = mesh.vertices[preds] - mesh.vertices[vids]
        unit = d / jnp.maximum(
            jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12
        )
        rows = jnp.where((preds != vids)[..., None], unit, 0.0)  # [B, 3, 3]
        raw_dir = jax.vmap(geometry.bary_interpolate)(rows, fix.bary)
        return jax.vmap(
            lambda f, rd, o, s: self._finish_velocity(
                f, rd, vertex_costs, o, s
            )
        )(fix, raw_dir, orientations, states)

    @functools.partial(jax.jit, static_argnums=0, static_argnames=("tol",))
    def compute_velocity_cvp(
        self,
        side_lengths: jax.Array,  # [E] the CVP solve's edge weights
        dist_bv: jax.Array,       # [B, V] converged eikonal field
        vertex_costs: jax.Array,  # [V]
        positions: jax.Array,     # [B, 3]
        orientations: jax.Array,  # [B, 4]
        states: ControllerState,  # batched ([B] leaves)
        *,
        tol: float = 1e-3,
    ) -> tuple[VelocityCommand, ControllerState]:
        """Batched control cycle on the CVP eikonal field — the at-scale
        planner->controller contract (SURVEY §1: "the vector field is the
        planner->controller contract", cvp_mesh_planner.cpp:204-239 /
        mesh_controller.cpp:182): directions are recovered lazily at the
        tracked face's 3 vertices (winning triangle candidate + θ rotation)
        instead of materializing a [B, V, 3] field. The CVP twin of
        compute_velocity_banded."""
        from mesh_navigation_tpu.ops import pallas_eikonal as _pe

        mesh = self.mesh
        fix = tracking.locate_batch(
            mesh, self.grid, positions, states.current_face,
            max_dist=self.config.max_search_distance,
        )
        vids = mesh.faces[jnp.maximum(fix.face, 0)]            # [B, 3]
        rows = _pe.cvp_rows_at_vertices(
            mesh, side_lengths, dist_bv, vids, tol=tol
        )                                                      # [B, 3, 3]
        raw_dir = jax.vmap(geometry.bary_interpolate)(rows, fix.bary)
        return jax.vmap(
            lambda f, rd, o, s: self._finish_velocity(
                f, rd, vertex_costs, o, s
            )
        )(fix, raw_dir, orientations, states)

    def _finish_velocity(
        self, fix, raw_dir, vertex_costs, orientation, state
    ) -> tuple[VelocityCommand, ControllerState]:
        cfg = self.config
        robot_dir = geometry.direction_from_pose(orientation)
        mesh_dir = geometry.normalize(raw_dir)
        has_dir = jnp.linalg.norm(raw_dir) > 1e-9
        cost = tracking.cost_at(self.mesh, vertex_costs, fix.face, fix.bary)
        # the control-plane normal is the robot's own up axis
        # (mesh_controller.cpp:158: poseToDirectionVector(pose, (0,0,1)))
        up = geometry.direction_from_pose(
            orientation, jnp.array([0.0, 0.0, 1.0], orientation.dtype)
        )
        linear, angular, phi = naive_control(robot_dir, mesh_dir, up, cfg)
        linear = jnp.minimum(cfg.max_lin_velocity, linear * cfg.lin_vel_factor)
        angular = jnp.minimum(cfg.max_ang_velocity, angular * cfg.ang_vel_factor)

        outcome = jnp.where(
            state.cancel,
            Outcome.CANCELED,
            jnp.where(
                ~fix.found,
                Outcome.OUT_OF_MAP,
                jnp.where(~has_dir, Outcome.FAILURE, Outcome.SUCCESS),
            ),
        ).astype(jnp.int32)
        ok = outcome == Outcome.SUCCESS
        cmd = VelocityCommand(
            linear=jnp.where(ok, linear, 0.0),
            angular=jnp.where(ok, angular, 0.0),
            outcome=outcome,
            cost=cost,
            heading_error=phi,
        )
        new_state = state._replace(current_face=fix.face)
        return cmd, new_state

    @functools.partial(jax.jit, static_argnums=0)
    def is_goal_reached(
        self,
        position: jax.Array,
        orientation: jax.Array,
        state: ControllerState,
        dist_tolerance: float | jax.Array,
        angle_tolerance: float | jax.Array,
    ) -> jax.Array:
        """Distance + heading tolerance check (mesh_controller.cpp:172-177)."""
        robot_dir = geometry.direction_from_pose(orientation)
        goal_distance = jnp.linalg.norm(state.goal_pos - position)
        ang = jnp.arccos(jnp.clip(jnp.sum(state.goal_dir * robot_dir), -1.0, 1.0))
        return (goal_distance <= dist_tolerance) & (ang <= angle_tolerance)

    @functools.partial(jax.jit, static_argnums=(0, 6))
    def rollout(
        self,
        vector_map: jax.Array,
        vertex_costs: jax.Array,
        position: jax.Array,      # [3]
        orientation: jax.Array,   # [4]
        state: ControllerState,
        num_steps: int = 128,
        dt: float = 0.05,
    ):
        """Closed-loop kinematic rollout: integrate the unicycle model under
        the control law — the batched receding-horizon evaluation that
        replaces the reference's one-robot execution thread. Returns
        (positions [T, 3], commands VelocityCommand[T], final_state)."""
        mesh = self.mesh

        def step(carry, _):
            pos, quat, st = carry
            cmd, st = self.compute_velocity(vector_map, vertex_costs, pos, quat, st)
            fwd = geometry.direction_from_pose(quat)
            up = geometry.direction_from_pose(quat, jnp.array([0.0, 0.0, 1.0], quat.dtype))
            new_pos = pos + fwd * cmd.linear * dt
            # rotate orientation around the up axis by angular·dt
            half = cmd.angular * dt * 0.5
            dq = jnp.concatenate([up * jnp.sin(half), jnp.cos(half)[None]])
            new_quat = _quat_mul(dq, quat)
            return (new_pos, new_quat, st), (new_pos, cmd)

        (pos, quat, st), (traj, cmds) = jax.lax.scan(
            step, (position, orientation, state), None, length=num_steps
        )
        return traj, cmds, st


def _quat_mul(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, (x, y, z, w) convention."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )
