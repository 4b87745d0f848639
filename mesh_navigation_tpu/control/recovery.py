"""Recovery behaviors — concrete MeshRecovery plugins.

The reference defines the MeshRecovery plugin contract
(mbf_mesh_core/mesh_recovery.h:54-93) and an execution wrapper
(mesh_recovery_execution.cpp:41-53) but ships NO concrete recovery plugin
in-repo (SURVEY.md §5 failure detection). This module provides the two
classic behaviors MBF deployments pair with it, as pure functions:

- `clear_layers`: drop dynamic obstacle state and re-evaluate the cost DAG
  (the costmap-clearing recovery; wired to MeshNavServer.recovery("clear"));
- `rotate_in_place`: command sequence spinning the robot to re-acquire the
  vector field after tracking loss (the rotate recovery).

Both run cooperatively and return MBF outcome codes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.config import ControllerConfig
from mesh_navigation_tpu.mesh import geometry


class RotateRecovery(NamedTuple):
    """Parameters for the rotate-in-place behavior."""
    angular_velocity: float = 0.5      # rad/s command magnitude
    target_angle: float = 2.0 * 3.14159265  # rotate a full turn by default
    dt: float = 0.05


def rotate_in_place(
    params: RotateRecovery,
    orientation: jax.Array,    # [4] current quaternion
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Generate the (linear, angular) command sequence for the rotation and
    the per-step heading quaternions.

    Returns (linear [T], angular [T], quats [T, 4]) with T derived from the
    target angle; a caller executes them at its control rate and may stop
    early once the controller re-acquires the field (cooperative cancel).
    """
    steps = max(1, int(params.target_angle / (params.angular_velocity * params.dt)))
    linear = jnp.zeros(steps, jnp.float32)
    angular = jnp.full(steps, params.angular_velocity, jnp.float32)
    up = geometry.direction_from_pose(
        orientation, jnp.asarray([0.0, 0.0, 1.0], orientation.dtype)
    )

    def step(q, _):
        half = params.angular_velocity * params.dt * 0.5
        dq = jnp.concatenate([up * jnp.sin(half), jnp.cos(half)[None]])
        from mesh_navigation_tpu.control.controller import _quat_mul

        nq = geometry.normalize(_quat_mul(dq, q))
        return nq, nq

    _, quats = jax.lax.scan(step, orientation, None, length=steps)
    return linear, angular, quats


def clear_layers(server) -> Outcome:
    """Costmap-clearing recovery: reset dynamic layer state and re-run the
    DAG (MeshNavServer.clear_mesh)."""
    return Outcome.SUCCESS if server.clear_mesh() else Outcome.FAILURE
