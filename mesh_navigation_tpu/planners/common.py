"""Shared planner plumbing: plan results, pose chains, batching helpers."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.mesh import geometry


class PlanResult(NamedTuple):
    """One planning solve — the GetPath action result surface
    (mbf_mesh_core/mesh_planner.h:71-84): outcome code, pose chain, cost,
    plus the potential + vector field the controller consumes."""
    outcome: jax.Array         # [] i32 Outcome code
    path_positions: jax.Array  # [L, 3] f32 (padded)
    path_quats: jax.Array      # [L, 4] f32 pose orientations (x,y,z,w)
    path_valid: jax.Array      # [L] bool
    cost: jax.Array            # [] f32 summed segment lengths
    potential: jax.Array       # [V] f32
    vector_map: jax.Array      # [V, 3] f32
    pred: jax.Array            # [V] i32
    # Batched light-path extras (None on per-plan results): the solver's
    # native lane-minor field [V, B] — reading it avoids materializing the
    # [B, V] `potential` transpose (1 GB at 1M x 256; XLA dead-code
    # eliminates `potential` when only potential_vb is consumed) — and the
    # robot->solver-lane column map for it (the light solve runs lanes in
    # sorted-goal order; potential_vb keeps that order).
    potential_vb: jax.Array | None = None   # [V, B] f32, solver lane order
    lane_map: jax.Array | None = None       # [B] i32 column of robot b
    # solver-native padded field [Rp, Cp, Bp] (banded light path only) —
    # feed it back as `warm_d` for the incremental changed-region resolve.
    # Unused fields are dead-code-eliminated when this result is produced
    # inside an enclosing jit.
    d_pad: jax.Array | None = None


def pose_chain(
    positions: jax.Array,   # [L, 3]
    valid: jax.Array,       # [L]
    normals: jax.Array,     # [L, 3] up-axis per pose
) -> tuple[jax.Array, jax.Array]:
    """Orient each pose toward the next position with the local normal as the
    up axis (mesh_map::calculatePoseFromPosition, util.cpp:286-298; used by
    both planners' makePlan). Returns (quats [L, 4], cost []). The final
    valid pose keeps the previous direction."""
    nxt = jnp.roll(positions, -1, axis=0)
    seg = nxt - positions
    seg_len = jnp.linalg.norm(seg, axis=-1)
    pair_valid = valid & jnp.roll(valid, -1)
    pair_valid = pair_valid.at[-1].set(False)
    # last valid pose reuses the direction of the previous segment
    safe_dir = jnp.where(
        pair_valid[:, None], seg, jnp.roll(seg, 1, axis=0)
    )
    safe_dir = jnp.where(
        jnp.linalg.norm(safe_dir, axis=-1, keepdims=True) > 1e-9,
        safe_dir,
        jnp.array([1.0, 0.0, 0.0]),
    )
    quats = geometry.pose_from_direction(positions, safe_dir, normals)
    cost = jnp.sum(jnp.where(pair_valid, seg_len, 0.0))
    return quats, cost
