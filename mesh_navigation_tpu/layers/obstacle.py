"""Obstacle layer: live sensor point clouds -> lethal vertices.

Parity with mesh_layers/src/obstacle_layer.cpp: per cloud, transform into the
map frame (156-175), rotate the configured `down_axis` (184-208), range-filter
(214-227), batch-raycast every point along the down axis (229-239), mark all
three vertices of faces hit within `robot_height` as cost ∞ + lethal
(241-256), then diff against the previous lethal set (258-274).

TPU re-design: the Embree raycast becomes the batched device raycast
(ops/raycast.py); the std::set difference becomes boolean mask ops; the whole
update is one jitted function of (points, previous lethal mask).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mesh_navigation_tpu.config import LayerConfig
from mesh_navigation_tpu.layers.base import LayerOutput, register_layer, zero_vectors
from mesh_navigation_tpu.mesh.arrays import MeshArrays
from mesh_navigation_tpu.ops import raycast

INF = jnp.inf


class ObstacleParams(NamedTuple):
    """obstacle_layer.cpp:32-110 parameter defaults."""
    robot_height: float = 1.0
    min_range: float = 0.0
    max_range: float = 10.0
    down_axis: tuple[float, float, float] = (0.0, 0.0, -1.0)


def process_point_cloud(
    mesh: MeshArrays,
    points: jax.Array,          # [N, 3] in map frame (invalid rows -> nan ok)
    params: ObstacleParams,
    *,
    sensor_origin: jax.Array | None = None,
    face_grid: "raycast.FaceGrid2D | None" = None,
    face_grid3d: "raycast.FaceGrid3D | None" = None,
) -> jax.Array:
    """Returns the new lethal mask [V] bool.

    Points are range-filtered around `sensor_origin` (obstacle_layer.cpp:
    214-227), rays are cast from each point along `down_axis`, and faces hit
    within `robot_height` make their three vertices lethal (241-256). With a
    `face_grid` and a vertical down axis the cast uses the xy face bins;
    arbitrary down axes use the 3D DDA grid (`face_grid3d`) — hits beyond
    robot_height are discarded anyway, so the walk only needs to cover that
    distance. Brute force is the no-grid fallback.
    """
    down = jnp.asarray(params.down_axis, jnp.float32)
    down = down / jnp.maximum(jnp.linalg.norm(down), 1e-12)
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    if sensor_origin is not None:
        rng = jnp.linalg.norm(points - sensor_origin, axis=-1)
        finite = finite & (rng >= params.min_range) & (rng <= params.max_range)
    safe_points = jnp.where(finite[:, None], points, 0.0)
    vertical = tuple(params.down_axis[:2]) == (0.0, 0.0)
    if face_grid is not None and vertical:
        t, face_id, hit = raycast.raycast_vertical(
            mesh, face_grid, safe_points, down=params.down_axis[2] < 0
        )
    elif face_grid3d is not None:
        import numpy as _np

        n_steps = int(
            _np.ceil(params.robot_height / max(face_grid3d.cell_size_static, 1e-6))
        ) + 2
        dirs = jnp.broadcast_to(down, safe_points.shape)
        t, face_id, hit = raycast.raycast_grid(
            mesh, face_grid3d, safe_points, dirs, n_steps=n_steps
        )
    else:
        dirs = jnp.broadcast_to(down, safe_points.shape)
        t, face_id, hit = raycast.raycast_bruteforce(mesh, safe_points, dirs)
    hit = hit & finite & (t <= params.robot_height)
    # scatter only the <= N hit faces' vertices (obstacle_layer.cpp:241-256)
    # — routing through a dense [F] face-hit table costs a [F] -> [V]
    # scatter pass over the whole mesh per update (~60 ms at 2M faces)
    vids = mesh.faces[jnp.where(hit, face_id, 0)]            # [N, 3]
    lethal = jnp.zeros(mesh.num_vertices, bool).at[vids.reshape(-1)].max(
        jnp.repeat(hit, 3)
    )
    return lethal


def lethal_diff(prev: jax.Array, new: jax.Array) -> jax.Array:
    """Symmetric difference of lethal sets as a changed-vertex mask
    (obstacle_layer.cpp:258-274)."""
    return prev ^ new


@register_layer("obstacle")
def make_obstacle(cfg: LayerConfig):
    params = ObstacleParams(
        robot_height=cfg.param("robot_height", 1.0),
        min_range=cfg.param("min_range", 0.0),
        max_range=cfg.param("max_range", 10.0),
    )

    def fn(mesh: MeshArrays, inputs: dict, state) -> LayerOutput:
        # Live state: the most recent lethal mask, injected via
        # state["obstacle:<name>:points"] or ...":lethal" by the runtime.
        key_pts = f"obstacle:{cfg.name}:points"
        key_lethal = f"obstacle:{cfg.name}:lethal"
        if key_pts in state:
            lethal = process_point_cloud(
                mesh, state[key_pts], params,
                face_grid=state.get("__face_grid__"),
                face_grid3d=state.get("clearance:grid3d")
                or state.get("__face_grid3d__"),
            )
            state[key_lethal] = lethal
        elif key_lethal in state:
            lethal = state[key_lethal]
        else:
            lethal = jnp.zeros(mesh.num_vertices, bool)
        costs = jnp.where(lethal, INF, 0.0).astype(jnp.float32)
        return LayerOutput(costs=costs, lethal=lethal, vectors=zero_vectors(mesh))

    def prepare(m: MeshArrays) -> dict:
        return {"__face_grid__": raycast.build_face_grid(m)}

    fn.prepare = prepare  # type: ignore[attr-defined]
    return fn
