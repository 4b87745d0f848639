"""Vectorized geometry kernels (barycentric projection, rays, rotations).

Device-side replacements for the reference's scalar geometry kit
(mesh_map/src/util.cpp, mesh_map/src/mesh_map.cpp:992-1305). Every function is
written for batched operands — leading dims broadcast — and is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS_BARY = 0.01  # in/out tolerance — reference util.cpp:345 (EPSILON = 0.01)
EPS_RAY = 1e-8   # parallel-ray epsilon — reference mesh_map.cpp:1192 (kEpsilon)


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.sum(a * b, axis=-1)


def norm(a: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: jax.Array, eps: float = 1e-12) -> jax.Array:
    return a / jnp.maximum(norm(a), eps)[..., None]


def projected_barycentric_coords(
    p: jax.Array, tri: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Barycentric coords of p projected onto triangle tri = [..., 3, 3].

    Heidrich's method — parity with mesh_map::projectedBarycentricCoords
    (util.cpp:320-347). Returns (bary [...,3], signed_dist [...], inside [...]),
    where `inside` uses the reference's 0.01 epsilon band.
    """
    a, b, c = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    u = b - a
    v = c - a
    w = p - a
    n = jnp.cross(u, v)
    nn = dot(n, n)
    inv = 1.0 / jnp.maximum(nn, 1e-24)
    gamma = dot(jnp.cross(u, w), n) * inv
    beta = dot(jnp.cross(w, v), n) * inv
    alpha = 1.0 - gamma - beta
    bary = jnp.stack([alpha, beta, gamma], axis=-1)
    dist = dot(n, w) / jnp.maximum(jnp.sqrt(nn), 1e-12)
    inside = jnp.all((bary >= -EPS_BARY) & (bary <= 1.0 + EPS_BARY), axis=-1)
    inside = inside & (nn > 1e-24)
    return bary, dist, inside


def bary_interpolate(values: jax.Array, bary: jax.Array) -> jax.Array:
    """Σ bary_k · values_k over the triangle corner axis.

    values: [..., 3] or [..., 3, C]; bary: [..., 3]. Parity with
    mesh_map::linearCombineBarycentricCoords (util.h:178-203).
    """
    if values.ndim == bary.ndim:
        return jnp.sum(values * bary, axis=-1)
    return jnp.sum(values * bary[..., None], axis=-2)


def rotate_about_axis(vec: jax.Array, axis: jax.Array, theta: jax.Array) -> jax.Array:
    """Rodrigues rotation of vec around unit axis by angle theta.

    Replaces lvr2's `Vector::rotated(normal, theta)` used by the CVP vector
    field (cvp_mesh_planner.cpp:229-234).
    """
    axis = normalize(axis)
    c = jnp.cos(theta)[..., None]
    s = jnp.sin(theta)[..., None]
    return (
        vec * c
        + jnp.cross(axis, vec) * s
        + axis * dot(axis, vec)[..., None] * (1.0 - c)
    )


def ray_triangle_intersect(
    orig: jax.Array, direction: jax.Array, tri: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Batched ray/triangle intersection.

    Geometric method with inside-outside tests, matching
    MeshMap::rayTriangleIntersect (mesh_map.cpp:1247-1305) — one-sided (hits
    only front faces w.r.t. the CCW normal) and unbounded in t (the reference
    does not reject t<0; we do reject t<0 for raycaster use, see `hit`).

    Returns (t [...], hit [...]).
    """
    v0, v1, v2 = tri[..., 0, :], tri[..., 1, :], tri[..., 2, :]
    n = jnp.cross(v1 - v0, v2 - v0)
    denom = dot(n, n)
    nd = dot(n, direction)
    parallel = jnp.abs(nd) < EPS_RAY
    t = dot(n, v0 - orig) / jnp.where(parallel, 1.0, nd)
    p = orig + direction * t[..., None]

    def edge_ok(e0, e1):
        return dot(n, jnp.cross(e1 - e0, p - e0)) >= 0.0

    inside = edge_ok(v0, v1) & edge_ok(v1, v2) & edge_ok(v2, v0)
    hit = inside & ~parallel & (denom > 1e-24) & (t >= 0.0)
    return t, hit


def pose_from_direction(
    position: jax.Array, direction: jax.Array, normal: jax.Array
) -> jax.Array:
    """Quaternion (x, y, z, w) for a pose at `position` facing `direction`
    with up-axis `normal` — parity with mesh_map::calculatePoseFromDirection
    (util.cpp:267-285): ez = normal, ey = normal × direction, ex = ey × normal.
    """
    ez = normalize(normal)
    ey = normalize(jnp.cross(ez, direction))
    ex = normalize(jnp.cross(ey, ez))
    # rotation matrix with columns ex, ey, ez -> quaternion
    m = jnp.stack([ex, ey, ez], axis=-1)  # [..., 3(row), 3(col)]
    return _mat_to_quat(m)


def _mat_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix [...,3,3] -> quaternion [...,4] (x,y,z,w), branch-free."""
    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick numerically-stable one per element
    qw = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    qx = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    qy = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    qz = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    qx = jnp.copysign(qx, m[..., 2, 1] - m[..., 1, 2])
    qy = jnp.copysign(qy, m[..., 0, 2] - m[..., 2, 0])
    qz = jnp.copysign(qz, m[..., 1, 0] - m[..., 0, 1])
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return normalize(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by quaternion q = (x, y, z, w)."""
    u = q[..., :3]
    w = q[..., 3:4]
    return v + 2.0 * jnp.cross(u, jnp.cross(u, v) + w * v)


def direction_from_pose(quat: jax.Array, axis: jax.Array | None = None) -> jax.Array:
    """Unit direction of a pose quaternion along a body axis (default +x).

    Parity with MeshController::poseToDirectionVector
    (mesh_controller.cpp:202-214).
    """
    if axis is None:
        axis = jnp.array([1.0, 0.0, 0.0], dtype=quat.dtype)
    return quat_rotate(quat, jnp.broadcast_to(axis, quat[..., :3].shape))
