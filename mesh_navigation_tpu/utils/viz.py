"""Visualization / observability exports.

The reference publishes a rich topic surface for RViz: mesh geometry +
vertex colors, per-layer vertex costs, vector-field line markers, paths
(SURVEY.md §5 metrics/observability; mesh_map.cpp:674-990). Without DDS, the
same artifacts are exported as files: rainbow-colored PLY meshes for cost
fields (exact colormap parity with mesh_map::getRainbowColor,
util.cpp:401-433), OBJ line sets for vector fields and paths. Everything a
late-joining subscriber would have received can be regenerated on demand
from returned data — observability is data, not topics.
"""

from __future__ import annotations

import numpy as np


def rainbow_color(values: np.ndarray) -> np.ndarray:
    """Vectorized parity with mesh_map::getRainbowColor (util.cpp:411-433):
    value in [0,1] -> (r, g, b). Non-finite values -> black (the reference
    returns a zero ColorRGBA for them, util.cpp:403-404)."""
    v = np.asarray(values, np.float64)
    finite = np.isfinite(v)
    v = np.clip(np.where(finite, v, 0.0), 0.0, 1.0)
    h = v * 5.0 + 1.0
    i = np.floor(h).astype(np.int64)
    f = h - i
    f = np.where(i % 2 == 0, 1.0 - f, f)  # if i is even
    n = 1.0 - f
    r = np.select([i <= 1, i == 2, i == 3, i == 4, i >= 5], [n, 0.0, 0.0, n, 1.0])
    g = np.select([i <= 1, i == 2, i == 3, i == 4, i >= 5], [0.0, n, 1.0, 1.0, n])
    b = np.select([i <= 1, i == 2, i == 3, i == 4, i >= 5], [1.0, 1.0, n, 0.0, 0.0])
    rgb = np.stack([r, g, b], axis=-1)
    rgb[~finite] = 0.0
    return rgb


def write_cost_ply(
    path: str,
    vertices: np.ndarray,
    faces: np.ndarray,
    costs: np.ndarray,
    *,
    normalize: bool = True,
) -> None:
    """Colored-mesh export of a per-vertex cost field (the ~/vertex_costs
    channel a MeshVertexCostsStamped subscriber renders)."""
    vertices = np.asarray(vertices, np.float32)
    faces = np.asarray(faces, np.int64)
    c = np.asarray(costs, np.float64)
    if normalize:
        finite = np.isfinite(c)
        lo = c[finite].min() if finite.any() else 0.0
        hi = c[finite].max() if finite.any() else 1.0
        c = (c - lo) / max(hi - lo, 1e-9)
    rgb = (rainbow_color(c) * 255).astype(np.uint8)
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(vertices)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        fh.write(f"element face {len(faces)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for (x, y, z), (r, g, b) in zip(vertices, rgb):
            fh.write(f"{x} {y} {z} {r} {g} {b}\n")
        for a, b_, c_ in faces:
            fh.write(f"3 {a} {b_} {c_}\n")


def write_vector_field_obj(
    path: str,
    origins: np.ndarray,
    vectors: np.ndarray,
    *,
    scale: float = 0.5,
    stride: int = 1,
) -> None:
    """Line-list export of a vector field (the ~/vector_field marker,
    mesh_map.cpp:839-990): one segment per vertex, origin -> origin + v·scale."""
    o = np.asarray(origins, np.float32)[::stride]
    v = np.asarray(vectors, np.float32)[::stride]
    keep = np.linalg.norm(v, axis=1) > 1e-9
    o, v = o[keep], v[keep]
    with open(path, "w") as fh:
        for p in o:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        for p in o + v * scale:
            fh.write(f"v {p[0]} {p[1]} {p[2]}\n")
        n = len(o)
        for i in range(n):
            fh.write(f"l {i + 1} {i + 1 + n}\n")


def write_path_obj(path: str, positions: np.ndarray, valid: np.ndarray | None = None) -> None:
    """Polyline export of a planned path (the planners' ~/path topic)."""
    p = np.asarray(positions, np.float32)
    if valid is not None:
        p = p[np.asarray(valid, bool)]
    with open(path, "w") as fh:
        for q in p:
            fh.write(f"v {q[0]} {q[1]} {q[2]}\n")
        fh.write("l " + " ".join(str(i + 1) for i in range(len(p))) + "\n")
