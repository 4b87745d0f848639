"""MeshArrays structural invariants (the incidence queries the reference gets
from lvr2::PMPMesh — SURVEY.md §2.2)."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic


def test_single_triangle():
    v, f = synthetic.single_triangle()
    m = build_mesh(v, f)
    assert m.num_vertices == 3 and m.num_faces == 1 and m.num_edges == 3
    np.testing.assert_allclose(
        np.sort(np.asarray(m.edge_dist)), [1.0, 1.0, np.sqrt(2)], rtol=1e-6
    )
    assert bool(m.boundary_vertex.all())
    # face normal is +z for CCW (0,0,0),(1,0,0),(0,1,0)
    np.testing.assert_allclose(np.asarray(m.face_normals[0]), [0, 0, 1], atol=1e-6)


def test_grid_counts(grid_mesh_small):
    m = grid_mesh_small
    n = 8
    assert m.num_vertices == n * n
    assert m.num_faces == 2 * (n - 1) ** 2
    # Euler: V - E + F = 1 for a disk
    assert m.num_vertices - m.num_edges + m.num_faces == 1


def test_face_edges_opposite(grid_mesh_small):
    """face_edges[f,k] must be the edge between corners k+1 and k+2."""
    m = grid_mesh_small
    faces = np.asarray(m.faces)
    edges = np.asarray(m.edges)
    fe = np.asarray(m.face_edges)
    for f in range(min(20, m.num_faces)):
        for k in range(3):
            a, b = faces[f, (k + 1) % 3], faces[f, (k + 2) % 3]
            e = edges[fe[f, k]]
            assert {a, b} == set(e.tolist())


def test_adjacency_symmetric(grid_mesh_small):
    m = grid_mesh_small
    adj = np.asarray(m.adj_vertex)
    mask = np.asarray(m.adj_mask)
    for v in range(m.num_vertices):
        for j in range(m.max_degree):
            if mask[v, j]:
                u = adj[v, j]
                assert v in adj[u][mask[u]]


def test_vertex_face_corner(grid_mesh_small):
    m = grid_mesh_small
    vf = np.asarray(m.vertex_faces)
    vc = np.asarray(m.vertex_face_corner)
    vm = np.asarray(m.vertex_faces_mask)
    faces = np.asarray(m.faces)
    for v in range(m.num_vertices):
        for j in range(vf.shape[1]):
            if vm[v, j]:
                assert faces[vf[v, j], vc[v, j]] == v


def test_vertex_normals_flat(grid_mesh_small):
    np.testing.assert_allclose(
        np.asarray(grid_mesh_small.vertex_normals),
        np.tile([0, 0, 1.0], (64, 1)),
        atol=1e-5,
    )


def test_sphere_closed(sphere_mesh):
    m = sphere_mesh
    assert not bool(m.boundary_vertex.any())
    assert m.num_vertices - m.num_edges + m.num_faces == 2
    # vertex normals point radially outward on a sphere
    pos = np.asarray(m.vertices)
    nrm = np.asarray(m.vertex_normals)
    cos = np.sum(pos / np.linalg.norm(pos, axis=1, keepdims=True) * nrm, axis=1)
    assert cos.min() > 0.9
