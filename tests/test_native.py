"""Native meshcore vs numpy fallback parity + C++ Dijkstra baseline parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.utils import oracle

native = pytest.importorskip("mesh_navigation_tpu.native")


@pytest.fixture(scope="module")
def pair():
    if not native.available():
        pytest.skip("no native toolchain")
    v, f = synthetic.terrain_mesh(16, 16, hills=1.0, roughness=0.05, seed=4)
    return (
        build_mesh(v, f, use_native=True),
        build_mesh(v, f, use_native=False),
    )


def test_counts_match(pair):
    mn, mp = pair
    assert mn.num_vertices == mp.num_vertices
    assert mn.num_faces == mp.num_faces
    assert mn.num_edges == mp.num_edges
    assert int(mn.boundary_vertex.sum()) == int(mp.boundary_vertex.sum())


def test_edge_set_matches(pair):
    mn, mp = pair
    en = {tuple(sorted(e)) for e in np.asarray(mn.edges).tolist()}
    ep = {tuple(sorted(e)) for e in np.asarray(mp.edges).tolist()}
    assert en == ep


def test_adjacency_matches(pair):
    mn, mp = pair
    an = np.asarray(mn.adj_vertex)
    mn_mask = np.asarray(mn.adj_mask)
    ap = np.asarray(mp.adj_vertex)
    mp_mask = np.asarray(mp.adj_mask)
    for v in range(mn.num_vertices):
        assert set(an[v][mn_mask[v]]) == set(ap[v][mp_mask[v]])


def test_field_solutions_match(pair):
    """Same fixed point regardless of construction path."""
    mn, mp = pair
    costs = jnp.zeros(mn.num_vertices, jnp.float32)
    ewn = sweeps.compute_edge_weights(mn, costs, 0.0)
    Wn = sweeps.slot_weights(mn, ewn, costs, 1.0)
    ewp = sweeps.compute_edge_weights(mp, costs, 0.0)
    Wp = sweeps.slot_weights(mp, ewp, costs, 1.0)
    dn = sweeps.shortest_path_field(mn, Wn, jnp.int32(3)).dist
    dp = sweeps.shortest_path_field(mp, Wp, jnp.int32(3)).dist
    np.testing.assert_allclose(np.asarray(dn), np.asarray(dp), rtol=1e-5)


def test_native_dijkstra_matches_python_oracle(pair):
    mn, _ = pair
    rng = np.random.default_rng(2)
    costs = rng.uniform(0, 0.8, mn.num_vertices).astype(np.float32)
    ew = np.asarray(sweeps.compute_edge_weights(mn, jnp.asarray(costs), 1.0))
    nm = native.NativeMesh(np.asarray(mn.vertices), np.asarray(mn.faces))
    dn, pn = nm.dijkstra(ew, costs, 7, 1.0)
    # python oracle over the same arrays
    do, po = oracle.dijkstra_oracle(
        mn.num_vertices, oracle.mesh_adjacency(mn), ew, costs, 7, 1.0
    )
    np.testing.assert_allclose(dn, do, rtol=1e-5, atol=1e-5)


def test_native_radius_neighborhood(pair):
    from mesh_navigation_tpu.layers.local import radius_neighborhood

    mn, mp = pair
    # both code paths must produce the same neighbor sets
    n1, m1 = radius_neighborhood(mn, 2.0)
    pos = np.asarray(mn.vertices)
    for v in (0, 50, 100):
        got = set(n1[v][m1[v]])
        # brute force: BFS-reachable within Euclidean radius — superset check
        d = np.linalg.norm(pos - pos[v], axis=1)
        ball = set(np.flatnonzero((d <= 2.0))) - {v}
        assert got <= ball
        assert len(got) > 0


def test_native_cvp_matches_python_oracle(pair):
    mn, _ = pair
    rng = np.random.default_rng(5)
    costs = rng.uniform(0, 0.5, mn.num_vertices).astype(np.float32)
    ew = np.asarray(sweeps.compute_edge_weights(mn, jnp.asarray(costs), 1.0))
    nm = native.NativeMesh(np.asarray(mn.vertices), np.asarray(mn.faces))
    tb = nm.tables()
    seeds = np.asarray([3, 4, 20], np.int32)
    sd = np.asarray([0.0, 0.4, 0.25], np.float32)
    dn, pn, thn = nm.cvp(ew, costs, seeds, sd, 2.0)
    vf = oracle.mesh_vertex_faces(mn)
    do, po, tho, _ = oracle.cvp_oracle(
        tb["faces"], tb["face_edges"], vf, ew.astype(np.float64), costs,
        list(seeds), list(sd), 2.0,
    )
    fin = np.isfinite(do)
    assert (np.isfinite(dn) == fin).all()
    np.testing.assert_allclose(dn[fin], do[fin], rtol=1e-5, atol=1e-5)
    assert (pn == po).mean() > 0.999
    np.testing.assert_allclose(thn, tho, rtol=1e-4, atol=1e-5)
