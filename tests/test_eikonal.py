"""Face-parallel eikonal sweeps vs. sequential fast-marching oracles."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import eikonal, sweeps
from mesh_navigation_tpu.utils import oracle


def test_single_triangle_sethian():
    """The reference's own kernel unit test: unit right triangle, two corners
    seeded at 0, free corner must get exactly the triangle height 1/sqrt(2)
    toward the hypotenuse... with the (1,0),(0,1) hypotenuse seeds at 0 and
    the right-angle corner free, the geodesic distance is 0.5·sqrt(2)
    (inflation_layer_test.cpp:62-76 asserts 0.5 for its configuration)."""
    v, f = synthetic.single_triangle()
    m = build_mesh(v, f)
    # seed vertices 1 and 2 (the hypotenuse) at 0; vertex 0 free
    seed = jnp.asarray([np.inf, 0.0, 0.0], jnp.float32)
    res = eikonal.eikonal_field(m, m.edge_dist, seed, update="sethian", max_sweeps=8)
    # distance from the segment x+y=1 to the origin corner = 1/sqrt(2)
    np.testing.assert_allclose(float(res.dist[0]), 1 / np.sqrt(2), rtol=1e-5)


def test_unfolding_matches_oracle_flat(grid_mesh_small):
    m = grid_mesh_small
    costs = np.zeros(m.num_vertices, np.float32)
    seed_vs = [0, 1, 8]
    seed_ds = [0.0, 0.0, 0.0]
    seed = np.full(m.num_vertices, np.inf, np.float32)
    for v, d in zip(seed_vs, seed_ds):
        seed[v] = d
    res = eikonal.eikonal_field(
        m, m.edge_dist, jnp.asarray(seed), update="unfolding",
        target_mask=jnp.asarray(costs) < 1.0,
    )
    od, op, oth, ocut = oracle.cvp_oracle(
        np.asarray(m.faces), np.asarray(m.face_edges), oracle.mesh_vertex_faces(m),
        np.asarray(m.edge_dist), costs, seed_vs, seed_ds,
    )
    np.testing.assert_allclose(np.asarray(res.dist), od, rtol=2e-4, atol=2e-4)


def test_unfolding_matches_oracle_terrain(terrain_mesh_medium):
    m = terrain_mesh_medium
    rng = np.random.default_rng(1)
    costs = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    ew = np.asarray(sweeps.compute_edge_weights(m, jnp.asarray(costs), 1.0))
    goal = 500
    seed = np.full(m.num_vertices, np.inf, np.float32)
    seed[goal] = 0.0
    res = eikonal.eikonal_field(
        m, jnp.asarray(ew), jnp.asarray(seed), update="unfolding",
        target_mask=jnp.asarray(costs) < 1.0,
    )
    od, *_ = oracle.cvp_oracle(
        np.asarray(m.faces), np.asarray(m.face_edges), oracle.mesh_vertex_faces(m),
        ew, costs, [goal], [0.0],
    )
    ours = np.asarray(res.dist)
    both = np.isfinite(ours) & np.isfinite(od)
    # FIM vs FMM ordering can differ slightly on obtuse fans; BASELINE.md
    # tolerance is 1% — we check a much tighter bound.
    rel = np.abs(ours[both] - od[both]) / np.maximum(od[both], 1e-3)
    assert rel.max() < 5e-3, rel.max()
    assert (np.isfinite(ours) == np.isfinite(od)).mean() > 0.999


def test_inflation_distances_match_oracle(grid_mesh_small):
    from mesh_navigation_tpu.layers import inflation as infl

    m = grid_mesh_small
    lethal = np.zeros(m.num_vertices, bool)
    lethal[27] = lethal[28] = True
    p = infl.InflationParams(inflation_radius=2.5, inscribed_radius=1.0)
    res = infl.inflation_distances(m, jnp.asarray(lethal), p)
    od = oracle.inflation_oracle(
        np.asarray(m.faces), np.asarray(m.face_edges), oracle.mesh_vertex_faces(m),
        np.asarray(m.edge_dist), lethal, p.inflation_radius,
    )
    ours = np.asarray(res.dist)
    both = np.isfinite(ours) & np.isfinite(od)
    np.testing.assert_allclose(ours[both], od[both], rtol=1e-4, atol=1e-4)


def test_fading_contract():
    """Piecewise fading (inflation_layer.cpp:315-339 / the reference's own
    fading test inflation_layer_test.cpp:83-100)."""
    from mesh_navigation_tpu.layers.inflation import InflationParams, fading

    p = InflationParams(
        inscribed_radius=0.25, inflation_radius=0.4,
        lethal_value=2.0, inscribed_value=1.0, cost_scaling_factor=1.0,
    )
    d = jnp.asarray([0.0, 0.1, 0.25, 0.3, 0.4, 0.5])
    out = np.asarray(fading(d, p))
    assert out[0] == 2.0                    # lethal at 0
    assert out[1] == 1.0 and out[2] == 1.0  # inscribed band
    np.testing.assert_allclose(out[3], 1.0 * np.exp(-1.0 * (0.3 - 0.25)), rtol=1e-5)
    np.testing.assert_allclose(out[4], 1.0 * np.exp(-1.0 * (0.4 - 0.25)), rtol=1e-5)
    assert out[5] == 0.0                    # beyond inflation radius


def test_repulsive_field_points_away(grid_mesh_small):
    from mesh_navigation_tpu.layers import inflation as infl

    m = grid_mesh_small
    lethal = np.zeros(m.num_vertices, bool)
    # a 2x2 lethal cluster around (3..4, 3..4) — a single isolated seed
    # inflates nothing (faces need two fixed corners, matching the
    # reference's two-free-vertices skip, inflation_layer.cpp:470-474)
    for v in (27, 28, 35, 36):
        lethal[v] = True
    p = infl.InflationParams(inflation_radius=3.0)
    res = infl.inflation_distances(m, jnp.asarray(lethal), p)
    vec = np.asarray(infl.repulsive_field(m, res.dist))
    pos = np.asarray(m.vertices)
    d = np.asarray(res.dist)
    reach = np.isfinite(d) & (d > 0) & (np.linalg.norm(vec, axis=1) > 0.5)
    assert reach.sum() > 10
    center = pos[[27, 28, 35, 36]].mean(axis=0)
    away = pos[reach] - center
    cos = np.sum(vec[reach] * away, axis=1) / np.maximum(np.linalg.norm(away, axis=1), 1e-9)
    # repulsive vectors predominantly point away from the obstacle
    assert (cos > 0.0).mean() > 0.9


def test_fmm_update_variant(grid_mesh_small):
    """The USE_UPDATE_FMM compile-flag variant (cvp_mesh_planner.cpp:559-649):
    on a flat grid with Euclidean side lengths all three update rules must
    produce near-identical potentials."""
    m = grid_mesh_small
    # CVP-style goal-face seeding (three vertices of face [0, 8, 9])
    seed = np.full(m.num_vertices, np.inf, np.float32)
    seed[0], seed[8], seed[9] = 0.0, 1.0, np.sqrt(2.0)
    res_u = eikonal.eikonal_field(m, m.edge_dist, jnp.asarray(seed), update="unfolding")
    res_f = eikonal.eikonal_field(m, m.edge_dist, jnp.asarray(seed), update="fmm")
    u = np.asarray(res_u.dist)
    f = np.asarray(res_f.dist)
    fin = np.isfinite(u) & np.isfinite(f)
    assert fin.sum() > 60
    # the textbook quadratic is a coarser update than unfolding: fields agree
    # to a few percent (they are distinct rules in the reference as well)
    np.testing.assert_allclose(f[fin], u[fin], rtol=4e-2, atol=1e-3)
    # fmm predecessors point downhill
    pred = np.asarray(res_f.pred)
    has = pred != np.arange(m.num_vertices)
    assert (f[pred[has]] <= f[has] + 1e-5).all()


def test_with_s_update_variant(grid_mesh_small):
    """USE_UPDATE_WITH_S variant (cvp_mesh_planner.cpp:249-367): on flat
    triangulations its potentials track the unfolding update closely."""
    m = grid_mesh_small
    seed = np.full(m.num_vertices, np.inf, np.float32)
    seed[0], seed[8], seed[9] = 0.0, 1.0, np.sqrt(2.0)
    res_u = eikonal.eikonal_field(m, m.edge_dist, jnp.asarray(seed), update="unfolding")
    res_s = eikonal.eikonal_field(m, m.edge_dist, jnp.asarray(seed), update="with_s")
    u = np.asarray(res_u.dist)
    s = np.asarray(res_s.dist)
    fin = np.isfinite(u) & np.isfinite(s)
    assert fin.sum() > 60
    np.testing.assert_allclose(s[fin], u[fin], rtol=5e-2, atol=1e-3)
    pred = np.asarray(res_s.pred)
    has = pred != np.arange(m.num_vertices)
    assert (s[pred[has]] <= s[has] + 1e-5).all()
