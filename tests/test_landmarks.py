"""Landmark two-level structure: upper-bound validity + exactness of
warm-started solves."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.ops import sweeps, ordered, landmarks


def test_warm_start_is_upper_bound_and_exact(terrain_mesh_medium):
    m = terrain_mesh_medium
    rng = np.random.default_rng(0)
    costs = jnp.asarray(rng.uniform(0, 0.6, m.num_vertices).astype(np.float32))
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)
    table = landmarks.build_landmarks(m, W, ew, num_landmarks=48)
    assert table.lm_vertex.shape[0] > 8

    plan = ordered.SweepPlan(chunks=jnp.zeros((1, 1, 1), jnp.int32), num_vertices=m.num_vertices)
    seeds = jnp.asarray([5, 700], jnp.int32)
    init = landmarks.warm_start(table, seeds)
    cold = ordered.batched_field_hybrid(m, W, plan, seeds, ordered_rounds=0)
    iv = np.asarray(init[: m.num_vertices]).T
    cd = np.asarray(cold.dist)
    fin = np.isfinite(cd)
    # warm start is a valid upper bound everywhere the field is reachable
    assert (iv[fin] >= cd[fin] - 1e-5).all()
    # warm-started solve reaches the identical fixed point
    warm = ordered.batched_field_hybrid(
        m, W, plan, seeds, ordered_rounds=0, init_vb=init
    )
    np.testing.assert_allclose(np.asarray(warm.dist), cd, rtol=1e-5)


def test_multi_source_voronoi(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    ew = sweeps.compute_edge_weights(m, costs, 0.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)
    sources = jnp.asarray([0, 63], jnp.int32)
    dist, label = landmarks.multi_source_field(m, W, sources)
    d = np.asarray(dist)
    lab = np.asarray(label)
    assert d[0] == 0 and d[63] == 0
    assert lab[0] == 0 and lab[63] == 1
    # each vertex is labeled by its truly nearest source
    d0 = np.asarray(sweeps.shortest_path_field(m, W, jnp.int32(0)).dist)
    d1 = np.asarray(sweeps.shortest_path_field(m, W, jnp.int32(63)).dist)
    np.testing.assert_allclose(d, np.minimum(d0, d1), rtol=1e-5)
    strict = np.abs(d0 - d1) > 1e-5
    np.testing.assert_array_equal(lab[strict], (d1 < d0)[strict].astype(np.int32))
