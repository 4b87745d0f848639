"""Sharded solve on the 8-device virtual CPU mesh vs the single-device solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.parallel import (
    make_device_mesh, shard_weights, sharded_field_solve,
)


@pytest.mark.parametrize("n_mesh,n_batch", [(4, 2), (2, 4), (8, 1)])
def test_sharded_matches_single(grid_mesh_small, n_mesh, n_batch):
    if len(jax.devices()) < n_mesh * n_batch:
        pytest.skip("needs 8 virtual devices")
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    ew = sweeps.compute_edge_weights(m, costs, 0.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)

    dmesh = make_device_mesh(n_mesh, n_batch)
    sw = shard_weights(m, W, n_mesh)
    seeds = jnp.asarray([0, 7, 56, 63], jnp.int32)
    dist = sharded_field_solve(sw, seeds, dmesh, max_sweeps=256)
    for i, s in enumerate([0, 7, 56, 63]):
        ref = sweeps.shortest_path_field(m, W, jnp.int32(s)).dist
        np.testing.assert_allclose(
            np.asarray(dist[i, : m.num_vertices]), np.asarray(ref), rtol=1e-5
        )
    # padded tail stays unreached
    assert np.isinf(np.asarray(dist[:, m.num_vertices :])).all()


@pytest.mark.parametrize("n_mesh,n_batch", [(4, 2), (8, 1)])
def test_partitioned_halo_matches_single(terrain_mesh_medium, n_mesh, n_batch):
    from mesh_navigation_tpu.parallel import partition as pt

    if len(jax.devices()) < n_mesh * n_batch:
        pytest.skip("needs 8 virtual devices")
    m = terrain_mesh_medium
    rng = np.random.default_rng(5)
    costs = jnp.asarray(rng.uniform(0, 0.6, m.num_vertices).astype(np.float32))
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    W = sweeps.slot_weights(m, ew, costs, 1.0)
    part = pt.build_partition(m, W, n_mesh)
    dmesh = make_device_mesh(n_mesh, n_batch)
    seeds = jnp.asarray([3, 500, 900, 77], jnp.int32)
    dist = pt.partitioned_field_solve(part, seeds, dmesh, max_sweeps=1024)
    for i, s in enumerate([3, 500, 900, 77]):
        ref = sweeps.shortest_path_field(m, W, jnp.int32(s)).dist
        fin = np.isfinite(np.asarray(ref))
        ours = np.asarray(dist[i, : m.num_vertices])
        assert (np.isfinite(ours) == fin).all()
        np.testing.assert_allclose(ours[fin], np.asarray(ref)[fin], rtol=1e-5)
