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
