"""Sharded banded GS solver: exact parity vs the single-device kernel and
the heap-Dijkstra oracle on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import pallas_banded, sweeps
from mesh_navigation_tpu.parallel import sharded_banded as sb
from mesh_navigation_tpu.utils import oracle


def test_sharded_matches_single_and_oracle():
    v, f = synthetic.terrain_mesh(
        24, 24, spacing=0.5, hills=1.5, roughness=0.03, seed=5
    )
    m = build_mesh(v, f)
    rng = np.random.default_rng(4)
    costs = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    ew = sweeps.compute_edge_weights(m, jnp.asarray(costs), 1.0)
    W = sweeps.slot_weights(m, ew, jnp.asarray(costs), 1.0)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    assert plan.n_residual == 0

    seeds = jnp.asarray([3, 101, 399], jnp.int32)
    single = pallas_banded.batched_field_banded_pallas(
        m, W, plan, seeds, atol=0.0, rtol=0.0
    )

    n = min(8, len(jax.devices()))
    splan = sb.build_sharded_banded_plan(plan, n, interpret=True)
    dmesh = Mesh(np.array(jax.devices()[:n]), ("shard",))
    dist, rounds, converged = sb.sharded_banded_solve(
        splan, seeds, dmesh, interpret=True
    )
    assert bool(converged)
    d_sh = np.asarray(dist)                       # [V, B]
    d_si = np.asarray(single.dist).T              # [V, B]
    fin = np.isfinite(d_si)
    assert (np.isfinite(d_sh) == fin).all()
    np.testing.assert_allclose(d_sh[fin], d_si[fin], rtol=1e-6, atol=1e-6)

    # heap oracle, lane 1
    adj = oracle.mesh_adjacency(m)
    od, _ = oracle.dijkstra_oracle(
        m.num_vertices, adj, np.asarray(ew), costs, 101, 1.0
    )
    ofin = np.isfinite(od)
    np.testing.assert_allclose(
        d_sh[:, 1][ofin], od[ofin], rtol=1e-5, atol=1e-5
    )


def test_sharded_irregular_residual_parity():
    """Residual (jittered-Delaunay) meshes through the sharded kernel:
    per-shard residual lists + G-row ghosts must reproduce the single-device
    fixed point and the heap oracle exactly (VERDICT r4 #5 — the sharded
    story for the reference's real input class)."""
    from mesh_navigation_tpu.mesh import reorder

    v, f = synthetic.irregular_terrain_mesh(
        20, 20, spacing=0.5, jitter=0.45, hills=1.0, roughness=0.01, seed=3
    )
    m = reorder.build_reordered_mesh(v, f)
    rng = np.random.default_rng(6)
    costs = rng.uniform(0.0, 0.5, m.num_vertices).astype(np.float32)
    ew = sweeps.compute_edge_weights(m, jnp.asarray(costs), 1.0)
    W = sweeps.slot_weights(m, ew, jnp.asarray(costs), 2.0)
    plan = pallas_banded.build_banded_kernel_plan(m, W)
    assert plan.n_residual > 0   # genuinely irregular

    seeds = jnp.asarray([7, 120, 311], jnp.int32)
    single = pallas_banded.batched_field_banded_pallas(
        m, W, plan, seeds, atol=0.0, rtol=0.0
    )

    n = min(8, len(jax.devices()))
    splan = sb.build_sharded_banded_plan(plan, n, interpret=True)
    assert splan.n_residual > 0
    dmesh = Mesh(np.array(jax.devices()[:n]), ("shard",))
    dist, rounds, converged = sb.sharded_banded_solve(
        splan, seeds, dmesh, interpret=True
    )
    assert bool(converged)
    d_sh = np.asarray(dist)
    d_si = np.asarray(single.dist).T
    fin = np.isfinite(d_si)
    assert (np.isfinite(d_sh) == fin).all()
    np.testing.assert_allclose(d_sh[fin], d_si[fin], rtol=1e-6, atol=1e-6)

    adj = oracle.mesh_adjacency(m)
    od, _ = oracle.dijkstra_oracle(
        m.num_vertices, adj, np.asarray(ew), costs, 120, 2.0
    )
    ofin = np.isfinite(od)
    np.testing.assert_allclose(
        d_sh[:, 1][ofin], od[ofin], rtol=1e-5, atol=1e-5
    )
