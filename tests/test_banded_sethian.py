"""Shift-based Sethian inflation solve vs the gather eikonal fixed point."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, reorder, synthetic
from mesh_navigation_tpu.ops import banded_sethian as bs
from mesh_navigation_tpu.ops import eikonal


def _compare(mesh, lethal_ids, cap=np.inf, rtol=1e-4):
    V = mesh.num_vertices
    seed = np.full(V, np.inf, np.float32)
    seed[lethal_ids] = 0.0
    seed = jnp.asarray(seed)

    plan = bs.build_sethian_plan(mesh)
    d_banded = np.asarray(
        bs.sethian_distances_banded(plan, seed, source_cap=cap)
    )
    ref = eikonal.eikonal_field(
        mesh, mesh.edge_dist, seed, update="sethian", source_cap=cap,
        max_sweeps=512,
    )
    d_ref = np.asarray(ref.dist)
    fin = np.isfinite(d_ref)
    assert (np.isfinite(d_banded) == fin).all()
    np.testing.assert_allclose(d_banded[fin], d_ref[fin], rtol=rtol, atol=1e-5)
    return plan


def test_terrain_grid_matches_gather():
    v, f = synthetic.terrain_mesh(
        24, 24, spacing=0.5, hills=1.0, roughness=0.05, seed=2
    )
    mesh = build_mesh(v, f)
    plan = _compare(mesh, [100, 301, 302])
    assert plan.n_residual == 0  # clean grid: fully dense patterns


def test_terrain_grid_with_cap():
    v, f = synthetic.terrain_mesh(
        20, 20, spacing=0.5, hills=1.5, roughness=0.03, seed=5
    )
    mesh = build_mesh(v, f)
    _compare(mesh, [210], cap=1.2)


def test_irregular_reordered_matches_gather():
    v, f = synthetic.irregular_terrain_mesh(
        20, 20, spacing=0.5, jitter=0.4, hills=1.0, roughness=0.02, seed=7
    )
    mesh = reorder.build_reordered_mesh(v, f)
    _compare(mesh, [50, 222])
