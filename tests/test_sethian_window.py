"""Windowed Sethian solve: certified-exact fast path vs full-plane rounds.

The live-replan cascade runs inflation on a static-shape window positioned
around the lethal set (ops/banded_sethian.py window=); the window result is
accepted only under escape certificates, so every case here must match the
full solve EXACTLY — including when the wave outgrows the window (fallback)
and when the mesh has residual (off-pattern) corners."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, reorder, synthetic
from mesh_navigation_tpu.ops import banded_sethian as bs


def _check(mesh, lethal_ids, cap, window):
    V = mesh.num_vertices
    seed = np.full(V, np.inf, np.float32)
    seed[lethal_ids] = 0.0
    seed = jnp.asarray(seed)
    plan = bs.build_sethian_plan(mesh)
    d_full = np.asarray(
        bs.sethian_distances_banded(plan, seed, source_cap=cap)
    )
    d_win = np.asarray(
        bs.sethian_distances_banded(plan, seed, source_cap=cap, window=window)
    )
    assert (np.isfinite(d_win) == np.isfinite(d_full)).all()
    fin = np.isfinite(d_full)
    np.testing.assert_allclose(d_win[fin], d_full[fin], rtol=1e-6, atol=1e-6)
    return plan


def test_window_small_obstacle_grid():
    v, f = synthetic.terrain_mesh(48, 48, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=3)
    mesh = build_mesh(v, f)
    centre = 24 * 48 + 20
    ids = [centre, centre + 1, centre + 48, centre + 49]
    _check(mesh, ids, cap=2.0, window=(32, 32))


def test_window_fallback_when_wave_outgrows():
    # cap large enough that the wave must hit the window border ->
    # certificate rejects -> in-jit fallback must still be exact
    v, f = synthetic.terrain_mesh(40, 40, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=4)
    mesh = build_mesh(v, f)
    _check(mesh, [20 * 40 + 20], cap=50.0, window=(24, 24))


def test_window_seed_near_plane_edge():
    v, f = synthetic.terrain_mesh(40, 40, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=5)
    mesh = build_mesh(v, f)
    _check(mesh, [3, 40 + 2], cap=1.5, window=(32, 32))


def test_window_no_seeds():
    v, f = synthetic.terrain_mesh(24, 24, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=6)
    mesh = build_mesh(v, f)
    plan = bs.build_sethian_plan(mesh)
    seed = jnp.full(mesh.num_vertices, jnp.inf, jnp.float32)
    d = np.asarray(
        bs.sethian_distances_banded(plan, seed, source_cap=2.0,
                                    window=(32, 32))
    )
    assert not np.isfinite(d).any()


def test_window_irregular_residuals():
    # irregular reordered meshes carry residual corners; the certificate
    # must route to fallback whenever one could fire
    v, f = synthetic.irregular_terrain_mesh(
        32, 32, spacing=0.5, jitter=0.4, hills=1.0, roughness=0.02, seed=8
    )
    mesh = reorder.build_reordered_mesh(v, f)
    plan = _check(mesh, [16 * 32 + 10, 16 * 32 + 11], cap=1.5,
                  window=(24, 32))
    assert plan.n_residual > 0


def test_window_spread_seeds_dont_fit():
    # seeds far apart -> bbox exceeds the window -> fits=False fallback
    v, f = synthetic.terrain_mesh(48, 48, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=9)
    mesh = build_mesh(v, f)
    _check(mesh, [5 * 48 + 5, 40 * 48 + 44], cap=1.0, window=(24, 24))
