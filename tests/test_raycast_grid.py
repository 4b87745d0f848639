"""FaceGrid3D DDA raycast vs the brute-force oracle — same hits, any ray
direction, plus the grid-backed clearance layer path."""

import numpy as np
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import raycast


def _terrain():
    v, f = synthetic.terrain_mesh(18, 18, spacing=0.5, hills=2.0,
                                  roughness=0.05, seed=5)
    return build_mesh(v, f)


def test_grid_matches_bruteforce_random_rays():
    m = _terrain()
    g = raycast.build_face_grid3d(m)
    rng = np.random.default_rng(0)
    N = 64
    o = np.stack(
        [
            rng.uniform(1, 10, N),
            rng.uniform(1, 10, N),
            rng.uniform(3.0, 6.0, N),
        ],
        axis=1,
    ).astype(np.float32)
    d = rng.normal(size=(N, 3)).astype(np.float32)
    d[:, 2] = -np.abs(d[:, 2]) - 0.3          # generally downward
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    t_b, f_b, hit_b = raycast.raycast_bruteforce(
        m, jnp.asarray(o), jnp.asarray(d), face_chunk=512
    )
    # steps sized to cross the whole terrain AABB
    t_g, f_g, hit_g = raycast.raycast_grid(
        m, g, jnp.asarray(o), jnp.asarray(d), n_steps=48
    )
    hb, hg = np.asarray(hit_b), np.asarray(hit_g)
    np.testing.assert_array_equal(hb, hg)
    np.testing.assert_allclose(
        np.asarray(t_g)[hg], np.asarray(t_b)[hb], rtol=1e-4, atol=1e-5
    )
    # face id can differ only at shared-edge grazing ties; t must match
    same = np.asarray(f_g)[hg] == np.asarray(f_b)[hb]
    assert same.mean() > 0.95


def test_grid_vertical_matches_facegrid2d():
    m = _terrain()
    g3 = raycast.build_face_grid3d(m)
    g2 = raycast.build_face_grid(m)
    rng = np.random.default_rng(1)
    N = 64
    o = np.stack(
        [rng.uniform(1, 10, N), rng.uniform(1, 10, N), np.full(N, 8.0)],
        axis=1,
    ).astype(np.float32)
    d = np.tile(np.asarray([0.0, 0.0, -1.0], np.float32), (N, 1))
    t2, f2, h2 = raycast.raycast_vertical(m, g2, jnp.asarray(o), down=True)
    t3, f3, h3 = raycast.raycast_grid(m, g3, jnp.asarray(o), jnp.asarray(d),
                                      n_steps=64)
    np.testing.assert_array_equal(np.asarray(h2), np.asarray(h3))
    np.testing.assert_allclose(
        np.asarray(t3)[np.asarray(h3)], np.asarray(t2)[np.asarray(h2)],
        rtol=1e-4, atol=1e-5,
    )


def test_clearance_grid_matches_bruteforce():
    m = _terrain()
    g = raycast.build_face_grid3d(m)
    c_brute = np.asarray(raycast.vertex_clearance(m, 0.9, face_chunk=512))
    c_grid = np.asarray(raycast.vertex_clearance_grid(m, g, 0.9))
    np.testing.assert_allclose(c_grid, c_brute, rtol=1e-4, atol=1e-4)


def test_clearance_layer_uses_grid():
    from mesh_navigation_tpu.config import LayerConfig
    from mesh_navigation_tpu.layers import LayerStack

    m = _terrain()
    stack = LayerStack.from_configs(
        (LayerConfig(name="clear", kind="clearance", params=()),), "clear"
    )
    state = stack.prepare(m)
    assert "clearance:grid3d" in state
    outs, combined = stack.compute(m, state)
    assert np.asarray(combined).shape == (m.num_vertices,)
    assert np.isfinite(np.asarray(combined)).all()
