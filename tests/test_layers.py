"""Layer engine tests: DAG composition, local layers, combination, obstacle."""

import numpy as np
import jax.numpy as jnp
import pytest

from mesh_navigation_tpu.config import LayerConfig
from mesh_navigation_tpu.layers import LayerStack
from mesh_navigation_tpu.mesh import build_mesh, synthetic


def test_topo_order_and_cycle():
    cfgs = (
        LayerConfig(name="c", kind="max_combination", inputs=("a", "b")),
        LayerConfig(name="a", kind="steepness"),
        LayerConfig(name="b", kind="border"),
    )
    stack = LayerStack.from_configs(cfgs)
    assert stack.order.index("c") > stack.order.index("a")
    assert stack.order.index("c") > stack.order.index("b")
    assert stack.default_layer == "c"

    with pytest.raises(ValueError):
        LayerStack.from_configs(
            (
                LayerConfig(name="x", kind="steepness", inputs=("y",)),
                LayerConfig(name="y", kind="max_combination", inputs=("x",)),
            )
        )


def test_steepness_and_border(grid_mesh_small):
    m = grid_mesh_small
    stack = LayerStack.from_configs(
        (
            LayerConfig(name="steep", kind="steepness"),
            LayerConfig(name="border", kind="border"),
            LayerConfig(name="combine", kind="max_combination", inputs=("steep", "border")),
        )
    )
    outs, combined = stack.compute(m, stack.prepare(m))
    # flat grid: steepness 0 everywhere
    np.testing.assert_allclose(np.asarray(outs["steep"].costs), 0.0, atol=1e-3)
    # border ring costs 1, interior 0
    b = np.asarray(outs["border"].costs).reshape(8, 8)
    assert (b[0] == 1.0).all() and (b[-1] == 1.0).all()
    assert (b[1:-1, 1:-1] == 0.0).all()
    # combined = max
    np.testing.assert_allclose(
        np.asarray(combined), np.asarray(outs["border"].costs), atol=1e-3
    )
    assert bool(outs["border"].lethal.reshape(8, 8)[0, 0])


def test_height_diff_on_step():
    """A sharp z-step must light up the height-diff layer near the step."""
    v, f = synthetic.grid_mesh(8, 8, height_fn=lambda x, y: np.where(x > 3.5, 1.0, 0.0))
    m = build_mesh(v, f)
    stack = LayerStack.from_configs(
        (LayerConfig(name="hd", kind="height_diff", params=(("radius", 1.5), ("threshold", 0.5))),)
    )
    outs, _ = stack.compute(m, stack.prepare(m))
    c = np.asarray(outs["hd"].costs).reshape(8, 8)
    assert (c[3:5] >= 0.9).all()       # along the cliff
    assert (c[0] < 0.1).all()          # far from it
    lethal = np.asarray(outs["hd"].lethal).reshape(8, 8)
    assert lethal[3:5].all() and not lethal[0].any()


def test_roughness_flat_vs_noisy():
    v, f = synthetic.grid_mesh(10, 10)
    flat = build_mesh(v, f)
    vn, fn_ = synthetic.terrain_mesh(10, 10, roughness=0.4, seed=5)
    noisy = build_mesh(vn, fn_)
    cfg = (LayerConfig(name="r", kind="roughness", params=(("radius", 1.5),)),)
    s1 = LayerStack.from_configs(cfg)
    o1, _ = s1.compute(flat, s1.prepare(flat))
    s2 = LayerStack.from_configs(cfg)
    o2, _ = s2.compute(noisy, s2.prepare(noisy))
    assert float(o1["r"].costs.mean()) < 0.01
    assert float(o2["r"].costs.mean()) > 0.2


def test_avg_combination_weights(grid_mesh_small):
    m = grid_mesh_small
    stack = LayerStack.from_configs(
        (
            LayerConfig(name="b1", kind="border"),
            LayerConfig(name="b2", kind="border"),
            LayerConfig(
                name="avg", kind="avg_combination", inputs=("b1", "b2"),
                params=(("weight:b1", 0.25), ("weight:b2", 0.5)),
            ),
        )
    )
    outs, combined = stack.compute(m, stack.prepare(m))
    expect = 0.75 * np.asarray(outs["b1"].costs)
    np.testing.assert_allclose(np.asarray(combined), expect, rtol=1e-6)


def test_clearance_under_ceiling():
    """Two stacked planes: the lower one's clearance equals the gap."""
    v1, f1 = synthetic.grid_mesh(6, 6)
    v2 = v1 + np.asarray([0, 0, 0.6], np.float32)
    # upper plane faces flipped so its normal points down (closed-ish scene)
    f2 = f1[:, ::-1] + len(v1)
    m = build_mesh(np.concatenate([v1, v2]), np.concatenate([f1, f2]))
    stack = LayerStack.from_configs(
        (LayerConfig(name="cl", kind="clearance", params=(("robot_height", 0.5), ("height_inflation", 0.3))),)
    )
    outs, _ = stack.compute(m, stack.prepare(m))
    c = np.asarray(outs["cl"].costs)
    lower = c[: len(v1)].reshape(6, 6)
    # gap 0.6 is between robot_height (0.5) and 0.8 -> faded cost in (0, 1)
    interior = lower[1:-1, 1:-1]
    assert (interior > 0.05).all() and (interior < 1.0).all()
    # upper plane has open sky above (normals point down though) — just check
    # no NaNs anywhere
    assert np.isfinite(c).all()


def test_obstacle_layer(grid_mesh_small):
    from mesh_navigation_tpu.layers.obstacle import ObstacleParams, process_point_cloud

    m = grid_mesh_small
    pts = jnp.asarray([[3.2, 3.2, 0.5], [np.nan, np.nan, np.nan]], jnp.float32)
    lethal = process_point_cloud(m, pts, ObstacleParams(robot_height=1.0))
    lv = np.asarray(lethal)
    assert lv.sum() == 3  # the hit face's three vertices
    pos = np.asarray(m.vertices)[lv]
    assert (np.linalg.norm(pos[:, :2] - 3.2, axis=1) < 2.0).all()

    # point too high above the surface -> no lethal
    far = process_point_cloud(
        m, jnp.asarray([[3.2, 3.2, 5.0]], jnp.float32), ObstacleParams(robot_height=1.0)
    )
    assert int(far.sum()) == 0


def test_inflation_in_dag(grid_mesh_small):
    m = grid_mesh_small
    stack = LayerStack.from_configs(
        (
            LayerConfig(name="obst", kind="obstacle"),
            LayerConfig(
                name="infl", kind="inflation", inputs=("obst",),
                params=(("inflation_radius", 2.5), ("inscribed_radius", 1.0)),
            ),
        ),
        default_layer="infl",
    )
    state = stack.prepare(m)
    lethal = np.zeros(m.num_vertices, bool)
    for vtx in (27, 28, 35, 36):
        lethal[vtx] = True
    state["obstacle:obst:lethal"] = jnp.asarray(lethal)
    outs, combined = stack.compute(m, state)
    c = np.asarray(combined)
    assert (c[[27, 28, 35, 36]] == 1.0).all()       # lethal value
    # fades with distance
    assert c[19] > 0.3                               # one ring out
    assert c[0] == 0.0                               # far corner


def test_grid_raycast_matches_bruteforce(grid_mesh_small):
    import jax.numpy as jnp
    from mesh_navigation_tpu.ops import raycast

    m = grid_mesh_small
    fgrid = raycast.build_face_grid(m)
    rng = np.random.default_rng(3)
    pts = np.column_stack([
        rng.uniform(0.2, 6.8, 32), rng.uniform(0.2, 6.8, 32), np.full(32, 2.0)
    ]).astype(np.float32)
    t1, f1, h1 = raycast.raycast_vertical(m, fgrid, jnp.asarray(pts))
    dirs = jnp.tile(jnp.asarray([0.0, 0, -1.0]), (32, 1))
    t2, f2, h2 = raycast.raycast_bruteforce(m, jnp.asarray(pts), dirs)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    hit = np.asarray(h1)
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t2)[hit], rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(f1)[hit], np.asarray(f2)[hit])
    # points above the flat grid at z=2 all hit at t=2
    np.testing.assert_allclose(np.asarray(t1)[hit], 2.0, rtol=1e-5)
    assert hit.all()
