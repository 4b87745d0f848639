"""Controller law + closed-loop tracking tests."""

import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.config import ControllerConfig, PlannerConfig
from mesh_navigation_tpu.control import MeshController
from mesh_navigation_tpu.control.controller import initial_state, naive_control
from mesh_navigation_tpu.mesh import geometry
from mesh_navigation_tpu.planners import DijkstraPlanner


def _quat_yaw(yaw):
    return jnp.asarray([0.0, 0.0, np.sin(yaw / 2), np.cos(yaw / 2)], jnp.float32)


def test_naive_control_aligned():
    """Zero heading error -> full speed, no turn (mesh_controller.cpp:225-242)."""
    cfg = ControllerConfig()
    d = jnp.asarray([1.0, 0.0, 0.0])
    n = jnp.asarray([0.0, 0.0, 1.0])
    lin, ang, phi = naive_control(d, d, n, cfg)
    assert float(phi) < 1e-3
    np.testing.assert_allclose(float(lin), cfg.max_lin_velocity, rtol=1e-4)
    np.testing.assert_allclose(float(ang), 0.0, atol=1e-4)


def test_naive_control_turns_toward_field():
    cfg = ControllerConfig()
    robot = jnp.asarray([1.0, 0.0, 0.0])
    n = jnp.asarray([0.0, 0.0, 1.0])
    # field points 90° to the left (+y): robot must turn left (positive omega)
    left = jnp.asarray([0.0, 1.0, 0.0])
    lin, ang, phi = naive_control(robot, left, n, cfg)
    np.testing.assert_allclose(float(phi), np.pi / 2, rtol=1e-4)
    assert float(ang) > 0.0
    # 90° > max_angle (20°) -> no forward motion
    assert float(lin) == 0.0
    # field to the right -> negative omega
    right = jnp.asarray([0.0, -1.0, 0.0])
    _, ang_r, _ = naive_control(robot, right, n, cfg)
    assert float(ang_r) < 0.0


def test_controller_cycle_on_plan(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = DijkstraPlanner(m, max_path_len=32)
    W = planner.prepare_weights(costs)
    goal = jnp.asarray([7.0, 7.0, 0.0])
    res = planner.plan_one(W, jnp.asarray([0.0, 0.0, 0.0]), goal)

    ctrl = MeshController(m)
    st = initial_state(goal, jnp.asarray([1.0, 1.0, 0.0]))
    # robot at (1, 1), facing the goal diagonal
    pos = jnp.asarray([1.0, 1.0, 0.0])
    quat = _quat_yaw(np.pi / 4)
    cmd, st = ctrl.compute_velocity(res.vector_map, costs, pos, quat, st)
    assert int(cmd.outcome) == Outcome.SUCCESS
    assert float(cmd.linear) > 0.5           # aligned with the field
    assert int(st.current_face) >= 0

    # facing away: no forward motion, strong turn
    cmd2, _ = ctrl.compute_velocity(res.vector_map, costs, pos, _quat_yaw(np.pi + np.pi / 4), st)
    assert float(cmd2.linear) == 0.0
    assert abs(float(cmd2.angular)) > 0.1


def test_out_of_map(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    ctrl = MeshController(m)
    vm = jnp.zeros((m.num_vertices, 3), jnp.float32)
    st = initial_state(jnp.zeros(3), jnp.asarray([1.0, 0, 0]))
    cmd, _ = ctrl.compute_velocity(
        vm, costs, jnp.asarray([30.0, 30.0, 5.0]), _quat_yaw(0.0), st
    )
    assert int(cmd.outcome) == Outcome.OUT_OF_MAP


def test_closed_loop_reaches_goal(grid_mesh_small):
    """Plan -> follow the field with the unicycle rollout -> approach goal
    (BASELINE.json configs[2] closed-loop)."""
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = DijkstraPlanner(m, max_path_len=32)
    W = planner.prepare_weights(costs)
    goal = jnp.asarray([6.0, 6.0, 0.0])
    res = planner.plan_one(W, jnp.asarray([1.0, 1.0, 0.0]), goal)

    ctrl = MeshController(m, ControllerConfig(max_lin_velocity=1.0, max_ang_velocity=2.0))
    st = initial_state(goal, jnp.asarray([1.0, 1.0, 0.0]))
    traj, cmds, st = ctrl.rollout(
        res.vector_map, costs,
        jnp.asarray([1.0, 1.0, 0.0]), _quat_yaw(np.pi / 4), st,
        num_steps=256, dt=0.05,
    )
    d_start = float(jnp.linalg.norm(jnp.asarray([1.0, 1.0, 0.0]) - goal))
    d_end = float(jnp.linalg.norm(traj[-1] - goal))
    assert d_end < 0.6, (d_start, d_end)


def test_goal_reached_check(grid_mesh_small):
    m = grid_mesh_small
    ctrl = MeshController(m)
    goal = jnp.asarray([5.0, 5.0, 0.0])
    st = initial_state(goal, jnp.asarray([1.0, 0, 0]))
    near = ctrl.is_goal_reached(jnp.asarray([5.05, 5.0, 0.0]), _quat_yaw(0.0), st, 0.2, 0.5)
    far = ctrl.is_goal_reached(jnp.asarray([3.0, 5.0, 0.0]), _quat_yaw(0.0), st, 0.2, 0.5)
    assert bool(near) and not bool(far)


def test_batched_controller(grid_mesh_small):
    m = grid_mesh_small
    costs = jnp.zeros(m.num_vertices, jnp.float32)
    planner = DijkstraPlanner(m, max_path_len=32)
    W = planner.prepare_weights(costs)
    goal = jnp.asarray([7.0, 7.0, 0.0])
    res = planner.plan_one(W, jnp.asarray([0.0, 0.0, 0.0]), goal)
    ctrl = MeshController(m)
    B = 16
    poss = jnp.stack([jnp.asarray([0.5 + 0.3 * i, 1.0, 0.0]) for i in range(B)])
    quats = jnp.tile(_quat_yaw(np.pi / 4)[None], (B, 1))
    sts = jax.vmap(lambda _: initial_state(goal, jnp.asarray([1.0, 1.0, 0.0])))(jnp.arange(B))
    cmds, _ = jax.vmap(
        lambda p, q, s: ctrl.compute_velocity(res.vector_map, costs, p, q, s)
    )(poss, quats, sts)
    assert cmds.linear.shape == (B,)
    assert (np.asarray(cmds.outcome) == Outcome.SUCCESS).all()


def test_rotate_recovery(grid_mesh_small):
    from mesh_navigation_tpu.control.recovery import RotateRecovery, rotate_in_place
    from mesh_navigation_tpu.mesh import geometry

    q0 = _quat_yaw(0.0)
    lin, ang, quats = rotate_in_place(RotateRecovery(target_angle=np.pi), q0)
    assert (np.asarray(lin) == 0.0).all()
    assert (np.asarray(ang) > 0.0).all()
    # final heading ~ rotated by pi around z
    final_dir = np.asarray(geometry.direction_from_pose(quats[-1]))
    np.testing.assert_allclose(final_dir[:2], [-1.0, 0.0], atol=0.1)


def test_compute_velocity_pred_matches_vector_map(grid_mesh_small):
    """The pred-sampling control path (large-mesh mode) must produce the same
    command as the dense vector-map path, since the Dijkstra vector map IS
    normalize(pos[pred] - pos) (dijkstra_mesh_planner.cpp:189-209)."""
    from mesh_navigation_tpu.ops import sweeps

    mesh = grid_mesh_small
    costs = jnp.zeros(mesh.num_vertices, jnp.float32)
    planner = DijkstraPlanner(mesh, PlannerConfig())
    W = planner.prepare_weights(costs)
    goal = jnp.asarray([3.2, 3.2, 0.0])
    start = jnp.asarray([0.6, 0.9, 0.0])
    res = planner.plan_one(W, start, goal)

    ctrl = MeshController(mesh, ControllerConfig())
    q = _quat_yaw(0.3)
    st = initial_state(goal, jnp.asarray([1.0, 0.0, 0.0]))
    cmd_vm, _ = ctrl.compute_velocity(res.vector_map, costs, start, q, st)
    cmd_pred, _ = ctrl.compute_velocity_pred(res.pred, costs, start, q, st)
    np.testing.assert_allclose(
        float(cmd_vm.linear), float(cmd_pred.linear), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(cmd_vm.angular), float(cmd_pred.angular), rtol=1e-5, atol=1e-6
    )
    assert int(cmd_pred.outcome) == int(cmd_vm.outcome) == Outcome.SUCCESS


def test_locate_batch_matches_vmapped_locate(grid_mesh_small):
    """locate_batch's batch-gated stages must agree with per-lane locate on
    a mix of tracked (stage 1/2) and untracked (stage 3) lanes."""
    from mesh_navigation_tpu.control import tracking
    from mesh_navigation_tpu.mesh import query

    m = grid_mesh_small
    grid = query.build_grid(m)
    poss = jnp.asarray(
        [
            [0.6, 0.6, 0.0],    # inside face 0's neighbourhood
            [3.2, 2.7, 0.0],
            [5.5, 5.1, 0.0],
            [1.1, 6.3, 0.0],
        ],
        jnp.float32,
    )
    # lane 0: correct current face; lane 1: stale face (neighbour search);
    # lanes 2-3: no face (global search)
    f0 = int(np.asarray(
        query.containing_face(m, grid, poss[0])[0]
    ))
    faces = jnp.asarray([f0, max(f0 - 2, 0), -1, -1], jnp.int32)

    ref = jax.vmap(
        lambda p, f: tracking.locate(m, grid, p, f)
    )(poss, faces)
    got = tracking.locate_batch(m, grid, poss, faces)
    np.testing.assert_array_equal(np.asarray(ref.face), np.asarray(got.face))
    np.testing.assert_allclose(
        np.asarray(ref.bary), np.asarray(got.bary), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(ref.found), np.asarray(got.found)
    )
    # all-tracked batch: expensive stages gated off, same answers
    ref2 = jax.vmap(
        lambda p, f: tracking.locate(m, grid, p, f)
    )(poss, ref.face)
    got2 = tracking.locate_batch(m, grid, poss, ref.face)
    np.testing.assert_array_equal(np.asarray(ref2.face), np.asarray(got2.face))


def test_compute_velocity_cvp_matches_field_sampling():
    """The lazy CVP controller cycle (directions recovered at the tracked
    face from the eikonal field) must match sampling the planner's full
    vector map at the same positions."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mesh_navigation_tpu.config import ControllerConfig, PlannerConfig
    from mesh_navigation_tpu.control import MeshController
    from mesh_navigation_tpu.control.controller import initial_state
    from mesh_navigation_tpu.mesh import build_mesh, synthetic
    from mesh_navigation_tpu.mesh.arrays import host_array
    from mesh_navigation_tpu.ops import sweeps
    from mesh_navigation_tpu.planners import CVPPlanner

    v, f = synthetic.terrain_mesh(16, 16, spacing=0.5, hills=1.0,
                                  roughness=0.02, seed=6)
    mesh = build_mesh(v, f)
    costs = jnp.zeros(mesh.num_vertices, jnp.float32)
    ew = sweeps.compute_edge_weights(mesh, costs, 0.0)

    cvp = CVPPlanner(mesh, PlannerConfig(cost_limit=2.0), max_path_len=96)
    vpos = host_array(mesh, "vertices")
    rng = np.random.default_rng(3)
    B = 4
    ids = rng.integers(0, mesh.num_vertices, 2 * B)
    starts = jnp.asarray(vpos[ids[:B]])
    goals = jnp.asarray(vpos[ids[B:]])
    res = cvp.plan_batch(ew, costs, starts, goals)   # gather path: full field

    ctrl = MeshController(mesh, ControllerConfig(), grid=cvp.grid)
    quats = jnp.tile(jnp.asarray([0.0, 0.0, 0.0, 1.0]), (B, 1))
    sts = jax.vmap(
        lambda g: initial_state(g, jnp.asarray([1.0, 0.0, 0.0]))
    )(goals)

    # reference: per-lane compute_velocity on that lane's vector map
    cmd_ref, _ = jax.vmap(
        lambda vm, p, q, s: ctrl.compute_velocity(vm, costs, p, q, s)
    )(res.vector_map, starts, quats, sts)

    cmd_lazy, _ = ctrl.compute_velocity_cvp(
        ew, res.potential, costs, starts, quats, sts
    )
    ok = np.asarray(cmd_ref.outcome) == 0
    assert ok.sum() >= 2
    np.testing.assert_allclose(
        np.asarray(cmd_lazy.linear)[ok], np.asarray(cmd_ref.linear)[ok],
        rtol=0.1, atol=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(cmd_lazy.angular)[ok], np.asarray(cmd_ref.angular)[ok],
        rtol=0.1, atol=0.05,
    )
