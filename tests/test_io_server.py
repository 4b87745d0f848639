"""Mesh IO round-trips + MeshNavServer facade end-to-end."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from mesh_navigation_tpu.api.outcomes import Outcome
from mesh_navigation_tpu.api.server import MeshNavServer
from mesh_navigation_tpu.config import LayerConfig, MeshMapConfig, NavConfig, PlannerConfig
from mesh_navigation_tpu.mesh import build_mesh, io, synthetic


def test_obj_roundtrip(tmp_path):
    v, f = synthetic.grid_mesh(4, 4)
    p = tmp_path / "m.obj"
    with open(p, "w") as fh:
        for x, y, z in v:
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"f {a+1} {b+1} {c+1}\n")
    v2, f2 = io.load_obj(str(p))
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)


def test_ply_ascii(tmp_path):
    v, f = synthetic.single_triangle()
    p = tmp_path / "m.ply"
    with open(p, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(v)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(f)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for x, y, z in v:
            fh.write(f"{x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"3 {a} {b} {c}\n")
    v2, f2 = io.load_ply(str(p))
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)


def test_off(tmp_path):
    v, f = synthetic.grid_mesh(3, 3)
    p = tmp_path / "m.off"
    with open(p, "w") as fh:
        fh.write(f"OFF\n{len(v)} {len(f)} 0\n")
        for x, y, z in v:
            fh.write(f"{x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"3 {a} {b} {c}\n")
    v2, f2 = io.load_off(str(p))
    np.testing.assert_allclose(v2, v)
    np.testing.assert_array_equal(f2, f)


def test_working_file_roundtrip(tmp_path):
    if not io.HAVE_H5PY:
        pytest.skip("h5py unavailable")
    v, f = synthetic.terrain_mesh(6, 6, hills=1.0, seed=2)
    m = build_mesh(v, f)
    wf = str(tmp_path / "work.h5")
    io.save_working_file(wf, m, channels={"height_diff": np.ones(m.num_vertices)})
    v2, f2 = io.load_h5_geometry(wf)
    np.testing.assert_allclose(v2, np.asarray(m.vertices))
    ch = io.load_channel(wf, "height_diff")
    np.testing.assert_allclose(ch, 1.0)
    assert io.load_channel(wf, "missing") is None
    # read_map prefers the working file
    m2 = io.read_map("/nonexistent.obj", wf)
    assert m2.num_vertices == m.num_vertices


def _server(mesh, planner_kind):
    cfg = NavConfig(
        mesh_map=MeshMapConfig(edge_cost_factor=1.0, default_layer="combine"),
        planner=PlannerConfig(cost_limit=2.0),
        layers=(
            LayerConfig(name="steep", kind="steepness", params=(("threshold", 1.0),)),
            LayerConfig(name="border", kind="border"),
            LayerConfig(name="combine", kind="max_combination", inputs=("steep", "border")),
        ),
    )
    return MeshNavServer(mesh, cfg, planner_kind=planner_kind, max_path_len=64)


@pytest.mark.parametrize("kind", ["dijkstra", "cvp"])
def test_server_get_path(grid_mesh_small, kind):
    srv = _server(grid_mesh_small, kind)
    res = srv.get_path(jnp.asarray([1.0, 1.0, 0.0]), jnp.asarray([6.0, 6.0, 0.0]))
    assert int(res.outcome) == Outcome.SUCCESS
    assert float(res.cost) < 12.0


def test_server_control_cycle(grid_mesh_small):
    srv = _server(grid_mesh_small, "dijkstra")
    res = srv.get_path(jnp.asarray([1.0, 1.0, 0.0]), jnp.asarray([6.0, 6.0, 0.0]))
    st = srv.set_plan(res)
    quat = jnp.asarray([0.0, 0.0, np.sin(np.pi / 8), np.cos(np.pi / 8)])
    cmd, st = srv.exe_path_step(res, jnp.asarray([1.0, 1.0, 0.0]), quat, st)
    assert int(cmd.outcome) == Outcome.SUCCESS
    assert not bool(srv.is_goal_reached(jnp.asarray([1.0, 1.0, 0.0]), quat, st))


def test_server_pose_cost_and_clear(grid_mesh_small):
    srv = _server(grid_mesh_small, "dijkstra")
    c_border = float(srv.check_pose_cost(jnp.asarray([0.0, 3.5, 0.0])))
    c_inner = float(srv.check_pose_cost(jnp.asarray([3.5, 3.5, 0.0])))
    assert c_border > 0.4 and c_inner < 0.1
    off = srv.check_pose_cost(jnp.asarray([20.0, 20.0, 0.0]))
    assert np.isnan(float(off))
    assert srv.recovery("clear") == Outcome.SUCCESS
    assert srv.recovery("nope") == Outcome.INVALID_PLUGIN


def test_server_save_map(grid_mesh_small, tmp_path):
    if not io.HAVE_H5PY:
        pytest.skip("h5py unavailable")
    srv = _server(grid_mesh_small, "dijkstra")
    path = str(tmp_path / "map.h5")
    assert srv.save_map(path)
    assert io.load_channel(path, "vertex_costs") is not None
    assert io.load_channel(path, "border") is not None


def test_server_reconfigure(grid_mesh_small):
    srv = _server(grid_mesh_small, "dijkstra")
    ew0 = np.asarray(srv.edge_weights)
    # raising edge_cost_factor must raise weights on costed edges
    assert srv.set_parameters({"mesh_map.edge_cost_factor": 2.0})
    ew1 = np.asarray(srv.edge_weights)
    assert (ew1 >= ew0 - 1e-6).all() and (ew1 > ew0 + 1e-6).any()
    # layer param change cascades into costs
    c0 = np.asarray(srv.vertex_costs)
    assert srv.set_parameters({"border.border_cost": 3.0})
    c1 = np.asarray(srv.vertex_costs)
    border = np.asarray(grid_mesh_small.boundary_vertex)
    assert np.allclose(c1[border], 3.0)
    assert (c1[~border] == c0[~border]).all()
    # unknown layer rejected
    assert not srv.set_parameters({"nope.threshold": 1.0})
    # controller scalar
    assert srv.set_parameters({"controller.max_lin_velocity": 0.5})
    assert srv.controller.config.max_lin_velocity == 0.5


def test_server_batch_planning(grid_mesh_small):
    srv = _server(grid_mesh_small, "dijkstra")
    starts = jnp.asarray([[1.0, 1, 0], [6, 1, 0]])
    goals = jnp.asarray([[6.0, 6, 0], [1, 6, 0]])
    res = srv.get_path_batch(starts, goals)
    assert (np.asarray(res.outcome) == Outcome.SUCCESS).all()
    # matches single-plan costs
    for i in range(2):
        one = srv.get_path(starts[i], goals[i])
        np.testing.assert_allclose(float(res.cost[i]), float(one.cost), rtol=1e-5)


def test_navigate_move_base(grid_mesh_small):
    """MoveBase-style closed loop: plan + follow + tolerance stop."""
    from mesh_navigation_tpu.config import ControllerConfig
    import dataclasses as _dc

    srv = _server(grid_mesh_small, "dijkstra")
    srv.set_parameters({"controller.max_ang_velocity": 2.0})
    start = jnp.asarray([1.0, 1.0, 0.0])
    goal = jnp.asarray([6.0, 6.0, 0.0])
    quat = jnp.asarray([0.0, 0.0, np.sin(np.pi / 8), np.cos(np.pi / 8)])
    res = srv.navigate(start, quat, goal, dist_tolerance=0.5, max_cycles=512,
                       replan_every=0)
    assert res["outcome"] == Outcome.SUCCESS, res
    final = np.asarray(res["final_position"])
    assert np.linalg.norm(final - np.asarray(goal)) < 0.6
    assert res["cycles"] > 10


def test_stl_binary_and_ascii(tmp_path):
    """STL triangle soup must weld into shared topology (io.load_stl)."""
    import struct

    tris = np.asarray(
        [
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
            [[1, 0, 0], [1, 1, 0], [0, 1, 0]],
        ],
        np.float32,
    )
    p = tmp_path / "m.stl"
    with open(p, "wb") as fh:
        fh.write(b"\0" * 80)
        fh.write(struct.pack("<I", len(tris)))
        for t in tris:
            fh.write(struct.pack("<3f", 0, 0, 1))
            for v in t:
                fh.write(struct.pack("<3f", *v))
            fh.write(struct.pack("<H", 0))
    v, f = io.load_stl(str(p))
    assert len(v) == 4 and len(f) == 2          # welded shared edge

    pa = tmp_path / "m_ascii.stl"
    lines = ["solid x"]
    for t in tris:
        lines += ["facet normal 0 0 1", "outer loop"]
        lines += [f"vertex {a} {b} {c}" for a, b, c in t]
        lines += ["endloop", "endfacet"]
    lines.append("endsolid x")
    pa.write_text("\n".join(lines))
    v2, f2 = io.load_stl(str(pa))
    assert len(v2) == 4 and len(f2) == 2
    m = build_mesh(v, f)
    assert m.num_edges == 5


def test_dae_transform_bake(tmp_path):
    """COLLADA import: polylist triangulation + node transform baking +
    Y_UP conversion (the assimp surface, util.cpp:98-219)."""
    dae = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
 <asset><up_axis>Z_UP</up_axis></asset>
 <library_geometries>
  <geometry id="quad"><mesh>
   <source id="pos"><float_array id="arr" count="12">0 0 0 1 0 0 1 1 0 0 1 0</float_array>
    <technique_common><accessor source="#arr" count="4" stride="3">
     <param name="X" type="float"/><param name="Y" type="float"/><param name="Z" type="float"/>
    </accessor></technique_common></source>
   <vertices id="vv"><input semantic="POSITION" source="#pos"/></vertices>
   <polylist count="1"><input semantic="VERTEX" source="#vv" offset="0"/>
    <vcount>4</vcount><p>0 1 2 3</p></polylist>
  </mesh></geometry>
 </library_geometries>
 <library_visual_scenes><visual_scene id="s">
  <node id="n"><translate>10 0 0</translate>
   <instance_geometry url="#quad"/></node>
 </visual_scene></library_visual_scenes>
 <scene><instance_visual_scene url="#s"/></scene>
</COLLADA>"""
    p = tmp_path / "m.dae"
    p.write_text(dae)
    v, f = io.load_dae(str(p))
    assert len(v) == 4 and len(f) == 2          # quad fan-triangulated
    np.testing.assert_allclose(v[:, 0].min(), 10.0)  # translate baked
    m = build_mesh(v, f)
    assert m.num_faces == 2
