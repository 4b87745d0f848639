"""CLI entry — the `mbf_mesh_nav` binary analog (SURVEY.md §1 L6).

Loads a mesh (OBJ/PLY/OFF/H5 or a synthetic terrain), configures the layer
DAG, plans with the selected planner, optionally runs a closed-loop
controller rollout, and exports visualization artifacts.

    python -m mesh_navigation_tpu --mesh map.ply \
        --start 1 1 0 --goal 20 20 0 --planner cvp \
        --layers steepness,border --out /tmp/nav

Replaces the ROS process entry (mbf_mesh_nav.cpp:57-77): executors and
action servers become function calls; topics become files under --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def build_layer_configs(names: list[str]):
    from mesh_navigation_tpu.config import LayerConfig

    cfgs = [LayerConfig(name=n, kind=n) for n in names]
    if len(cfgs) > 1:
        cfgs.append(
            LayerConfig(
                name="combined", kind="max_combination",
                inputs=tuple(c.name for c in cfgs),
            )
        )
    return tuple(cfgs)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mesh_navigation_tpu", description=__doc__)
    ap.add_argument("--mesh", help="mesh file (.obj/.ply/.off/.h5); omit for synthetic terrain")
    ap.add_argument("--working-file", help="HDF5 working file (cached bundle)")
    ap.add_argument("--synthetic", type=int, default=64, help="synthetic terrain side (vertices)")
    ap.add_argument("--start", nargs=3, type=float, required=True)
    ap.add_argument("--goal", nargs=3, type=float, required=True)
    ap.add_argument("--planner", choices=["dijkstra", "cvp"], default="cvp")
    ap.add_argument("--layers", default="steepness",
                    help="comma list: height_diff,roughness,steepness,ridge,border,clearance")
    ap.add_argument("--edge-cost-factor", type=float, default=1.0)
    ap.add_argument("--cost-limit", type=float, default=2.0)
    ap.add_argument("--rollout", type=int, default=0, help="controller rollout steps")
    ap.add_argument("--out", default="", help="output dir for PLY/OBJ exports")
    ap.add_argument("--snap", action=argparse.BooleanOptionalAction, default=True,
                    help="snap start/goal z onto the surface")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from mesh_navigation_tpu.api.server import MeshNavServer
    from mesh_navigation_tpu.config import MeshMapConfig, NavConfig, PlannerConfig
    from mesh_navigation_tpu.mesh import build_mesh, io, synthetic

    t0 = time.time()
    if args.mesh:
        mesh = io.read_map(args.mesh, args.working_file)
    else:
        v, f = synthetic.terrain_mesh(
            args.synthetic, args.synthetic, spacing=0.5, hills=1.5, seed=0
        )
        mesh = build_mesh(v, f)
    print(f"map: {mesh.num_vertices} vertices, {mesh.num_faces} faces "
          f"({time.time()-t0:.1f}s)", file=sys.stderr)

    layer_names = [n for n in args.layers.split(",") if n]
    cfg = NavConfig(
        mesh_map=MeshMapConfig(edge_cost_factor=args.edge_cost_factor),
        planner=PlannerConfig(cost_limit=args.cost_limit),
        layers=build_layer_configs(layer_names),
    )
    srv = MeshNavServer(mesh, cfg, planner_kind=args.planner)

    start = jnp.asarray(args.start, jnp.float32)
    goal = jnp.asarray(args.goal, jnp.float32)
    if args.snap:
        # project the requested poses onto the surface (z from the nearest
        # vertex) so hilly maps accept xy-specified poses
        from mesh_navigation_tpu.mesh import query as _query

        sv, _ = _query.nearest_vertex(mesh, srv.grid, start)
        gv, _ = _query.nearest_vertex(mesh, srv.grid, goal)
        start = start.at[2].set(mesh.vertices[sv, 2])
        goal = goal.at[2].set(mesh.vertices[gv, 2])
    t1 = time.time()
    res = srv.get_path(start, goal)
    dt = time.time() - t1
    from mesh_navigation_tpu.api.outcomes import Outcome

    out = {
        "outcome": Outcome(int(res.outcome)).name,
        "cost": float(res.cost),
        "path_points": int(np.asarray(res.path_valid).sum()),
        "plan_time_s": round(dt, 3),
    }

    if args.rollout and int(res.outcome) == 0:
        from mesh_navigation_tpu.control.controller import initial_state

        st = srv.set_plan(res)
        quat = jnp.asarray([0.0, 0.0, 0.0, 1.0])
        traj, cmds, st = srv.controller.rollout(
            res.vector_map, srv.vertex_costs, start, quat, st,
            num_steps=args.rollout,
        )
        final = np.asarray(traj[-1])
        out["rollout_final_dist_to_goal"] = float(np.linalg.norm(final - np.asarray(goal)))

    if args.out:
        from mesh_navigation_tpu.utils import viz

        os.makedirs(args.out, exist_ok=True)
        viz.write_cost_ply(
            os.path.join(args.out, "vertex_costs.ply"),
            np.asarray(mesh.vertices), np.asarray(mesh.faces),
            np.asarray(srv.vertex_costs),
        )
        viz.write_cost_ply(
            os.path.join(args.out, "potential.ply"),
            np.asarray(mesh.vertices), np.asarray(mesh.faces),
            np.asarray(res.potential),
        )
        viz.write_vector_field_obj(
            os.path.join(args.out, "vector_field.obj"),
            np.asarray(mesh.vertices), np.asarray(res.vector_map),
        )
        viz.write_path_obj(
            os.path.join(args.out, "path.obj"),
            np.asarray(res.path_positions), np.asarray(res.path_valid),
        )
        out["exports"] = args.out

    print(json.dumps(out))
    return 0 if out["outcome"] == "SUCCESS" else 1


if __name__ == "__main__":
    raise SystemExit(main())
