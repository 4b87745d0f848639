"""Round 5 bisect step 4: raw solve clean, group_lanes clean. Remaining:
  (a) plan_batch_banded light alone (B=512) — is res.potential clean?
  (b) plan_batch_banded + controller in one jit (the bench composition)
  (c) batched snap disagreement (12/64 non-nearest in repro3) — quantify
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mesh_navigation_tpu import native
from mesh_navigation_tpu.config import ControllerConfig, PlannerConfig
from mesh_navigation_tpu.control import MeshController
from mesh_navigation_tpu.control.controller import initial_state
from mesh_navigation_tpu.mesh import query, reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
vi, fi = synthetic.irregular_terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
)
mesh = reorder.build_reordered_mesh(vi, fi)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
costs = jnp.asarray(costs_np)
W = jnp.asarray(W_np)

planner = DijkstraPlanner(
    mesh, PlannerConfig(method="batched", ordered_rounds=0, cost_limit=2.0),
    max_path_len=max(2048, 3 * mesh_n),
)
ctrl = MeshController(mesh, ControllerConfig(), grid=planner.grid)
kplan = planner.prepare_banded_plan(W_np)

edges = host_array(mesh, "edges")
dist = host_array(mesh, "edge_dist")
c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
ew_np = np.where(
    np.isfinite(c1) & np.isfinite(c2),
    dist + dist * (c1 + c2) * 0.5, np.inf
).astype(np.float32)
nm = native.NativeMesh(host_array(mesh, "vertices"), host_array(mesh, "faces"))

rng = np.random.default_rng(0)
B = 512
extent = mesh_n * 0.5 - 1.0
s = rng.uniform(1, extent, size=(B, 3)).astype(np.float32)
g = rng.uniform(1, extent, size=(B, 3)).astype(np.float32)
s[:, 2] = 0.0
g[:, 2] = 0.0
starts, goals = jnp.asarray(s), jnp.asarray(g)
q = jnp.tile(jnp.asarray([0, 0, 0, 1], jnp.float32), (B, 1))

gv_single = np.asarray(
    jax.vmap(lambda p: query.nearest_vertex(mesh, planner.grid, p)[0])(goals)
)
gv_batch = np.asarray(query.nearest_vertex_batch(mesh, planner.grid, goals)[0])
n_dis = int((gv_single != gv_batch).sum())
vpos = host_array(mesh, "vertices")
if n_dis:
    d_s = np.linalg.norm(vpos[gv_single] - g, axis=1)
    d_b = np.linalg.norm(vpos[gv_batch] - g, axis=1)
    print(
        f"# snap disagree on {n_dis}/{B}; |d_batch - d_single| max "
        f"{np.abs(d_b - d_s).max():.3e}; batch worse by "
        f"{(d_b - d_s).max():.3e}",
        flush=True,
    )
else:
    print("# snap: single and batch agree on all lanes", flush=True)


def check(tag, pot):
    errs = []
    for b in range(8):
        od, _ = nm.dijkstra(ew_np, costs_np, int(gv_single[b]), 2.0)
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(rel.max()))
    # also vs the BATCH snap's goal (what the solve actually seeds)
    errs_b = []
    for b in range(8):
        od, _ = nm.dijkstra(ew_np, costs_np, int(gv_batch[b]), 2.0)
        fin = np.isfinite(od)
        rel = np.abs(pot[b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs_b.append(float(rel.max()))
    print(
        f"{tag:40s}: vs single-snap {max(errs):.3e} | "
        f"vs batch-snap {max(errs_b):.3e}",
        flush=True,
    )


# (a) planner alone
fn_a = jax.jit(
    lambda W_in, kp, grid, s, g: planner.plan_batch_banded(
        W_in, kp, s, g, light=True, atol=1e-3, rtol=2e-3, grid=grid
    ).potential
)
pot_a = np.asarray(fn_a(W, kplan, planner.grid, starts, goals))
check("planner alone B=512", pot_a)

# (b) planner + controller (bench composition)
def solve_batch(W_in, kp, grid, starts, goals, quats):
    res = planner.plan_batch_banded(
        W_in, kp, starts, goals, light=True, atol=1e-3, rtol=2e-3, grid=grid
    )
    st = jax.vmap(lambda gg: initial_state(gg, jnp.asarray([1.0, 0.0, 0.0])))(goals)
    dflat = res.d_pad.reshape(-1, res.d_pad.shape[-1])
    cmds, _ = ctrl.compute_velocity_banded(
        kp, dflat, costs, starts, quats, st, tol=1e-5,
        lane_minor=True, lane_map=res.lane_map, padded_flat=True,
    )
    return res.potential, cmds.linear

fn_b = jax.jit(solve_batch)
pot_b, lin = fn_b(W, kplan, planner.grid, starts, goals, q)
pot_b = np.asarray(pot_b)
check("planner + controller B=512", pot_b)
print(f"# pot_a vs pot_b identical: {np.array_equal(pot_a, pot_b)}", flush=True)
