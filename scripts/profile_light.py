"""Ad-hoc: stage-by-stage breakdown of the light bench path.

Usage: python scripts/profile_light.py [mesh_n] [batch] [dtype]
Times each stage of bench.py's solve_batch separately:
  snap -> sort -> banded_solve_padded -> pred pallas -> extract_paths ->
  pose_chain -> controller cycle
so the optimization target is measured, not guessed.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mesh_navigation_tpu.config import ControllerConfig, PlannerConfig
from mesh_navigation_tpu.control import MeshController
from mesh_navigation_tpu.control.controller import initial_state
from mesh_navigation_tpu.mesh import build_mesh, query, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.planners.common import pose_chain
from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256
dtype = jnp.bfloat16 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else jnp.float32

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
print(f"# mesh {V} ({time.time()-t0:.1f}s)", flush=True)

nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
W = jnp.asarray(W_np)
costs = jnp.asarray(costs_np)
plan = pb.build_banded_kernel_plan(mesh, W_np)
print(f"# plan cov={plan.coverage:.4f} n_res={plan.n_residual} ({time.time()-t0:.1f}s)", flush=True)

max_path = max(2048, 3 * mesh_n)
planner = DijkstraPlanner(
    mesh, PlannerConfig(method="batched", ordered_rounds=0, cost_limit=2.0),
    max_path_len=max_path,
)
ctrl = MeshController(mesh, ControllerConfig(), grid=planner.grid)

rng = np.random.default_rng(0)
extent = mesh_n * 0.5 - 1.0


def sample():
    s = rng.uniform(1, extent, size=(B, 3)).astype(np.float32)
    g = rng.uniform(1, extent, size=(B, 3)).astype(np.float32)
    s[:, 2] = 0.0
    g[:, 2] = 0.0
    q = np.tile(np.asarray([0, 0, 0, 1], np.float32), (B, 1))
    return jnp.asarray(s), jnp.asarray(g), jnp.asarray(q)


ARGS = [sample() for _ in range(5)]


def timeit(name, fn, inputs, n_it=4):
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    tc = time.time() - t0
    t1 = time.time()
    for i in range(n_it):
        out = fn(*inputs[(i + 1) % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.time() - t1) / n_it
    print(f"{name:28s}: {dt*1000:8.2f} ms   (compiled by {tc:.0f}s)", flush=True)
    return out


# --- stage 1: snap ---
snap = jax.jit(
    lambda s, g: (
        jax.vmap(lambda p: query.nearest_vertex(mesh, planner.grid, p)[0])(s),
        jax.vmap(lambda p: query.nearest_vertex(mesh, planner.grid, p)[0])(g),
    )
)
sv, gv = timeit("snap", snap, [(a[0], a[1]) for a in ARGS])

# --- stage 2: sort ---
sort_fn = jax.jit(lambda gv, sv: (jnp.argsort(gv), gv[jnp.argsort(gv)], sv[jnp.argsort(gv)]))
_, gs, ss = timeit("sort", sort_fn, [(gv, sv)] * 2)

# --- stage 3: field solve ---
solve = jax.jit(lambda seeds: pb.banded_solve_padded(
    plan, seeds, max_rounds=64, dtype=dtype, atol=1e-4, rtol=1e-3))
SEEDV = [jnp.asarray(rng.integers(0, V, size=B), jnp.int32) for _ in range(5)]
SEEDV_S = [jnp.sort(s) for s in SEEDV]
res = timeit("solve (sorted seeds)", solve, [(s,) for s in SEEDV_S])
print(f"    rounds={int(res.rounds)} converged={bool(res.converged)}", flush=True)
res = timeit("solve (unsorted seeds)", solve, [(s,) for s in SEEDV])

d_pad = res.d_pad
R, C = plan.n_rows, plan.n_cols

# --- stage 4: pred recovery (pallas) ---
if plan.n_residual == 0:
    predf = jax.jit(lambda d: pb.predecessors_banded_pallas(plan, d))
    pred_vb = timeit("pred pallas [V,Bp]", predf, [(d_pad,)] * 2)
    predc = jax.jit(lambda d: pb.predecessors_banded_classes(plan, d))
    cls_vb = timeit("pred classes i8 [V,Bp]", predc, [(d_pad,)] * 2)
else:
    print("  (residuals present; skipping pallas pred)")
    pred_vb = None
    cls_vb = None

# --- stage 5: path extraction ---
if pred_vb is not None:
    exf = jax.jit(lambda p, s, g: pb.extract_paths_vb(p[:, :B], s, g, max_path))
    path, valid = timeit("extract_paths_vb", exf, [(pred_vb, ss, gs)] * 2)
    exc = jax.jit(lambda p, s, g: pb.extract_paths_cls(
        p[:, :B], s, g, max_path, plan.n_cols))
    timeit("extract_paths_cls", exc, [(cls_vb, ss, gs)] * 2)

    # --- stage 6: poses ---
    def poses(path, valid):
        positions = mesh.vertices[path]
        quats, cost = jax.vmap(pose_chain)(positions, valid, mesh.vertex_normals[path])
        return quats, cost

    timeit("pose_chain", jax.jit(poses), [(path, valid)] * 2)

# --- stage 7: controller ---
potential = d_pad[:R, :C, :B].reshape(R * C, B)[:V].astype(jnp.float32).T
st = jax.vmap(lambda g: initial_state(g, jnp.asarray([1.0, 0.0, 0.0])))(ARGS[0][1])
tolv = 1e-2 if dtype == jnp.bfloat16 else 1e-5
cf = jax.jit(
    lambda pot, s, q, st: ctrl.compute_velocity_banded(
        plan, pot, costs, s, q, st, tol=tolv
    )
)
timeit("controller cycle", cf, [(potential, ARGS[0][0], ARGS[0][2], st)] * 2)

potential_vb = d_pad[:R, :C, :B].reshape(R * C, B)[:V].astype(jnp.float32)
cfv = jax.jit(
    lambda pot, s, q, st: ctrl.compute_velocity_banded(
        plan, pot, costs, s, q, st, tol=tolv, lane_minor=True
    )
)
timeit("controller cycle [V,B]", cfv,
       [(potential_vb, ARGS[0][0], ARGS[0][2], st)] * 2)

# --- end to end for comparison ---
def full(starts, goals, quats):
    res = planner.plan_batch_banded(W, plan, starts, goals, light=True, dtype=dtype)
    st = jax.vmap(lambda g: initial_state(g, jnp.asarray([1.0, 0.0, 0.0])))(goals)
    cmds, _ = ctrl.compute_velocity_banded(
        plan, res.potential, costs, starts, quats, st, tol=tolv
    )
    return res.cost, cmds.linear

out = timeit("FULL solve_batch", jax.jit(full), ARGS)
dt_full = None
print(f"# total compile+run {time.time()-t0:.1f}s", flush=True)
