"""Ad-hoc: stage breakdown of the light bench path at large B (memory-tight).

Unlike profile_light.py this frees each stage's buffers before the next so
B=1024 at 1M vertices fits in 16 GB HBM (field 4 GB + cls 1 GB + potential
4 GB must never coexist with an int32 pred table).
Usage: python scripts/profile_1024.py [mesh_n] [batch]
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

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
print(f"# mesh {V} ({time.time()-t0:.1f}s)", flush=True)

nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
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


ARGS = [sample() for _ in range(3)]


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


snap = jax.jit(
    lambda s, g: (
        query.nearest_vertex_batch(mesh, planner.grid, s)[0],
        query.nearest_vertex_batch(mesh, planner.grid, g)[0],
    )
)
sv, gv = timeit("snap (batch)", snap, [(a[0], a[1]) for a in ARGS])

sort_fn = jax.jit(
    lambda gv, sv: (lambda oi: (oi[1], gv[oi[0]], sv[oi[0]]))(
        pb.group_lanes(gv, V)
    )
)
_, gs, ss = timeit("group_lanes", sort_fn, [(gv, sv)] * 2)

import gc

res = None
for dirs in (["both", "up"] if os.environ.get("PROF_BOTH", "0") == "1" else ["up"]):
    del res
    gc.collect()
    solve = jax.jit(lambda seeds, d=dirs: pb.banded_solve_padded(
        plan, seeds, max_rounds=64, atol=1e-4, rtol=1e-3, scan_dirs=d))
    SEEDV_S = [jnp.sort(jnp.asarray(rng.integers(0, V, size=B), jnp.int32)) for _ in range(3)]
    res = timeit(f"solve scan_dirs={dirs}", solve, [(s,) for s in SEEDV_S])
    print(f"    rounds={int(res.rounds)} converged={bool(res.converged)}", flush=True)

d_pad = res.d_pad
del res
R, C = plan.n_rows, plan.n_cols

predc = jax.jit(lambda d: pb.predecessors_banded_classes(plan, d))
cls_vb = timeit("pred classes i8 [V,Bp]", predc, [(d_pad,)] * 2)

exc = jax.jit(lambda p, s, g: pb.extract_paths_cls(
    p[:, :B], s, g, max_path, plan.n_cols, k_steps=1))
path, valid = timeit("extract_paths_cls k=1", exc, [(cls_vb, ss, gs)] * 2)
for kk in (2, 3, 4):
    exc = jax.jit(lambda p, s, g, kk=kk: pb.extract_paths_cls(
        p[:, :B], s, g, max_path, plan.n_cols, k_steps=kk))
    path, valid = timeit(f"extract_paths_cls k={kk}", exc, [(cls_vb, ss, gs)] * 2)
del cls_vb


def poses(path, valid):
    positions = mesh.vertices[path]
    quats, cost = jax.vmap(pose_chain)(positions, valid, mesh.vertex_normals[path])
    return quats, cost


timeit("pose_chain (2 gathers)", jax.jit(poses), [(path, valid)] * 2)

pn = jnp.concatenate([mesh.vertices, mesh.vertex_normals], axis=1)


def poses_fused(path, valid):
    png = pn[path]
    quats, cost = jax.vmap(pose_chain)(png[..., :3], valid, png[..., 3:])
    return quats, cost


timeit("pose_chain (fused gather)", jax.jit(poses_fused), [(path, valid)] * 2)
del path, valid

potential_vb = jax.jit(
    lambda d: d[:R, :C, :B].reshape(R * C, B)[:V].astype(jnp.float32)
)(d_pad)
jax.block_until_ready(potential_vb)
del d_pad
st = jax.vmap(lambda g: initial_state(g, jnp.asarray([1.0, 0.0, 0.0])))(ARGS[0][1])
cfv = jax.jit(
    lambda pot, s, q, st: ctrl.compute_velocity_banded(
        plan, pot, costs, s, q, st, tol=1e-5, lane_minor=True
    )
)
timeit("controller cycle [V,B]", cfv, [(potential_vb, ARGS[0][0], ARGS[0][2], st)] * 2)
print(f"# total {time.time()-t0:.1f}s", flush=True)
