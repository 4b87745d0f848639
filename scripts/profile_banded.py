"""Ad-hoc: decompose the banded solve cost — rounds vs pred recovery vs finish.

Usage: python scripts/profile_banded.py [mesh_n] [batch]
Times, with fresh seeds per call (so nothing is cached):
  - solve with max_rounds=1 / 2 / default  (marginal cost per round)
  - predecessors_banded alone on a converged field
  - full plan_batch_banded light (adds path extraction + poses)
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
B = int(sys.argv[2]) if len(sys.argv) > 2 else 256

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
print(f"# mesh {mesh.num_vertices} ({time.time()-t0:.1f}s)", flush=True)

nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
W = jnp.asarray(W_np)
plan = pb.build_banded_kernel_plan(mesh, W_np)
print(f"# plan ({time.time()-t0:.1f}s)", flush=True)

rng = np.random.default_rng(0)
SEEDS = [jnp.asarray(rng.integers(0, mesh.num_vertices, size=B), jnp.int32) for _ in range(6)]


def timeit(name, fn, n_it=3):
    out = fn(SEEDS[0])
    jax.block_until_ready(out)
    t1 = time.time()
    for i in range(n_it):
        out = fn(SEEDS[(i + 1) % len(SEEDS)])
    jax.block_until_ready(out)
    dt = (time.time() - t1) / n_it
    extra = f" rounds={int(out.rounds)}" if hasattr(out, "rounds") else ""
    print(f"{name}: {dt*1000:.2f} ms{extra}", flush=True)
    return out


for mr in (1, 2):
    timeit(
        f"solve max_rounds={mr}",
        jax.jit(lambda s, m=mr: pb.batched_field_banded_pallas(mesh, W, plan, s, max_rounds=m)),
    )
res = timeit(
    "solve full",
    jax.jit(lambda s: pb.batched_field_banded_pallas(mesh, W, plan, s)),
)

dist_vb = res.dist.T  # [V, B] converged
pred_fn = jax.jit(lambda d: pb.predecessors_banded(plan, d))
out = pred_fn(dist_vb)
jax.block_until_ready(out)
t1 = time.time()
for _ in range(3):
    out = pred_fn(dist_vb)
jax.block_until_ready(out)
print(f"pred recovery alone: {(time.time()-t1)/3*1000:.2f} ms", flush=True)

from mesh_navigation_tpu.config import PlannerConfig
from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner

planner = DijkstraPlanner(
    mesh, PlannerConfig(method="batched", ordered_rounds=0, cost_limit=2.0),
    max_path_len=2 * mesh_n,
)
extent = mesh_n * 0.5 - 1.0
P = [
    (
        jnp.asarray(rng.uniform(1, extent, (B, 3)).astype(np.float32)).at[:, 2].set(0),
        jnp.asarray(rng.uniform(1, extent, (B, 3)).astype(np.float32)).at[:, 2].set(0),
    )
    for _ in range(4)
]
pfn = jax.jit(lambda s, g: planner.plan_batch_banded(W, plan, s, g, light=True))
out = pfn(*P[0])
jax.block_until_ready(out)
t1 = time.time()
for i in range(3):
    out = pfn(*P[(i + 1) % len(P)])
jax.block_until_ready(out)
dt = (time.time() - t1) / 3
print(f"plan_batch_banded light: {dt*1000:.2f} ms -> {B/dt:.0f} solves/s", flush=True)
