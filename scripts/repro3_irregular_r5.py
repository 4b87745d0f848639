"""Round 5 bisect step 3: raw solve is clean at B=512 on the irregular mesh
(repro2), so the corruption lives in the light-path wrapper. Candidates:
  (a) seed ORDER sensitivity (repro2 used fully sorted seeds; the light path
      only bucket-groups them)
  (b) the group_lanes permutation / inverse
  (c) nearest-vertex snapping
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

from mesh_navigation_tpu import native
from mesh_navigation_tpu.mesh import query, reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
vi, fi = synthetic.irregular_terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
)
mesh = reorder.build_reordered_mesh(vi, fi)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
plan = pb.build_banded_kernel_plan(mesh, W_np)

edges = host_array(mesh, "edges")
dist = host_array(mesh, "edge_dist")
c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
ew_np = np.where(
    np.isfinite(c1) & np.isfinite(c2),
    dist + dist * (c1 + c2) * 0.5, np.inf
).astype(np.float32)
nm = native.NativeMesh(host_array(mesh, "vertices"), host_array(mesh, "faces"))

rng = np.random.default_rng(0)
R, C, Cp = plan.n_rows, plan.n_cols, plan.n_cols_pad
kw = dict(atol=1e-3, rtol=2e-3)


def check_lanes(tag, d_vb, seeds_np, rounds, lanes=8):
    errs = []
    for b in range(lanes):
        od, _ = nm.dijkstra(ew_np, costs_np, int(seeds_np[b]), 2.0)
        fin = np.isfinite(od)
        rel = np.abs(d_vb[:, b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(rel.max()))
    print(f"{tag:44s}: rounds={rounds} max rel={max(errs):.3e}", flush=True)


def raw(tag, seeds_np):
    fn = jax.jit(lambda s: pb.banded_solve_padded(plan, s, **kw))
    res = fn(jnp.asarray(seeds_np))
    jax.block_until_ready(res)
    B = len(seeds_np)
    d = np.asarray(res.d_pad)[:R, :C, :B].reshape(R * C, B)[:V]
    check_lanes(tag, d, seeds_np, int(res.rounds))


B = 512
seeds_unsorted = rng.integers(0, V, B).astype(np.int32)
raw("raw B=512 UNSORTED seeds", seeds_unsorted)

order, inv = pb.group_lanes(jnp.asarray(seeds_unsorted), V)
grouped = np.asarray(seeds_unsorted)[np.asarray(order)]
raw("raw B=512 bucket-GROUPED seeds", grouped)

# verify group_lanes inverse on host
assert np.array_equal(grouped[np.asarray(inv)], seeds_unsorted), "inv broken!"
print("# group_lanes inverse verified on host", flush=True)

# snap check: does nearest_vertex_batch agree with brute force on 64 pts?
pts = rng.uniform(1, mesh_n * 0.5 - 1, size=(64, 3)).astype(np.float32)
pts[:, 2] = 0.0
sv = np.asarray(query.nearest_vertex_batch(mesh, query.build_grid(mesh), jnp.asarray(pts))[0])
vpos = host_array(mesh, "vertices")
bad = 0
for i in range(64):
    d2 = ((vpos - pts[i]) ** 2).sum(axis=1)
    ref = np.argmin(d2)
    if d2[sv[i]] > d2[ref] + 1e-6:
        bad += 1
print(f"# snap mismatches (non-nearest): {bad}/64", flush=True)
