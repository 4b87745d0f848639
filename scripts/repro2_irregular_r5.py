"""Round 5 bisect step 2: is the B=512 irregular corruption in the raw
banded solve, or in the light-path wrapper (group_lanes / un-permute)?

Runs banded_solve_padded directly on sorted seed vertices and compares the
padded field against the native heap oracle per lane.
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
from mesh_navigation_tpu.mesh import reorder, synthetic
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
print(f"# V={V} cov={plan.coverage:.4f} res={plan.n_residual}", flush=True)

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


def field_check(tag, B, lanes=8, **kw):
    seeds_np = np.sort(rng.integers(0, V, B).astype(np.int32))
    fn = jax.jit(lambda s: pb.banded_solve_padded(plan, s, **kw))
    res = fn(jnp.asarray(seeds_np))
    jax.block_until_ready(res)
    d = np.asarray(res.d_pad)[:R, :C, :B].reshape(R * C, B)[:V]
    errs = []
    for b in range(lanes):
        od, _ = nm.dijkstra(ew_np, costs_np, int(seeds_np[b]), 2.0)
        fin = np.isfinite(od)
        rel = np.abs(d[:, b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(rel.max()))
    print(
        f"{tag:44s}: rounds={int(res.rounds)} max rel={max(errs):.3e} "
        f"per-lane={['%.1e' % e for e in errs]}",
        flush=True,
    )


kw = dict(atol=1e-3, rtol=2e-3)
field_check("raw solve B=512", 512, **kw)
field_check("raw solve B=256", 256, **kw)
field_check("raw solve B=512 skip_rows=False", 512, skip_rows=False, **kw)
field_check("raw solve B=512 four_dir", 512, four_dir=True, **kw)
