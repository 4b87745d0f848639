"""Ad-hoc: stage breakdown of the live-replan cascade at 1M (bench replan
stage internals): raycast -> inflation -> combine -> refresh -> warm solve.

Usage: python scripts/profile_cascade.py [mesh_n] [B]
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

from mesh_navigation_tpu.api.server import MeshNavServer
from mesh_navigation_tpu.config import (
    LayerConfig, MeshMapConfig, NavConfig, PlannerConfig,
)
from mesh_navigation_tpu.layers.inflation import (
    InflationParams, fading, inflation_distances,
)
from mesh_navigation_tpu.layers.obstacle import ObstacleParams, process_point_cloud
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import banded_sethian as bs
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import raycast

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 128

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0,
                              roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
cfg = NavConfig(
    mesh_map=MeshMapConfig(default_layer="combine", edge_cost_factor=1.0),
    planner=PlannerConfig(cost_limit=2.0),
    layers=(
        LayerConfig(name="steep", kind="steepness", params=(("threshold", 2.0),)),
        LayerConfig(name="obst", kind="obstacle"),
        LayerConfig(name="infl", kind="inflation", inputs=("obst",),
                    params=(("repulsive_field", 0.0),)),
        LayerConfig(name="combine", kind="max_combination",
                    inputs=("steep", "obst", "infl")),
    ),
)
srv = MeshNavServer(mesh, cfg, planner_kind="dijkstra")
print(f"# server built ({time.time()-t0:.1f}s)", flush=True)

rng = np.random.default_rng(0)
vpos = np.asarray(mesh.vertices)


def cloud():
    cvid = rng.integers(0, V)
    ids = np.clip(cvid + rng.integers(-2, 3, 512) * mesh_n
                  + rng.integers(-2, 3, 512), 0, V - 1)
    return jnp.asarray(vpos[ids] + np.asarray([0, 0, 0.3], np.float32))


def timeit(name, fn, inputs, n_it=4):
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    tc = time.time() - t0
    t1 = time.time()
    for i in range(n_it):
        out = fn(*inputs[(i + 1) % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.time() - t1) / n_it
    print(f"{name:30s}: {dt*1000:8.2f} ms   (compiled by {tc:.0f}s)", flush=True)
    return out


CLOUDS = [cloud() for _ in range(4)]
params = ObstacleParams(robot_height=1.0)
fgrid = srv.layer_state.get("__face_grid__")
splan = srv.layer_state.get("__sethian_plan__")
infl = InflationParams()

ray = jax.jit(lambda p: process_point_cloud(mesh, p, params, face_grid=fgrid))
lethal = timeit("raycast->lethal", ray, [(c,) for c in CLOUDS])

sdist = jax.jit(lambda l: inflation_distances(
    mesh, l, infl, sethian_plan=splan).dist)
d_i = timeit("sethian inflation", sdist, [(lethal,)] * 2)

plan0 = srv.banded_plan
costs0 = srv.vertex_costs
ref = jax.jit(lambda c: pb.refresh_banded_planes_from_costs(
    plan0, c, edge_cost_factor=1.0, cost_limit=2.0).down)
timeit("plane refresh", ref, [(costs0,)] * 2)

seeds = jnp.sort(jnp.asarray(rng.integers(0, V, B), jnp.int32))
base = pb.banded_solve_padded(plan0, seeds, atol=1e-4, rtol=2e-3)
jax.block_until_ready(base.d_pad)

cold = jax.jit(lambda s: pb.banded_solve_padded(
    plan0, s, atol=1e-4, rtol=2e-3).d_pad)
timeit("cold solve", cold, [(seeds,)] * 2)

pos_planes = pb.position_planes(plan0, mesh)


def warm(c2, d_prev, s):
    kp = pb.refresh_banded_planes_from_costs(
        plan0, c2, edge_cost_factor=1.0, cost_limit=2.0)
    ch = pb.changed_plane_from_costs(plan0, costs0, c2)
    r = pb.banded_solve_padded(
        kp, s, atol=1e-4, rtol=2e-3, warm_d=d_prev, warm_changed=ch,
        warm_pos=pos_planes, converge="check")
    return r.d_pad, r.rounds


costs2 = jnp.where(lethal, jnp.inf, costs0)
wf = jax.jit(warm)
out = timeit("refresh+warm solve", wf, [(costs2, base.d_pad, seeds)] * 2)
print(f"    warm rounds={int(out[1])}", flush=True)

step = srv.make_replan_step("obst")
full = timeit("FULL cascade step", step,
              [(c, costs0, base.d_pad, seeds) for c in CLOUDS])
print(f"    rounds={int(full[2])}", flush=True)
print(f"# total {time.time()-t0:.1f}s", flush=True)
