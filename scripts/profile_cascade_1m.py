"""Round 5: stage breakdown of the FULL 1M replan cascade (VERDICT r4 #3:
23.8 Hz -> 50 Hz). Builds the same server/step as bench.py's replan stage
and times cumulative prefixes of the cascade in separate jits:
  (a) layers only  (raycast -> inflation -> combine)
  (b) + plane-row refresh + changed plane
  (c) + warm incremental solve (the full step)

Usage: python scripts/profile_cascade_1m.py [mesh_n=1024] [B=128] [rounds_env]
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

from mesh_navigation_tpu.api.server import MeshNavServer, _refresh_base_planes
from mesh_navigation_tpu.config import (
    LayerConfig, MeshMapConfig, NavConfig, PlannerConfig,
)
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import pallas_banded as pb

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

stack = srv.stack
base_state = dict(srv.layer_state)
plan0 = srv.banded_plan
pos_planes = pb.position_planes(plan0, mesh)
key_pts = "obstacle:obst:points"
affected = {"obst", "infl", "combine"}
cached_outputs, combined0 = stack.compute(mesh, dict(base_state))
cached_outputs = {n: o for n, o in cached_outputs.items() if n not in affected}
base_planes = _refresh_base_planes(plan0, combined0, 1.0, 2.0)
jax.block_until_ready(base_planes.down)


def layers_part(points):
    st = dict(base_state)
    st[key_pts] = points
    st["__inflation_window__"] = (64, 128)
    st["__factors__"] = {c.name: c.factor for c in stack.configs}
    outputs = dict(cached_outputs)
    for name in stack.order:
        if name not in affected:
            continue
        c = next(c for c in stack.configs if c.name == name)
        inputs = {i: outputs[i] for i in c.inputs}
        outputs[name] = stack.fns[name](mesh, inputs, st)
    return outputs[stack.default_layer].costs


def refresh_part(bplanes, comb0, points, prev_costs):
    combined = layers_part(points)
    kp = pb.refresh_banded_planes_rows(
        bplanes, comb0, combined, edge_cost_factor=1.0, cost_limit=2.0,
    )
    changed = pb.changed_plane_from_costs(plan0, prev_costs, combined)
    return combined, kp.down, changed


def make_full_step(warm_window):
    def full_step(bplanes, comb0, points, prev_costs, d_prev, seeds):
        combined = layers_part(points)
        kp = pb.refresh_banded_planes_rows(
            bplanes, comb0, combined, edge_cost_factor=1.0, cost_limit=2.0,
        )
        changed = pb.changed_plane_from_costs(plan0, prev_costs, combined)
        res = pb.banded_solve_padded(
            kp, seeds, max_rounds=64, atol=1e-4, rtol=2e-3,
            warm_d=d_prev, warm_changed=changed, warm_pos=pos_planes,
            warm_window=warm_window, converge="check",
        )
        return combined, res.d_pad, res.rounds
    return full_step


rng = np.random.default_rng(0)
vpos = np.asarray(mesh.vertices)


def cloud():
    cvid = rng.integers(0, V)
    ids = np.clip(cvid + rng.integers(-2, 3, 512) * mesh_n
                  + rng.integers(-2, 3, 512), 0, V - 1)
    return jnp.asarray(vpos[ids] + np.asarray([0, 0, 0.3], np.float32))


CLOUDS = [cloud() for _ in range(4)]
seeds = jnp.sort(jnp.asarray(rng.integers(0, V, B), jnp.int32))
base = pb.banded_solve_padded(plan0, seeds, atol=1e-4, rtol=2e-3)
jax.block_until_ready(base.d_pad)


def timeit(name, fn, inputs, n_it=6):
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    t1 = time.time()
    for i in range(n_it):
        out = fn(*inputs[(i + 1) % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.time() - t1) / n_it
    print(f"{name:28s}: {dt*1000:8.2f} ms", flush=True)
    return out


lfn = jax.jit(layers_part)
timeit("layers (ray+infl+combine)", lfn, [(c,) for c in CLOUDS])

rfn = jax.jit(refresh_part)
timeit("+refresh+changed", rfn,
       [(base_planes, combined0, c, srv.vertex_costs) for c in CLOUDS])

ffn = jax.jit(make_full_step(None))
out = timeit("FULL (+warm solve)", ffn,
             [(base_planes, combined0, c, srv.vertex_costs, base.d_pad, seeds)
              for c in CLOUDS])
print(f"    rounds={int(out[2])}", flush=True)

wfn = jax.jit(make_full_step(384))
out = timeit("FULL (warm_window=384)", wfn,
             [(base_planes, combined0, c, srv.vertex_costs, base.d_pad, seeds)
              for c in CLOUDS])
print(f"    rounds={int(out[2])}", flush=True)
print(f"# total {time.time()-t0:.1f}s", flush=True)
