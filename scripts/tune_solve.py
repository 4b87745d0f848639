"""Ad-hoc: (a) stopping-tolerance vs rounds vs parity at 1M; (b) warm
incremental resolve latency at replan batch sizes.

Usage: python scripts/tune_solve.py [mesh_n] [batch]
"""
import gc
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
B = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
costs = jnp.asarray(costs_np)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
plan = pb.build_banded_kernel_plan(mesh, W_np)
print(f"# setup ({time.time()-t0:.1f}s)", flush=True)

rng = np.random.default_rng(0)
SEEDS = [jnp.sort(jnp.asarray(rng.integers(0, V, size=B), jnp.int32)) for _ in range(3)]


def timeit(name, fn, inputs, n_it=4):
    out = fn(*inputs[0])
    jax.block_until_ready(out)
    tc = time.time() - t0
    t1 = time.time()
    for i in range(n_it):
        out = fn(*inputs[(i + 1) % len(inputs)])
    jax.block_until_ready(out)
    dt = (time.time() - t1) / n_it
    print(f"{name:34s}: {dt*1000:8.2f} ms   (compiled by {tc:.0f}s)", flush=True)
    return out


err_fn = jax.jit(
    lambda d, r: jnp.nanmax(
        jnp.where(jnp.isfinite(r), jnp.abs(d - r) / jnp.maximum(r, 1e-3), 0.0)
    )
)

# phase A: timing at full B
res = None
for rtol in (1e-3, 2e-3, 3e-3, 5e-3):
    del res
    gc.collect()
    solve = jax.jit(lambda s, rt=rtol: pb.banded_solve_padded(
        plan, s, max_rounds=64, atol=1e-4, rtol=rt))
    res = timeit(f"solve rtol={rtol:g}", solve, [(s,) for s in SEEDS])
    print(f"    rounds={int(res.rounds)} conv={bool(res.converged)}", flush=True)
del res
gc.collect()

# phase B: parity at B=128 vs a tight-tolerance reference
B2 = 128
s2 = jnp.sort(jnp.asarray(rng.integers(0, V, size=B2), jnp.int32))
d_ref = jax.jit(lambda s: pb.banded_solve_padded(
    plan, s, max_rounds=64, atol=1e-7, rtol=1e-7).d_pad)(s2)
jax.block_until_ready(d_ref)
for rtol in (1e-3, 2e-3, 3e-3, 5e-3):
    r = jax.jit(lambda s, rt=rtol: pb.banded_solve_padded(
        plan, s, max_rounds=64, atol=1e-4, rtol=rt))(s2)
    e = float(err_fn(r.d_pad.astype(jnp.float32), d_ref.astype(jnp.float32)))
    print(f"    rtol={rt if (rt:=rtol) else rtol:g}: rounds={int(r.rounds)} "
          f"max rel err vs tight = {e:.2e}", flush=True)
    del r
    gc.collect()
del d_ref
gc.collect()

# ---- warm incremental resolve at replan batch ------------------------------
Brep = int(os.environ.get("TUNE_BREP", "256"))
seeds_r = jnp.sort(jnp.asarray(rng.integers(0, V, size=Brep), jnp.int32))
base = jax.jit(lambda s: pb.banded_solve_padded(
    plan, s, max_rounds=64, atol=1e-4, rtol=1e-3))(seeds_r)
jax.block_until_ready(base)
print(f"# warm base solved rounds={int(base.rounds)}", flush=True)


def replan_warm(costs_in, ctr, d_prev, s):
    d2 = jnp.sum((mesh.vertices[:, :2] - ctr) ** 2, axis=1)
    new_costs = jnp.where(d2 < 4.0, jnp.inf, costs_in)
    kp = pb.refresh_banded_planes_from_costs(
        plan, new_costs, edge_cost_factor=1.0, cost_limit=2.0
    )
    changed = pb.changed_plane_from_costs(plan, costs_in, new_costs)
    res = pb.banded_solve_padded(
        kp, s, max_rounds=64, atol=1e-4, rtol=1e-3,
        warm_d=d_prev, warm_changed=changed, warm_pos=POS, converge="check",
    )
    return res.d_pad, res.rounds


def replan_cold(costs_in, ctr, s):
    d2 = jnp.sum((mesh.vertices[:, :2] - ctr) ** 2, axis=1)
    new_costs = jnp.where(d2 < 4.0, jnp.inf, costs_in)
    kp = pb.refresh_banded_planes_from_costs(
        plan, new_costs, edge_cost_factor=1.0, cost_limit=2.0
    )
    res = pb.banded_solve_padded(kp, s, max_rounds=64, atol=1e-4, rtol=1e-3)
    return res.d_pad, res.rounds

POS = pb.position_planes(plan, mesh)
CTRS = [jnp.asarray(rng.uniform(40, mesh_n * 0.5 - 40, 2).astype(np.float32))
        for _ in range(4)]
wf = jax.jit(replan_warm)
out = timeit("replan warm (refresh+resolve)", wf,
             [(costs, c, base.d_pad, seeds_r) for c in CTRS])
print(f"    warm rounds={int(out[1])}", flush=True)
cf = jax.jit(replan_cold)
out2 = timeit("replan cold (refresh+solve)", cf,
              [(costs, c, seeds_r) for c in CTRS])
print(f"    cold rounds={int(out2[1])}", flush=True)
e = float(err_fn(out[0].astype(jnp.float32), out2[0].astype(jnp.float32)))
print(f"    warm-vs-cold max rel err {e:.2e}", flush=True)
print(f"# total {time.time()-t0:.1f}s", flush=True)
