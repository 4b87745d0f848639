"""Ad-hoc: piece-by-piece cost of the warm incremental resolve at 1M.

Pieces: invalidation prologue (threshold + shadow cut + reseed), one
directional pass (down, up), check certificate, full warm solve, plus the
DAG-only and DAG+refresh prefixes of the replan step.

Usage: python scripts/profile_warm.py [mesh_n] [B]
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

rng = np.random.default_rng(0)
vpos = np.asarray(mesh.vertices)


def cloud():
    cvid = rng.integers(0, V)
    ids = np.clip(cvid + rng.integers(-2, 3, 512) * mesh_n
                  + rng.integers(-2, 3, 512), 0, V - 1)
    return jnp.asarray(vpos[ids] + np.asarray([0, 0, 0.3], np.float32))


CLOUDS = [cloud() for _ in range(4)]


def timeit(name, fn, inputs, n_it=8):
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


plan0 = srv.banded_plan
costs0 = srv.vertex_costs
pos_planes = pb.position_planes(plan0, mesh)
seeds = jnp.sort(jnp.asarray(rng.integers(0, V, B), jnp.int32))
base = pb.banded_solve_padded(plan0, seeds, atol=1e-4, rtol=2e-3)
jax.block_until_ready(base.d_pad)
d_prev = base.d_pad
Rp, Cp, Bp = d_prev.shape
print(f"# field {Rp}x{Cp}x{Bp} = {Rp*Cp*Bp*4/1e6:.0f} MB", flush=True)

# a lethal disc like the bench's
pts = CLOUDS[0]
from mesh_navigation_tpu.layers.obstacle import ObstacleParams, process_point_cloud
fgrid = srv.layer_state.get("__face_grid__")
lethal = process_point_cloud(mesh, pts, ObstacleParams(robot_height=1.0),
                             face_grid=fgrid)
costs2 = jnp.where(lethal, jnp.inf, costs0)

# --- timed pieces -------------------------------------------------------
kp2 = pb.refresh_banded_planes_from_costs(plan0, costs2, edge_cost_factor=1.0,
                                          cost_limit=2.0)
jax.block_until_ready(kp2.down)
changed = pb.changed_plane_from_costs(plan0, costs0, costs2)


def nojit_block(x):
    jax.block_until_ready(x)
    return x


# 1. changed-plane compare
timeit("changed_plane", jax.jit(
    lambda c0, c2: pb.changed_plane_from_costs(plan0, c0, c2)),
    [(costs0, costs2)] * 2)

# 2. invalidation prologue alone (thresh + shadow + reseed) — replicate
INF = jnp.inf


def prologue(warm_d, ch):
    mask = pb._dilate_changed(plan0, ch)
    mask_p = jnp.pad(mask, ((0, Rp - mask.shape[0]), (0, 0)),
                     constant_values=False)
    wd32 = warm_d.astype(jnp.float32)
    thresh = jnp.min(jnp.where(mask_p[:, :, None], wd32, INF), axis=(0, 1))
    rtol, atol = 2e-3, 1e-4
    thresh = thresh * (1.0 - 2.0 * rtol) - 2.0 * atol
    cut = thresh[None, None, :]
    chm = mask_p
    pos = pos_planes
    n_ch = jnp.maximum(chm.sum(), 1)
    ctr = jnp.sum(jnp.where(chm[None], pos, 0.0), axis=(1, 2)) / n_ch
    dc = jnp.sqrt(jnp.sum((pos - ctr[:, None, None]) ** 2, axis=0))
    r_enc = jnp.max(jnp.where(chm, dc, 0.0))
    lb = jnp.maximum(dc - r_enc, 0.0)
    cut = cut + lb[:, :, None]
    d_start = jnp.where(wd32 >= cut, INF, warm_d)
    return d_start


d_start = timeit("invalidate prologue", jax.jit(prologue),
                 [(d_prev, changed)] * 2)
inv = jnp.isfinite(d_prev) & ~jnp.isfinite(d_start)
rows_inv = np.asarray(jnp.any(inv, axis=(1, 2)))
nz = np.nonzero(rows_inv)[0]
print(f"    invalidated labels: {int(jnp.sum(inv))} rows "
      f"{nz.min() if len(nz) else -1}..{nz.max() if len(nz) else -1} "
      f"({len(nz)} rows)", flush=True)

# 3. check certificate alone
timeit("check certificate", jax.jit(
    lambda d: pb.check_converged_banded(plan0, d, atol=1e-4, rtol=2e-3)),
    [(d_prev,)] * 2)

# 4. full warm solve (as the step runs it)
def warm(c2, d_prev_, s):
    kp = pb.refresh_banded_planes_rows(plan0, costs0, c2,
                                       edge_cost_factor=1.0, cost_limit=2.0)
    ch = pb.changed_plane_from_costs(plan0, costs0, c2)
    r = pb.banded_solve_padded(
        kp, s, atol=1e-4, rtol=2e-3, warm_d=d_prev_, warm_changed=ch,
        warm_pos=pos_planes, converge="check")
    return r.d_pad, r.rounds


out = timeit("refresh_rows+warm solve", jax.jit(warm),
             [(costs2, d_prev, seeds)] * 2)
print(f"    warm rounds={int(out[1])}", flush=True)

# 5. DAG-only prefix of the replan step
step = srv.make_replan_step("obst")
full = timeit("FULL cascade step", step,
              [(c, costs0, d_prev, seeds) for c in CLOUDS])
print(f"    rounds={int(full[2])}", flush=True)
print(f"# total {time.time()-t0:.1f}s", flush=True)
