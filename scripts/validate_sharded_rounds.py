"""Round 5: MEASURE the sharded round count at a real intermediate geometry
(default 2.5M/8) on the single chip, so MULTICHIP_10M's solve time stops
resting on an extrapolated round count (VERDICT r4 weak #5).

The 8-shard block-Jacobi solve is emulated exactly in one jit: the field
carries a leading shard axis [n, RpL, Cp, Bp], the ghost exchange is a
slice across that axis (identical data flow to the ppermute version in
parallel/sharded_banded.py — shard k's ghosts get neighbor k∓1's PRE-round
boundary rows), and a lax.scan over shards runs the unmodified directional
passes. Round count and the fixed point are therefore THE sharded solver's;
only the wall-clock is sequential (divide by n for the parallel projection,
or use the independently measured per-shard round cost at the true 10M/8
geometry, MULTICHIP_10M.json banded_shard.round_ms_measured_v5e).

Usage: python scripts/validate_sharded_rounds.py [mesh_n=1584] [B=8] [n=8]
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

from mesh_navigation_tpu import native
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import pallas_banded as pb
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.parallel import sharded_banded as sb

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 1584
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
n_sh = int(sys.argv[3]) if len(sys.argv) > 3 else 8

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0,
                              roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0,
                              edge_cost_factor=1.0)
plan = pb.build_banded_kernel_plan(mesh, W_np)
splan = sb.build_sharded_banded_plan(plan, n_sh)
print(f"# {V} vertices, {n_sh} shards of {splan.rows_per_shard} rows "
      f"({time.time()-t0:.1f}s)", flush=True)

n, Rs, RpL = splan.n_shards, splan.rows_per_shard, splan.rp_local
C, Cp = splan.n_cols, splan.n_cols_pad
G = splan.ghost
rb, bb = splan.rb, splan.bb
Bp = -(-B // bb) * bb
if splan.n_scan2:
    a_f = splan.a_fwd[:, :, :3]
    a_b = splan.a_bwd[:, :, :3]
    n_scan_eff = 3
else:
    a_f, a_b = splan.a_fwd, splan.a_bwd
    n_scan_eff = splan.n_scan

rng = np.random.default_rng(0)
seeds_np = np.sort(rng.integers(0, V, B).astype(np.int32))
rows_g = seeds_np // C
cols_g = seeds_np % C

# seeded per-shard field [n, RpL, Cp, Bp]
d0 = np.full((n, RpL * Cp, Bp), np.inf, np.float32)
for b in range(B):
    k = min(rows_g[b] // Rs, n - 1)
    lr = rows_g[b] - k * Rs + G
    d0[k, lr * Cp + cols_g[b], b] = 0.0
d0 = jnp.asarray(d0.reshape(n, RpL, Cp, Bp))

xdummy = jnp.full((RpL, 1, Cp), jnp.inf, jnp.float32)
dirty0 = jnp.zeros((1, 1), jnp.int32)


def exchange(d):
    INF = jnp.inf
    top = jnp.concatenate(
        [jnp.full((1, G, Cp, Bp), INF), d[:-1, Rs : Rs + G]], axis=0
    )
    bot = jnp.concatenate(
        [d[1:, G : 2 * G], jnp.full((1, G, Cp, Bp), INF)], axis=0
    )
    d = d.at[:, :G].set(top)
    d = d.at[:, G + Rs : G + Rs + G].set(bot)
    return d


def one_round(d, force=False):
    d = exchange(d)

    def shard_body(carry, xs):
        dk, down, up, af, ab, l2f, l2b, wb = xs
        dk, chg_dn, _ = pb._directional_pass_pallas(
            dk, down, af, ab, xdummy, l2f, l2b, wb, dirty0,
            reverse=False, rb=rb, bb=bb, n_scan=n_scan_eff,
            n_scan2=splan.n_scan2, atol=1e-4, rtol=2e-3,
            skip=True, force=force, use_dirty=False, xlanes=(),
        )
        dk, chg_up, _ = pb._directional_pass_pallas(
            dk, up, af, ab, xdummy, l2f, l2b, wb, dirty0,
            reverse=True, rb=rb, bb=bb, n_scan=n_scan_eff,
            n_scan2=splan.n_scan2, atol=1e-4, rtol=2e-3,
            skip=True, use_dirty=False, xlanes=(),
        )
        return carry | chg_dn | chg_up, dk

    changed, d_new = jax.lax.scan(
        shard_body, jnp.bool_(False),
        (d, splan.down, splan.up, a_f, a_b,
         splan.l2_fwd, splan.l2_bwd, splan.wback),
    )
    return d_new, changed


rfn = jax.jit(lambda d: one_round(d))
rfn0 = jax.jit(lambda d: one_round(d, force=True))

t1 = time.time()
d, chg = rfn0(d0)
jax.block_until_ready(d)
print(f"# compiled+first round in {time.time()-t1:.1f}s", flush=True)
rounds = 1
t2 = time.time()
while bool(chg) and rounds < 256:
    d, chg = rfn(d)
    rounds += 1
dt_total = time.time() - t2
print(
    f"# MEASURED sharded rounds at {V}/{n_sh}: {rounds} "
    f"(sequential emulation {dt_total:.1f}s for rounds 2..{rounds}; "
    f"parallel projection ~= rounds x per-shard round cost)",
    flush=True,
)

# parity vs native oracle on 2 lanes
dn = np.asarray(d)
dist = np.full((V, B), np.inf, np.float32)
for k in range(n):
    r0, r1 = k * Rs, min((k + 1) * Rs, splan.n_rows)
    own = dn[k, G : G + (r1 - r0), :C].reshape(-1, Bp)[:, :B]
    v0 = r0 * C
    dist[v0 : v0 + own.shape[0]] = own[: max(0, min(V - v0, own.shape[0]))]
err = float("nan")
if native.available():
    edges = host_array(mesh, "edges")
    edist = host_array(mesh, "edge_dist")
    c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
    ew_np = np.where(np.isfinite(c1) & np.isfinite(c2),
                     edist + edist * (c1 + c2) * 0.5, np.inf).astype(np.float32)
    nm = native.NativeMesh(host_array(mesh, "vertices"), host_array(mesh, "faces"))
    errs = []
    for b in range(min(2, B)):
        od, _ = nm.dijkstra(ew_np, costs_np, int(seeds_np[b]), 2.0)
        fin = np.isfinite(od)
        rel = np.abs(dist[:, b][fin] - od[fin]) / np.maximum(od[fin], 1e-3)
        errs.append(float(np.percentile(rel, 99.9)))
    err = max(errs)
    print(f"# oracle parity p99.9 REL err {err:.2e} over 2 lanes "
          f"(stopping tolerance rtol=2e-3 bounds it)", flush=True)

# record into MULTICHIP_10M.json
path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "MULTICHIP_10M.json")
with open(path) as fh:
    doc = json.load(fh)
doc["sharded_rounds_validation"] = {
    "geometry_vertices": int(V),
    "n_shards": int(n_sh),
    "batch": int(B),
    "rounds_measured": int(rounds),
    "stopping": "atol=1e-4 rtol=2e-3 (the production replan tolerance)",
    "oracle_p999_rel_err": err,
    "method": "exact block-Jacobi emulation on one chip (scan over shards, "
              "slice ghost exchange) — same data flow as "
              "parallel/sharded_banded.py, measured not extrapolated",
}
bs = doc.get("banded_shard", {})
if "sharded_rounds_estimate" in bs:
    bs["sharded_rounds_estimate_note"] = (
        "superseded by sharded_rounds_validation (measured)"
    )
with open(path, "w") as fh:
    json.dump(doc, fh, indent=1)
print("# MULTICHIP_10M.json updated", flush=True)
