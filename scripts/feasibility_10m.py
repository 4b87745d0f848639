"""configs[4] feasibility: 10M-vertex mesh partitioned across N>=2 hosts.

Builds a 10M-vertex terrain, the full 8-shard spatial partition with ring
halo tables, verifies per-shard memory against a v5e host budget, and runs
ONE partitioned sweep end-to-end on an 8-device virtual CPU mesh. Writes
MULTICHIP_10M.json with the measured numbers and the DCN plan.

Usage: python scripts/feasibility_10m.py [mesh_n=3163] [n_shards=8]
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array
from mesh_navigation_tpu.ops import sweeps
from mesh_navigation_tpu.parallel import build_partition, make_device_mesh
from mesh_navigation_tpu.parallel.partition import INF

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 3163   # 3163^2 ~ 10.0M
n_shards = int(sys.argv[2]) if len(sys.argv) > 2 else 8

t0 = time.time()
v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0,
                              roughness=0.01, seed=0)
mesh = build_mesh(v, f)
V = mesh.num_vertices
t_build = time.time() - t0
print(f"# mesh {V} vertices, {mesh.num_faces} faces ({t_build:.1f}s)", flush=True)

t1 = time.time()
nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1, 1)
costs_np = np.arccos(nz).astype(np.float32)
W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
part = build_partition(mesh, W_np, n_shards)
t_part = time.time() - t1
Vl, D = part.block, part.adj.shape[2]
XR, XL = part.exp_right.shape[1], part.exp_left.shape[1]
print(
    f"# partition: {n_shards} shards x {Vl} vertices, halo "
    f"{'ring' if part.neighbor_only else 'all_gather'} XR={XR} XL={XL} "
    f"({t_part:.1f}s)",
    flush=True,
)

# per-shard device memory at B=256 lanes (HBM budget check, v5e = 16 GB)
B = 256
bytes_tables = Vl * D * (4 + 4)          # adj + weights
bytes_field = Vl * B * 4                 # [Vl, B] f32 labels
bytes_ghosts = (XR + XL) * B * 4
per_shard_gb = (bytes_tables + 2 * bytes_field + bytes_ghosts) / 2**30
halo_mb_per_sweep = (XR + XL) * B * 4 / 2**20
print(
    f"# per-shard @B={B}: tables {bytes_tables/2**30:.2f} GiB, field x2 "
    f"{2*bytes_field/2**30:.2f} GiB, total {per_shard_gb:.2f} GiB "
    f"(v5e HBM 16 GiB); halo {halo_mb_per_sweep:.1f} MiB/sweep",
    flush=True,
)

# one partitioned sweep on the virtual 8-device mesh (compile + execute)
n_batch = 1
device_mesh = make_device_mesh(n_shards, n_batch)
rng = np.random.default_rng(0)
seeds = jnp.asarray(rng.integers(0, V, size=2), jnp.int32)

t2 = time.time()
from mesh_navigation_tpu.parallel import partitioned_field_solve

# max_sweeps=8 -> exactly one while_loop block of 8 sweeps (feasibility, not
# convergence: a converged 10M solve needs ~2*mesh_n sweeps of this gather
# formulation — the production path is the banded kernel per shard)
dist = partitioned_field_solve(
    part, seeds, device_mesh, max_sweeps=8, block_sweeps=8
)
dist.block_until_ready()
t_sweep = time.time() - t2
finite = int(np.isfinite(np.asarray(dist)).sum())
print(f"# one 8-sweep block at 10M: {t_sweep:.1f}s (compile incl.), "
      f"{finite} labels finite", flush=True)

artifact = {
    "num_vertices": V,
    "num_faces": int(mesh.num_faces),
    "n_shards": n_shards,
    "block_vertices": Vl,
    "halo": "ring_ppermute" if part.neighbor_only else "all_gather",
    "ring_widths": [XR, XL],
    "per_shard_gib_at_b256": round(per_shard_gb, 3),
    "halo_mib_per_sweep_b256": round(halo_mb_per_sweep, 2),
    "build_s": round(t_build, 1),
    "partition_s": round(t_part, 1),
    "one_block_sweep_s": round(t_sweep, 1),
    "dcn_plan": (
        "2 hosts x 4 chips: outer mesh axis = host (DCN), inner = chip "
        "(ICI). The x-sorted 1D cut keeps each host's shards contiguous, so "
        "exactly ONE ring exchange per sweep crosses DCN (the host-boundary "
        "pair); all other halos ride ICI. Ring traffic per sweep at B=256 "
        f"is {halo_mb_per_sweep:.1f} MiB total ({halo_mb_per_sweep/max(n_shards-1,1):.2f} "
        "MiB per boundary), ~100x under a 25 GB/s DCN link at 50 Hz "
        "replanning; the banded per-shard kernel replaces the gather sweep "
        "for the production path (same exchange pattern, one boundary row "
        "per pass)."
    ),
}
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "MULTICHIP_10M.json")
with open(out, "w") as fh:
    json.dump(artifact, fh, indent=1)
print(json.dumps(artifact), flush=True)
