"""Benchmark: batched plan solves/s on a terrain mesh (single chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; the target
is BASELINE.json's north star (>= 4096 batched plan+control solves/s on a
1M-vertex mesh on one host), so vs_baseline = solves_per_s / 4096.

Scenario (BASELINE.json configs[1]-[3]): steepness-layer costs, combined
edge weights, B batched start/goal scenarios solved in one [V, B] batched
fixed-point solve (ops/ordered.batched_field_hybrid) + vector maps + a
batched controller velocity cycle.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    mesh_n = int(os.environ.get("BENCH_MESH_N", "128"))     # mesh = n*n vertices
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "4"))

    from mesh_navigation_tpu.config import ControllerConfig
    from mesh_navigation_tpu.control import MeshController
    from mesh_navigation_tpu.control.controller import initial_state
    from mesh_navigation_tpu.mesh import build_mesh, query, synthetic
    from mesh_navigation_tpu.ops import ordered, structured, sweeps

    t0 = time.time()
    v, f = synthetic.terrain_mesh(
        mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0
    )
    mesh = build_mesh(v, f)
    grid = query.build_grid(mesh)
    print(
        f"# mesh {mesh.num_vertices} vertices, {mesh.num_faces} faces "
        f"(built in {time.time()-t0:.1f}s)",
        file=sys.stderr,
    )

    # steepness costs -> edge weights (configs[1] layer stack, trimmed)
    nz = jnp.clip(mesh.vertex_normals[:, 2], -1.0, 1.0)
    costs = jnp.arccos(nz).astype(jnp.float32)
    ew = sweeps.compute_edge_weights(mesh, costs, 1.0)
    W = sweeps.slot_weights(mesh, ew, costs, 2.0)

    plan = structured.build_offset_plan(mesh, W)
    print(f"# offset coverage {plan.coverage:.4f} (K={len(plan.offsets)})", file=sys.stderr)
    ctrl = MeshController(mesh, ControllerConfig())

    def solve_batch(starts, goals, quats):
        sv = jax.vmap(lambda p: query.nearest_vertex(mesh, grid, p)[0])(starts)
        gv = jax.vmap(lambda p: query.nearest_vertex(mesh, grid, p)[0])(goals)
        field = structured.batched_field_structured(
            mesh, W, plan, gv, block_sweeps=16
        )

        def finish(dist, pred, s, g, q, svi):
            vm = sweeps.vector_map_from_predecessors(mesh, pred)
            st = initial_state(g, jnp.asarray([1.0, 0.0, 0.0]))
            cmd, _ = ctrl.compute_velocity(vm, costs, s, q, st)
            return dist[svi], cmd.linear, cmd.angular

        return jax.vmap(finish)(field.dist, field.pred, starts, goals, quats, sv)

    solve = jax.jit(solve_batch)

    rng = np.random.default_rng(0)
    extent = mesh_n * 0.5 - 1.0

    def sample(i):
        s = rng.uniform(1, extent, size=(batch, 3)).astype(np.float32)
        g = rng.uniform(1, extent, size=(batch, 3)).astype(np.float32)
        s[:, 2] = 0.0
        g[:, 2] = 0.0
        q = np.tile(np.asarray([0, 0, 0, 1], np.float32), (batch, 1))
        return jnp.asarray(s), jnp.asarray(g), jnp.asarray(q)

    # warmup / compile
    args = sample(0)
    out = solve(*args)
    jax.block_until_ready(out)
    print(f"# compiled+warm in {time.time()-t0:.1f}s", file=sys.stderr)

    t1 = time.time()
    for i in range(iters):
        out = solve(*sample(i + 1))
    jax.block_until_ready(out)
    dt = time.time() - t1

    solves_per_s = batch * iters / dt
    reached = float(np.isfinite(np.asarray(out[0])).mean())
    print(
        f"# {batch * iters} solves in {dt:.3f}s, reach rate {reached:.3f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": f"plan_solves_per_s_{mesh.num_vertices}v",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 4096.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
