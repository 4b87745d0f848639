"""Benchmark: batched plan+control solves/s on a terrain mesh (single chip).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}; the target
is BASELINE.json's north star (>= 4096 batched plan+control solves/s on a
1M-vertex mesh on one host), so vs_baseline = solves_per_s / 4096.

Scenario (BASELINE.json configs[1]-[3]): steepness-layer costs, combined
edge weights, B batched start/goal scenarios solved per step. On band-
structured meshes (terrain grids — the headline 1M config) the solve runs
through the Pallas banded fast-sweeping kernel (ops/pallas_banded.py) with
path extraction and a controller velocity cycle per scenario, sampling the
direction field from the predecessor map (no [B, V, 3] field materializes).
Non-band meshes fall back to the structured offset-shift solver.

Env knobs: BENCH_MESH_N (default 1024 -> 1M vertices), BENCH_BATCH (256),
BENCH_ITERS (4), BENCH_DTYPE (f32 | bf16).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

# persistent compilation cache: the 1M-vertex pipeline costs ~10 min of
# (remote) XLA/Mosaic compile on first run; reruns should pay ~0
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    mesh_n = int(os.environ.get("BENCH_MESH_N", "1024"))    # mesh = n*n vertices
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE") == "bf16" else jnp.float32

    from mesh_navigation_tpu.config import ControllerConfig, PlannerConfig
    from mesh_navigation_tpu.control import MeshController
    from mesh_navigation_tpu.control.controller import initial_state
    from mesh_navigation_tpu.mesh import build_mesh, query, synthetic
    from mesh_navigation_tpu.mesh.arrays import host_array
    from mesh_navigation_tpu.ops import sweeps
    from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner

    t0 = time.time()
    v, f = synthetic.terrain_mesh(
        mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0
    )
    mesh = build_mesh(v, f)
    print(
        f"# mesh {mesh.num_vertices} vertices, {mesh.num_faces} faces "
        f"(built in {time.time()-t0:.1f}s)",
        file=sys.stderr,
    )

    # steepness costs -> edge weights (configs[1] layer stack, trimmed).
    # Weights are assembled host-side so the offset/banded plan build never
    # reads back from the device (d2h is ~0.2 MB/s over a tunneled backend).
    nz = np.clip(host_array(mesh, "vertex_normals")[:, 2], -1.0, 1.0)
    costs_np = np.arccos(nz).astype(np.float32)
    W_np = sweeps.slot_weights_np(mesh, costs_np, cost_limit=2.0, edge_cost_factor=1.0)
    costs = jnp.asarray(costs_np)
    W = jnp.asarray(W_np)

    max_path = max(2048, 3 * mesh_n)
    planner = DijkstraPlanner(
        mesh,
        PlannerConfig(method="batched", ordered_rounds=0, cost_limit=2.0),
        max_path_len=max_path,
    )
    ctrl = MeshController(mesh, ControllerConfig(), grid=planner.grid)
    kplan = planner.prepare_banded_plan(W_np)

    if kplan is not None:
        print(
            f"# banded kernel plan: coverage {kplan.coverage:.4f} "
            f"n_scan={kplan.n_scan} ({time.time()-t0:.1f}s)",
            file=sys.stderr,
        )

        def solve_batch(starts, goals, quats):
            res = planner.plan_batch_banded(
                W, kplan, starts, goals, light=True, dtype=dtype
            )
            st = jax.vmap(
                lambda g: initial_state(g, jnp.asarray([1.0, 0.0, 0.0]))
            )(goals)
            cmds, _ = ctrl.compute_velocity_banded(
                kplan, res.potential, costs, starts, quats, st
            )
            return res.cost, cmds.linear, cmds.angular, res.outcome
    else:
        from mesh_navigation_tpu.ops import structured

        plan = structured.build_offset_plan(mesh, W_np)
        print(f"# offset plan coverage {plan.coverage:.4f}", file=sys.stderr)

        def solve_batch(starts, goals, quats):
            sv = jax.vmap(lambda p: query.nearest_vertex(mesh, planner.grid, p)[0])(starts)
            gv = jax.vmap(lambda p: query.nearest_vertex(mesh, planner.grid, p)[0])(goals)
            field = structured.batched_field_structured(
                mesh, W, plan, gv, block_sweeps=16
            )

            def finish(dist, pred, s, g, q, svi):
                st = initial_state(g, jnp.asarray([1.0, 0.0, 0.0]))
                cmd, _ = ctrl.compute_velocity_pred(pred, costs, s, q, st)
                return dist[svi], cmd.linear, cmd.angular, jnp.int32(0)

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
                "metric": f"plan_control_solves_per_s_{mesh.num_vertices}v",
                "value": round(solves_per_s, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / 4096.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
