"""Secondary benchmark: the live layer-update cascade (BASELINE configs[2]).

Measures the sensor -> obstacle -> inflation -> combination -> edge-weights
path (SURVEY.md §3.5) as one jitted update, i.e. the replanning-budget
question: at what rate can the full cost DAG re-evaluate on a terrain mesh
while sensor clouds stream in? The reference recomputes the inflation layer
over the whole mesh on any change (inflation_layer.cpp:141-151); here that
full recompute is a bounded-sweep batched eikonal.

Prints one JSON line (informational; the driver metric comes from bench.py).
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
    mesh_n = int(os.environ.get("BENCH_MESH_N", "128"))
    n_points = int(os.environ.get("BENCH_POINTS", "4096"))
    iters = int(os.environ.get("BENCH_ITERS", "16"))

    from mesh_navigation_tpu.layers.inflation import (
        InflationParams, fading, inflation_distances,
    )
    from mesh_navigation_tpu.layers.obstacle import ObstacleParams, process_point_cloud
    from mesh_navigation_tpu.mesh import build_mesh, synthetic
    from mesh_navigation_tpu.ops import raycast, sweeps

    t0 = time.time()
    v, f = synthetic.terrain_mesh(mesh_n, mesh_n, spacing=0.5, hills=2.0, seed=0)
    mesh = build_mesh(v, f)
    fgrid = raycast.build_face_grid(mesh)
    # banded (shift-based) Sethian wavefront — the at-scale inflation path;
    # None on non-banded meshes (gather eikonal fallback)
    try:
        from mesh_navigation_tpu.ops import banded_sethian as _bs

        splan = _bs.build_sethian_plan(mesh)
    except ValueError:
        splan = None
    print(
        f"# mesh {mesh.num_vertices} vertices, inflation="
        f"{'banded-sethian' if splan is not None else 'gather'} "
        f"({time.time()-t0:.1f}s)", file=sys.stderr,
    )

    nz = jnp.clip(mesh.vertex_normals[:, 2], -1.0, 1.0)
    steep = jnp.arccos(nz).astype(jnp.float32)
    params = ObstacleParams(robot_height=1.0)
    infl = InflationParams(inflation_radius=2.0, inscribed_radius=0.5)

    def cascade(points):
        lethal = process_point_cloud(mesh, points, params, face_grid=fgrid)
        res = inflation_distances(
            mesh, lethal, infl, max_sweeps=64, sethian_plan=splan
        )
        infl_costs = jnp.where(jnp.isfinite(res.dist), fading(res.dist, infl), 0.0)
        combined = jnp.maximum(steep, infl_costs)          # max combination
        ew = sweeps.compute_edge_weights(mesh, combined, 1.0)
        return combined, ew

    step = jax.jit(cascade)

    rng = np.random.default_rng(0)
    extent = mesh_n * 0.5 - 2.0

    def cloud(i):
        p = rng.uniform(2, extent, size=(n_points, 3)).astype(np.float32)
        p[:, 2] = 3.0  # above the terrain; rays cast straight down
        return jnp.asarray(p)

    out = step(cloud(0))
    jax.block_until_ready(out)
    print(f"# compiled in {time.time()-t0:.1f}s", file=sys.stderr)

    t1 = time.time()
    for i in range(iters):
        out = step(cloud(i + 1))
    jax.block_until_ready(out)
    dt = time.time() - t1
    hz = iters / dt
    print(f"# {iters} cascades in {dt:.3f}s", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": f"layer_cascade_hz_{mesh.num_vertices}v_{n_points}pts",
                "value": round(hz, 2),
                "unit": "Hz",
                "vs_baseline": round(hz / 50.0, 4),   # 50 Hz replanning budget
            }
        )
    )


if __name__ == "__main__":
    main()
