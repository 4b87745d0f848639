"""Benchmark: batched plan+control solves/s on a terrain mesh (single chip).

Prints diagnostics + secondary metric JSON lines, then ONE final JSON line
{"metric", "value", "unit", "vs_baseline"} — the headline metric; the target
is BASELINE.json's north star (>= 4096 batched plan+control solves/s on a
1M-vertex mesh on one host), so vs_baseline = solves_per_s / 4096.

Scenario (BASELINE.json configs[1]-[3]): steepness-layer costs, combined
edge weights, B batched start/goal scenarios solved per step. On band-
structured meshes (terrain grids — the headline 1M config) the solve runs
through the Pallas banded fast-sweeping kernel (ops/pallas_banded.py) with
path extraction and a controller velocity cycle per scenario, sampling the
direction field from the predecessor map (no [B, V, 3] field materializes).

Secondary lines measured per run:
  - path-cost parity vs the native C++ heap-Dijkstra oracle (stderr + gate)
  - sweep GB/s + fraction of HBM peak for the field solve (BASELINE metric)
  - cost-update -> refresh -> replan latency (the 50 Hz cascade, §3.5)
  - the same plan+control pipeline on an IRREGULAR (jittered-Delaunay,
    band-reordered) mesh of the same size — the reference's real input class

Env knobs: BENCH_MESH_N (default 1024 -> 1M vertices), BENCH_BATCH (1024),
BENCH_ITERS (4), BENCH_DTYPE (f32 | bf16), BENCH_SCAN_STEPS (0 = full),
BENCH_IRREGULAR (1 to include the irregular-mesh line), BENCH_REPLAN (1),
BENCH_ORACLE_LANES (2).
"""

from __future__ import annotations

import functools
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

HBM_PEAK_GBPS = 819.0  # TPU v5e HBM bandwidth (1 chip)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def emit(metric, value, unit, vs_baseline):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(float(value), 2),
                "unit": unit,
                "vs_baseline": round(float(vs_baseline), 4),
            }
        ),
        flush=True,
    )


def np_edge_weights(mesh, costs_np, factor):
    """Numpy mirror of sweeps.compute_edge_weights for the native oracle."""
    from mesh_navigation_tpu.mesh.arrays import host_array

    edges = host_array(mesh, "edges")
    dist = host_array(mesh, "edge_dist")
    c1, c2 = costs_np[edges[:, 0]], costs_np[edges[:, 1]]
    w = dist + factor * dist * (c1 + c2) * 0.5
    return np.where(np.isfinite(c1) & np.isfinite(c2), w, np.inf).astype(np.float32)


def build_pipeline(mesh, mesh_n, batch, dtype, scan_steps, label,
                   atol=1e-5, rtol=1e-5):
    """Steepness costs -> weights -> banded plan -> jitted solve_batch."""
    from mesh_navigation_tpu.config import ControllerConfig, PlannerConfig
    from mesh_navigation_tpu.control import MeshController
    from mesh_navigation_tpu.control.controller import initial_state
    from mesh_navigation_tpu.mesh.arrays import host_array
    from mesh_navigation_tpu.ops import sweeps
    from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner

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
    if kplan is None:
        raise RuntimeError(f"no banded plan for {label} mesh")
    log(
        f"# [{label}] banded plan: coverage {kplan.coverage:.4f} "
        f"n_scan={kplan.n_scan} n_residual={kplan.n_residual}"
    )
    tol = 1e-2 if dtype == jnp.bfloat16 else 1e-5

    def solve_batch(W_in, kp, grid, starts, goals, quats):
        res = planner.plan_batch_banded(
            W_in, kp, starts, goals, light=True, dtype=dtype,
            scan_steps=scan_steps, atol=atol, rtol=rtol, grid=grid,
        )
        st = jax.vmap(
            lambda g: initial_state(g, jnp.asarray([1.0, 0.0, 0.0]))
        )(goals)
        # controller reads the RAW padded field (d_pad reshaped) — the
        # [B, V] potential transpose never materializes (DCE'd output)
        dflat = res.d_pad.reshape(-1, res.d_pad.shape[-1])
        cmds, _ = ctrl.compute_velocity_banded(
            kp, dflat, costs, starts, quats, st, tol=tol,
            lane_minor=True, lane_map=res.lane_map, padded_flat=True,
        )
        # d_pad + lane_map ride along (alias of solver-internal buffers, no
        # extra compute): the oracle-parity stage extracts its few potential
        # lanes from them in a tiny separate jit instead of compiling a
        # second near-identical "solve_pot" program (~60 s of warm-up per
        # pipeline, VERDICT r4 #7)
        return (
            res.cost, cmds.linear, cmds.angular, res.outcome,
            res.path_positions, res.path_quats, res.path_valid,
            res.d_pad, res.lane_map,
        )

    @functools.partial(jax.jit, static_argnames=("n_lanes",))
    def potential_lanes(d_pad, lane_map, n_lanes):
        """[n_lanes, V] potential of the first n_lanes ORIGINAL lanes,
        un-permuting the solver's goal-grouped lane order."""
        R, C = kplan.n_rows, kplan.n_cols
        V = kplan.num_vertices
        B = lane_map.shape[0]
        pvb = d_pad[:R, :C, :B].reshape(R * C, B)[:V]
        return pvb[:, lane_map[:n_lanes]].T.astype(jnp.float32)

    return {
        "solve": jax.jit(solve_batch),
        "potential_lanes": potential_lanes,
        "planner": planner,
        "kplan": kplan,
        "W": W,
        "W_np": W_np,
        "costs": costs,
        "costs_np": costs_np,
        "grid": planner.grid,
    }


def sample_scenarios(rng, mesh_n, batch):
    extent = mesh_n * 0.5 - 1.0
    s = rng.uniform(1, extent, size=(batch, 3)).astype(np.float32)
    g = rng.uniform(1, extent, size=(batch, 3)).astype(np.float32)
    s[:, 2] = 0.0
    g[:, 2] = 0.0
    q = np.tile(np.asarray([0, 0, 0, 1], np.float32), (batch, 1))
    return jnp.asarray(s), jnp.asarray(g), jnp.asarray(q)


def oracle_check(mesh, pipe, out_potential, starts, goals, n_lanes, label):
    """Path-cost parity vs the native heap Dijkstra on sampled lanes
    (dijkstra_mesh_planner.cpp:287-348 semantics; BASELINE: within 1%)."""
    from mesh_navigation_tpu import native
    from mesh_navigation_tpu.mesh import query
    from mesh_navigation_tpu.mesh.arrays import host_array

    if not native.available():
        log(f"# [{label}] native oracle unavailable; skipping parity check")
        return None
    sv = np.asarray(
        jax.vmap(lambda p: query.nearest_vertex(mesh, pipe["grid"], p)[0])(starts)
    )
    gv = np.asarray(
        jax.vmap(lambda p: query.nearest_vertex(mesh, pipe["grid"], p)[0])(goals)
    )
    ew_np = np_edge_weights(mesh, pipe["costs_np"], 1.0)
    nm = native.NativeMesh(
        host_array(mesh, "vertices"), host_array(mesh, "faces")
    )
    pot = np.asarray(out_potential)
    errs = []
    for b in range(min(n_lanes, len(sv))):
        od, _ = nm.dijkstra(ew_np, pipe["costs_np"], int(gv[b]), 2.0)
        got = pot[b, sv[b]]
        ref = od[sv[b]]
        if np.isfinite(ref) and ref > 0:
            errs.append(abs(got - ref) / ref)
        finite = np.isfinite(od)
        got_f = pot[b][finite]
        ref_f = od[finite]
        rel = np.abs(got_f - ref_f) / np.maximum(ref_f, 1e-3)
        errs.append(float(np.percentile(rel, 99.9)))
    err = float(np.max(errs)) if errs else float("nan")
    log(f"# [{label}] oracle parity: max rel err {err:.2e} over {n_lanes} lanes")
    return err


def main():
    t_start = time.time()
    mesh_n = int(os.environ.get("BENCH_MESH_N", "1024"))    # mesh = n*n vertices
    # 1024 lanes amortize the serial path-walk + per-stage overheads:
    # measured 2532 (B=256) -> 2953 (512) -> 3045 (1024) solves/s at 1M
    batch = int(os.environ.get("BENCH_BATCH", "1024"))
    iters = int(os.environ.get("BENCH_ITERS", "4"))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE") == "bf16" else jnp.float32
    scan_steps = int(os.environ.get("BENCH_SCAN_STEPS", "0"))
    do_irregular = os.environ.get("BENCH_IRREGULAR", "1") == "1"
    do_replan = os.environ.get("BENCH_REPLAN", "1") == "1"
    oracle_lanes = int(os.environ.get("BENCH_ORACLE_LANES", "2"))
    # secondary stages each cost minutes of (remote) compile; skip any that
    # would start after this budget so the HEADLINE line always prints
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2700"))

    stages_run = []
    stages_failed = []

    def stage_ok(name):
        left = budget_s - (time.time() - t_start)
        if left < 60:
            log(f"# [{name}] skipped: bench budget exhausted ({left:.0f}s left)")
            # a skipped stage must be visible in the JSON artifact, not just
            # in a stderr comment (VERDICT r3 weak #7)
            emit(f"skipped_stage_{name}", 1, "flag", 0.0)
            return False
        stages_run.append(name)
        return True

    def stage_failed(name, exc):
        """A stage that CRASHES must be first-class artifact data, not a
        stderr line in an exit-0 run (VERDICT r4 weak #1)."""
        log(f"# [{name}] stage failed: {exc!r}")
        stages_failed.append(name)
        emit(f"failed_stage_{name}", 1, "flag", 0.0)

    def gate_parity(err, label, budget=0.01):
        """Hard parity gate (BASELINE: within 1% of the C++ oracle). A parity
        regression must fail the bench, not ship a green artifact."""
        if err is None:
            return
        assert err < budget, (
            f"[{label}] oracle parity {err:.3e} exceeds the {budget:.0%} budget"
        )

    from mesh_navigation_tpu.mesh import build_mesh, reorder, synthetic
    from mesh_navigation_tpu.ops import pallas_banded as pb
    from mesh_navigation_tpu.ops import sweeps

    rng = np.random.default_rng(0)

    # ------------------------------------------------------------------
    # headline mesh: 1M-vertex terrain grid
    # ------------------------------------------------------------------
    t0 = time.time()
    v, f = synthetic.terrain_mesh(
        mesh_n, mesh_n, spacing=0.5, hills=2.0, roughness=0.01, seed=0
    )
    mesh = build_mesh(v, f)
    log(
        f"# mesh {mesh.num_vertices} vertices, {mesh.num_faces} faces "
        f"(built in {time.time()-t0:.1f}s)"
    )
    # stopping tolerance rtol 2e-3 ends the loop after the last label-changing
    # round (rounds 3 -> 2 at 1M x 1024, solve 230 -> 195 ms; field err vs a
    # tight-tolerance solve measured 1.8e-3 and IDENTICAL for rtol 1e-3..5e-3).
    # BASELINE budget: 1% path cost; the gated oracle line reports the TRUE
    # error of every run.
    pipe = build_pipeline(
        mesh, mesh_n, batch, dtype, scan_steps, "grid", atol=1e-4, rtol=2e-3
    )

    args = sample_scenarios(rng, mesh_n, batch)
    # one retry: the remote-compile transport occasionally drops a response
    # mid-body; losing the whole bench to that blip is worse than 10 more
    # minutes of compile
    for attempt in (1, 2):
        try:
            out = pipe["solve"](pipe["W"], pipe["kplan"], pipe["grid"], *args)
            jax.block_until_ready(out)
            break
        except Exception as e:
            log(f"# [grid] warmup attempt {attempt} failed: {e!r}")
            if attempt == 2:
                raise
    log(f"# compiled+warm in {time.time()-t0:.1f}s")

    # oracle parity on the warmup batch: extract the checked lanes'
    # potential from the solve's own d_pad (tiny jit — no second program)
    pot_l = pipe["potential_lanes"](out[-2], out[-1], min(oracle_lanes, batch))
    err = oracle_check(mesh, pipe, pot_l, args[0], args[1], oracle_lanes, "grid")
    del pot_l
    gate_parity(err, "grid")

    t1 = time.time()
    for i in range(iters):
        out = None  # drop the previous d_pad ref before dispatching the next
        out = pipe["solve"](pipe["W"], pipe["kplan"], pipe["grid"], *sample_scenarios(rng, mesh_n, batch))
    jax.block_until_ready(out)
    dt = time.time() - t1
    solves_per_s = batch * iters / dt
    reached = float(np.isfinite(np.asarray(out[0])).mean())
    log(f"# {batch*iters} solves in {dt:.3f}s, reach rate {reached:.3f}")
    out = None   # drop the 4.3 GB d_pad ref before the later stages allocate

    # ------------------------------------------------------------------
    # sweep GB/s: the field solve alone, bytes = passes * 2 * field bytes
    # ------------------------------------------------------------------
    kp = pipe["kplan"]
    gbps_ok = stage_ok("gbps")
    if gbps_ok:
      try:
        seeds = jnp.sort(jnp.asarray(rng.integers(0, mesh.num_vertices, batch), jnp.int32))
        # kp as ARGUMENT: ~60 MB of plan tables would otherwise bake into
        # the serialized HLO (slow remote compile — the 413 disease)
        sfn = jax.jit(
            lambda kp_, s: pb.banded_solve_padded(
                kp_, s, dtype=dtype, scan_steps=scan_steps
            )
        )
        res = sfn(kp, seeds)
        jax.block_until_ready(res)
        t2 = time.time()
        n_rep = 3
        for i in range(n_rep):
            seeds_i = jnp.sort(
                jnp.asarray(rng.integers(0, mesh.num_vertices, batch), jnp.int32)
            )
            res = sfn(kp, seeds_i)
        jax.block_until_ready(res)
        dt_solve = (time.time() - t2) / n_rep
        rounds = int(res.rounds)
        Rp, Cp, Bp = res.d_pad.shape
        field_bytes = Rp * Cp * Bp * jnp.dtype(dtype).itemsize
        passes = 2 * rounds
        moved = passes * 2 * field_bytes
        gbps = moved / dt_solve / 1e9
        log(
            f"# field solve {dt_solve*1000:.1f} ms, rounds={rounds}, "
            f"{gbps:.0f} GB/s ({gbps/HBM_PEAK_GBPS:.2f}x peak)"
        )
        emit("sweep_gbps", gbps, "GB/s", gbps / HBM_PEAK_GBPS)
      except Exception as e:
        stage_failed("gbps", e)

    # ------------------------------------------------------------------
    # replan cascade — the REAL §3.5 change path, one jit per update:
    # point cloud -> obstacle raycast -> inflation wavefront (banded
    # Sethian) -> max combination -> edge-weight plane refresh ->
    # INCREMENTAL warm-started field solve
    # (layer_manager.cpp:202-263 fan-out; BASELINE configs[2]/[4] 50 Hz)
    # ------------------------------------------------------------------
    if do_replan and stage_ok("replan"):
      try:
        from mesh_navigation_tpu.api.server import MeshNavServer
        from mesh_navigation_tpu.config import (
            LayerConfig, MeshMapConfig, NavConfig, PlannerConfig,
        )

        t_rs = time.time()
        nav_cfg = NavConfig(
            mesh_map=MeshMapConfig(default_layer="combine", edge_cost_factor=1.0),
            planner=PlannerConfig(cost_limit=2.0),
            layers=(
                LayerConfig(name="steep", kind="steepness",
                            params=(("threshold", 2.0),)),
                LayerConfig(name="obst", kind="obstacle"),
                LayerConfig(name="infl", kind="inflation", inputs=("obst",),
                            params=(("repulsive_field", 0.0),)),
                LayerConfig(name="combine", kind="max_combination",
                            inputs=("steep", "obst", "infl")),
            ),
        )
        srv = MeshNavServer(mesh, nav_cfg, planner_kind="dijkstra")
        # warm_window stays OFF for this cohort: measured 33.1 Hz (None) vs
        # 19.2 Hz (384) on the jump/drift/clear mix — jump/drift shadows
        # span the mesh (window never fits) and a clear's improvement wave
        # crosses the slab border in its first down sweep, so the window
        # only pays for genuinely local updates / small cohorts
        step = srv.make_replan_step(
            "obst", warm_window=int(os.environ.get("BENCH_WARM_WINDOW", "0"))
            or None,
        )
        log(f"# [replan] server + cascade built (+{time.time()-t_rs:.1f}s)")

        # replan latency is per-UPDATE (one sensed obstacle -> refreshed
        # field for the active robot cohort); one 128-lane block
        b_rep = 128
        seeds_r = jnp.sort(
            jnp.asarray(rng.integers(0, mesh.num_vertices, b_rep), jnp.int32)
        )
        vpos_np = np.asarray(mesh.vertices)

        def cloud(center_vid, z_off=0.3):
            # sensed points hover above the surface around a random vertex;
            # z_off far above robot_height makes every ray miss — a pure
            # CLEAR update (previous obstacle vanishes, nothing added)
            ids = np.clip(
                center_vid + rng.integers(-2, 3, 512) * mesh_n
                + rng.integers(-2, 3, 512),
                0, mesh.num_vertices - 1,
            )
            return jnp.asarray(
                vpos_np[ids] + np.asarray([0, 0, z_off], np.float32)
            )

        # update-pattern diversity (VERDICT r4 weak #4): the measured Hz
        # averages a random JUMP, a small DRIFT (moving obstacle — the
        # previous cloud clears, a neighboring one appears), and a pure
        # CLEAR (all rays miss); each exercises a different changed-region
        # shape through the same compiled step
        def update_clouds():
            c0 = int(rng.integers(0, mesh.num_vertices))
            drift = int(np.clip(c0 + 3 * mesh_n + 3, 0, mesh.num_vertices - 1))
            return [cloud(c0), cloud(drift), cloud(c0, z_off=1e4)]

        base = pb.banded_solve_padded(
            srv.banded_plan, seeds_r, atol=1e-4, rtol=2e-3
        )
        costs_cur = srv.vertex_costs
        d_cur = base.d_pad
        out_r = step(cloud(rng.integers(0, mesh.num_vertices)),
                     costs_cur, d_cur, seeds_r)
        jax.block_until_ready(out_r)
        pats = update_clouds()
        t3 = time.time()
        for pts in pats:
            costs_cur, d_cur, rounds_r = step(pts, costs_cur, d_cur, seeds_r)
        jax.block_until_ready((costs_cur, d_cur))
        dt_replan = (time.time() - t3) / len(pats)
        log(
            f"# point-cloud->raycast->inflation->combine->refresh->"
            f"warm-resolve {dt_replan*1000:.1f} ms ({1.0/dt_replan:.1f} Hz, "
            f"B={b_rep} lanes/update, rounds={int(rounds_r)})"
        )
        emit("replan_cascade_hz", 1.0 / dt_replan, "Hz", (1.0 / dt_replan) / 50.0)
      except Exception as e:
        stage_failed("replan", e)

    # ------------------------------------------------------------------
    # CVP (the reference's flagship planner) at scale: banded fast-sweeping
    # eikonal solve + lazy descent paths (cvp_mesh_planner.cpp:651-970)
    # ------------------------------------------------------------------
    if os.environ.get("BENCH_CVP", "1") == "1" and stage_ok("cvp"):
      try:
        from mesh_navigation_tpu.config import PlannerConfig
        from mesh_navigation_tpu.mesh import query
        from mesh_navigation_tpu.planners import CVPPlanner

        t_c = time.time()
        # 128 = one full lane block (Bp pads to 128 anyway; 64 wastes half)
        cvp_b = int(os.environ.get("BENCH_CVP_BATCH", "128"))
        cvp = CVPPlanner(
            mesh, PlannerConfig(cost_limit=2.0), grid=pipe["grid"],
            max_path_len=max(2048, 3 * mesh_n),
        )
        ew_np = np_edge_weights(mesh, pipe["costs_np"], 1.0)
        ckplan = cvp.prepare_eikonal_plan(ew_np, pipe["costs_np"])
        if ckplan is None:
            log("# [cvp] no banded eikonal plan; skipping")
        else:
            log(
                f"# [cvp] plan cov={ckplan.coverage:.4f} "
                f"classes={len(ckplan.classes)} n_res={ckplan.n_residual} "
                f"({time.time()-t_c:.1f}s)"
            )
            ew_dev = jnp.asarray(ew_np)
            # plan_batch_banded routes through the module-level jitted
            # _plan_batch_banded_impl, which takes EVERY mesh-sized table
            # (mesh, grid, warm plan, target mask) as a pytree ARGUMENT —
            # nothing bakes into the serialized HLO, so the remote-compile
            # transport's size limit (the r4 HTTP 413) can't trip
            dij_plan = cvp._dij_plan

            def cfn(ew, kp, s, g, wp):
                return cvp.plan_batch_banded(ew, kp, s, g, warm_plan=wp)
            from mesh_navigation_tpu.mesh.arrays import host_array as _ha

            vpos = _ha(mesh, "vertices")

            def sample_on_surface():
                # CVP's containing-face search requires poses ON the surface
                # (max_dist gate, mesh_map.cpp:1120-1159) — sample vertices
                ids = rng.integers(0, mesh.num_vertices, 2 * cvp_b)
                p = vpos[ids].astype(np.float32)
                return jnp.asarray(p[:cvp_b]), jnp.asarray(p[cvp_b:])

            s_c, g_c = sample_on_surface()
            out_c = cfn(ew_dev, ckplan, s_c, g_c, dij_plan)
            jax.block_until_ready(out_c)
            log(f"# [cvp] compiled+warm (+{time.time()-t_c:.1f}s)")
            t_c2 = time.time()
            for i in range(iters):
                out_c = cfn(ew_dev, ckplan, *sample_on_surface(), dij_plan)
            jax.block_until_ready(out_c)
            dt_c = time.time() - t_c2
            sps_c = cvp_b * iters / dt_c
            reach_c = float(np.isfinite(np.asarray(out_c.cost)).mean())
            log(
                f"# [cvp] {cvp_b*iters} solves in {dt_c:.3f}s "
                f"({sps_c:.0f}/s, reach {reach_c:.3f})"
            )
            emit(
                f"cvp_plan_solves_per_s_{mesh.num_vertices}v",
                sps_c, "solves/s", sps_c / 4096.0,
            )
            # CVP parity vs the NATIVE fast-marching oracle
            # (cvp_mesh_planner.cpp:651-886 semantics) — gated like the
            # Dijkstra lines (VERDICT r3 weak #2). Re-solve on (s_c, g_c):
            # the timing loop's out_c belongs to its own last draw, so
            # checking it against the warmup goals compares mismatched
            # lanes (a guaranteed bogus gate failure)
            from mesh_navigation_tpu import native as _native

            out_c = cfn(ew_dev, ckplan, s_c, g_c, dij_plan)
            jax.block_until_ready(out_c.cost)
            if _native.available():
                nm_c = _native.NativeMesh(vpos, _ha(mesh, "faces"))
                gl = jax.vmap(
                    lambda g: query.containing_face(mesh, pipe["grid"], g)[0]
                )(g_c)
                gvid = _ha(mesh, "faces")[np.maximum(np.asarray(gl), 0)]
                gpos = np.asarray(g_c)
                pot_c = np.asarray(out_c.potential)
                errs_c = []
                for b in range(min(oracle_lanes, cvp_b)):
                    sd = np.linalg.norm(
                        vpos[gvid[b]] - gpos[b][None, :], axis=1
                    ).astype(np.float32)
                    od, _, _ = nm_c.cvp(
                        ew_np, pipe["costs_np"], gvid[b], sd, 2.0
                    )
                    fin = np.isfinite(od)
                    rel = np.abs(pot_c[b][fin] - od[fin]) / np.maximum(
                        od[fin], 1e-3
                    )
                    errs_c.append(float(np.percentile(rel, 99.9)))
                err_c = float(np.max(errs_c)) if errs_c else float("nan")
                log(
                    f"# [cvp] oracle parity: max rel err {err_c:.2e} "
                    f"over {min(oracle_lanes, cvp_b)} lanes"
                )
                gate_parity(err_c, "cvp")
            else:
                log("# [cvp] native oracle unavailable; parity not checked")
      except Exception as e:
        stage_failed("cvp", e)

    # ------------------------------------------------------------------
    # irregular (jittered-Delaunay, band-reordered) mesh, same size
    # ------------------------------------------------------------------
    if do_irregular and stage_ok("irregular"):
      try:
        t4 = time.time()
        vi, fi = synthetic.irregular_terrain_mesh(
            mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0,
            roughness=0.01, seed=1,
        )
        mesh_i = reorder.build_reordered_mesh(vi, fi)
        log(
            f"# irregular mesh {mesh_i.num_vertices} vertices, "
            f"{mesh_i.num_faces} faces (built in {time.time()-t4:.1f}s)"
        )
        # irregular meshes: refinement rounds dominate (zigzag geodesics);
        # stopping tolerance trades rounds for path-cost error inside the
        # BASELINE 1% budget (measured at 1M: rtol 1e-3 -> 0.34% / 188
        # solves/s; 3e-3 -> 1.12% / 395; 2e-3 sits under the budget).
        # int8 class preds + the compact residual slot table (r4) cut the
        # pred footprint 4x, so the full lane batch fits in HBM again
        # B=1024 OOMs with the residual scatter temporaries (~161k x Bp
        # candidate slabs alongside the 4 GB field); 512 is the fit
        b_irr = min(batch, 512)
        pipe_i = build_pipeline(
            mesh_i, mesh_n, b_irr, dtype, scan_steps, "irregular",
            atol=1e-3, rtol=2e-3,
        )
        args_i = sample_scenarios(rng, mesh_n, b_irr)
        out_i = pipe_i["solve"](pipe_i["W"], pipe_i["kplan"], pipe_i["grid"], *args_i)
        jax.block_until_ready(out_i)
        log(f"# irregular compiled+warm (+{time.time()-t4:.1f}s)")
        n_lanes_i = min(max(oracle_lanes, 8), b_irr)
        pot_li = pipe_i["potential_lanes"](out_i[-2], out_i[-1], n_lanes_i)
        err_i = oracle_check(
            mesh_i, pipe_i, pot_li, args_i[0], args_i[1],
            n_lanes_i, "irregular"
        )
        del pot_li
        gate_parity(err_i, "irregular")
        t5 = time.time()
        for i in range(iters):
            out_i = None
            out_i = pipe_i["solve"](
                pipe_i["W"], pipe_i["kplan"], pipe_i["grid"],
                *sample_scenarios(rng, mesh_n, b_irr)
            )
        jax.block_until_ready(out_i)
        dt_i = time.time() - t5
        sps_i = b_irr * iters / dt_i
        reached_i = float(np.isfinite(np.asarray(out_i[0])).mean())
        out_i = None
        log(f"# irregular: {b_irr*iters} solves in {dt_i:.3f}s, reach {reached_i:.3f}")
        emit(
            f"plan_control_solves_per_s_irregular_{mesh_i.num_vertices}v",
            sps_i, "solves/s", sps_i / 4096.0,
        )
      except Exception as e:
        stage_failed("irregular", e)

    # stage health summary: how many attempted stages finished green
    emit(
        "stages_green", len(stages_run) - len(stages_failed), "stages",
        (len(stages_run) - len(stages_failed)) / max(len(stages_run), 1),
    )
    # headline LAST (the driver parses the final JSON line)
    emit(
        f"plan_control_solves_per_s_{mesh.num_vertices}v",
        solves_per_s, "solves/s", solves_per_s / 4096.0,
    )


if __name__ == "__main__":
    main()
