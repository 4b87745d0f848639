import time, numpy as np, jax, jax.numpy as jnp
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps, ordered

for N, B in [(128, 64), (256, 64)]:
    v, f = synthetic.terrain_mesh(N, N, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
    m = build_mesh(v, f)
    nz = jnp.clip(m.vertex_normals[:, 2], -1, 1)
    costs = jnp.arccos(nz).astype(jnp.float32)
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    W = sweeps.slot_weights(m, ew, costs, 2.0)
    seeds = jnp.asarray(np.random.default_rng(0).integers(0, m.num_vertices, B), jnp.int32)
    for ndir in (4, 8):
        plan = ordered.build_sweep_plan(m, directions=ndir)
        fn = jax.jit(lambda s: ordered.batched_field_ordered(m, W, plan, s, max_rounds=32))
        r = fn(seeds); jax.block_until_ready(r)
        t = time.time(); r = fn(seeds); jax.block_until_ready(r); dt = time.time()-t
        print(f"N={N} B={B} ndir={ndir}: {dt*1000:7.1f} ms rounds={int(r.rounds)} -> {B/dt:8.1f} solves/s", flush=True)
