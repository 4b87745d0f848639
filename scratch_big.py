import time, numpy as np, jax, jax.numpy as jnp
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps, ordered

def bench(N, B):
    t0=time.time()
    v, f = synthetic.terrain_mesh(N, N, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
    m = build_mesh(v, f)
    nz = jnp.clip(m.vertex_normals[:, 2], -1, 1)
    costs = jnp.arccos(nz).astype(jnp.float32)
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    W = sweeps.slot_weights(m, ew, costs, 2.0)
    plan = ordered.SweepPlan(chunks=jnp.zeros((1,1,1), jnp.int32), num_vertices=m.num_vertices)
    seeds = jnp.asarray(np.random.default_rng(0).integers(0, m.num_vertices, B), jnp.int32)
    fn = jax.jit(lambda s: ordered.batched_field_hybrid(m, W, plan, s, ordered_rounds=0))
    r = fn(seeds); jax.block_until_ready(r)
    print(f"N={N} B={B}: prep+compile {time.time()-t0:.0f}s", flush=True)
    t = time.time(); r = fn(seeds); jax.block_until_ready(r); dt = time.time()-t
    print(f"N={N} B={B}: {dt*1000:8.1f} ms rounds={int(r.rounds)} -> {B/dt:8.1f} solves/s", flush=True)

bench(128, 512)
bench(128, 1024)
bench(512, 64)
