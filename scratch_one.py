import time, numpy as np, jax, jax.numpy as jnp
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps, ordered

N, B = 64, 16
v, f = synthetic.terrain_mesh(N, N, spacing=0.5, hills=2.0, seed=0)
m = build_mesh(v, f)
costs = jnp.zeros(m.num_vertices, jnp.float32)
ew = sweeps.compute_edge_weights(m, costs, 0.0)
W = sweeps.slot_weights(m, ew, costs, 2.0)
seeds = jnp.asarray(np.random.default_rng(0).integers(0, m.num_vertices, B), jnp.int32)
plan = ordered.build_sweep_plan(m, chunk=1024, directions=4)
t0=time.time()
fn = jax.jit(lambda s: ordered.batched_field_ordered(m, W, plan, s, max_rounds=16))
r = fn(seeds); jax.block_until_ready(r)
print(f"compile+first: {time.time()-t0:.1f}s rounds={int(r.rounds)}")
t0=time.time(); r = fn(seeds); jax.block_until_ready(r)
print(f"run: {(time.time()-t0)*1000:.1f} ms -> {B/(time.time()-t0):.1f} solves/s")
