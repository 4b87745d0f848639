import time, numpy as np, jax, jax.numpy as jnp
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps, structured

for N, B in [(256, 256), (512, 128)]:
    v, f = synthetic.terrain_mesh(N, N, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
    m = build_mesh(v, f)
    nz = jnp.clip(m.vertex_normals[:, 2], -1, 1)
    costs = jnp.arccos(nz).astype(jnp.float32)
    ew = sweeps.compute_edge_weights(m, costs, 1.0)
    W = sweeps.slot_weights(m, ew, costs, 2.0)
    plan = structured.build_offset_plan(m, W)
    seeds = jnp.asarray(np.random.default_rng(0).integers(0, m.num_vertices, B), jnp.int32)
    fn = jax.jit(lambda s: structured.batched_field_structured(m, W, plan, s))
    r = fn(seeds); jax.block_until_ready(r)
    t = time.time(); r = fn(seeds); jax.block_until_ready(r); dt = time.time()-t
    print(f"N={N} V={m.num_vertices} B={B}: {dt*1000:9.1f} ms sweeps={int(r.sweeps)} conv={bool(r.converged)} -> {B/dt:8.1f} solves/s", flush=True)
