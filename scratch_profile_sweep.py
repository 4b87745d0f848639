"""Profile sweep formulations on the real chip (scratch, not shipped)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps

N = 128
B = 64
SWEEPS = 100

v, f = synthetic.terrain_mesh(N, N, spacing=0.5, hills=2.0, seed=0)
m = build_mesh(v, f)
V, D = m.adj_vertex.shape
print(f"V={V} D={D}")
costs = jnp.zeros(V, jnp.float32)
ew = sweeps.compute_edge_weights(m, costs, 0.0)
W = sweeps.slot_weights(m, ew, costs, 10.0)
adj = m.adj_vertex

rng = np.random.default_rng(0)
seeds = jnp.asarray(rng.integers(0, V, B), jnp.int32)
dist0 = jnp.where(jnp.arange(V)[None, :] == seeds[:, None], 0.0, jnp.inf).astype(jnp.float32)


def bench(name, fn, *args):
    g = jax.jit(fn)
    out = g(*args); jax.block_until_ready(out)
    t = time.time()
    out = g(*args); jax.block_until_ready(out)
    dt = time.time() - t
    bytes_per_sweep = B * V * D * 4 * 2 + B * V * 4 * 2
    print(f"{name:28s} {dt*1000:8.1f} ms  {SWEEPS*bytes_per_sweep/dt/1e9:8.1f} GB/s eff")
    return out


# A: batched gather [B, V] -> [B, V, D]
def sweep_a(dist):
    def body(_, d):
        cand = d[:, adj] + W[None]
        return jnp.minimum(d, cand.min(-1))
    return jax.lax.fori_loop(0, SWEEPS, body, dist)

# B: vmap of per-scenario gather
def sweep_b(dist):
    def one(d):
        def body(_, dd):
            return jnp.minimum(dd, (dd[adj] + W).min(-1))
        return jax.lax.fori_loop(0, SWEEPS, body, d)
    return jax.vmap(one)(dist)

# C: transpose layout [V, B]: gather rows of a [V, B] matrix -> [V, D, B]
WT = W[:, :, None]
def sweep_c(distT):  # [V, B]
    def body(_, d):
        cand = d[adj] + WT      # [V, D, B]
        return jnp.minimum(d, cand.min(1))
    return jax.lax.fori_loop(0, SWEEPS, body, distT)

# D: take_along_axis style with flat indices
flat_adj = adj.reshape(-1)
def sweep_d(dist):
    def body(_, d):
        g = jnp.take(d, flat_adj, axis=1).reshape(B, V, D)
        return jnp.minimum(d, (g + W[None]).min(-1))
    return jax.lax.fori_loop(0, SWEEPS, body, dist)

# E: unrolled per-slot gathers (D separate [V] gathers, no [B,V,D] buffer)
adj_cols = [adj[:, j] for j in range(D)]
W_cols = [W[:, j] for j in range(D)]
def sweep_e(dist):
    def body(_, d):
        best = d
        for j in range(D):
            best = jnp.minimum(best, d[:, adj_cols[j]] + W_cols[j][None])
        return best
    return jax.lax.fori_loop(0, SWEEPS, body, dist)

bench("A batched gather", sweep_a, dist0)
bench("B vmap gather", sweep_b, dist0)
bench("C [V,B] layout", sweep_c, dist0.T)
bench("D flat take", sweep_d, dist0)
bench("E per-slot gathers", sweep_e, dist0)
