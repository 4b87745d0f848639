import time, numpy as np, jax, jax.numpy as jnp
from mesh_navigation_tpu.mesh import build_mesh, synthetic
from mesh_navigation_tpu.ops import sweeps

N, B, S = 128, 256, 100
v, f = synthetic.terrain_mesh(N, N, spacing=0.5, hills=2.0, roughness=0.01, seed=0)
m = build_mesh(v, f)
nz = jnp.clip(m.vertex_normals[:, 2], -1, 1)
costs = jnp.arccos(nz).astype(jnp.float32)
ew = sweeps.compute_edge_weights(m, costs, 1.0)
W = sweeps.slot_weights(m, ew, costs, 2.0)
adj = np.asarray(m.adj_vertex); Wn = np.asarray(W)
V, D = adj.shape

# offset histogram (natural order is already x-major for grid_mesh)
delta = adj - np.arange(V)[:, None]
vals, cnts = np.unique(delta[np.isfinite(Wn)], return_counts=True)
top = vals[np.argsort(-cnts)][:8]
cov = cnts[np.argsort(-cnts)][:8].sum() / np.isfinite(Wn).sum()
print("top offsets:", top, f"coverage {cov:.4f}")

# per-offset weight planes
planes = []
for d in top:
    wd = np.full(V, np.inf, np.float32)
    hit = (delta == d) & np.isfinite(Wn)
    rows, slots = np.nonzero(hit)
    wd[rows] = Wn[rows, slots]
    planes.append((int(d), jnp.asarray(wd)))

rng = np.random.default_rng(0)
seeds = jnp.asarray(rng.integers(0, V, B), jnp.int32)
dist0 = jnp.where(jnp.arange(V)[:, None] == seeds[None, :], 0.0, jnp.inf).astype(jnp.float32)

def roll_sweeps(dist):
    def body(_, d):
        best = d
        for off, wd in planes:
            best = jnp.minimum(best, jnp.roll(d, -off, axis=0) + wd[:, None])
        return best
    return jax.lax.fori_loop(0, S, body, dist)

adj_cols = [jnp.asarray(adj[:, j]) for j in range(D)]
w_cols = [jnp.asarray(Wn[:, j])[:, None] for j in range(D)]
def gather_sweeps(dist):
    def body(_, d):
        best = d
        for j in range(D):
            best = jnp.minimum(best, d[adj_cols[j]] + w_cols[j])
        return best
    return jax.lax.fori_loop(0, S, body, dist)

for name, fn in [("roll", roll_sweeps), ("gather", gather_sweeps)]:
    g = jax.jit(fn)
    r = g(dist0); jax.block_until_ready(r)
    t = time.time(); r = g(dist0); jax.block_until_ready(r); dt = time.time()-t
    print(f"{name}: {dt/S*1000:.3f} ms/sweep", flush=True)

# correctness: roll-based fixed point equals gather fixed point (top-8 covers all edges here)
if cov > 0.9999:
    a = jax.jit(lambda d: roll_sweeps(d))(dist0)
    b = jax.jit(lambda d: gather_sweeps(d))(dist0)
    print("dist match after 100 sweeps:", bool(jnp.allclose(a, b, rtol=1e-5, atol=1e-5)))
