"""Round 5: host-side trace of one bad batched-snap lane."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from mesh_navigation_tpu.mesh import query, reorder, synthetic
from mesh_navigation_tpu.mesh.arrays import host_array

mesh_n = 256
vi, fi = synthetic.irregular_terrain_mesh(
    mesh_n, mesh_n, spacing=0.5, jitter=0.45, hills=2.0, roughness=0.01, seed=1
)
mesh = reorder.build_reordered_mesh(vi, fi)
grid = query.build_grid(mesh)
print(f"# dims={np.asarray(grid.dims)} P={grid.max_per_cell} "
      f"dense={grid.cell_pos is not None}", flush=True)

rng = np.random.default_rng(0)
B = 4096
extent = mesh_n * 0.5 - 1.0
p = rng.uniform(1, extent, size=(B, 3)).astype(np.float32)
p[:, 2] = 0.0
pts = jnp.asarray(p)

vs = np.asarray(jax.vmap(lambda q: query.nearest_vertex(mesh, grid, q)[0])(pts))
vb, d2b = query.nearest_vertex_batch(mesh, grid, pts)
vb = np.asarray(vb)
vpos = host_array(mesh, "vertices")
ds = np.linalg.norm(vpos[vs] - p, axis=1)
db = np.linalg.norm(vpos[vb] - p, axis=1)
bad = np.nonzero(db > ds + 1e-4)[0]
print(f"# batch worse on {len(bad)}/{B}; max excess {np.max(db-ds):.3f}", flush=True)
if len(bad):
    i = int(bad[np.argmax((db - ds)[bad])])
    print(f"lane {i}: point {p[i]}, single v={vs[i]} d={ds[i]:.3f}, "
          f"batch v={vb[i]} d={db[i]:.3f} d2b={float(d2b[i]):.3f}", flush=True)
    # recompute the batch probe by hand
    cell = np.clip(
        np.floor((p[i] - np.asarray(grid.origin)) / float(grid.cell_size)),
        0, np.asarray(grid.dims) - 1,
    ).astype(int)
    dims = np.asarray(grid.dims)
    print(f"cell={cell}", flush=True)
    cp_np = np.asarray(grid.cell_pos)
    cv_np = np.asarray(grid.cell_vid)
    best = (np.inf, -1)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                nb = cell + [dx, dy, dz]
                if np.any(nb < 0) or np.any(nb >= dims):
                    continue
                cid = (nb[0] * dims[1] + nb[1]) * dims[2] + nb[2]
                d2 = ((cp_np[cid] - p[i]) ** 2).sum(axis=1)
                j = int(np.argmin(d2))
                if d2[j] < best[0]:
                    best = (float(d2[j]), int(cv_np[cid, j]))
    print(f"hand probe over dense tables: d={np.sqrt(best[0]):.3f} v={best[1]}",
          flush=True)
    # where is the single-path winner in the dense table?
    vwin = vs[i]
    cellw = np.clip(
        np.floor((vpos[vwin] - np.asarray(grid.origin)) / float(grid.cell_size)),
        0, dims - 1,
    ).astype(int)
    cidw = (cellw[0] * dims[1] + cellw[1]) * dims[2] + cellw[2]
    slots = np.nonzero(cv_np[cidw] == vwin)[0]
    posw = cp_np[cidw, slots[0]] if len(slots) else None
    print(f"winner v={vwin} cell={cellw} (offset {cellw - cell}) "
          f"in dense table slots={slots} pos={posw}", flush=True)
