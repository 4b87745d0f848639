"""Ad-hoc: offset-class coverage of an IRREGULAR mesh under band reordering.

Builds a jittered-Delaunay terrain (grid positions + xy jitter, retriangulated
-> degrees 3..9, no exact grid offsets), applies a spatial row-binning order
(row = y-rank bin of fixed width n, column = x-rank within row), and reports
what fraction of directed edges fall at row offset dr in {-1,0,+1} and column
offset |dc| <= L — the coverage a lane-generalized banded kernel would get.
"""
import sys
import time

import numpy as np
from scipy.spatial import Delaunay

mesh_n = int(sys.argv[1]) if len(sys.argv) > 1 else 512

rng = np.random.default_rng(0)
t0 = time.time()
# jittered grid points (jitter up to 0.45 spacing -> thoroughly non-grid)
xs, ys = np.meshgrid(np.arange(mesh_n, dtype=np.float64), np.arange(mesh_n, dtype=np.float64))
pts = np.stack([xs.ravel(), ys.ravel()], axis=1)
pts += rng.uniform(-0.45, 0.45, pts.shape)
tri = Delaunay(pts)
faces = tri.simplices.astype(np.int64)
V = len(pts)
print(f"# V={V} F={len(faces)} delaunay in {time.time()-t0:.1f}s")

# degree histogram
raw = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
raw = np.sort(raw, axis=1)
edges = np.unique(raw, axis=0)
deg = np.bincount(edges.ravel(), minlength=V)
print(f"# degree: min={deg.min()} max={deg.max()} mean={deg.mean():.2f}")

# --- spatial band order: n columns per row ---
n = mesh_n  # fixed row width
order = np.argsort(pts[:, 1], kind="stable")   # by y
rows_of = np.empty(V, np.int64)
rows_of[order] = np.arange(V) // n
# within each row, by x
key = rows_of * 1e9 + np.argsort(np.argsort(pts[:, 0]))  # global x rank as tiebreak
perm = np.lexsort((pts[:, 0], rows_of))        # sort by (row, x)
new_id = np.empty(V, np.int64)
new_id[perm] = np.arange(V)

e2 = new_id[edges]
# directed both ways
src = np.concatenate([e2[:, 0], e2[:, 1]])
dst = np.concatenate([e2[:, 1], e2[:, 0]])
dr = dst // n - src // n
dc = dst % n - src % n
tot = len(src)
print(f"# row offsets: |dr|<=1: {(np.abs(dr)<=1).mean():.4f}  |dr|==2: {(np.abs(dr)==2).mean():.4f}")
for L in (1, 2, 3, 4, 6, 8, 12, 16):
    cov = ((np.abs(dr) <= 1) & (np.abs(dc) <= L)).mean()
    print(f"# lanes L={L:2d}: coverage {cov:.4f}")

# exact-delta top-K coverage for comparison (structured solver)
delta = dst - src
vals, cnts = np.unique(delta, return_counts=True)
top = np.sort(cnts)[::-1]
for K in (8, 12, 24, 48):
    print(f"# top-{K} exact offsets: {top[:K].sum()/tot:.4f}")
