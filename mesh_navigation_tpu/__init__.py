"""mesh_navigation_tpu — a TPU-native mesh-navigation engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the MeshNav
stack (naturerobots/mesh_navigation): layered triangle-mesh costmaps, global
geodesic planners (Dijkstra edge-graph and CVP fast-marching wavefronts
producing potential + direction vector fields), and a vector-field-following
local controller — re-architected for accelerators:

- the half-edge object graph becomes a static CSR array bundle (`MeshArrays`),
- cost layers become pure functions composed over an explicit dependency DAG,
- priority-queue wavefronts become label-correcting parallel sweeps
  (fast-iterative-method style) that converge to the same fixed point,
- the one-goal-at-a-time action loop becomes `vmap` over thousands of
  start/goal scenarios,
- large meshes shard across a TPU device mesh via `shard_map` with per-sweep
  halo exchange of frontier distances.

Reference parity targets are cited per-function as /root/reference file:line.
"""

from mesh_navigation_tpu.mesh.arrays import MeshArrays, build_mesh
from mesh_navigation_tpu.api.outcomes import Outcome

__version__ = "0.1.0"

__all__ = ["MeshArrays", "build_mesh", "Outcome", "__version__"]
