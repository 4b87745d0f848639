from mesh_navigation_tpu.mesh.arrays import MeshArrays, build_mesh
from mesh_navigation_tpu.mesh import geometry, reorder, synthetic

__all__ = ["MeshArrays", "build_mesh", "geometry", "reorder", "synthetic"]
