from mesh_navigation_tpu.mesh.arrays import MeshArrays, build_mesh
from mesh_navigation_tpu.mesh import geometry, synthetic

__all__ = ["MeshArrays", "build_mesh", "geometry", "synthetic"]
