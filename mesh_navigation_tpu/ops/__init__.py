from mesh_navigation_tpu.ops import sweeps, eikonal

__all__ = ["sweeps", "eikonal"]
