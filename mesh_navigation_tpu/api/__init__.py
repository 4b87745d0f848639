from mesh_navigation_tpu.api.outcomes import Outcome

__all__ = ["Outcome"]
