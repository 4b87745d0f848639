from mesh_navigation_tpu.control.controller import MeshController, ControllerState
from mesh_navigation_tpu.control import tracking

__all__ = ["MeshController", "ControllerState", "tracking"]
