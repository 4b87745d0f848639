from mesh_navigation_tpu.planners.dijkstra import DijkstraPlanner
from mesh_navigation_tpu.planners.cvp import CVPPlanner

__all__ = ["DijkstraPlanner", "CVPPlanner"]
