from mesh_navigation_tpu.layers.base import LayerOutput, LayerStack, LAYER_REGISTRY
from mesh_navigation_tpu.layers import local, combination, inflation, obstacle

__all__ = ["LayerOutput", "LayerStack", "LAYER_REGISTRY", "local", "combination", "inflation", "obstacle"]
