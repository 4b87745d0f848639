"""Max / weighted-average combination layers.

Parity with mesh_layers/src/combination_layer.cpp: MaxCombination takes the
per-vertex max over its input layers (44-85) with the union of lethal sets
(73-79); AvgCombination the weighted sum Σ weight·cost using each input
layer's `combination_weight` (185-247). Neither normalizes (70-71, 234-235).
In the functional DAG "incremental update on change" (87-147) is simply
re-evaluation — XLA fuses the whole combine into the producing pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from mesh_navigation_tpu.config import LayerConfig
from mesh_navigation_tpu.layers.base import LayerOutput, register_layer, zero_vectors
from mesh_navigation_tpu.mesh.arrays import MeshArrays


@register_layer("max_combination")
def make_max_combination(cfg: LayerConfig):
    def fn(mesh: MeshArrays, inputs: dict, state) -> LayerOutput:
        if not inputs:
            z = jnp.zeros(mesh.num_vertices, jnp.float32)
            return LayerOutput(z, jnp.zeros_like(z, bool), zero_vectors(mesh))
        costs = jnp.stack([o.costs for o in inputs.values()]).max(axis=0)
        lethal = jnp.stack([o.lethal for o in inputs.values()]).any(axis=0)
        return LayerOutput(costs=costs, lethal=lethal, vectors=zero_vectors(mesh))

    return fn


@register_layer("avg_combination")
def make_avg_combination(cfg: LayerConfig):
    # per-input combination weights = each input layer's own
    # `combination_weight` (LayerConfig.factor, abstract_layer.h:180-183 /
    # combination_layer.cpp:185-247); a "weight:<input>" param on this layer
    # overrides for ad-hoc mixes.
    def fn(mesh: MeshArrays, inputs: dict, state) -> LayerOutput:
        if not inputs:
            z = jnp.zeros(mesh.num_vertices, jnp.float32)
            return LayerOutput(z, jnp.zeros_like(z, bool), zero_vectors(mesh))
        factors = state.get("__factors__", {})
        total = jnp.zeros(mesh.num_vertices, jnp.float32)
        for name, out in inputs.items():
            w = cfg.param(f"weight:{name}", factors.get(name, 1.0))
            total = total + w * out.costs
        lethal = jnp.stack([o.lethal for o in inputs.values()]).any(axis=0)
        return LayerOutput(costs=total, lethal=lethal, vectors=zero_vectors(mesh))

    return fn
