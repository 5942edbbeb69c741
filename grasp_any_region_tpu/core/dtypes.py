"""Dtype policy.

TPU-native stance: params and activations in bfloat16 (MXU-native), fp32
accumulation on every matmul (`preferred_element_type`), norms/softmax/rope
computed in fp32, RoIAlign in fp32 (matching the reference's `.float()`
upcast at grasp_any_region.py:336). Unlike the reference's AMP + dynamic loss
scale (configs/gar_1b.py:126-138), TPU bf16 needs no loss scaling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype = jnp.float32


INFERENCE = DTypePolicy()
# fp32 master params for training; forward still casts to bf16.
TRAIN = DTypePolicy(param_dtype=jnp.float32)


def cast_tree(tree, dtype):
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
