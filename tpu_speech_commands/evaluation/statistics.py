"""Model statistics: params + FLOPs (reference: tools/evaluation/model_statistics.py).

The reference uses the TF1 profiler (`model_statistics.py:53-72`); here the
numbers come from XLA's own cost analysis of the compiled forward —
exact for the program that actually runs on the TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models import init_model, input_shape


def clever_format(value: float, fmt: str = "%.3f") -> str:
    """Human units (model_statistics.py:26-50 equivalent)."""
    for unit, scale in (("T", 1e12), ("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if value >= scale:
            return (fmt % (value / scale)) + unit
    return (fmt % value) + "B"


def count_params(variables) -> int:
    return sum(
        int(np.prod(np.asarray(leaf).shape))
        for leaf in jax.tree_util.tree_leaves(variables["params"])
    )


def model_flops(model, variables, model_type: str, batch_size: int = 1) -> float:
    """FLOPs of the compiled inference forward at the given batch size."""

    def forward(v, x):
        return model.apply(v, x, train=False)

    x = jnp.zeros((batch_size,) + input_shape(model_type), jnp.float32)
    compiled = jax.jit(forward).lower(variables, x).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):  # one entry per device program
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0)) if analysis else 0.0


def get_model_statistics(model_type: str, num_classes: int, batch_size: int = 1):
    """Returns dict with params/flops (+ human-formatted strings)."""
    model, variables = init_model(
        model_type, num_classes, jax.random.PRNGKey(0), batch_size=batch_size
    )
    n_params = count_params(variables)
    flops = model_flops(model, variables, model_type, batch_size)
    return {
        "model_type": model_type,
        "num_classes": num_classes,
        "batch_size": batch_size,
        "params": n_params,
        "flops": flops,
        "params_str": clever_format(n_params),
        "flops_str": clever_format(flops),
    }
