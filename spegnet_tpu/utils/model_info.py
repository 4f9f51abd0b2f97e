"""Model architecture / complexity report.

The reference uses ptflops for FLOPs+params (reference: main.py:366-423); the
TPU-native equivalent is XLA's own HLO cost analysis on the jitted forward.
"""

from __future__ import annotations

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def model_complexity(model, input_size: int) -> Dict[str, float]:
    """Parameter count (exact) + forward FLOPs (XLA cost analysis)."""
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    flops = None
    try:
        lowered = jax.jit(lambda v, x: model.apply(v, x)).lower(variables, x)
        analysis = lowered.compile().cost_analysis()
        if analysis:
            flops = float(analysis.get("flops", 0.0))
    except Exception as e:  # pragma: no cover - depends on backend support
        logger.debug(f"cost_analysis unavailable: {e}")
    return {"params": n_params, "flops": flops}


def architecture_lines(model, input_size: int, max_depth: int = 2):
    """Layer-by-layer architecture printout (parity with the reference's
    model-structure dump, reference: main.py:366-423): the module tree with
    per-module parameter counts, collapsed below `max_depth`."""
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x)
    params = variables["params"]

    def count(tree) -> int:
        return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))

    lines = [f"{type(model).__name__}("]

    def walk(tree, depth, prefix):
        indent = "  " * depth
        for name in sorted(tree):
            sub = tree[name]
            if not isinstance(sub, dict):  # leaf array
                lines.append(f"{indent}{name}: {tuple(sub.shape)}")
                continue
            n = count(sub)
            if depth >= max_depth or all(
                not isinstance(v, dict) for v in sub.values()
            ):
                lines.append(f"{indent}{name}: {n / 1e6:.3f} M params")
            else:
                lines.append(f"{indent}{name}:  # {n / 1e6:.3f} M params")
                walk(sub, depth + 1, prefix + name + "/")

    walk(params, 1, "")
    lines.append(")")
    return lines


def print_model_info(model, input_size: int) -> None:
    logger.info("Analyzing model architecture and complexity...")
    logger.info("Model architecture:")
    for line in architecture_lines(model, input_size):
        logger.info(line)
    info = model_complexity(model, input_size)
    logger.info("-" * 30)
    logger.info(f"Number of Parameters: {info['params'] / 1e6:.2f} M")
    if info["flops"]:
        logger.info(f"Computational Cost: {info['flops'] / 1e9:.2f} GFLOPs "
                    f"(XLA HLO cost analysis, batch 1 @ {input_size}^2)")
    logger.info("-" * 30)
