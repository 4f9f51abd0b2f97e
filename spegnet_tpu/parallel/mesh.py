"""Device mesh construction.

The reference is single-process/single-GPU with no distributed backend at all
(survey §2.4); scaling here is TPU-native: a jax.sharding.Mesh over the
available chips with a ``data`` axis (batch parallelism — gradients reduce
over ICI via the collectives XLA inserts) and an optional ``model`` axis
(tensor-parallel sharding of the large encoder matmuls, useful for the
high-resolution / huge-variant regimes).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def create_mesh(
    axes: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh from an axis spec like {"data": -1} or
    {"data": 4, "model": 2}.  A single -1 axis absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    axes = dict(axes or {"data": -1})
    sizes = list(axes.values())
    n = len(devices)
    if sizes.count(-1) > 1:
        raise ValueError("At most one mesh axis may be -1")
    fixed = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if -1 in sizes:
        if n % fixed:
            raise ValueError(f"{n} devices not divisible by fixed axes {fixed}")
        sizes[sizes.index(-1)] = n // fixed
    total = int(np.prod(sizes))
    if total > n:
        raise ValueError(f"Mesh {dict(zip(axes, sizes))} needs {total} devices, have {n}")
    dev_array = np.asarray(devices[:total]).reshape(sizes)
    return Mesh(dev_array, tuple(axes.keys()))


def mesh_from_config(parallel_cfg: Optional[Dict] = None) -> Mesh:
    spec = (parallel_cfg or {}).get("mesh", {"data": -1})
    return create_mesh(spec)
