"""Sharding rules: batch over 'data', large encoder matmuls over 'model'.

With pjit/GSPMD we write the *global* program; these NamedShardings are the
only parallelism annotations needed — XLA inserts the all-reduces (gradient
psum over 'data', activation collectives for the tensor-parallel matmuls)
and lays them out over ICI.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading axis over 'data', rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """device_put every array leaf with its leading axis over 'data'."""

    def put(x):
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return jax.tree_util.tree_map(put, batch)


# --------------------------------------------------------------------------
# Tensor-parallel parameter partitioning (optional 'model' axis).
# --------------------------------------------------------------------------

def _param_spec(path, leaf) -> P:
    """Megatron-style sharding of the encoder's large matmuls:

    * mlp_fc1 kernel [C, 4C]      -> shard hidden dim (columns)
    * mlp_fc2 kernel [4C, C]      -> shard hidden dim (rows)
    * attn qkv kernel [C, 3C]     -> shard heads (columns)
    * attn proj kernel [C, C]     -> shard rows (pairs with qkv columns)

    Everything else (convs, norms, heads — tiny next to the encoder) is
    replicated.  Biases of column-sharded layers shard along 'model' too.
    """
    keys = [getattr(k, "key", str(k)) for k in path]
    if "encoder" in keys and len(keys) >= 2:
        name = keys[-2]
        leafname = keys[-1]
        if name in ("mlp_fc1", "qkv"):
            if leafname == "kernel":
                return P(None, "model")
            if leafname == "bias":
                return P("model")
        if name == "mlp_fc2" and leafname == "kernel":
            return P("model", None)
        if name == "proj" and leafname == "kernel" and "attn" in keys:
            return P("model", None)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """A pytree of NamedShardings for the params (TP over 'model' if the mesh
    has that axis and it is > 1; fully replicated otherwise)."""
    use_tp = "model" in mesh.axis_names and mesh.shape["model"] > 1

    def one(path, leaf):
        spec = _param_spec(path, leaf) if use_tp else P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)
