"""Checkpoint loading shared by Evaluator/Predictor.

Supports both native orbax checkpoints (directories produced by the Trainer,
carrying their config in meta.json) and reference PyTorch .pth checkpoints
(via the importer) — so users of the reference stack can evaluate their
existing models directly (reference checkpoint schema:
engine/trainer.py:588-606).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax

logger = logging.getLogger(__name__)


def load_model_variables(path: str) -> Tuple[Dict[str, Any], Optional[Dict[str, Any]]]:
    """Returns ``({'params':..., 'batch_stats':...}, embedded_config_or_None)``."""
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Model checkpoint not found: {path}")
    if p.is_dir():
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(p.absolute())
        variables = {
            "params": state["params"],
            "batch_stats": state.get("batch_stats", {}),
        }
        config = None
        meta_file = p / "meta.json"
        if meta_file.exists():
            with open(meta_file) as f:
                config = json.load(f).get("config")
        logger.info(f"Loaded orbax checkpoint from {path}")
        return variables, config
    # PyTorch .pth interop path.
    from spegnet_tpu.utils.torch_import import import_checkpoint

    variables, config = import_checkpoint(str(p))
    variables = jax.tree_util.tree_map(jax.numpy.asarray, variables)
    logger.info(f"Imported PyTorch checkpoint from {path}")
    return variables, config


def load_checkpoint_config(path: str) -> Dict[str, Any]:
    """Just the embedded config (reference: main.py:100-132).

    For orbax checkpoints this reads meta.json only — no tensor restore.
    """
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Model checkpoint not found: {path}")
    if p.is_dir():
        meta_file = p / "meta.json"
        if not meta_file.exists():
            raise ValueError(f"Checkpoint does not contain configuration: {path}")
        with open(meta_file) as f:
            return json.load(f).get("config")
    _, config = load_model_variables(path)
    if config is None:
        raise ValueError(f"Checkpoint does not contain configuration: {path}")
    return config
