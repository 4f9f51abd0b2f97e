"""Configuration management: YAML schema-compatible with the reference.

The YAML layout is identical to the reference configs/default.yaml
(model/training/evaluation/prediction sections) so existing configs work
unchanged; TPU-specific knobs live under optional keys with defaults:

  model.compute_dtype      ("bfloat16" on TPU; use_amp=true maps to bf16)
  training.canvas_buckets  (static canvas sizes for ragged GT supervision)
  parallel.mesh            ({"data": -1} by default: all chips data-parallel)

Precedence mirrors the reference CLI (reference: main.py:457-462): user YAML
first, and for evaluate/predict the model section embedded in the checkpoint
overlays config['model'].
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict, Optional

import yaml

DEFAULT_CONFIG_PATH = Path("./configs/default.yaml")
DEFAULT_MODEL_PATH = Path("./checkpoints/model_best.ckpt")

DEFAULT_CANVAS_BUCKETS = (512, 640, 768, 896, 1024, 1280, 1536, 2048)


def load_config(config_path: Optional[Path] = None) -> Dict[str, Any]:
    """Load a YAML config, falling back to configs/default.yaml."""
    for candidate in (config_path, DEFAULT_CONFIG_PATH):
        if candidate and Path(candidate).exists():
            with open(candidate) as f:
                cfg = yaml.safe_load(f)
            return _apply_defaults(cfg)
    raise RuntimeError(
        "No valid configuration found. Provide --config or create "
        f"{DEFAULT_CONFIG_PATH}"
    )


def _apply_defaults(cfg: Dict[str, Any]) -> Dict[str, Any]:
    cfg = copy.deepcopy(cfg)
    model = cfg.setdefault("model", {})
    training = cfg.setdefault("training", {})
    # use_amp in the reference enables fp16 autocast + GradScaler; the TPU
    # equivalent is bf16 compute (no loss scaling needed).
    if "compute_dtype" not in model:
        model["compute_dtype"] = (
            "bfloat16" if training.get("use_amp", True) else "float32"
        )
    training.setdefault("canvas_buckets", list(DEFAULT_CANVAS_BUCKETS))
    cfg.setdefault("parallel", {"mesh": {"data": -1}})
    return cfg


def overlay_checkpoint_config(
    cfg: Dict[str, Any], ckpt_config: Optional[Dict[str, Any]]
) -> Dict[str, Any]:
    """Apply the checkpoint-embedded model config on top of the user config
    (reference: main.py:459-462)."""
    if ckpt_config and "model" in ckpt_config:
        cfg = copy.deepcopy(cfg)
        cfg["model"].update(ckpt_config["model"])
    return cfg
