"""SPEGNet-TPU command-line entry point.

CLI-compatible with the reference (reference: main.py:133-174):

    python main.py train    [--config configs/default.yaml]
    python main.py evaluate [--model checkpoints/model_best.ckpt] [--config ...]
    python main.py predict  --input path/to/image_or_dir [--model ...]

Config precedence follows the reference: user YAML; for evaluate/predict the
model section embedded in the checkpoint overlays config['model']
(reference: main.py:457-462).  Checkpoints may be native orbax directories or
reference PyTorch .pth files (imported on the fly).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
from pathlib import Path
from typing import Dict

import yaml

# Persistent XLA compile cache: Hiera-L at 512^2 takes ~45 s to compile; the
# cache makes every later invocation start hot.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

from spegnet_tpu.config import (
    DEFAULT_MODEL_PATH,
    load_config,
    overlay_checkpoint_config,
)
from spegnet_tpu.utils.run_manager import DirectoryManager, setup_logging


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="SPEGNet-TPU: TPU-native camouflaged object detection"
    )
    parser.add_argument("mode", choices=["train", "evaluate", "predict"],
                        help="Operation mode")
    parser.add_argument("--config", type=Path,
                        help="Path to config file (default: configs/default.yaml)")
    parser.add_argument("--model", type=Path,
                        help=f"Path to model checkpoint (default: {DEFAULT_MODEL_PATH})")
    parser.add_argument("--input", type=Path,
                        help="Input image or directory for prediction")
    args = parser.parse_args()
    if args.mode == "predict" and not args.input:
        parser.error("predict mode requires --input argument")
    return args


def train(config: Dict, dir_manager: DirectoryManager) -> None:
    from spegnet_tpu.engine.trainer import Trainer

    logging.info("Initializing training...")
    dataset_paths = config["training"]["datasets"]
    if not dataset_paths:
        raise ValueError("No dataset paths provided in config")
    logging.info(f"Training on datasets: {dataset_paths}")
    trainer = Trainer(config=config, dir_manager=dir_manager)
    resume_path = config["training"].get("resume_from")
    if resume_path:
        trainer.load_checkpoint(resume_path, resume=True)
    trainer.train(dataset_paths)


def evaluate(config: Dict, model_path: Path, dir_manager: DirectoryManager) -> None:
    from spegnet_tpu.data.dataset import get_test_datasets
    from spegnet_tpu.engine.evaluator import Evaluator

    logging.info("Starting evaluation...")
    dataset_paths = config["evaluation"]["datasets"]
    datasets = get_test_datasets(dataset_paths)
    from spegnet_tpu.parallel.mesh import mesh_from_config

    evaluator = Evaluator(
        model_path=str(model_path),
        dir_manager=dir_manager,
        model_config=config["model"],
        batch_size=config["evaluation"]["batch_size"],
        save_visualizations=config["evaluation"].get("save_visualizations", True),
        canvas_buckets=config["training"].get("canvas_buckets",
                                              (512, 1024, 1536, 2048)),
        mesh=mesh_from_config(config.get("parallel")),
    )
    all_metrics = {}
    for name, dataset in datasets.items():
        logging.info(f"\nEvaluating on {name}:")
        metrics = evaluator.evaluate(dataset, name)
        all_metrics[name] = metrics
        logging.info(f"Structure measure (S_a): {metrics['s_alpha']:.4f}")
        logging.info(f"Weighted F-measure (F_b^w): {metrics['weighted_f']:.4f}")
        logging.info(f"Mean Absolute Error (M): {metrics['mae']:.4f}")
        logging.info(f"Enhanced-alignment (E_phi): {metrics['e_phi']:.4f}")
        logging.info(f"Mean F-measure (F_b^m): {metrics['mean_f']:.4f}")
    metrics_path = dir_manager.run_dirs.root / "metrics_summary.json"
    with open(metrics_path, "w") as f:
        json.dump(all_metrics, f, indent=4)
    logging.info(f"Metrics saved to {metrics_path}")


def predict(config: Dict, model_path: Path, input_path: Path,
            dir_manager: DirectoryManager) -> None:
    from spegnet_tpu.engine.predictor import Predictor

    logging.info("Starting prediction...")
    from spegnet_tpu.parallel.mesh import mesh_from_config

    predictor = Predictor(
        model_path=str(model_path),
        model_config=config["model"],
        dir_manager=dir_manager,
        batch_size=config["prediction"].get("batch_size"),
        mesh=mesh_from_config(config.get("parallel")),
    )
    output_size = config["prediction"].get("output_size")
    if input_path.is_dir():
        results = predictor.predict_directory(str(input_path), output_size)
        logging.info(f"Processed {results['total_predictions']} images")
    else:
        seg, edge, original = predictor.predict_single(str(input_path), output_size)
        predictor.result_manager.save_prediction(input_path.name, seg, edge, original)
        logging.info("Processing complete, results saved")


def print_model_info(config: Dict) -> None:
    try:
        from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
        from spegnet_tpu.utils.model_info import print_model_info as _pmi

        model = SPEGNet(SPEGNetConfig.from_dict(config["model"]))
        _pmi(model, config["model"]["image_processing"]["target_size"])
    except Exception as e:
        logging.warning(f"Could not complete model analysis: {e}")


def main() -> None:
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        args = parse_args()
        dir_manager = DirectoryManager(args.mode)
        setup_logging(dir_manager)
        config = load_config(args.config)

        if args.mode in ("evaluate", "predict"):
            from spegnet_tpu.engine.model_loader import load_checkpoint_config

            model_path = args.model or DEFAULT_MODEL_PATH
            ckpt_config = load_checkpoint_config(str(model_path))
            config = overlay_checkpoint_config(config, ckpt_config)

        logging.info(f"Running in {args.mode} mode")
        logging.info("Configuration:\n" + yaml.dump(config, default_flow_style=False))
        print_model_info(config)

        if args.mode == "train":
            train(config, dir_manager)
        elif args.mode == "evaluate":
            evaluate(config, args.model or DEFAULT_MODEL_PATH, dir_manager)
        else:
            predict(config, args.model or DEFAULT_MODEL_PATH, args.input, dir_manager)
        logging.info("Process completed successfully")
    except Exception as e:
        logging.error(f"Error occurred: {e}", exc_info=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
