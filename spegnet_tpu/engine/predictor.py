"""Prediction engine: single-image / directory inference with the reference's
output tree (6 PNGs per image: seg+edge x binary/heatmap/overlay) and
prediction_summary.json (reference: engine/predictor.py:56-215).
"""

from __future__ import annotations

import json
import logging
import time
from datetime import datetime
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spegnet_tpu.data.pipeline import ImageProcessor
from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
from spegnet_tpu.ops.resize import resize_bilinear
from spegnet_tpu.engine.model_loader import load_model_variables

logger = logging.getLogger(__name__)


class PredictionResultManager:
    def __init__(self, dir_manager):
        self.run_dirs = dir_manager.run_dirs
        self.viz_root = self.run_dirs.visualizations
        self.seg_dir = self.viz_root / "segmentation"
        self.edge_dir = self.viz_root / "edges"
        for sub in ("binary", "heatmap", "overlay"):
            (self.seg_dir / sub).mkdir(parents=True, exist_ok=True)
            (self.edge_dir / sub).mkdir(parents=True, exist_ok=True)
        self.log_file = self.run_dirs.log_file
        self.timings = {"preprocessing": [], "inference": [], "postprocessing": []}

    def log_message(self, message: str):
        ts = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
        with open(self.log_file, "a") as f:
            f.write(f"[{ts}] {message}\n")

    def save_prediction(self, filename: str, seg_pred: np.ndarray,
                        edge_pred: np.ndarray, original_image: np.ndarray):
        from spegnet_tpu.utils.visualization import (
            save_binary_visualization,
            save_heatmap_visualization,
            save_overlay_visualization,
        )

        base = Path(filename).stem
        for root, pred in ((self.seg_dir, seg_pred), (self.edge_dir, edge_pred)):
            save_binary_visualization(pred, root / "binary" / f"{base}.png")
            save_heatmap_visualization(pred, root / "heatmap" / f"{base}.png", normalize=True)
            save_overlay_visualization(original_image, pred, root / "overlay" / f"{base}.png")

    def update_timing(self, phase: str, dt: float):
        self.timings[phase].append(dt)

    def summarize(self) -> Dict:
        n = len(list((self.seg_dir / "binary").glob("*.png")))
        avg = {p: (float(np.mean(t)) if t else 0.0) for p, t in self.timings.items()}
        total = sum(avg.values())
        summary = {
            "total_predictions": n,
            "average_timings": avg,
            "total_time_per_image": total,
            "total_processing_time": total * n,
        }
        with open(self.run_dirs.root / "prediction_summary.json", "w") as f:
            json.dump(summary, f, indent=4)
        self.log_message(
            f"\nPrediction Summary:\nTotal images processed: {n}\n"
            f"Average timings (s): pre {avg['preprocessing']:.3f} / "
            f"inf {avg['inference']:.3f} / post {avg['postprocessing']:.3f}\n"
            f"Total per image: {total:.3f}s"
        )
        return summary


class Predictor:
    def __init__(self, model_path: str, model_config: Dict, dir_manager,
                 batch_size: int = 1, mesh=None):
        """``mesh``: optional jax Mesh with a 'data' axis — directory-scale
        prediction batches shard over it (round-2 verdict #8; the reference's
        predictor is single-device, engine/predictor.py:56-215, so this is a
        TPU-only extension).  ``batch_size`` is rounded up to a multiple of
        the data axis; tail chunks are already padded to ``batch_size``."""
        self.batch_size = batch_size or 1
        self.mesh = mesh
        if mesh is not None:
            data = int(mesh.shape.get("data", 1))
            if self.batch_size % data:
                self.batch_size = -(-self.batch_size // data) * data
                logger.info(
                    f"Prediction batch size rounded up to {self.batch_size} "
                    f"(multiple of data axis {data})"
                )
        img_cfg = model_config.get("image_processing", {})
        self.target_size = img_cfg.get("target_size", 512)
        self.processor = ImageProcessor(
            self.target_size,
            tuple(img_cfg.get("normalize_mean", (0.485, 0.456, 0.406))),
            tuple(img_cfg.get("normalize_std", (0.229, 0.224, 0.225))),
        )
        self.model = SPEGNet(SPEGNetConfig.from_dict(model_config))
        self.variables, _ = load_model_variables(model_path)
        if mesh is not None:
            from spegnet_tpu.parallel.sharding import replicated

            self.variables = jax.device_put(self.variables, replicated(mesh))
        self.result_manager = PredictionResultManager(dir_manager)
        self.result_manager.log_message(f"Model loaded from: {model_path}")

        model = self.model

        @jax.jit
        def forward(variables, images):
            out = model.apply(variables, images)
            return (
                jax.nn.sigmoid(out["predictions"][-1].astype(jnp.float32))[..., 0],
                jax.nn.sigmoid(out["edge"].astype(jnp.float32))[..., 0],
            )

        self._forward = forward
        # Warm-up (pays compilation, reference: predictor.py:283-289) for both
        # the single-image and batched shapes.  Single-image prediction stays
        # unsharded even under a mesh (batch 1 cannot split over 'data').
        s = self.target_size
        with self._mesh_scope():
            w = self._forward(
                *self._put_batch(np.zeros((self.batch_size, s, s, 3), np.float32)))
        if self.batch_size != 1:
            w = self._forward(self.variables, jnp.zeros((1, s, s, 3), jnp.float32))
        jax.block_until_ready(w)

    def _mesh_scope(self):
        import contextlib

        return jax.set_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()

    def _put_batch(self, images: np.ndarray):
        """(variables, images-on-device) with images sharded over 'data'."""
        if self.mesh is None:
            return self.variables, jnp.asarray(images)
        from spegnet_tpu.parallel.sharding import shard_batch

        return self.variables, shard_batch(np.asarray(images), self.mesh)

    def preprocess_image(self, image_path: str) -> np.ndarray:
        t0 = time.time()
        img = self.processor.process_image(image_path)[None]
        self.result_manager.update_timing("preprocessing", time.time() - t0)
        return img

    def predict_single(
        self, image_path: str, output_size: Optional[Tuple[int, int]] = None
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        image = self.preprocess_image(image_path)
        t0 = time.time()
        seg, edge = self._forward(self.variables, jnp.asarray(image))
        seg, edge = np.asarray(seg[0]), np.asarray(edge[0])
        dt = time.time() - t0
        self.result_manager.update_timing("inference", dt)
        self.result_manager.log_message(f"Inference time for {image_path}: {dt:.3f}s")

        t0 = time.time()
        if output_size:
            seg = np.asarray(resize_bilinear(jnp.asarray(seg), tuple(output_size)))
            edge = np.asarray(resize_bilinear(jnp.asarray(edge), tuple(output_size)))
        self.result_manager.update_timing("postprocessing", time.time() - t0)
        original = self.processor.load_original(image_path)
        return seg, edge, original

    def predict_batch(self, image_paths: List[str],
                      output_size: Optional[Tuple[int, int]] = None,
                      num_workers: int = 4, prefetch: int = 2) -> Dict:
        """True batched inference: one jitted forward per `batch_size` chunk
        (the reference's batch mode still runs images one at a time —
        reference: predictor.py:376-429).

        Host decode runs in a thread pool and the next chunk is prefetched in
        the background while the device computes the current one, so
        directory-prediction wall-clock approaches max(decode, inference)
        instead of their sum — same overlap design as the train/eval pipeline
        (spegnet_tpu/data/pipeline.py).  PNG writes are also offloaded to the
        pool and joined at the end.
        """
        from concurrent.futures import ThreadPoolExecutor

        from spegnet_tpu.data.pipeline import _Prefetcher

        self.result_manager.log_message(
            f"Starting batch prediction of {len(image_paths)} images "
            f"with batch size {self.batch_size}"
        )
        executor = ThreadPoolExecutor(max(num_workers, 1))

        def gen():
            for i in range(0, len(image_paths), self.batch_size):
                chunk = image_paths[i: i + self.batch_size]
                t0 = time.time()
                loaded = list(executor.map(
                    lambda p: (self.processor.process_image(p),
                               self.processor.load_original(p)),
                    chunk,
                ))
                images = np.stack([im for im, _ in loaded]).astype(np.float32)
                if len(chunk) < self.batch_size:  # pad the tail: one shape
                    pad = self.batch_size - len(chunk)
                    images = np.concatenate([images, np.repeat(images[:1], pad, 0)])
                originals = [orig for _, orig in loaded]
                yield chunk, images, originals, time.time() - t0

        save_futures = []
        for chunk, images, originals, dt_pre in _Prefetcher(gen, prefetch):
            self.result_manager.update_timing("preprocessing", dt_pre)
            t0 = time.time()
            with self._mesh_scope():
                seg, edge = self._forward(*self._put_batch(images))
            seg, edge = np.asarray(seg), np.asarray(edge)
            self.result_manager.update_timing("inference", time.time() - t0)
            t0 = time.time()
            for j, path in enumerate(chunk):
                s, e = seg[j], edge[j]
                if output_size:
                    s = np.asarray(resize_bilinear(jnp.asarray(s), tuple(output_size)))
                    e = np.asarray(resize_bilinear(jnp.asarray(e), tuple(output_size)))
                save_futures.append(executor.submit(
                    self.result_manager.save_prediction,
                    Path(path).name, s, e, originals[j],
                ))
            self.result_manager.update_timing("postprocessing", time.time() - t0)
        for f in save_futures:
            f.result()  # surface any save errors (per-image isolation inside)
        executor.shutdown(wait=True)
        return self.result_manager.summarize()

    def predict_directory(self, input_dir: str,
                          output_size: Optional[Tuple[int, int]] = None,
                          extensions: tuple = (".jpg", ".png", ".jpeg")) -> Dict:
        input_dir = Path(input_dir)
        if not input_dir.is_dir():
            raise NotADirectoryError(f"Invalid directory: {input_dir}")
        image_paths = sorted(
            str(p) for p in input_dir.glob("**/*") if p.suffix.lower() in extensions
        )
        if not image_paths:
            raise ValueError(f"No valid images found in {input_dir}")
        self.result_manager.log_message(
            f"Found {len(image_paths)} images in {input_dir}"
        )
        return self.predict_batch(image_paths, output_size)
