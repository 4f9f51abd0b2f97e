"""Result visualization writers (host-side, cv2).

Output formats match the reference (reference: utils/visualization.py:92-287):
binary = confidence x 255 grayscale PNG; heatmap = min-max normalized
COLORMAP_JET; overlay = addWeighted(image, 1-alpha, jet, alpha).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional

import cv2
import numpy as np


def save_binary_visualization(prediction: np.ndarray, save_path) -> None:
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    pred = np.squeeze(prediction)
    cv2.imwrite(str(save_path), (pred * 255).astype(np.uint8))


def save_heatmap_visualization(
    prediction: np.ndarray, save_path, normalize: bool = True
) -> None:
    save_path = Path(save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    pred = np.squeeze(prediction)
    if normalize:
        pred = (pred - pred.min()) / (pred.max() - pred.min() + 1e-8)
    heatmap = cv2.applyColorMap((pred * 255).astype(np.uint8), cv2.COLORMAP_JET)
    cv2.imwrite(str(save_path), heatmap)


def save_overlay_visualization(
    image: np.ndarray,
    prediction: np.ndarray,
    save_path,
    alpha: float = 0.5,
    colormap: int = cv2.COLORMAP_JET,
) -> None:
    try:
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        pred = np.squeeze(prediction)
        image_bgr = (
            cv2.cvtColor(image, cv2.COLOR_RGB2BGR)
            if image.ndim == 3 and image.shape[-1] == 3
            else image
        )
        if image_bgr.shape[:2] != pred.shape:
            pred = cv2.resize(pred, (image_bgr.shape[1], image_bgr.shape[0]))
        if pred.max() > 1.0 or pred.min() < 0.0:
            pred = (pred - pred.min()) / (pred.max() - pred.min() + 1e-8)
        heatmap = cv2.applyColorMap((pred * 255).astype(np.uint8), colormap)
        overlay = cv2.addWeighted(image_bgr, 1 - alpha, heatmap, alpha, 0)
        cv2.imwrite(str(save_path), overlay)
    except Exception as e:  # pragma: no cover
        logging.error(f"Failed to create overlay visualization: {e}")
        raise RuntimeError(f"Overlay creation failed: {e}")


class ResultVisualizer:
    """binary/ heatmap/ overlay/ triplets plus per-stage dumps
    (reference: utils/visualization.py:211-287)."""

    def __init__(self, base_dir):
        self.base_dir = Path(base_dir)
        self.binary_dir = self.base_dir / "binary"
        self.heatmap_dir = self.base_dir / "heatmap"
        self.overlay_dir = self.base_dir / "overlay"
        for d in (self.binary_dir, self.heatmap_dir, self.overlay_dir):
            d.mkdir(parents=True, exist_ok=True)

    def save_all_visualizations(
        self,
        filename: str,
        prediction: np.ndarray,
        original_image: Optional[np.ndarray] = None,
        stage_predictions: Optional[List[np.ndarray]] = None,
    ) -> None:
        save_binary_visualization(prediction, self.binary_dir / f"{filename}.png")
        save_heatmap_visualization(prediction, self.heatmap_dir / f"{filename}.png")
        if original_image is not None:
            save_overlay_visualization(
                original_image, prediction, self.overlay_dir / f"{filename}.png",
                alpha=0.7,
            )
        if stage_predictions is not None:
            for i, stage_pred in enumerate(stage_predictions):
                stage_name = f"{filename}_stage{i + 1}"
                save_binary_visualization(
                    stage_pred, self.binary_dir / f"{stage_name}.png"
                )
                save_heatmap_visualization(
                    stage_pred, self.heatmap_dir / f"{stage_name}.png"
                )
