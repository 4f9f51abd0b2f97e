"""Offline ground-truth edge-map generation for CAMO-style datasets.

Morphological gradient (dilate - erode with a 3x3 kernel, edge_width
iterations) + MORPH_CLOSE, with contour-continuity validation
(reference: utils/camo_edge_processor.py:109-245).  COD10K ships edge maps;
CAMO's are generated offline by this tool — it runs on the host (cv2), since
it is a one-time dataset-preparation step, not a training-path op.  A
device-side morphological variant lives in spegnet_tpu.ops.morphology for
on-the-fly edge supervision experiments.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional, Tuple, Union

import cv2
import numpy as np

logger = logging.getLogger(__name__)


class CAMOEdgeProcessor:
    def __init__(self, edge_width: int = 1, validation_threshold: float = 0.5):
        self.edge_width = max(1, int(edge_width))
        self.validation_threshold = validation_threshold
        self.kernel = np.ones((3, 3), np.uint8)

    def extract_edges(
        self, mask: np.ndarray, validate: bool = True
    ) -> Tuple[np.ndarray, bool]:
        if mask.dtype != np.uint8:
            mask = (mask > 127).astype(np.uint8) * 255
        dilated = cv2.dilate(mask, self.kernel, iterations=self.edge_width)
        eroded = cv2.erode(mask, self.kernel, iterations=self.edge_width)
        edges = cv2.subtract(dilated, eroded)
        edges = cv2.morphologyEx(edges, cv2.MORPH_CLOSE, self.kernel)

        is_valid = True
        if validate:
            contours, _ = cv2.findContours(
                edges, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
            )
            if contours:
                actual = sum(len(c) for c in contours)
                expected = sum(cv2.arcLength(c, True) for c in contours)
                continuity = actual / (expected + 1e-6)
                is_valid = continuity >= self.validation_threshold
            else:
                is_valid = False
        return edges, is_valid

    def process_dataset(
        self,
        input_path: Union[str, Path],
        output_path: Optional[Union[str, Path]] = None,
        file_pattern: str = "*.png",
    ) -> dict:
        input_path = Path(input_path)
        if not input_path.exists():
            raise FileNotFoundError(f"Input directory not found: {input_path}")
        if output_path:
            output_path = Path(output_path)
            output_path.mkdir(parents=True, exist_ok=True)

        stats = {"total": 0, "processed": 0, "valid": 0, "failed": 0}
        mask_files = sorted(input_path.glob(file_pattern))
        stats["total"] = len(mask_files)
        for mask_file in mask_files:
            try:
                mask = cv2.imread(str(mask_file), cv2.IMREAD_GRAYSCALE)
                if mask is None:
                    raise ValueError(f"Failed to read mask: {mask_file}")
                edges, is_valid = self.extract_edges(mask, validate=True)
                if output_path and is_valid:
                    cv2.imwrite(str(output_path / mask_file.name), edges)
                stats["processed"] += 1
                stats["valid"] += int(is_valid)
            except Exception as e:
                stats["failed"] += 1
                logger.error(f"Error processing {mask_file.name}: {e}")
        logger.info(
            f"Edge generation: {stats['processed']}/{stats['total']} processed, "
            f"{stats['valid']} valid, {stats['failed']} failed"
        )
        return stats
