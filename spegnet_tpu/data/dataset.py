"""COD dataset discovery and splitting.

Directory contract (reference: utils/data_loader.py:37-57):
    {root}/train/{Imgs,GT,Edges}   {root}/test/{Imgs,GT}

Samples are the sorted intersection of image/mask(/edge) basenames
(reference: utils/data_loader.py:113-133).  The train/val split replicates
torch.utils.data.random_split with a seed-42 generator exactly (reference:
utils/data_loader.py:280-284) so the two frameworks train on identical splits.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class Sample:
    image_path: str
    mask_path: Optional[str] = None
    edge_path: Optional[str] = None
    name: str = ""


@dataclasses.dataclass
class CODDataset:
    samples: List[Sample]
    name: str = ""

    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> Sample:
        return self.samples[idx]


def discover_samples(root_dir: str, is_train: bool = True) -> CODDataset:
    """Build a dataset from one split directory ({root}/train or {root}/test)."""
    root = Path(root_dir)
    image_dir, mask_dir, edge_dir = root / "Imgs", root / "GT", root / "Edges"
    if not image_dir.exists() or not mask_dir.exists():
        raise FileNotFoundError(f"Required directories not found in {root_dir}")
    if is_train and not edge_dir.exists():
        raise FileNotFoundError(f"Edge directory not found for training in {root_dir}")

    def stems(d: Path, exts: Tuple[str, ...]) -> dict:
        out = {}
        for f in os.listdir(d):
            if f.endswith(exts):
                out[f.split(".")[0]] = f
        return out

    images = stems(image_dir, (".jpg", ".png"))
    masks = stems(mask_dir, (".png",))
    valid = set(images) & set(masks)
    if is_train:
        edges = stems(edge_dir, (".png",))
        valid &= set(edges)
    if not valid:
        raise ValueError(f"No valid samples found in {image_dir}")

    samples = []
    for stem in sorted(valid):
        samples.append(
            Sample(
                image_path=str(image_dir / images[stem]),
                mask_path=str(mask_dir / masks[stem]),
                edge_path=str(edge_dir / edges[stem]) if is_train else None,
                name=stem,
            )
        )
    return CODDataset(samples, name=root.parent.name or root.name)


def concat_train_datasets(dataset_dirs: Sequence[str]) -> CODDataset:
    """ConcatDataset over {dir}/train for every root that has one
    (reference: utils/data_loader.py:254-273)."""
    all_samples: List[Sample] = []
    for d in dataset_dirs:
        train_path = Path(d) / "train"
        if not train_path.exists():
            continue
        all_samples.extend(discover_samples(str(train_path), is_train=True).samples)
    if not all_samples:
        raise ValueError("No valid training datasets found")
    return CODDataset(all_samples, name="train")


def get_test_datasets(dataset_dirs: Sequence[str]) -> dict:
    """One test dataset per root, keyed by the root's basename
    (reference: utils/data_loader.py:352-373)."""
    out = {}
    for d in dataset_dirs:
        test_path = Path(d) / "test"
        if not test_path.exists():
            continue
        ds = discover_samples(str(test_path), is_train=False)
        out[Path(d).name] = ds
    if not out:
        raise ValueError("No valid test datasets found")
    return out


def train_val_split(
    dataset: CODDataset, val_ratio: float, seed: int = 42
) -> Tuple[CODDataset, Optional[CODDataset]]:
    """Replicates torch.utils.data.random_split(generator=manual_seed(42)):
    a seeded randperm, first (1-r)·n indices to train, the rest to val."""
    n = len(dataset)
    if val_ratio <= 0:
        return dataset, None
    train_size = int((1 - val_ratio) * n)
    try:
        import torch

        perm = torch.randperm(n, generator=torch.Generator().manual_seed(seed)).tolist()
    except ImportError:  # pragma: no cover - torch is present in this image
        import numpy as np

        perm = np.random.default_rng(seed).permutation(n).tolist()
    train = CODDataset([dataset.samples[i] for i in perm[:train_size]], "train")
    val = CODDataset([dataset.samples[i] for i in perm[train_size:]], "val")
    return train, val
