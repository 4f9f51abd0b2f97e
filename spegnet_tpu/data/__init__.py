"""Input pipeline: dataset discovery, host preprocessing, canvas batching,
async device prefetch."""

from spegnet_tpu.data.dataset import CODDataset, discover_samples, train_val_split
from spegnet_tpu.data.pipeline import (
    EvalBatch,
    TrainBatch,
    eval_loader,
    train_loader,
)
