"""Anatomy of the full train step on the tunneled v5e: where do the
~2 seconds go when the per-stage components only sum to ~0.2 s?

Separates: (a) host->device transfer of the batch through the tunnel,
(b) the jitted step with DEVICE-RESIDENT inputs (donation chain, scalar
loss readback per step), (c) the same with reference (non-kernel) backward
via --backward reference.

Usage: python tools/step_anatomy.py [--batch 8] [--backward kernel|reference]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--backward", type=str, default="kernel")
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()
    B, size = args.batch, 512

    from spegnet_tpu.ops import fused_block_t as fbt

    fbt.BACKWARD = args.backward

    import tempfile

    from spegnet_tpu.data.pipeline import TrainBatch
    from spegnet_tpu.engine.trainer import Trainer
    from spegnet_tpu.utils.run_manager import DirectoryManager

    config = {
        "model": {
            "encoder": {"variant": "large"},
            "image_processing": {"target_size": size},
            "compute_dtype": "bfloat16",
        },
        "training": {
            "num_epochs": 1, "batch_size": B, "num_workers": 0,
            "canvas_buckets": [size],
            "optimizer": {"learning_rate": 1e-4, "weight_decay": 1e-5,
                          "encoder_lr_ratio": 0.05},
            "scheduler": {"factor": 0.7, "patience": 5, "min_lr": 1e-6},
            "loss": {},
        },
    }
    from spegnet_tpu.ops.bitpack import pack_gt

    rng = np.random.default_rng(0)
    masks = np.zeros((B, size, size), np.uint8)
    masks[:, size // 4: -size // 4, size // 4: -size // 4] = 1
    edges = np.zeros_like(masks)
    edges[:, size // 4, size // 4: -size // 4] = 1
    masks, edges = pack_gt(masks), pack_gt(edges)
    images = rng.integers(0, 256, (B, size, size, 3), dtype=np.uint8)
    hw = np.full((B, 2), size, np.int32)
    tb = TrainBatch(images=images, masks=masks, edges=edges,
                    mask_hw=hw, edge_hw=hw)

    # --- (a) pure H2D of the batch, repeated --------------------------------
    nbytes = images.nbytes + masks.nbytes + edges.nbytes + 2 * hw.nbytes
    for trial in range(3):
        t0 = time.time()
        dev = [jnp.asarray(a) for a in (images, masks, edges, hw, hw)]
        jax.block_until_ready(dev)
        # force materialization on device via tiny readback
        float(dev[0][0, 0, 0, 0])
        dt = time.time() - t0
        print(f"h2d batch ({nbytes/1e6:.0f} MB): {dt*1e3:.0f} ms "
              f"({nbytes/dt/1e6:.0f} MB/s)", flush=True)

    with tempfile.TemporaryDirectory() as tmp:
        trainer = Trainer(config, DirectoryManager("train", base_dir=tmp))

        # --- (b) trainer step as bench does (H2D every step) ----------------
        trainer._process_train_batch(tb)
        trainer._process_train_batch(tb)
        t0 = time.time()
        for _ in range(args.steps):
            trainer._process_train_batch(tb)
        per = (time.time() - t0) / args.steps
        print(f"step WITH per-step H2D: {per*1e3:.0f} ms", flush=True)

        # --- (c) device-resident batch, same jitted step --------------------
        sample_w = np.ones((B,), np.float32)
        dev = tuple(jnp.asarray(a) for a in
                    (images, masks, edges, hw, hw, sample_w))
        jax.block_until_ready(dev)
        # warm up this jit signature (device arrays may differ from (b)'s)
        trainer.params, trainer.batch_stats, trainer.opt_state, ld = \
            trainer._train_step(trainer.params, trainer.batch_stats,
                                trainer.opt_state,
                                trainer._scales_array(), *dev)
        float(ld["loss"])
        times = []
        for _ in range(args.steps):
            t0 = time.time()
            trainer.params, trainer.batch_stats, trainer.opt_state, ld = \
                trainer._train_step(trainer.params, trainer.batch_stats,
                                    trainer.opt_state,
                                    trainer._scales_array(), *dev)
            loss = float(ld["loss"])  # forced sync per step
            times.append(time.time() - t0)
        print(f"step DEVICE-RESIDENT:   min {min(times)*1e3:.0f} / "
              f"avg {sum(times)/len(times)*1e3:.0f} ms (loss {loss:.3f}, "
              f"backward={args.backward})", flush=True)


if __name__ == "__main__":
    main()
