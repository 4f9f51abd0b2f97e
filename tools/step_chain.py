"""Device-resident train-step time with AMORTIZED readback.

step_anatomy.py's "device-resident" number reads the loss every step, so it
carries one tunnel RTT (~40-60 ms) per step; bench_train's pipelined number
additionally re-ships the batch every step through the ~30-40 MB/s tunnel
(13.6 MB at batch 16 ~ 400 ms — comparable to the step itself, i.e. the
round-4 train headline was partly a TUNNEL measurement).  This tool measures
the jitted production train step the same way the inference bench measures
the forward: inputs resident, N steps dispatched back-to-back (each consumes
the previous step's params — a hard data dependency), ONE readback at the
end, slope of (3n - n) to cancel constant overheads.

Also prices the forward+loss-only program (trainer's phase probe) the same
way, giving a clean fwd/bwd split.

Usage: python tools/step_chain.py [--batch 16] [--steps 4]
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


def make_trainer(batch: int, size: int = 512):
    import tempfile

    from spegnet_tpu.engine.trainer import Trainer
    from spegnet_tpu.utils.run_manager import DirectoryManager

    config = {
        "model": {
            "encoder": {"variant": "large"},
            "image_processing": {"target_size": size},
            "compute_dtype": "bfloat16",
        },
        "training": {
            "num_epochs": 1, "batch_size": batch, "num_workers": 0,
            "canvas_buckets": [size],
            "optimizer": {"learning_rate": 1e-4, "weight_decay": 1e-5,
                          "encoder_lr_ratio": 0.05},
            "scheduler": {"factor": 0.7, "patience": 5, "min_lr": 1e-6},
            "loss": {},
        },
    }
    tmp = tempfile.mkdtemp()
    return Trainer(config, DirectoryManager("train", base_dir=tmp))


def make_batch(batch: int, size: int = 512):
    from spegnet_tpu.data.pipeline import TrainBatch
    from spegnet_tpu.ops.bitpack import pack_gt

    rng = np.random.default_rng(0)
    masks = np.zeros((batch, size, size), np.uint8)
    masks[:, size // 4: -size // 4, size // 4: -size // 4] = 1
    edges = np.zeros_like(masks)
    edges[:, size // 4, size // 4: -size // 4] = 1
    return TrainBatch(
        images=rng.integers(0, 256, (batch, size, size, 3), dtype=np.uint8),
        masks=pack_gt(masks), edges=pack_gt(edges),
        mask_hw=np.full((batch, 2), size, np.int32),
        edge_hw=np.full((batch, 2), size, np.int32),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()
    B = args.batch

    trainer = make_trainer(B)
    tb = make_batch(B)
    dev = trainer._put_train_batch(tb)

    # compile + settle donation layouts
    for _ in range(2):
        ld = trainer._dispatch_train_step(dev)
    float(ld["loss"])

    def run_n(n):
        t0 = time.time()
        for _ in range(n):
            ld = trainer._dispatch_train_step(dev)
        float(ld["loss"])  # single readback drains the chain
        return time.time() - t0

    def best(n):
        return min(run_n(n) for _ in range(args.windows))

    n = args.steps
    step = (best(3 * n) - best(n)) / (2 * n)
    print(f"STEP_CHAIN {B} {step * 1e3:.1f} ms  ({B / step:.2f} img/s)",
          flush=True)

    # forward+loss only (the phase probe program), same methodology
    with jax.set_mesh(trainer.mesh):
        fargs = (trainer.params, trainer.batch_stats) + tuple(dev)
        float(trainer._fwd_loss_step(*fargs))

        def frun(n):
            t0 = time.time()
            for _ in range(n):
                out = trainer._fwd_loss_step(*fargs)
            float(out)
            return time.time() - t0

        fwd = (min(frun(3 * n) for _ in range(args.windows))
               - min(frun(n) for _ in range(args.windows))) / (2 * n)
    print(f"FWD_LOSS_CHAIN {B} {fwd * 1e3:.1f} ms", flush=True)
    print(f"split: forward+loss {fwd * 1e3:.1f} / bwd+opt "
          f"{(step - fwd) * 1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
