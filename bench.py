"""Benchmark: SPEGNet (Hiera-Large) 512^2 inference throughput on one chip.

Prints ONE JSON line:
  {"metric": "images_per_sec_per_chip_512", "value": N, "unit": "img/s",
   "vs_baseline": N / 60.6}

Baseline: the reference reports 16.5 ms/image (~60.6 img/s) on an H100
(reference README.md:59); the BASELINE.md north-star is >= 400 img/s/chip on
a v5e.  vs_baseline is the ratio to the H100 number.

Timing methodology: the axon tunnel makes block_until_ready unreliable for
wall-clock, so each measurement dispatches N steps where each step consumes
the previous step's output (data dependency -> no pipelining illusion) and
ends with a single host readback; per-image time = window / (N * batch).
"""

from __future__ import annotations

import json
import sys
import time

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_batch(model, variables, batch: int, size: int = 512, steps: int = 8,
                warmup: int = 2):
    @jax.jit
    def fwd(variables, x):
        out = model.apply(variables, x)
        return out["predictions"][-1]

    @jax.jit
    def chain(variables, x, n):
        # n sequential forwards with a data dependency between steps so the
        # measurement can't overlap them; the perturbation is numerically
        # negligible but defeats CSE.
        def body(i, x):
            y = fwd(variables, x)
            bias = jnp.mean(y.astype(jnp.float32)) * 1e-6
            return x + bias.astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fwd(variables, x).astype(jnp.float32))

    x = jax.random.normal(jax.random.PRNGKey(0), (batch, size, size, 3), jnp.bfloat16)
    float(chain(variables, x, warmup))  # compile + warm
    # Tunnel latency/noise is one-sided: take the best of several windows.
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.time()
        float(chain(variables, x, steps))  # one host readback at the end
        best_dt = min(best_dt, time.time() - t0)
    n_images = (steps + 1) * batch  # fori_loop steps + the final forward
    return n_images / best_dt


def main():
    from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig

    model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16"))
    x0 = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x0)

    best = 0.0
    best_batch = 1
    for batch in (4, 16):
        try:
            ips = bench_batch(model, variables, batch)
        except Exception as e:  # OOM at large batch: stop the sweep
            print(f"batch {batch} failed: {e}", file=sys.stderr)
            break
        print(f"batch {batch}: {ips:.1f} img/s ({1000.0 / ips:.2f} ms/img)",
              file=sys.stderr)
        if ips > best:
            best, best_batch = ips, batch

    result = {
        "metric": "images_per_sec_per_chip_512",
        "value": round(best, 2),
        "unit": "img/s",
        "vs_baseline": round(best / 60.6, 3),
        "best_batch": best_batch,
        "p50_ms_image": round(1000.0 / best, 2) if best else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
