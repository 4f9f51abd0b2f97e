"""Raw in-kernel matmul rate probe at the fused-decoder shapes: per grid
step, R independent [256, 1152] @ [1152, 256] bf16 dots from VMEM with a
trivial epilogue, nothing else.  Establishes the ceiling the decoder
kernel's conv1 loop can reach on the v5e.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def probe(m, k, n, rows, steps, mode, unroll):
    dt = jnp.bfloat16

    def kern(p_ref, w_ref, t_ref, o_ref):
        t1 = t_ref[0:1].astype(jnp.float32)

        def body(r, _):
            y = jnp.dot(p_ref[:], w_ref[:],
                        preferred_element_type=jnp.float32)
            if mode == "relu_store":
                o_ref[0, pl.ds(r, 1)] = jnp.maximum(
                    y + t1, 0.0).astype(dt)[None]
            elif mode == "store":
                o_ref[0, pl.ds(r, 1)] = y.astype(dt)[None]
            else:  # accum-free: write a single row to keep it alive
                o_ref[0, pl.ds(r, 1), 0:1] = y[0:1].astype(dt)[None]
            return 0

        jax.lax.fori_loop(0, rows, body, 0, unroll=rows if unroll else 1)

    p = jnp.ones((m, k), dt)
    w = jnp.ones((k, n), dt)
    t = jnp.zeros((2, n), jnp.float32)
    run = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec((m, k), lambda i: (0, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)),
                  pl.BlockSpec((2, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((1, rows, m, n), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, rows, m, n), dt),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def go(nit):
        def body(i, pp):
            out = run(pp, w, t)
            return pp + (jnp.sum(out[0, 0, 0:1, 0:1].astype(jnp.float32))
                         * 1e-12).astype(pp.dtype)
        return jnp.sum(jax.lax.fori_loop(0, nit, body, p).astype(jnp.float32))

    float(go(2))

    def wall(nit):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(go(nit))
            best = min(best, time.time() - t0)
        return best

    per = (wall(6) - wall(2)) / 4
    fl = 2 * m * k * n * rows * steps
    print(f"m{m} k{k} n{n} rows{rows} steps{steps} {mode} unroll={unroll}: "
          f"{per*1e3:7.2f} ms  {fl/per/1e12:6.1f} TF/s", flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        # rate vs dot size: same total FLOPs, fewer/bigger dots
        probe(256, 1152, 256, 18, 256, "store", False)    # 151 MF dots
        probe(512, 1152, 256, 9, 256, "store", False)     # 302 MF
        probe(1152, 1152, 256, 4, 256, "store", False)    # 679 MF
        probe(2304, 1152, 256, 2, 256, "store", False)    # 1.36 GF
        probe(2048, 768, 128, 2, 256, "store", False)     # conv2-ish 402 MF
        probe(2048, 1024, 256, 2, 256, "store", False)    # conv2 blockdiag 1.07 GF
        probe(256, 1152, 512, 9, 256, "store", False)     # wider N
    else:
        for mode in ("min", "store", "relu_store"):
            for unroll in (True, False):
                probe(256, 1152, 256, 18, 256, mode, unroll)
