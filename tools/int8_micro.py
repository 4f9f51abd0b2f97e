"""int8 MXU feasibility probe on the v5e.

Measures a Pallas int8 x int8 -> int32 matmul against the same-shape bf16
matmul at the Hiera-L stage-3 block geometry (the shapes the int8 encoder
path would run).  v5e int8 peak is ~2x bf16 (~394 TOPS); if the measured
ratio is well below ~1.5x the int8 encoder path is not worth building.

Chained-timing methodology per CLAUDE.md.
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def _mm_kernel(a_ref, b_ref, o_ref, *, n_iter: int, out_t):
    a = a_ref[...]
    b = b_ref[...]
    acc = jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                              preferred_element_type=out_t)
    # Chain extra dependent matmuls so the measurement is MXU-bound, not
    # HBM-bound (reuse a; rotate acc back into the rhs domain cheaply).
    for _ in range(n_iter - 1):
        b2 = acc[: b.shape[0]].astype(b.dtype)
        acc = jax.lax.dot_general(a, b2, (((1,), (0,)), ((), ())),
                                  preferred_element_type=out_t)
    o_ref[...] = acc


def run_case(name, m, k, n, in_dtype, out_t, n_iter=8, windows=5):
    rng = np.random.default_rng(0)
    if in_dtype == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (m, k), dtype=np.int8))
        b = jnp.asarray(rng.integers(-127, 127, (k, n), dtype=np.int8))
    else:
        a = jnp.asarray(rng.standard_normal((m, k)), dtype=in_dtype)
        b = jnp.asarray(rng.standard_normal((k, n)), dtype=in_dtype)

    f = pl.pallas_call(
        functools.partial(_mm_kernel, n_iter=n_iter, out_t=out_t),
        out_shape=jax.ShapeDtypeStruct((m, n), out_t),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def chain(steps, a, b):
        def body(i, a):
            o = f(a, b)
            s = jnp.sum(o.astype(jnp.float32)) * 0
            return a + s.astype(a.dtype)

        a = jax.lax.fori_loop(0, steps, body, a)
        return jnp.sum(f(a, b).astype(jnp.float32))

    try:
        float(chain(2, a, b))
    except Exception as e:  # noqa: BLE001 - feasibility probe
        print(f"{name}: FAILED to compile/run: {type(e).__name__}: {e}")
        return None

    def wall(s):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(chain(s, a, b))
            best = min(best, time.time() - t0)
        return best

    steps = 24
    dt_s = (wall(3 * steps) - wall(steps)) / (2 * steps)
    flops = 2 * m * k * n * n_iter
    tfs = flops / dt_s / 1e12
    print(f"{name}: {dt_s*1e3:7.3f} ms/call  {tfs:6.1f} T{'OP' if in_dtype == jnp.int8 else 'F'}/s")
    return tfs


if __name__ == "__main__":
    # Stage-3 fc1 geometry: [hidden=2304, C=576] @ [576, T=2048]  (as M,K,N)
    cases = [
        ("bf16 2304x576x2048", 2304, 576, 2048, jnp.bfloat16, jnp.float32),
        ("int8 2304x576x2048", 2304, 576, 2048, jnp.int8, jnp.int32),
        ("bf16 2304x2304x2048", 2304, 2304, 2048, jnp.bfloat16, jnp.float32),
        ("int8 2304x2304x2048", 2304, 2304, 2048, jnp.int8, jnp.int32),
    ]
    res = {}
    for name, m, k, n, dt, ot in cases:
        res[name] = run_case(name, m, k, n, dt, ot)
    for pair in (("bf16 2304x576x2048", "int8 2304x576x2048"),
                 ("bf16 2304x2304x2048", "int8 2304x2304x2048")):
        b_, i_ = res.get(pair[0]), res.get(pair[1])
        if b_ and i_:
            print(f"ratio {pair[1].split()[1]}: int8/bf16 = {i_/b_:.2f}x")
