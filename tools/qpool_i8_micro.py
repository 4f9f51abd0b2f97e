"""On-TPU A/B: bf16 fused transition front (qpool_front) vs the W8A8 one
(qpool_front_i8) at the two int8-eligible Hiera-L transition geometries
(t23: Cin=288 L=256 heads=8 N=4096; t34: Cin=576 L=64 heads=16 N=1024;
batch 16), plus on-chip parity of the int8 kernel vs its XLA quantized
reference.  t12 (Cin=144) is int8-ineligible (Cin % 32 != 0) and not run.

Chained-timing methodology per CLAUDE.md (fori_loop data-dep chains,
min-of-windows, in-process interleaved A/B).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from spegnet_tpu.ops import fused_block_t as fbt
from spegnet_tpu.ops import fused_block_t_i8 as i8


def make_qpool_weights(rng, cin, cout, heads, d, hp):
    wqkv = np.zeros((3, heads, hp, cin), np.float32)
    wqkv[:, :, :d] = rng.standard_normal((3, heads, d, cin)) * 0.05
    bqkv = np.zeros((3, heads, hp), np.float32)
    bqkv[..., :d] = rng.standard_normal((3, heads, d)) * 0.02
    dt = jnp.bfloat16
    return fbt.QPoolWeights(
        ln_scale=jnp.asarray(
            rng.standard_normal((cin, 1)).astype(np.float32) * 0.1 + 1),
        ln_bias=jnp.asarray(
            rng.standard_normal((cin, 1)).astype(np.float32) * 0.02),
        wqkv_t=jnp.asarray(wqkv.reshape(-1, cin)).astype(dt),
        bqkv_t=jnp.asarray(bqkv.reshape(-1, 1)).astype(dt),
        wsc_t=jnp.asarray(
            rng.standard_normal((cout, cin)).astype(np.float32) * 0.05
        ).astype(dt),
        bsc_t=jnp.asarray(
            rng.standard_normal((cout, 1)).astype(np.float32) * 0.02
        ).astype(dt),
    )


def chain_time(fn, x, steps=8, windows=3):
    """fn: x -> (o, sc); chain via a scalar fold back into x."""
    @jax.jit
    def run(x, n):
        def body(i, x):
            o, sc = fn(x)
            s = (jnp.sum(o.astype(jnp.float32))
                 + jnp.sum(sc.astype(jnp.float32))) * 1e-12
            return x + s.astype(x.dtype)
        x = jax.lax.fori_loop(0, n, body, x)
        o, sc = fn(x)
        return jnp.sum(o.astype(jnp.float32)) + jnp.sum(sc.astype(jnp.float32))

    float(run(x, steps))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def run_case(name, rng, cin, cout, heads, l, grid_hw, batch=16):
    d = cout // heads
    hp = fbt.round_hp(d)
    w = make_qpool_weights(rng, cin, cout, heads, d, hp)
    wq = jax.jit(i8.pack_qpool_i8)(w)
    n = grid_hw * grid_hw
    xt = jnp.asarray(
        rng.standard_normal((batch, cin, n)).astype(np.float32) * 0.5
    ).astype(jnp.bfloat16)
    scale = d ** -0.5

    bf = lambda x: fbt.qpool_front(x, w, heads, hp, l, scale, 1e-6)
    qf = lambda x: i8.qpool_front_i8(x, wq, heads, hp, l, scale, 1e-6)

    # parity first (same chip, same process)
    o_q, sc_q = jax.jit(qf)(xt)
    o_r, sc_r = jax.jit(
        lambda x: i8.qpool_i8_reference(x, wq, heads=heads, hp=hp, l=l,
                                        scale=scale, eps=1e-6))(xt)
    perr = max(float(jnp.max(jnp.abs(o_q.astype(jnp.float32)
                                     - o_r.astype(jnp.float32)))),
               float(jnp.max(jnp.abs(sc_q.astype(jnp.float32)
                                     - sc_r.astype(jnp.float32)))))
    # interleaved A/B
    t_bf = chain_time(bf, xt)
    t_i8 = chain_time(qf, xt)
    t_bf2 = chain_time(bf, xt)
    t_i82 = chain_time(qf, xt)
    t_bf, t_i8 = min(t_bf, t_bf2), min(t_i8, t_i82)
    print(f"{name}: bf16 {t_bf * 1e3:.2f} ms  int8 {t_i8 * 1e3:.2f} ms  "
          f"({t_bf / t_i8:.2f}x)  parity maxerr {perr:.2e}", flush=True)
    return t_bf, t_i8


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}", flush=True)
    run_case("t23 (288->576, L=256, N=4096)", rng, 288, 576, 8, 256, 64)
    run_case("t34 (576->1152, L=64, N=1024)", rng, 576, 1152, 16, 64, 32)


if __name__ == "__main__":
    main()
