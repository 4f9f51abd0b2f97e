"""On-TPU A/B: gen-1 bf16 fused block vs the W8A8 gen-1 kernel at the
Hiera-L stage-4 geometry (C=1152, 16 heads, ws=8, 16x16 tokens, batch 16:
64 windows of 64 tokens).  Plus on-chip parity of the int8 kernel vs its
XLA quantized reference.

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

from spegnet_tpu.ops import fused_block as fb
from spegnet_tpu.ops import fused_block_i8 as i8


def make_weights(rng, c, heads, d, hidden, hp=128):
    wqkv = np.zeros((c, 3, heads, hp), np.float32)
    wqkv[..., :d] = rng.standard_normal((c, 3, heads, d)) * 0.05
    bqkv = np.zeros((3, heads, hp), np.float32)
    bqkv[..., :d] = rng.standard_normal((3, heads, d)) * 0.02
    wproj = np.zeros((heads, hp, c), np.float32)
    wproj[:, :d] = rng.standard_normal((heads, d, c)) * 0.05
    dt = jnp.bfloat16
    r = lambda *s, sc=0.05: jnp.asarray(
        rng.standard_normal(s).astype(np.float32) * sc)
    return fb.BlockWeights(
        ln1_scale=r(1, c, sc=0.1) + 1.0, ln1_bias=r(1, c, sc=0.02),
        wqkv=jnp.asarray(wqkv.reshape(c, -1)).astype(dt),
        bqkv=jnp.asarray(bqkv.reshape(1, -1)).astype(dt),
        wproj=jnp.asarray(wproj.reshape(-1, c)).astype(dt),
        bproj=r(1, c, sc=0.02).astype(dt),
        ln2_scale=r(1, c, sc=0.1) + 1.0, ln2_bias=r(1, c, sc=0.02),
        wfc1=r(c, hidden).astype(dt), bfc1=r(1, hidden, sc=0.02).astype(dt),
        wfc2=r(hidden, c).astype(dt), bfc2=r(1, c, sc=0.02).astype(dt),
    )


def chain_time(fn, x, steps=8, windows=3):
    @jax.jit
    def run(x, n):
        def body(i, x):
            y = fn(x)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + s.astype(x.dtype)
        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x).astype(jnp.float32))

    float(run(x, steps))
    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(x, n))
            best = min(best, time.time() - t0)
        return best
    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    rng = np.random.default_rng(0)
    c, heads, d, hp = 1152, 16, 72, 128
    l, n = 64, 64          # ws=8 windows; batch 16 x 4 windows/img
    hidden = 4 * c
    w = make_weights(rng, c, heads, d, hidden)
    wq = jax.jit(i8.pack_i8)(w)
    x = jnp.asarray(rng.standard_normal((n, l, c)).astype(np.float32) * 0.5
                    ).astype(jnp.bfloat16)
    args = (heads, hp, d ** -0.5, 1e-6, True)

    # parity: kernel vs XLA quantized reference, on chip
    got = np.asarray(jax.jit(lambda a: i8.fused_block_i8(a, wq, *args))(x),
                     np.float32)
    ref = np.asarray(jax.jit(lambda a: i8.block_i8_reference(
        a, wq, heads=heads, hp=hp, scale=d ** -0.5, eps=1e-6,
        approx_gelu=True))(x), np.float32)
    bf = np.asarray(jax.jit(lambda a: fb.fused_block(a, w, *args))(x),
                    np.float32)
    print(f"i8 kernel vs i8 ref maxerr: {np.abs(got - ref).max():.3e}")
    print(f"i8 vs bf16 rel-mean drift:  "
          f"{(np.abs(got - bf).mean() / (np.abs(bf).mean() + 1e-9)):.3e}")

    t_bf = chain_time(lambda a: fb.fused_block(a, w, *args), x)
    t_i8 = chain_time(lambda a: i8.fused_block_i8(a, wq, *args), x)
    # re-measure interleaved for tunnel comparability
    t_bf2 = chain_time(lambda a: fb.fused_block(a, w, *args), x)
    t_i82 = chain_time(lambda a: i8.fused_block_i8(a, wq, *args), x)
    t_bf, t_i8 = min(t_bf, t_bf2), min(t_i8, t_i82)
    useful = 2 * n * l * (c * 3 * heads * hp + heads * hp * c + 2 * c * hidden)
    print(f"bf16: {t_bf*1e3:7.3f} ms  ({useful/t_bf/1e12:5.1f} TF/s) x4 = "
          f"{4*t_bf*1e3:.2f} ms")
    print(f"int8: {t_i8*1e3:7.3f} ms  ({useful/t_i8/1e12:5.1f} TOP/s) x4 = "
          f"{4*t_i8*1e3:.2f} ms   speedup {t_bf/t_i8:.2f}x")


if __name__ == "__main__":
    main()
