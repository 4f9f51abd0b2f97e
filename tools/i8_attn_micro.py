"""W8A8 attention-matmul micro: can int8 beat bf16 on the score/PV dots?

The int8 encoder mode quantizes the block PROJECTIONS (qkv/proj/fc1/fc2 —
K = C = 288..1152, MXU-aligned); its attention matmuls stay bf16.  The
remaining int8-eligible milliseconds (round-4 verdict #4) are these dots:

  scores: q [HP, L] x k [HP, L] -> [L, L]   contraction K = HP = 80
  pv:     v [HP, L] x p [L, L] -> [HP, L]   contraction K = L

The scores contraction K=80 misses the int8 sublane tile (32 rows): int8
MXU tiles are (32, 128), so K=80 pads to 96 — and the quantize/dequantize
VPU work rides on top.  This micro times, at the stage-3 global geometry
(L=1024) and windowed geometry (L=256 chunks), in one process interleaved:

  bf16      plain bf16 dots (production today)
  i8_pad96  int8 dots with K padded 80->96
  i8_L      int8 with the contraction flipped to the L-major form where
            K = L (scores^T = k^T q computed as [L,HP]x[L,... ]) — full
            int8 K tiles, extra transposes

Usage: python tools/i8_attn_micro.py [--batch 16]
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

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chain(fn, x, steps=8, windows=3):
    @jax.jit
    def run(x, n):
        def body(i, xx):
            y = fn(xx)
            s = jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9
            return xx + s.astype(xx.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    float(run(x, 1))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    B = args.batch
    key = jax.random.PRNGKey(0)

    # stage-3 geometry: heads=8, hp=80, windowed L=256 (cw 512) + global 1024
    for name, (bh, hp, l) in {
        "s3w_chunk": (B * 8 * 2, 80, 512),   # [BH, HP, CW] per chunk
        "s3_global": (B * 8, 80, 1024),
    }.items():
        q = jax.random.normal(key, (bh, hp, l), jnp.bfloat16)
        k = jax.random.normal(key, (bh, hp, l), jnp.bfloat16)

        def bf16_dots(qq, k=k):
            s = jnp.einsum("bdq,bdk->bqk", qq, k,
                           preferred_element_type=jnp.float32)
            p = jax.nn.softmax(s * 0.118, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bdk,bqk->bdq", k, p,
                           preferred_element_type=jnp.float32)
            return o.astype(jnp.bfloat16)

        def quant(a, axis):
            m = jnp.max(jnp.abs(a), axis=axis, keepdims=True) + 1e-6
            sc = m / 127.0
            return jnp.clip(jnp.round(a / sc), -127, 127).astype(jnp.int8), sc

        def i8_dots(qq, k=k):
            qi, qs = quant(qq, 1)   # per (b, token-q) over HP
            ki, ks = quant(k, 1)
            qi = jnp.pad(qi, ((0, 0), (0, 16), (0, 0)))
            ki = jnp.pad(ki, ((0, 0), (0, 16), (0, 0)))
            s = jnp.einsum("bdq,bdk->bqk", qi, ki,
                           preferred_element_type=jnp.int32)
            s32 = s.astype(jnp.float32) * qs.transpose(0, 2, 1) * ks
            p = jax.nn.softmax(s32 * 0.118, axis=-1)
            pi, ps = quant(p.astype(jnp.bfloat16), 2)
            vi, vs = quant(k, 2)    # reuse k as v stand-in; per (b, d) over L
            o = jnp.einsum("bdk,bqk->bdq", vi, pi,
                           preferred_element_type=jnp.int32)
            o32 = o.astype(jnp.float32) * vs * ps.transpose(0, 2, 1)
            return o32.astype(jnp.bfloat16)

        t_bf = chain(bf16_dots, q)
        t_i8 = chain(i8_dots, q)
        print(f"{name}: bf16 {t_bf * 1e3:7.3f} ms   i8(pad96) "
              f"{t_i8 * 1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
