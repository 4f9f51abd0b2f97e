"""A/B the real stage-transition segments: current window-major boundary
composition vs the proposed unified Morton (Z-order) layout.

Each arm times the SAME anchored composition "last stage-i T-block ->
transition front (qpool kernel) -> proj+MLP tail -> first stage-(i+1)
T-block", differing only in the layout work between the kernels:

  cur : from_t(ws_i) -> to_t_micro(ws_tr) -> qpool -> token-major tail
        (2 transposes + from_t) -> to_t(ws_{i+1})
  zord: qpool directly on the block output -> tail in [B, C, N]

Under Morton ordering both T-block and qpool kernels are bit-compatible
with their current window-major forms (windows = l consecutive lanes, 2x2
pool groups = aligned 4-lane runs), so the arms are numerically equivalent
up to an overall token permutation -- checked here by permuting back.

A fixed random re-expansion matmul closes each chain back to the input
shape; it is identical in both arms and cancels in the difference.

Usage: python tools/morton_seg.py [--batch 16] [--steps 6] [--parts t12,..]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from spegnet_tpu.ops import fused_block_t as fbt


def chain_time(fn, x, steps: int = 6, windows: int = 3) -> float:
    @jax.jit
    def run(x, n):
        def body(i, x):
            y = fn(x)
            return y + (i % 2).astype(y.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(x.astype(jnp.float32))

    float(run(x, steps))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def t_weights(key, c, heads, hp, dt):
    """Random TBlockWeights for a same-dim T block."""
    ks = jax.random.split(key, 8)
    f = heads * hp
    mk = lambda k, sh, s=0.05: (jax.random.normal(k, sh) * s).astype(dt)
    return fbt.TBlockWeights(
        ln1_scale=jnp.ones((c, 1), jnp.float32),
        ln1_bias=jnp.zeros((c, 1), jnp.float32),
        wqkv_t=mk(ks[0], (3 * f, c)), bqkv_t=mk(ks[1], (3 * f, 1)),
        wproj_t=mk(ks[2], (c, f)), bproj_t=mk(ks[3], (c, 1)),
        ln2_scale=jnp.ones((c, 1), jnp.float32),
        ln2_bias=jnp.zeros((c, 1), jnp.float32),
        wfc1_t=mk(ks[4], (4 * c, c)), bfc1_t=mk(ks[5], (4 * c, 1)),
        wfc2_t=mk(ks[6], (c, 4 * c)), bfc2_t=mk(ks[7], (c, 1)),
    )


def q_weights(key, cin, cout, heads, hp, dt):
    ks = jax.random.split(key, 4)
    f = heads * hp
    mk = lambda k, sh, s=0.05: (jax.random.normal(k, sh) * s).astype(dt)
    return fbt.QPoolWeights(
        ln_scale=jnp.ones((cin, 1), jnp.float32),
        ln_bias=jnp.zeros((cin, 1), jnp.float32),
        wqkv_t=mk(ks[0], (3 * f, cin)), bqkv_t=mk(ks[1], (3 * f, 1)),
        wsc_t=mk(ks[2], (cout, cin)), bsc_t=mk(ks[3], (cout, 1)),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--parts", type=str, default="")
    args = ap.parse_args()
    B, dt = args.batch, jnp.bfloat16
    key = jax.random.PRNGKey(1)
    want = set(args.parts.split(",")) if args.parts else None

    # (name, H_in grid, Cin, Cout, ws of stage-i run, ws of transition,
    #  ws of stage-i+1 run, heads_in, heads_out)
    cases = [
        ("t12", 128, 144, 288, 8, 4, 4, 2, 4),
        ("t23", 64, 288, 576, 4, 16, 16, 4, 8),
        ("t34", 32, 576, 1152, 16, 8, 8, 8, 16),
    ]

    for nm, h, cin, cout, ws_i, ws_tr, ws_n, heads_i, heads_o in cases:
        if want and nm not in want:
            continue
        n = h * h
        hp_i = fbt.round_hp(cin // heads_i)
        hp_tr = fbt.round_hp(cout // heads_o)
        l_i = ws_i * ws_i
        l_tr = ws_tr * ws_tr
        l_n = ws_n * ws_n

        wt_i = t_weights(jax.random.fold_in(key, 1), cin, heads_i, hp_i, dt)
        wq = q_weights(jax.random.fold_in(key, 2), cin, cout, heads_o,
                       hp_tr, dt)
        # next-stage T block runs at pooled res with Cout, heads_o (stage
        # i+1 geometry); supported() may reject (e.g. s4 heads 16): then the
        # segment ends at the tail and the arms still compare fairly.
        next_ok = fbt.supported(cout, heads_o, l_n, n // 4, dt, batch=B)
        wt_n = t_weights(jax.random.fold_in(key, 3), cout, heads_o,
                         fbt.round_hp(cout // heads_o), dt) if next_ok \
            else None

        kp = (jax.random.normal(jax.random.fold_in(key, 4),
                                (heads_o * hp_tr, cout)) * 0.05).astype(dt)
        k1 = (jax.random.normal(jax.random.fold_in(key, 5),
                                (cout, 4 * cout)) * 0.05).astype(dt)
        k2 = (jax.random.normal(jax.random.fold_in(key, 6),
                                (4 * cout, cout)) * 0.05).astype(dt)
        ln_s = jnp.ones((cout,), jnp.float32)
        ln_b = jnp.zeros((cout,), jnp.float32)
        # fixed re-expansion back to the input shape (identical both arms)
        rexp = (jax.random.normal(jax.random.fold_in(key, 7),
                                  (cout, 4 * cin)) * 0.05).astype(dt)

        scale_i = (cin // heads_i) ** -0.5
        scale_tr = (cout // heads_o) ** -0.5

        def mlp_t(y):
            y32 = y.astype(jnp.float32)
            mu = y32.mean(1, keepdims=True)
            yv = y32 - mu
            z = (yv * jax.lax.rsqrt((yv * yv).mean(1, keepdims=True) + 1e-6)
                 * ln_s[:, None] + ln_b[:, None]).astype(y.dtype)
            z = jnp.einsum("cf,bcn->bfn", k1, z,
                           preferred_element_type=jnp.float32).astype(y.dtype)
            z = jax.nn.gelu(z, approximate=True)
            z = jnp.einsum("fc,bfn->bcn", k2, z,
                           preferred_element_type=jnp.float32).astype(y.dtype)
            return y + z

        def mlp_nhwc(x2):
            y = x2.astype(jnp.float32)
            mu = y.mean(-1, keepdims=True)
            yv = y - mu
            z = (yv * jax.lax.rsqrt((yv * yv).mean(-1, keepdims=True) + 1e-6)
                 * ln_s + ln_b).astype(x2.dtype)
            z = jnp.einsum("bhwc,cf->bhwf", z, k1,
                           preferred_element_type=jnp.float32).astype(z.dtype)
            z = jax.nn.gelu(z, approximate=True)
            z = jnp.einsum("bhwf,fc->bhwc", z, k2,
                           preferred_element_type=jnp.float32).astype(z.dtype)
            return x2 + z

        def close(out_t, h=h, cin=cin):
            # [B, Cout, N/4] -> [B, Cin, N] via fixed matmul + 4x lane tile
            y = jnp.einsum("cf,bcn->bfn", rexp, out_t,
                           preferred_element_type=jnp.float32).astype(dt)
            y = y.reshape(B, 4, cin, n // 4).transpose(0, 2, 3, 1)
            return y.reshape(B, cin, n)

        def seg_cur(xt):
            x1 = fbt.fused_block_t(xt, wt_i, heads_i, hp_i, l_i, scale_i,
                                   1e-6, True)
            x_n = fbt.from_t(x1, ws_i, (h, h))
            xm = fbt.to_t_micro(x_n, ws_tr)
            o_p, sc_p = fbt.qpool_front(xm, wq, heads_o, hp_tr, l_tr,
                                        scale_tr, 1e-6)
            o_n = o_p.transpose(0, 2, 1)
            out1 = sc_p.transpose(0, 2, 1) + (
                jnp.einsum("bnf,fc->bnc", o_n, kp,
                           preferred_element_type=jnp.float32).astype(dt))
            x2 = fbt.from_t(out1.transpose(0, 2, 1), ws_tr // 2,
                            (h // 2, h // 2))
            x2 = mlp_nhwc(x2)
            xt2 = fbt.to_t(x2, ws_n)
            if wt_n is not None:
                xt2 = fbt.fused_block_t(xt2, wt_n, heads_o,
                                        fbt.round_hp(cout // heads_o), l_n,
                                        scale_tr, 1e-6, True)
            return close(xt2)

        def seg_z(xt):
            x1 = fbt.fused_block_t(xt, wt_i, heads_i, hp_i, l_i, scale_i,
                                   1e-6, True)
            o_p, sc_p = fbt.qpool_front(x1, wq, heads_o, hp_tr, l_tr,
                                        scale_tr, 1e-6)
            out1 = sc_p + jnp.einsum(
                "fc,bfn->bcn", kp, o_p,
                preferred_element_type=jnp.float32).astype(dt)
            out1 = mlp_t(out1)
            if wt_n is not None:
                out1 = fbt.fused_block_t(out1, wt_n, heads_o,
                                         fbt.round_hp(cout // heads_o), l_n,
                                         scale_tr, 1e-6, True)
            return close(out1)

        xt = (jax.random.normal(jax.random.fold_in(key, 8),
                                (B, cin, n)) * 0.1).astype(dt)
        cur = chain_time(seg_cur, xt, args.steps) * 1e3
        zod = chain_time(seg_z, xt, args.steps) * 1e3
        print(f"{nm}: current {cur:7.3f} ms   morton {zod:7.3f} ms   "
              f"save {cur - zod:6.3f} ms  (next_blk={'y' if wt_n is not None else 'n'})",
              flush=True)

    # entry/exit permutation deltas, anchored by a real T-block kernel on
    # the [B, C, N] side (NHWC -> layout -> block -> inverse -> NHWC):
    # the kernel pins the layout; the arms differ only in the permutation.
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from layout_micro import to_z, from_z
    for nm, h, c, ws, heads in (("entry128", 128, 144, 8, 2),
                                ("out64", 64, 288, 4, 4),
                                ("out32", 32, 576, 16, 8),
                                ("out16", 16, 1152, 8, 8)):
        if want and nm not in want:
            continue
        hp = fbt.round_hp(c // heads)
        l = ws * ws
        if not fbt.supported(c, heads, l, h * h, dt, batch=B):
            print(f"{nm}: T-kernel unsupported at this geometry, skipped",
                  flush=True)
            continue
        wts = t_weights(jax.random.fold_in(key, 9), c, heads, hp, dt)
        sc = (c // heads) ** -0.5
        x = (jax.random.normal(key, (B, h, h, c)) * 0.1).astype(dt)
        t_rt = chain_time(
            lambda x, ws=ws, h=h: fbt.from_t(fbt.fused_block_t(
                fbt.to_t(x, ws), wts, heads, hp, l, sc, 1e-6, True),
                ws, (h, h)), x, args.steps)
        z_rt = chain_time(
            lambda x, h=h: from_z(fbt.fused_block_t(
                to_z(x), wts, heads, hp, l, sc, 1e-6, True), (h, h)),
            x, args.steps)
        print(f"{nm}: to_t+blk+from_t {t_rt*1e3:7.3f} ms   "
              f"to_z+blk+from_z {z_rt*1e3:7.3f} ms   "
              f"delta {(z_rt-t_rt)*1e3:+7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
