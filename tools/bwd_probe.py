"""On-chip sweep of the fused T-block BACKWARD kernel's tuning knobs.

The round-2 verdict's remaining train gap is backward-kernel efficiency
(s1 18 TF/s vs fwd 59; s3g 42 vs 113).  This probe times `_backward`
(ops/fused_block_t.py) directly at each stage geometry across:

  * acw   — attention chunk width inside the cell (the forward's 512-wide
            masked chunks inflate attention flops 8x/32x at L=64/16, and the
            backward runs ~3.5x the forward's attention work);
  * unroll — Python-unrolled static-slice head sweeps vs lax.fori_loop with
            dynamic slices (payload vs scheduling);
  * slots — per-grid-cell weight-grad output slots summed by XLA outside vs
            accumulating `+=` into revisited output blocks.

Usage: python tools/bwd_probe.py [--batch 8] [--geoms s1,s2,s3w,s3g]
       [--variants old,acw,acw+unroll,...]
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

from spegnet_tpu.ops import fused_block_t as fbt

GEOMS = {
    #        c, heads, l,    n_tok
    "s1": (144, 2, 64, 16384),
    "s2": (288, 4, 16, 4096),
    "s3w": (576, 8, 256, 1024),
    "s3g": (576, 8, 1024, 1024),
}


def make_weights(key, c, heads, hp, dt):
    ks = jax.random.split(key, 8)
    f = heads * hp
    hid = 4 * c

    def nrm(k, shape, s=0.02):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dt)

    return fbt.TBlockWeights(
        ln1_scale=jnp.ones((c, 1), jnp.float32),
        ln1_bias=jnp.zeros((c, 1), jnp.float32),
        wqkv_t=nrm(ks[0], (3 * f, c)),
        bqkv_t=jnp.zeros((3 * f, 1), dt),
        wproj_t=nrm(ks[1], (c, f)),
        bproj_t=jnp.zeros((c, 1), dt),
        ln2_scale=jnp.ones((c, 1), jnp.float32),
        ln2_bias=jnp.zeros((c, 1), jnp.float32),
        wfc1_t=nrm(ks[2], (hid, c)),
        bfc1_t=jnp.zeros((hid, 1), dt),
        wfc2_t=nrm(ks[3], (c, hid)),
        bfc2_t=jnp.zeros((c, 1), dt),
    )


def chain_time(fn, x, w, dout, steps=4, windows=3):
    """fn(x, w, dout) -> dx; w/dout ship as jit ARGUMENTS (constants closed
    into the jit make the remote compile helper hang — CLAUDE.md)."""

    @jax.jit
    def run(x, w, dout, n):
        def body(i, x):
            y = fn(x, w, dout)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x, w, dout).astype(jnp.float32))

    print("  compiling...", flush=True)
    float(run(x, w, dout, steps))
    print("  compiled; timing...", flush=True)

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(x, w, dout, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--geoms", type=str, default="s1,s2,s3w,s3g")
    ap.add_argument("--variants", type=str,
                    default="old,acw,unroll,slots,acw+unroll,acw+slots,"
                            "acw+unroll+slots")
    ap.add_argument("--check", action="store_true",
                    help="also jit a single call per variant and compare dx "
                         "against the first variant (doubles compile count)")
    ap.add_argument("--mode", type=str, default="raw",
                    choices=("raw", "vjp", "fwd"),
                    help="raw: the backward pallas_call alone; vjp: full "
                         "fwd+bwd through the custom_vjp on [B,C,N] (no "
                         "layout transforms); fwd: forward kernel alone")
    args = ap.parse_args()
    b = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    for g in args.geoms.split(","):
        c, heads, l, n = GEOMS[g]
        hp = fbt.round_hp(c // heads)
        scale = (c // heads) ** -0.5
        w = make_weights(key, c, heads, hp, dt)
        x = jax.random.normal(key, (b, c, n), dt)
        dout = jax.random.normal(jax.random.PRNGKey(1), (b, c, n), dt)
        cw = fbt._pick_cw(l, n)
        base_dx = None
        print(f"--- {g}: c={c} heads={heads} l={l} n={n} cw={cw}", flush=True)
        for var in args.variants.split(","):
            opts = set(var.split("+"))
            acw = fbt._pick_acw(l, cw) if "acw" in opts else cw
            kw = dict(heads=heads, hp=hp, l=l, scale=scale, eps=1e-6,
                      approx_gelu=True, acw=acw,
                      unroll="unroll" in opts, slots="slots" in opts)

            if args.mode == "vjp":
                if var != args.variants.split(",")[0]:
                    continue  # vjp path has no knobs yet: time once

                def fn(x, w, dout, heads=heads, hp=hp, l=l, scale=scale):
                    y, vjp = jax.vjp(
                        lambda xx, ww: fbt.fused_block_t(
                            xx, ww, heads, hp, l, scale, 1e-6, True), x, w)
                    dx, dw = vjp(dout)
                    tap = sum(jnp.sum(t.astype(jnp.float32)) * 1e-20
                              for t in jax.tree_util.tree_leaves(dw))
                    return dx + tap.astype(dx.dtype)
            elif args.mode == "fwd":
                if var != args.variants.split(",")[0]:
                    continue

                def fn(x, w, dout, heads=heads, hp=hp, l=l, scale=scale):
                    return fbt._forward(x, w, heads=heads, hp=hp, l=l,
                                        scale=scale, eps=1e-6,
                                        approx_gelu=True)
            else:
                def fn(x, w, dout, kw=kw):
                    return fbt._backward(x, w, dout, **kw)[0]

            try:
                err = float("nan")
                if args.check:
                    dx = jax.jit(fn)(x, w, dout)
                    dx.block_until_ready()
                    if base_dx is None:
                        base_dx = dx
                        err = 0.0
                    else:
                        err = float(jnp.max(jnp.abs(
                            dx.astype(jnp.float32)
                            - base_dx.astype(jnp.float32))))
                t = chain_time(fn, x, w, dout)
                print(f"{g:5s} {var:18s} {t*1e3:8.2f} ms  maxdiff={err:.2e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{g:5s} {var:18s} FAILED: {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
