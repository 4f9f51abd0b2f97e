"""Quantify VPU costs inside the T-kernel at stage-1 geometry: time the
kernel with (a) full math, (b) GELU replaced by ReLU, (c) softmax replaced
by plain scaling — same shapes/matmuls, only the transcendental work
changes.  Differences isolate where the non-MXU milliseconds go.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from spegnet_tpu.ops import fused_block_t as fbt
from tools.block_t_micro import STAGES, make_weights


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
    stage = sys.argv[1] if len(sys.argv) > 1 else "s1"
    c, heads, hw, ws, _ = STAGES[stage]
    head_dim, b = 72, 16
    hp = fbt.round_hp(head_dim)
    hidden = 4 * c
    l = ws * ws if ws else hw * hw
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    w = make_weights(key, c, heads, head_dim, hp, hidden, dt)
    x = jax.random.normal(key, (b, hw, hw, c), dt)
    xt = fbt.to_t(x, ws)
    kw = dict(heads=heads, hp=hp, l=l, scale=head_dim ** -0.5, eps=1e-6,
              approx_gelu=True)

    base = chain_time(lambda t: fbt._forward(t, w, **kw), xt)
    print(f"{stage} full        : {base*1e3:7.3f} ms", flush=True)

    real_gelu = jax.nn.gelu
    jax.nn.gelu = lambda x, approximate=True: jnp.maximum(x, 0)
    nogelu = chain_time(lambda t: fbt._forward(t, w, **kw), xt)
    jax.nn.gelu = real_gelu
    print(f"{stage} gelu->relu  : {nogelu*1e3:7.3f} ms  (gelu = {(base-nogelu)*1e3:+.3f})", flush=True)

    real_exp = jnp.exp
    jnp.exp = lambda x: x * 1.0009765625  # keep shapes/dtypes, kill the exp
    nosm = chain_time(lambda t: fbt._forward(t, w, **kw), xt)
    jnp.exp = real_exp
    print(f"{stage} exp->mul    : {nosm*1e3:7.3f} ms  (softmax exp = {(base-nosm)*1e3:+.3f})", flush=True)

    real_ln = fbt._ln_sub
    fbt._ln_sub = lambda x, s, b_, eps, dt_: (x.astype(jnp.float32) * s + b_).astype(dt_)
    noln = chain_time(lambda t: fbt._forward(t, w, **kw), xt)
    fbt._ln_sub = real_ln
    print(f"{stage} ln->affine  : {noln*1e3:7.3f} ms  (ln stats = {(base-noln)*1e3:+.3f})", flush=True)


def sweep():
    stage = sys.argv[2] if len(sys.argv) > 2 else "s1"
    c, heads, hw, ws, _ = STAGES[stage]
    head_dim, b = 72, 16
    hp = fbt.round_hp(head_dim)
    hidden, l = 4 * c, (ws * ws if ws else hw * hw)
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    w = make_weights(key, c, heads, head_dim, hp, hidden, dt)
    xt = fbt.to_t(jax.random.normal(key, (b, hw, hw, c), dt), ws)
    kw = dict(heads=heads, hp=hp, l=l, scale=head_dim ** -0.5, eps=1e-6,
              approx_gelu=True)
    n = hw * hw
    for cw in (128, 256, 512, 1024):
        if cw < l or cw > n:
            continue
        for cap in (1024, 2048, 4096):
            if cap < cw:
                continue
            try:
                s = chain_time(lambda t: fbt._forward(t, w, cw=cw, t_cap=cap, **kw), xt)
                tc = fbt._pick_cols(n, cw, heads, cap)
                print(f"{stage} cw={cw:5d} cap={cap:5d} (t_cell={tc:5d}): {s*1e3:7.3f} ms", flush=True)
            except Exception as e:
                print(f"{stage} cw={cw} cap={cap}: FAIL {type(e).__name__}", flush=True)

if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        sweep()
    else:
        main()
