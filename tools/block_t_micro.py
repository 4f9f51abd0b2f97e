"""Micro parity + timing harness for the transposed fused block kernel.

Usage:
  python tools/block_t_micro.py --cpu            # interpret-mode parity only
  python tools/block_t_micro.py --stage s3w      # on-TPU parity + A/B timing

Stages mirror Hiera-L at 512^2 and batch 16 (see tools/profile_parts.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = {
    #        C, heads, HW, ws(0=global), n_blocks
    "s1": (144, 2, 128, 8, 2),
    "s2": (288, 4, 64, 4, 6),
    "s3w": (576, 8, 32, 16, 33),
    "s3g": (576, 8, 32, 0, 3),
    "s4": (1152, 16, 16, 8, 4),
}


def make_weights(key, c, heads, head_dim, hp, hidden, dtype):
    import jax
    import jax.numpy as jnp

    from spegnet_tpu.ops.fused_block_t import TBlockWeights

    ks = jax.random.split(key, 8)
    wqkv = jax.random.normal(ks[0], (c, 3, heads, head_dim), jnp.float32) * 0.05
    bqkv = jax.random.normal(ks[1], (3, heads, head_dim), jnp.float32) * 0.02
    wproj = jax.random.normal(ks[2], (heads, head_dim, c), jnp.float32) * 0.05
    bproj = jax.random.normal(ks[3], (c,), jnp.float32) * 0.02
    wfc1 = jax.random.normal(ks[4], (hidden, c), jnp.float32) * 0.05
    wfc2 = jax.random.normal(ks[5], (c, hidden), jnp.float32) * 0.05
    ln = lambda k: jax.random.normal(k, (c, 1), jnp.float32) * 0.1 + 1.0

    pad = [(0, 0), (0, 0), (0, 0), (0, hp - head_dim)]
    wqkv_t = jnp.pad(wqkv.transpose(1, 2, 3, 0)[None][0],
                     [(0, 0), (0, 0), (0, hp - head_dim), (0, 0)])
    wqkv_t = wqkv_t.reshape(3 * heads * hp, c)
    bqkv_t = jnp.pad(bqkv, [(0, 0), (0, 0), (0, hp - head_dim)]).reshape(-1, 1)
    wproj_t = jnp.pad(wproj, [(0, 0), (0, hp - head_dim), (0, 0)])
    wproj_t = wproj_t.reshape(heads * hp, c).T

    return TBlockWeights(
        ln1_scale=ln(ks[6]), ln1_bias=jnp.zeros((c, 1)),
        wqkv_t=wqkv_t.astype(dtype), bqkv_t=bqkv_t.astype(dtype),
        wproj_t=wproj_t.astype(dtype),
        bproj_t=bproj.reshape(-1, 1).astype(dtype),
        ln2_scale=ln(ks[7]), ln2_bias=jnp.zeros((c, 1)),
        wfc1_t=wfc1.astype(dtype),
        bfc1_t=jnp.zeros((hidden, 1), dtype),
        wfc2_t=wfc2.astype(dtype),
        bfc2_t=jnp.zeros((c, 1), dtype),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--stage", default="s3w")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    from spegnet_tpu.ops import fused_block_t as fbt

    c, heads, hw, ws, nblk = STAGES[args.stage]
    head_dim = 72
    hp = fbt.round_hp(head_dim)
    hidden = 4 * c
    l = ws * ws if ws else hw * hw
    b = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    weights = make_weights(key, c, heads, head_dim, hp, hidden, dt)
    x = jax.random.normal(key, (b, hw, hw, c), dt)
    xt = fbt.to_t(x, ws)
    kw = dict(heads=heads, hp=hp, l=l, scale=head_dim ** -0.5, eps=1e-6,
              approx_gelu=True)

    if args.cpu:
        out = fbt._forward(xt, weights, interpret=True, **kw)
        ref = fbt.block_t_reference(xt, weights, **kw)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{args.stage}: interpret parity maxerr {err:.2e}")
        # round-trip of the layout transforms
        rt = fbt.from_t(xt, ws, (hw, hw))
        rt_err = float(jnp.max(jnp.abs(rt - x)))
        print(f"{args.stage}: to_t/from_t round-trip maxerr {rt_err:.2e}")
        return

    # ---- on-chip parity + timing --------------------------------------
    fused = jax.jit(lambda t: fbt.fused_block_t(t, weights, heads, hp, l,
                                                head_dim ** -0.5, 1e-6, True))
    ref_f = jax.jit(lambda t: fbt.block_t_reference(t, weights, **kw))
    a = jax.device_get(fused(xt)).astype("float32")
    r = jax.device_get(ref_f(xt)).astype("float32")
    import numpy as np
    err = float(np.max(np.abs(a - r)))
    print(f"{args.stage}: on-chip parity maxerr {err:.2e}")

    def chain_time(fn, x, steps=args.steps, windows=3):
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

    secs = chain_time(lambda t: fbt.fused_block_t(
        t, weights, heads, hp, l, head_dim ** -0.5, 1e-6, True), xt)
    useful = 24 * b * hw * hw * c * c + 4 * b * hw * hw * l * c
    print(f"{args.stage}: fused_t {secs*1e3:7.3f} ms "
          f"({useful/secs/1e12:5.1f} TF/s useful)  x{nblk} = {secs*1e3*nblk:.1f} ms")


if __name__ == "__main__":
    main()
