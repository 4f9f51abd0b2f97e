"""In-process interleaved A/B of attention chunk-width policies.

The fused T-kernel packs windows into masked attention chunks; the mask is
exact, so chunk width is a pure-speed knob.  The backward executes ~6x the
forward's attention-chunk flops, so masked waste (cw/l) costs it far more:
at s1 (l=64, cw=512) 8x of the sweep flops are mask-dead.  Round-3 probed
acw per-block across processes and saw only tunnel noise; this probe times
the FULL PRODUCTION encoder grad (Hiera.apply fwd+bwd, what the trainer
jits) with the policies interleaved in ONE process — the only A/B this
tunnel can compare (CLAUDE.md).

Configs: A = cw512/acw=cw (default), B = cw512/acw=l128 (backward subchunk),
C = cw=l128 everywhere (forward chunks shrink too).

Usage: python tools/acw_probe.py [--batch 8] [--steps 3] [--fwd-only]
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

from spegnet_tpu.ops import fused_block_t as fbt  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--fwd-only", action="store_true")
    ap.add_argument("--knobs", action="store_true",
                    help="probe slots/unroll instead of chunk widths")
    args = ap.parse_args()
    B, size = args.batch, 512

    from spegnet_tpu.models.hiera import Hiera

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, size, size, 3), jnp.float32)
    enc = Hiera(variant="large", dtype=jnp.bfloat16)
    ev = jax.jit(enc.init)(rng, x[:1])  # jitted: eager init is ~1 RTT/op through the tunnel
    params = ev["params"]

    # (CW, ACW, slots, unroll, QPOOL_CW)
    if args.knobs:
        CONFIGS = {
            "A_default": ("512", "cw", False, False, "512"),
            "D_slots": ("512", "cw", True, False, "512"),
            "E_unroll": ("512", "cw", False, True, "512"),
        }
    elif args.fwd_only:
        CONFIGS = {
            "A_default": ("512", "cw", False, False, "512"),
            "C_cw=l128": ("l128", "l128", False, False, "l128"),
            "Q_qpool128": ("512", "cw", False, False, "l128"),
        }
    else:
        CONFIGS = {
            "A_cw512_acw=cw": ("512", "cw", False, False, "512"),
            "B_cw512_acw=l128": ("512", "l128", False, False, "512"),
            "C_cw=l128": ("l128", "l128", False, False, "512"),
        }

    def set_policy(name):
        (fbt.CW_POLICY, fbt.ACW_POLICY,
         fbt.BWD_SLOTS, fbt.BWD_UNROLL, fbt.QPOOL_CW) = CONFIGS[name]

    def make_grad(name):
        # NO fori_loop around the grad: the remote compile helper dies
        # (broken pipe) on loop-wrapped full-encoder-grad programs.  A
        # single-step jitted grad is dispatched in a Python loop instead,
        # chained through the x carry (step_chain.py methodology).
        def enc_loss(p, x):
            feats = enc.apply({"params": p}, x)
            return sum(jnp.sum(f.astype(jnp.float32) ** 2) * 1e-9
                       for f in feats)

        g = jax.grad(enc_loss)

        @jax.jit
        def stepfn(p, x):
            gp = g(p, x)
            s = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32) ** 2) * 1e-12,
                gp, jnp.float32(0))
            return x + s.astype(x.dtype)

        return stepfn

    def make_fwd(name):
        def f(p, x):
            feats = enc.apply({"params": p}, x)
            return sum(jnp.sum(f.astype(jnp.float32) ** 2) * 1e-9
                       for f in feats)

        @jax.jit
        def stepfn(p, x):
            return x + (f(p, x) * 1e-12).astype(x.dtype)

        return stepfn

    maker = make_fwd if args.fwd_only else make_grad
    runs = {}
    for name in CONFIGS:
        set_policy(name)
        runs[name] = maker(name)
        float(jnp.sum(runs[name](params, x).astype(jnp.float32)))  # compile
        print(f"{name}: compiled", flush=True)

    def timed(name, n):
        xx = x
        t0 = time.time()
        for _ in range(n):
            xx = runs[name](params, xx)
        float(jnp.sum(xx.astype(jnp.float32)))
        return time.time() - t0

    n = args.steps
    best = {name: float("inf") for name in CONFIGS}
    for w in range(args.windows):
        for name in CONFIGS:
            set_policy(name)  # no-op at runtime; defensive
            per = (timed(name, 3 * n) - timed(name, n)) / (2 * n)
            best[name] = min(best[name], per)
            print(f"w{w} {name}: {per * 1e3:8.2f} ms", flush=True)
    print("---")
    for name, v in best.items():
        print(f"BEST {name}: {v * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
