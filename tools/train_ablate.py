"""In-context train-step ablation: where do the 242 device-resident ms go?

tools/train_profile.py prices stages by calling MultiScaleBlock directly
(decomposed path); tools/bwd_probe.py prices the fused backward kernel in
isolation.  The two disagree about the production encoder's fwd+bwd cost by
~2x.  This probe measures the PRODUCTION compositions (Hiera.apply /
SPEGNet.apply, exactly what the trainer jits) so the step budget adds up:

  enc        grad of sum(Hiera(x))             -- encoder trunk fwd+bwd
  full       grad of the trainer's loss_fn     -- model + canvas loss
  step       full + multi-group AdamW update   -- the real train step

Usage: python tools/train_ablate.py [--batch 8] [parts-csv|all]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chain(fn, args, steps=3, windows=3):
    """fn(*args) -> (new_args, scalar); times a data-dependent chain."""

    @jax.jit
    def run(args, n):
        def body(i, a):
            return fn(*a)

        a = jax.lax.fori_loop(0, n, body, args)
        return jax.tree_util.tree_reduce(
            lambda s, x: s + jnp.sum(x[:0].astype(jnp.float32))
            if hasattr(x, "shape") and x.ndim else s,
            a, jnp.float32(0)), a

    s, a = run(args, steps)
    float(s)

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            s, _ = run(args, n)
            float(s)
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("parts", nargs="?", default="all")
    args = ap.parse_args()
    B, size = args.batch, 512
    parts = args.parts.split(",") if args.parts != "all" else [
        "enc", "full", "step"]
    # extra parts (not in "all"): "model" (grad of sum over raw model
    # outputs — full minus the loss backward), "opt" (optimizer-only pass
    # over synthetic grads: clip + adam + apply, params-shaped).

    from spegnet_tpu.models.hiera import Hiera
    from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, size, size, 3), jnp.float32)

    def report(name, ms):
        print(f"{name:24s} {ms * 1e3:8.2f} ms", flush=True)

    if "enc" in parts:
        enc = Hiera(variant="large", dtype=jnp.bfloat16)
        ev = enc.init(rng, x[:1])

        def enc_loss(p, x):
            feats = enc.apply({"params": p}, x)
            return sum(jnp.sum(f.astype(jnp.float32)) * 1e-9 for f in feats)

        g = jax.grad(enc_loss)

        def stepfn(p, x):
            gp = g(p, x)
            # fold a function of the grads back into x: data dependence.
            # FULL-leaf sums: a [:1] slice can be pushed through dots by XLA
            # (slice-of-dot -> dot-of-slice), DCE-ing most of each dW matmul.
            s = jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(b.astype(jnp.float32)) * 1e-12,
                gp, jnp.float32(0))
            return (jax.tree_util.tree_map(lambda a, b: a, p, gp),
                    x + s.astype(x.dtype))

        report("enc grad (prod path)", chain(stepfn, (ev["params"], x)))

    if "full" in parts or "step" in parts or "model" in parts or \
            "opt" in parts:
        from spegnet_tpu.losses import LossConfig, cod_loss

        cfg = SPEGNetConfig(variant="large", compute_dtype="bfloat16")
        model = SPEGNet(cfg)
        v = model.init(rng, x[:1], train=False)
        params, bs = v["params"], v["batch_stats"]
        lc = LossConfig()
        masks = (jax.random.uniform(rng, (B, size, size)) > 0.7).astype(
            jnp.float32)
        edges = (jax.random.uniform(rng, (B, size, size)) > 0.9).astype(
            jnp.float32)
        hw = jnp.full((B, 2), size, jnp.int32)
        sw = jnp.ones((B,), jnp.float32)

        def loss_fn(p, bs, x):
            out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                                   train=True, mutable=["batch_stats"])
            ld = cod_loss(out["predictions"], out["edge"], masks, edges,
                          hw, hw, lc, sw)
            return ld["loss"], mut["batch_stats"]

        if "model" in parts:
            def model_loss(p, bs, x):
                out, mut = model.apply({"params": p, "batch_stats": bs}, x,
                                       train=True, mutable=["batch_stats"])
                s = sum(jnp.sum(o.astype(jnp.float32)) * 1e-9
                        for o in out["predictions"])
                s = s + jnp.sum(out["edge"].astype(jnp.float32)) * 1e-9
                return s, mut["batch_stats"]

            gm = jax.grad(model_loss, has_aux=True)

            def modelstep(p, bs, x):
                gp, nbs = gm(p, bs, x)
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b.astype(jnp.float32))
                    * 1e-12, gp, jnp.float32(0))
                return (jax.tree_util.tree_map(lambda a, b: a, p, gp), nbs,
                        x + s.astype(x.dtype))

            report("model grad (no loss)", chain(modelstep, (params, bs, x)))

        if "opt" in parts:
            import optax

            # The production transform chain (clip + per-group adam + wd)
            # approximated with the same optax ops (ungrouped).
            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.scale_by_adam(),
                             optax.add_decayed_weights(1e-5))
            opt = tx.init(params)
            gsyn = jax.tree_util.tree_map(
                lambda p: (jnp.ones_like(p) * 1e-4), params)

            def optstep(p, opt, g):
                up, nopt = tx.update(g, opt, p)
                np_ = jax.tree_util.tree_map(
                    lambda a, u: a - 1e-4 * u.astype(a.dtype), p, up)
                s = jnp.sum(np_["decoder"]["block2"]["conv2"]["bias"]
                            .astype(jnp.float32)) * 1e-9
                g2 = dict(g)
                g2["decoder"] = jax.tree_util.tree_map(
                    lambda gg: gg + s.astype(gg.dtype), g["decoder"])
                return np_, nopt, g2

            report("optimizer only", chain(optstep, (params, opt, gsyn)))

        if "full" in parts:
            gf = jax.grad(loss_fn, has_aux=True)

            def fullstep(p, bs, x):
                gp, nbs = gf(p, bs, x)
                # Fold a function of EVERY grad leaf into the chain: folding
                # only one leaf lets XLA dead-code-eliminate the rest of the
                # backward (measured 55 ms vs the encoder's own 133).
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b.astype(jnp.float32))
                    * 1e-12, gp, jnp.float32(0))
                return (jax.tree_util.tree_map(lambda a, b: a, p, gp), nbs,
                        x + s.astype(x.dtype))

            report("full loss grad", chain(fullstep, (params, bs, x)))

        if "step" in parts:
            import optax

            tx = optax.chain(optax.clip_by_global_norm(1.0),
                             optax.scale_by_adam())
            opt = tx.init(params)

            def trstep(p, bs, opt, x):
                gp, nbs = jax.grad(loss_fn, has_aux=True)(p, bs, x)
                up, nopt = tx.update(gp, opt, p)
                np_ = jax.tree_util.tree_map(
                    lambda a, u: (a - 1e-4 * u.astype(a.dtype)), p, up)
                s = jnp.sum(np_["decoder"]["block2"]["conv2"]["bias"]
                            .astype(jnp.float32)) * 1e-12
                return np_, nbs, nopt, x + s.astype(x.dtype)

            report("full step (adam)", chain(trstep, (params, bs, opt, x)))


if __name__ == "__main__":
    main()
