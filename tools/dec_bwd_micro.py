"""Decoder BACKWARD decomposition (batch 8, bf16, chained-readback).

train_profile.py says decoder fwd+bwd = 52.2 ms while the forward alone is
~12.9 — the backward is ~3x the forward (a healthy conv backward is ~2x).
This micro prices jax.grad of each decoder piece to find the pathology:

  up{g}        upsample2x_conv3x3 alone at each decoder geometry
  blk{i}       DecoderBlock.apply (conv1+BN+ReLU+conv2+BN+ReLU) per stage
  cfi          CFI module
  efe          EFE module
  plain{g}     plain conv3x3 fwd+bwd at the same geometries (baseline)

Usage: python tools/dec_bwd_micro.py [parts-csv|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
DT = jnp.bfloat16


def chain_time(fn, x, steps=4, windows=3):
    """fn(x)->scalar-ish pytree; times grad-of-fn with data-dep chaining."""

    @jax.jit
    def run(x, n):
        def body(i, x):
            g = fn(x)
            s = jnp.sum(g.astype(jnp.float32)) * 1e-12
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


def rep(name, secs):
    print(f"{name:40s} {secs*1e3:8.2f} ms", flush=True)


def main():
    which = (sys.argv[1] if len(sys.argv) > 1 else "all").split(",")
    key = jax.random.PRNGKey(0)

    # decoder geometries: (in_res, cin, cout) for the three blocks' conv1
    geos = [(64, 320, 256), (128, 320, 128), (256, 128, 64)]

    def want(p):
        return "all" in which or p in which

    for gi, (res, cin, cout) in enumerate(geos):
        if not want(f"up{gi}"):
            continue
        from spegnet_tpu.ops.fused_upsample_conv import upsample2x_conv3x3

        x = jax.random.normal(key, (B, res, res, cin), DT)
        k = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05

        def f(x, k=k):
            return jnp.sum(upsample2x_conv3x3(x, k.astype(DT)).astype(jnp.float32) ** 2)

        gfn = jax.grad(f)
        rep(f"up{gi} grad(x) {res} {cin}->{cout}", chain_time(gfn, x))

        rep(f"up{gi} grad(k) {res} {cin}->{cout}",
            chain_time(lambda x, k=k: jax.grad(lambda kk: jnp.sum(
                upsample2x_conv3x3(x, kk.astype(DT)).astype(jnp.float32) ** 2))(
                    k).sum().astype(DT) * 1e-20 + x, x))

    for gi, (res, cin, cout) in enumerate(geos):
        if not want(f"plain{gi}"):
            continue
        x = jax.random.normal(key, (B, 2 * res, 2 * res, cin), DT)
        k = jax.random.normal(key, (3, 3, cin, cout), DT) * 0.05

        def f(x, k=k):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        rep(f"plain{gi} grad(x) {2*res} {cin}->{cout}", chain_time(jax.grad(f), x))

    if want("blk") or "all" in which:
        from spegnet_tpu.models.ped import DecoderBlock

        for i, (res, cin, cout, ce) in enumerate(
                [(64, 256, 256, 64), (128, 256, 128, 64), (256, 128, 64, 0)]):
            x = jax.random.normal(key, (B, res, res, cin), DT)
            ef = (jax.random.normal(key, (B, 128, 128, ce), DT) if ce else None)
            blk = DecoderBlock(cout, in_features=cin,
                               edge_features_ch=ce, dtype=DT)
            args = (x,) if ef is None else (x, ef)
            v = blk.init(key, *args, train=True)

            def f(x, v=v, blk=blk, ef=ef):
                a = (x,) if ef is None else (x, ef)
                out, _ = blk.apply(v, *a, train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32) ** 2)

            rep(f"blk{i} fwd+bwd(x) {res} {cin}->{cout}",
                chain_time(jax.grad(f), x))

            def fp(x, v=v, blk=blk, ef=ef):
                a = (x,) if ef is None else (x, ef)

                def loss(p):
                    out, _ = blk.apply(
                        {"params": p, "batch_stats": v["batch_stats"]},
                        *a, train=True, mutable=["batch_stats"])
                    return jnp.sum(out.astype(jnp.float32) ** 2)

                g = jax.grad(loss)(v["params"])
                s = sum(jnp.sum(l) for l in jax.tree.leaves(g))
                return x + (s * 1e-20).astype(DT)

            rep(f"blk{i} fwd+bwd(params) {res} {cin}->{cout}",
                chain_time(fp, x))


def measure_forms():
    """Price the three _BWD_FORM choices at the three decoder geometries
    (grad wrt x AND k together, the train-step shape)."""
    import spegnet_tpu.ops.fused_upsample_conv as fuc

    key = jax.random.PRNGKey(0)
    for form in ("poly", "resize", "primal"):
        fuc._BWD_FORM = form
        for gi, (res, cin, cout) in enumerate(
                [(64, 320, 256), (128, 320, 128), (256, 128, 64)]):
            x = jax.random.normal(key, (B, res, res, cin), DT)
            k = jax.random.normal(key, (3, 3, cin, cout), DT) * 0.05
            g = jax.grad(
                lambda x, k: jnp.sum(
                    fuc.upsample2x_conv3x3(x, k).astype(jnp.float32) ** 2),
                argnums=(0, 1))

            def step(x, k=k, g=g):
                gx, gk = g(x, k)
                s = (jnp.sum(gk.astype(jnp.float32)) * 1e-20).astype(DT)
                return gx * 1e-12 + s + x

            rep(f"{form} up{gi} grad(x,k) {res} {cin}->{cout}",
                chain_time(step, x))


if __name__ == "__main__":
    if "forms" in sys.argv[1:]:
        measure_forms()
    else:
        main()
