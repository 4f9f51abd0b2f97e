"""Where do the int8-mode inference milliseconds go? (batch 16, 512²)

Times the full int8 SPEGNet, the int8 encoder alone, and the decoder alone
in ONE process (chained-readback methodology, CLAUDE.md) so the residual
"glue" (layout transforms, feature handoff, resize) is directly visible:
glue ≈ full − encoder − decoder.

Follows the bench.py pattern exactly: variables are jit ARGUMENTS (closing
over 220M params uploads them as constants → remote-compile HTTP 413 /
silent stalls), init at batch 1.
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

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chain_time_v(fn, variables, x, steps=8, windows=3):
    """bench.py-style chained timing with variables as a jit argument."""

    @jax.jit
    def run(variables, x, n):
        def body(i, x):
            y = fn(variables, x)
            s = jnp.mean(y.astype(jnp.float32)) * 1e-6
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(variables, x).astype(jnp.float32))

    float(run(variables, x, steps))  # compile + warm

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(variables, x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--bf16", action="store_true", help="also time bf16 twins")
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    from spegnet_tpu.models.hiera import Hiera
    from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig

    x = jax.random.normal(key, (B, 512, 512, 3), dt)
    x1 = jnp.zeros((1, 512, 512, 3), dt)

    model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16",
                                  int8_encoder=True))
    variables = jax.jit(model.init)(key, x1)

    def full_fn(v, xx):
        return model.apply(v, xx)["predictions"][-1]

    t_full = chain_time_v(full_fn, variables, x, args.steps)
    print(f"full_int8        {t_full*1e3:8.2f} ms", flush=True)

    enc = Hiera(variant="large", dtype=dt, int8=True)
    ev = jax.jit(enc.init)(key, x1)

    def enc_fn(v, xx):
        return enc.apply(v, xx)[-1]

    t_enc = chain_time_v(enc_fn, ev, x, args.steps)
    print(f"encoder_int8     {t_enc*1e3:8.2f} ms", flush=True)

    # decoder (CFI + EFE + PED) on synthetic features
    import flax.linen as nn

    from spegnet_tpu.models.cfi import AdaptiveAttentionFusion, EfficientASPP
    from spegnet_tpu.models.ped import BoundaryAwareDecoder, EdgeDetectionModule

    class DecoderOnly(nn.Module):
        @nn.compact
        def __call__(self, feats):
            fused = AdaptiveAttentionFusion(512, dtype=dt, name="fusion")(feats)
            ctx = EfficientASPP(512, 256, dtype=dt, name="context")(fused)
            edge_map, ef = EdgeDetectionModule(64, dtype=dt, name="edge")(ctx)
            preds = BoundaryAwareDecoder((256, 128, 64), 1, (True, True, False),
                                         dtype=dt, name="dec")(ctx, ef)
            return preds[-1]

    feats = [
        jax.random.normal(key, (B, 64, 64, 288), dt),
        jax.random.normal(key, (B, 32, 32, 576), dt),
        jax.random.normal(key, (B, 16, 16, 1152), dt),
    ]
    dec = DecoderOnly()
    dv = jax.jit(dec.init)(key, [f[:1] for f in feats])

    def dec_fn(v, f2):
        return dec.apply(v, [f2, feats[1], feats[2]])

    t_dec = chain_time_v(dec_fn, dv, feats[0], args.steps)
    print(f"decoder          {t_dec*1e3:8.2f} ms", flush=True)
    print(f"glue (full - enc - dec) ≈ {(t_full - t_enc - t_dec)*1e3:.2f} ms",
          flush=True)

    if args.bf16:
        m2 = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16"))

        def full2(v, xx):
            return m2.apply(v, xx)["predictions"][-1]

        print(f"full_bf16        "
              f"{chain_time_v(full2, variables, x, args.steps)*1e3:8.2f} ms",
              flush=True)

        enc2 = Hiera(variant="large", dtype=dt)
        e2v = jax.jit(enc2.init)(key, x1)

        def enc2_fn(v, xx):
            return enc2.apply(v, xx)[-1]

        print(f"encoder_bf16     "
              f"{chain_time_v(enc2_fn, e2v, x, args.steps)*1e3:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
