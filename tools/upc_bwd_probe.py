"""In-process interleaved A/B of upsample2x_conv3x3 backward lowerings.

Times the custom_vjp pull at each decoder geometry under the selectable
_BWD_FORM lowerings ("resize" production default vs "hand2": strided-slice
s2d + iota-select ring fold), interleaved in ONE process (the only
comparable A/B on this tunnel, CLAUDE.md).  Squared sums are folded into
the chain so XLA cannot factor plain sums through the linear ops.

Geometries (batch B, bf16) = the PED decoder stages at 512^2 training:
  up0: [B,  64,  64, 256] -> 128^2 x 256
  up1: [B, 128, 128, 256] -> 256^2 x 128
  up2: [B, 256, 256, 128] -> 512^2 x  64

Usage: python tools/upc_bwd_probe.py [--batch 8] [--forms resize,hand2]
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

from spegnet_tpu.ops import fused_upsample_conv as fuc  # noqa: E402

GEOMS = {
    "up0": (64, 256, 256),
    "up1": (128, 256, 128),
    "up2": (256, 128, 64),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--forms", type=str, default="resize,hand2")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--windows", type=int, default=4)
    args = ap.parse_args()
    B = args.batch
    forms = args.forms.split(",")
    key = jax.random.PRNGKey(0)

    for gname, (s, cin, cout) in GEOMS.items():
        x = jax.random.normal(key, (B, s, s, cin), jnp.bfloat16)
        k = jax.random.normal(key, (3, 3, cin, cout), jnp.bfloat16) * 0.05
        runs = {}
        for form in forms:
            fuc._BWD_FORM = form

            def loss(x, k):
                y = fuc.upsample2x_conv3x3(x, k)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-9

            g = jax.grad(loss, argnums=(0, 1))

            @jax.jit
            def run(x, k, n):
                def body(i, carry):
                    x, k = carry
                    gx, gk = g(x, k)
                    sx = jnp.sum(gx.astype(jnp.float32) ** 2) * 1e-12
                    sk = jnp.sum(gk.astype(jnp.float32) ** 2) * 1e-12
                    return (x + sx.astype(x.dtype), k + sk.astype(k.dtype))

                x, k = jax.lax.fori_loop(0, n, body, (x, k))
                return jnp.sum(x.astype(jnp.float32)) + jnp.sum(
                    k.astype(jnp.float32))

            float(run(x, k, 1))
            runs[form] = run

        n = args.steps
        best = {f: float("inf") for f in forms}
        for _ in range(args.windows):
            for form in forms:
                fuc._BWD_FORM = form  # defensive; baked at trace
                run = runs[form]
                t0 = time.time()
                float(run(x, k, 3 * n))
                t3 = time.time() - t0
                t0 = time.time()
                float(run(x, k, n))
                t1 = time.time() - t0
                best[form] = min(best[form], (t3 - t1) / (2 * n))
        for form in forms:
            print(f"BEST {gname} {form}: {best[form] * 1e3:8.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
