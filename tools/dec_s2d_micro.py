"""Decoder s2d-form candidates, measured on the v5e (batch 16, bf16).

The round-2 roofline showed polyphase (s2d-output) upsample+conv matmuls run
~2x faster than the lhs-dilated composed conv, but the depth-to-space back to
NHWC at 64 channels costs more than the saving.  These micros price the full
alternative pipeline that never materializes a <128-lane tensor:

  a) d2s of an s2d tensor with >=128-lane contiguous chunks
     ([B,S,S,4C] -> [B,2S,2S,C] for C in {256, 128}) — is THIS retiling cheap?
  b) poly conv1 (kernel [3,3,Cin,4Co], stride 1) vs the current lhs-dilated
     composed conv, at all three decoder geometries
  c) dec2 conv2 in W-only-s2d form ([3,2,2C,2C], 75% density, M=128) vs the
     current NHWC [3,3,64,64] conv at 512^2
  d) the py-expansion half-d2s [B,S,S,(py,px,c)] -> [B,2S,S,(px,c)]
  e) BN+ReLU on the s2d form (elementwise, should be free-ish)

Usage: python tools/dec_s2d_micro.py [a|b|c|d|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


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


def _conv(x, k, padding, **kw):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), padding, dimension_numbers=("NHWC", "HWIO", "NHWC"), **kw)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    b = 16
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def rep(name, secs, flops=None):
        line = f"{name:42s} {secs*1e3:7.2f} ms"
        if flops:
            line += f"  ({flops/secs/1e12:6.1f} TF/s)"
        print(line, flush=True)

    if which in ("a", "all"):
        # d2s with big chunks: [B,S,S,4C] -> [B,2S,2S,C]
        for s, c in ((64, 256), (128, 128), (256, 64)):
            x = jax.random.normal(key, (b, s, s, 4 * c), dt)

            def d2s(x, s=s, c=c):
                y = x.reshape(b, s, s, 2, 2, c)
                y = y.transpose(0, 1, 3, 2, 4, 5)
                return y.reshape(b, 2 * s, 2 * s, c)

            rep(f"d2s {s}^2 x{4*c} -> {2*s}^2 x{c}", chain_time(d2s, x))

    if which in ("b", "all"):
        from spegnet_tpu.ops.fused_upsample_conv import _compose_kernel

        for res, cin, cout in ((64, 320, 256), (128, 320, 128), (256, 128, 64)):
            x = jax.random.normal(key, (b, res, res, cin), dt)
            k = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05
            ke = _compose_kernel(k)  # [6, 6, cin, cout]
            kp = jnp.stack([jnp.stack([
                ke[1 - py::2, 1 - px::2] for px in (0, 1)], 0) for py in (0, 1)], 0)
            kp = kp.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, cin, 4 * cout)

            t_core = chain_time(lambda x, ke=ke: _conv(
                jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
                ke.astype(dt), [(1, 1), (1, 1)], lhs_dilation=(2, 2)).astype(dt), x)
            t_poly = chain_time(lambda x, kp=kp: _conv(
                jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
                kp.astype(dt), [(0, 0), (0, 0)]).astype(dt), x)
            flops = 2 * b * (2 * res) ** 2 * 9 * cin * cout
            rep(f"conv1 lhsdil {res} {cin}->{cout}", t_core, flops)
            rep(f"conv1 poly   {res} {cin}->{cout}", t_poly, flops)

    if which in ("c", "all"):
        # dec2 conv2: current NHWC 64->64 @512^2 vs W-s2d [3,2,128,128]
        c = 64
        x = jax.random.normal(key, (b, 512, 512, c), dt)
        k = jax.random.normal(key, (3, 3, c, c), dt) * 0.05
        rep("conv2 NHWC 512^2 64->64", chain_time(
            lambda x: _conv(x, k, [(1, 1), (1, 1)]).astype(dt), x),
            2 * b * 512 ** 2 * 9 * c * c)

        xw = jax.random.normal(key, (b, 512, 256, 2 * c), dt)
        kw2 = jax.random.normal(key, (3, 2, 2 * c, 2 * c), dt) * 0.05
        rep("conv2 W-s2d [3,2,128,128] @512x256", chain_time(
            lambda x: _conv(x, kw2, [(1, 1), (0, 1)]).astype(dt), xw),
            2 * b * 512 * 256 * 6 * (2 * c) ** 2)

        # dec1 conv2 current for comparison: 128->128 @256^2
        x1 = jax.random.normal(key, (b, 256, 256, 128), dt)
        k1 = jax.random.normal(key, (3, 3, 128, 128), dt) * 0.05
        rep("conv2 NHWC 256^2 128->128", chain_time(
            lambda x: _conv(x1 * 0 + x, k1, [(1, 1), (1, 1)]).astype(dt), x1),
            2 * b * 256 ** 2 * 9 * 128 * 128)

    if which in ("d", "all"):
        # py-expansion: [B,S,S,(py,px,c)] -> [B,2S,S,(px,c)]
        for s, c in ((256, 64), (128, 128)):
            x = jax.random.normal(key, (b, s, s, 4 * c), dt)

            def pyx(x, s=s, c=c):
                y = x.reshape(b, s, s, 2, 2 * c)
                y = y.transpose(0, 1, 3, 2, 4)
                return y.reshape(b, 2 * s, s, 2 * c)

            rep(f"py-expand {s}^2 x{4*c} -> {2*s}x{s} x{2*c}",
                chain_time(pyx, x))

    if which in ("e", "all"):
        x = jax.random.normal(key, (b, 256, 256, 256), dt)
        sc = jax.random.normal(key, (256,), jnp.float32)
        of = jax.random.normal(key, (256,), jnp.float32)
        rep("bn+relu elementwise 256^2 x256", chain_time(
            lambda x: jax.nn.relu(x.astype(jnp.float32) * sc + of).astype(dt), x))


if __name__ == "__main__":
    main()
