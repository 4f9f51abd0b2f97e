"""Fused decoder Pallas kernel vs the decomposed DecoderBlock on the v5e:
per-block A/B at the two production geometries (dec1 128^2 x 256 -> 128ch
with edge branch; dec2 256^2 x 128 -> 64ch with head).  Chained-timing
methodology (CLAUDE.md): fori_loop chains with data deps, min over windows.
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from spegnet_tpu.ops import fused_decoder as fd
from spegnet_tpu.ops.fused_upsample_conv import d2s_nhwc


def chain_time(fn, *args, steps=8, windows=3):
    @jax.jit
    def run(n, *args):
        x = args[0]

        def body(i, x):
            y = fn(x, *args[1:])
            s = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x, *args[1:]).astype(jnp.float32))

    float(run(steps, *args))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(n, *args))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def bench_geom(name, b, s, cin, cm, edge, head, sh):
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((b, s, s, cin)).astype(np.float32),
                    dtype=dt)
    k1 = jnp.asarray(
        rng.standard_normal((3, 3, cin, cm)).astype(np.float32) * 0.05)
    b1 = jnp.zeros(cm)
    k2 = jnp.asarray(
        rng.standard_normal((3, 3, cm, cm)).astype(np.float32) * 0.05)
    bn = dict(gamma=jnp.ones(cm), beta=jnp.zeros(cm),
              mean=jnp.zeros(cm), var=jnp.ones(cm))
    k_edge = ef = hw = hb = None
    if edge:
        k_edge = jnp.asarray(
            rng.standard_normal((3, 3, 64, cm)).astype(np.float32) * 0.05)
        ef = jnp.asarray(
            rng.standard_normal((b, 64, 64, 64)).astype(np.float32), dtype=dt)
    if head:
        hw = jnp.asarray(rng.standard_normal((cm, 1)).astype(np.float32))
        hb = jnp.zeros(1)

    params = fd.pack_params(k1, b1, bn, k2, b1, bn, k_edge=k_edge,
                            head_w=hw, head_b=hb, dtype=dt)

    def fused(x, ef=None):
        strips = fd.make_strips(x, k1, k_edge=k_edge, ef=ef, dtype=dt)
        out, pred = fd.fused_decoder_block(x, params, strips, ef=ef, sh=sh)
        return out if pred is None else out + 0 * pred.sum().astype(dt)

    def fused_d2s(x, ef=None):
        strips = fd.make_strips(x, k1, k_edge=k_edge, ef=ef, dtype=dt)
        out, _ = fd.fused_decoder_block(x, params, strips, ef=ef, sh=sh)
        return d2s_nhwc(out)

    def ref(x, ef=None):
        y, pred = fd.decoder_block_reference(
            x, k1, b1, bn, k2, b1, bn, k_edge=k_edge, ef=ef,
            head_w=hw, head_b=hb)
        return y if pred is None else y + 0 * pred.sum().astype(dt)

    args = (x, ef) if edge else (x,)
    mode = os.environ.get("DEC_MICRO_MODE", "all")
    t0 = time.time()
    if mode == "compile":
        float(jax.jit(lambda *a: fused(*a).astype(jnp.float32).sum())(*args))
        print(f"{name}: fused compile+run ok in {time.time()-t0:.1f}s",
              flush=True)
        return
    t_ref = chain_time(ref, *args)
    print(f"{name}: ref {t_ref*1e3:6.2f} ms", flush=True)
    t_f = chain_time(fused, *args)
    print(f"{name}: fused {t_f*1e3:6.2f} ms", flush=True)
    if os.environ.get("DEC_INT8", "0") == "1" and not edge:
        def fused_i8(x):
            strips = fd.make_strips(x, k1, dtype=dt)
            out, pred = fd.fused_decoder_block(x, params, strips, sh=sh,
                                               int8=True)
            return out if pred is None else out + 0 * pred.sum().astype(dt)

        t_i8 = chain_time(fused_i8, *args)
        print(f"{name}: fused int8 {t_i8*1e3:6.2f} ms", flush=True)
    t_fd = chain_time(fused_d2s, *args)
    # parity spot-check on-chip
    got = np.asarray(d2s_nhwc(fused_decoder_out(x, ef, params, k1, k_edge,
                                                sh)), np.float32)
    want = np.asarray(fd.decoder_block_reference(
        x, k1, b1, bn, k2, b1, bn, k_edge=k_edge, ef=ef,
        head_w=None, head_b=None)[0], np.float32)
    err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
    flops = 2 * b * (2 * s) ** 2 * 9 * (cin + (64 if edge else 0)) * cm \
        + 2 * b * (2 * s) ** 2 * 9 * cm * cm
    print(f"{name}: ref {t_ref*1e3:6.2f} ms  fused {t_f*1e3:6.2f} ms "
          f"(+d2s {t_fd*1e3:6.2f})  ({flops/t_f/1e12:5.1f} TF/s fused, "
          f"maxrelerr {err:.2e})", flush=True)


def fused_decoder_out(x, ef, params, k1, k_edge, sh):
    strips = fd.make_strips(x, k1, k_edge=k_edge, ef=ef, dtype=x.dtype)
    out, _ = fd.fused_decoder_block(x, params, strips, ef=ef, sh=sh)
    return out


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "dec2"):
        bench_geom("dec2", 16, 256, 128, 64, edge=False, head=True, sh=int(os.environ.get("DEC_SH", "16")))
    if which in ("both", "dec1"):
        bench_geom("dec1", 16, 128, 256, 128, edge=True, head=False, sh=int(os.environ.get("DEC_SH1", "8")))
    if which == "dec1ne":
        # dec1 geometry WITHOUT the edge branch: sizes the potential of
        # precomputing the edge contribution in XLA and feeding it to the
        # kernel as an additive input (the in-kernel edge dots + rg1=1 are
        # the suspected cause of dec1's fused loss).
        bench_geom("dec1ne", 16, 128, 256, 128, edge=False, head=False,
                   sh=int(os.environ.get("DEC_SH1", "8")))
