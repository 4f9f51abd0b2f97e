"""Price the trunk's layout boundaries: current window-major relayouts vs a
unified Morton (Z-order) token layout.

Motivation (round-4 perf): every stage boundary today pays XLA lane-retiling
transposes — s1 ends with from_t, t12 re-enters with to_t_micro, each
transition tail runs token-major (two [C,N]<->[N,C] transposes + from_t +
to_t for the next stage).  A Morton lane order makes every 2x2 pool group a
4-lane run and every window an l-lane run at ALL stages simultaneously
(2x2 pooling = keep every 4th lane, exactly the qpool kernel's ::4
compaction), so the whole trunk can stay in one [B, C, N] layout: the only
remaining transforms are one to_z after patch embed and one from_z per
CFI-consumed stage output.

Because XLA composes/elides pure permutations, every measured composition is
pinned between trivial Pallas copy kernels (opaque to the optimizer), so the
transform cost is materialized exactly once per application.

Usage: python tools/layout_micro.py [--batch 16] [--steps 8] [--parts a,b]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _pin_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pin(x):
    """Identity through a Pallas kernel: forces x to be materialized in its
    logical layout (opaque to XLA's transpose folding)."""
    interp = jax.default_backend() not in ("tpu", "axon")
    blk = (1,) + x.shape[1:]
    idx = lambda i: (i,) + (0,) * (x.ndim - 1)
    return pl.pallas_call(
        _pin_kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
        interpret=interp,
    )(x)


def chain_time(fn, x, steps: int = 8, windows: int = 3) -> float:
    """Seconds per fn application (same-shape fn), tunnel-RTT-free: slope
    between chains of n and 3n data-dependent steps."""

    @jax.jit
    def run(x, n):
        def body(i, x):
            y = fn(x)
            return y + (i % 2).astype(y.dtype)  # data dep, not elidable

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(x.astype(jnp.float32))

    float(run(x, steps))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


# ---------------------------------------------------------------------------
# Morton (Z-order) transforms, XLA-level first cut: one big transpose whose
# index dims are the interleaved bits of (row, col).
# ---------------------------------------------------------------------------


def to_z(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, C, N] Morton lane order (H == W, powers of 2)."""
    b, h, w, c = x.shape
    kh = h.bit_length() - 1
    assert h == w and (1 << kh) == h
    x = x.reshape((b,) + (2,) * kh + (2,) * kh + (c,))
    perm = [0, 1 + 2 * kh]
    for i in range(kh):
        perm += [1 + i, 1 + kh + i]
    x = x.transpose(perm)
    return x.reshape(b, c, h * w)


def from_z(xt: jnp.ndarray, hw) -> jnp.ndarray:
    """Inverse of to_z: [B, C, N] -> [B, H, W, C]."""
    b, c, n = xt.shape
    h, w = hw
    kh = h.bit_length() - 1
    x = xt.reshape((b, c) + (2, 2) * kh)
    perm = ([0] + [2 + 2 * i for i in range(kh)]
            + [3 + 2 * i for i in range(kh)] + [1])
    x = x.transpose(perm)
    return x.reshape(b, h, w, c)


def micro_inverse(t, mws, hw):
    """Inverse of fbt.to_t_micro: [B, C, N] -> [B, H, W, C]."""
    b, c, n = t.shape
    h, w = hw
    t = t.reshape(b, c, h // mws, w // mws, mws // 2, mws // 2, 2, 2)
    t = t.transpose(0, 2, 4, 6, 3, 5, 7, 1)
    return t.reshape(b, h, w, c)


def check_properties():
    xs = jnp.arange(4 * 16 * 16 * 3, dtype=jnp.float32).reshape(4, 16, 16, 3)
    assert jnp.allclose(from_z(to_z(xs), (16, 16)), xs)
    zt = to_z(xs)
    pooled = zt.reshape(4, 3, 16 * 16 // 4, 4).max(axis=-1)
    ref = jax.lax.reduce_window(xs, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                (1, 2, 2, 1), "VALID")
    assert jnp.allclose(pooled, to_z(ref)), "::4 pooling != Morton of pooled"
    # windows contiguous: any aligned 2^k x 2^k block is 4^k consecutive
    # lanes; check ws=4 windows hold exactly the right spatial cells.
    z = zt[0, 0]  # channel 0 of image 0, values encode 16*r + c... no:
    # xs value at (b, r, c, ch) = ((b*16 + r)*16 + c)*3 + ch
    for k in range(4):
        lanes = z[k * 16:(k + 1) * 16]
        rows = ((lanes / 3) // 16) % 16
        cols = (lanes / 3) % 16
        assert rows.max() - rows.min() == 3 and cols.max() - cols.min() == 3
    print("to_z/from_z/pool-compaction/window properties OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--parts", type=str, default="")
    args = ap.parse_args()
    B, dt = args.batch, jnp.bfloat16
    key = jax.random.PRNGKey(0)
    from spegnet_tpu.ops import fused_block_t as fbt

    want = set(args.parts.split(",")) if args.parts else None

    def go(name, fn, x):
        if want and name.split("/")[0] not in want:
            return
        ms = chain_time(fn, x, args.steps) * 1e3
        print(f"{name:34s} {ms:8.3f} ms", flush=True)

    check_properties()

    # Per-stage round trips: NHWC -> layout -> pin -> inverse -> pin.
    # Reported number = to + from cost at that geometry.
    for nm, h, c, ws, mws in (
        ("s1", 128, 144, 8, 4),    # s1 run ws=8; t12 micro ws=4
        ("s2", 64, 288, 4, 16),    # s2 run ws=4; t23 micro ws=16
        ("s3", 32, 576, 16, 8),    # s3 run ws=16; t34 micro ws=8
        ("s4", 16, 1152, 8, 0),    # s4 run ws=8
    ):
        x = jax.random.normal(key, (B, h, h, c), dt)
        go(f"{nm}/to_t+from_t ws={ws}",
           lambda x, ws=ws, h=h: pin(fbt.from_t(pin(fbt.to_t(x, ws)),
                                                ws, (h, h))), x)
        if mws:
            go(f"{nm}/to_t_micro+inv ws={mws}",
               lambda x, mws=mws, h=h: pin(micro_inverse(
                   pin(fbt.to_t_micro(x, mws)), mws, (h, h))), x)
        go(f"{nm}/to_z+from_z",
           lambda x, h=h: pin(from_z(pin(to_z(x)), (h, h))), x)
        # token-major transpose pair at the POOLED res (transition tail)
        if mws:
            xt = jax.random.normal(key, (B, 2 * c, h * h // 4), dt)
            go(f"{nm}/tail tr pair C={2*c}",
               lambda t: pin(pin(t.transpose(0, 2, 1)).transpose(0, 2, 1)),
               xt)

    # Transition-tail alternatives: current token-major vs T-layout.
    for nm, hp_, cout, nws in (("t12", 64, 288, 4),
                               ("t23", 32, 576, 16),
                               ("t34", 16, 1152, 8)):
        n = hp_ * hp_
        o_p = jax.random.normal(key, (B, cout, n), dt)  # attn out (F lanes)
        sc_p = jax.random.normal(key, (B, cout, n), dt)
        kp = jax.random.normal(key, (cout, cout), dt) * 0.02
        k1 = jax.random.normal(key, (cout, cout * 4), dt) * 0.02
        k2 = jax.random.normal(key, (cout * 4, cout), dt) * 0.02
        ln_s = jnp.ones((cout,), dt)
        ln_b = jnp.zeros((cout,), dt)

        def tail_cur(o_p, sc_p=sc_p, kp=kp, k1=k1, k2=k2, ln_s=ln_s,
                     ln_b=ln_b, hp_=hp_, nws=nws):
            # current: transpose -> proj einsum (token-major) -> from_t(2)
            # -> NHWC MLP -> to_t(next stage ws) back into kernel layout
            o_n = o_p.transpose(0, 2, 1)
            out1 = sc_p.transpose(0, 2, 1) + jnp.einsum(
                "bnf,fc->bnc", o_n, kp,
                preferred_element_type=jnp.float32).astype(o_n.dtype)
            x2 = fbt.from_t(out1.transpose(0, 2, 1), 2, (hp_, hp_))
            y = x2.astype(jnp.float32)
            mu = y.mean(-1, keepdims=True)
            yv = y - mu
            y = (yv * jax.lax.rsqrt((yv * yv).mean(-1, keepdims=True) + 1e-6)
                 * ln_s + ln_b).astype(x2.dtype)
            y = jnp.einsum("bhwc,cf->bhwf", y, k1,
                           preferred_element_type=jnp.float32).astype(y.dtype)
            y = jax.nn.gelu(y, approximate=True)
            y = jnp.einsum("bhwf,fc->bhwc", y, k2,
                           preferred_element_type=jnp.float32).astype(y.dtype)
            out = x2 + y
            return pin(fbt.to_t(out, min(nws, hp_)).reshape(o_p.shape))

        def tail_t(o_p, sc_p=sc_p, kp=kp, k1=k1, k2=k2, ln_s=ln_s,
                   ln_b=ln_b):
            # proposed: everything stays [B, C, N]
            out1 = sc_p + jnp.einsum(
                "fc,bfn->bcn", kp, o_p,
                preferred_element_type=jnp.float32).astype(o_p.dtype)
            y = out1.astype(jnp.float32)
            mu = y.mean(1, keepdims=True)
            yv = y - mu
            y = (yv * jax.lax.rsqrt((yv * yv).mean(1, keepdims=True) + 1e-6)
                 * ln_s[:, None] + ln_b[:, None]).astype(out1.dtype)
            y = jnp.einsum("cf,bcn->bfn", k1, y,
                           preferred_element_type=jnp.float32).astype(y.dtype)
            y = jax.nn.gelu(y, approximate=True)
            y = jnp.einsum("fc,bfn->bcn", k2, y,
                           preferred_element_type=jnp.float32).astype(y.dtype)
            return pin(out1 + y)

        go(f"{nm}/tail_current", tail_cur, o_p)
        go(f"{nm}/tail_tlayout", tail_t, o_p)


if __name__ == "__main__":
    main()
