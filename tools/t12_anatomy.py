"""Where do t12's milliseconds go?  (ROOFLINE gap #2: t12 5.2 ms of which
the qpool kernel is ~3.1 — this splits the remaining glue.)

Pieces, all batch-16 bf16 at the real t12 geometry (stage-1 out 128x128x144,
ws=4, heads=4, dim_out=288):

  to_t_micro   [B,128,128,144] -> [B,144,16384]  (8-D transpose, 128^2 res)
  qpool_kernel the fused front (LN -> qkv+sc -> pooled-q attention)
  proj_tail    o_p -> einsum proj + shortcut add  (token-major)
  from_t       [B,288,4096] -> [B,64,64,288]
  mlp_tail     norm2 + fc1 + gelu + fc2 + residual (NHWC)
  t12_full     the whole MultiScaleBlock

Usage: python tools/t12_anatomy.py [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from profile_parts import chain_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    from spegnet_tpu.models.hiera import MultiScaleBlock, _LayerNormParams
    from spegnet_tpu.ops import fused_block_t as fbt

    din, dout, heads, hw, ws = 144, 288, 4, 128, 4
    l = ws * ws
    d = dout // heads
    hp = fbt.round_hp(d)

    x = jax.random.normal(key, (B, hw, hw, din), dt)
    blk = MultiScaleBlock(dim=din, dim_out=dout, num_heads=heads,
                          q_stride=True, window_size=ws, dtype=dt)
    vb = jax.jit(blk.init)(key, x)

    def report(name, secs):
        print(f"{name:16s} {secs * 1e3:8.3f} ms", flush=True)

    # full block
    report("t12_full", chain_time(lambda x: blk.apply(vb, x), x, args.steps))

    # to_t_micro alone (chained via a cheap reduce back to NHWC shape dtype)
    def tm(x):
        return fbt.to_t_micro(x, ws)

    xt_shape = tm(x)
    report("to_t_micro", chain_time(
        lambda x: fbt.to_t_micro(x, ws).reshape(B, hw, hw, din), x,
        args.steps))

    # qpool kernel alone on the transposed input
    p = vb["params"]
    kq = p["attn"]["qkv"]["kernel"].reshape(din, 3, heads, d)
    kq = jnp.pad(kq.transpose(1, 2, 3, 0), ((0, 0), (0, 0), (0, hp - d), (0, 0)))
    kq = kq.reshape(3 * heads * hp, din)
    bq = jnp.pad(p["attn"]["qkv"]["bias"].reshape(3, heads, d),
                 ((0, 0), (0, 0), (0, hp - d))).reshape(-1, 1)
    wts = fbt.QPoolWeights(
        ln_scale=p["norm1"]["scale"].reshape(-1, 1),
        ln_bias=p["norm1"]["bias"].reshape(-1, 1),
        wqkv_t=kq.astype(dt), bqkv_t=bq.astype(dt),
        wsc_t=p["proj"]["kernel"].T.astype(dt),
        bsc_t=p["proj"]["bias"].reshape(-1, 1).astype(dt),
    )
    xt = tm(x)

    def kern(xt):
        o_p, sc_p = fbt.qpool_front(xt, wts, heads, hp, l, d ** -0.5, 1e-6)
        return jnp.concatenate([o_p, sc_p], axis=1)

    report("qpool_kernel", chain_time(kern, xt, args.steps))

    # proj tail: einsum + shortcut add (token-major), from the kernel outputs
    o_p, sc_p = jax.jit(
        lambda xt: fbt.qpool_front(xt, wts, heads, hp, l, d ** -0.5, 1e-6)
    )(xt)
    kp = p["attn"]["proj"]["kernel"].reshape(heads, d, dout)
    kp = jnp.pad(kp, ((0, 0), (0, hp - d), (0, 0))).reshape(heads * hp, dout)
    pb = p["attn"]["proj"]["bias"]

    def proj_tail(o_p):
        o_n = o_p.transpose(0, 2, 1)
        out1 = sc_p.transpose(0, 2, 1) + (
            jnp.einsum("bnf,fc->bnc", o_n, kp.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
            + pb.astype(dt))
        return out1.transpose(0, 2, 1)

    report("proj_tail", chain_time(proj_tail, o_p, args.steps))

    # from_t at the pooled resolution
    out1 = jax.jit(proj_tail)(o_p)
    report("from_t", chain_time(
        lambda t: fbt.from_t(t, ws // 2, (hw // 2, hw // 2))
        .reshape(B, dout, -1), out1, args.steps))

    # MLP tail in NHWC
    x2 = jax.jit(lambda t: fbt.from_t(t, ws // 2, (hw // 2, hw // 2)))(out1)
    norm2 = _LayerNormParams(dout, dtype=dt)
    n2v = {"params": p["norm2"]}
    kfc1, bfc1 = p["mlp_fc1"]["kernel"], p["mlp_fc1"]["bias"]
    kfc2, bfc2 = p["mlp_fc2"]["kernel"], p["mlp_fc2"]["bias"]

    def mlp_tail(x2):
        y = norm2.apply(n2v, x2)
        y = jnp.einsum("bhwc,cf->bhwf", y, kfc1.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt) \
            + bfc1.astype(dt)
        y = jax.nn.gelu(y, approximate=True)
        y = jnp.einsum("bhwf,fc->bhwc", y, kfc2.astype(dt),
                       preferred_element_type=jnp.float32).astype(dt) \
            + bfc2.astype(dt)
        return x2 + y

    report("mlp_tail", chain_time(mlp_tail, x2, args.steps))


if __name__ == "__main__":
    main()
