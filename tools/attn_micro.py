"""Micro-bench of attention-kernel variants at the Hiera stage-3 shape.

Shape: n = batch*heads = 128 problems of [L=1024, D=72], bf16.
Hypotheses for the measured 11 TF/s (vs ~84 TF/s on the same block's
matmuls):
  v0  current kernel (whole problem per grid cell, lane-contraction QK dot)
  v1  + dimension_semantics=("parallel",)  (cross-cell pipelining)
  v2  q-blocked BQ=256 + parallel semantics
  v3  multiple problems per cell folding batch into sublanes
  v4  k pre-transposed to [N, D, L] outside the kernel (MXU-native layouts)
  xla plain einsum reference
"""

from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])


def chain_time(fn, x, steps=8, windows=3):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, steps, body, x)
        return jnp.sum(fn(x).astype(jnp.float32))

    float(run(x))
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        float(run(x))
        best = min(best, time.time() - t0)
    return best / (steps + 1)


N, L, D = 128, 1024, 72
SCALE = D ** -0.5


def kern_v0(q_ref, k_ref, v_ref, o_ref):
    q = q_ref[0, :, :]
    k = k_ref[0, :, :]
    v = v_ref[0, :, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, :, :] = (o * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)


def make_v0(parallel=False):
    spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    params = {}
    if parallel:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel",))

    def fn(qkv):
        q, k, v = qkv
        return pl.pallas_call(
            kern_v0,
            out_shape=jax.ShapeDtypeStruct((N, L, D), q.dtype),
            grid=(N,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
            **params,
        )(q, k, v)

    return fn


def kern_qblock(q_ref, k_ref, v_ref, o_ref, *, bq):
    q = q_ref[0, :, :]
    k = k_ref[0, :, :]
    v = v_ref[0, :, :]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, :, :] = (o * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)


def make_v2(bq=256, parallel=True):
    q_spec = pl.BlockSpec((1, bq, D), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, L, D), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    params = {}
    if parallel:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))

    def fn(qkv):
        q, k, v = qkv
        return pl.pallas_call(
            functools.partial(kern_qblock, bq=bq),
            out_shape=jax.ShapeDtypeStruct((N, L, D), q.dtype),
            grid=(N, L // bq),
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            **params,
        )(q, k, v)

    return fn


def kern_kt(q_ref, kt_ref, v_ref, o_ref):
    q = q_ref[0, :, :]
    kt = kt_ref[0, :, :]   # [D, L]
    v = v_ref[0, :, :]
    s = jax.lax.dot_general(q, kt, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) * SCALE
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, :, :] = (o * pl.reciprocal(denom, approx=False)).astype(o_ref.dtype)


def make_v4():
    q_spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    kt_spec = pl.BlockSpec((1, D, L), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    params = {"compiler_params": pltpu.CompilerParams(
        dimension_semantics=("parallel",))}

    def fn(qkv):
        q, k, v = qkv
        kt = k.transpose(0, 2, 1)
        return pl.pallas_call(
            kern_kt,
            out_shape=jax.ShapeDtypeStruct((N, L, D), q.dtype),
            grid=(N,),
            in_specs=[q_spec, kt_spec, q_spec],
            out_specs=q_spec,
            **params,
        )(q, kt, v)

    return fn


def xla_ref(qkv):
    q, k, v = qkv
    s = jnp.einsum("nld,nmd->nlm", q, k,
                   preferred_element_type=jnp.float32) * SCALE
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("nlm,nmd->nld", p, v)


def main():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (N, L, D), jnp.bfloat16)
    flops = 4 * N * L * L * D

    def wrap(fn):
        return lambda q: fn((q, q, q))

    cases = {
        "v0_current": wrap(make_v0(False)),
        "v1_parallel": wrap(make_v0(True)),
        "v2_qblock256_par": wrap(make_v2(256)),
        "v2_qblock512_par": wrap(make_v2(512)),
        "v4_kt_par": wrap(make_v4()),
        "xla": wrap(xla_ref),
    }
    for name, fn in cases.items():
        try:
            t = chain_time(fn, q)
            print(f"{name:22s} {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------------------
# Round 2 variants: cut VPU passes over the [L, L] scores.
#   v5  denom via ones-column in V (MXU, free in the D=72->128 lane padding),
#       scale pre-folded into q, exp writes bf16 directly
#   v6  v5 without max subtraction (headroom probe; NOT numerically safe)
#   v7  v5 with exp2
# ---------------------------------------------------------------------------


def kern_v5(q_ref, k_ref, vp_ref, o_ref, *, subtract_max=True, use_exp2=False):
    q = q_ref[0, :, :]          # pre-scaled
    k = k_ref[0, :, :]
    vp = vp_ref[0, :, :]        # [L, D+1], ones in column D
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if subtract_max:
        s = s - jnp.max(s, axis=-1, keepdims=True)
    p = (jnp.exp2(s) if use_exp2 else jnp.exp(s)).astype(vp.dtype)
    op = jax.lax.dot_general(p, vp, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    denom = op[:, D:D + 1]
    o_ref[0, :, :] = (op[:, :D] * pl.reciprocal(denom, approx=False)
                      ).astype(o_ref.dtype)


def make_v5(subtract_max=True, use_exp2=False):
    q_spec = pl.BlockSpec((1, L, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vp_spec = pl.BlockSpec((1, L, D + 1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    params = {"compiler_params": pltpu.CompilerParams(
        dimension_semantics=("parallel",))}
    scale = SCALE * (1.4426950408889634 if use_exp2 else 1.0)

    def fn(qkv):
        q, k, v = qkv
        qs = (q.astype(jnp.float32) * scale).astype(q.dtype)
        vp = jnp.concatenate([v, jnp.ones((N, L, 1), v.dtype)], axis=-1)
        return pl.pallas_call(
            functools.partial(kern_v5, subtract_max=subtract_max,
                              use_exp2=use_exp2),
            out_shape=jax.ShapeDtypeStruct((N, L, D), q.dtype),
            grid=(N,),
            in_specs=[q_spec, q_spec, vp_spec],
            out_specs=q_spec,
            **params,
        )(qs, k, vp)

    return fn


def main2():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (N, L, D), jnp.bfloat16)
    flops = 4 * N * L * L * D
    cases = {
        "v5_onescol": make_v5(True, False),
        "v6_nomax": make_v5(False, False),
        "v7_exp2": make_v5(True, True),
    }
    ref = xla_ref((q, q, q))
    for name, fn in cases.items():
        try:
            out = fn((q, q, q))
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            t = chain_time(lambda q, fn=fn: fn((q, q, q)), q)
            print(f"{name:22s} {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TF/s"
                  f"  maxerr={err:.2e}", flush=True)
        except Exception as e:
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__" and os.environ.get("ROUND2"):
    main2()
