"""On-chip end-to-end A/B: the integrated fast paths (fused kernels, T-layout,
patch-embed lowering) vs the decomposed XLA path (USE_PALLAS=0), same process
and device — the only comparable method through the tunnel (CLAUDE.md).
Reports forward parity and chained-timing for encoder and full model.
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


def chain_time(fn, v, x, steps=8, windows=3):
    """fn(v, x): variables passed as ARGUMENTS (a closure would bake ~850 MB
    of parameter constants into the uploaded program — HTTP 413 through the
    remote-compile tunnel)."""
    @jax.jit
    def run(v, x, n):
        def body(i, x):
            y = fn(v, x)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + s.astype(x.dtype)
        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(v, x).astype(jnp.float32))

    float(run(v, x, steps))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(v, x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    import spegnet_tpu.ops.attention as attmod
    from spegnet_tpu.models.hiera import Hiera
    from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig

    which = sys.argv[1] if len(sys.argv) > 1 else "encoder"
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (b, 512, 512, 3), dt)

    if which == "encoder":
        enc = Hiera(variant="large", dtype=dt)
        v = jax.jit(enc.init)(key, x)
        fast = jax.jit(lambda v, x: enc.apply(v, x)[-2])
        a = np.asarray(jax.device_get(fast(v, x))).astype(np.float32)
        old = attmod.USE_PALLAS
        attmod.USE_PALLAS = "0"
        ref_f = jax.jit(lambda v, x: enc.apply(v, x)[-2] + 0.0)
        r = np.asarray(jax.device_get(ref_f(v, x))).astype(np.float32)
        attmod.USE_PALLAS = old
        denom = max(np.abs(r).max(), 1e-6)
        print(f"encoder A/B maxerr {np.abs(a - r).max():.3e} "
              f"(rel {np.abs(a - r).max() / denom:.3e})", flush=True)
        secs = chain_time(lambda v, x: enc.apply(v, x)[-1], v, x)
        print(f"encoder fwd: {secs*1e3:.2f} ms/batch-{b} "
              f"({b/secs:.1f} img/s)", flush=True)
    elif which == "int8":
        # W8A8 encoder (flagged mode) vs bf16, same process/device: full-
        # model time A/B and sigmoid-mask MAE between the two paths.
        bf = SPEGNet(SPEGNetConfig(variant="large",
                                   compute_dtype="bfloat16"))
        q = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16",
                                  int8_encoder=True))
        v = jax.jit(bf.init)(key, x)
        fn_bf = lambda v, x: bf.apply(v, x)["predictions"][-1]
        fn_q = lambda v, x: q.apply(v, x)["predictions"][-1]
        m_bf = np.asarray(jax.device_get(jax.jit(fn_bf)(v, x)),
                          np.float32)
        m_q = np.asarray(jax.device_get(jax.jit(fn_q)(v, x)), np.float32)
        sig = lambda a: 1.0 / (1.0 + np.exp(-a))
        mae = np.abs(sig(m_q) - sig(m_bf)).mean()
        print(f"int8-vs-bf16 sigmoid-mask MAE {mae:.3e} "
              f"(logit maxerr {np.abs(m_q - m_bf).max():.3e})", flush=True)
        s_bf = chain_time(fn_bf, v, x)
        print(f"bf16 full fwd: {s_bf*1e3:.2f} ms/batch-{b} "
              f"({b/s_bf:.1f} img/s)", flush=True)
        s_q = chain_time(fn_q, v, x)
        print(f"int8 full fwd: {s_q*1e3:.2f} ms/batch-{b} "
              f"({b/s_q:.1f} img/s)", flush=True)
    else:
        model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16"))
        v = jax.jit(model.init)(key, x)
        fn = lambda v, x: model.apply(v, x)["predictions"][-1]
        secs = chain_time(fn, v, x)
        print(f"full fwd: {secs*1e3:.2f} ms/batch-{b} "
              f"({b/secs:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
