"""On-chip in-process A/B of the unified Morton trunk layout vs the
round-3 window-major layout (SPEGNET_MORTON env, read at trace time), plus
parity between the two fused paths.  Same process + device = comparable
timing through the tunnel (CLAUDE.md).

Usage: python tools/morton_e2e.py [encoder|full] [batch]
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
        os.environ["SPEGNET_MORTON"] = "1"
        f_z = jax.jit(lambda v, x: enc.apply(v, x)[-2])
        os.environ["SPEGNET_MORTON"] = "0"
        f_t = jax.jit(lambda v, x: enc.apply(v, x)[-2] + 0.0)
        a = np.asarray(jax.device_get(f_z(v, x)), np.float32)
        r = np.asarray(jax.device_get(f_t(v, x)), np.float32)
        denom = max(np.abs(r).max(), 1e-6)
        print(f"morton-vs-wmajor encoder maxerr {np.abs(a - r).max():.3e} "
              f"(rel {np.abs(a - r).max() / denom:.3e})", flush=True)
        os.environ["SPEGNET_MORTON"] = "0"
        s_t = chain_time(lambda v, x: enc.apply(v, x)[-1], v, x)
        print(f"wmajor encoder fwd: {s_t*1e3:.2f} ms/batch-{b} "
              f"({b/s_t:.1f} img/s)", flush=True)
        os.environ["SPEGNET_MORTON"] = "1"
        s_z = chain_time(lambda v, x: enc.apply(v, x)[-1] + 0.0, v, x)
        print(f"morton encoder fwd: {s_z*1e3:.2f} ms/batch-{b} "
              f"({b/s_z:.1f} img/s)", flush=True)
    elif which == "grad":
        # Training-side A/B: the Morton transition tail's [B, C, N] einsums
        # are differentiated by XLA, and that form once regressed the train
        # step via giant transposes (ROOFLINE.md "Training") — measure the
        # encoder grad both ways before letting training take the path.
        enc = Hiera(variant="large", dtype=dt)
        v = jax.jit(enc.init)(key, x)

        def make_step(tag):
            os.environ["SPEGNET_MORTON"] = tag

            def loss(v, x):
                out = enc.apply(v, x)
                return sum(jnp.sum(o.astype(jnp.float32)) * 1e-9
                           for o in out[1:])

            g = jax.grad(loss)

            def step(v, x):
                gp = g(v, x)
                s = jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b.astype(jnp.float32)) * 1e-12,
                    gp, jnp.float32(0))
                return x + s.astype(x.dtype)

            return step

        def chain_grad(step, v, x, steps=4, windows=3):
            @jax.jit
            def run(v, x, n):
                x = jax.lax.fori_loop(0, n, lambda i, x: step(v, x), x)
                return jnp.sum(x.astype(jnp.float32))

            float(run(v, x, steps))

            def wall(n):
                best = float("inf")
                for _ in range(windows):
                    t0 = time.time()
                    float(run(v, x, n))
                    best = min(best, time.time() - t0)
                return best

            return (wall(3 * steps) - wall(steps)) / (2 * steps)

        s_t = chain_grad(make_step("0"), v, x)
        print(f"wmajor enc grad: {s_t*1e3:.2f} ms/batch-{b} "
              f"({b/s_t:.1f} img/s)", flush=True)
        s_z = chain_grad(make_step("1"), v, x)
        print(f"morton enc grad: {s_z*1e3:.2f} ms/batch-{b} "
              f"({b/s_z:.1f} img/s)", flush=True)
    else:
        model = SPEGNet(SPEGNetConfig(variant="large",
                                      compute_dtype="bfloat16"))
        v = jax.jit(model.init)(key, x)
        fn = lambda v, x: model.apply(v, x)["predictions"][-1]
        os.environ["SPEGNET_MORTON"] = "1"
        m_z = np.asarray(jax.device_get(jax.jit(fn)(v, x)), np.float32)
        os.environ["SPEGNET_MORTON"] = "0"
        fn0 = lambda v, x: model.apply(v, x)["predictions"][-1] + 0.0
        m_t = np.asarray(jax.device_get(jax.jit(fn0)(v, x)), np.float32)
        sig = lambda a: 1.0 / (1.0 + np.exp(-a))
        print(f"morton-vs-wmajor mask MAE {np.abs(sig(m_z)-sig(m_t)).mean():.3e} "
              f"(logit maxerr {np.abs(m_z - m_t).max():.3e})", flush=True)
        os.environ["SPEGNET_MORTON"] = "0"
        s_t = chain_time(fn0, v, x)
        print(f"wmajor full fwd: {s_t*1e3:.2f} ms/batch-{b} "
              f"({b/s_t:.1f} img/s)", flush=True)
        os.environ["SPEGNET_MORTON"] = "1"
        s_z = chain_time(fn, v, x)
        print(f"morton full fwd: {s_z*1e3:.2f} ms/batch-{b} "
              f"({b/s_z:.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
