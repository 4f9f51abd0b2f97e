"""Split the decoder up-conv backward into dx / dk and price hand-formed
lowerings against the autodiff of each equivalent formulation.

The custom_vjp in ops/fused_upsample_conv.py currently differentiates the
"resize" reference wholesale (measured grad(x,k) 4.6 / 19.1 / 14.3 ms at the
three decoder geometries, batch 8 -- ~40 TF/s).  Because the op is bilinear
in (x, k), the backward can be hand-formed:

  dx:  conv_transpose of dy_s2d with the polyphase kernel (contraction over
       4*Cout*9 -- fills MXU lanes), then the edge-pad adjoint fold.
  dk:  9 per-tap einsums 'bhwc,bhwd->cd' over (xp shifted, dy_s2d) with the
       huge B*S*S contraction dim, then the tiny compose-kernel adjoint.

Variants measured (batch 8, bf16, chained-readback):
  cur{g}      current custom_vjp pull(dy) (dx+dk together)
  curx{g}     current pull, dx only (dk output discarded -> DCE)
  curk{g}     current pull, dk only
  handk{g}    9-tap einsum dkp + compose adjoint (dk only)
  handx{g}    conv_transpose in s2d layout (dx only)
  hand{g}     both hand forms together

PROBE PITFALL (learned the hard way): fold SQUARED sums of each output into
the chain.  A plain jnp.sum(dx) factors through linear ops — XLA rewrites
sum-of-matmul into rank-1 reductions (sum_cd sum_p x[p,c] dy[p,d] ==
(sum_c x) . (sum_d dy) per position), which made the hand forms look 2-3x
faster than they run in production (8.5 vs the real 21.1 ms at up1).  The
resize form's ConvBackprop ops resisted the rewrite, so only the hand
numbers were fake.  Squaring breaks the factorization.

Usage: python tools/dec_bwd_split.py [parts-csv|all]
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
GEOS = [(64, 320, 256), (128, 320, 128), (256, 128, 64)]


def chain_time(fn, args, steps=4, windows=3):
    """fn(*args) -> scalar; chained with data dependence through EVERY array
    arg (folding into only one lets XLA hoist computations that don't read
    it out of the fori_loop -- measured dx-only collapsing to 0.2 ms)."""

    @jax.jit
    def run(args, n):
        def body(i, a):
            s = fn(*a)
            return tuple(t + (s * 1e-12).astype(t.dtype) for t in a)

        a = jax.lax.fori_loop(0, n, body, args)
        return jnp.sum(a[0][:1].astype(jnp.float32))

    float(run(args, steps))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(args, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def rep(name, secs):
    print(f"{name:36s} {secs*1e3:8.2f} ms", flush=True)


def s2d(y):
    """[B, 2S, 2S, C] -> [B, S, S, 4C] in (py, px, c) phase-major layout."""
    b, h2, w2, c = y.shape
    y = y.reshape(b, h2 // 2, 2, w2 // 2, 2, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, h2 // 2, w2 // 2, 4 * c)


def main():
    from spegnet_tpu.ops import fused_upsample_conv as fuc

    which = (sys.argv[1] if len(sys.argv) > 1 else "all").split(",")

    def want(p):
        return "all" in which or p in which

    key = jax.random.PRNGKey(0)

    for gi, (res, cin, cout) in enumerate(GEOS):
        x = jax.random.normal(key, (B, res, res, cin), DT)
        k = jax.random.normal(key, (3, 3, cin, cout), DT) * 0.05
        dy = jax.random.normal(key, (B, 2 * res, 2 * res, cout), DT)

        def pull_both(x, k, dy):
            _, pull = jax.vjp(fuc._up2c3_resize_ref, x, k)
            dx, dk = pull(dy)
            return (jnp.sum(dx.astype(jnp.float32) ** 2) +
                    jnp.sum(dk.astype(jnp.float32) ** 2))

        def pull_x(x, k, dy):
            _, pull = jax.vjp(fuc._up2c3_resize_ref, x, k)
            dx, dk = pull(dy)
            return jnp.sum(dx.astype(jnp.float32) ** 2)

        def pull_k(x, k, dy):
            _, pull = jax.vjp(fuc._up2c3_resize_ref, x, k)
            dx, dk = pull(dy)
            return jnp.sum(dk.astype(jnp.float32) ** 2)

        # --- hand-formed dk: 9 tap einsums over (xp, dy_s2d) ------------
        def hand_dk(x, k, dy):
            dys = s2d(dy)  # [B, S, S, 4Co]
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
            taps = []
            for u in range(3):
                for v in range(3):
                    xs = xp[:, u:u + res, v:v + res]
                    taps.append(jnp.einsum(
                        "bhwc,bhwd->cd", xs, dys,
                        preferred_element_type=jnp.float32))
            dkp = jnp.stack(taps).reshape(3, 3, cin, 4 * cout)
            # compose-kernel adjoint: kp[u,v,:,4co] came from
            # ke[2u+(1-py), 2v+(1-px)] = sum_{d,e} m[r,d] m[s,e] k3[d,e]
            ku = jnp.asarray(fuc._KU, jnp.float32)
            r = jnp.arange(6)[:, None]
            d = jnp.arange(3)[None, :]
            idx = r - d
            m = jnp.where((idx >= 0) & (idx < 4), ku[jnp.clip(idx, 0, 3)], 0.0)
            dkp = dkp.reshape(3, 3, cin, 2, 2, cout)
            # dke[r, s] with r = 2u + (1 - py), s = 2v + (1 - px)
            dke = jnp.zeros((6, 6, cin, cout), jnp.float32)
            for py in (0, 1):
                for px in (0, 1):
                    dke = dke.at[1 - py::2, 1 - px::2].set(
                        dkp[:, :, :, py, px])
            dk3 = jnp.einsum("rd,se,rsio->deio", m, m, dke)
            return jnp.sum(dk3 ** 2)

        # --- hand-formed dx: conv_transpose of dy_s2d with kp ------------
        def hand_dx(x, k, dy):
            dys = s2d(dy)  # [B, S, S, 4Co]
            ke = fuc._compose_kernel(k.astype(jnp.float32))
            kp = jnp.stack([jnp.stack([
                ke[1 - py::2, 1 - px::2] for px in (0, 1)], 0)
                for py in (0, 1)], 0)
            kp = kp.transpose(2, 3, 4, 0, 1, 5).reshape(
                3, 3, cin, 4 * cout).astype(DT)
            # transpose of conv3x3(xp, kp) VALID on the S grid:
            # dxp = conv(pad(dys, 2), flip(kp) io-swapped)
            kpt = jnp.flip(kp, (0, 1)).transpose(0, 1, 3, 2)  # [3,3,4Co,Ci]
            dxp = jax.lax.conv_general_dilated(
                dys, kpt, (1, 1), [(2, 2), (2, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(DT)
            # edge-pad adjoint: rows/cols 0 and -1 of xp fold inward.
            dx = dxp[:, 1:-1, 1:-1]
            dx = dx.at[:, 0].add(dxp[:, 0, 1:-1])
            dx = dx.at[:, -1].add(dxp[:, -1, 1:-1])
            dx = dx.at[:, :, 0].add(dxp[:, 1:-1, 0])
            dx = dx.at[:, :, -1].add(dxp[:, 1:-1, -1])
            dx = dx.at[:, 0, 0].add(dxp[:, 0, 0])
            dx = dx.at[:, 0, -1].add(dxp[:, 0, -1])
            dx = dx.at[:, -1, 0].add(dxp[:, -1, 0])
            dx = dx.at[:, -1, -1].add(dxp[:, -1, -1])
            return jnp.sum(dx.astype(jnp.float32) ** 2)

        def hand_both(x, k, dy):
            return hand_dk(x, k, dy) + hand_dx(x, k, dy)

        for name, fn in [("cur", pull_both), ("curx", pull_x),
                         ("curk", pull_k), ("handk", hand_dk),
                         ("handx", hand_dx), ("hand", hand_both)]:
            if want(f"{name}{gi}") or want(name):
                rep(f"{name}{gi} {res} {cin}->{cout}",
                    chain_time(fn, (x, k, dy)))


if __name__ == "__main__":
    main()
