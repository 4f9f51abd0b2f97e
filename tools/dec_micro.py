"""Decoder sub-part timing on the v5e: CFI fusion, e-ASPP, EFE, each PED
DecoderBlock, the prediction heads, and op-level A/Bs for the fused
upsample+conv (composed lhs-dilated conv vs naive resize+conv vs the border
strip paste alone).  Same chained-timing methodology as profile_parts.
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


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "blocks"
    b = 16
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    if which == "blocks":
        from spegnet_tpu.models.cfi import AdaptiveAttentionFusion, EfficientASPP
        from spegnet_tpu.models.ped import BoundaryAwareDecoder, EdgeDetectionModule, DecoderBlock
        import flax.linen as nn

        feats = [
            jax.random.normal(key, (b, 64, 64, 288), dt),
            jax.random.normal(key, (b, 32, 32, 576), dt),
            jax.random.normal(key, (b, 16, 16, 1152), dt),
        ]
        fusion = AdaptiveAttentionFusion(512, dtype=dt)
        fv = jax.jit(fusion.init)(key, feats)
        print(f"fusion : {chain_time(lambda f0: fusion.apply(fv, [f0, feats[1], feats[2]]), feats[0])*1e3:7.2f} ms", flush=True)

        xf = jax.random.normal(key, (b, 64, 64, 512), dt)
        aspp = EfficientASPP(512, 256, dtype=dt)
        av = jax.jit(aspp.init)(key, xf)
        print(f"aspp   : {chain_time(lambda x: aspp.apply(av, x), xf)*1e3:7.2f} ms", flush=True)

        xc = jax.random.normal(key, (b, 64, 64, 256), dt)
        edge = EdgeDetectionModule(64, dtype=dt)
        ev = jax.jit(edge.init)(key, xc)
        print(f"edge   : {chain_time(lambda x: edge.apply(ev, x)[1], xc)*1e3:7.2f} ms", flush=True)

        ef = jax.random.normal(key, (b, 64, 64, 64), dt)
        specs = [  # (in_res, cin, cout, with_edge)
            (64, 256, 256, True),
            (128, 256, 128, True),
            (256, 128, 64, False),
        ]
        for i, (res, cin, cout, we) in enumerate(specs):
            xd = jax.random.normal(key, (b, res, res, cin), dt)
            blk = DecoderBlock(cout, in_features=cin, edge_features_ch=(64 if we else 0), dtype=dt)
            args = (xd, ef) if we else (xd,)
            bv = jax.jit(blk.init)(key, *args)
            if we:
                t = chain_time(lambda x: blk.apply(bv, x, ef), xd)
            else:
                t = chain_time(lambda x: blk.apply(bv, x), xd)
            flops = 2 * b * (2 * res) ** 2 * 9 * ((cin + (64 if we else 0)) * cout + cout * cout)
            print(f"dec{i}   : {t*1e3:7.2f} ms  ({flops/t/1e12:5.1f} TF/s, {flops/1e9:.0f} GF)", flush=True)

    elif which == "ops":
        from spegnet_tpu.ops.fused_upsample_conv import upsample2x_conv3x3, _compose_kernel, _conv
        from spegnet_tpu.ops.resize import resize_bilinear

        for res, cin, cout in ((64, 256, 256), (128, 320, 128), (256, 128, 64)):
            x = jax.random.normal(key, (b, res, res, cin), dt)
            k = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05

            t_f = chain_time(lambda x: upsample2x_conv3x3(x, k.astype(dt)), x)
            t_n = chain_time(lambda x: _conv(
                resize_bilinear(x, (2 * res, 2 * res)), k.astype(dt),
                [(1, 1), (1, 1)]).astype(dt), x)

            ke = _compose_kernel(k).astype(dt)
            t_core = chain_time(lambda x: _conv(
                jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
                ke, [(1, 1), (1, 1)], lhs_dilation=(2, 2)).astype(dt), x)

            flops = 2 * b * (2 * res) ** 2 * 9 * cin * cout
            print(f"up+conv {res}->{2*res} {cin}->{cout}: fused {t_f*1e3:6.2f} "
                  f"naive {t_n*1e3:6.2f} core {t_core*1e3:6.2f} ms "
                  f"({flops/t_core/1e12:5.1f} TF/s core)", flush=True)


if __name__ == "__main__":
    main()


def poly():
    """Polyphase (s2d-output) composed upsample+conv vs the lhs-dilated
    composed conv, core math only (no border handling)."""
    from spegnet_tpu.ops.fused_upsample_conv import _compose_kernel, _conv

    b = 16
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    for res, cin, cout in ((64, 320, 256), (128, 320, 128), (256, 128, 64)):
        x = jax.random.normal(key, (b, res, res, cin), dt)
        k = jax.random.normal(key, (3, 3, cin, cout), jnp.float32) * 0.05
        ke = _compose_kernel(k)  # [6, 6, cin, cout] f32

        t_core = chain_time(lambda x: _conv(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
            ke.astype(dt), [(1, 1), (1, 1)], lhs_dilation=(2, 2)).astype(dt), x)

        # phase kernels: P[phi_y,phi_x][u,v] = K6[2u+1-phi_y, 2v+1-phi_x]
        kp = jnp.stack([jnp.stack([
            ke[1 - py::2, 1 - px::2] for px in (0, 1)], 0) for py in (0, 1)], 0)
        # [2, 2, 3, 3, cin, cout] -> [3, 3, cin, 4*cout] channels (py, px, c)
        kp = kp.transpose(2, 3, 4, 0, 1, 5).reshape(3, 3, cin, 4 * cout)

        t_poly = chain_time(lambda x: _conv(
            jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge"),
            kp.astype(dt), [(0, 0), (0, 0)]).astype(dt), x)

        flops = 2 * b * (2 * res) ** 2 * 9 * cin * cout
        print(f"{res}->{2*res} {cin}->{cout}: lhsdil {t_core*1e3:6.2f} ms "
              f"({flops/t_core/1e12:5.1f} TF/s)  poly {t_poly*1e3:6.2f} ms "
              f"({flops/t_poly/1e12:5.1f} TF/s)", flush=True)


if len(sys.argv) > 1 and sys.argv[1] == "poly":
    poly()
