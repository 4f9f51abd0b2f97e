"""Per-component TPU timing breakdown for the SPEGNet forward pass.

Answers "where do the milliseconds go" with the only timing methodology that
works through the axon tunnel (CLAUDE.md): jitted fori_loop chains with a
data dependency between steps and ONE host readback per window, min over
windows.  All numbers come from the same process so they are comparable.

Usage:  python tools/profile_parts.py [--batch 16] [--steps 8] [--parts a,b]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def chain_time(fn, x, steps: int = 8, windows: int = 3) -> float:
    """Seconds per fn application, free of the tunnel's fixed ~25 ms
    dispatch+readback overhead: time the same compiled chain at n and 3n
    steps and take the slope (the chain carries a data dependency between
    steps, so measured work can't overlap)."""

    @jax.jit
    def run(x, n):
        def body(i, x):
            y = fn(x)
            s = jnp.sum(y.astype(jnp.float32)) * 1e-12
            return x + s.astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x).astype(jnp.float32))

    float(run(x, steps))  # compile + warm

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--parts", type=str, default="")
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    results = {}
    want = set(args.parts.split(",")) if args.parts else None

    def report(name, secs, flops=None):
        results[name] = secs
        line = f"{name:28s} {secs * 1e3:8.2f} ms"
        if flops:
            line += f"  ({flops / secs / 1e12:6.1f} TF/s, {flops / 1e9:.0f} GF)"
        print(line, flush=True)

    def sel(name):
        return want is None or name in want

    from spegnet_tpu.models.hiera import Hiera, MultiScaleBlock
    from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig

    # ---- full model & encoder ------------------------------------------
    if sel("full"):
        model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16"))
        x = jax.random.normal(key, (B, 512, 512, 3), dt)
        variables = jax.jit(model.init)(key, x)

        def full_fn(x):
            return model.apply(variables, x)["predictions"][-1]

        report("full_model", chain_time(full_fn, x, args.steps))

    if sel("encoder"):
        enc = Hiera(variant="large", dtype=dt)
        x = jax.random.normal(key, (B, 512, 512, 3), dt)
        ev = jax.jit(enc.init)(key, x)

        def enc_fn(x):
            return enc.apply(ev, x)[-1]

        report("encoder", chain_time(enc_fn, x, args.steps))

    # ---- per-stage single blocks ---------------------------------------
    # (dim, heads, hw, window, n_blocks_in_stage)
    stages = {
        "s1_block_w8": (144, 2, 128, 8, 2),
        "s2_block_w4": (288, 4, 64, 4, 6),
        "s3_block_global": (576, 8, 32, 0, 3),
        "s3_block_w16": (576, 8, 32, 16, 33),
        "s4_block_w8": (1152, 16, 16, 8, 4),
    }
    for name, (dim, heads, hw, win, nblk) in stages.items():
        if not sel(name):
            continue
        blk = MultiScaleBlock(dim=dim, dim_out=dim, num_heads=heads,
                              window_size=win, dtype=dt)
        xb = jax.random.normal(key, (B, hw, hw, dim), dt)
        vb = jax.jit(blk.init)(key, xb)

        def blk_fn(x, blk=blk, vb=vb):
            return blk.apply(vb, x)

        l = hw * hw if win == 0 else win * win
        n_tok = B * hw * hw
        flops = 2 * n_tok * (dim * 3 * dim + dim * dim + 2 * dim * 4 * dim) \
            + 4 * n_tok * l * dim
        secs = chain_time(blk_fn, xb, args.steps)
        report(name, secs, flops)
        report(f"{name}_x{nblk}", secs * nblk)

    # ---- stage-transition (Q-pooling) blocks ----------------------------
    # (dim_in, dim_out, heads_out, hw_in, window of the NEW stage)
    transitions = {
        "t12": (144, 288, 4, 128, 4),
        "t23": (288, 576, 8, 64, 16),
        "t34": (576, 1152, 16, 32, 8),
    }
    for name, (din, dout, heads, hw, win) in transitions.items():
        if not sel(name):
            continue
        blk = MultiScaleBlock(dim=din, dim_out=dout, num_heads=heads,
                              q_stride=True, window_size=win, dtype=dt)
        xb = jax.random.normal(key, (B, hw, hw, din), dt)
        vb = jax.jit(blk.init)(key, xb)

        def tblk_fn(x, blk=blk, vb=vb):
            return blk.apply(vb, x)

        report(name, chain_time(tblk_fn, xb, args.steps))

    # ---- attention only: pallas vs XLA on stage-3 global shape ----------
    from spegnet_tpu.ops.attention import attention_reference
    from spegnet_tpu.ops.pallas_attention import fused_attention

    for name, l, h, d in (("attn_s3", 1024, 8, 72), ("attn_s4", 256, 16, 72),
                          ("attn_s1w", 64, 2, 72)):
        if not sel(name):
            continue
        # windows fold into batch for the windowed stages
        bb = B if name != "attn_s1w" else B * 256
        q = jax.random.normal(key, (bb, l, h, d), dt)
        flops = 4 * bb * l * l * h * d

        def pfn(q):
            return fused_attention(q, q, q)

        def xfn(q):
            return attention_reference(q, q, q)

        report(f"{name}_pallas", chain_time(pfn, q, args.steps), flops)
        report(f"{name}_xla", chain_time(xfn, q, args.steps), flops)

    # ---- decoder-only (CFI + EFE + PED) ---------------------------------
    if sel("decoder"):
        from spegnet_tpu.models.cfi import AdaptiveAttentionFusion, EfficientASPP
        from spegnet_tpu.models.ped import BoundaryAwareDecoder, EdgeDetectionModule
        import flax.linen as nn

        class DecoderOnly(nn.Module):
            @nn.compact
            def __call__(self, feats):
                fused = AdaptiveAttentionFusion(512, dtype=dt, name="fusion")(feats)
                ctx = EfficientASPP(512, 256, dtype=dt, name="context")(fused)
                edge_map, ef = EdgeDetectionModule(64, dtype=dt, name="edge")(ctx)
                preds = BoundaryAwareDecoder((256, 128, 64), 1, (True, True, False),
                                             dtype=dt, name="dec")(ctx, ef)
                return preds[-1]

        feats = [
            jax.random.normal(key, (B, 64, 64, 288), dt),
            jax.random.normal(key, (B, 32, 32, 576), dt),
            jax.random.normal(key, (B, 16, 16, 1152), dt),
        ]
        dec = DecoderOnly()
        dv = jax.jit(dec.init)(key, feats)

        # chain via the stage2 feature
        def dec_fn(f2):
            return dec.apply(dv, [f2, feats[1], feats[2]])

        report("decoder_cfi_ped", chain_time(dec_fn, feats[0], args.steps))

    # ---- patch embed -----------------------------------------------------
    if sel("patch_embed"):
        from spegnet_tpu.models.hiera import PatchEmbed

        pe = PatchEmbed(144, dtype=dt)
        x = jax.random.normal(key, (B, 512, 512, 3), dt)
        pv = jax.jit(pe.init)(key, x)

        def pe_fn(x):
            return pe.apply(pv, x)

        report("patch_embed", chain_time(pe_fn, x, args.steps),
               2 * B * 128 * 128 * 49 * 3 * 144)

    print("\nsummary (ms):")
    for k, v in results.items():
        print(f"  {k}: {v*1e3:.2f}")


if __name__ == "__main__":
    main()
