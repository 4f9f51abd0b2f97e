"""Per-component TPU timing breakdown for the SPEGNet TRAINING step.

The forward table lives in tools/profile_parts.py / ROOFLINE.md; this tool
builds the backward-side table the round-2 verdict asked for: forward+backward
time of every encoder stage run (fused-kernel backward vs recompute-through-
XLA-reference), the transitions, the decoder, the canvas loss, and the
optimizer update — all with the chained-readback methodology (CLAUDE.md):
jitted fori_loop chains with a data dependency between steps, slope of
(3n - n), min over windows, params passed as jit ARGUMENTS.

Usage:  python tools/train_profile.py [--batch 8] [--steps 4] [--parts a,b]

Parts: step, step_noloss, step_noopt, encoder, stages, transitions, decoder,
       loss, opt, patch
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

RESULTS = {}


def report(name, secs, flops=None):
    RESULTS[name] = secs
    line = f"{name:32s} {secs * 1e3:8.2f} ms"
    if flops:
        line += f"  ({flops / secs / 1e12:6.1f} TF/s)"
    print(line, flush=True)


def chain_time(fn, x, steps: int = 4, windows: int = 3) -> float:
    """Seconds per fn(x)->x' application; fn must map x to a same-shaped
    pytree-leaf used to seed the next step (data dependency)."""

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


def grad_chain_time(f, variables, x, steps: int = 4, windows: int = 3) -> float:
    """Forward+backward seconds per application of f(variables, x)->y.

    Chains on dx; the weight gradients are pulled into the chain through a
    scalar tap so neither path can be dead-code-eliminated."""

    def loss(v, x):
        return jnp.sum(f(v, x).astype(jnp.float32)) * 1e-6

    grad = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def run(v, x, n):
        def body(i, x):
            dv, dx = grad(v, x)
            leaves = jax.tree_util.tree_leaves(dv)
            s = sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            return x + (dx * 1e-9).astype(x.dtype) + (s * 1e-20).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        dv, dx = grad(v, x)
        return jnp.sum(dx.astype(jnp.float32))

    float(run(variables, x, steps))

    def wall(n):
        best = float("inf")
        for _ in range(windows):
            t0 = time.time()
            float(run(variables, x, n))
            best = min(best, time.time() - t0)
        return best

    return (wall(3 * steps) - wall(steps)) / (2 * steps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--parts", type=str, default="")
    ap.add_argument("--backward", type=str, default="",
                    help="force ops.fused_block_t.BACKWARD (kernel|reference)")
    args = ap.parse_args()
    B = args.batch
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    want = set(args.parts.split(",")) if args.parts else None

    def sel(name):
        return want is None or name in want

    if args.backward:
        from spegnet_tpu.ops import fused_block_t as fbt

        fbt.BACKWARD = args.backward

    from spegnet_tpu.models.hiera import Hiera, MultiScaleBlock
    from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
    from spegnet_tpu.losses import LossConfig, cod_loss

    remat_policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable

    # ---- full encoder fwd+bwd (remat, as in big-batch training) -----------
    if sel("encoder"):
        enc = Hiera(variant="large", dtype=dt, remat=True)
        x = jax.random.normal(key, (B, 512, 512, 3), dt)
        ev = jax.jit(enc.init)(key, x)

        def enc_f(v, x):
            outs = enc.apply(v, x)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)[None]

        report("encoder_fwd_bwd", grad_chain_time(
            lambda v, x: enc_f(v, x), ev, x, args.steps))

    # ---- full encoder fwd+bwd, remat OFF (the real batch-8 trainer) -------
    if sel("enc2"):
        enc = Hiera(variant="large", dtype=dt, remat=False)
        x = jax.random.normal(key, (B, 512, 512, 3), dt)
        ev = jax.jit(enc.init)(key, x)

        def enc_f(v, x):
            outs = enc.apply(v, x)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)[None]

        report("encoder_noremat_fwd_bwd", grad_chain_time(
            lambda v, x: enc_f(v, x), ev, x, args.steps))

    # ---- full model grad incl. canvas loss, no optimizer (loss_fn of the
    # trainer's jitted step, device-resident inputs) -------------------------
    if sel("model"):
        model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16"))
        size = 512
        x = jax.random.normal(key, (B, size, size, 3), dt)
        variables = jax.jit(model.init)(key, x)
        params, batch_stats = variables["params"], variables["batch_stats"]
        cfgL = LossConfig()
        masks = jnp.zeros((B, size, size), jnp.float32).at[
            :, 128:384, 128:384].set(1.0)
        edges = jnp.zeros((B, size, size), jnp.float32).at[
            :, 128, 128:384].set(1.0)
        hw = jnp.full((B, 2), size, jnp.int32)

        def model_loss(p, x, bs=batch_stats):
            out, _ = model.apply({"params": p, "batch_stats": bs}, x,
                                 train=True, mutable=["batch_stats"])
            ld = cod_loss(out["predictions"], out["edge"], masks, edges,
                          hw, hw, cfgL)
            return ld["loss"][None]

        report("model_loss_fwd_bwd", grad_chain_time(
            model_loss, params, x, args.steps))

    # ---- per-stage runs fwd+bwd ------------------------------------------
    # name: (dim, heads, hw, window, run_length)
    stages = {
        "s1_run": (144, 2, 128, 8, 2),
        "s2_run": (288, 4, 64, 4, 6),
        "s3w_run14": (576, 8, 32, 16, 14),
        "s3g_run": (576, 8, 32, 0, 3),
        "s4_run": (1152, 16, 16, 8, 4),
    }
    if sel("stages"):
        for name, (dim, heads, hw, win, nblk) in stages.items():
            import flax.linen as nn

            class StageRun(nn.Module):
                @nn.compact
                def __call__(self, x):
                    for i in range(nblk):
                        x = MultiScaleBlock(
                            dim=dim, dim_out=dim, num_heads=heads,
                            window_size=win, dtype=dt, name=f"b{i}")(x)
                    return x

            run_mod = StageRun()
            xb = jax.random.normal(key, (B, hw, hw, dim), dt)
            vb = jax.jit(run_mod.init)(key, xb)

            def f(v, x, m=run_mod):
                return m.apply(v, x)

            l = win * win if win else hw * hw
            n_tok = B * hw * hw
            flops_blk = 2 * n_tok * (dim * 3 * dim + dim * dim + 2 * dim * 4 * dim) \
                + 4 * n_tok * l * dim
            # bwd ~2x fwd flops + recompute => ~3x for reference path
            report(name + "_fwd_bwd", grad_chain_time(f, vb, xb, args.steps),
                   3 * nblk * flops_blk)

    # ---- transitions fwd+bwd ----------------------------------------------
    if sel("transitions"):
        transitions = {
            "t12": (144, 288, 4, 128, 4),
            "t23": (288, 576, 8, 64, 16),
            "t34": (576, 1152, 16, 32, 8),
        }
        for name, (din, dout, heads, hw, win) in transitions.items():
            blk = MultiScaleBlock(dim=din, dim_out=dout, num_heads=heads,
                                  q_stride=True, window_size=win, dtype=dt)
            xb = jax.random.normal(key, (B, hw, hw, din), dt)
            vb = jax.jit(blk.init)(key, xb)

            def f(v, x, m=blk):
                return m.apply(v, x)

            report(name + "_fwd_bwd", grad_chain_time(f, vb, xb, args.steps))

    # ---- patch embed fwd+bwd ----------------------------------------------
    if sel("patch"):
        from spegnet_tpu.models.hiera import PatchEmbed

        pe = PatchEmbed(144, dtype=dt)
        x = jax.random.normal(key, (B, 512, 512, 3), dt)
        pv = jax.jit(pe.init)(key, x)
        report("patch_embed_fwd_bwd", grad_chain_time(
            lambda v, x: pe.apply(v, x), pv, x, args.steps))

    # ---- decoder fwd+bwd ----------------------------------------------------
    if sel("decoder"):
        from spegnet_tpu.models.cfi import AdaptiveAttentionFusion, EfficientASPP
        from spegnet_tpu.models.ped import BoundaryAwareDecoder, EdgeDetectionModule
        import flax.linen as nn

        class DecoderOnly(nn.Module):
            @nn.compact
            def __call__(self, f2):
                feats = [f2,
                         jnp.zeros((B, 32, 32, 576), dt),
                         jnp.zeros((B, 16, 16, 1152), dt)]
                fused = AdaptiveAttentionFusion(512, dtype=dt, name="fusion")(
                    feats, True)
                ctx = EfficientASPP(512, 256, dtype=dt, name="context")(fused, True)
                edge_map, ef = EdgeDetectionModule(64, dtype=dt, name="edge")(
                    ctx, True)
                preds = BoundaryAwareDecoder((256, 128, 64), 1, (True, True, False),
                                             dtype=dt, name="dec")(ctx, ef, True)
                return sum(jnp.sum(p.astype(jnp.float32)) for p in preds)[None] \
                    + jnp.sum(edge_map.astype(jnp.float32))

        f2 = jax.random.normal(key, (B, 64, 64, 288), dt)
        dec = DecoderOnly()
        dv = jax.jit(dec.init)(key, f2)

        def f(v, x):
            out, _ = dec.apply(v, x, mutable=["batch_stats"])
            return out

        report("decoder_fwd_bwd", grad_chain_time(f, dv, f2, args.steps))

    # ---- canvas loss fwd+bwd (w.r.t. prediction logits) --------------------
    if sel("loss"):
        size = 512
        cfgL = LossConfig()
        masks = jnp.zeros((B, size, size), jnp.float32).at[:, 128:384, 128:384].set(1.0)
        edges = jnp.zeros((B, size, size), jnp.float32).at[:, 128, 128:384].set(1.0)
        hw = jnp.full((B, 2), size, jnp.int32)

        def loss_f(preds_flat, _x):
            p0 = preds_flat[:, :128 * 128].reshape(B, 128, 128, 1)
            p1 = preds_flat[:, 128 * 128:128 * 128 + 256 * 256].reshape(B, 256, 256, 1)
            p2 = preds_flat[:, 128 * 128 + 256 * 256:128 * 128 + 256 * 256 + 512 * 512]
            p2 = p2.reshape(B, 512, 512, 1)
            e = preds_flat[:, -64 * 64:].reshape(B, 64, 64, 1)
            ld = cod_loss([p0.astype(dt), p1.astype(dt), p2.astype(dt)],
                          e.astype(dt), masks, edges, hw, hw, cfgL)
            return ld["loss"][None]

        n_flat = 128 * 128 + 256 * 256 + 512 * 512 + 64 * 64
        pf = jax.random.normal(key, (B, n_flat), jnp.float32)

        report("canvas_loss_fwd_bwd", grad_chain_time(
            lambda v, x: loss_f(x, v), jnp.zeros((1,)), pf, args.steps))

    # ---- optimizer update ---------------------------------------------------
    if sel("opt"):
        import optax

        model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16"))
        x0 = jnp.zeros((1, 512, 512, 3), dt)
        variables = jax.jit(model.init)(key, x0)
        params = variables["params"]
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.scale_by_adam(), optax.add_decayed_weights(1e-5),
            optax.scale(-1e-4),
        )
        opt_state = tx.init(params)

        @jax.jit
        def opt_step(params, opt_state, seed):
            grads = jax.tree_util.tree_map(
                lambda p: (p * 1e-6 + seed).astype(p.dtype), params)
            updates, new_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state

        # time by repeated synced steps (the state donation pattern of training)
        p, s = opt_step(params, opt_state, jnp.float32(0.0))
        jax.block_until_ready(p)
        t0 = time.time()
        n = 10
        for i in range(n):
            p, s = opt_step(p, s, jnp.float32(i) * 1e-9)
        float(jax.tree_util.tree_leaves(p)[0].sum())
        report("optimizer_update(sync)", (time.time() - t0) / n)

    # ---- full train step (bench.py --train-only is the canonical number;
    # this variant harness recompiled per step through the remote compile
    # helper and measured nothing useful — removed; the decomposition above
    # plus bench's 1012 ms already rank the costs) ----------------------------
    if False:
        import optax

        model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16",
                                      remat=True))
        size = 512
        x0 = jnp.zeros((1, size, size, 3), dt)
        variables = jax.jit(model.init)(key, x0)
        params, batch_stats = variables["params"], variables["batch_stats"]
        cfgL = LossConfig()
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-4))
        opt_state = tx.init(params)
        masks = np.zeros((B, size, size), np.float32)
        masks[:, 128:384, 128:384] = 1.0
        edges = np.zeros_like(masks)
        edges[:, 128, 128:384] = 1.0
        images = np.random.default_rng(0).standard_normal(
            (B, size, size, 3)).astype(np.float32)
        hw = np.full((B, 2), size, np.int32)
        batch = tuple(map(jnp.asarray, (images, masks, edges, hw, hw)))

        def make_step(with_loss=True, with_opt=True):
            def step(params, batch_stats, opt_state, images, masks, edges,
                     mhw, ehw, seed):
                def loss_fn(p):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": batch_stats},
                        images + seed, train=True, mutable=["batch_stats"])
                    if with_loss:
                        ld = cod_loss(out["predictions"], out["edge"], masks,
                                      edges, mhw, ehw, cfgL)
                        return ld["loss"], mut["batch_stats"]
                    t = sum(jnp.sum(p.astype(jnp.float32))
                            for p in out["predictions"])
                    return t * 1e-9 + jnp.sum(out["edge"].astype(jnp.float32)) * 1e-9, \
                        mut["batch_stats"]

                grads, new_bs = jax.grad(loss_fn, has_aux=True)(params)
                if with_opt:
                    updates, new_opt = tx.update(grads, opt_state, params)
                    new_params = optax.apply_updates(params, updates)
                else:
                    s = sum(jnp.sum(g.astype(jnp.float32))
                            for g in jax.tree_util.tree_leaves(grads))
                    new_params = jax.tree_util.tree_map(
                        lambda p: p + (s * 1e-20).astype(p.dtype), params)
                    new_opt = opt_state
                return new_params, new_bs, new_opt

            return jax.jit(step, donate_argnums=(0, 1, 2))

        def run_step(name, step):
            nonlocal_params = params
            bs, st = batch_stats, opt_state
            nonlocal_params, bs, st = step(nonlocal_params, bs, st, *batch,
                                           jnp.bfloat16(0.0))
            nonlocal_params, bs, st = step(nonlocal_params, bs, st, *batch,
                                           jnp.bfloat16(0.0))
            jax.block_until_ready(nonlocal_params)
            n = 3
            t0 = time.time()
            for i in range(n):
                nonlocal_params, bs, st = step(nonlocal_params, bs, st, *batch,
                                               jnp.bfloat16(i) * jnp.bfloat16(1e-9))
                float(jax.tree_util.tree_leaves(nonlocal_params)[0].sum())
            report(name, (time.time() - t0) / n)

        if sel("step"):
            run_step("train_step_full", make_step(True, True))
        if sel("step_noloss"):
            run_step("train_step_trivial_loss", make_step(False, True))
        if sel("step_noopt"):
            run_step("train_step_no_optimizer", make_step(True, False))

    print("\nsummary (ms):")
    for k, v in RESULTS.items():
        print(f"  {k}: {v*1e3:.2f}")


if __name__ == "__main__":
    main()
