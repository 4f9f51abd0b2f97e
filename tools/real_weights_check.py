"""Real-SAM2-weights fidelity harness (round-3 verdict missing #1).

The reference's encoder IS the external sam2 package's Hiera trunk
(reference: models/feature_encoding.py:107,156-159), and its headline is the
accuracy table (reference README.md:55-57).  No datasets or checkpoints exist
in this build environment, so this harness is built NOW, ready to run the
moment `sam2.1_hiera_large.pt` is available:

  mode 1 (no args — runs in CI, tests/test_real_weights_check.py):
      Build a synthetic state_dict with the EXACT published
      sam2.1_hiera_large.pt trunk key inventory — all 48 Hiera-L blocks,
      the 3 stage-transition `proj` keys (blocks 2/8/44), both pos embeds —
      with the published shapes, hard-coded here INDEPENDENTLY of
      tests/torch_hiera_oracle.py (so a shared misreading of SAM2's Hiera
      between the oracle and the JAX trunk cannot hide).  Assert that
      utils/torch_import.py maps EVERY key and that the resulting tree
      matches jax.eval_shape of the JAX Hiera-L init exactly (no missing,
      no unexpected, no shape-mismatched leaves).

  mode 2 (--ckpt sam2.1_hiera_large.pt [--acts acts.npz]):
      Import the real checkpoint (full key-map coverage enforced by the
      importer), run the JAX trunk, and compare per-stage activations
      against torch: either live (sam2 package importable) or against an
      .npz previously saved with --save-acts on a machine that has sam2.

  mode 3 (--ckpt ... --parity):
      Re-run the bench.py e2e sigmoid-mask parity gate with the IMPORTED
      encoder weights (BASELINE.md <=1e-3 MAE north-star is defined on real
      weights; PARITY.md #10 holds the line that bf16 drift must be
      re-measured when real weights exist).

Usage:
  python tools/real_weights_check.py                      # CI inventory check
  python tools/real_weights_check.py --ckpt sam2.1_hiera_large.pt
  python tools/real_weights_check.py --ckpt ... --save-acts acts.npz  # torch side
  python tools/real_weights_check.py --ckpt ... --acts acts.npz       # JAX side
  python tools/real_weights_check.py --ckpt ... --parity
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# ---------------------------------------------------------------------------
# Published sam2.1_hiera_large.pt trunk inventory (independent of the repo's
# torch oracle).  Hiera-L: embed_dim 144, 2 heads, stages [2, 6, 36, 4],
# dim_mul 2 at each stage transition, MLP ratio 4, background pos embed
# [1, 144, 7, 7], window pos embed [1, 144, 8, 8], patch embed 7x7.
# Block dims: a block's dim_out doubles at the FIRST block of stages 2-4
# (global indices 2, 8, 44), which are also the only blocks carrying the
# skip-projection `proj` (torch Hiera: `if dim != dim_out: self.proj`).
# ---------------------------------------------------------------------------

_EMBED = 144
_STAGES = (2, 6, 36, 4)
_MLP_RATIO = 4


def hiera_l_trunk_inventory() -> dict:
    """{key: shape} for every image_encoder.trunk.* tensor in the published
    sam2.1_hiera_large.pt checkpoint."""
    inv = {
        "pos_embed": (1, _EMBED, 7, 7),
        "pos_embed_window": (1, _EMBED, 8, 8),
        "patch_embed.proj.weight": (_EMBED, 3, 7, 7),
        "patch_embed.proj.bias": (_EMBED,),
    }
    stage_firsts = {sum(_STAGES[:i]) for i in range(1, len(_STAGES))}  # {2,8,44}
    dim = _EMBED
    for i in range(sum(_STAGES)):
        dout = dim * 2 if i in stage_firsts else dim
        b = f"blocks.{i}."
        inv[b + "norm1.weight"] = (dim,)
        inv[b + "norm1.bias"] = (dim,)
        inv[b + "attn.qkv.weight"] = (3 * dout, dim)
        inv[b + "attn.qkv.bias"] = (3 * dout,)
        inv[b + "attn.proj.weight"] = (dout, dout)
        inv[b + "attn.proj.bias"] = (dout,)
        inv[b + "norm2.weight"] = (dout,)
        inv[b + "norm2.bias"] = (dout,)
        inv[b + "mlp.layers.0.weight"] = (_MLP_RATIO * dout, dout)
        inv[b + "mlp.layers.0.bias"] = (_MLP_RATIO * dout,)
        inv[b + "mlp.layers.1.weight"] = (dout, _MLP_RATIO * dout)
        inv[b + "mlp.layers.1.bias"] = (dout,)
        if i in stage_firsts:
            inv[b + "proj.weight"] = (dout, dim)
            inv[b + "proj.bias"] = (dout,)
        dim = dout
    return inv


def check_synthetic_inventory(seed: int = 0) -> None:
    """CI mode: full key-map coverage + structural equality with the JAX
    trunk's init tree, on the synthetic inventory."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from spegnet_tpu.models.hiera import Hiera
    from spegnet_tpu.utils.torch_import import (
        convert_sam2_trunk_state_dict,
        validate_against,
    )

    inv = hiera_l_trunk_inventory()
    n_blocks = sum(_STAGES)
    n_proj = len(_STAGES) - 1
    expect_keys = n_blocks * 12 + n_proj * 2 + 4
    assert len(inv) == expect_keys, (len(inv), expect_keys)

    rng = np.random.default_rng(seed)
    state_dict = {
        "image_encoder.trunk." + k: rng.standard_normal(shape).astype(np.float32)
        for k, shape in inv.items()
    }
    # Real checkpoints also carry neck/memory/decoder keys the importer must
    # ignore without error:
    state_dict["image_encoder.neck.convs.0.conv.weight"] = np.zeros(
        (256, 144, 1, 1), np.float32)
    state_dict["memory_encoder.fuser.layers.0.gamma"] = np.zeros(
        (256,), np.float32)

    params = convert_sam2_trunk_state_dict(state_dict)

    model = Hiera(variant="large", dtype=jnp.float32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    validate_against(params, shapes["params"])
    print(f"synthetic inventory OK: {len(inv)} trunk keys "
          f"({n_blocks} blocks, {n_proj} transition projs) all mapped; "
          "tree == Hiera-L init (no missing/unexpected/mismatched leaves)")


def import_real(ckpt: str):
    import jax
    import jax.numpy as jnp

    from spegnet_tpu.models.hiera import Hiera
    from spegnet_tpu.utils.torch_import import (
        convert_sam2_trunk_state_dict,
        load_torch_checkpoint,
        validate_against,
    )

    raw = load_torch_checkpoint(ckpt)
    sd = raw["model"] if "model" in raw else raw
    trunk_keys = [k for k in sd if k.startswith("image_encoder.trunk.")]
    print(f"checkpoint: {len(sd)} keys, {len(trunk_keys)} trunk keys")
    params = convert_sam2_trunk_state_dict(sd)

    model = Hiera(variant="large", dtype=jnp.float32)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 64, 64, 3), jnp.float32),
    )
    validate_against(params, shapes["params"])
    print("key-map coverage OK (bijective, shapes match)")
    return model, {"params": params}


def save_torch_acts(ckpt: str, out: str, size: int = 512, seed: int = 7):
    """Run the torch SAM2 trunk (requires the sam2 package) on a fixed input
    and save input + per-stage activations.  Run this on the machine that
    has sam2; feed the .npz to --acts here."""
    import torch
    from sam2.build_sam import build_sam2  # noqa: external dependency

    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, 3, size, size)).astype(np.float32)
    sam2 = build_sam2(None, ckpt, apply_postprocessing=False, device="cpu")
    trunk = sam2.image_encoder.trunk.eval()
    with torch.no_grad():
        feats = trunk(torch.from_numpy(x))
    np.savez(out, x=x, **{f"s{i}": f.numpy() for i, f in enumerate(feats)})
    print(f"saved input + {len(feats)} stage activations to {out}")


def compare_acts(ckpt: str, acts: str):
    """Per-stage activation agreement: JAX trunk (f32, decomposed path) vs
    the saved torch activations."""
    import jax
    import jax.numpy as jnp

    model, variables = import_real(ckpt)
    data = np.load(acts)
    x = np.transpose(data["x"], (0, 2, 3, 1))  # NCHW -> NHWC
    feats = jax.jit(model.apply)(variables, jnp.asarray(x))
    worst = 0.0
    for i, f in enumerate(feats):
        ref = np.transpose(data[f"s{i}"], (0, 2, 3, 1))
        got = np.asarray(f, np.float32)
        mae = float(np.abs(got - ref).mean())
        rel = mae / (float(np.abs(ref).mean()) + 1e-12)
        worst = max(worst, rel)
        print(f"stage {i + 1}: MAE {mae:.3e}  rel {rel:.3e}  shape {got.shape}")
    assert worst < 1e-3, f"stage activation drift {worst:.3e} exceeds 1e-3"
    print("activation agreement OK (rel MAE < 1e-3 every stage)")


def mask_parity(ckpt: str):
    """bench.py's e2e sigmoid-mask parity gate with IMPORTED encoder weights:
    fused bf16 path vs decomposed f32 path, same process/device."""
    import jax
    import jax.numpy as jnp

    import spegnet_tpu.ops.attention as attmod
    from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
    from spegnet_tpu.utils.torch_import import import_checkpoint

    fast_model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="bfloat16"))
    x0 = jnp.zeros((1, 512, 512, 3), jnp.bfloat16)
    variables = jax.jit(fast_model.init)(jax.random.PRNGKey(0), x0)
    imported, _ = import_checkpoint(ckpt)
    enc = imported["params"].get("encoder")
    assert enc, "checkpoint has no encoder subtree"
    params = dict(variables["params"])
    params["encoder"] = jax.tree_util.tree_map(jnp.asarray, enc)
    variables = dict(variables, params=params)

    x = jax.random.normal(jax.random.PRNGKey(7), (4, 512, 512, 3), jnp.float32)

    @jax.jit
    def fast(v, x):
        return jax.nn.sigmoid(
            fast_model.apply(v, x.astype(jnp.bfloat16))["predictions"][-1]
            .astype(jnp.float32))

    a = np.asarray(jax.device_get(fast(variables, x)))

    ref_model = SPEGNet(SPEGNetConfig(variant="large", compute_dtype="float32"))
    old = attmod.USE_PALLAS
    attmod.USE_PALLAS = "0"
    try:
        @jax.jit
        def ref(v, x):
            return jax.nn.sigmoid(
                ref_model.apply(v, x)["predictions"][-1].astype(jnp.float32))

        r = np.asarray(jax.device_get(ref(variables, x)))
    finally:
        attmod.USE_PALLAS = old
    d = np.abs(a - r)
    print(f"e2e mask parity with REAL weights: MAE {d.mean():.3e} "
          f"max {d.max():.3e}")
    assert d.mean() <= 1e-3, "BASELINE.md <=1e-3 MAE gate FAILED on real weights"
    print("mask parity OK (<= 1e-3 MAE, real weights)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", help="sam2.1_hiera_large.pt (or SPEGNet .pth)")
    ap.add_argument("--acts", help=".npz of torch activations (from --save-acts)")
    ap.add_argument("--save-acts", help="write torch activations npz (needs sam2)")
    ap.add_argument("--parity", action="store_true",
                    help="run the e2e mask-parity gate with imported weights")
    args = ap.parse_args()
    if not args.ckpt:
        check_synthetic_inventory()
        return
    if args.save_acts:
        save_torch_acts(args.ckpt, args.save_acts)
        return
    if args.acts:
        compare_acts(args.ckpt, args.acts)
    else:
        import_real(args.ckpt)
    if args.parity:
        mask_parity(args.ckpt)


if __name__ == "__main__":
    main()
