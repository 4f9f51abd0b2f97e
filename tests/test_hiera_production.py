"""Golden parity at *production* Hiera-L geometry (reduces the oracle risk of
tests/test_hiera.py, which runs a toy config).

Covers, against the torch oracle, with the real Hiera-Large dimensions
(reference: models/feature_encoding.py:42-57):
  * stage-3 global attention block: 1024 tokens, dim 576, heads 8, head_dim 72
  * stage-3 windowed block: window 16 at 32x32
  * stage-2 -> 3 q-pool transition block: 288 -> 576 with 2x2 Q-pooling
  * stage-1 windowed block: window 8 at 128x128, dim 144 (512^2-input shape)
  * position-embed: bicubic 7x7 background + tiled 8x8 window at 128x128
  * full-trunk 512^2 smoke at the `tiny` variant (pooled-window unpartition
    and pos-embed tiling at real feature-map sizes)
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from spegnet_tpu.models.hiera import HIERA_VARIANTS, Hiera, HieraConfig, MultiScaleBlock
from spegnet_tpu.utils.torch_import import convert_sam2_trunk_state_dict
from tests import torch_hiera_oracle as oracle_mod


def _block_params(tb: torch.nn.Module):
    sd = {k: v.detach().numpy() for k, v in tb.state_dict().items()}
    p = {
        "norm1": {"scale": sd["norm1.weight"], "bias": sd["norm1.bias"]},
        "norm2": {"scale": sd["norm2.weight"], "bias": sd["norm2.bias"]},
        "attn": {
            "qkv": {"kernel": sd["attn.qkv.weight"].T, "bias": sd["attn.qkv.bias"]},
            "proj": {"kernel": sd["attn.proj.weight"].T,
                     "bias": sd["attn.proj.bias"]},
        },
        "mlp_fc1": {"kernel": sd["mlp.layers.0.weight"].T,
                    "bias": sd["mlp.layers.0.bias"]},
        "mlp_fc2": {"kernel": sd["mlp.layers.1.weight"].T,
                    "bias": sd["mlp.layers.1.bias"]},
    }
    if "proj.weight" in sd:
        p["proj"] = {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]}
    import jax

    return jax.tree_util.tree_map(lambda a: jnp.asarray(np.ascontiguousarray(a)), p)


# (name, dim, dim_out, heads, window, hw, q_pool) — real Hiera-L block shapes
# at 512^2 input.
BLOCK_CASES = [
    ("s3_global_L1024_d72", 576, 576, 8, 0, 32, False),
    ("s3_window16", 576, 576, 8, 16, 32, False),
    ("s2_to_s3_qpool", 288, 576, 8, 16, 64, True),
    ("s1_window8_128sq", 144, 144, 2, 8, 128, False),
]


@pytest.mark.parametrize("name,dim,dim_out,heads,window,hw,qpool", BLOCK_CASES)
def test_block_parity_production_geometry(rng, name, dim, dim_out, heads,
                                          window, hw, qpool):
    torch.manual_seed(hash(name) % 2**31)
    tb = oracle_mod.MultiScaleBlock(
        dim=dim, dim_out=dim_out, num_heads=heads,
        q_stride=(2, 2) if qpool else None, window_size=window,
    ).eval()
    with torch.no_grad():
        for p in tb.parameters():
            p.uniform_(-0.05, 0.05)

    jb = MultiScaleBlock(dim=dim, dim_out=dim_out, num_heads=heads,
                         q_stride=qpool, window_size=window)
    params = _block_params(tb)

    x = rng.standard_normal((1, hw, hw, dim), dtype=np.float32) * 0.5
    with torch.no_grad():
        want = tb(torch.from_numpy(x)).numpy()
    got = np.asarray(jb.apply({"params": params}, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_pos_embed_production_tiling():
    """Pos embed at the 512^2-input stage-1 size (128x128): bicubic-resized
    7x7 background + tiled 8x8 window, embed_dim 144 (Hiera-L geometry)."""
    torch.manual_seed(7)
    oracle = oracle_mod.TorchHiera(
        embed_dim=144, num_heads=2, stages=(1, 1, 1, 1),
        window_pos_embed_bkg_spatial_size=(7, 7),
        window_spec=(8, 4, 16, 8), global_att_blocks=(2,),
    ).eval()
    with torch.no_grad():
        oracle.pos_embed.uniform_(-0.5, 0.5)
        oracle.pos_embed_window.uniform_(-0.5, 0.5)
        want = oracle._get_pos_embed((128, 128)).numpy()[0]

    from spegnet_tpu.models.hiera import compute_pos_embed

    bkg = jnp.asarray(oracle.pos_embed.detach().numpy()[0].transpose(1, 2, 0))
    win = jnp.asarray(
        oracle.pos_embed_window.detach().numpy()[0].transpose(1, 2, 0))
    got = np.asarray(compute_pos_embed(bkg, win, (128, 128)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_tiny_variant_512_smoke(rng):
    """Full-trunk parity at a real 512^2 input on the `tiny` variant: catches
    shape-dependent bugs (window padding 128->133 at window 14, pooled-window
    unpartition, pos-embed tiling at 128x128) that toy sizes can't."""
    cfg = HIERA_VARIANTS["tiny"]
    torch.manual_seed(3)
    oracle = oracle_mod.TorchHiera(
        embed_dim=cfg.embed_dim, num_heads=cfg.num_heads, stages=cfg.stages,
        window_pos_embed_bkg_spatial_size=cfg.window_pos_embed_bkg_spatial_size,
        window_spec=cfg.window_spec, global_att_blocks=cfg.global_att_blocks,
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.uniform_(-0.03, 0.03)
    sd = {f"image_encoder.trunk.{k}": v for k, v in oracle.state_dict().items()}
    params = convert_sam2_trunk_state_dict(sd)
    jmod = Hiera(variant="tiny")

    x = rng.standard_normal((1, 3, 512, 512), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref = [o.numpy() for o in oracle(torch.from_numpy(x))]
    ours = jmod.apply({"params": params},
                      jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert [tuple(np.transpose(np.asarray(o), (0, 3, 1, 2)).shape)
            for o in ours] == [tuple(r.shape) for r in ref]
    for got, want in zip(ours, ref):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
