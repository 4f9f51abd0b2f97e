"""Golden parity tests: JAX Hiera encoder vs the torch oracle.

Uses a small custom config (2 blocks per stage, one global block, q-pooling
transitions) so the oracle runs fast on 1 CPU core while still covering every
structural mechanism: windowed attention, global attention, q-pooling with
skip projection, stage transitions, position embedding tiling + bicubic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from spegnet_tpu.models.hiera import HIERA_VARIANTS, Hiera, HieraConfig
from spegnet_tpu.utils.torch_import import convert_sam2_trunk_state_dict
from tests.torch_hiera_oracle import TorchHiera

SMALL = HieraConfig(
    embed_dim=8,
    num_heads=1,
    stages=(1, 2, 3, 1),
    global_att_blocks=(4,),
    window_pos_embed_bkg_spatial_size=(7, 7),
    window_spec=(8, 4, 4, 2),
)


def make_pair(seed=0):
    torch.manual_seed(seed)
    oracle = TorchHiera(
        embed_dim=SMALL.embed_dim,
        num_heads=SMALL.num_heads,
        stages=SMALL.stages,
        window_pos_embed_bkg_spatial_size=SMALL.window_pos_embed_bkg_spatial_size,
        window_spec=SMALL.window_spec,
        global_att_blocks=SMALL.global_att_blocks,
    ).eval()
    with torch.no_grad():
        for p in oracle.parameters():
            p.uniform_(-0.2, 0.2)
    HIERA_VARIANTS["_test_small"] = SMALL
    jmod = Hiera(variant="_test_small")
    sd = {f"image_encoder.trunk.{k}": v for k, v in oracle.state_dict().items()}
    params = convert_sam2_trunk_state_dict(sd)
    return oracle, jmod, params


def test_hiera_parity(rng):
    oracle, jmod, params = make_pair()
    x = rng.standard_normal((1, 3, 64, 64), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref = [o.numpy() for o in oracle(torch.from_numpy(x))]
    ours = jmod.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(ours) == 4
    for got, want in zip(ours, ref):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_hiera_parity_nonsquare(rng):
    oracle, jmod, params = make_pair(seed=1)
    x = rng.standard_normal((2, 3, 64, 96), dtype=np.float32) * 0.5
    with torch.no_grad():
        ref = [o.numpy() for o in oracle(torch.from_numpy(x))]
    ours = jmod.apply({"params": params}, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    for got, want in zip(ours, ref):
        got = np.transpose(np.asarray(got), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_large_variant_shapes():
    """Shape contract of the Hiera-Large pyramid at 512^2
    (reference: models/feature_encoding.py:250-256) via eval_shape (no FLOPs)."""
    jmod = Hiera(variant="large")
    x = jax.ShapeDtypeStruct((1, 512, 512, 3), jnp.float32)
    variables = jax.eval_shape(jmod.init, jax.random.PRNGKey(0), x)
    out = jax.eval_shape(jmod.apply, variables, x)
    shapes = [tuple(o.shape) for o in out]
    assert shapes == [
        (1, 128, 128, 144),
        (1, 64, 64, 288),
        (1, 32, 32, 576),
        (1, 16, 16, 1152),
    ]
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    # SAM2.1 Hiera-L trunk is ~212M parameters.
    assert 205e6 < n_params < 220e6, n_params
