"""Two-way interop: export to a reference-schema .pth and re-import losslessly."""

import jax
import jax.numpy as jnp
import numpy as np

from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig
from spegnet_tpu.utils.torch_import import (
    convert_spegnet_state_dict,
    import_checkpoint,
    save_torch_checkpoint,
)


def test_export_import_roundtrip(rng, tmp_path):
    model = SPEGNet(SPEGNetConfig(variant="test"))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    # Perturb batch stats so the round trip actually checks them.
    variables = jax.tree_util.tree_map(
        lambda a: a + 0.01 * np.arange(a.size, dtype=np.float32).reshape(a.shape)
        if a.dtype == jnp.float32 else a,
        variables,
    )

    path = tmp_path / "exported.pth"
    save_torch_checkpoint(
        str(path), variables, config={"model": {"encoder": {"variant": "test"}}},
        epoch=7, metrics={"weighted_f": 0.5},
    )
    reimported, config = import_checkpoint(str(path))
    assert config["model"]["encoder"]["variant"] == "test"

    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = dict(jax.tree_util.tree_flatten_with_path(reimported["params"])[0])
    assert len(flat_a) == len(flat_b)
    for path_key, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path_key]), atol=1e-6,
            err_msg=jax.tree_util.keystr(path_key),
        )
    flat_sa = jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0]
    flat_sb = dict(jax.tree_util.tree_flatten_with_path(reimported["batch_stats"])[0])
    for path_key, leaf in flat_sa:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_sb[path_key]), atol=1e-6,
            err_msg=jax.tree_util.keystr(path_key),
        )


def test_exported_checkpoint_loads_in_torch(rng, tmp_path):
    """The .pth must be a plain torch checkpoint with reference key names."""
    import torch

    model = SPEGNet(SPEGNetConfig(variant="test"))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    path = tmp_path / "exported.pth"
    save_torch_checkpoint(str(path), variables)
    ckpt = torch.load(str(path), map_location="cpu", weights_only=False)
    sd = ckpt["model_state_dict"]
    assert "encoder.encoder.patch_embed.proj.weight" in sd
    assert "fusion.se_block.fc.0.weight" in sd
    assert "decoder.pred_heads.2.weight" in sd
    assert sd["fusion.conv1x1.weight"].shape[2:] == (1, 1)  # OIHW
