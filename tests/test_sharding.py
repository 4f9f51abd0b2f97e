"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Validates that the full train step compiles and runs under dp and dp x tp
meshes, that TP actually shards the encoder matmul weights, and that
dp-sharded training is numerically equivalent to single-device training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spegnet_tpu.parallel.mesh import create_mesh
from spegnet_tpu.parallel.sharding import param_shardings


def test_mesh_creation():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    m1 = create_mesh({"data": -1})
    assert dict(m1.shape) == {"data": 8}
    m2 = create_mesh({"data": 4, "model": 2})
    assert dict(m2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        create_mesh({"data": 16})


def test_param_shardings_tp():
    from spegnet_tpu.models.hiera import Hiera

    mesh = create_mesh({"data": 4, "model": 2})
    model = Hiera(variant="test")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = {"encoder": model.init(jax.random.PRNGKey(0), x)["params"]}
    shardings = param_shardings(params, mesh)
    # MLP fc1 kernels shard the hidden dim over 'model'.
    s = shardings["encoder"]["block0"]["mlp_fc1"]["kernel"]
    assert s.spec == jax.sharding.PartitionSpec(None, "model")
    s2 = shardings["encoder"]["block0"]["mlp_fc2"]["kernel"]
    assert s2.spec == jax.sharding.PartitionSpec("model", None)
    # Norms replicated.
    assert (
        shardings["encoder"]["block0"]["norm1"]["scale"].spec
        == jax.sharding.PartitionSpec()
    )


def _tiny_config(mesh_spec):
    return {
        "model": {
            "encoder": {"variant": "test"},
            "image_processing": {
                "target_size": 64,
                "normalize_mean": [0.485, 0.456, 0.406],
                "normalize_std": [0.229, 0.224, 0.225],
            },
            "compute_dtype": "float32",
        },
        "training": {
            "num_epochs": 1, "batch_size": 8, "num_workers": 0, "val_ratio": 0.0,
            "canvas_buckets": [64],
            "optimizer": {"learning_rate": 1e-3, "weight_decay": 1e-5,
                          "encoder_lr_ratio": 0.05},
            "scheduler": {"factor": 0.7, "patience": 5, "min_lr": 1e-6},
            "loss": {},
        },
        "parallel": {"mesh": mesh_spec},
    }


def _make_batch(rng, batch=8, size=64):
    from spegnet_tpu.data.pipeline import TrainBatch

    masks = np.zeros((batch, size, size), np.float32)
    masks[:, 16:48, 16:48] = 1.0
    edges = np.zeros_like(masks)
    edges[:, 16, 16:48] = 1.0
    return TrainBatch(
        images=rng.standard_normal((batch, size, size, 3)).astype(np.float32),
        masks=masks, edges=edges,
        mask_hw=np.full((batch, 2), size, np.int32),
        edge_hw=np.full((batch, 2), size, np.int32),
    )


def _run_one_step(mesh_spec, batch, tmp_path):
    from spegnet_tpu.engine.trainer import Trainer
    from spegnet_tpu.parallel.mesh import create_mesh
    from spegnet_tpu.utils.run_manager import DirectoryManager

    dm = DirectoryManager("train", base_dir=str(tmp_path))
    mesh = create_mesh(mesh_spec)
    trainer = Trainer(_tiny_config(mesh_spec), dm, mesh=mesh)
    metrics, _ = trainer._process_train_batch(batch)
    leaf = np.asarray(
        jax.tree_util.tree_leaves(trainer.params)[0], np.float32
    )
    return metrics["loss"], leaf


def test_dp_matches_single_device(rng, tmp_path):
    batch = _make_batch(rng)
    loss_1, leaf_1 = _run_one_step({"data": 1}, batch, tmp_path / "a")
    loss_8, leaf_8 = _run_one_step({"data": 8}, batch, tmp_path / "b")
    assert abs(loss_1 - loss_8) < 1e-5
    np.testing.assert_allclose(leaf_1, leaf_8, atol=1e-5)


def test_dp_tp_mesh_runs(rng, tmp_path):
    batch = _make_batch(rng)
    loss_1, leaf_1 = _run_one_step({"data": 1}, batch, tmp_path / "a")
    loss_tp, leaf_tp = _run_one_step({"data": 4, "model": 2}, batch, tmp_path / "c")
    assert abs(loss_1 - loss_tp) < 1e-4
    np.testing.assert_allclose(leaf_1, leaf_tp, atol=1e-4)


def test_padded_tail_batch(rng, tmp_path):
    """Batch of 5 on a data=8 mesh: padded to 8 with zero sample weights.

    The loss reduction excludes padding rows exactly; train-mode BatchNorm
    statistics still see the duplicated rows, so the losses agree only
    approximately (documented deviation in Trainer._pad_batch)."""
    full = _make_batch(rng, batch=5)
    loss_1, _ = _run_one_step({"data": 1}, full, tmp_path / "a")
    loss_8, _ = _run_one_step({"data": 8}, full, tmp_path / "b")
    assert np.isfinite(loss_8)
    assert abs(loss_1 - loss_8) < 0.1 * max(abs(loss_1), 1.0)


def _make_val_batch(rng, batch=5, size=64):
    import dataclasses

    from spegnet_tpu.data.pipeline import ValBatch
    from spegnet_tpu.metrics.jax_metrics import edt_for_canvas

    tb = _make_batch(rng, batch=batch, size=size)
    dst = np.zeros_like(tb.masks)
    idx = np.zeros(tb.masks.shape, np.int32)
    for j in range(batch):
        dst[j], idx[j] = edt_for_canvas(tb.masks[j], (size, size))
    fields = {f.name: getattr(tb, f.name) for f in dataclasses.fields(tb)}
    return ValBatch(**fields, dst=dst, nearest_idx=idx)


def test_validate_padded_tail_dp(rng, tmp_path):
    """Validation with batch 5 on a data=8 mesh: must pad (device_put with a
    'data' sharding rejects non-divisible leading dims) and the masked metric
    means must equal the single-device result exactly (eval-mode BN: padding
    rows cannot influence real rows)."""
    from spegnet_tpu.engine.trainer import Trainer
    from spegnet_tpu.utils.run_manager import DirectoryManager

    vb = _make_val_batch(rng)

    def run(mesh_spec, sub):
        dm = DirectoryManager("train", base_dir=str(tmp_path / sub))
        mesh = create_mesh(mesh_spec)
        trainer = Trainer(_tiny_config(mesh_spec), dm, mesh=mesh)
        return trainer.validate([vb], 0)

    m1 = run({"data": 1}, "a")
    m8 = run({"data": 8}, "b")
    for k in ("loss", "seg_loss", "edge_loss", "s_alpha", "weighted_f",
              "mae", "e_phi", "mean_f", "edge_mae", "edge_f"):
        np.testing.assert_allclose(m1[k], m8[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
