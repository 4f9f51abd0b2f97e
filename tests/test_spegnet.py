"""SPEGNet composition-root tests: output contract + jit-ability."""

import jax
import jax.numpy as jnp
import numpy as np

from spegnet_tpu.models.spegnet import SPEGNet, SPEGNetConfig


def test_forward_contract(rng):
    model = SPEGNet(SPEGNetConfig(variant="test"))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # Output pyramid (reference: models/spegnet.py:198-206): H/4, H/2, H logits
    # plus an H/8 edge map, channels-last.
    assert [tuple(p.shape) for p in out["predictions"]] == [
        (2, 16, 16, 1),
        (2, 32, 32, 1),
        (2, 64, 64, 1),
    ]
    assert out["edge"].shape == (2, 8, 8, 1)
    assert out["features"]["context"].shape == (2, 8, 8, 256)
    assert out["features"]["fused"].shape == (2, 8, 8, 512)
    assert out["features"]["edge_features"].shape == (2, 8, 8, 64)


def test_forward_jits_and_train_mode_updates_bn(rng):
    model = SPEGNet(SPEGNetConfig(variant="test"))
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3), dtype=np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(variables, x):
        return model.apply(variables, x)["predictions"][-1]

    y1 = fwd(variables, x)
    assert y1.shape == (2, 64, 64, 1)

    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    # Train mode must update running statistics.
    old = variables["batch_stats"]["fusion"]["bn"]["mean"]
    new = mutated["batch_stats"]["fusion"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))
