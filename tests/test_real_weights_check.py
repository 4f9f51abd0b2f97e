"""CI leg of the real-SAM2-weights fidelity harness (round-3 verdict
missing #1 / next-round #5): the importer must map EVERY key of the
published sam2.1_hiera_large.pt trunk inventory — all 48 Hiera-L blocks,
the 3 stage-transition projs, both pos embeds — onto the JAX trunk's init
tree bijectively.  The inventory is hard-coded in tools/real_weights_check.py
INDEPENDENTLY of tests/torch_hiera_oracle.py, so a shared misreading of
SAM2's Hiera between the oracle and the JAX trunk fails here."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def test_synthetic_inventory_maps_bijectively():
    from real_weights_check import check_synthetic_inventory

    check_synthetic_inventory()


def test_inventory_counts():
    from real_weights_check import hiera_l_trunk_inventory

    inv = hiera_l_trunk_inventory()
    # 48 blocks x 12 tensors + 3 transitions x 2 proj tensors
    # + pos_embed/pos_embed_window + patch_embed weight/bias.
    assert len(inv) == 48 * 12 + 3 * 2 + 4
    assert inv["pos_embed"] == (1, 144, 7, 7)
    assert inv["pos_embed_window"] == (1, 144, 8, 8)
    for i in (2, 8, 44):  # the three q-pool stage transitions
        assert f"blocks.{i}.proj.weight" in inv
    assert inv["blocks.2.proj.weight"] == (288, 144)
    assert inv["blocks.44.proj.weight"] == (1152, 576)
    assert inv["blocks.47.mlp.layers.0.weight"] == (4608, 1152)


def test_importer_rejects_unknown_trunk_key():
    """Any trunk key the map does not recognize must raise (silent drops are
    how a misread transition would hide)."""
    from spegnet_tpu.utils.torch_import import convert_sam2_trunk_state_dict

    with pytest.raises(ValueError, match="Unmapped SAM2 trunk key"):
        convert_sam2_trunk_state_dict(
            {"image_encoder.trunk.blocks.0.attn.rel_pos_h":
             np.zeros((8, 8), np.float32)}
        )
