"""Golden parity: canvas-vectorized cod_loss vs the reference CODLoss.

The reference loss (utils/loss_functions.py) is pure torch; we execute it
directly with the reference trainer's per-sample resize protocol
(engine/trainer.py:354-394) and require our masked static-canvas math to match.
"""

import importlib.util
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from spegnet_tpu.losses import LossConfig, cod_loss

spec = importlib.util.spec_from_file_location(
    "ref_loss", "/root/reference/utils/loss_functions.py"
)
ref_loss_mod = importlib.util.module_from_spec(spec)
sys.modules["ref_loss"] = ref_loss_mod
spec.loader.exec_module(ref_loss_mod)


def reference_loss(preds_np, edge_np, masks_np, edges_np, cfg: LossConfig):
    """Replicates the trainer's resize-then-loss protocol on the reference."""
    criterion = ref_loss_mod.CODLoss(
        scale_weights=list(cfg.scale_weights),
        boundary_weight=cfg.boundary_weight,
        bce_weight=cfg.bce_weight,
        iou_weight=cfg.iou_weight,
        edge_weight=cfg.edge_weight,
        edge_focal_alpha=cfg.edge_focal_alpha,
        edge_focal_gamma=cfg.edge_focal_gamma,
    )
    b = len(masks_np)
    batch_predictions, batch_edges = [], []
    masks_t = [torch.from_numpy(m)[None] for m in masks_np]  # [1, H, W]
    edges_t = [torch.from_numpy(e)[None] for e in edges_np]
    for i in range(b):
        tgt = masks_t[i].shape[-2:]
        sample_preds = [
            F.interpolate(
                torch.from_numpy(p[i: i + 1]), size=tgt, mode="bilinear",
                align_corners=False,
            )
            for p in preds_np
        ]
        batch_predictions.append(sample_preds)
        batch_edges.append(
            F.interpolate(
                torch.from_numpy(edge_np[i: i + 1]),
                size=edges_t[i].shape[-2:], mode="bilinear", align_corners=False,
            )
        )
    with torch.no_grad():
        out = criterion(batch_predictions, batch_edges, masks_t, edges_t)
    return {k: float(v) for k, v in out.items()}


def make_batch(rng, sizes):
    """Random logits at 3 scales + random blob masks/edges at ragged sizes."""
    b = len(sizes)
    preds = [
        rng.standard_normal((b, 1, 16, 16), dtype=np.float32),
        rng.standard_normal((b, 1, 32, 32), dtype=np.float32),
        rng.standard_normal((b, 1, 64, 64), dtype=np.float32),
    ]
    edge = rng.standard_normal((b, 1, 8, 8), dtype=np.float32)
    masks, edges = [], []
    for h, w in sizes:
        yy, xx = np.mgrid[0:h, 0:w]
        cy, cx = rng.uniform(0.3, 0.7) * h, rng.uniform(0.3, 0.7) * w
        r = rng.uniform(0.15, 0.3) * min(h, w)
        m = (((yy - cy) ** 2 + (xx - cx) ** 2) < r**2).astype(np.float32)
        masks.append(m)
        e = np.zeros_like(m)
        e[1:-1, 1:-1] = (
            (m[1:-1, 1:-1] != m[:-2, 1:-1]) | (m[1:-1, 1:-1] != m[1:-1, :-2])
        ).astype(np.float32)
        edges.append(e)
    return preds, edge, masks, edges


def canvasize(arrs, canvas):
    b = len(arrs)
    out = np.zeros((b, *canvas), np.float32)
    hw = np.zeros((b, 2), np.int32)
    for i, a in enumerate(arrs):
        out[i, : a.shape[0], : a.shape[1]] = a
        hw[i] = a.shape
    return out, hw


def test_cod_loss_parity(rng):
    cfg = LossConfig()  # default.yaml weights
    sizes = [(70, 90), (64, 64), (100, 47)]
    preds, edge, masks, edges = make_batch(rng, sizes)
    ref = reference_loss(preds, edge, masks, edges, cfg)

    canvas = (128, 128)
    masks_c, mask_hw = canvasize(masks, canvas)
    edges_c, edge_hw = canvasize(edges, canvas)
    ours = cod_loss(
        [jnp.asarray(np.transpose(p, (0, 2, 3, 1))) for p in preds],
        jnp.asarray(np.transpose(edge, (0, 2, 3, 1))),
        jnp.asarray(masks_c),
        jnp.asarray(edges_c),
        jnp.asarray(mask_hw),
        jnp.asarray(edge_hw),
        cfg,
    )
    for k in ("loss", "seg_loss", "edge_loss"):
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=2e-4, atol=2e-5)


def test_cod_loss_code_default_weights(rng):
    """Also check with the in-code reference defaults (bce .4/iou .6/λb 5)."""
    cfg = LossConfig(boundary_weight=5.0, bce_weight=0.4, iou_weight=0.6)
    sizes = [(48, 80), (96, 96)]
    preds, edge, masks, edges = make_batch(rng, sizes)
    ref = reference_loss(preds, edge, masks, edges, cfg)
    masks_c, mask_hw = canvasize(masks, (96, 96))
    edges_c, edge_hw = canvasize(edges, (96, 96))
    ours = cod_loss(
        [jnp.asarray(np.transpose(p, (0, 2, 3, 1))) for p in preds],
        jnp.asarray(np.transpose(edge, (0, 2, 3, 1))),
        jnp.asarray(masks_c), jnp.asarray(edges_c),
        jnp.asarray(mask_hw), jnp.asarray(edge_hw), cfg,
    )
    for k in ("loss", "seg_loss", "edge_loss"):
        np.testing.assert_allclose(float(ours[k]), ref[k], rtol=2e-4, atol=2e-5)


def test_cod_loss_grads_finite(rng):
    import jax

    cfg = LossConfig()
    sizes = [(40, 40), (60, 30)]
    preds, edge, masks, edges = make_batch(rng, sizes)
    masks_c, mask_hw = canvasize(masks, (64, 64))
    edges_c, edge_hw = canvasize(edges, (64, 64))

    def f(preds_nhwc, edge_nhwc):
        return cod_loss(
            preds_nhwc, edge_nhwc, jnp.asarray(masks_c), jnp.asarray(edges_c),
            jnp.asarray(mask_hw), jnp.asarray(edge_hw), cfg,
        )["loss"]

    preds_nhwc = [jnp.asarray(np.transpose(p, (0, 2, 3, 1))) for p in preds]
    edge_nhwc = jnp.asarray(np.transpose(edge, (0, 2, 3, 1)))
    grads = jax.grad(f, argnums=(0, 1))(preds_nhwc, edge_nhwc)
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0
