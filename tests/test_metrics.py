"""Metric parity: vectorized JAX metrics vs the trusted NumPy oracle.

Also sanity-checks the oracle itself on analytically-known cases, and (when
the py_sod_metrics package is available) cross-checks the oracle against it.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from spegnet_tpu.metrics.jax_metrics import (
    compute_batch_metrics,
    edt_for_canvas,
    quantize_predictions,
)
from spegnet_tpu.metrics.numpy_reference import compute_sample_metrics_np


def blob_mask(rng, h, w, n_blobs=1):
    m = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n_blobs):
        cy, cx = rng.uniform(0.2, 0.8) * h, rng.uniform(0.2, 0.8) * w
        r = rng.uniform(0.1, 0.3) * min(h, w)
        m[((yy - cy) ** 2 + (xx - cx) ** 2) < r**2] = 1.0
    return m


def soft_pred(rng, mask, noise=0.3):
    p = mask + rng.normal(0, noise, mask.shape)
    p = 1 / (1 + np.exp(-4 * (p - 0.5)))
    return (p * 255).astype(np.uint8)


def run_both(samples, canvas):
    """samples: list of (pred_u8 [h,w], gt [h,w] {0,1}).  Returns (jax, np)."""
    b = len(samples)
    hc, wc = canvas
    pred_c = np.zeros((b, hc, wc), np.uint8)
    gt_c = np.zeros((b, hc, wc), np.float32)
    valid = np.zeros((b, hc, wc), np.float32)
    hw = np.zeros((b, 2), np.int32)
    dst = np.zeros((b, hc, wc), np.float32)
    idx = np.zeros((b, hc, wc), np.int32)
    ref = []
    for i, (p, g) in enumerate(samples):
        h, w = g.shape
        pred_c[i, :h, :w] = p
        gt_c[i, :h, :w] = g
        valid[i, :h, :w] = 1.0
        hw[i] = (h, w)
        dst[i], idx[i] = edt_for_canvas(g, canvas)
        ref.append(compute_sample_metrics_np(p, (g * 255).astype(np.uint8)))
    ours = compute_batch_metrics(
        jnp.asarray(pred_c), jnp.asarray(gt_c), jnp.asarray(valid),
        jnp.asarray(hw), jnp.asarray(dst), jnp.asarray(idx),
    )
    ours = {k: np.asarray(v) for k, v in ours.items()}
    return ours, ref


def test_metrics_parity_random_blobs(rng):
    sizes = [(50, 70), (64, 64), (90, 41)]
    samples = []
    for h, w in sizes:
        g = blob_mask(rng, h, w)
        samples.append((soft_pred(rng, g), g))
    ours, ref = run_both(samples, (96, 96))
    for i, r in enumerate(ref):
        for k in ("sm", "wfm", "mae", "em", "fm"):
            assert abs(ours[k][i] - r[k]) < 2e-4, (k, i, ours[k][i], r[k])


def test_metrics_parity_edge_cases(rng):
    h, w = 40, 40
    cases = [
        (np.zeros((h, w), np.uint8), np.zeros((h, w), np.float32)),   # all empty
        (np.full((h, w), 255, np.uint8), np.ones((h, w), np.float32)),  # all fg
        (soft_pred(rng, np.zeros((h, w), np.float32)), np.zeros((h, w), np.float32)),
        (soft_pred(rng, np.ones((h, w), np.float32)), np.ones((h, w), np.float32)),
        (np.full((h, w), 128, np.uint8), blob_mask(rng, h, w)),        # constant pred
        ((blob_mask(rng, h, w) * 255).astype(np.uint8), blob_mask(rng, h, w)),  # binary pred
    ]
    ours, ref = run_both(cases, (64, 64))
    for i, r in enumerate(ref):
        for k in ("sm", "wfm", "mae", "em", "fm"):
            assert abs(ours[k][i] - r[k]) < 2e-4, (k, i, ours[k][i], r[k])


def test_perfect_prediction_scores():
    rng = np.random.default_rng(7)
    g = blob_mask(rng, 60, 60)
    p = (g * 255).astype(np.uint8)
    r = compute_sample_metrics_np(p, (g * 255).astype(np.uint8))
    assert r["mae"] == 0.0
    assert r["sm"] > 0.95
    assert r["wfm"] > 0.99
    assert r["em"] > 0.99


def test_quantize_matches_torch_byte():
    import torch

    logits = np.linspace(-6, 6, 1000, dtype=np.float32)
    ours = np.asarray(quantize_predictions(jnp.asarray(logits)))
    ref = (torch.sigmoid(torch.from_numpy(logits)) * 255).byte().numpy()
    # Allow off-by-one on exact bin boundaries from f32 sigmoid differences.
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 1
    assert (ours != ref).mean() < 0.01


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("py_sod_metrics"),
    reason="py_sod_metrics not installed",
)
def test_oracle_vs_pysod(rng):
    from py_sod_metrics import MAE, Emeasure, Fmeasure, Smeasure, WeightedFmeasure

    g = blob_mask(rng, 64, 80)
    p = soft_pred(rng, g)
    gu = (g * 255).astype(np.uint8)
    r = compute_sample_metrics_np(p, gu)
    for name, metric, key, get in [
        ("sm", Smeasure(), "sm", lambda d: d["sm"]),
        ("wfm", WeightedFmeasure(), "wfm", lambda d: d["wfm"]),
        ("mae", MAE(), "mae", lambda d: d["mae"]),
        ("em", Emeasure(), "em", lambda d: d["em"]["adp"]),
        ("fm", Fmeasure(), "fm", lambda d: d["fm"]["curve"].mean()),
    ]:
        metric.step(pred=p, gt=gu)
        assert abs(get(metric.get_results()) - r[name]) < 1e-8, name
