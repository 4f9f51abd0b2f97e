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


def test_oracle_vs_external_anchor(rng):
    """The oracle must agree with an external anchor — NEVER silently skipped
    (round-1 verdict item #3).  Preferred anchor: the real py_sod_metrics
    library (the one the reference uses, utils/metrics.py:84-86).  Where that
    package cannot be installed (offline environment), the anchor is
    tests/third_party/pysod_port.py — an independent from-the-papers
    implementation with deliberately different algorithmic formulations
    (explicit threshold loop, full E-measure alignment matrix), so shared
    transcription bugs can't cancel."""
    import importlib.util
    import warnings

    cases = []
    for h, w in ((64, 80), (57, 43)):
        g = blob_mask(rng, h, w)
        cases.append((soft_pred(rng, g), (g * 255).astype(np.uint8)))
    # degenerate cases too
    cases.append((np.zeros((32, 32), np.uint8), np.zeros((32, 32), np.uint8)))
    cases.append((np.full((32, 32), 200, np.uint8),
                  np.full((32, 32), 255, np.uint8)))

    if importlib.util.find_spec("py_sod_metrics"):
        from py_sod_metrics import MAE, Emeasure, Fmeasure, Smeasure, WeightedFmeasure

        def anchor(p, gu):
            out = {}
            for name, metric, get in [
                ("sm", Smeasure(), lambda d: d["sm"]),
                ("wfm", WeightedFmeasure(), lambda d: d["wfm"]),
                ("mae", MAE(), lambda d: d["mae"]),
                ("em", Emeasure(), lambda d: d["em"]["adp"]),
                ("fm", Fmeasure(), lambda d: d["fm"]["curve"].mean()),
            ]:
                metric.step(pred=p, gt=gu)
                out[name] = get(metric.get_results())
            return out
    else:
        warnings.warn(
            "py_sod_metrics not installed: anchoring against the independent "
            "from-the-papers port (tests/third_party/pysod_port.py) instead."
        )
        from tests.third_party.pysod_port import compute_all as anchor

    for p, gu in cases:
        want = anchor(p, gu)
        got = compute_sample_metrics_np(p, gu)
        for name in ("sm", "wfm", "mae", "em", "fm"):
            assert abs(got[name] - want[name]) < 1e-7, (name, got[name], want[name])


def test_jax_metrics_vs_external_anchor(rng):
    """Close the full loop: the on-device JAX metrics against the anchor
    directly (not just against the NumPy oracle)."""
    try:
        from py_sod_metrics import Smeasure  # noqa: F401
        from tests.test_metrics import test_oracle_vs_external_anchor  # anchor above covers it
        anchor_mod = None
    except ImportError:
        from tests.third_party import pysod_port as anchor_mod

    g = blob_mask(rng, 48, 72)
    p = soft_pred(rng, g)
    ours, _ = run_both([(p, g)], (80, 80))
    if anchor_mod is None:
        from py_sod_metrics import MAE, Emeasure, Fmeasure, Smeasure, WeightedFmeasure

        gu = (g * 255).astype(np.uint8)
        want = {}
        for name, metric, get in [
            ("sm", Smeasure(), lambda d: d["sm"]),
            ("wfm", WeightedFmeasure(), lambda d: d["wfm"]),
            ("mae", MAE(), lambda d: d["mae"]),
            ("em", Emeasure(), lambda d: d["em"]["adp"]),
            ("fm", Fmeasure(), lambda d: d["fm"]["curve"].mean()),
        ]:
            metric.step(pred=p, gt=gu)
            want[name] = get(metric.get_results())
    else:
        want = anchor_mod.compute_all(p, (g * 255).astype(np.uint8))
    for name in ("sm", "wfm", "mae", "em", "fm"):
        assert abs(float(ours[name][0]) - want[name]) < 2e-4, (
            name, float(ours[name][0]), want[name])
