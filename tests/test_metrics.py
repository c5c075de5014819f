import numpy as np
import pytest

from mhim_mil_tpu.engine.metrics import (
    auroc_binary,
    classification_metrics,
    concordance_index_censored,
    bootstrap,
    evaluate_classification,
)


def test_auroc_perfect_and_random():
    labels = np.array([0, 0, 1, 1])
    assert auroc_binary(np.array([0.1, 0.2, 0.8, 0.9]), labels) == 1.0
    assert auroc_binary(np.array([0.9, 0.8, 0.2, 0.1]), labels) == 0.0
    # ties -> 0.5
    assert auroc_binary(np.array([0.5, 0.5, 0.5, 0.5]), labels) == 0.5


def test_auroc_matches_sklearn_formula():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=200)
    labels = (rng.random(200) < 0.4).astype(int)
    ours = auroc_binary(scores, labels)
    # brute-force pair counting
    pos, neg = scores[labels == 1], scores[labels == 0]
    cnt = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    assert abs(ours - cnt / (len(pos) * len(neg))) < 1e-9


def test_classification_metrics_binary():
    logits = np.array([[2.0, -2.0], [2.0, -2.0], [-2.0, 2.0], [-1.0, 1.0]])
    labels = np.array([0, 0, 1, 1])
    m = classification_metrics(logits, labels, 2, bin_metric=True)
    assert m["acc"] == 1.0 and m["auc"] == 1.0 and m["f1"] == 1.0
    assert m["kappa"] == 1.0


def test_cindex_perfect_and_reversed():
    time = np.array([1.0, 2.0, 3.0, 4.0])
    event = np.array([1, 1, 1, 1])
    risk_good = np.array([4.0, 3.0, 2.0, 1.0])  # earlier event = higher risk
    assert concordance_index_censored(event, time, risk_good) == 1.0
    assert concordance_index_censored(event, time, -risk_good) == 0.0


def test_cindex_censoring_excludes_pairs():
    time = np.array([1.0, 2.0, 3.0])
    event = np.array([0, 1, 1])  # first subject censored: its pairs dropped
    risk = np.array([9.0, 2.0, 1.0])
    # only comparable pair: (2y, 3y) with risk 2>1 concordant
    assert concordance_index_censored(event, time, risk) == 1.0


def test_bootstrap_deterministic():
    rng = np.random.default_rng(0)
    vals = rng.normal(size=50)

    def metric(idx):
        return {"m": float(vals[idx].mean())}

    m1, s1 = bootstrap(metric, 50, num_bootstrap=100, seed=42)
    m2, s2 = bootstrap(metric, 50, num_bootstrap=100, seed=42)
    assert m1 == m2 and s1 == s2
    m3, _ = bootstrap(metric, 50, num_bootstrap=100, seed=43)
    assert m1 != m3


def test_evaluate_classification_bootstrap_row():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(40, 2))
    labels = rng.integers(0, 2, size=40)
    row = evaluate_classification(
        logits, labels, 2, loss=0.5, bootstrap_enabled=True, num_bootstrap=50, fold=0
    )
    assert "bootstrap_mean" in row and "auc" in row["bootstrap_mean"]
    assert 0 <= row["bootstrap_mean"]["auc"] <= 1
