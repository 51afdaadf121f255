"""Classifier behavior tests: the from-scratch adaboost must separate the
bundled curated controls cleanly (the reference trains `ada` on the same
data at every run)."""

import numpy as np

from defuse_tpu.annotate.adaboost import (AdaBoostClassifier, FEATURES,
                                          load_controls)


def test_training_separates_controls():
    X, y = load_controls()
    assert len(y) == 121 and set(y) == {0.0, 1.0}
    model = AdaBoostClassifier(50).fit(X, y)
    probs = model.predict_proba(X)
    # R ada defaults (nu=0.1 shrinkage, bag.frac=0.5) trade a little
    # training-set separation for a smooth probability surface — the
    # curated controls contain genuinely ambiguous rows both R and this
    # implementation leave near 0.5
    acc = np.mean((probs > 0.5) == (y == 1.0))
    assert acc > 0.92, acc


def test_cross_validated_auc():
    X, y = load_controls()
    rng = np.random.default_rng(0)
    order = rng.permutation(len(y))
    folds = np.array_split(order, 5)
    scores = np.zeros(len(y))
    for i in range(5):
        test_idx = folds[i]
        train_idx = np.concatenate([folds[j] for j in range(5) if j != i])
        model = AdaBoostClassifier(50).fit(X[train_idx], y[train_idx])
        scores[test_idx] = model.predict_proba(X[test_idx])
    # AUC
    pos = scores[y == 1.0]
    neg = scores[y == 0.0]
    auc = np.mean(pos[:, None] > neg[None, :]) \
        + 0.5 * np.mean(pos[:, None] == neg[None, :])
    # the reference reports strong separation on this curated set
    assert auc > 0.9, auc


def test_feature_list_matches_reference():
    assert len(FEATURES) == 14
    assert FEATURES[0] == "break_adj_entropy_min"
    assert "mean_map_count" in FEATURES
