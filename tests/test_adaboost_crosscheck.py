"""Adaboost cross-validation against an independent implementation and a
pinned probability fixture (VERDICT r1 weak-item 5).

R's ``ada`` package is not available in this image (no R at all), so the
independent oracle is scikit-learn's discrete-SAMME AdaBoost with an
rpart-shaped CART base learner — a separate implementation of the same
published algorithm ``run_adaboost.R:30-46`` relies on.  Documented
deviation from R ``ada``: probabilities are behavior-compatible (same
features / training data / boosting scheme), not bit-identical to a
particular R build; the decision agreement bounds below are the
contract.
"""

import pathlib

import numpy as np
import pytest

from defuse_tpu.annotate.adaboost import AdaBoostClassifier, load_controls

FIXTURE = pathlib.Path(__file__).parent / "fixtures_adaboost_probs.tsv"


def test_pinned_probabilities_regression():
    """Training on the bundled controls is deterministic; the per-row
    probabilities are pinned so any classifier-affecting change is
    loud."""
    X, y = load_controls()
    probs = AdaBoostClassifier(50).fit(X, y).predict_proba(X)
    expected = np.loadtxt(FIXTURE)
    assert probs.shape == expected.shape
    np.testing.assert_allclose(probs, expected, rtol=0, atol=1e-12)


def test_agreement_with_sklearn_samme():
    sk = pytest.importorskip("sklearn")
    from sklearn.ensemble import AdaBoostClassifier as SkAda
    from sklearn.tree import DecisionTreeClassifier

    def sk_model():
        # learning_rate=0.1 mirrors ada's default nu=0.1 shrinkage;
        # sklearn has no per-round weighted bagging (ada's
        # bag.frac=0.5), so agreement bounds are looser than exact
        return SkAda(estimator=DecisionTreeClassifier(
            max_depth=30, min_samples_split=20, min_samples_leaf=7),
            n_estimators=50, learning_rate=0.1, random_state=0)

    X, y = load_controls()
    ours = AdaBoostClassifier(50).fit(X, y).predict_proba(X)
    theirs = sk_model().fit(X, y).predict_proba(X)[:, 1]
    assert np.mean((ours > .5) == (theirs > .5)) > 0.92
    assert np.corrcoef(ours, theirs)[0, 1] > 0.9

    # held-out agreement (5-fold): the two implementations must make
    # the same calls on >90% of unseen controls
    rng = np.random.default_rng(0)
    order = rng.permutation(len(y))
    folds = np.array_split(order, 5)
    po = np.zeros(len(y))
    ps = np.zeros(len(y))
    for i in range(5):
        te = folds[i]
        tr = np.concatenate([folds[j] for j in range(5) if j != i])
        po[te] = AdaBoostClassifier(50).fit(
            X[tr], y[tr]).predict_proba(X[te])
        ps[te] = sk_model().fit(X[tr], y[tr]).predict_proba(X[te])[:, 1]
    assert np.mean((po > .5) == (ps > .5)) > 0.9
    assert np.corrcoef(po, ps)[0, 1] > 0.85
