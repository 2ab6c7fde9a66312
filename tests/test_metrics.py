"""Metric correctness vs sklearn (the reference's metric backend,
dlrm_s_pytorch.py:830-855)."""

import numpy as np
import pytest

from dlrm_tpu.ops import metrics as M

sklearn = pytest.importorskip("sklearn.metrics")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_exact_auc_matches_sklearn(seed):
    rng = np.random.default_rng(seed)
    scores = rng.random(5000)
    # correlated labels so AUC is interesting
    labels = (scores + rng.normal(0, 0.4, 5000) > 0.6).astype(np.float64)
    ref = sklearn.roc_auc_score(labels, scores)
    np.testing.assert_allclose(M.roc_auc_exact(scores, labels), ref, atol=1e-12)


def test_exact_auc_with_ties():
    rng = np.random.default_rng(3)
    scores = np.round(rng.random(2000), 2)  # heavy ties
    labels = (rng.random(2000) < scores).astype(np.float64)
    ref = sklearn.roc_auc_score(labels, scores)
    np.testing.assert_allclose(M.roc_auc_exact(scores, labels), ref, atol=1e-12)


def test_binary_metrics_match_sklearn():
    rng = np.random.default_rng(4)
    scores = rng.random(3000)
    labels = (rng.random(3000) < scores).astype(np.int64)
    got = M.binary_metrics(scores, labels)
    pred = (scores >= 0.5).astype(np.int64)
    np.testing.assert_allclose(got["recall"], sklearn.recall_score(labels, pred))
    np.testing.assert_allclose(got["precision"], sklearn.precision_score(labels, pred))
    np.testing.assert_allclose(got["f1"], sklearn.f1_score(labels, pred))
    np.testing.assert_allclose(got["accuracy"], sklearn.accuracy_score(labels, pred))
    np.testing.assert_allclose(
        got["ap"], sklearn.average_precision_score(labels, scores), atol=1e-12
    )


def test_streaming_auc_approximates_exact():
    rng = np.random.default_rng(5)
    scores = rng.random(200_000)
    labels = (rng.random(200_000) < scores**1.5).astype(np.float64)
    exact = M.roc_auc_exact(scores, labels)
    # streamed in 10 chunks, merged from two "devices"
    s1, s2 = M.AucState.create(), M.AucState.create()
    for i in range(10):
        chunk = slice(i * 20000, (i + 1) * 20000)
        target = s1 if i % 2 == 0 else s2
        new = M.auc_update(target, scores[chunk], labels[chunk])
        if i % 2 == 0:
            s1 = new
        else:
            s2 = new
    approx = M.auc_compute(s1.merge(s2))
    assert abs(approx - exact) < 5e-4


def test_binary_metrics_from_hist_approximates_exact():
    """The histogram-derived MLPerf metric dict (the distributed eval path,
    VERDICT r3 missing #6) must agree with the exact-sort metrics within
    the bucket-resolution bound used by the convergence proxy (2e-3)."""
    rng = np.random.default_rng(7)
    scores = rng.random(100_000)
    labels = (rng.random(100_000) < scores**1.2).astype(np.float64)
    exact = M.binary_metrics(scores, labels)
    hist = M.auc_update(M.AucState.create(), scores, labels)
    approx = M.binary_metrics_from_hist(hist)
    for k in ("roc_auc", "accuracy", "precision", "recall", "f1", "ap"):
        assert abs(approx[k] - exact[k]) < 2e-3, (k, approx[k], exact[k])


def test_allreduce_auc_state_single_process_noop():
    rng = np.random.default_rng(8)
    scores = rng.random(1000)
    labels = (rng.random(1000) < scores).astype(np.float64)
    st = M.auc_update(M.AucState.create(), scores, labels)
    out = M.allreduce_auc_state(st)
    np.testing.assert_array_equal(out.pos, st.pos)
    np.testing.assert_array_equal(out.neg, st.neg)


def test_shards_scores_labels_pairs_by_device():
    """Device-paired shard extraction covers every row exactly once on a
    sharded mesh output (the multi-process eval's host view)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dlrm_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(data=2, model=4)
    sh = NamedSharding(mesh, P(("data", "model")))
    rng = np.random.default_rng(9)
    probs = rng.random((64, 1)).astype(np.float32)
    labels = (rng.random((64, 1)) < probs).astype(np.float32)
    pd = jax.device_put(jnp.asarray(probs), sh)
    ld = jax.device_put(jnp.asarray(labels), sh)
    s, l = M.shards_scores_labels(pd, ld)
    # every (score, label) pair present exactly once, correctly paired
    got = sorted(zip(s.tolist(), l.tolist()))
    want = sorted(zip(probs.ravel().tolist(), labels.ravel().tolist()))
    assert got == want


def test_streaming_auc_ignores_padded_rows():
    rng = np.random.default_rng(6)
    scores = rng.random(1000)
    labels = (rng.random(1000) < scores).astype(np.float64)
    st = M.auc_update(M.AucState.create(), scores, labels)
    padded_scores = np.concatenate([scores, rng.random(100)])
    padded_labels = np.concatenate([labels, -np.ones(100)])
    st2 = M.auc_update(M.AucState.create(), padded_scores, padded_labels)
    np.testing.assert_array_equal(st.pos, st2.pos)
    np.testing.assert_array_equal(st.neg, st2.neg)
