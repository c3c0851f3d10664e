"""Validation metrics vs sklearn/numpy oracles."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    n, d = 60, 16
    ids = rng.integers(0, 12, size=n)
    # correlate embeddings with ids so AUC is non-trivial
    centers = rng.normal(size=(12, d))
    e = centers[ids] + 0.8 * rng.normal(size=(n, d))
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    return e.astype(np.float32), ids.astype(np.int32)


def test_auc_matches_sklearn(data):
    from sklearn.metrics import roc_auc_score

    from video_fingerprint_tpu.ops.metrics import discrimination_metrics

    e, ids = data
    m = discrimination_metrics(e, ids)

    sims = e @ e.T
    same = ids[:, None] == ids[None, :]
    np.fill_diagonal(same, False)
    diff = ~(ids[:, None] == ids[None, :])
    np.fill_diagonal(diff, False)
    intra = sims[same]
    inter = sims[diff]
    y = np.concatenate([np.ones(len(intra)), np.zeros(len(inter))])
    s = np.concatenate([intra, inter])
    expected = roc_auc_score(y, s)
    assert float(m["auc_roc"]) == pytest.approx(expected, abs=2e-4)

    assert float(m["intra_sim_mean"]) == pytest.approx(intra.mean(), abs=1e-4)
    assert float(m["inter_sim_std"]) == pytest.approx(inter.std(), abs=1e-4)
    assert float(m["separation_gap"]) == pytest.approx(
        intra.mean() - inter.mean(), abs=1e-4
    )


def test_threshold_metrics_match_oracle(data):
    from video_fingerprint_tpu.ops.metrics import discrimination_metrics

    e, ids = data
    m = discrimination_metrics(e, ids)
    sims = e @ e.T
    same = ids[:, None] == ids[None, :]
    np.fill_diagonal(same, False)
    diff = ~(ids[:, None] == ids[None, :])
    np.fill_diagonal(diff, False)
    intra, inter = sims[same], sims[diff]
    for t in (0.7, 0.8):
        tp = (intra >= t).sum()
        fp = (inter >= t).sum()
        fn = (intra < t).sum()
        precision = tp / (tp + fp) if tp + fp else 0
        recall = tp / (tp + fn) if tp + fn else 0
        assert float(m[f"precision@{t:.2f}"]) == pytest.approx(precision, abs=1e-5)
        assert float(m[f"recall@{t:.2f}"]) == pytest.approx(recall, abs=1e-5)


def test_retrieval_matches_oracle(data):
    from video_fingerprint_tpu.ops.metrics import retrieval_metrics

    e, ids = data
    m = retrieval_metrics(e, ids)

    sims = e @ e.T
    np.fill_diagonal(sims, -np.inf)
    for k in (1, 5, 10):
        hits = []
        for i in range(len(e)):
            topk = np.argsort(-sims[i])[:k]
            hits.append(np.any(ids[topk] == ids[i]))
        assert float(m[f"R@{k}"]) == pytest.approx(np.mean(hits), abs=1e-6)

    # mAP oracle = the reference algorithm verbatim (train.py:466-479):
    # self sorts last (sim=-inf) but still counts as a positive.
    aps = []
    for i in range(len(e)):
        order = np.argsort(-sims[i])
        positives = ids[order] == ids[i]
        if positives.sum() > 0:
            prec = np.cumsum(positives) / (np.arange(len(positives)) + 1)
            aps.append((prec * positives).sum() / positives.sum())
    assert float(m["mAP"]) == pytest.approx(np.mean(aps), abs=1e-4)


def test_streaming_metrics_equal_dense(data):
    """streaming_validation_metrics (O(block*N) memory, VERDICT r2 #5) must
    reproduce the dense discrimination + retrieval metrics exactly (up to
    float summation order), including with a partial last block."""
    from video_fingerprint_tpu.ops.metrics import (
        discrimination_metrics,
        retrieval_metrics,
        streaming_validation_metrics,
    )

    e, ids = data  # n=60; block 17 forces 4 blocks incl. a partial one
    s = streaming_validation_metrics(e, ids, block_rows=17)
    d = discrimination_metrics(e, ids)
    r = retrieval_metrics(e, ids)
    for key, val in d.items():
        assert s[key] == pytest.approx(float(val), abs=2e-5), key
    for key in ("R@1", "R@5", "R@10", "mAP"):
        assert s[key] == pytest.approx(float(r[key]), abs=2e-5), key


def test_streaming_metrics_duplicate_heavy():
    """Exercise ties + many positives per anchor (duplicate embeddings):
    AUC tie-correction and intra-pair collection must stay exact."""
    from video_fingerprint_tpu.ops.metrics import (
        discrimination_metrics,
        retrieval_metrics,
        streaming_validation_metrics,
    )

    rng = np.random.default_rng(0)
    base = rng.normal(size=(8, 12)).astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    e = np.concatenate([base, base, base])  # 3 exact copies of each
    ids = np.concatenate([np.arange(8)] * 3).astype(np.int32)
    s = streaming_validation_metrics(e, ids, block_rows=7)
    d = discrimination_metrics(e, ids)
    r = retrieval_metrics(e, ids)
    assert s["auc_roc"] == pytest.approx(float(d["auc_roc"]), abs=2e-5)
    assert s["mAP"] == pytest.approx(float(r["mAP"]), abs=2e-5)
    assert s["R@5"] == pytest.approx(float(r["R@5"]), abs=1e-6)


def test_streaming_map_count_path_equals_argsort_path(data):
    """The count-based mAP (no (b, N) sort; positions via masked comparison
    counts) must match the argsort fallback bit-for-bit on the same corpus —
    including the stable-sort tie rule (ties break by ascending column)."""
    from video_fingerprint_tpu.ops import metrics as M

    e, ids = data
    # duplicate rows to force score ties across different columns
    e = np.concatenate([e, e[:10]])
    ids = np.concatenate([ids, ids[:10]])
    s_count = M.streaming_validation_metrics(e, ids, block_rows=13)

    orig = M._metrics_block

    def force_argsort(*args, **kwargs):
        kwargs.pop("pmax", None)
        return orig(*args[:9], pmax=0, **kwargs)

    M._metrics_block = force_argsort
    try:
        s_sort = M.streaming_validation_metrics(e, ids, block_rows=13)
    finally:
        M._metrics_block = orig
    assert s_count["mAP"] == pytest.approx(s_sort["mAP"], abs=1e-6)
    for key in ("R@1", "R@5", "auc_roc", "separation_gap"):
        assert s_count[key] == pytest.approx(s_sort[key], abs=1e-6), key


def test_streaming_metrics_huge_group_falls_back():
    """A corpus with one group larger than the count-path bound (256) must
    still produce exact metrics via the argsort fallback."""
    from video_fingerprint_tpu.ops.metrics import (
        retrieval_metrics,
        streaming_validation_metrics,
    )

    rng = np.random.default_rng(3)
    e = rng.normal(size=(300, 8)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    ids = np.concatenate([np.zeros(260), np.arange(1, 41)]).astype(np.int32)
    s = streaming_validation_metrics(e, ids, block_rows=64)
    r = retrieval_metrics(e, ids)
    assert s["mAP"] == pytest.approx(float(r["mAP"]), abs=2e-5)
    assert s["R@10"] == pytest.approx(float(r["R@10"]), abs=1e-6)


def test_streaming_metrics_small_corpus_one_group():
    """Regression: pmax's power-of-two bucket must clamp to n — a corpus of
    17 rows sharing one id bucketed pmax to 32 > n and crashed lax.top_k."""
    from video_fingerprint_tpu.ops.metrics import streaming_validation_metrics

    rng = np.random.default_rng(5)
    e = rng.normal(size=(17, 8)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    ids = np.zeros(17, np.int32)
    m = streaming_validation_metrics(e, ids, block_rows=7)
    assert m["auc_roc"] == 0.5  # no inter pairs -> reference fallback
    assert m["mAP"] > 0.0


def test_auc_degenerate_single_class():
    from video_fingerprint_tpu.ops.metrics import discrimination_metrics

    e = np.eye(4, dtype=np.float32)
    ids = np.zeros(4, np.int32)  # all same video: no inter pairs
    m = discrimination_metrics(e, ids)
    assert float(m["auc_roc"]) == 0.5  # reference fallback (train.py:351-356)
