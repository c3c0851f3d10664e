"""Sharded/on-device top-k vs a numpy oracle, on the 8-device CPU mesh."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(0)
    e = rng.normal(size=(333, 64)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    return e


def _oracle(e, k):
    sims = e @ e.T
    idx = np.argsort(-sims, axis=1)[:, :k]
    return np.take_along_axis(sims, idx, axis=1), idx


def test_topk_cosine_matches_oracle(embeddings):
    from video_fingerprint_tpu.ops.topk import topk_cosine

    k = 20
    scores, idx = topk_cosine(embeddings, k, query_block=128)
    o_scores, _ = _oracle(embeddings, k)
    np.testing.assert_allclose(np.asarray(scores), o_scores, atol=1e-5)
    # indices may differ on exact ties; verify via scores at chosen indices
    sims = embeddings @ embeddings.T
    chosen = np.take_along_axis(sims, np.asarray(idx), axis=1)
    np.testing.assert_allclose(chosen, o_scores, atol=1e-5)


def test_sharded_topk_matches_oracle(embeddings):
    import jax

    from video_fingerprint_tpu.ops.topk import sharded_topk_cosine
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = make_mesh("corpus")
    k = 20
    scores, idx = sharded_topk_cosine(embeddings, k, mesh=mesh, query_block=64)
    o_scores, _ = _oracle(embeddings, k)
    np.testing.assert_allclose(np.asarray(scores), o_scores, atol=1e-5)
    sims = embeddings @ embeddings.T
    chosen = np.take_along_axis(sims, np.asarray(idx), axis=1)
    np.testing.assert_allclose(chosen, o_scores, atol=1e-5)


def test_sharded_topk_small_corpus():
    """k > shard size and n < devices*block still work."""
    from video_fingerprint_tpu.ops.topk import sharded_topk_cosine
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(1)
    e = rng.normal(size=(10, 16)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    scores, idx = sharded_topk_cosine(e, k=5, mesh=make_mesh("corpus"), query_block=8)
    o_scores, _ = _oracle(e, 5)
    np.testing.assert_allclose(np.asarray(scores), o_scores, atol=1e-5)


def test_fingerprint_index_api(tmp_path, embeddings):
    from video_fingerprint_tpu.inference.index import FingerprintIndex

    index = FingerprintIndex(dim=64)
    index.add(embeddings[:200])
    index.add(embeddings[200:])  # incremental add
    assert len(index) == len(embeddings)

    queries = embeddings[:10]
    scores, idx = index.search(queries, k=5)
    o_scores, _ = _oracle(embeddings, 5)
    np.testing.assert_allclose(scores, o_scores[:10], atol=1e-5)

    p = tmp_path / "index.npz"
    index.save(p)
    loaded = FingerprintIndex.load(p)
    s2, i2 = loaded.search(queries, k=5)
    np.testing.assert_allclose(s2, scores, atol=1e-6)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        FingerprintIndex(dim=64).search(queries, k=5)  # empty index
    with _pytest.raises(ValueError):
        index.add(np.zeros((3, 7), np.float32))  # wrong dim
