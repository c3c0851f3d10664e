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
