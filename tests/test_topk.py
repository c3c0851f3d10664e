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


def test_certified_topk_strict_matches_exact(embeddings):
    """The certified-approx path (approx_max_k + exactness certificate +
    repair) must return the exact per-row top-k score multiset."""
    from video_fingerprint_tpu.ops.topk import topk_cosine

    k = 20
    s_ref, _ = topk_cosine(embeddings, k, query_block=128, method="exact")
    s, i = topk_cosine(embeddings, k, query_block=128, method="certified")
    np.testing.assert_array_equal(
        np.sort(np.asarray(s), axis=1), np.sort(np.asarray(s_ref), axis=1)
    )
    # returned scores must be the actual sims at the returned indices
    sims = embeddings @ embeddings.T
    chosen = np.take_along_axis(sims, np.asarray(i), axis=1)
    np.testing.assert_allclose(np.sort(chosen, 1), np.sort(np.asarray(s), 1),
                               atol=1e-6)


def test_certified_topk_threshold_complete():
    """With exact_above=thr, every corpus item >= thr per row must be in the
    candidate list — on a corpus with planted near-duplicate clusters so the
    threshold actually bites."""
    sys_path_root = __import__("pathlib").Path(__file__).resolve().parents[1]
    import sys

    sys.path.insert(0, str(sys_path_root))
    from tools.exp_topk_precision import make_corpus
    from video_fingerprint_tpu.ops.topk import topk_cosine

    e = make_corpus(600, 64, seed=3)
    k, thr = 20, 0.95
    s, i = topk_cosine(e, k, query_block=128, method="certified",
                       exact_above=thr)
    s, i = np.asarray(s), np.asarray(i)
    sims = e @ e.T
    for row in range(len(e)):
        want = set(np.flatnonzero(sims[row] >= thr).tolist())
        if len(want) >= k:
            # rows truncated at k fall back to the strict certificate:
            # compare score multisets instead of index sets
            top = np.sort(sims[row])[::-1][:k]
            np.testing.assert_allclose(np.sort(s[row])[::-1], top, atol=1e-6)
        else:
            got = {int(j) for ss, j in zip(s[row], i[row]) if ss >= thr}
            assert want <= got, (row, want - got)


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


def test_sharded_topk_search_matches_oracle(embeddings):
    """Corpus-sharded query-vs-corpus search (the --against workload):
    queries != corpus, exactness vs the numpy oracle on the 8-dev mesh."""
    from video_fingerprint_tpu.ops.topk import sharded_topk_search
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    q = rng.normal(size=(45, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    k = 20
    scores, idx = sharded_topk_search(q, embeddings, k,
                                      mesh=make_mesh("corpus"))
    sims = q @ embeddings.T
    o_idx = np.argsort(-sims, axis=1)[:, :k]
    o_scores = np.take_along_axis(sims, o_idx, axis=1)
    np.testing.assert_allclose(np.asarray(scores), o_scores, atol=1e-5)
    chosen = np.take_along_axis(sims, np.asarray(idx), axis=1)
    np.testing.assert_allclose(chosen, o_scores, atol=1e-5)


def test_sharded_certified_matches_exact(embeddings):
    """Certified-approx on BOTH sharded paths (VERDICT r3 missing #2): the
    per-tile certificate + exact repair must reproduce the exact score
    multiset on the 8-dev mesh. recall_target=0.7 forces certificate
    failures so the repair path is genuinely exercised."""
    from video_fingerprint_tpu.ops.topk import (
        sharded_topk_cosine,
        sharded_topk_search,
    )
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("corpus")
    k = 20
    o_scores, _ = _oracle(embeddings, k)
    for recall in (0.7, 0.95):
        s, i = sharded_topk_cosine(embeddings, k, mesh=mesh, query_block=64,
                                   method="certified", recall_target=recall)
        np.testing.assert_allclose(np.sort(np.asarray(s), 1),
                                   np.sort(o_scores, 1), atol=1e-5)
        sims = embeddings @ embeddings.T
        chosen = np.take_along_axis(sims, np.asarray(i), axis=1)
        np.testing.assert_allclose(np.sort(chosen, 1),
                                   np.sort(np.asarray(s), 1), atol=1e-5)

    rng = np.random.default_rng(7)
    q = rng.normal(size=(45, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    sims = q @ embeddings.T
    o_idx = np.argsort(-sims, axis=1)[:, :k]
    o_q = np.take_along_axis(sims, o_idx, axis=1)
    for recall in (0.7, 0.95):
        s, i = sharded_topk_search(q, embeddings, k, mesh=mesh,
                                   method="certified", recall_target=recall)
        np.testing.assert_allclose(np.sort(np.asarray(s), 1),
                                   np.sort(o_q, 1), atol=1e-5)
        chosen = np.take_along_axis(sims, np.asarray(i), axis=1)
        np.testing.assert_allclose(np.sort(chosen, 1),
                                   np.sort(np.asarray(s), 1), atol=1e-5)


def test_sharded_certified_threshold_complete():
    """exact_above on the sharded search: every corpus item >= thr per row
    is in the candidate list (the duplicate-grouping contract), on a corpus
    with planted near-duplicate clusters so the threshold bites."""
    sys_path_root = __import__("pathlib").Path(__file__).resolve().parents[1]
    import sys

    sys.path.insert(0, str(sys_path_root))
    from tools.exp_topk_precision import make_corpus
    from video_fingerprint_tpu.ops.topk import sharded_topk_search
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    e = make_corpus(600, 64, seed=3)
    q = e[:80]
    k, thr = 20, 0.95
    s, i = sharded_topk_search(q, e, k, mesh=make_mesh("corpus"),
                               method="certified", exact_above=thr,
                               recall_target=0.8)
    s, i = np.asarray(s), np.asarray(i)
    sims = q @ e.T
    for row in range(len(q)):
        want = set(np.flatnonzero(sims[row] >= thr).tolist())
        if len(want) >= k:
            top = np.sort(sims[row])[::-1][:k]
            np.testing.assert_allclose(np.sort(s[row])[::-1], top, atol=1e-6)
        else:
            got = {int(j) for ss, j in zip(s[row], i[row]) if ss >= thr}
            assert want <= got, (row, want - got)


def test_sharded_topk_search_small_and_k_past_shard():
    """n < devices*8 (heavy padding) and k > per-shard rows."""
    from video_fingerprint_tpu.ops.topk import sharded_topk_search
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(2)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    c = rng.normal(size=(13, 16)).astype(np.float32)
    scores, idx = sharded_topk_search(q, c, k=9, mesh=make_mesh("corpus"))
    sims = q @ c.T
    o_idx = np.argsort(-sims, axis=1)[:, :9]
    o_scores = np.take_along_axis(sims, o_idx, axis=1)
    np.testing.assert_allclose(np.asarray(scores), o_scores, atol=1e-5)


def test_bucket_rows_properties():
    """Shape-bucketing invariants: covers n, bounded waste past the floor,
    and a bounded bucket count (compile-count cap) per power of two."""
    from video_fingerprint_tpu.ops.topk import _bucket_rows

    buckets = set()
    for n in list(range(1, 3000, 7)) + [10**4, 10**5, 123_457, 10**6]:
        b = _bucket_rows(n)
        assert b >= n
        if n > 2048:  # past the floor: waste bounded by the 1/16-octave grid
            assert b / n <= 1.0625 + 1e-9, (n, b)
        buckets.add(b)
    # octave [65536, 131072): at most 16 distinct buckets
    octave = {b for b in (_bucket_rows(n) for n in range(65537, 131073, 97))
              if 65536 < b <= 131072}
    assert len(octave) <= 16


def test_sharded_topk_search_zero_queries(embeddings):
    """m=0 must return empty results like the single-device path, and the
    staged-corpus tuple must be reusable across searches."""
    from video_fingerprint_tpu.ops.topk import (
        sharded_topk_search,
        stage_sharded_corpus,
    )
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("corpus")
    s, i = sharded_topk_search(np.zeros((0, 64), np.float32), embeddings, 5,
                               mesh=mesh)
    assert s.shape == (0, 5) and i.shape == (0, 5)
    staged = stage_sharded_corpus(embeddings, mesh)
    q = embeddings[:9]
    s1, i1 = sharded_topk_search(q, staged, 5, mesh=mesh)
    s2, i2 = sharded_topk_search(q, embeddings, 5, mesh=mesh)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_index_search_sharded_path_matches_single(embeddings):
    """FingerprintIndex.search auto-shards on multi-device platforms; the
    result must equal the single-device exact search."""
    from video_fingerprint_tpu.inference.index import FingerprintIndex

    index = FingerprintIndex(dim=64)
    index.add(embeddings)  # 333 rows >= 8*8 -> sharded path on the CPU mesh
    q = embeddings[:17]
    s_sharded, i_sharded = index.search(q, k=10)
    sims = q @ embeddings.T
    o_idx = np.argsort(-sims, axis=1)[:, :10]
    o_scores = np.take_along_axis(sims, o_idx, axis=1)
    np.testing.assert_allclose(s_sharded, o_scores, atol=1e-5)
    chosen = np.take_along_axis(sims, i_sharded, axis=1)
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


@pytest.mark.slow
def test_sharded_topk_large_corpus_scaling():
    """Ring top-k at 64k rows on the 8-device mesh: per-device memory stays
    O(N/d·(D+k)) — nothing replicated — and a 512-row sample matches the
    oracle. (A 1M-row self-search is O(N²·D) FLOPs — beyond this CPU box —
    but memory/compile behavior is shape-linear, which is what this checks.)"""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops import topk as topk_mod
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    n, dim, k = 65536, 64, 10
    rng = np.random.default_rng(2)
    e = rng.normal(size=(n, dim)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    mesh = make_mesh("corpus")

    qb = 128
    scores, idx = topk_mod.sharded_topk_cosine(e, k, mesh=mesh, query_block=qb)
    scores, idx = np.asarray(scores), np.asarray(idx)

    # compiled per-device temp footprint: O(shard + qb*shard_rows sims block),
    # strictly below replicating the full (N, D) corpus per device (the old
    # design's floor).
    fn = topk_mod._RING_CACHE[
        (mesh, "corpus", n, dim, k, k, qb, jax.lax.Precision.HIGH,
         "exact", 0.99, None)
    ]
    mem = fn.lower(
        jax.ShapeDtypeStruct((n, dim), jnp.float32),
        jax.ShapeDtypeStruct((), jnp.int32),
    ).compile().memory_analysis()
    full_corpus_bytes = n * dim * 4
    assert mem.temp_size_in_bytes < full_corpus_bytes, (
        mem.temp_size_in_bytes, full_corpus_bytes
    )

    sample = rng.choice(n, 512, replace=False)
    sims = e[sample] @ e.T  # (512, n) oracle rows only
    o_idx = np.argsort(-sims, axis=1)[:, :k]
    o_scores = np.take_along_axis(sims, o_idx, axis=1)
    np.testing.assert_allclose(scores[sample], o_scores, atol=2e-5)
    chosen = np.take_along_axis(sims, idx[sample], axis=1)
    np.testing.assert_allclose(chosen, o_scores, atol=2e-5)


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


# ---------------------------------------------------------------------------
# certified-bf16: single-pass first stage + widened threshold certificate
# ---------------------------------------------------------------------------


def test_bf16_dot_eps_bound_is_rigorous():
    """_BF16_DOT_EPS must dominate the worst observed single-pass bf16
    PIPELINE error on unit-norm vectors: round both operands to bf16,
    accumulate in f32 (what Precision.DEFAULT does on TPU), then round the
    RESULT to bf16 (the lowp path materializes sims in bf16), compare
    against the f64 truth."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import _BF16_DOT_EPS

    rng = np.random.default_rng(7)
    for dim in (64, 256, 1024):
        x = rng.normal(size=(512, dim))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        y = rng.normal(size=(512, dim))
        y /= np.linalg.norm(y, axis=1, keepdims=True)
        truth = x @ y.T  # f64
        xq = np.asarray(jnp.asarray(x, jnp.bfloat16), np.float32)
        yq = np.asarray(jnp.asarray(y, jnp.bfloat16), np.float32)
        # f32 accumulation of bf16-rounded inputs, result stored as bf16
        noisy = np.asarray(
            jnp.asarray((xq @ yq.T).astype(np.float32), jnp.bfloat16),
            np.float32)
        err = float(np.abs(noisy - truth).max())
        assert err < _BF16_DOT_EPS, (dim, err)
        # the bound should not be vacuous: random pairs already get within
        # ~10x of it (adversarially-aligned operands get closer)
        if dim == 256:
            assert err > _BF16_DOT_EPS / 32


def test_certified_bf16_threshold_complete():
    """method='certified-bf16' keeps the thresholded-completeness contract
    and returns HIGH-rescored scores (== true sims at the returned ids)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.exp_topk_precision import make_corpus
    from video_fingerprint_tpu.ops.topk import topk_cosine

    e = make_corpus(600, 64, seed=3)
    k, thr = 20, 0.95
    s, i = topk_cosine(e, k, query_block=128, method="certified-bf16",
                       exact_above=thr)
    s, i = np.asarray(s), np.asarray(i)
    sims = e @ e.T
    for row in range(len(e)):
        want = set(np.flatnonzero(sims[row] >= thr).tolist())
        if len(want) >= k:
            # truncated rows fail the widened certificate and are repaired
            # exactly: their scores must be the true top-k multiset
            top = np.sort(sims[row])[::-1][:k]
            np.testing.assert_allclose(np.sort(s[row])[::-1], top, atol=1e-5)
        else:
            got = {int(j) for ss, j in zip(s[row], i[row]) if ss >= thr - 1e-5}
            assert want <= got, (row, want - got)
    # reported scores are the actual similarities at the returned indices
    # (rescored at HIGH), wherever the slot is not -inf padding
    chosen = np.take_along_axis(sims, i, axis=1)
    live = np.isfinite(s)
    np.testing.assert_allclose(s[live], chosen[live], atol=1e-5)
    # rows are sorted descending after the rescore
    assert (np.diff(s, axis=1) <= 1e-6).all()


def test_certified_bf16_widens_certificate():
    """Items whose similarity falls inside (thr - eps, thr) — invisible to a
    thr-exact count but reachable by bf16 noise — must be counted by the
    widened certificate: a row with >= k such items cannot self-certify."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import (_BF16_DOT_EPS,
                                                _certified_search)

    rng = np.random.default_rng(11)
    dim, thr = 64, 0.95
    base = rng.normal(size=dim)
    base /= np.linalg.norm(base)
    # 30 vectors at cosine ~ thr - eps/2: above thr-eps, below thr
    target = thr - _BF16_DOT_EPS / 2
    others = []
    for _ in range(30):
        noise = rng.normal(size=dim)
        noise -= (noise @ base) * base
        noise /= np.linalg.norm(noise)
        others.append(target * base + np.sqrt(1 - target**2) * noise)
    corpus = np.asarray([base] + others, np.float32)
    corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
    k = 8  # << 30 in-band items
    _, _, ok = _certified_search(
        jnp.asarray(corpus[:1]), jnp.asarray(corpus),
        jnp.asarray(len(corpus), jnp.int32), k, query_block=8,
        recall=0.95, thr=thr, lowp=True)
    assert not bool(np.asarray(ok)[0])  # must be sent to exact repair
    # sanity: the thr-exact count sees only the self-match, i.e. without the
    # widening this row would (wrongly) self-certify
    sims = corpus[:1] @ corpus.T
    assert (sims >= thr).sum() == 1 and (sims >= thr - _BF16_DOT_EPS).sum() > k


def test_certified_bf16_requires_threshold():
    import pytest as _pytest
    from video_fingerprint_tpu.ops.topk import topk_cosine

    e = np.eye(8, 16, dtype=np.float32)
    with _pytest.raises(ValueError, match="exact_above"):
        topk_cosine(e, 2, method="certified-bf16")


def test_rescore_topk_sorts_and_keeps_neginf():
    from video_fingerprint_tpu.ops.topk import _SIM_PRECISION, _rescore_topk

    rng = np.random.default_rng(5)
    q = rng.normal(size=(37, 16)).astype(np.float32)
    corpus = rng.normal(size=(50, 16)).astype(np.float32)
    k = 6
    idx = np.stack([rng.choice(50, size=k, replace=False) for _ in range(37)])
    scores = (q[:, None, :] * corpus[idx]).sum(-1).astype(np.float32)
    # mark the last slot of every odd row as padding
    scores[1::2, -1] = -np.inf
    s2, i2 = _rescore_topk(q, corpus, scores, idx.astype(np.int32), block=16,
                           precision=_SIM_PRECISION)
    s2, i2 = np.asarray(s2), np.asarray(i2)
    assert (np.diff(s2, axis=1) <= 1e-6).all()
    assert np.isneginf(s2[1::2, -1]).all()
    live = np.isfinite(s2)
    true = (q[:, None, :] * corpus[i2]).sum(-1)
    np.testing.assert_allclose(s2[live], true[live], rtol=1e-5, atol=1e-5)


def test_sharded_certified_bf16_threshold_complete():
    """Both sharded paths accept method='certified-bf16': per-tile widened
    certificate + resident-tile HIGH rescore + exact repair; results stay
    candidate-complete above thr with HIGH-contract scores, on the 8-device
    CPU mesh."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from tools.exp_topk_precision import make_corpus
    from video_fingerprint_tpu.ops.topk import (sharded_topk_cosine,
                                                sharded_topk_search)

    e = make_corpus(640, 64, seed=3)
    k, thr = 20, 0.95
    sims = e @ e.T

    def check(s, i, queries_sims):
        s, i = np.asarray(s), np.asarray(i)
        for row in range(len(s)):
            want = set(np.flatnonzero(queries_sims[row] >= thr).tolist())
            if len(want) >= k:
                top = np.sort(queries_sims[row])[::-1][:k]
                np.testing.assert_allclose(np.sort(s[row])[::-1], top,
                                           atol=1e-5)
            else:
                got = {int(j) for ss, j in zip(s[row], i[row])
                       if ss >= thr - 1e-5}
                assert want <= got, (row, want - got)
        chosen = np.take_along_axis(queries_sims, i, axis=1)
        live = np.isfinite(s)
        np.testing.assert_allclose(s[live], chosen[live], atol=1e-5)

    s, i = sharded_topk_cosine(e, k, method="certified-bf16",
                               exact_above=thr, recall_target=0.7)
    check(s, i, sims)

    q = e[:64]
    s, i = sharded_topk_search(q, e, k, method="certified-bf16",
                               exact_above=thr, recall_target=0.7)
    check(s, i, sims[:64])


def test_sharded_certified_bf16_requires_threshold():
    import pytest as _pytest
    from video_fingerprint_tpu.ops.topk import sharded_topk_cosine

    e = np.eye(16, 32, dtype=np.float32)
    with _pytest.raises(ValueError, match="exact_above"):
        sharded_topk_cosine(e, 4, method="certified-bf16")

def test_certified_bf16_pins_single_materialization():
    """The lowp certificate is only sound if selection and count read the
    SAME materialized bf16 sims (observed on chip: without a barrier XLA
    recomputed the matmul for one consumer at a different effective
    precision and a boundary item masked a genuine miss). Pin the
    optimization_barrier into the lowered program."""
    import jax
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import _certified_search

    e = jnp.eye(8, 16, dtype=jnp.float32)
    lowered = jax.jit(
        lambda q: _certified_search(q, q, jnp.asarray(8, jnp.int32), 2, 8,
                                    0.95, 0.9, lowp=True)
    ).lower(e)
    text = lowered.as_text()
    assert "opt-barrier" in text or "optimization_barrier" in text, (
        "lowp path lost its optimization_barrier")
    # and the sims tensor it protects is bf16 (the point of the exercise)
    assert "bf16" in text


def test_wide_topk_bit_equal_to_full_width():
    """_wide_topk (column-chunked selection + merge, the structural fix for
    the 1M-wide lax.top_k TPU-worker crash) must be BIT-equal to full-width
    lax.top_k — scores AND indices, including the (score desc, index asc)
    tie rule — on tie-heavy inputs, -inf padding columns, uneven last
    chunks, and k spanning a chunk boundary."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.ops.topk import _wide_topk

    rng = np.random.default_rng(7)
    for n, chunk, k in [(23, 7, 5), (64, 16, 16), (100, 32, 20),
                        (33, 32, 3), (40, 8, 12)]:
        # tie-heavy: quantized scores so duplicates straddle chunk borders
        sims = rng.integers(0, 6, (9, n)).astype(np.float32)
        sims[:, -3:] = -np.inf  # padding columns
        sims[0, :] = 1.0        # a fully tied row
        s_ref, i_ref = jax.lax.top_k(jnp.asarray(sims), k)
        s_chk, i_chk = _wide_topk(jnp.asarray(sims), k, chunk=chunk)
        np.testing.assert_array_equal(np.asarray(s_chk), np.asarray(s_ref),
                                      err_msg=f"n={n} chunk={chunk} k={k}")
        np.testing.assert_array_equal(np.asarray(i_chk), np.asarray(i_ref),
                                      err_msg=f"n={n} chunk={chunk} k={k}")
    # width <= chunk short-circuits to the single full-width op
    sims = rng.normal(size=(4, 50)).astype(np.float32)
    s_ref, i_ref = jax.lax.top_k(jnp.asarray(sims), 5)
    s_chk, i_chk = _wide_topk(jnp.asarray(sims), 5, chunk=64)
    np.testing.assert_array_equal(np.asarray(s_chk), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(i_chk), np.asarray(i_ref))


def test_exact_search_chunked_matches_unchunked(embeddings, monkeypatch):
    """topk_search(method='exact') through a tiny _WIDE_TOPK_CHUNK must
    reproduce the unchunked search bit-for-bit end-to-end (the call sites
    resolve _wide_topk at trace time, so patching its default chunk via a
    wrapper exercises the chunked branch inside the jitted programs)."""
    import functools

    from video_fingerprint_tpu.ops import topk as topk_mod

    k = 10
    ref_s, ref_i = topk_mod.topk_search(embeddings, embeddings, k,
                                        query_block=128, method="exact")
    orig = topk_mod._wide_topk
    monkeypatch.setattr(topk_mod, "_wide_topk",
                        functools.partial(orig, chunk=64))
    # new shapes force a re-trace; (333->1024-padded, chunk 64) => 16 chunks
    chk_s, chk_i = topk_mod.topk_search(embeddings[:111], embeddings, k,
                                        query_block=64, method="exact")
    np.testing.assert_array_equal(np.asarray(chk_s), np.asarray(ref_s[:111]))
    np.testing.assert_array_equal(np.asarray(chk_i), np.asarray(ref_i[:111]))


def test_query_slabbing_matches_single_dispatch(embeddings, monkeypatch):
    """The per-dispatch work budget (_DISPATCH_CELLS — the axon worker kills
    long executions) slabs queries into multiple dispatches; results must be
    invariant: bit-equal scores/indices for exact, and certified slabs must
    still repair their own failing rows (forced via recall_target) to match
    the exact oracle."""
    from video_fingerprint_tpu.ops import topk as topk_mod

    k = 10
    ref_s, ref_i = topk_mod.topk_search(embeddings, embeddings, k,
                                        query_block=64, method="exact")
    # 333 queries x 1024-padded corpus = 341k cells; budget 70k forces
    # slab = max(query_block, 0) = 64 -> 6 dispatches
    monkeypatch.setitem(topk_mod._DISPATCH_CELLS, "exact", 70_000)
    monkeypatch.setitem(topk_mod._DISPATCH_CELLS, "certified", 70_000)
    s, i = topk_mod.topk_search(embeddings, embeddings, k,
                                query_block=64, method="exact")
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))

    cs, ci = topk_mod.topk_search(embeddings, embeddings, k,
                                  query_block=64, method="certified",
                                  recall_target=0.7)
    np.testing.assert_allclose(np.sort(np.asarray(cs), 1),
                               np.sort(np.asarray(ref_s), 1), atol=1e-6)


# ---------------------------------------------------------------------------
# bf16-RESIDENT corpus storage (half the HBM residency / index bytes; all
# contracts hold w.r.t. the STORED quantized vectors)
# ---------------------------------------------------------------------------


def _quantized(e):
    """Raw stored values: f32 view of the bf16-rounded rows."""
    import jax.numpy as jnp

    return np.asarray(jnp.asarray(e, jnp.bfloat16), np.float32)


def _qdirs(e):
    """The bf16-storage ground-truth DOMAIN: bf16 storage stores directions
    and every search renormalizes with exact f32 row norms, so truth is the
    unit-normalized quantized rows (cosines of the stored vectors)."""
    q = _quantized(e)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_bf16_store_eps_bound_is_rigorous():
    """_BF16_STORE_EPS must dominate the bf16-RESIDENT pipeline error vs the
    COSINE truth of the stored vectors: inputs already bf16 (no
    input-rounding term), f32 accumulation, exact-f32-norm rescale, result
    stored bf16 (the lowp materialization)."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import _BF16_STORE_EPS

    rng = np.random.default_rng(17)
    for dim in (64, 256, 1024):
        x = rng.normal(size=(512, dim))
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        xq = _quantized(x)
        xd = xq.astype(np.float64)
        truth = (xd / np.linalg.norm(xd, axis=1, keepdims=True)) @ (
            xd / np.linalg.norm(xd, axis=1, keepdims=True)).T
        # the pipeline: f32 matmul of bf16 values, f32 rsqrt-norm rescale,
        # bf16 storage of the scaled cosine
        rn = 1.0 / np.linalg.norm(xq, axis=1).astype(np.float32)
        scaled = ((xq @ xq.T) * rn[None, :] * rn[:, None]).astype(np.float32)
        noisy = np.asarray(jnp.asarray(scaled, jnp.bfloat16), np.float32)
        err = float(np.abs(noisy - truth).max())
        assert err < _BF16_STORE_EPS, (dim, err)


def test_bf16_resident_exact_duplicates_score_one():
    """The regression the /verify run caught: byte-identical videos produce
    identical embeddings, and RAW bf16 inner products sat ~0.4% below 1.0
    (non-unit stored rows), breaking duplicate grouping at thresholds
    >= 0.999. With direction storage + exact-f32-norm rescale, identical
    stored rows must score 1.0 to within one f32 ulp on every path (the
    rsqrt/multiply roundings cost ~6e-8; quantization cost them ~4e-3)."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import topk_search
    from video_fingerprint_tpu.ops.topk import sharded_topk_cosine
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(23)
    e = rng.normal(size=(64, 32)).astype(np.float32)
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    e[17] = e[3]  # byte-identical duplicate pair
    e16 = jnp.asarray(e, jnp.bfloat16)
    for method, kw in [("exact", {}),
                       ("certified", {"recall_target": 0.7}),
                       ("certified-bf16", {"exact_above": 0.999999})]:
        s, i = topk_search(e16, e16, 2, query_block=32, method=method, **kw)
        s, i = np.asarray(s), np.asarray(i)
        # row 3's top-2 are itself and row 17, both at 1.0 within an ulp
        assert set(i[3].tolist()) == {3, 17}, (method, i[3])
        np.testing.assert_allclose(s[3], [1.0, 1.0], atol=1e-6)
        assert (s[3] >= 0.999999).all(), (method, s[3])
    s, i = sharded_topk_cosine(e16, 2, mesh=make_mesh("corpus"),
                               query_block=8)
    assert set(np.asarray(i)[3].tolist()) == {3, 17}
    np.testing.assert_allclose(np.asarray(s)[3], [1.0, 1.0], atol=1e-6)


def test_bf16_resident_exact_matches_quantized_oracle(embeddings):
    """topk_search with a bf16-resident corpus returns the exact top-k of
    the STORED vectors (bf16 products are exact in f32 accumulation)."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import topk_search

    eq = _qdirs(embeddings)
    e16 = jnp.asarray(embeddings, jnp.bfloat16)
    k = 20
    s, i = topk_search(e16, e16, k, query_block=128, method="exact")
    sims = eq @ eq.T
    o_idx = np.argsort(-sims, axis=1)[:, :k]
    o_scores = np.take_along_axis(sims, o_idx, axis=1)
    np.testing.assert_allclose(np.asarray(s), o_scores, atol=2e-5)
    chosen = np.take_along_axis(sims, np.asarray(i), axis=1)
    np.testing.assert_allclose(chosen, o_scores, atol=2e-5)


def test_bf16_resident_certified_matches_exact(embeddings):
    """Strict certificate + repair on a bf16-resident corpus: exact score
    multiset of the stored vectors (low recall forces the repair path)."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import topk_search

    e16 = jnp.asarray(embeddings, jnp.bfloat16)
    k = 20
    s_ref, _ = topk_search(e16, e16, k, query_block=128, method="exact")
    s, i = topk_search(e16, e16, k, query_block=128, method="certified",
                       recall_target=0.7)
    np.testing.assert_allclose(
        np.sort(np.asarray(s), 1), np.sort(np.asarray(s_ref), 1), atol=1e-6)


def test_bf16_resident_certified_bf16_complete():
    """The production thresholded search on a bf16-resident planted corpus:
    candidate-complete above thr w.r.t. the quantized truth, scores within
    the rescore contract of the quantized sims."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax.numpy as jnp
    from tools.exp_topk_precision import make_corpus
    from video_fingerprint_tpu.ops.topk import topk_search

    e = make_corpus(600, 64, seed=5)
    eq = _qdirs(e)
    e16 = jnp.asarray(e, jnp.bfloat16)
    k, thr = 20, 0.95
    s, i = topk_search(e16, e16, k, query_block=128,
                       method="certified-bf16", exact_above=thr)
    s, i = np.asarray(s), np.asarray(i)
    sims = eq @ eq.T
    for row in range(len(e)):
        want = set(np.flatnonzero(sims[row] >= thr).tolist())
        if len(want) >= k:
            top = np.sort(sims[row])[::-1][:k]
            np.testing.assert_allclose(np.sort(s[row])[::-1], top, atol=2e-5)
        else:
            got = {int(j) for ss, j in zip(s[row], i[row]) if ss >= thr - 2e-5}
            assert want <= got, (row, want - got)
    chosen = np.take_along_axis(sims, i, axis=1)
    live = np.isfinite(s)
    np.testing.assert_allclose(s[live], chosen[live], atol=2e-5)


def test_stage_padded_corpus_bf16_roundtrip(embeddings):
    """dtype='bf16' staging: half the bytes, bucket-padded, and searches
    against it match the quantized oracle through the n_valid path."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import (_bucket_rows, topk_search,
                                                stage_padded_corpus)

    staged, n = stage_padded_corpus(embeddings, dtype="bf16")
    assert staged.dtype == jnp.bfloat16
    assert n == len(embeddings)
    assert staged.shape[0] == _bucket_rows(n)
    eq = _qdirs(embeddings)
    k = 10
    s, i = topk_search(jnp.asarray(eq[:37], jnp.bfloat16), staged, k,
                       n_valid=n, query_block=64, method="exact")
    sims = eq[:37] @ eq.T
    o_scores = np.take_along_axis(
        sims, np.argsort(-sims, axis=1)[:, :k], axis=1)
    np.testing.assert_allclose(np.asarray(s), o_scores, atol=2e-5)


def test_sharded_bf16_resident_matches_quantized_oracle(embeddings):
    """Both sharded paths on a bf16-resident corpus over the 8-dev mesh:
    results match the quantized-truth oracle; certified repairs forced."""
    import jax.numpy as jnp
    from video_fingerprint_tpu.ops.topk import (sharded_topk_cosine,
                                                sharded_topk_search,
                                                stage_sharded_corpus)
    from video_fingerprint_tpu.parallel.mesh import make_mesh

    mesh = make_mesh("corpus")
    eq = _qdirs(embeddings)
    k = 20
    sims = eq @ eq.T
    o_scores = np.take_along_axis(
        sims, np.argsort(-sims, axis=1)[:, :k], axis=1)

    # ring self-search, exact + certified (repairs forced at recall 0.7)
    e16 = jnp.asarray(embeddings, jnp.bfloat16)
    s, i = sharded_topk_cosine(e16, k, mesh=mesh, query_block=64)
    np.testing.assert_allclose(np.asarray(s), o_scores, atol=2e-5)
    s, _ = sharded_topk_cosine(e16, k, mesh=mesh, query_block=64,
                               method="certified", recall_target=0.7)
    np.testing.assert_allclose(np.sort(np.asarray(s), 1),
                               np.sort(o_scores, 1), atol=2e-5)

    # query-vs-corpus against a bf16-staged corpus
    staged = stage_sharded_corpus(embeddings, mesh, dtype="bf16")
    assert staged[0].dtype == jnp.bfloat16
    q = eq[:45]
    s, i = sharded_topk_search(q, staged, k, mesh=mesh)
    qsims = q @ eq.T
    oq = np.take_along_axis(qsims, np.argsort(-qsims, axis=1)[:, :k], axis=1)
    np.testing.assert_allclose(np.asarray(s), oq, atol=2e-5)
    # thresholded certified-bf16 on the staged corpus keeps completeness
    thr = 0.9
    s, i = sharded_topk_search(q, staged, k, mesh=mesh,
                               method="certified-bf16", exact_above=thr)
    s, i = np.asarray(s), np.asarray(i)
    for row in range(len(q)):
        want = set(np.flatnonzero(qsims[row] >= thr).tolist())
        if len(want) < k:
            got = {int(j) for ss, j in zip(s[row], i[row])
                   if ss >= thr - 2e-5}
            assert want <= got, (row, want - got)


def test_fingerprint_index_bf16_storage(tmp_path, embeddings):
    """storage='bf16': half-size disk format round-trips (idempotent
    quantization), search matches the quantized-truth oracle, and loading
    restores the storage mode."""
    from video_fingerprint_tpu.inference.index import FingerprintIndex

    idx = FingerprintIndex(dim=64, storage="bf16")
    idx.add(embeddings, [{"path": f"/v/{i}.mp4"} for i in range(len(embeddings))])
    p16, p32 = tmp_path / "c16.npz", tmp_path / "c32.npz"
    idx.save(p16)
    f32_idx = FingerprintIndex(dim=64)
    f32_idx.add(embeddings)
    f32_idx.save(p32)
    assert p16.stat().st_size < 0.75 * p32.stat().st_size

    loaded = FingerprintIndex.load(p16)
    assert loaded.storage == "bf16"
    assert len(loaded) == len(embeddings)
    eq = _quantized(embeddings)
    np.testing.assert_array_equal(loaded._flat_embeddings(), eq)
    eqd = _qdirs(embeddings)
    # idempotent re-save: quantizing quantized values changes nothing
    loaded.save(p16)
    np.testing.assert_array_equal(
        FingerprintIndex.load(p16)._flat_embeddings(), eq)

    k = 10
    s, i = loaded.search(eq[:25], k=k)
    sims = eqd[:25] @ eqd.T
    o = np.take_along_axis(sims, np.argsort(-sims, axis=1)[:, :k], axis=1)
    np.testing.assert_allclose(s, o, atol=2e-5)


def test_rescore_uses_quantized_query_domain():
    """ADVICE r4 #1 regression: with a bf16-RESIDENT corpus and f32 queries
    NOT on the bf16 grid, certified-bf16's HIGH rescore must report scores
    in the same cos(q(query), stored-direction) domain as the threshold
    certificate and the exact repairs. An f32-query rescore shifts boundary
    scores by up to the query-quantization term (~0.003) that
    _BF16_STORE_EPS does not budget — an item could then report >= thr
    without certified completeness, and repaired vs rescored rows would mix
    two score domains in one result matrix."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import jax.numpy as jnp
    from tools.exp_topk_precision import make_corpus
    from video_fingerprint_tpu.ops.topk import topk_search

    e = make_corpus(600, 64, seed=11)
    rng = np.random.default_rng(7)
    # off-grid queries: near-duplicates of corpus rows plus a small f32
    # perturbation, so (a) the threshold bites and (b) quantizing the query
    # actually moves the cosine (~1e-4..1e-3 >> the 2e-5 contract)
    q = e[:80] + 1e-3 * rng.normal(size=(80, e.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    e16 = jnp.asarray(e, jnp.bfloat16)
    k, thr = 20, 0.95
    s, i = topk_search(q, e16, k, query_block=64,
                       method="certified-bf16", exact_above=thr)
    s, i = np.asarray(s), np.asarray(i)

    # the one true domain: cos(quantized query, stored direction)
    qq = _quantized(q)
    qq /= np.linalg.norm(qq, axis=1, keepdims=True)
    sims = qq @ _qdirs(e).T
    live = np.isfinite(s)
    chosen = np.take_along_axis(sims, i, axis=1)
    np.testing.assert_allclose(s[live], chosen[live], atol=2e-5)
    # completeness holds in the same domain the scores are reported in
    for row in range(len(q)):
        want = set(np.flatnonzero(sims[row] >= thr).tolist())
        if len(want) < k:
            got = {int(j) for ss, j in zip(s[row], i[row])
                   if ss >= thr - 2e-5}
            assert want <= got, (row, want - got)


def test_watchdog_env_overrides(embeddings, monkeypatch):
    """The dispatch budgets and wide-top-k chunk are deployment properties
    (the axon execution watchdog), overridable via env without code edits
    (VERDICT r4 weak #3); a tiny budget through the env path must slab and
    still return bit-identical results."""
    from video_fingerprint_tpu.ops import topk as T

    monkeypatch.setenv("VFP_WIDE_TOPK_CHUNK", "128")
    assert T._wide_chunk() == 128
    monkeypatch.delenv("VFP_WIDE_TOPK_CHUNK")
    assert T._wide_chunk() == T._WIDE_TOPK_CHUNK

    monkeypatch.setenv("VFP_DISPATCH_CELLS", "12345")
    assert T._dispatch_budget("exact") == 12345.0
    monkeypatch.setenv("VFP_DISPATCH_CELLS_EXACT", "777")
    assert T._dispatch_budget("exact") == 777.0  # per-method wins
    assert T._dispatch_budget("certified") == 12345.0
    monkeypatch.setenv("VFP_DISPATCH_CELLS", "inf")
    monkeypatch.delenv("VFP_DISPATCH_CELLS_EXACT")
    assert T._dispatch_budget("certified-bf16") == float("inf")

    k = 10
    ref_s, ref_i = T.topk_search(embeddings, embeddings, k,
                                 query_block=64, method="exact")
    # 333 x 1024-padded = 341k cells; 70k forces ~6 slabbed dispatches
    monkeypatch.setenv("VFP_DISPATCH_CELLS", "70000")
    s, i = T.topk_search(embeddings, embeddings, k,
                         query_block=64, method="exact")
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(ref_i))
    # inf disables slabbing entirely (single dispatch), same results
    monkeypatch.setenv("VFP_DISPATCH_CELLS", "inf")
    s, i = T.topk_search(embeddings, embeddings, k,
                         query_block=64, method="exact")
    np.testing.assert_array_equal(np.asarray(s), np.asarray(ref_s))
