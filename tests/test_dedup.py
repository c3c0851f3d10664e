"""Duplicate-grouping semantics (C27) with crafted embeddings.

Exercises both search paths — full all-pairs matrix (reference
fingerprint.py:482-513 semantics) and on-TPU top-k candidates (the FAISS
replacement, fingerprint.py:515-548 semantics) — plus exact-duplicate tagging.
"""

import numpy as np
import pytest


def _make_fingerprints():
    """10 embeddings: (0,1) identical w/ same hash, (2,3) cos≈0.97 distinct
    hashes, 4-9 mutually near-orthogonal."""
    rng = np.random.default_rng(7)
    D = 32
    basis = np.linalg.qr(rng.normal(size=(D, D)))[0]
    embs = {}
    embs[0] = basis[0]
    embs[1] = basis[0].copy()
    e2 = basis[1]
    e3 = 0.97 * basis[1] + np.sqrt(1 - 0.97**2) * basis[2]
    embs[2], embs[3] = e2, e3
    for i in range(4, 10):
        embs[i] = basis[i]

    fingerprints = {}
    for i in range(10):
        path = f"/videos/v{i}.mp4"
        fingerprints[path] = {
            "embedding": embs[i].astype(np.float32),
            "path": path,
            "name": f"v{i}.mp4",
            "size": 1000 + i,
            "file_hash": "samehash" if i in (0, 1) else f"hash{i}",
            "embedding_norm": 1.0,
        }
    return fingerprints


@pytest.fixture(scope="module")
def scanner_cls():
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    # grouping methods don't touch the model; build a bare instance
    sc = FingerprintScanner.__new__(FingerprintScanner)
    return sc


@pytest.mark.parametrize("topk_threshold", [100, 0])  # direct path / top-k path
def test_grouping(scanner_cls, topk_threshold):
    fingerprints = _make_fingerprints()
    groups = scanner_cls.find_duplicates(
        fingerprints, similarity_threshold=0.95, topk_threshold=topk_threshold
    )
    assert len(groups) == 2
    by_names = sorted(tuple(sorted(i["name"] for i in g)) for g in groups)
    assert by_names == [("v0.mp4", "v1.mp4"), ("v2.mp4", "v3.mp4")]

    g01 = next(g for g in groups if g[0]["name"] in ("v0.mp4", "v1.mp4"))
    assert all(item["exact_duplicate"] for item in g01)
    g23 = next(g for g in groups if g[0]["name"] in ("v2.mp4", "v3.mp4"))
    assert not any(item["exact_duplicate"] for item in g23)
    for g in groups:
        for item in g:
            assert 0.94 <= item["similarity"] <= 1.0 + 1e-5


def test_fewer_than_two(scanner_cls):
    fingerprints = dict(list(_make_fingerprints().items())[:1])
    assert scanner_cls.find_duplicates(fingerprints, 0.9) == []


def test_topk_path_pow2_padding_matches_direct(scanner_cls):
    """The top-k search pads the corpus to a pow2 bucket (one compile per
    bucket, not per corpus size). Zero pad rows and negative sims must not
    change the grouping: compare against the all-pairs direct path on a
    corpus just past a bucket boundary with anti-correlated pairs."""
    rng = np.random.default_rng(11)
    n, D = 130, 32  # pads to 256
    e = rng.normal(size=(n, D)).astype(np.float32)
    e[1] = e[0]                 # one duplicate pair
    e[3] = -e[2]                # strongly negative sim pair
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    fps = {
        f"/v/{i}.mp4": {
            "embedding": e[i], "path": f"/v/{i}.mp4", "name": f"{i}.mp4",
            "size": i, "file_hash": f"h{min(i, 1)}" if i in (0, 1) else f"h{i}",
            "embedding_norm": 1.0,
        }
        for i in range(n)
    }
    g_topk = scanner_cls.find_duplicates(fps, similarity_threshold=0.95,
                                         topk_threshold=0)
    g_direct = scanner_cls.find_duplicates(fps, similarity_threshold=0.95,
                                           topk_threshold=10**9)
    names = lambda gs: sorted(tuple(sorted(i["name"] for i in g)) for g in gs)  # noqa: E731
    assert names(g_topk) == names(g_direct)
    assert ("0.mp4", "1.mp4") in names(g_topk)


def test_greedy_no_revisit(scanner_cls):
    """An index claimed by an earlier group never re-appears (processed-set
    semantics, fingerprint.py:495-505)."""
    fingerprints = _make_fingerprints()
    groups = scanner_cls.find_duplicates(fingerprints, similarity_threshold=0.5)
    seen = [i["path"] for g in groups for i in g]
    assert len(seen) == len(set(seen))


def test_grouping_sharded_branch_matches_direct(scanner_cls):
    """On a multi-device platform with n >= 8*devices, find_duplicates
    routes through the corpus-sharded ring search with the grouping
    threshold threaded as the certified exact_above — groups must equal
    the direct all-pairs path."""
    import jax

    assert len(jax.devices()) == 8  # conftest mesh
    rng = np.random.default_rng(3)
    D, n = 64, 80  # n >= 8 * devices: forces the sharded branch
    base = np.linalg.qr(rng.normal(size=(n, n)))[0][:, :D].astype(np.float32)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    # plant 3 near-duplicate pairs among near-orthogonal rows
    for a, b in ((0, 1), (10, 11), (20, 21)):
        base[b] = 0.98 * base[a] + np.sqrt(1 - 0.98**2) * base[b]
        base[b] /= np.linalg.norm(base[b])
    fingerprints = {
        f"/videos/s{i}.mp4": {
            "embedding": base[i], "path": f"/videos/s{i}.mp4",
            "name": f"s{i}.mp4", "size": 1000 + i,
            "file_hash": f"hash{i}", "embedding_norm": 1.0,
        }
        for i in range(n)
    }
    direct = scanner_cls.find_duplicates(
        fingerprints, similarity_threshold=0.95, topk_threshold=10**9)
    sharded = scanner_cls.find_duplicates(
        fingerprints, similarity_threshold=0.95, topk_threshold=0)
    names = lambda gs: sorted(tuple(sorted(i["name"] for i in g)) for g in gs)
    assert names(direct) == names(sharded)
    assert names(direct) == [("s0.mp4", "s1.mp4"), ("s10.mp4", "s11.mp4"),
                             ("s20.mp4", "s21.mp4")]
