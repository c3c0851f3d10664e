"""End-to-end scan: synthetic corpus -> fingerprints -> duplicates -> JSON.

Covers the minimum end-to-end slice (SURVEY.md §7 step 3): decode ->
preprocess -> jitted model -> embedding -> dedup -> report, plus the CLI/JSON
contract (C26, C28-C29) and the batched-vs-sequential equivalence that the
masked bucketed pipeline must guarantee.
"""

import json

import numpy as np
import pytest

from tests.conftest import REPO_ROOT


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    d = tmp_path_factory.mktemp("videos")
    paths = make_corpus(d, num_unique=4, num_frames=40, duplicates=2)
    return d, paths


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    """A random-init attention checkpoint in our format."""
    import jax
    import jax.numpy as jnp

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.checkpoint import save_checkpoint

    model = create_model("attention")
    variables = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 4, 64, 64, 3)))
    config = {
        "model_type": "attention",
        "frame_size": 64,
        "max_frames": 500,
        "embedding_dim": 256,
        "spatial_dim": 128,
        "temporal_dim": 256,
        "num_attention_blocks": 4,
    }
    path = tmp_path_factory.mktemp("ckpt") / "last.ckpt"
    save_checkpoint(path, variables["params"], variables["batch_stats"], config)
    return str(path)


@pytest.fixture(scope="module")
def scanner(ckpt_path):
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    return FingerprintScanner(ckpt_path, device="cpu", batch_size=4,
                              buckets=(32, 64))


def test_scan_finds_exact_duplicates(scanner, corpus, tmp_path):
    d, paths = corpus
    fingerprints = scanner.scan_directory(d, num_workers=2)
    assert len(fingerprints) == 6

    for meta in fingerprints.values():
        assert meta["embedding"].shape == (256,)
        assert meta["embedding_norm"] == pytest.approx(1.0, abs=1e-3)
        assert set(meta) == {
            "embedding", "path", "name", "size", "file_hash", "embedding_norm",
        }

    # Byte-identical copies must produce (bitwise-)identical embeddings.
    # (A random-init model cannot separate *distinct* videos — grouping
    # semantics are unit-tested with crafted embeddings in test_dedup.py.)
    by_name = {meta["name"]: meta for meta in fingerprints.values()}
    for i in range(2):
        a = by_name[f"video_{i}.mp4"]["embedding"]
        b = by_name[f"video_{i}_copy.mp4"]["embedding"]
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert by_name[f"video_{i}.mp4"]["file_hash"] == by_name[f"video_{i}_copy.mp4"]["file_hash"]

    groups = scanner.find_duplicates(fingerprints, similarity_threshold=0.999999)

    # JSON contract
    from video_fingerprint_tpu.inference.report import save_results

    out = tmp_path / "results.json"
    save_results(fingerprints, groups, out, scanner.config, scanner.model_type)
    results = json.loads(out.read_text())
    assert set(results) == {"metadata", "fingerprints", "duplicate_groups"}
    md = results["metadata"]
    assert set(md) == {
        "scan_date", "total_videos", "duplicate_groups", "model_config", "model_type",
    }
    assert md["total_videos"] == 6
    any_fp = next(iter(results["fingerprints"].values()))
    assert isinstance(any_fp["embedding"], list) and len(any_fp["embedding"]) == 256
    # embeddings inside groups are serialized too (reference would crash here)
    assert isinstance(results["duplicate_groups"][0][0]["embedding"], list)


def test_batched_equals_sequential(scanner, corpus):
    """Bucketed masked batching must reproduce sequential batch=1 results."""
    d, _ = corpus
    seq = scanner.scan_directory(d, num_workers=1, batched=False)
    bat = scanner.scan_directory(d, num_workers=2, batched=True)
    assert set(seq) == set(bat)
    for path in seq:
        a, b = seq[path]["embedding"], bat[path]["embedding"]
        cos = float(np.dot(a, b))
        assert cos > 0.9999, (path, cos)


def test_cli_smoke(ckpt_path, corpus, tmp_path, capsys):
    d, _ = corpus
    from video_fingerprint_tpu.cli.scan import main

    out = tmp_path / "cli_results.json"
    rc = main([
        "--model", ckpt_path, "--scan", str(d), "--threshold", "0.99",
        "--output", str(out), "--device", "cpu", "--workers", "2", "--batch", "4",
    ])
    assert rc == 0
    assert out.exists()
    results = json.loads(out.read_text())
    assert results["metadata"]["total_videos"] == 6
    captured = capsys.readouterr()
    assert "DUPLICATE REPORT" in captured.out


def test_warmup_compiles_scan_program(ckpt_path, corpus):
    """warmup() pre-compiles the exact masked bucketed program the batched
    scan dispatches — a scan after warmup must hit the jit cache (no new
    compile) and produce identical results. Uses a FRESH scanner: the shared
    fixture's cache is already warm from earlier tests, which would make
    this check vacuous."""
    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    sc = FingerprintScanner(ckpt_path, device="cpu", batch_size=4,
                            buckets=(32, 64))
    d, _ = corpus
    sc.warmup(40)  # bucket covering the corpus' 40-frame videos
    misses_before = sc._fwd_flat_masked._cache_size()
    assert misses_before > 0  # warmup actually compiled something
    bat = sc.scan_directory(d, num_workers=2, batched=True)
    assert sc._fwd_flat_masked._cache_size() == misses_before
    assert len(bat) == 6


def test_incremental_scan_index(scanner, corpus, tmp_path, monkeypatch):
    """--index semantics: unchanged files are reused without decode; changed
    files re-scan; round-tripped cache equals a fresh scan."""
    from video_fingerprint_tpu.data import decode
    from video_fingerprint_tpu.inference.scan_cache import load_cache, save_cache

    d, paths = corpus
    full = scanner.scan_directory(d, num_workers=2, batched=True)
    idx = tmp_path / "scan_index.npz"
    save_cache(idx, full)
    cache = load_cache(idx)
    assert set(cache) == set(full)

    # unchanged corpus: zero decodes
    calls = []
    real = decode.decode_subsampled
    monkeypatch.setattr(
        decode, "decode_subsampled",
        lambda *a, **k: (calls.append(a[0]), real(*a, **k))[1],
    )
    again = scanner.scan_directory(d, num_workers=2, batched=True, cache=cache)
    assert calls == []
    assert set(again) == set(full)
    for p in full:
        assert float(np.dot(again[p]["embedding"], full[p]["embedding"])) > 0.9999

    # touch one file's bytes -> only that file decodes again
    victim = sorted(p for p in full)[0]
    data = open(victim, "rb").read()
    try:
        with open(victim, "wb") as f:
            # flip a byte inside the hashed 1-MiB prefix (same size, new md5);
            # an offset past the mp4 header keeps the file decodable
            f.write(data[:200] + bytes([data[200] ^ 0xFF]) + data[201:])
        third = scanner.scan_directory(d, num_workers=2, batched=True, cache=cache)
        assert [str(c) for c in calls] == [victim]
        assert set(third) == set(full)
    finally:
        # the corpus fixture is module-scoped — restore the original bytes
        with open(victim, "wb") as f:
            f.write(data)


def test_scan_index_model_identity(scanner, corpus, tmp_path, capsys):
    """A scan index records which model produced it; loading it under a
    different checkpoint (or a corrupt file) degrades loudly to a full
    rescan instead of silently mixing embedding spaces (ADVICE r2 medium)."""
    from video_fingerprint_tpu.inference.scan_cache import load_cache, save_cache

    d, _ = corpus
    full = scanner.scan_directory(d, num_workers=2, batched=True)
    idx = tmp_path / "scan_index.npz"
    save_cache(idx, full, model_identity=scanner.model_identity)

    # same model: full reuse
    assert set(load_cache(idx, expect_identity=scanner.model_identity)) == set(full)

    # different checkpoint (param hash differs): invalidated with a warning
    other = dict(scanner.model_identity, param_hash="0" * 32)
    capsys.readouterr()
    assert load_cache(idx, expect_identity=other) == {}
    assert "different model" in capsys.readouterr().out

    # different embedding dim: invalidated
    other = dict(scanner.model_identity, embedding_dim=128)
    assert load_cache(idx, expect_identity=other) == {}

    # legacy index without identity: dim check still applies
    save_cache(idx, full, model_identity=None)
    assert set(load_cache(idx, expect_identity=scanner.model_identity)) == set(full)
    assert load_cache(idx, expect_identity={"embedding_dim": 128}) == {}

    # corrupt index: warn + full rescan, never abort (ADVICE r2 low)
    idx.write_bytes(b"not an npz at all")
    capsys.readouterr()
    assert load_cache(idx, expect_identity=scanner.model_identity) == {}
    assert "unreadable" in capsys.readouterr().out


def test_index_merge_and_query_against_cli(ckpt_path, corpus, tmp_path, capsys):
    """Add-then-query across two scan invocations (VERDICT r2 #6): scan
    library A into an index, scan library B with the same index (A's entries
    survive the save — ADVICE r2 low), then query B against the corpus and
    find the cross-library duplicate."""
    import shutil

    from video_fingerprint_tpu.cli.scan import main
    from video_fingerprint_tpu.inference.index import FingerprintIndex

    d, _ = corpus
    idx = tmp_path / "library_index.npz"
    rc = main(["--model", ckpt_path, "--scan", str(d), "--device", "cpu",
               "--workers", "2", "--batch", "4", "--index", str(idx)])
    assert rc == 0
    assert len(FingerprintIndex.load(idx)) == 6

    # library B: one brand-new file + one byte-identical copy from library A
    lib_b = tmp_path / "library_b"
    lib_b.mkdir()
    src = sorted(d.glob("video_3.mp4"))[0]
    shutil.copy(src, lib_b / "reupload.mp4")

    rc = main(["--model", ckpt_path, "--scan", str(lib_b), "--device", "cpu",
               "--workers", "2", "--batch", "4", "--index", str(idx)])
    assert rc == 0
    merged = FingerprintIndex.load(idx)
    assert len(merged) == 7  # A's 6 entries survived the B scan's save
    assert merged.model_identity["embedding_dim"] == 256

    # query B against the corpus: the reupload matches its original in A
    out = tmp_path / "cross.json"
    capsys.readouterr()
    rc = main(["--model", ckpt_path, "--scan", str(lib_b), "--device", "cpu",
               "--workers", "2", "--batch", "4", "--against", str(idx),
               "--threshold", "0.9999", "--output", str(out)])
    assert rc == 0
    results = json.loads(out.read_text())
    groups = results["duplicate_groups"]
    assert len(groups) == 1
    by_path = {item["path"]: item for item in groups[0]}
    # a random-init model cannot separate distinct videos (all ~0.99999), so
    # assert on the byte-identical pair, which must be md5-flagged exact
    assert by_path[str(lib_b / "reupload.mp4")]["exact_duplicate"]
    assert by_path[str(src)]["exact_duplicate"]
    assert by_path[str(src)]["similarity"] == pytest.approx(1.0, abs=1e-5)
    assert "DUPLICATE REPORT" in capsys.readouterr().out

    # deleting a file and rescanning its library prunes the stale entry
    # (which would otherwise match in --against runs forever) while library
    # A's entries — files still on disk — survive.
    (lib_b / "reupload.mp4").unlink()
    new_file = lib_b / "fresh.mp4"
    shutil.copy(sorted(d.glob("video_1.mp4"))[0], new_file)
    rc = main(["--model", ckpt_path, "--scan", str(lib_b), "--device", "cpu",
               "--workers", "2", "--batch", "4", "--index", str(idx)])
    assert rc == 0
    pruned = FingerprintIndex.load(idx).fingerprints()
    assert str(lib_b / "reupload.mp4") not in pruned
    assert str(new_file) in pruned
    assert len(pruned) == 7  # 6 from A (still on disk) + fresh.mp4


def test_index_prune_scoped_to_scan_root(ckpt_path, corpus, tmp_path):
    """Pruning is scoped to the scanned root (ADVICE r3 medium): a scan of
    library B cannot attest deletions in library A, so an A entry whose
    file is missing (deleted — or a temporarily unmounted share) survives a
    B scan and is only pruned by a rescan of A itself. --no_prune keeps
    even in-root deleted entries."""
    import shutil

    from video_fingerprint_tpu.cli.scan import main
    from video_fingerprint_tpu.inference.index import FingerprintIndex

    d, _ = corpus
    lib_a = tmp_path / "lib_a"
    lib_a.mkdir()
    shutil.copy(sorted(d.glob("video_0.mp4"))[0], lib_a / "a0.mp4")
    shutil.copy(sorted(d.glob("video_1.mp4"))[0], lib_a / "a1.mp4")
    lib_b = tmp_path / "lib_b"
    lib_b.mkdir()
    shutil.copy(sorted(d.glob("video_2.mp4"))[0], lib_b / "b0.mp4")

    idx = tmp_path / "shared.npz"
    base = ["--model", ckpt_path, "--device", "cpu", "--workers", "2",
            "--batch", "4", "--index", str(idx)]
    assert main(base + ["--scan", str(lib_a)]) == 0
    (lib_a / "a1.mp4").unlink()  # A loses a file (or the mount drops)

    # a B scan must NOT prune A's now-missing entry (outside B's root)
    assert main(base + ["--scan", str(lib_b)]) == 0
    fps = FingerprintIndex.load(idx).fingerprints()
    assert str(lib_a / "a1.mp4") in fps
    assert len(fps) == 3

    # a rescan of A with --no_prune keeps it too
    assert main(base + ["--scan", str(lib_a), "--no_prune"]) == 0
    assert str(lib_a / "a1.mp4") in FingerprintIndex.load(idx).fingerprints()

    # only a plain rescan of A itself attests the deletion
    assert main(base + ["--scan", str(lib_a)]) == 0
    fps = FingerprintIndex.load(idx).fingerprints()
    assert str(lib_a / "a1.mp4") not in fps
    assert str(lib_b / "b0.mp4") in fps  # B untouched by the A scan
    assert len(fps) == 2


def test_query_against_rejects_foreign_index(scanner, corpus, tmp_path):
    """--against with an index from a different model must fail loudly."""
    from video_fingerprint_tpu.inference.index import FingerprintIndex

    d, _ = corpus
    fps = scanner.scan_directory(d, num_workers=2, batched=True)
    index = FingerprintIndex(
        dim=256, model_identity=dict(scanner.model_identity, param_hash="f" * 32)
    )
    index.add_fingerprints(fps)
    with pytest.raises(ValueError, match="different model"):
        scanner.find_duplicates_against(fps, index)


def test_fingerprint_index_replace_semantics():
    """add_fingerprints replaces rows for already-indexed paths (rescan wins)
    and round-trips meta through save/load."""
    import numpy as np

    from video_fingerprint_tpu.inference.index import FingerprintIndex

    index = FingerprintIndex(dim=4)
    e1 = np.eye(4, dtype=np.float32)[0]
    e2 = np.eye(4, dtype=np.float32)[1]
    index.add_fingerprints({"a.mp4": {"embedding": e1, "size": 10}})
    index.add_fingerprints({
        "a.mp4": {"embedding": e2, "size": 11},  # replaces
        "b.mp4": {"embedding": e1, "size": 20},
    })
    assert len(index) == 2
    fps = index.fingerprints()
    np.testing.assert_array_equal(fps["a.mp4"]["embedding"], e2)
    assert fps["a.mp4"]["size"] == 11
    assert fps["b.mp4"]["size"] == 20


def test_data_parallel_scan_equals_single(ckpt_path, corpus):
    """--data_parallel: batched extraction sharded over the 8-device mesh
    must equal the single-device scan (pure DP, no semantic change)."""
    import jax

    from video_fingerprint_tpu.inference.scanner import FingerprintScanner

    assert len(jax.devices()) == 8  # conftest's virtual CPU mesh
    dp = FingerprintScanner(ckpt_path, device="cpu", batch_size=4,
                            buckets=(32, 64), data_parallel=True)
    assert dp.mesh is not None and dp.batch_size == 8  # padded to the mesh
    single = FingerprintScanner(ckpt_path, device="cpu", batch_size=4,
                                buckets=(32, 64))
    d, _ = corpus
    a = dp.scan_directory(d, num_workers=2, batched=True)
    b = single.scan_directory(d, num_workers=2, batched=True)
    assert set(a) == set(b)
    for p in a:
        cos = float(np.dot(a[p]["embedding"], b[p]["embedding"]))
        assert cos > 0.9999, (p, cos)
    # the single-video path still works in DP mode (separate placement)
    one = dp.extract_fingerprint(sorted(d.glob("*.mp4"))[1])
    assert one is not None and np.isfinite(one).all()
