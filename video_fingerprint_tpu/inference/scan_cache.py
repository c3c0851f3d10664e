"""Persistent scan index: incremental re-scans skip unchanged videos.

Beyond-reference feature (the reference re-decodes and re-forwards every
video on every scan, fingerprint.py:322-415): `vfp-scan --index cache.npz`
loads fingerprints from a previous scan and reuses them for any file whose
size and content hash (md5 of the first 1 MiB — the reference's own identity,
fingerprint.py:436-448) are unchanged, then saves the updated index. At the
measured >10k videos/s device throughput the scan is host-decode-bound, so
skipping decode for the unchanged corpus majority is the dominant win for
repeated scans over growing libraries.

Storage is `inference.index.FingerprintIndex` (one .npz: embeddings +
per-video meta + model identity), so the same file also serves the
`--against` query-vs-corpus mode. Loading validates the stored model
identity against the running model: embeddings from a different checkpoint
live in a different space and silently reusing them would corrupt duplicate
detection — a mismatched or corrupt index degrades loudly to a full rescan.
"""

from __future__ import annotations

from typing import Dict, Optional

from video_fingerprint_tpu.inference.index import (
    FingerprintIndex,
    identity_mismatch,
)


def save_cache(path, fingerprints: Dict[str, dict],
               model_identity: Optional[dict] = None,
               storage: str = "f32") -> None:
    """fingerprints: {path: {embedding, name, size, file_hash, ...}}.
    storage="bf16" halves the index file (see FingerprintIndex)."""
    dims = {len(fp["embedding"]) for fp in fingerprints.values()}
    index = FingerprintIndex(dim=dims.pop() if len(dims) == 1 else 256,
                             model_identity=model_identity, storage=storage)
    index.add_fingerprints(fingerprints)
    index.save(path)


def load_cache(path, expect_identity: Optional[dict] = None) -> Dict[str, dict]:
    """Returns {} for a missing, corrupt, or model-mismatched index (the scan
    then proceeds as a full rescan)."""
    from pathlib import Path

    path = Path(path)
    if not path.exists():
        return {}
    try:
        index = FingerprintIndex.load(path)
    except Exception as e:  # noqa: BLE001 - a bad index must not sink the scan
        print(f"Warning: scan index {path} is unreadable ({e}); "
              f"performing a full rescan")
        return {}
    reason = identity_mismatch(index.model_identity, expect_identity)
    if reason is None and expect_identity and not index.model_identity:
        # legacy index without identity: the embedding dim is the only check
        dim = expect_identity.get("embedding_dim")
        if dim is not None and len(index) and index.dim != dim:
            reason = f"embedding_dim: index has {index.dim}, model has {dim}"
    if reason:
        print(f"Warning: scan index {path} was built by a different model "
              f"({reason}); ignoring it and performing a full rescan")
        return {}
    return index.fingerprints()
