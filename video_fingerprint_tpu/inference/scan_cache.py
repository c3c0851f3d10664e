"""Persistent scan index: incremental re-scans skip unchanged videos.

Beyond-reference feature (the reference re-decodes and re-forwards every
video on every scan, fingerprint.py:322-415): `vfp-scan --index cache.npz`
loads fingerprints from a previous scan and reuses them for any file whose
size and content hash (md5 of the first 1 MiB — the reference's own identity,
fingerprint.py:436-448) are unchanged, then saves the updated index. At the
measured >10k videos/s device throughput the scan is host-decode-bound, so
skipping decode for the unchanged corpus majority is the dominant win for
repeated scans over growing libraries.

Format: one .npz — `embeddings` (N, D) float32 + `meta` (JSON) with the
per-video metadata minus the embedding. Same content as the results-JSON
fingerprints section, so the cache is also loadable as a corpus snapshot.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict

import numpy as np


def save_cache(path, fingerprints: Dict[str, dict]) -> None:
    """fingerprints: {path: {embedding, name, size, file_hash, ...}}."""
    path = Path(path)
    items = sorted(fingerprints.items())
    embeddings = (
        np.stack([np.asarray(fp["embedding"], np.float32) for _, fp in items])
        if items else np.zeros((0, 0), np.float32)
    )
    meta = [
        {k: v for k, v in fp.items() if k != "embedding"} | {"path": p}
        for p, fp in items
    ]
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:  # file handle: savez would append ".npz" to a name
        np.savez_compressed(f, embeddings=embeddings,
                            meta=np.array(json.dumps(meta)))
    tmp.replace(path)


def load_cache(path) -> Dict[str, dict]:
    """Returns {} for a missing file (first scan)."""
    path = Path(path)
    if not path.exists():
        return {}
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    embeddings = data["embeddings"]
    out: Dict[str, dict] = {}
    for i, m in enumerate(meta):
        m = dict(m)
        m["embedding"] = np.asarray(embeddings[i], np.float32)
        out[m["path"]] = m
    return out
