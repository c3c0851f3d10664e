"""FingerprintIndex — the FAISS `IndexFlatIP` replacement as an API (C27).

The reference's scale path is `faiss.IndexFlatIP` + `index.search`
(fingerprint.py:524-528); this is the same surface backed by on-TPU matmul
top-k, plus persistence. Exact inner-product search by default (no
quantization — what the reference used too); `storage="bf16"` opts into
half-size storage on device and disk, with every search contract holding
w.r.t. the stored vectors (FAISS SQfp16's trade, but with a stated bound).

This is also THE corpus persistence format: one .npz holding the embedding
matrix, the per-video metadata (path/size/md5 — the same content as the
results-JSON fingerprints section), and the identity of the model that
produced the embeddings (config + parameter hash). The `--index` incremental
scan cache (inference/scan_cache.py) and the `--against` query-vs-corpus
mode are both backed by this class, so one saved corpus serves both
workflows. Model identity makes stale indexes fail loudly: embeddings from a
different checkpoint live in a different space, and silently mixing them
corrupts duplicate detection.

    index = FingerprintIndex(dim=256)
    index.add(embeddings)          # (N, 256) float32, appendable
    scores, ids = index.search(queries, k=20)
    index.save("corpus.npz"); index = FingerprintIndex.load("corpus.npz")
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np


def identity_mismatch(stored: Optional[dict], expected: Optional[dict]) -> Optional[str]:
    """Human-readable reason the stored model identity does not match the
    expected one, or None if compatible. Keys present on only one side are
    ignored (forward/backward compatibility); a missing stored identity is
    compatible (legacy index) — dimension checks still apply elsewhere."""
    if not stored or not expected:
        return None
    for key in sorted(stored.keys() & expected.keys()):
        if stored[key] != expected[key]:
            return f"{key}: index has {stored[key]!r}, model has {expected[key]!r}"
    return None


class FingerprintIndex:
    def __init__(
        self,
        dim: int = 256,
        device: Optional[object] = None,
        model_identity: Optional[dict] = None,
        storage: str = "f32",
    ):
        """storage="bf16" stores the corpus in bfloat16 — on device (half
        the HBM residency: ~8M×256 clips fit a 16 GB v5e vs ~4M in f32) and
        on disk (half the .npz embedding bytes). All search contracts hold
        w.r.t. the stored directions (ops/topk.py::stage_padded_corpus);
        reported scores live in the quantized-query domain, so vs true f32
        cosines they move by <= ~0.002 from corpus quantization alone and
        <= ~0.005 when the query is quantized too (search-time queries are
        cast to the corpus dtype) — the same trade as FAISS's SQfp16, with
        stated bounds. Host-side copies stay f32."""
        if storage not in ("f32", "bf16"):
            raise ValueError(f"storage must be 'f32' or 'bf16', got {storage!r}")
        self.dim = dim
        self.storage = storage
        self.model_identity = dict(model_identity or {})
        self._device = device  # resolved lazily: load/save must not touch jax
        self._chunks: list[np.ndarray] = []
        self._meta: List[dict] = []
        self._staged = None  # (bucket-padded device corpus, n_true) tuple
        self._staged_sharded = None  # (row-sharded device corpus, n) tuple
        self._dirty = False

    def __len__(self) -> int:
        return sum(c.shape[0] for c in self._chunks)

    @property
    def device(self):
        if self._device is None:
            import jax

            self._device = jax.devices()[0]
        return self._device

    def add(self, embeddings: np.ndarray, meta: Optional[List[dict]] = None) -> None:
        embeddings = np.ascontiguousarray(embeddings, dtype=np.float32)
        if embeddings.ndim != 2 or embeddings.shape[1] != self.dim:
            raise ValueError(f"expected (N, {self.dim}) embeddings, "
                             f"got {embeddings.shape}")
        if meta is not None and len(meta) != embeddings.shape[0]:
            raise ValueError(f"{len(meta)} meta entries for "
                             f"{embeddings.shape[0]} embeddings")
        self._chunks.append(embeddings)
        self._meta.extend(meta if meta is not None
                          else [{}] * embeddings.shape[0])
        self._dirty = True

    def add_fingerprints(self, fingerprints: Dict[str, dict]) -> None:
        """Append scanner output ({path: {embedding, name, size, ...}}).
        Entries whose path is already indexed are replaced (rescan wins)."""
        if not fingerprints:
            return
        existing = {m.get("path"): i for i, m in enumerate(self._meta)}
        updates, new_embs, new_meta = {}, [], []
        for path, fp in sorted(fingerprints.items()):
            emb = np.asarray(fp["embedding"], np.float32)
            meta = {k: v for k, v in fp.items() if k != "embedding"}
            meta["path"] = path
            if path in existing:
                updates[existing[path]] = (emb, meta)
            else:
                new_embs.append(emb)
                new_meta.append(meta)
        if updates:
            flat = self._flat_embeddings()
            for i, (emb, meta) in updates.items():
                flat[i] = emb
                self._meta[i] = meta
            self._chunks = [flat]
        if new_embs:
            self.add(np.stack(new_embs), new_meta)
        self._dirty = True

    def fingerprints(self) -> Dict[str, dict]:
        """{path: {embedding, ...meta}} — the scanner's fingerprint shape,
        usable directly as the incremental-scan cache."""
        flat = self._flat_embeddings()
        out: Dict[str, dict] = {}
        for i, m in enumerate(self._meta):
            entry = dict(m)
            entry["embedding"] = np.asarray(flat[i], np.float32)
            out[m.get("path", f"#{i}")] = entry
        return out

    def meta(self, i: int) -> dict:
        return self._meta[i]

    def _flat_embeddings(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros((0, self.dim), np.float32)
        if len(self._chunks) > 1:
            self._chunks = [np.concatenate(self._chunks, axis=0)]
        return self._chunks[0]

    def _corpus(self):
        """(device_array, n) staged PRE-PADDED to the search bucket, so
        repeated searches skip topk_search's per-call O(N·D) pad copy
        (ADVICE r3 low)."""
        if self._staged is None or self._dirty:
            from video_fingerprint_tpu.ops.topk import stage_padded_corpus

            if not self._chunks:
                raise ValueError("index is empty")
            self._staged = stage_padded_corpus(
                self._flat_embeddings(), self.device,
                dtype="bf16" if self.storage == "bf16" else None,
            )
            self._dirty = False
        return self._staged

    def search(self, queries: np.ndarray, k: int = 20,
               exact_above: Optional[float] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Exact inner-product k-NN. Returns (scores (M, k), indices (M, k));
        k is capped at the corpus size (FAISS pads with -1, we cap instead).
        `exact_above`: when the caller only consumes candidates at or above a
        similarity threshold (duplicate grouping), passing it here lets the
        certified-approx top-k use its cheaper threshold certificate
        (ops/topk.py) — results are still exhaustive above the threshold.

        On a multi-device platform with a large corpus the search runs
        corpus-sharded (ops/topk.py::sharded_topk_search, per-device memory
        O(N/d·D)) — same condition as the scanner's self-search, with the
        same certified-approx auto selection and `exact_above` semantics as
        the single-device branch. The row-sharded staged corpus is cached
        like the single-device one, so repeated queries against a static
        corpus upload it once."""
        import jax
        import jax.numpy as jnp

        from video_fingerprint_tpu.ops.topk import (
            sharded_topk_search,
            stage_sharded_corpus,
            topk_search,
        )

        n = len(self)
        k = min(k, n)
        n_dev = len(jax.devices())
        if n_dev > 1 and n >= 8 * n_dev:
            if self._staged_sharded is None or self._dirty:
                from video_fingerprint_tpu.parallel.mesh import make_mesh

                self._staged_sharded = stage_sharded_corpus(
                    self._flat_embeddings(), make_mesh("corpus"),
                    dtype="bf16" if self.storage == "bf16" else None,
                )
                # _dirty is shared with _corpus(): drop its stale cache too
                self._staged = None
                self._dirty = False
            scores, idx = sharded_topk_search(
                np.ascontiguousarray(queries, np.float32),
                self._staged_sharded, k, exact_above=exact_above,
            )
            return np.asarray(scores), np.asarray(idx)
        corpus, n_true = self._corpus()
        q = jax.device_put(jnp.asarray(np.ascontiguousarray(queries, np.float32)),
                           self.device)
        scores, idx = topk_search(q, corpus, k, exact_above=exact_above,
                                  n_valid=n_true)
        return np.asarray(scores), np.asarray(idx)

    def save(self, path) -> None:
        """Atomic write: embeddings + meta JSON + model-identity JSON.
        storage="bf16" writes the quantized matrix as a uint16 bit view
        (np.savez cannot hold ml_dtypes natively under allow_pickle=False) —
        half the embedding bytes; save/load round-trips are idempotent
        (re-quantizing quantized values is the identity)."""
        path = Path(path)
        tmp = path.with_suffix(path.suffix + ".tmp")
        arrays = {
            "meta": np.array(json.dumps(self._meta)),
            "model_identity": np.array(json.dumps(self.model_identity)),
        }
        if self.storage == "bf16":
            import ml_dtypes

            arrays["embeddings_bf16"] = (
                self._flat_embeddings().astype(ml_dtypes.bfloat16)
                .view(np.uint16))
        else:
            arrays["embeddings"] = self._flat_embeddings()
        with open(tmp, "wb") as f:  # handle: savez would append ".npz" to a name
            np.savez_compressed(f, **arrays)
        tmp.replace(path)

    @classmethod
    def load(cls, path, device: Optional[object] = None) -> "FingerprintIndex":
        """Loads current and legacy formats (meta/model_identity optional).
        A bf16-format file restores storage="bf16" (host copy upcast to the
        f32 values of the stored bf16 numbers)."""
        data = np.load(Path(path), allow_pickle=False)
        storage = "f32"
        if "embeddings_bf16" in data:
            import ml_dtypes

            storage = "bf16"
            emb = (data["embeddings_bf16"].view(ml_dtypes.bfloat16)
                   .astype(np.float32))
        else:
            emb = data["embeddings"]
        meta = json.loads(str(data["meta"])) if "meta" in data else None
        identity = (json.loads(str(data["model_identity"]))
                    if "model_identity" in data else {})
        index = cls(dim=emb.shape[1] if emb.size else 256, device=device,
                    model_identity=identity, storage=storage)
        if emb.size:
            index.add(emb, meta)
        elif meta:
            index._meta = list(meta)
        return index
