"""FingerprintIndex — the FAISS `IndexFlatIP` replacement as an API (C27).

The reference's scale path is `faiss.IndexFlatIP` + `index.search`
(fingerprint.py:524-528); this is the same surface backed by on-TPU matmul
top-k, plus persistence. Exact inner-product search (no quantization), which
is what the reference used too.

    index = FingerprintIndex(dim=256)
    index.add(embeddings)          # (N, 256) float32, appendable
    scores, ids = index.search(queries, k=20)
    index.save("corpus.npz"); index = FingerprintIndex.load("corpus.npz")
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from video_fingerprint_tpu.ops.topk import topk_search


class FingerprintIndex:
    def __init__(self, dim: int = 256, device: Optional[object] = None):
        self.dim = dim
        self.device = device or jax.devices()[0]
        self._chunks: list[np.ndarray] = []
        self._staged = None  # device-resident (N, dim) corpus
        self._dirty = False

    def __len__(self) -> int:
        return sum(c.shape[0] for c in self._chunks)

    def add(self, embeddings: np.ndarray) -> None:
        embeddings = np.ascontiguousarray(embeddings, dtype=np.float32)
        if embeddings.ndim != 2 or embeddings.shape[1] != self.dim:
            raise ValueError(f"expected (N, {self.dim}) embeddings, "
                             f"got {embeddings.shape}")
        self._chunks.append(embeddings)
        self._dirty = True

    def _corpus(self):
        if self._staged is None or self._dirty:
            if not self._chunks:
                raise ValueError("index is empty")
            self._staged = jax.device_put(
                jnp.asarray(np.concatenate(self._chunks, axis=0)), self.device
            )
            self._dirty = False
        return self._staged

    def search(self, queries: np.ndarray, k: int = 20) -> Tuple[np.ndarray, np.ndarray]:
        """Exact inner-product k-NN. Returns (scores (M, k), indices (M, k));
        k is capped at the corpus size (FAISS pads with -1, we cap instead)."""
        corpus = self._corpus()
        k = min(k, corpus.shape[0])
        q = jax.device_put(jnp.asarray(np.ascontiguousarray(queries, np.float32)),
                           self.device)
        scores, idx = topk_search(q, corpus, k)
        return np.asarray(scores), np.asarray(idx)

    def save(self, path) -> None:
        np.savez_compressed(path, embeddings=np.concatenate(self._chunks, axis=0)
                            if self._chunks else np.zeros((0, self.dim), np.float32))

    @classmethod
    def load(cls, path, device: Optional[object] = None) -> "FingerprintIndex":
        data = np.load(Path(path))
        emb = data["embeddings"]
        index = cls(dim=emb.shape[1] if emb.size else 256, device=device)
        if emb.size:
            index.add(emb)
        return index
