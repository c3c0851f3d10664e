"""video_fingerprint_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video fingerprinting
framework with the capabilities of the `video-fingerprint` reference project.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  - data/        L0/L1/L2: unified decode + preprocess + augmentation + batching
  - models/      L3: Flax models (attention + 3D CNN), NHWC/NDHWC layouts
  - ops/         L3: losses, pooling, metrics, sharded top-k, Pallas kernels
  - parallel/    mesh + sharding utilities (DP over ICI, corpus-sharded dedup)
  - training/    L4: pjit train step, optax chains, checkpoint/resume, run dirs
  - inference/   L5: scanner, dedup, JSON/report CLI contract
"""

__version__ = "0.1.0"

from video_fingerprint_tpu.models import create_model  # noqa: F401
