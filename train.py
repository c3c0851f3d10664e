#!/usr/bin/env python
"""Train CLI entry point (same surface as the reference's train.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from video_fingerprint_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
