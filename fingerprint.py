#!/usr/bin/env python
"""Scanner CLI entry point (same surface as the reference's fingerprint.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from video_fingerprint_tpu.cli.scan import main

if __name__ == "__main__":
    sys.exit(main())
