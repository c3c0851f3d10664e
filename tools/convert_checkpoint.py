"""Convert a reference PyTorch checkpoint (.pth) to the native format (.ckpt).

The scanner and trainer accept .pth directly (training/checkpoint.py
load_any), but conversion removes the torch dependency from serving paths.

Usage: python tools/convert_checkpoint.py input.pth output.ckpt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="reference .pth checkpoint")
    parser.add_argument("output", help="output .ckpt path")
    args = parser.parse_args()

    if not Path(args.input).exists():
        print(f"Error: {args.input} does not exist")
        return 1

    from video_fingerprint_tpu.training.checkpoint import save_checkpoint
    from video_fingerprint_tpu.utils.torch_compat import load_torch_checkpoint

    variables, config = load_torch_checkpoint(args.input)

    # carry the training counters/bests through when present
    import torch

    raw = torch.load(args.input, map_location="cpu", weights_only=False)
    save_checkpoint(
        args.output,
        variables["params"],
        variables["batch_stats"],
        config,
        epoch=int(raw.get("epoch", 0)),
        global_step=int(raw.get("global_step", 0)),
        bests={
            "best_val_loss": float(raw.get("best_val_loss", float("inf"))),
            "best_val_acc": float(raw.get("best_val_acc", 0.0)),
            "best_auc_roc": float(raw.get("best_auc_roc", 0.0)),
        },
    )
    print(f"Converted {args.input} -> {args.output} "
          f"(model_type={config.get('model_type', 'attention')})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
