"""Export a native .ckpt to a reference-compatible PyTorch .pth checkpoint.

The produced file loads directly in the original scanner
(`fingerprint.py --model exported.pth`) — bidirectional interop with the
reference ecosystem for both model families.

Usage: python tools/export_torch_checkpoint.py input.ckpt output.pth
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="native .ckpt checkpoint")
    parser.add_argument("output", help="output .pth path")
    args = parser.parse_args()

    if not Path(args.input).exists():
        print(f"Error: {args.input} does not exist")
        return 1

    import torch

    from video_fingerprint_tpu.training.checkpoint import load_checkpoint
    from video_fingerprint_tpu.utils.torch_compat import variables_to_state_dict

    payload = load_checkpoint(args.input)
    config = payload["config"]
    sd_np = variables_to_state_dict(
        payload["model"], config.get("model_type", "attention")
    )
    sd = {k: torch.from_numpy(v.copy()) for k, v in sd_np.items()}
    train = payload.get("train", {})
    ckpt = {
        "epoch": int(train.get("epoch", 0)),
        "global_step": int(train.get("global_step", 0)),
        "model_state_dict": sd,
        "config": config,
        "best_val_loss": float(train.get("bests", {}).get("best_val_loss", 0.0)),
        "best_val_acc": float(train.get("bests", {}).get("best_val_acc", 0.0)),
        "best_auc_roc": float(train.get("bests", {}).get("best_auc_roc", 0.0)),
    }
    torch.save(ckpt, args.output)
    print(f"Exported {args.input} -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
