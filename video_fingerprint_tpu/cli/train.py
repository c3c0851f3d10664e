"""Train CLI — same flag surface as the reference (train.py:722-770) plus TPU
flags (--device, --mask_padding, --seed). Derived-config rules preserved:
3D model doubles batch and triples LR (train.py:779-781); attention val loader
uses batch x2 (train.py:834-837); no-args quick-test mode (train.py:871-875).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train Video Fingerprint Model (Attention or 3D CNN) on TPU"
    )
    p.add_argument("--data_dir", type=str, required=True, help="Path to video dataset")
    p.add_argument("--batch_size", type=int, default=8, help="Batch size")
    p.add_argument("--epochs", type=int, default=50, help="Number of epochs")
    p.add_argument("--lr", type=float, default=1e-4, help="Learning rate")
    p.add_argument("--num_workers", type=int, default=4, help="Decode workers")
    p.add_argument("--checkpoint", type=str, help="Resume from checkpoint")
    p.add_argument("--no_amp", action="store_true",
                   help="Accepted for compatibility (bf16/f32 is XLA-managed)")
    p.add_argument("--run_name", type=str, help="Custom run name (default: timestamp)")
    p.add_argument("--patience", type=int, default=10, help="Early stopping patience")
    p.add_argument("--model", type=str, default="attention",
                   choices=["attention", "3d"], help="Model type")
    p.add_argument("--clip_length", type=int, default=128, help="3D clip length")
    p.add_argument("--frame_stride", type=int, default=32, help="3D frame stride")
    p.add_argument("--triplet_weight", type=float, default=0.3)
    p.add_argument("--triplet_margin", type=float, default=0.3)
    p.add_argument("--device", type=str, default="tpu",
                   choices=["tpu", "cuda", "cpu"])
    p.add_argument("--seed", type=int, default=0, help="Global RNG seed")
    p.add_argument("--max_frames", type=int, default=500,
                   help="Max frames per video (attention)")
    p.add_argument("--no_mask_padding", action="store_true",
                   help="Reproduce the reference's unmasked padded batches")
    p.add_argument("--profile", action="store_true",
                   help="Capture a jax.profiler trace (xplane) of early steps "
                        "into <run_dir>/profile")
    p.add_argument("--debug_nans", action="store_true",
                   help="Enable jax_debug_nans (fail fast on NaNs)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32); cosine vs the "
                        "f32 reference measured at 0.99998")
    p.add_argument("--orbax", action="store_true",
                   help="Use the Orbax checkpoint backend (directory-based, "
                        "multi-host-safe) instead of single-file msgpack")
    p.add_argument("--remat", action="store_true",
                   help="Rematerialize forward activations in the backward "
                        "pass (jax.checkpoint): less HBM, one extra forward")
    p.add_argument("--device_augment", action="store_true",
                   help="Run the clip augmentations on device inside the "
                        "jitted train step (vectorized jax.random ops; same "
                        "transforms/probabilities as the host pipeline); the "
                        "loader then applies only resize + JPEG recompress. "
                        "Frees host cores on decode-bound boxes")
    p.add_argument("--fast_extracts", action="store_true",
                   help="Attention only: compute extract embeddings from "
                        "gathered rows of the full forward's per-frame "
                        "feature map instead of re-running the CNN on "
                        "gathered pixels — removes ~half the step's CNN "
                        "FLOPs. Only train-mode divergence: extract frames "
                        "are BN-normalized with the full batch's statistics "
                        "(exactly equal at extract_ratio=1.0; validation is "
                        "always exact and reuses features regardless)")
    p.add_argument("--native_decode", action="store_true",
                   help="C++ libav fused decode for eval-mode attention "
                        "loads (falls back to cv2 when unavailable; train "
                        "augmentation always uses cv2 full-res frames)")
    p.add_argument("--auc_flat_eps", type=float, default=1e-3,
                   help="AUC flatness band for the separation-gap tiebreak "
                        "in best-checkpoint selection: an epoch within this "
                        "band of the best AUC whose gap improves still marks "
                        "a new best. Calibrate to the val set's measured "
                        "epoch-to-epoch AUC noise (the 1e-3 default suits "
                        "1k+ val extracts; a 300-extract hard-corpus run "
                        "measured ~3e-3 jitter at its plateau)")
    p.add_argument("--streaming_metrics_threshold", type=int, default=8192,
                   help="Validation switches from dense O(N^2) metrics to "
                        "the streaming O(block*N) path above this many val "
                        "embeddings (2 per video); both are exact — the "
                        "default matches the dense path's memory comfort "
                        "zone on a 16 GB host")
    return p


def main(argv=None) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if not argv:  # quick-test mode (reference train.py:871-875)
        print("Quick test mode...")
        argv = ["--data_dir", "./test_videos", "--batch_size", "2", "--epochs", "2"]
    args = build_parser().parse_args(argv)

    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)

    # multi-host: must run before any other jax call touches the backend
    from video_fingerprint_tpu.parallel.distributed import (
        maybe_initialize_distributed,
    )

    shard_index, shard_count = maybe_initialize_distributed()
    if shard_count > 1:
        print(f"Multi-host: process {shard_index}/{shard_count}")
        if args.batch_size % shard_count != 0:
            print(f"Error: batch_size {args.batch_size} must be divisible by "
                  f"the process count ({shard_count})")
            return 1

    from video_fingerprint_tpu.data.dataset import create_dataloader
    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.training.trainer import Trainer, setup_run_directory

    # single-writer discipline: process 0 creates the run dir (and, for
    # timestamped names, broadcasts the name so Orbax collective saves agree
    # on the path); other processes never write run-dir artifacts.
    from video_fingerprint_tpu.parallel.distributed import broadcast_string

    if args.run_name:
        run_dir = Path("./runs") / args.run_name
        if shard_index == 0:
            run_dir.mkdir(parents=True, exist_ok=True)
    elif shard_index == 0:
        run_dir = setup_run_directory(prefix="3d_" if args.model == "3d" else "")
        broadcast_string(run_dir.name)
    else:
        run_dir = Path("./runs") / broadcast_string("")

    from video_fingerprint_tpu.config import Config

    # derived-config rules from the reference: 3D doubles batch, triples LR
    # (train.py:779-781).
    batch_size = args.batch_size if args.model == "attention" else args.batch_size * 2
    lr = args.lr if args.model == "attention" else args.lr * 3

    config = Config(
        batch_size=batch_size,
        epochs=args.epochs,
        learning_rate=lr,
        max_frames=args.max_frames,
        clip_length=args.clip_length,
        frame_stride=args.frame_stride,
        patience=args.patience,
        data_dir=str(args.data_dir),
        num_workers=args.num_workers,
        model_type=args.model,
        command_line=" ".join(sys.argv),
        triplet_weight=args.triplet_weight,
        triplet_margin=args.triplet_margin,
        device=args.device,
        seed=args.seed,
        mask_padding=not args.no_mask_padding,
        profile=args.profile,
        extras={"remat": args.remat, "bf16": args.bf16,
                "device_augment": args.device_augment,
                "fast_extracts": args.fast_extracts,
                "checkpoint_backend": "orbax" if args.orbax else "msgpack",
                "streaming_metrics_threshold":
                    args.streaming_metrics_threshold,
                "auc_flat_eps": args.auc_flat_eps},
    ).to_dict()

    import jax.numpy as jnp

    model = create_model(
        model_type=args.model,
        spatial_dim=config["spatial_dim"],
        temporal_dim=config["temporal_dim"],
        embedding_dim=config["embedding_dim"],
        num_attention_blocks=config["num_attention_blocks"],
        frame_stride=config["frame_stride"],
        dtype=jnp.bfloat16 if args.bf16 else None,
    )

    per_host_batch = config["batch_size"] // shard_count

    train_loader = create_dataloader(
        args.data_dir,
        batch_size=per_host_batch,
        num_workers=args.num_workers,
        frame_size=config["frame_size"],
        max_frames=config["max_frames"],
        clip_length=config["clip_length"],
        frame_stride=config["frame_stride"],
        mode="train",
        model_type=args.model,
        seed=args.seed,
        shard_index=shard_index,
        shard_count=shard_count,
        decode_backend="native" if args.native_decode else "cv2",
        augment_mode="device" if args.device_augment else "host",
    )
    val_loader = create_dataloader(
        args.data_dir,
        batch_size=per_host_batch * 2
        if args.model == "attention"
        else per_host_batch,
        num_workers=args.num_workers,
        frame_size=config["frame_size"],
        max_frames=config["max_frames"],
        clip_length=config["clip_length"],
        frame_stride=config["frame_stride"],
        mode="val",
        model_type=args.model,
        seed=args.seed,
        shard_index=shard_index,
        shard_count=shard_count,
        decode_backend="native" if args.native_decode else "cv2",
    )

    if len(train_loader) == 0:
        print(f"No usable training batches found in {args.data_dir}")
        return 1

    if args.checkpoint and not Path(args.checkpoint).exists():
        print(f"Error: Checkpoint {args.checkpoint} does not exist")
        return 1

    trainer = Trainer(model, train_loader, val_loader, config, run_dir)
    if args.checkpoint:
        trainer.resume(args.checkpoint)
    trainer.train()
    return 0


if __name__ == "__main__":
    sys.exit(main())
