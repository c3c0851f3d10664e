"""Generate golden parity fixtures by RUNNING the PyTorch reference.

Executes the reference models (imported from /root/reference, never copied)
on synthetic inputs and records state_dicts, inputs, outputs, and loss-term
values into tests/fixtures/*.npz. These are the goldens for the >=0.999
embedding-cosine-agreement gate (BASELINE.md north star) and for loss parity.

Usage: python tools/gen_torch_fixtures.py [--out tests/fixtures]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

REFERENCE_DIR = Path("/root/reference")


def _flat_state_dict(model):
    return {
        f"sd::{k}": v.detach().cpu().numpy()
        for k, v in model.state_dict().items()
        if k != "pos_encoding.pe"  # deterministic buffer, recomputed on our side
    }


def gen_attention(out_dir: Path, torch, ref):
    torch.manual_seed(0)
    model = ref.create_model("attention")

    # Perturb BN running stats away from (0, 1) so BN parity is non-trivial.
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(torch.rand(2, 12, 3, 64, 64))
    model.eval()

    data = _flat_state_dict(model)

    # Parity inputs: BASELINE config #1 (32-frame 64x64 single video) plus a
    # batched case and a short-clip case.
    cases = {
        "in_single32": torch.rand(1, 32, 3, 64, 64),
        "in_batch": torch.rand(4, 24, 3, 64, 64),
        "in_short": torch.rand(2, 10, 3, 64, 64),
    }
    # Reference-semantics padded batch (VERDICT #8): collate zero-pads ragged
    # clips to the batch max (reference dataset.py:495-528) and the model
    # forwards them unmasked (model.py:272-298) — padding pollutes attention
    # and pooling. Our mask=None path must reproduce that pollution exactly.
    padded = torch.rand(3, 24, 3, 64, 64)
    for i, true_len in enumerate([24, 16, 9]):
        padded[i, true_len:] = 0.0
    cases["in_padded"] = padded
    with torch.no_grad():
        for name, video in cases.items():
            emb = model(video)
            data[name] = video.numpy()
            data[name.replace("in_", "out_")] = emb.numpy()

    np.savez_compressed(out_dir / "attention_parity.npz", **data)
    print(f"attention: {sum(v.size for v in data.values()):,} values saved")


def gen_cnn3d(out_dir: Path, torch, ref):
    torch.manual_seed(1)
    model = ref.create_model("3d", frame_stride=16)
    model.train()
    with torch.no_grad():
        for _ in range(3):
            model(torch.rand(2, 48, 3, 64, 64))
    model.eval()

    data = _flat_state_dict(model)
    cases = {
        "in_clip128": torch.rand(1, 128, 3, 64, 64),
        "in_batch": torch.rand(2, 64, 3, 64, 64),
        "in_unaligned": torch.rand(2, 50, 3, 64, 64),  # exercises temporal pad
    }
    with torch.no_grad():
        for name, video in cases.items():
            emb = model(video)
            data[name] = video.numpy()
            data[name.replace("in_", "out_")] = emb.numpy()

    np.savez_compressed(out_dir / "cnn3d_parity.npz", **data)
    print(f"cnn3d: {sum(v.size for v in data.values()):,} values saved")


def gen_losses(out_dir: Path, torch, ref):
    """Golden loss values on FIXED embeddings (no RNG inside the loss)."""
    import torch.nn.functional as F

    torch.manual_seed(2)
    B, D = 12, 256
    emb_full_1 = F.normalize(torch.randn(B, D), dim=1)
    emb_full_2 = F.normalize(emb_full_1 + 0.3 * torch.randn(B, D), dim=1)
    emb_ex_1 = F.normalize(emb_full_1 + 0.2 * torch.randn(B, D), dim=1)
    emb_ex_2 = F.normalize(emb_full_2 + 0.2 * torch.randn(B, D), dim=1)
    # duplicate ids so the triplet positive mask is non-trivial
    video_ids = torch.tensor([0, 1, 2, 3, 4, 5, 0, 1, 2, 6, 7, 4])
    temperature = torch.tensor([0.07])

    data = {
        "emb_full_1": emb_full_1.numpy(),
        "emb_full_2": emb_full_2.numpy(),
        "emb_ex_1": emb_ex_1.numpy(),
        "emb_ex_2": emb_ex_2.numpy(),
        "video_ids": video_ids.numpy(),
        "temperature": temperature.numpy(),
    }

    # Triplet loss golden from the reference implementation (model.py:8-71).
    all_emb = torch.cat([emb_full_1, emb_full_2, emb_ex_1, emb_ex_2], dim=0)
    all_ids = torch.cat([video_ids] * 4, dim=0)
    tl, n = ref.compute_triplet_loss(all_emb, all_ids, margin=0.3, hard_mining=True)
    data["triplet_loss"] = np.float32(tl.item() if hasattr(tl, "item") else tl)
    data["num_triplets"] = np.int32(n)

    # Also a case with NO positives (all ids unique) -> zero loss.
    uniq_ids = torch.arange(B)
    tl0, n0 = ref.compute_triplet_loss(emb_full_1, uniq_ids, margin=0.3)
    data["triplet_loss_nopos"] = np.float32(tl0.item() if hasattr(tl0, "item") else tl0)
    data["num_triplets_nopos"] = np.int32(n0)

    # InfoNCE terms as the attention loss computes them (model.py:343-362):
    labels = torch.arange(B)

    def sym_ce(a, b):
        logits = a @ b.T / temperature
        return (F.cross_entropy(logits, labels) + F.cross_entropy(logits.T, labels)).item()

    def one_ce(a, b):  # extract terms have no transpose (model.py:349-353)
        return F.cross_entropy(a @ b.T / temperature, labels).item()

    data["loss_full"] = np.float32(sym_ce(emb_full_1, emb_full_2))
    data["loss_extract"] = np.float32(
        one_ce(emb_ex_1, emb_full_1) + one_ce(emb_ex_2, emb_full_2)
    )
    data["loss_extract_cross"] = np.float32(sym_ce(emb_ex_1, emb_ex_2))

    # 3D hard-negative loss terms (model.py:531-560):
    logits = emb_full_1 @ emb_full_2.T / temperature
    loss_12 = F.cross_entropy(logits, labels)
    loss_21 = F.cross_entropy(logits.T, labels)
    mask = torch.eye(B).bool()
    neg_logits = logits.masked_fill(mask, float("-inf"))
    k = max(1, int(B * 0.3))
    hard_idx = torch.topk(neg_logits, k, dim=1).indices
    hard_logits = torch.gather(logits, 1, hard_idx)
    pos_logits = torch.diagonal(logits).unsqueeze(1)
    hard_all = torch.cat([pos_logits, hard_logits], dim=1)
    hard_loss = F.cross_entropy(hard_all, torch.zeros(B, dtype=torch.long))
    data["loss3d_standard"] = np.float32(((loss_12 + loss_21) / 2).item())
    data["loss3d_hard"] = np.float32(hard_loss.item())

    np.savez_compressed(out_dir / "loss_parity.npz", **data)
    print("losses: goldens saved")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="tests/fixtures")
    args = parser.parse_args()

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    import torch

    sys.path.insert(0, str(REFERENCE_DIR))
    import model as ref  # the reference module, executed not copied

    gen_attention(out_dir, torch, ref)
    gen_cnn3d(out_dir, torch, ref)
    gen_losses(out_dir, torch, ref)


if __name__ == "__main__":
    main()
