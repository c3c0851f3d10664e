"""Large-scale dedup benchmark: on-TPU top-k over a synthetic corpus
(BASELINE.md config #5 — the FAISS IndexFlatIP replacement).

Usage: python tools/bench_dedup.py [--n 100000] [--k 20] [--cpu]
Prints one JSON line {"metric", "value", "unit", "vs_baseline"}; baseline is
numpy full all-pairs argpartition on the host (what the reference's direct
path does, fingerprint.py:482-513; FAISS is unavailable in this image).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=100_000)
    parser.add_argument("--k", type=int, default=20)
    parser.add_argument("--dim", type=int, default=256)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--baseline_n", type=int, default=4000,
                        help="corpus size for the host-numpy baseline "
                             "(full N^2 on host would not fit)")
    parser.add_argument("--method", default="auto",
                        choices=["auto", "exact", "certified",
                                 "certified-bf16"],
                        help="top-k selection (ops/topk.py); measure the "
                             "certified-vs-exact uplift by running both")
    parser.add_argument("--verify", action="store_true",
                        help="after timing, run method='exact' once and "
                             "check thresholded completeness + HIGH score "
                             "agreement of the timed method's results")
    parser.add_argument("--planted", action="store_true",
                        help="use the planted near-dup cluster corpus "
                             "(tools/exp_topk_precision.make_corpus) so "
                             "thresholded verification actually bites — a "
                             "pure random corpus has no cross-row pairs "
                             "above 0.95")
    parser.add_argument("--exact_above", type=float, default=None,
                        help="duplicate threshold for the relaxed "
                             "certificate (grouping-complete above it)")
    parser.add_argument("--ring", action="store_true",
                        help="force the ring-sharded path (sharded_topk_"
                             "cosine) even on one device — times the "
                             "multi-chip program's per-device work")
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    from functools import partial

    from video_fingerprint_tpu.ops.topk import sharded_topk_cosine, topk_cosine

    if args.planted:
        from tools.exp_topk_precision import make_corpus

        e = make_corpus(args.n, args.dim, seed=0)
    else:
        rng = np.random.default_rng(0)
        e = rng.normal(size=(args.n, args.dim)).astype(np.float32)
        e /= np.linalg.norm(e, axis=1, keepdims=True)

    multi = len(jax.devices()) > 1 or args.ring
    fn = partial(
        sharded_topk_cosine if multi else topk_cosine,
        method=args.method, exact_above=args.exact_above,
    )

    e_host = e  # the host-numpy baseline must stay on host
    # stage the corpus in HBM once — the production scanner's embeddings
    # already live on device; re-uploading ~100MB+ per timed call would
    # measure the host link, not the search (measured: un-staged ring legs
    # at 100k flatten to ~17.5k q/s regardless of method because the ~3s
    # tunnel upload dominates). The ring path re-pads/shards from the
    # staged array in-graph, which is the production placement too.
    e = jax.device_put(e, jax.devices()[0])

    def sync(s, i):
        # block_until_ready is unreliable on the experimental axon backend
        # (returns early); a dependent small D2H readback is the real sync —
        # materializing one row forces the producer to complete without
        # pulling the full (N, k) result through the dev tunnel.
        np.asarray(s[0])
        np.asarray(i[0])

    t0 = time.perf_counter()
    sync(*fn(e, args.k))
    warm = time.perf_counter() - t0

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        sync(*fn(e, args.k))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    qps = args.n / dt

    # host-numpy baseline on a smaller corpus, scaled by N (O(N^2) work)
    nb = min(args.baseline_n, args.n)
    eb = e_host[:nb]
    t0 = time.perf_counter()
    sims = eb @ eb.T
    idx = np.argpartition(-sims, args.k, axis=1)[:, : args.k]
    np.take_along_axis(sims, idx, axis=1)
    bt = time.perf_counter() - t0
    baseline_qps_at_n = nb / (bt * (args.n / nb))  # scale O(N^2) to full N

    verified = None
    if args.verify:
        s_m, i_m = fn(e, args.k)
        s_x, i_x = (sharded_topk_cosine if multi else topk_cosine)(
            e, args.k, method="exact")
        s_m, i_m = np.asarray(s_m), np.asarray(i_m)
        s_x, i_x = np.asarray(s_x), np.asarray(i_x)
        if args.exact_above is None:
            np.testing.assert_array_equal(np.sort(s_m, 1), np.sort(s_x, 1))
            verified = "strict: score multisets bit-equal to exact"
        else:
            thr = args.exact_above
            # completeness: every exact hit >= thr appears in the candidates
            exact_hits = s_x >= thr
            n_checked = 0
            for row in np.flatnonzero(exact_hits.any(axis=1)):
                want = set(i_x[row][exact_hits[row]].tolist())
                got = set(i_m[row][s_m[row] >= thr - 1e-5].tolist())
                assert want <= got, (row, want - got)
                n_checked += 1
            # reported scores at shared ids agree to the HIGH contract
            both = {}
            for row in range(len(s_m)):
                m_map = dict(zip(i_m[row].tolist(), s_m[row].tolist()))
                for j, sx in zip(i_x[row], s_x[row]):
                    if int(j) in m_map:
                        both.setdefault(row, []).append(
                            abs(m_map[int(j)] - float(sx)))
            max_d = max((max(v) for v in both.values()), default=0.0)
            assert max_d < 5e-5, max_d
            verified = (f"thresholded: complete above {thr} on {n_checked} "
                        f"rows with hits; shared-id score delta {max_d:.2e}")

    print(json.dumps({
        "metric": f"dedup top-{args.k} search over {args.n}-video corpus"
                  + (" (corpus-sharded)" if multi else " (single chip)"),
        "value": round(qps, 1),
        "unit": "queries/sec",
        "vs_baseline": round(qps / baseline_qps_at_n, 2),
        "warmup_s": round(warm, 2),
        # both paths share the same selection methods (ops/topk.py): auto =
        # certified approx_max_k + per-tile certificate + exact repair on
        # TPU past the 16k per-shard sort knee, exact otherwise.
        "method": args.method,
        "exact_above": args.exact_above,
        "verified": verified,
        "config": (("ring-sharded" if multi else "single chip")
                   + f" top-k, method={args.method}, "
                   + ("bf16 first pass + HIGH rescore"
                      if args.method == "certified-bf16" else "HIGH matmul")),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
