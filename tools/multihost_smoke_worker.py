"""Multi-host smoke workers (run by tests/test_multihost.py).

Validates the full multi-host story on one machine: jax.distributed over a
localhost coordinator (the same code path as DCN), per-process input shards
assembled into global arrays (parallel/distributed.py shard_batch), psum'd
gradients. Usage:

  python tools/multihost_smoke_worker.py <pid> <nprocs> [port] [mode] [dir]

mode "step" (default): one DP train step, print the global loss.
mode "full": a full Trainer epoch — train_epoch + validate() with a partial
  trailing val batch (exercises the per-host wraparound padding against the
  global mesh) + checkpoint/artifact writes. Each rank is given its OWN run
  dir; single-writer discipline means only rank 0's dir may contain files
  (reference train.py:538-568 artifact semantics under N processes).
mode "equiv": N full train steps + one validation on DETERMINISTIC global
  batches (each process feeds its contiguous row block, so every topology
  sees the exact same global data). Prints the per-step loss curve and the
  continuous validation metrics to 6 decimals; the test runs this under
  2 processes x 2 devices AND 1 process x 4 devices and asserts equality —
  multi-host end-to-end training EQUIVALENCE, not just liveness
  (VERDICT r3 next #5).
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
port = sys.argv[3] if len(sys.argv) > 3 else "12431"
mode = sys.argv[4] if len(sys.argv) > 4 else "step"
jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs, process_id=pid)

import jax.numpy as jnp
import numpy as np
from video_fingerprint_tpu.models import create_model
from video_fingerprint_tpu.parallel.distributed import DataParallel
from video_fingerprint_tpu.training.optim import make_optimizer
from video_fingerprint_tpu.training.train_step import init_train_state, make_train_step


def run_step():
    dp = DataParallel()  # global mesh over all processes' devices
    model = create_model("attention")
    state = init_train_state(model, None, jax.random.PRNGKey(0), (1, 8, 32, 32, 3))
    tx = make_optimizer("attention", state.params, 1e-3, total_steps=10)
    state = dp.replicate(state.replace(opt_state=tx.init(state.params)))
    step = jax.jit(make_train_step(model, tx, "attention"))

    n_local = jax.local_device_count()
    B_local, T = n_local, 8  # one row per local device
    rng = np.random.default_rng(pid)
    local = {
        "clip1": (rng.random((B_local, T, 32, 32, 3)) * 255).astype(np.uint8),
        "clip2": (rng.random((B_local, T, 32, 32, 3)) * 255).astype(np.uint8),
        "video_id": (pid * 100 + np.arange(B_local)).astype(np.int32),
        "mask1": np.ones((B_local, T), bool),
        "mask2": np.ones((B_local, T), bool),
    }
    batch = dp.shard_batch(local)
    new_state, metrics = step(state, batch, dp.replicate(jax.random.PRNGKey(3)))
    print(f"proc {pid}: DP train step over {jax.process_count()} processes OK, "
          f"loss={float(metrics['loss']):.4f}", flush=True)


class _FakeLoader:
    """Deterministic in-memory loader (no decode) with the BucketedLoader
    protocol surface the Trainer consumes."""

    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass

    def __iter__(self):
        return iter(self.batches)


def _make_batch(b_local, T, hw, seed):
    rng = np.random.default_rng(seed)
    return {
        "clip1": (rng.random((b_local, T, hw, hw, 3)) * 255).astype(np.uint8),
        "clip2": (rng.random((b_local, T, hw, hw, 3)) * 255).astype(np.uint8),
        "video_id": (seed * 100 + np.arange(b_local)).astype(np.int32),
        "mask1": np.ones((b_local, T), bool),
        "mask2": np.ones((b_local, T), bool),
    }


def run_full(run_base: str):
    from video_fingerprint_tpu.config import Config
    from video_fingerprint_tpu.training.trainer import Trainer

    T, hw = 8, 16
    config = Config(
        batch_size=2 * nprocs,  # one row per device (2 devices/process)
        epochs=1,
        learning_rate=1e-3,
        frame_size=hw,
        max_frames=T,
        patience=10,
        model_type="attention",
        device="cpu",
        seed=0,
    ).to_dict()

    train_loader = _FakeLoader(
        [_make_batch(2, T, hw, 1000 * pid + i) for i in range(2)]
    )
    # trailing PARTIAL local batch (true_b=1 < 2 devices/process): exercises
    # validate()'s per-host wraparound padding against the global mesh.
    val_loader = _FakeLoader(
        [_make_batch(2, T, hw, 77 + pid), _make_batch(1, T, hw, 88 + pid)]
    )

    run_dir = Path(run_base) / f"rank{pid}"
    run_dir.mkdir(parents=True, exist_ok=True)
    model = create_model(
        "attention",
        spatial_dim=config["spatial_dim"],
        temporal_dim=config["temporal_dim"],
        embedding_dim=config["embedding_dim"],
        num_attention_blocks=config["num_attention_blocks"],
    )
    trainer = Trainer(model, train_loader, val_loader, config, run_dir)
    trainer.train()
    vm = trainer.validate()
    print(
        f"proc {pid}: full epoch over {jax.process_count()} processes OK, "
        f"val_loss={vm['loss']:.6f}",
        flush=True,
    )


def run_equiv(run_base: str):
    """N train steps + validate() on deterministic global data. The global
    batch is built from a seed every process shares; process p feeds rows
    [p*n_local, (p+1)*n_local) — shard_batch reassembles exactly the global
    array, so 2x2 and 1x4 topologies run the same math on the same data and
    must print the same numbers."""
    from video_fingerprint_tpu.config import Config
    from video_fingerprint_tpu.training.trainer import Trainer

    T, hw = 8, 16
    n_local = jax.local_device_count()
    global_rows = nprocs * n_local

    def global_batch(seed: int, rows: int):
        rng = np.random.default_rng(seed)  # identical on every process
        return {
            "clip1": (rng.random((rows, T, hw, hw, 3)) * 255).astype(np.uint8),
            "clip2": (rng.random((rows, T, hw, hw, 3)) * 255).astype(np.uint8),
            "video_id": (seed * 100 + np.arange(rows)).astype(np.int32),
            "mask1": np.ones((rows, T), bool),
            "mask2": np.ones((rows, T), bool),
        }

    def local_slice(gb, rows_per_proc):
        lo = pid * rows_per_proc
        return {k: v[lo:lo + rows_per_proc] for k, v in gb.items()}

    steps = 4
    train_loader = _FakeLoader(
        [local_slice(global_batch(10 + i, global_rows), n_local)
         for i in range(steps)]
    )
    # one full + one PARTIAL val batch (1 valid row per host: wraparound
    # padding + block slicing active in every topology, same global rows)
    partial_per_host = 1
    val_loader = _FakeLoader([
        local_slice(global_batch(70, global_rows), n_local),
        local_slice(global_batch(71, nprocs * partial_per_host),
                    partial_per_host),
    ])

    config = Config(
        batch_size=global_rows, epochs=1, learning_rate=1e-3, frame_size=hw,
        max_frames=T, patience=10, model_type="attention", device="cpu",
        seed=0,
    ).to_dict()
    run_dir = Path(run_base) / f"rank{pid}"
    run_dir.mkdir(parents=True, exist_ok=True)
    model = create_model(
        "attention",
        spatial_dim=config["spatial_dim"],
        temporal_dim=config["temporal_dim"],
        embedding_dim=config["embedding_dim"],
        num_attention_blocks=config["num_attention_blocks"],
    )
    trainer = Trainer(model, train_loader, val_loader, config, run_dir)
    losses = []
    for batch in train_loader:
        device_batch = trainer.dp.shard_batch(batch)
        # the Trainer's own step call (trainer.py train_epoch): constant
        # step_rng, the jitted step folds in state.step internally
        trainer.state, metrics = trainer.train_step(
            trainer.state, device_batch, trainer.step_rng
        )
        losses.append(float(metrics["loss"]))
    vm = trainer.validate()
    curve = ",".join(f"{x:.6f}" for x in losses)
    print(
        f"proc {pid}: equiv over {jax.process_count()} processes OK "
        f"curve=[{curve}] val_loss={vm['loss']:.6f} "
        f"intra={vm.get('intra_sim_mean', 0):.6f} "
        f"inter={vm.get('inter_sim_mean', 0):.6f} "
        f"gap={vm.get('separation_gap', 0):.6f}",
        flush=True,
    )


def run_dedup():
    """2-process corpus-sharded dedup: sharded_topk_cosine (exact AND
    certified with forced repairs) + sharded_topk_search on a mesh that
    spans PROCESSES — proves the shard_map ring, the host-side certificate/
    repair logic and the output replication work over a real jax.distributed
    cluster, not just the in-process 8-device mesh (every rank must be able
    to np.asarray the results and agree with the numpy oracle)."""
    from jax.sharding import Mesh

    from video_fingerprint_tpu.ops.topk import (
        sharded_topk_cosine,
        sharded_topk_search,
    )

    mesh = Mesh(np.asarray(jax.devices()), ("corpus",))
    n, dim, k = 96, 32, 5
    rng = np.random.default_rng(3)
    e = rng.normal(size=(n, dim)).astype(np.float32)
    for a, b in ((0, 1), (40, 41), (70, 71)):  # planted near-dups
        e[b] = 0.98 * e[a] + 0.2 * e[b]
    e /= np.linalg.norm(e, axis=1, keepdims=True)
    sims = e @ e.T
    oracle = np.sort(np.take_along_axis(
        sims, np.argsort(-sims, axis=1)[:, :k], axis=1), axis=1)

    for method, kwargs in [
        ("exact", {}),
        ("certified", {"recall_target": 0.7}),  # force the repair path
        ("certified-bf16", {"recall_target": 0.7, "exact_above": 0.9}),
    ]:
        s, i = sharded_topk_cosine(e, k, mesh=mesh, query_block=8,
                                   method=method, **kwargs)
        s, i = np.asarray(s), np.asarray(i)  # every rank reads results
        if method == "certified-bf16":
            thr = 0.9
            for row in range(n):
                want = set(np.flatnonzero(sims[row] >= thr).tolist())
                got = {int(j) for ss, j in zip(s[row], i[row])
                       if ss >= thr - 1e-5}
                assert want <= got, (method, row, want - got)
        else:
            np.testing.assert_allclose(np.sort(s, axis=1), oracle,
                                       atol=1e-5, err_msg=method)

    q = rng.normal(size=(7, dim)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qs, qi = sharded_topk_search(q, e, k, mesh=mesh, method="exact")
    q_sims = q @ e.T
    q_oracle = np.take_along_axis(
        q_sims, np.argsort(-q_sims, axis=1)[:, :k], axis=1)
    np.testing.assert_allclose(np.asarray(qs), q_oracle, atol=1e-5)

    # bf16-RESIDENT legs (VERDICT r4 next #3): the storage mode's
    # cross-process surface — host-quantized staging onto the global mesh,
    # the ring's f32-norm cosine rescale, and the quantized-query score
    # domain — verified against the cosine-domain oracle on every rank.
    from video_fingerprint_tpu.ops.topk import stage_sharded_corpus

    eq = np.asarray(jnp.asarray(e, jnp.bfloat16), np.float32)
    eq /= np.linalg.norm(eq, axis=1, keepdims=True)  # stored directions
    sims16 = eq @ eq.T
    e16 = jnp.asarray(e, jnp.bfloat16)
    s, i = sharded_topk_cosine(e16, k, mesh=mesh, query_block=8,
                               method="certified-bf16", exact_above=0.9,
                               recall_target=0.7)
    s, i = np.asarray(s), np.asarray(i)
    for row in range(n):
        want = set(np.flatnonzero(sims16[row] >= 0.9).tolist())
        got = {int(j) for ss, j in zip(s[row], i[row]) if ss >= 0.9 - 2e-5}
        assert want <= got, ("bf16-resident ring", row, want - got)
    live = np.isfinite(s)
    np.testing.assert_allclose(
        s[live], np.take_along_axis(sims16, i, axis=1)[live], atol=2e-5,
        err_msg="bf16-resident ring score domain")
    staged16 = stage_sharded_corpus(e, mesh, dtype="bf16")
    qq = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
    qq /= np.linalg.norm(qq, axis=1, keepdims=True)
    qq_sims = qq @ eq.T  # quantized-query-domain truth (ADVICE r4 #1)
    bs, bi = sharded_topk_search(q, staged16, k, mesh=mesh,
                                 method="certified-bf16", exact_above=0.9,
                                 recall_target=0.7)
    bs, bi = np.asarray(bs), np.asarray(bi)
    for row in range(len(q)):
        want = set(np.flatnonzero(qq_sims[row] >= 0.9).tolist())
        got = {int(j) for ss, j in zip(bs[row], bi[row])
               if ss >= 0.9 - 2e-5}
        assert want <= got, ("bf16-staged search", row, want - got)
    live = np.isfinite(bs)
    np.testing.assert_allclose(
        bs[live], np.take_along_axis(qq_sims, bi, axis=1)[live], atol=2e-5,
        err_msg="bf16-staged search score domain")

    print(f"sharded dedup over {jax.process_count()} processes OK "
          f"(exact+certified+bf16 ring, query search, bf16-resident "
          f"ring+staged)", flush=True)


if mode == "full":
    run_full(sys.argv[5])
elif mode == "equiv":
    run_equiv(sys.argv[5])
elif mode == "dedup":
    run_dedup()
else:
    run_step()
