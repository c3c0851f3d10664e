"""One DP train step across N processes (multi-host smoke).

Validates the full multi-host story on one machine: jax.distributed over a
localhost coordinator (the same code path as DCN), per-process input shards
assembled into global arrays (parallel/distributed.py shard_batch), psum'd
gradients. Run by tests/test_multihost.py; usage:
  python tools/multihost_smoke_worker.py <process_id> <num_processes> [port]
"""
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import jax
jax.config.update("jax_platforms", "cpu")
pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
port = sys.argv[3] if len(sys.argv) > 3 else "12431"
jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs, process_id=pid)

import jax.numpy as jnp
import numpy as np
from video_fingerprint_tpu.models import create_model
from video_fingerprint_tpu.parallel.distributed import DataParallel
from video_fingerprint_tpu.training.optim import make_optimizer
from video_fingerprint_tpu.training.train_step import init_train_state, make_train_step

dp = DataParallel()  # global 2-device mesh (1 per process)
model = create_model("attention")
state = init_train_state(model, None, jax.random.PRNGKey(0), (1, 8, 32, 32, 3))
tx = make_optimizer("attention", state.params, 1e-3, total_steps=10)
state = dp.replicate(state.replace(opt_state=tx.init(state.params)))
step = jax.jit(make_train_step(model, tx, "attention"))

B_local, T = 1, 8  # per-host shard of global batch 2
rng = np.random.default_rng(pid)
local = {
    "clip1": (rng.random((B_local, T, 32, 32, 3)) * 255).astype(np.uint8),
    "clip2": (rng.random((B_local, T, 32, 32, 3)) * 255).astype(np.uint8),
    "video_id": np.asarray([pid], np.int32),
    "mask1": np.ones((B_local, T), bool),
    "mask2": np.ones((B_local, T), bool),
}
batch = dp.shard_batch(local)
new_state, metrics = step(state, batch, dp.replicate(jax.random.PRNGKey(3)))
print(f"proc {pid}: DP train step over {jax.process_count()} processes OK, "
      f"loss={float(metrics['loss']):.4f}", flush=True)
