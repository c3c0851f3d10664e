#!/usr/bin/env python
"""In-graph full-forward throughput probe: does the headline's pipelined
dispatch still pay per-dispatch tunnel tax, or is it chip-bound?

The headline leg (tools/bench_headline.py) dispatches K jitted forwards
back-to-back and blocks once — XLA's async dispatch should hide the ~30ms
dev-tunnel RTT after the first call, but on a throttled 1-core host the
client-side dispatch work itself (arg handling, RPC serialization) is not
free and serializes with... nothing we can see from outside. This probe
settles it the way the conv-hotspot probe did (tools/exp_conv_hotspot.py):
put the loop INSIDE the program (lax.fori_loop over K iterations, input
chosen per-iteration via dynamic_index so nothing hoists, scalar
accumulator so every embedding is computed but the readback is 4 bytes)
and compare per-iteration time against the pipelined-dispatch regime
measured in the same process/window.

If in-graph ≈ pipelined: the chip is the bound and the headline number is
honest hardware throughput. If in-graph is meaningfully faster: the
pipelined number under-reports videos/sec/chip by tunnel/host dispatch
overhead a locally-attached production host would not pay, and the
headline leg should gain an in-graph measurement.

Run on the real chip: python tools/exp_ingraph_forward.py
"""

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

B = int(os.environ.get("EXP_B", 512))
T = int(os.environ.get("EXP_T", 128))
HW = 64
K = int(os.environ.get("EXP_K", 12))      # iterations per timed call
REPS = int(os.environ.get("EXP_REPS", 3))
N_STAGED = 2


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from video_fingerprint_tpu.models import create_model
    from video_fingerprint_tpu.models.fuse import fuse_variables

    dev = jax.devices()[0]
    print(f"# backend={jax.default_backend()} dev={dev} B={B} T={T} K={K}",
          flush=True)

    model = create_model("attention")
    fused_model = create_model("attention", fused=True, dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.tree.map(
            np.asarray,
            model.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 8, HW, HW, 3), jnp.float32)),
        )
    fused_vars = jax.device_put(fuse_variables(variables, "attention"), dev)

    rng = np.random.default_rng(0)
    batches = [
        rng.integers(0, 256, (B * T, HW, HW, 3), dtype=np.uint8)
        for _ in range(N_STAGED)
    ]
    staged = [jax.device_put(a, dev) for a in batches]
    xs_d = jax.device_put(np.stack(batches), dev)  # (N_STAGED, B*T, HW, HW, 3)

    def _sync(x):
        return np.asarray(x)

    results = {}

    # -- in-graph loop: one dispatch, K forwards, scalar readback
    def ingraph(v, xs):
        def body(i, acc):
            x = lax.dynamic_index_in_dim(xs, i % N_STAGED, 0, keepdims=False)
            emb = fused_model.apply(v, x, B, method="forward_flat")
            return acc + jnp.sum(emb, dtype=jnp.float32)
        return lax.fori_loop(0, K, body, jnp.float32(0.0))

    f_in = jax.jit(ingraph)
    _sync(f_in(fused_vars, xs_d))  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        _sync(f_in(fused_vars, xs_d))
        ts.append(time.perf_counter() - t0)
    in_t = float(np.median(ts)) / K
    results["ingraph_ms_per_batch"] = round(in_t * 1e3, 2)
    results["ingraph_vps"] = round(B / in_t, 1)
    print(json.dumps({"ingraph": results["ingraph_vps"],
                      "reps_s": [round(t, 3) for t in ts]}), flush=True)

    # -- pipelined dispatch (the current headline regime), same window
    fwd = jax.jit(lambda v, x: fused_model.apply(v, x, B, method="forward_flat"))
    _sync(fwd(fused_vars, staged[0]))  # compile + warm
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [fwd(fused_vars, staged[i % N_STAGED]) for i in range(K)]
        for o in outs:
            _sync(o)
        ts.append(time.perf_counter() - t0)
    pipe_t = float(np.median(ts)) / K
    results["pipelined_ms_per_batch"] = round(pipe_t * 1e3, 2)
    results["pipelined_vps"] = round(B / pipe_t, 1)
    results["ingraph_over_pipelined"] = round(pipe_t / in_t, 3)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
