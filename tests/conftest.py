"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding (DP train step, corpus-sharded top-k) is validated without
TPU hardware via XLA's host-platform device-count override, per SURVEY.md §4c.
Must run before jax is imported anywhere.
"""

import os

# The image pre-imports jax at interpreter startup (sitecustomize) with
# JAX_PLATFORMS=axon, so env vars alone are too late — use config.update too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU mesh"
assert len(jax.devices()) == 8, "host-platform device-count override failed"

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

FIXTURE_DIR = REPO_ROOT / "tests" / "fixtures"
