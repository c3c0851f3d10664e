"""Driver contract: __graft_entry__.entry() + dryrun_multichip(8) stay green."""

import importlib
import sys

import jax
import numpy as np
import pytest

from tests.conftest import REPO_ROOT


def _module():
    sys.path.insert(0, str(REPO_ROOT))
    return importlib.import_module("__graft_entry__")


def test_entry_compiles_and_runs():
    ge = _module()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out)), 1.0, atol=1e-4)


@pytest.mark.slow
def test_dryrun_multichip_8():
    ge = _module()
    ge.dryrun_multichip(8)  # asserts internally (finite loss, 8 devices)
