"""The bench orchestrator's number-of-record protocol (bench.py).

Round-2's driver bench timed out with NO JSON on stdout (BENCH_r02 rc=124)
— the protocol that prevents a repeat is exactly what these tests pin down:
legs emit cumulative partial JSON lines per stage, the orchestrator parses
the LAST parseable line, and a leg that blows its timeout still contributes
whatever it printed before dying (subprocess stdout salvage). No jax, no
torch: the orchestrator module is importable and testable host-side.
"""

import importlib.util
import json
import sys
import textwrap
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench(monkeypatch):
    # bench.py re-execs when the axon pool env is present — strip it so the
    # import is inert, and neutralize the alarm it never arms at import.
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _leg(tmp_path, body: str) -> str:
    p = tmp_path / "leg.py"
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_run_leg_parses_last_json_line(bench, tmp_path):
    leg = _leg(tmp_path, """
        import json
        print("# progress noise")
        print(json.dumps({"pipelined_vps": 1.0}))
        print(json.dumps({"pipelined_vps": 1.0, "ingraph_vps": 2.0}))
    """)
    out = bench._run_leg([leg], timeout=30)
    assert out == {"pipelined_vps": 1.0, "ingraph_vps": 2.0}


def test_run_leg_salvages_stdout_on_timeout(bench, tmp_path):
    # the leg prints a partial result, then stalls past the timeout — the
    # orchestrator must still recover the partial line.
    leg = _leg(tmp_path, """
        import json, sys, time
        print(json.dumps({"pipelined_vps": 123.0}), flush=True)
        sys.stdout.flush()
        time.sleep(60)
    """)
    out = bench._run_leg([leg], timeout=12)
    assert out == {"pipelined_vps": 123.0}


def test_run_leg_skips_truncated_json_tail(bench, tmp_path):
    # a line cut mid-write at the kill must not sink the earlier good line.
    leg = _leg(tmp_path, """
        import json, sys, time
        print(json.dumps({"pipelined_vps": 5.0}), flush=True)
        sys.stdout.write('{"ingraph_vps": 9')  # truncated, no newline
        sys.stdout.flush()
        time.sleep(60)
    """)
    out = bench._run_leg([leg], timeout=12)
    assert out == {"pipelined_vps": 5.0}


def test_run_leg_no_json_returns_empty(bench, tmp_path):
    leg = _leg(tmp_path, "print('no json here')")
    assert bench._run_leg([leg], timeout=30) == {}


def test_run_leg_tiny_timeout_skips(bench, tmp_path):
    leg = _leg(tmp_path, "print('{}')")
    assert bench._run_leg([leg], timeout=5) == {}


def test_e2e_projection_fields(bench):
    """The ledger gets decode-bound context (VERDICT r3 weak #4): per-core
    rate uses the EFFECTIVE worker count (capped at real cores), and the
    cores-to-saturate figure divides the headline by it."""
    e2e = {"e2e_scan_vps_with_decode": 20.0, "e2e_decode_workers": 8}
    out = bench._e2e_projection(11000.0, e2e, cores=1)
    assert out["e2e_host_cores"] == 1
    assert out["e2e_projected_vps_per_core"] == 20.0  # 8 workers, 1 core
    assert out["e2e_cores_to_saturate_chip"] == 550

    out = bench._e2e_projection(11000.0, e2e, cores=16)
    assert out["e2e_projected_vps_per_core"] == 2.5  # 8 workers really run
    # missing/zero inputs contribute nothing rather than garbage
    assert bench._e2e_projection(0.0, e2e, 4) == {}
    assert bench._e2e_projection(100.0, {}, 4) == {}
