"""Bench-capture orchestration contract (bench.py).

Rounds 3-4 lost their end-to-end perf evidence to capture-machinery failures
(VERDICT r4 weak #1: one shared budget, no partial-result merging). These
tests pin the round-5 orchestrator guarantees WITHOUT any TPU:

- a phase subprocess's JSON metric lines are merged even when the phase is
  killed by its timeout afterwards (``TimeoutExpired.stdout`` recovery);
- a crashed phase still lands its primary key as a ``failed: ...`` row, so
  every BENCH_r*.json carries all 12 rows (never silently-absent metrics);
- demo-emitted key names map onto the bench key names (KEYMAP);
- the retry pass replaces a failed row when budget remains and the phase
  recovers (the degraded-tunnel-then-recovery scenario);
- ``BENCH_partial.json`` is checkpointed after every phase (the black box a
  driver kill leaves behind).
"""

import importlib.util
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    # checkpoints go to a scratch dir, never the real BENCH_partial.json
    monkeypatch.setattr(mod, "HERE", str(tmp_path))
    return mod


def test_run_phase_merges_lines_from_timed_out_subprocess(bench):
    """A phase killed mid-flight must still deliver the rows it printed."""
    script = (
        "import json, sys, time\n"
        "sys.stdout.write(json.dumps({'tet_p2_10steps_s': 4.35}) + '\\n')\n"
        "sys.stdout.flush()\n"
        "time.sleep(60)\n"
        "sys.stdout.write(json.dumps({'never': 1}) + '\\n')\n"
    )
    merged, status = bench.run_phase("tet_p2", 3.0, cmd=[sys.executable, "-c", script])
    assert merged == {"tet_p2_10steps_s": 4.35}
    assert status.startswith("timeout")


def test_run_phase_merges_multiple_lines_and_skips_noise(bench):
    script = (
        "import json\n"
        "print('WARNING: some backend chatter {not json}')\n"
        "print(json.dumps({'a': 1}))\n"
        "print('progress text')\n"
        "print(json.dumps({'b': 2, 'a': 3}))\n"
    )
    merged, status = bench.run_phase("probe", 30.0, cmd=[sys.executable, "-c", script])
    assert merged == {"a": 3, "b": 2}
    assert status == "ok"


def test_run_phase_crash_reports_rc_and_stderr(bench):
    script = "import sys; sys.stderr.write('boom'); sys.exit(3)"
    merged, status = bench.run_phase("probe", 30.0, cmd=[sys.executable, "-c", script])
    assert merged == {}
    assert status.startswith("rc=3") and "boom" in status


def _run_main(bench, monkeypatch, capsys, outcomes, phases):
    """Drive bench.main() with scripted per-phase outcomes.

    ``outcomes``: {phase: list of (merged, status) results, consumed per call}.
    """
    calls = {}

    def fake_run_phase(name, timeout_s, cmd=None):
        i = calls.get(name, 0)
        calls[name] = i + 1
        seq = outcomes[name]
        return seq[min(i, len(seq) - 1)]

    monkeypatch.setattr(bench, "run_phase", fake_run_phase)
    monkeypatch.setattr(bench, "PHASES", phases)
    # skip the real tunnel probe subprocess
    import subprocess

    monkeypatch.setattr(
        subprocess, "run", lambda *a, **k: type("R", (), {"returncode": 0})()
    )
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line), calls


def test_main_emits_every_primary_key_and_keymaps(bench, monkeypatch, capsys):
    phases = [("probe", 10.0), ("composite", 10.0), ("headline", 10.0)]
    outcomes = {
        "probe": [({"tunnel": "ok"}, "ok")],
        # demo-key name: must come out as the bench key
        "composite": [({"composite_10steps_s": 5.87, "E_pen": 1.0}, "ok")],
        "headline": [({}, "rc=1: ImportError")],
    }
    out, _ = _run_main(bench, monkeypatch, capsys, outcomes, phases)
    assert out["metric"] == "j2_return_map_gauss_point_updates_per_s"
    assert out["tunnel"] == "ok"
    assert out["ogden3d_composite_solve_10steps_s"] == 5.87
    assert "E_pen" not in out  # DROP_KEYS
    # crashed phase: primary key present as an explanatory failure row
    assert str(out["value"]).startswith("failed:") or out["value"] == 0.0
    assert "phase_log" in out


def test_main_retry_replaces_failed_row_on_recovery(bench, monkeypatch, capsys):
    """Tunnel dies for the first tet_p2 attempt, recovers for the retry."""
    phases = [("probe", 10.0), ("tet_p2", 10.0)]
    outcomes = {
        "probe": [({"tunnel": "ok"}, "ok")],
        "tet_p2": [
            ({}, "timeout after 10s"),
            ({"tet_p2_10steps_s": 4.35, "tet_p2_rel_R": [1e-5, 2e-5]}, "ok"),
        ],
    }
    out, calls = _run_main(bench, monkeypatch, capsys, outcomes, phases)
    assert calls["tet_p2"] == 2
    assert out["ogden3d_tet_p2_solve_10steps_s"] == 4.35
    # reference comparison constants attach once an end-to-end row exists
    assert out["ogden3d_ref_8rank_s"] == 5.46
    # the retry is recorded, not hidden
    assert "retry" in json.dumps(out.get("phase_log", {}))


def test_main_checkpoints_partial_json_after_each_phase(bench, monkeypatch, capsys):
    phases = [("probe", 10.0), ("fused_step", 10.0)]
    outcomes = {
        "probe": [({"tunnel": "ok"}, "ok")],
        "fused_step": [({"fused_step_64x64_ms": 30.1}, "ok")],
    }
    _run_main(bench, monkeypatch, capsys, outcomes, phases)
    with open(os.path.join(bench.HERE, "BENCH_partial.json")) as f:
        snap = json.load(f)
    assert snap["fused_step_64x64_ms"] == 30.1
    assert snap["tunnel"] == "ok"
