"""Unit tests for bench.py's stage-isolation mechanics (round 5).

The driver's number of record comes from ``python bench.py`` run
end-to-end; round 4's capture lost the EDM stage to a transient stall,
so round 5 moved every stage into its own child process
(``_spawn_stage``). These tests pin the harness mechanics — child
spawn, last-JSON-line parsing, error capture, timeout — WITHOUT a
device backend, by pointing the spawner at a stub "bench" script. A
broken harness here would cost the round its canonical BENCH artifact
even with all stage bodies healthy.
"""

import json
import os
import stat
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench


def _stub(tmp_path, body: str) -> str:
    """Write a stand-in for bench.py that ``_spawn_stage`` will exec."""
    p = tmp_path / "stub_bench.py"
    p.write_text(body)
    os.chmod(p, os.stat(p).st_mode | stat.S_IXUSR)
    return str(p)


@pytest.fixture()
def spawn(tmp_path, monkeypatch):
    """_spawn_stage wired to a configurable stub child."""

    def run(body, timeout_s=30.0, extra_argv=()):
        monkeypatch.setattr(bench, "__file__", _stub(tmp_path, body))
        monkeypatch.setattr(sys, "argv", ["bench.py", *extra_argv])
        return bench._spawn_stage("edm", timeout_s=timeout_s)

    return run


def test_spawn_parses_last_json_line(spawn):
    """Stage output = the LAST stdout line; compile chatter above it (and
    stderr noise) must not break parsing."""
    out = spawn(
        "import sys\n"
        "print('compiling segment 1/4 ...')\n"
        "print('warning: axon experimental', file=sys.stderr)\n"
        "print('{\"edm_nfe_per_sec\": 15.4, \"edm_pct_of_roofline\": 39.3}')\n"
    )
    assert out == {"edm_nfe_per_sec": 15.4, "edm_pct_of_roofline": 39.3}


def test_spawn_forwards_stage_and_argv(spawn):
    """The child must receive --stage <name> plus the parent's argv (so
    e.g. --mesh reaches the stage body), minus --in-process."""
    out = spawn(
        "import json, sys\n"
        "print(json.dumps({'argv': sys.argv[1:]}))\n",
        extra_argv=["--profile", "--in-process"],
    )
    assert out["argv"][:2] == ["--stage", "edm"]
    assert "--profile" in out["argv"]
    assert "--in-process" not in out["argv"]


def test_spawn_reports_nonzero_exit_as_stage_error(spawn):
    """A dying stage must yield {stage}_error, not an exception: one
    stage's device fault must not take the other stages' numbers down."""
    out = spawn(
        "import sys\n"
        "print('partial output')\n"
        "sys.exit(7)\n"
    )
    assert set(out) == {"edm_error"}
    assert "exit 7" in out["edm_error"]


def test_spawn_reports_empty_output_as_stage_error(spawn):
    out = spawn("pass\n")
    assert "edm_error" in out


def test_spawn_reports_unparseable_output_as_stage_error(spawn):
    out = spawn("print('not json at all')\n")
    assert "edm_error" in out
    assert "unparseable" in out["edm_error"]


def test_spawn_timeout_is_an_error_not_a_hang(spawn):
    """A hung stage (downed tunnel) must be bounded by the timeout."""
    out = spawn(
        "import time\n"
        "time.sleep(60)\n",
        timeout_s=2.0,
    )
    assert "edm_error" in out
    assert "timed out" in out["edm_error"]


def test_main_emits_single_json_line_on_stage_success(tmp_path, monkeypatch,
                                                      capsys):
    """End-to-end through bench.main(): with the sampling stage stubbed to
    succeed and train/edm skipped, stdout's last line must be the ONE
    canonical JSON record with metric/value/unit/vs_baseline."""
    body = (
        "import json, sys\n"
        "assert sys.argv[1:3] == ['--stage', 'sampling']\n"
        "print(json.dumps({'value': 12.5, 'backend': 'stub',\n"
        "                  'patch_batch': 1}))\n"
    )
    monkeypatch.setattr(bench, "__file__", _stub(tmp_path, body))
    # point the baseline file into tmp (bench derives it from __file__)
    monkeypatch.setattr(sys, "argv", ["bench.py", "--no-train", "--no-edm"])
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rec = json.loads(lines[-1])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline", "aux"}
    assert rec["value"] == 12.5
    assert rec["aux"]["backend"] == "stub"


def test_main_exits_3_when_headline_stage_fails(tmp_path, monkeypatch,
                                                capsys):
    """If the headline sampling stage dies, bench must still print a
    parseable error record and exit 3 (the driver records the line)."""
    body = "import sys\nsys.exit(9)\n"
    monkeypatch.setattr(bench, "__file__", _stub(tmp_path, body))
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    with pytest.raises(SystemExit) as ei:
        bench.main()
    assert ei.value.code == 3
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "error"
    assert "sampling_error" in rec["aux"]
