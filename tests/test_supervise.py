"""tools/supervise: stall-detecting run supervisor."""

import os
import sys
import textwrap

from tools.supervise import main


def test_supervise_restarts_until_success(tmp_path):
    """Attempt 1 exits nonzero; attempt 2 succeeds."""
    progress = tmp_path / "metrics.jsonl"
    state = tmp_path / "state"
    script = tmp_path / "job.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys
        progress = {str(progress)!r}
        state = {str(state)!r}
        open(progress, "a").write("tick\\n")
        if not os.path.exists(state):
            open(state, "w").write("ran once")
            sys.exit(1)
        sys.exit(0)
    """))
    rc = main([
        "--progress", str(progress), "--stale-sec", "60",
        "--poll-sec", "0.1", "--retry-delay-sec", "0.1",
        "--max-attempts", "3",
        "--", sys.executable, str(script),
    ])
    assert rc == 0
    assert state.exists()


def test_supervise_kills_stalled_run(tmp_path):
    """A run that stops touching the progress file is killed + retried;
    the retry (which finds the state file) completes."""
    progress = tmp_path / "metrics.jsonl"
    state = tmp_path / "state"
    script = tmp_path / "job.py"
    script.write_text(textwrap.dedent(f"""
        import os, sys, time
        progress = {str(progress)!r}
        state = {str(state)!r}
        open(progress, "a").write("tick\\n")
        if not os.path.exists(state):
            open(state, "w").write("ran once")
            time.sleep(600)   # simulates a hung dispatch (never exits)
        sys.exit(0)
    """))
    # stale window must exceed interpreter startup on a loaded host
    rc = main([
        "--progress", str(progress), "--stale-sec", "5.0",
        "--poll-sec", "0.2", "--retry-delay-sec", "0.1",
        "--max-attempts", "3",
        "--", sys.executable, str(script),
    ])
    assert rc == 0


def test_supervise_success_marker_short_circuits(tmp_path):
    report = tmp_path / "report.jsonl"
    report.write_text('{"status": "ok"}\n')
    progress = tmp_path / "metrics.jsonl"
    rc = main([
        "--progress", str(progress),
        "--success-grep", '"status": "ok"',
        "--success-file", str(report),
        "--max-attempts", "2",
        "--", sys.executable, "-c", "raise SystemExit(1)",
    ])
    assert rc == 0


def test_supervise_exhausts_attempts(tmp_path):
    progress = tmp_path / "metrics.jsonl"
    rc = main([
        "--progress", str(progress), "--retry-delay-sec", "0.05",
        "--max-attempts", "2",
        "--", sys.executable, "-c", "raise SystemExit(3)",
    ])
    assert rc == 1
