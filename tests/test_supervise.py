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


def test_supervise_cold_grace_spares_slow_first_write(tmp_path):
    """A fresh attempt may spend longer than --stale-sec in bootstrap +
    cold jit compiles before its FIRST progress write; the cold-grace
    multiplier must keep the supervisor from killing it (review r3)."""
    progress = tmp_path / "metrics.jsonl"
    script = tmp_path / "job.py"
    script.write_text(textwrap.dedent(f"""
        import time
        time.sleep(1.2)
        open({str(progress)!r}, "a").write("tick\\n")
    """))
    rc = main([
        "--progress", str(progress), "--stale-sec", "0.4",
        "--cold-grace", "20", "--poll-sec", "0.1",
        "--retry-delay-sec", "0.1", "--max-attempts", "1",
        "--", sys.executable, str(script),
    ])
    assert rc == 0  # would be killed at 0.4 s without the grace


def test_supervise_still_kills_after_first_write(tmp_path):
    """Once progress HAS been written, the plain --stale-sec applies."""
    progress = tmp_path / "metrics.jsonl"
    script = tmp_path / "job.py"
    script.write_text(textwrap.dedent(f"""
        import time
        open({str(progress)!r}, "a").write("tick\\n")
        time.sleep(60)
    """))
    rc = main([
        "--progress", str(progress), "--stale-sec", "0.5",
        "--cold-grace", "100", "--poll-sec", "0.1",
        "--retry-delay-sec", "0.1", "--max-attempts", "1",
        "--", sys.executable, str(script),
    ])
    assert rc == 1  # stalled after the first write → killed, attempts out
