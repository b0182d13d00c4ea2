"""Run a command under a stall-detecting supervisor.

Long TPU runs behind the tunnel can die two ways the run itself cannot
handle: the process is killed (handled by resume + rerun), or a dispatch
RPC is lost in a tunnel flap and the process HANGS forever waiting on a
response (observed in production: stage-3 fit stalled mid-epoch with the
tunnel healthy again).  This supervisor covers both: it restarts the
command when it exits nonzero AND when its progress file (e.g. the run's
metrics.jsonl) stops advancing.

The supervised command must be idempotent/resumable — trainer runs are
(atomic periodic checkpoints, utils/atomic_io).

Usage:
  python tools/supervise.py --progress <file> [--stale-sec 900]
      [--max-attempts 20] [--success-grep '"status": "ok"' --success-file F]
      -- <command ...>

Exits 0 when the command exits 0 (or the success-grep matches), 1 when
attempts are exhausted.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _progress_stamp(path: str) -> float:
    try:
        return os.stat(path).st_mtime
    except OSError:
        return 0.0


def _success(args) -> bool:
    if not args.success_grep:
        return False
    try:
        with open(args.success_file) as f:
            return any(args.success_grep in line for line in f)
    except OSError:
        return False


def supervise(args, cmd) -> int:
    for attempt in range(1, args.max_attempts + 1):
        if _success(args):
            print(f"supervise: success marker found before attempt {attempt}")
            return 0
        print(f"supervise: attempt {attempt}: {' '.join(cmd)}", flush=True)
        proc = subprocess.Popen(cmd, start_new_session=True)
        stalled = False
        last = _progress_stamp(args.progress)
        last_change = time.time()
        seen_change = False  # has THIS attempt written progress yet?
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            time.sleep(args.poll_sec)
            now = _progress_stamp(args.progress)
            if now != last:
                last, last_change = now, time.time()
                seen_change = True
                continue
            # until THIS attempt's first progress write (file missing, or
            # mtime left over from a previous attempt) a run legitimately
            # spends a long time in bootstrap + cold jit compiles
            # (15 s–8 min per program on the tunneled chip) — give it a
            # cold_grace× window before declaring a stall
            limit = args.stale_sec * (1.0 if seen_change else args.cold_grace)
            if time.time() - last_change > limit:
                print(
                    f"supervise: no progress on {args.progress} for "
                    f"{limit:.0f}s — killing attempt {attempt}",
                    flush=True,
                )
                # the whole session group: the command and its children
                # (it may have died on its own during the poll sleep)
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
                stalled = True
                rc = -9
                break
        if rc == 0 or (_success(args) and not stalled):
            print(f"supervise: attempt {attempt} succeeded")
            return 0
        print(f"supervise: attempt {attempt} rc={rc}", flush=True)
        time.sleep(args.retry_delay_sec)
    print("supervise: attempts exhausted", flush=True)
    return 1


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" not in argv:
        print("usage: supervise.py [opts] -- cmd ...", file=sys.stderr)
        return 2
    split = argv.index("--")
    opts, cmd = argv[:split], argv[split + 1 :]
    p = argparse.ArgumentParser()
    p.add_argument("--progress", required=True,
                   help="file whose mtime advances while the run is healthy")
    p.add_argument("--stale-sec", type=float, default=900.0)
    p.add_argument("--cold-grace", type=float, default=3.0,
                   help="multiplier on --stale-sec before the progress "
                        "file's first write (bootstrap + cold compiles)")
    p.add_argument("--poll-sec", type=float, default=10.0)
    p.add_argument("--retry-delay-sec", type=float, default=30.0)
    p.add_argument("--max-attempts", type=int, default=20)
    p.add_argument("--success-grep", default="",
                   help="treat the run as complete when this substring "
                        "appears in --success-file")
    p.add_argument("--success-file", default="")
    args = p.parse_args(opts)
    if args.success_grep and not args.success_file:
        p.error("--success-grep requires --success-file")
    return supervise(args, cmd)


if __name__ == "__main__":
    raise SystemExit(main())
