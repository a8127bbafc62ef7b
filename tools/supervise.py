"""Supervised retry loop for tunneled-TPU runs (the compile-hang
mitigation): respawn a command until its remote compiles land in the
persistent XLA cache and the run completes.

The axon remote-compile service hangs ~50% of fresh processes,
indefinitely, at ~0 CPU (docs/BENCH_NOTES.md "Compile-hang fallback").
Two facts make a retry loop the correct mitigation rather than a
workaround: (1) the hang is a per-process lottery — the same program
compiled in 19 s in one process and 555 s in the next; (2) XLA
programs DO land in the persistent compilation cache, so every attempt
ratchets forward — programs compiled before a hang are warm for the
next attempt.

Operational rules learned rounds 2-4 (hard-won; see the tpu-bench
memory + verify skill):
- the child runs in its OWN session (`start_new_session=True`) and is
  killed by process GROUP — killing only the harness orphans a
  TPU-holding CLI, and stacked orphans fight in the claim loop
  producing fake compile hangs for every later run;
- the stall window must exceed 20 min — legitimate remote compiles sit
  at ~0 CPU for 13-15+ min;
- stall is detected by LOG SILENCE (output-file mtime), not wall time:
  a healthy 1M streaming pass prints progress continuously;
- after SIGKILL of the group, wait and confirm no survivors before
  respawning (a second TPU client spins in the claim loop forever).

Usage:
    python tools/supervise.py --stall-min 25 --attempts 4 \
        --log /tmp/run.log -- python scaling_bench.py --cli-1m
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time


def _group_alive(pgid: int) -> bool:
    try:
        os.killpg(pgid, 0)
        return True
    except (ProcessLookupError, PermissionError):
        return False


def _kill_group(pgid: int, log) -> None:
    for sig, grace in ((signal.SIGTERM, 20), (signal.SIGKILL, 30)):
        try:
            os.killpg(pgid, sig)
        except ProcessLookupError:
            return
        t0 = time.time()
        while time.time() - t0 < grace:
            if not _group_alive(pgid):
                return
            time.sleep(1)
    if _group_alive(pgid):
        print(f"[supervise] WARNING: group {pgid} survived SIGKILL", file=log)


def supervise(cmd, *, stall_min: float, attempts: int, log_path: str,
              settle_s: float = 30.0) -> int:
    """Run `cmd` under the retry loop; returns the final exit code
    (0 on the first successful attempt)."""
    stall_s = stall_min * 60.0
    for attempt in range(1, attempts + 1):
        with open(log_path, "a", buffering=1) as log:
            print(f"[supervise] attempt {attempt}/{attempts}: {' '.join(cmd)}",
                  file=log)
            proc = subprocess.Popen(
                cmd, stdout=log, stderr=subprocess.STDOUT,
                start_new_session=True,
            )
            pgid = proc.pid
            stalled = False
            while True:
                rc = proc.poll()
                if rc is not None:
                    break
                silence = time.time() - os.path.getmtime(log_path)
                if silence > stall_s:
                    print(f"[supervise] attempt {attempt}: log silent "
                          f"{silence/60:.1f} min > {stall_min} min — killing "
                          f"group {pgid}", file=log)
                    stalled = True
                    _kill_group(pgid, log)
                    rc = proc.wait()
                    break
                time.sleep(10)
            if rc == 0:
                print(f"[supervise] attempt {attempt}: SUCCESS", file=log)
                return 0
            print(f"[supervise] attempt {attempt}: rc={rc} stalled={stalled}",
                  file=log)
            # let the relay settle before presenting a new client
            time.sleep(settle_s)
    return rc if rc is not None else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--stall-min", type=float, default=25.0,
                    help="log-silence window before the group is killed "
                         "(must exceed ~20 min: healthy remote compiles sit "
                         "silent for 13-15+ min)")
    ap.add_argument("--attempts", type=int, default=4)
    ap.add_argument("--log", required=True)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to run")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given")
    return supervise(cmd, stall_min=args.stall_min, attempts=args.attempts,
                     log_path=args.log)


if __name__ == "__main__":
    sys.exit(main())
