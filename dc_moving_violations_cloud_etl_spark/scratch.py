"""Process-keyed scratch-directory hygiene.

Several demo queries mutate and re-read a private on-disk working dir
(streaming sink round-trips, WAP table demos). Each process keys its dir
by pid so concurrent harnesses never rmtree each other mid-run; dirs
left behind by DEAD processes are swept best-effort so scratch state
never accumulates across rounds (VERDICT r2 rec #6).

Liveness is probed with ``os.kill(pid, 0)`` — portable (no Linux-only
``/proc``) and distinguishing "no such process" (ProcessLookupError =>
dead) from "alive but not ours" (PermissionError => alive) — and is
additionally gated on directory AGE, because pids recycle: a dir
younger than the threshold is never swept even if its pid looks dead
(a crashed-and-restarted harness may still want it), and an old dir is
swept only once its pid probe says dead — an old dir whose recycled
pid happens to be live again is deliberately left alone (conservative:
it may be a genuinely long-running harness) and falls to a later sweep
once that process exits (ADVICE r4).
"""

from __future__ import annotations

import os
import shutil


def pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return True  # unknown — err on the side of "alive"
    return True


def sweep_dead_scratch(
    root: str, prefixes: tuple[str, ...], min_age_s: float = 3600.0
) -> None:
    """Remove ``root``'s entries matching ``prefixes`` whose trailing
    ``_<pid>`` component names a dead process, skipping our own pid and
    anything modified within ``min_age_s``. A young dir is never swept
    even if its pid looks dead (a restarted harness may reclaim it); an
    old dir whose recycled pid is live again is deliberately left to a
    later sweep — conservative against deleting a long-running
    harness's state."""
    import time

    now = time.time()
    try:
        entries = os.listdir(root)
    except FileNotFoundError:
        return
    for entry in entries:
        if not entry.startswith(prefixes):
            continue
        pid = entry.rsplit("_", 1)[-1]
        if not pid.isdigit() or pid == str(os.getpid()):
            continue
        path = os.path.join(root, entry)
        try:
            age = now - os.stat(path).st_mtime
        except OSError:
            continue
        if age < min_age_s:
            continue
        if not pid_alive(int(pid)):
            shutil.rmtree(path, ignore_errors=True)
