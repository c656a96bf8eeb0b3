"""Portable pid-liveness scratch sweeping (scratch.py, ADVICE r4)."""

from __future__ import annotations

import os
import time

from dc_moving_violations_cloud_etl_spark.scratch import (
    pid_alive,
    sweep_dead_scratch,
)


def test_pid_alive_self_and_dead():
    assert pid_alive(os.getpid())
    # pid 1 is init — alive but not ours (PermissionError path)
    assert pid_alive(1)


def _mkdir_aged(root, name, age_s):
    d = os.path.join(root, name)
    os.makedirs(d)
    old = time.time() - age_s
    os.utime(d, (old, old))
    return d


def test_sweep_respects_age_liveness_and_ownership(tmp_path):
    root = str(tmp_path)
    # dead pid, old -> swept. 2**22+9999 exceeds any default pid_max.
    dead_old = _mkdir_aged(root, f"demo_{2**22 + 9999}", 7200)
    # dead pid but YOUNG -> kept (mid-run tolerance / pid-probe misfire)
    dead_young = _mkdir_aged(root, f"demo_{2**22 + 9998}", 10)
    # live pid (ours), old -> kept
    ours_old = _mkdir_aged(root, f"demo_{os.getpid()}", 7200)
    # non-matching prefix, dead + old -> kept
    other = _mkdir_aged(root, f"keepme_{2**22 + 9997}", 7200)
    # non-pid suffix -> kept
    nonpid = _mkdir_aged(root, "demo_notapid", 7200)

    sweep_dead_scratch(root, ("demo_",), min_age_s=3600)

    assert not os.path.exists(dead_old)
    for d in (dead_young, ours_old, other, nonpid):
        assert os.path.exists(d)
