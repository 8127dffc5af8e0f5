"""bench.py's contention detector (VERDICT r10 #3): the self-subtree /
ancestor exclusion must hide the bench's OWN processes (its Spark JVM is
a child; the waiting driver is an ancestor) while still detecting the
r10 pollution scenario — an unrelated Spark/pytest process, including
one launched by the same driver (a SIBLING, reachable only through an
ancestor, which a naive descendants-of-excluded fixpoint would wrongly
hide)."""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

_REPO_ROOT = str(Path(__file__).resolve().parents[1])
sys.path.insert(0, _REPO_ROOT)

import bench  # noqa: E402


def _flagged_pids(ev) -> set[str]:
    if not ev:
        return set()
    out = set()
    for line in list(ev.get("spark_pythons", [])) + list(
        ev.get("foreign_jvms", [])
    ):
        out.add(line.split(":", 1)[0].removeprefix("pid "))
    return out


def test_own_descendant_is_not_contention():
    """A marker process in OUR OWN subtree (the bench's Spark JVM shape)
    must not be flagged."""
    child = subprocess.Popen(
        [sys.executable, "-c", "import time; time.sleep(30)  # pyspark"],
    )
    try:
        time.sleep(0.2)
        ev = bench._contention_evidence(include_load=False)
        assert str(child.pid) not in _flagged_pids(ev)
    finally:
        child.terminate()
        child.wait()


def test_reparented_sibling_is_contention():
    """A marker process NOT in our subtree or ancestor chain (here:
    orphaned via double-fork, so it reparents to init — the shape of a
    second job the driver launched) MUST be flagged."""
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "import subprocess, sys; "
            "p = subprocess.Popen([sys.executable, '-c', "
            "'import time; time.sleep(30)  # pyspark'], "
            "stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, "
            "stdin=subprocess.DEVNULL); "
            "print(p.pid)",
        ],
        capture_output=True,
        text=True,
        timeout=30,
    )
    gpid = int(out.stdout.strip())
    try:
        deadline = time.time() + 10
        while time.time() < deadline:
            time.sleep(0.2)  # wait for the intermediate to exit + reparent
            ev = bench._contention_evidence(include_load=False)
            if str(gpid) in _flagged_pids(ev):
                break
        assert str(gpid) in _flagged_pids(ev), ev
    finally:
        os.kill(gpid, 15)


def test_zombie_java_is_not_contention(tmp_path, monkeypatch):
    """An exited-but-unreaped (zombie) process whose comm was ``java``
    must NOT be flagged: it consumes no CPU and its cmdline reads empty
    — exactly the evidence (``pid NNN: ``) that spuriously stamped
    BENCH_r11 ``contended`` (VERDICT r11 What's-wrong #1).  A LIVE java
    process in the same (sibling) position is the positive control
    proving the zombie was visible to the scan, not hidden by the
    subtree exclusion."""
    # comm comes from the basename passed to execve, so a symlink named
    # "java" gives us a process the detector classifies as a JVM
    java = tmp_path / "java"
    java.symlink_to("/bin/sleep")
    decoy = subprocess.Popen(["/bin/sleep", "30"])
    live = subprocess.Popen([str(java), "30"])
    # created LAST: each new Popen runs subprocess._cleanup(), which
    # would reap an existing zombie child
    zombie = subprocess.Popen([str(java), "0"])
    try:
        deadline = time.time() + 10
        while time.time() < deadline:  # wait for the child to exit
            with open(f"/proc/{zombie.pid}/stat") as fh:
                if fh.read().rsplit(")", 1)[1].split()[0] == "Z":
                    break
            time.sleep(0.1)
        # view the scan from the decoy's pid: the zombie and the live
        # java are then SIBLINGS (children of an ancestor), outside the
        # self-subtree exclusion — the driver-spawned-zombie shape
        monkeypatch.setattr(os, "getpid", lambda: decoy.pid)
        ev = bench._contention_evidence(include_load=False)
        flagged = _flagged_pids(ev)
        assert str(live.pid) in flagged, ev  # positive control
        assert str(zombie.pid) not in flagged, ev
    finally:
        monkeypatch.undo()
        for p in (decoy, live):
            p.terminate()
            p.wait()
        zombie.wait()
