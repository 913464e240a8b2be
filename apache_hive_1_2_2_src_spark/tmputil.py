"""Process-scoped scratch directories with leak reaping.

Every query that materializes intermediate files (staged layouts, inboxes,
DDL locations) allocates through ``scratch_dir``. Contract:

- dirs are named ``hive_spark_<tag>_p<pid>_<rand>`` so OWNERSHIP is
  readable from the name;
- this process's dirs are removed at interpreter exit (atexit);
- the FIRST allocation in a process also REAPS leftovers: any sibling
  ``hive_spark_*`` dir whose embedded pid is dead, plus legacy dirs with
  no embedded pid older than six hours (pre-r11 runs leaked one dir per
  staged query per process — 905 were found in /tmp in round 11; a
  crashed process can never clean itself, so the next run does it).

Scale note: this is ops hygiene, not data-plane — on a cluster the same
role is played by scratch-dir TTL policies (hive.exec.scratchdir had the
identical leak-on-crash problem, cleaned by HiveServer2's periodic
ClearDanglingScratchDir — the reaper here is that service in library form).
"""

from __future__ import annotations

import atexit
import os
import re
import shutil
import tempfile
import time

_MINE: list[str] = []
_REAPED = False
_LEGACY_TTL_S = 6 * 3600
_PID_DEAD_GRACE_S = 600
_OWNED_RE = re.compile(r"^hive_spark_.*_p(\d+)_")


def _cleanup() -> None:
    for d in _MINE:
        shutil.rmtree(d, ignore_errors=True)
    _MINE.clear()


atexit.register(_cleanup)


def _reap_stale() -> None:
    root = tempfile.gettempdir()
    now = time.time()
    try:
        names = os.listdir(root)
    except OSError:
        return
    for name in names:
        if not name.startswith("hive_spark_"):
            continue
        path = os.path.join(root, name)
        if not os.path.isdir(path):
            continue
        m = _OWNED_RE.match(name)
        try:
            # Only reap dirs THIS uid owns (ADVICE r11): on a shared /tmp
            # another user's dir is not ours to judge, and the pid-liveness
            # probe below is not PID-namespace aware — a foreign container's
            # live process looks dead from here.
            if os.stat(path).st_uid != os.getuid():
                continue
            if m:
                pid = int(m.group(1))
                if pid == os.getpid():
                    continue
                os.kill(pid, 0)  # raises ProcessLookupError if dead
                continue  # owner alive — leave it
            # legacy unowned dir: reap only when clearly abandoned — mtime
            # recency doubles as a liveness signal (a still-running >6h
            # process keeps touching its staging files).
            if now - os.path.getmtime(path) < _LEGACY_TTL_S:
                continue
        except ProcessLookupError:
            # pid dead in OUR namespace AND the dir is quiescent: a dir
            # modified seconds ago with a "dead" owner is more likely a
            # namespace mismatch than a leak — leave it for the TTL path.
            try:
                if now - os.path.getmtime(path) < _PID_DEAD_GRACE_S:
                    continue
            except OSError:
                continue
        except (ValueError, PermissionError, OSError):
            continue
        shutil.rmtree(path, ignore_errors=True)


def scratch_dir(tag: str) -> str:
    """A fresh scratch dir owned by this process; reaped siblings first."""
    global _REAPED
    if not _REAPED:
        _REAPED = True
        _reap_stale()
    d = tempfile.mkdtemp(prefix=f"hive_spark_{tag}_p{os.getpid()}_")
    _MINE.append(d)
    return d
