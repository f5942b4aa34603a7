"""Per-table process lock — C6 parity (reference ``utils/lock.py:6-101``):
``fcntl.flock`` on ``{lock_dir}/{db}_{table}.lock`` with pid+timestamp
payload, stale-lock self-healing, acquire timeout + retry.

Fixes quirk Q3: the reference's live code path never releases the lock
(``migration.py:542``); here acquisition is a context manager, so release is
guaranteed (flock also dies with the process, preserving the reference's
crash-safety).
"""

from __future__ import annotations

import contextlib
import fcntl
import os
import time

ACQUIRE_TIMEOUT_S = 3600.0  # lock.py:27 parity
RETRY_INTERVAL_S = 5.0  # lock.py:51 parity


class LockTimeout(RuntimeError):
    pass


def lock_path(lock_dir: str, db: str, table: str) -> str:
    return os.path.join(lock_dir, f"{db}_{table}.lock")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def is_locked(lock_dir: str, db: str, table: str) -> bool:
    """Probe without acquiring; unlink stale files (dead pid) — parity with
    ``lock.py:76-101``."""
    path = lock_path(lock_dir, db, table)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
            except BlockingIOError:
                return True
            fcntl.flock(f, fcntl.LOCK_UN)
            content = f.read().split()
        pid = int(content[0]) if content else -1
        if pid > 0 and _pid_alive(pid):
            # file unlocked but owner alive → treat as free (flock is truth)
            return False
        os.unlink(path)  # stale: unlocked and/or dead owner (lock.py:94)
        return False
    except (OSError, ValueError):
        return False


@contextlib.contextmanager
def table_lock(
    lock_dir: str,
    db: str,
    table: str,
    timeout_s: float = ACQUIRE_TIMEOUT_S,
    retry_s: float = RETRY_INTERVAL_S,
):
    """Blocking acquire with timeout; always releases (Q3 fix)."""
    os.makedirs(lock_dir, exist_ok=True)
    path = lock_path(lock_dir, db, table)
    deadline = time.monotonic() + timeout_s
    f = open(path, "a+")
    try:
        while True:
            try:
                fcntl.flock(f, fcntl.LOCK_EX | fcntl.LOCK_NB)
                break
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    raise LockTimeout(f"could not acquire {path} in {timeout_s}s")
                time.sleep(retry_s)
        f.seek(0)
        f.truncate()
        f.write(f"{os.getpid()} {time.strftime('%Y-%m-%d %H:%M:%S')}\n")
        f.flush()
        yield path
    finally:
        with contextlib.suppress(OSError):
            fcntl.flock(f, fcntl.LOCK_UN)
        f.close()
        with contextlib.suppress(OSError):
            os.unlink(path)
