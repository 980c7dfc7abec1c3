"""Build-once directory fixtures with a crash-safe, race-safe protocol.

One implementation shared by ``registry._landed_cache`` and
``operators.catalogops._fixture_table`` (previously two hand-rolled
copies of the same subtle protocol). Invariants:

  * a COMPLETE fixture is only ever observed via the final ``path`` —
    builders work in ``path._building_<pid>`` and publish with one
    atomic rename;
  * tmp dirs of DEAD builders (crashes) are swept so they can't
    accumulate, but a LIVE concurrent builder's tmp is never touched —
    sweeping it mid-write would fail that builder's Spark job, not
    "make it rebuild" (pid liveness via ``os.kill(pid, 0)``; a recycled
    pid just postpones the sweep to the next cold build);
  * losing the publish rename is only treated as "another builder won"
    when the winner's fixture actually exists; otherwise the error is
    re-raised instead of returning a path that a subsequent read would
    fail on.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid
from collections.abc import Callable


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def cached_fixture(path: str, build: Callable[[str], None]) -> str:
    """Return ``path``, building it first via ``build(tmp_dir)`` if it
    does not exist yet. ``build`` must write the complete fixture into
    the tmp dir it is given; publication is an atomic rename."""
    if os.path.isdir(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    for stale in glob.glob(f"{path}._building_*"):
        # tmp name is ._building_<pid>_<token> (token makes retries and
        # concurrent same-process threads land in distinct dirs)
        suffix = stale.rsplit("._building_", 1)[-1]
        try:
            pid = int(suffix.split("_", 1)[0])
        except ValueError:
            pid = -1
        if pid > 0 and _pid_alive(pid):
            continue  # a live builder owns this tmp — leave it alone
        shutil.rmtree(stale, ignore_errors=True)
    tmp = f"{path}._building_{os.getpid()}_{uuid.uuid4().hex[:8]}"
    try:
        build(tmp)
    except BaseException:
        # a failed build must not leave a dirty tmp for a same-process
        # retry to publish as if complete
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        os.rename(tmp, path)
    except OSError:
        if os.path.isdir(path):  # a concurrent builder won — adopt its copy
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise  # nobody won; surface the real failure
    return path


def bench_cache_dir() -> str:
    """The repo-root ``.bench_cache`` directory — the one place that
    knows the repo layout, instead of each fixture builder re-deriving
    it with a dirname chain whose depth silently depends on which
    package level the caller lives at."""
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_cache",
    )
