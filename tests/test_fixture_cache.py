"""fixture_cache.cached_fixture: the build-once publish protocol."""

from __future__ import annotations

import glob
import os
import pathlib

import pytest

from dd_ops_ocr_spark.fixture_cache import cached_fixture


def _mk(tmp_path, name="fix"):
    return str(tmp_path / name)


def test_builds_once_then_reuses(tmp_path):
    path = _mk(tmp_path)
    calls = []

    def build(tmp):
        calls.append(tmp)
        os.makedirs(tmp)
        open(os.path.join(tmp, "ok"), "w").close()

    assert cached_fixture(path, build) == path
    assert os.path.exists(os.path.join(path, "ok"))
    assert cached_fixture(path, build) == path
    assert len(calls) == 1  # second call was a cache hit


def test_dead_builder_tmp_swept_live_tmp_kept(tmp_path):
    path = _mk(tmp_path)
    dead = f"{path}._building_999999_aaaa"  # PID_MAX on this kernel is lower
    live = f"{path}._building_{os.getpid()}_bbbb"  # our pid = provably alive
    legacy = f"{path}._building_{os.getpid()}"  # pre-token name, alive pid
    os.makedirs(dead)
    os.makedirs(live)
    os.makedirs(legacy)
    open(os.path.join(live, "inflight"), "w").close()

    def build(tmp):
        # every attempt gets its OWN fresh dir; the sweep must not have
        # deleted any live builder's dir (token or legacy format)
        assert tmp not in (dead, live, legacy)
        assert os.path.exists(os.path.join(live, "inflight"))
        os.makedirs(tmp)
        open(os.path.join(tmp, "done"), "w").close()

    cached_fixture(path, build)
    assert not os.path.exists(dead), "dead builder tmp not swept"
    assert os.path.exists(live) and os.path.exists(legacy), \
        "live builder tmp must never be touched"
    assert os.path.exists(os.path.join(path, "done"))


def test_lost_rename_adopts_winner(tmp_path):
    path = _mk(tmp_path)

    def build(tmp):
        os.makedirs(tmp)
        open(os.path.join(tmp, "mine"), "w").close()
        # a concurrent builder publishes first
        os.makedirs(path)
        open(os.path.join(path, "winner"), "w").close()

    assert cached_fixture(path, build) == path
    assert os.path.exists(os.path.join(path, "winner"))
    # loser's tmp cleaned up
    assert not os.path.exists(f"{path}._building_{os.getpid()}")


def test_lost_rename_with_no_winner_reraises(tmp_path):
    """A rename failure with NO published fixture must surface, not
    return a path whose read would fail."""
    path = _mk(tmp_path)

    def build(tmp):
        pass  # never creates tmp -> rename raises FileNotFoundError

    with pytest.raises(OSError):
        cached_fixture(path, build)


def test_failed_build_leaves_no_dirty_tmp_and_retry_succeeds(tmp_path):
    """A build that raises must remove its tmp dir so a same-process
    retry starts clean instead of publishing stale partial state."""
    target = str(tmp_path / "fx")
    attempts = {"n": 0}

    def build(tmp):
        attempts["n"] += 1
        os.makedirs(tmp)
        (pathlib.Path(tmp) / "part").write_text(f"attempt{attempts['n']}")
        if attempts["n"] == 1:
            raise RuntimeError("first build dies mid-way")

    with pytest.raises(RuntimeError):
        cached_fixture(target, build)
    assert not glob.glob(f"{target}._building_*"), "dirty tmp left behind"
    cached_fixture(target, build)
    assert (pathlib.Path(target) / "part").read_text() == "attempt2"
