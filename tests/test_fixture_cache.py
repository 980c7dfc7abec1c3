"""fixture_cache.cached_fixture: the build-once publish protocol."""

from __future__ import annotations

import os

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
    dead = f"{path}._building_999999"  # PID_MAX on this kernel is lower
    live = f"{path}._building_{os.getpid()}"  # our own pid = provably alive
    os.makedirs(dead)
    os.makedirs(live)
    open(os.path.join(live, "inflight"), "w").close()

    def build(tmp):
        # our pid's tmp dir is handed to US as the build target: the
        # sweep must not have deleted the live builder's dir first
        assert tmp == live
        assert os.path.exists(os.path.join(live, "inflight"))
        open(os.path.join(tmp, "done"), "w").close()

    cached_fixture(path, build)
    assert not os.path.exists(dead), "dead builder tmp not swept"
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
