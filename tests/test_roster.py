"""The driver samples the first 50 registered queries. The roster
source marks that boundary with a comment; this test keeps the marker
HONEST: the names listed above it must be exactly the runtime 50-prefix
(a misplaced marker misleads maintainers into 'stamping' a query that
will never be sampled)."""

from __future__ import annotations

import inspect
import re

from dd_ops_ocr_spark import registry

BOUNDARY = "--- driver 50-prefix boundary"


def _names_above_marker() -> list[str]:
    src = inspect.getsource(registry)
    head_src = src.split("_ROSTER_HEAD = [", 1)[1]
    above = head_src.split(BOUNDARY, 1)[0]
    return re.findall(r'^\s*"([a-z0-9_]+)",\s*$', above, re.M)


def test_boundary_marker_matches_runtime_prefix():
    above = _names_above_marker()
    prefix = list(registry.QUERIES)[:50]
    assert above == prefix, (
        "roster boundary comment is misplaced: "
        f"{len(above)} names above the marker vs the runtime 50-prefix; "
        f"diff={set(above) ^ set(prefix)}"
    )


def test_every_roster_name_is_registered_and_unique():
    head = registry._ROSTER_HEAD
    assert len(head) == len(set(head)), "duplicate names in _ROSTER_HEAD"
    missing = [n for n in head if n not in registry.QUERIES]
    assert not missing
