"""Driver-window rotation (__spark_entry__.queries order): the driver
snapshots only the first 50 dict entries, so the rotation must keep the
no-oracle entries pinned in-window and bring every entry absent from the
latest CORRECTNESS artifact back in-window (2-round certification cycle).
"""

import glob
import importlib.util
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_test", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _latest_artifact():
    best, best_round = None, -1
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", os.path.basename(p))
        if m and int(m.group(1)) > best_round:
            best, best_round = p, int(m.group(1))
    return best


def test_no_oracle_entries_pinned_in_window():
    mod = _entry_module()
    keys = list(mod.queries().keys())
    window = set(keys[:WINDOW])
    for name in mod._PINNED_NO_ORACLE:
        assert name in window, f"no-oracle entry {name} fell out of window"


def test_stale_entries_rotate_into_window():
    mod = _entry_module()
    keys = list(mod.queries().keys())
    window = set(keys[:WINDOW])
    latest = _latest_artifact()
    if latest is None:
        return
    seen = set(json.load(open(latest)))
    stale = [k for k in keys if k not in seen]
    # every entry the driver did NOT certify last round must be in-window
    # now (guaranteed as long as stale + pinned fits the window)
    if len(stale) + len(mod._PINNED_NO_ORACLE) <= WINDOW:
        missing = [k for k in stale if k not in window]
        assert not missing, f"stale entries not rotated in: {missing}"


def test_rotation_is_deterministic():
    mod = _entry_module()
    assert list(mod.queries().keys()) == list(mod.queries().keys())


def test_every_query_has_oracle_or_is_pinned():
    mod = _entry_module()
    oracles = mod.oracle_sql()
    for name in mod.queries():
        assert name in oracles or name in mod._PINNED_NO_ORACLE, (
            f"{name} has no oracle and is not pinned"
        )
