"""Registry hygiene: every oracle query must have driver-side
correctness evidence — a green row in some CORRECTNESS_r*.json — or be
scheduled for it (sit inside the next driver window, the first ~50
registry entries). Guards future additions against silently shipping
oracle queries that never meet the driver's gate."""

from __future__ import annotations

import glob
import json
import os

from data_engineering_rag_spark.plans import REGISTRY

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _driver_rows() -> set[str]:
    names: set[str] = set()
    for path in glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")):
        with open(path) as f:
            names |= set(json.load(f))
    return names


def test_every_oracle_query_has_driver_evidence_or_window_slot():
    checked = _driver_rows()
    window = set(list(REGISTRY)[:DRIVER_WINDOW])
    unscheduled = [
        name
        for name, spec in REGISTRY.items()
        if spec.oracle is not None and name not in checked and name not in window
    ]
    assert not unscheduled, (
        "oracle queries with no driver-green row and no slot in the next "
        f"driver window (reorder plans/__init__.py): {unscheduled}"
    )


def test_window_prioritizes_unchecked_oracle_queries():
    """No already-verified query may occupy a window slot while an
    unchecked oracle query waits outside the window."""
    checked = _driver_rows()
    names = list(REGISTRY)
    window, rest = names[:DRIVER_WINDOW], names[DRIVER_WINDOW:]
    waiting = [n for n in rest if REGISTRY[n].oracle is not None and n not in checked]
    if not waiting:
        return
    squatters = [n for n in window if n in checked]
    assert not squatters, (
        f"verified queries {squatters} hold window slots while unchecked "
        f"oracle queries wait: {waiting}"
    )
