#!/usr/bin/env python
"""Regenerate the staleness-automation manifest (VERDICT r13 item 4).

For every registered query the manifest records the digest of its
result-producing definition (function AST minus docstring/decorators,
plus the raw oracle SQL) together with the LAST_CHANGED round current
at recording time. tests/test_registry_evidence.py fails whenever a
digest drifts from the manifest WITHOUT a LAST_CHANGED bump — so a
body edit can no longer silently leave stale driver evidence looking
fresh.

Workflow when you materially change a registered query's body:
  1. bump (or add) its ``LAST_CHANGED`` entry in plans/__init__.py
  2. python scripts/update_source_digests.py
  3. commit both files together
A comment/docstring-only edit changes no digest and needs neither.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MANIFEST_PATH = os.path.join(
    REPO, "data_engineering_rag_spark", "plans", "source_digests.json"
)


def _bootstrap_protobuf() -> None:
    """The two state-v2 streaming queries register only when
    google.protobuf imports (plans/streaming_q.py). The test suite
    bootstraps a fallback distribution (tests/conftest.py); reuse that
    exact bootstrap so the manifest covers the same 374-query view the
    enforcement test sees."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    try:
        from conftest import _ensure_protobuf

        _ensure_protobuf()
    except ImportError:
        pass
    finally:
        sys.path.pop(0)


def build_manifest() -> dict[str, dict]:
    from data_engineering_rag_spark.plans import LAST_CHANGED, REGISTRY, source_digest

    return {
        name: {
            "digest": source_digest(spec),
            "last_changed": LAST_CHANGED.get(name, 0),
        }
        for name, spec in sorted(REGISTRY.items())
    }


def main() -> int:
    _bootstrap_protobuf()
    manifest = build_manifest()
    old = {}
    if os.path.exists(MANIFEST_PATH):
        with open(MANIFEST_PATH) as f:
            old = json.load(f)
    changed = [
        n for n in manifest
        if n not in old or old[n] != manifest[n]
    ]
    removed = [n for n in old if n not in manifest]
    with open(MANIFEST_PATH, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(manifest)} entries -> {MANIFEST_PATH}")
    if changed:
        print(f"updated ({len(changed)}): {', '.join(changed[:20])}"
              + (" ..." if len(changed) > 20 else ""))
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
