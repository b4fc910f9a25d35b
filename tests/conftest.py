from __future__ import annotations

import os
import sys

import pytest

TEST_SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Locations that may carry a usable google.protobuf distribution when
# the interpreter's site-packages lacks one (transformWithStateInPandas
# needs it as the state-server transport). Purely additive test
# bootstrap: if none works, the state-v2 equivalence test importorskips
# exactly as before.
_PROTOBUF_FALLBACK_PATHS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _ensure_protobuf() -> None:
    try:
        import google.protobuf  # noqa: F401

        return
    except ImportError:
        pass
    for cand in _PROTOBUF_FALLBACK_PATHS:
        if not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        sys.path.insert(0, cand)
        try:
            import google.protobuf  # noqa: F401
        except ImportError:
            sys.path.remove(cand)
            continue
        # Must run BEFORE the JVM starts: local-mode Python workers
        # inherit the driver environment, so exporting PYTHONPATH here
        # makes the fallback visible inside stateful-streaming workers
        # too (the proto messages deserialize worker-side). The
        # _support dir carries a sitecustomize.py that relaxes
        # protobuf's strict gencode≤runtime version gate (6.33 gencode
        # vs this fallback's 6.32 runtime) in every spawned process;
        # apply the same relaxation in-process here.
        support = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_support")
        extra = cand + os.pathsep + support
        os.environ["PYTHONPATH"] = extra + os.pathsep + os.environ.get("PYTHONPATH", "")
        try:
            from google.protobuf import runtime_version as _rv

            _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
        except Exception:
            pass
        return


_ensure_protobuf()


@pytest.fixture(scope="session")
def spark():
    from data_engineering_rag_spark.session import get_spark

    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return TEST_SF_DIR
