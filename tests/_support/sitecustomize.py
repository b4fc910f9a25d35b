"""Test-env shim, active only when tests/conftest.py falls back to the
gcloud-SDK google.protobuf runtime (see ``_ensure_protobuf``): that
runtime (6.32) is one minor version behind the gencode pyspark ships
(6.33), and protobuf's strict same-or-newer runtime check refuses the
pair outright. Relax the check in every Python process (this file rides
the same PYTHONPATH entry, so Spark's streaming driver/worker
subprocesses import it at startup). Actual wire breakage would still
fail the equivalence tests loudly — only the version gate is relaxed.
"""

try:
    from google.protobuf import runtime_version as _rv

    _rv.ValidateProtobufRuntimeVersion = lambda *a, **k: None
except Exception:
    pass
