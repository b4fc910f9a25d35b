"""F11 log simplification golden vs the reference algorithm
(``calculate_metrics.py:64-92``): same kinds, same survivors, same
redaction — modulo representation (dict-key deletion → NULL field)."""

from __future__ import annotations

import glob
import json

from pyspark.sql import functions as F

from data_engineering_rag_spark.functions.logs import (
    extract_qa,
    filter_eval_set,
    read_logs,
    simplify_messages,
    with_costs,
)
from data_engineering_rag_spark.plans.logsq import EVAL_CSV, LOGS_GLOB, EVAL_SCHEMA


def reference_simplify(messages):
    # calculate_metrics.py:64-92 reimplemented as oracle.
    out = []
    for m in messages:
        parts = []
        for original in m["parts"]:
            part = {k: v for k, v in original.items() if v is not None}
            kind = part["part_kind"]
            if kind == "user-prompt":
                del part["timestamp"]
            if kind == "tool-call":
                del part["tool_call_id"]
            if kind == "tool-return":
                del part["tool_call_id"]
                del part["metadata"]
                del part["timestamp"]
                part["content"] = "RETURN_RESULTS_REDACTED"
            if kind == "text":
                del part["id"]
            parts.append(part)
        out.append({"kind": m["kind"], "parts": parts})
    return out


def test_simplify_matches_reference(spark):
    logs = filter_eval_set(read_logs(spark, LOGS_GLOB))
    got = {
        r.file: r.simplified
        for r in logs.select(
            "file", simplify_messages(F.col("messages")).alias("simplified")
        ).collect()
    }
    for path in glob.glob(LOGS_GLOB):
        with open(path) as f:
            raw = json.load(f)
        name = path.split("/")[-1]
        if "gh_agent" not in name or raw.get("source") != "ai-generated":
            assert name not in got  # F7 filter parity
            continue
        expected = reference_simplify(raw["messages"])
        rows = got[name]
        assert len(rows) == len(expected)
        for row_msg, exp_msg in zip(rows, expected):
            assert row_msg.kind == exp_msg["kind"]
            for row_part, exp_part in zip(row_msg.parts, exp_msg["parts"]):
                assert row_part.part_kind == exp_part["part_kind"]
                assert row_part.content == exp_part.get("content")
                assert row_part.tool_name == exp_part.get("tool_name")
                assert row_part.args == exp_part.get("args")


def test_extract_qa_first_last(spark):
    qa = {r.file: r for r in extract_qa(read_logs(spark, LOGS_GLOB)).collect()}
    r = qa["gh_agent_20240101_100000_a1b2c3.json"]
    assert r.question == "How do I install Kafka?"
    assert r.answer == "Use docker compose. [setup.md]"
    assert r.n_messages == 4


def test_costs_match_reference_pricing(spark):
    rows = spark.read.option("header", "true").schema(EVAL_SCHEMA).csv(EVAL_CSV)
    out = {r.file: r for r in with_costs(rows).collect()}
    r = out["gh_agent_20240101_100000_a1b2c3.json"]
    assert r.total_tokens == 3900
    assert abs(r.input_cost - 1500 / 1e6 * 0.05) < 1e-12
    assert abs(r.output_cost - 2400 / 1e6 * 0.40) < 1e-12
    assert abs(r.total_cost - (r.input_cost + r.output_cost)) < 1e-12


def test_write_conversation_logs_names(spark, tmp_path):
    from data_engineering_rag_spark.functions.logs import write_conversation_logs
    import glob as globmod

    logs = read_logs(spark, LOGS_GLOB)
    out = str(tmp_path / "logs_out")
    write_conversation_logs(logs, out)
    dirs = sorted(
        p.split("/")[-1] for p in globmod.glob(out + "/log_name=*")
    )
    assert len(dirs) == logs.count()
    # names follow {agent}_{yyyyMMdd_HHmmss}_{hex6}
    import re

    for d in dirs:
        name = d.split("=", 1)[1]
        assert re.fullmatch(r"(gh_agent|other_agent)_\d{8}_\d{6}_[0-9a-f]{6}", name), name
