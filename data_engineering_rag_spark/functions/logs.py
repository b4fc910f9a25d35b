"""Conversation-log analytics (SURVEY.md §2.2 F10/F11, §2.6 A2-A4;
reference ``zc_agent/eval/calculate_metrics.py``).

The reference loops Python dicts and deletes keys per part kind
(``calculate_metrics.py:64-92``); here the same reshaping is pure
higher-order Column functions (``transform`` over the nested arrays)
— no Python, fully codegen'd, and it scales to billions of logs
because it's a narrow map over one column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

# FIXTURES.md B6 / logs.py:30-39 shape.
PART_SCHEMA = StructType(
    [
        StructField("part_kind", StringType()),
        StructField("content", StringType()),
        StructField("tool_name", StringType()),
        StructField("args", StringType()),
        StructField("tool_call_id", StringType()),
        StructField("metadata", StringType()),
        StructField("timestamp", StringType()),
        StructField("id", StringType()),
    ]
)
MESSAGE_SCHEMA = StructType(
    [StructField("kind", StringType()), StructField("parts", ArrayType(PART_SCHEMA))]
)
LOG_SCHEMA = StructType(
    [
        StructField("agent_name", StringType()),
        StructField("system_prompt", StringType()),
        StructField("provider", StringType()),
        StructField("model", StringType()),
        StructField("tools", ArrayType(StringType())),
        StructField("source", StringType()),
        StructField(
            "extra",
            StructType(
                [StructField("filepath", StringType()), StructField("question", StringType())]
            ),
        ),
        StructField("messages", ArrayType(MESSAGE_SCHEMA)),
    ]
)

# gpt-5-nano pricing constants from calculate_metrics.py:151-156.
INPUT_COST_PER_M = 0.050
OUTPUT_COST_PER_M = 0.400


def read_logs(spark: SparkSession, glob_path: str) -> DataFrame:
    """S7: JSON-log directory → one DataFrame, source file attached."""
    return (
        spark.read.option("multiLine", "true")
        .schema(LOG_SCHEMA)
        .json(glob_path)
        .withColumn("file", F.regexp_extract(F.input_file_name(), "([^/]+)$", 1))
    )


def filter_eval_set(logs: DataFrame) -> DataFrame:
    """F7: filename contains gh_agent AND source == 'ai-generated'
    (``calculate_metrics.py:95-109``)."""
    return logs.where(
        F.col("file").contains("gh_agent") & (F.col("source") == "ai-generated")
    )


def simplify_messages(messages: Column) -> Column:
    """F11: per part kind, drop noisy fields and redact tool returns —
    the reference's dict-key deletions as a struct rebuild. Fields a
    kind 'deletes' become NULL; tool-return content is replaced."""
    return F.transform(
        messages,
        lambda m: F.struct(
            m["kind"].alias("kind"),
            F.transform(
                m["parts"],
                lambda p: F.struct(
                    p["part_kind"].alias("part_kind"),
                    F.when(p["part_kind"] == "tool-return", F.lit("RETURN_RESULTS_REDACTED"))
                    .otherwise(p["content"])
                    .alias("content"),
                    p["tool_name"].alias("tool_name"),
                    p["args"].alias("args"),
                ),
            ).alias("parts"),
        ),
    )


def extract_qa(logs: DataFrame) -> DataFrame:
    """F10: question = first message's first part, answer = last
    message's first part (``calculate_metrics.py:124-125``)."""
    first_msg = F.element_at(F.col("messages"), 1)
    last_msg = F.element_at(F.col("messages"), -1)
    return logs.select(
        "file",
        "agent_name",
        "model",
        F.element_at(first_msg["parts"], 1)["content"].alias("question"),
        F.element_at(last_msg["parts"], 1)["content"].alias("answer"),
        F.size("messages").cast("long").alias("n_messages"),
    )


def with_costs(eval_rows: DataFrame) -> DataFrame:
    """A4: token→cost arithmetic (``calculate_metrics.py:148-166``)."""
    inp = F.col("input_tokens")
    out = F.col("output_tokens")
    in_cost = inp / F.lit(1_000_000) * F.lit(INPUT_COST_PER_M)
    out_cost = out / F.lit(1_000_000) * F.lit(OUTPUT_COST_PER_M)
    return eval_rows.select(
        "*",
        (inp + out).alias("total_tokens"),
        F.round(in_cost, 10).alias("input_cost"),
        F.round(out_cost, 10).alias("output_cost"),
        F.round(in_cost + out_cost, 10).alias("total_cost"),
    )


def write_conversation_logs(logs: DataFrame, out_dir: str) -> None:
    """S8: one JSON file per conversation, named
    ``{agent}_{yyyyMMdd_HHmmss}_{hex}.json`` (reference
    ``logs.py:41-55``). The name is data-derived, so it's computed as a
    column (uuid() supplies the reference's ``secrets.token_hex``) and
    the write is partitioned by it — each conversation lands in its own
    directory with a single JSON part, scalable to any log volume
    (driver never materializes the data)."""
    # The reference takes the last message's timestamp; in the nested
    # schema timestamps live on parts (and only some kinds carry one),
    # so use the conversation's latest part timestamp.
    all_ts = F.filter(
        F.flatten(
            F.transform(
                F.col("messages"), lambda m: F.transform(m["parts"], lambda p: p["timestamp"])
            )
        ),
        lambda x: x.isNotNull(),
    )
    named = logs.withColumn(
        "log_name",
        F.concat_ws(
            "_",
            F.col("agent_name"),
            F.date_format(F.to_timestamp(F.array_max(all_ts)), "yyyyMMdd_HHmmss"),
            F.substring(F.regexp_replace(F.uuid(), "-", ""), 1, 6),
        ),
    )
    named.write.mode("overwrite").partitionBy("log_name").json(out_dir)
