#!/usr/bin/env python
"""Deterministic RAG-domain fixtures (FIXTURES.md §B): conversation
logs (B6) and eval rows (B7). Committed output; rerun only via
`make regen-goldens` semantics — outputs are stable for a given seed.
"""

from __future__ import annotations

import json
import os

OUT = os.path.dirname(os.path.abspath(__file__))


def _log(agent, ts, source, filepath, question, answer, with_tool=True):
    parts0 = [
        {"part_kind": "user-prompt", "content": question, "timestamp": f"{ts}T10:00:00"}
    ]
    messages = [{"kind": "request", "parts": parts0}]
    if with_tool:
        messages.append(
            {
                "kind": "response",
                "parts": [
                    {
                        "part_kind": "tool-call",
                        "tool_name": "search",
                        "args": json.dumps({"query": question[:20]}),
                        "tool_call_id": "tc_001",
                    }
                ],
            }
        )
        messages.append(
            {
                "kind": "request",
                "parts": [
                    {
                        "part_kind": "tool-return",
                        "tool_name": "search",
                        "content": "doc snippets here",
                        "tool_call_id": "tc_001",
                        "metadata": "{}",
                        "timestamp": f"{ts}T10:00:05",
                    }
                ],
            }
        )
    messages.append(
        {
            "kind": "response",
            "parts": [{"part_kind": "text", "content": answer, "id": "msg_final"}],
        }
    )
    return {
        "agent_name": agent,
        "system_prompt": "You are a helpful zoomcamp assistant. Cite sources.",
        "provider": "openai",
        "model": "gpt-4o-mini",
        "tools": ["search"],
        "source": source,
        "extra": {"filepath": filepath, "question": question},
        "messages": messages,
    }


LOGS = [
    (
        "gh_agent_20240101_100000_a1b2c3.json",
        _log("gh_agent", "2024-01-01", "ai-generated", "docs/setup.md", "How do I install Kafka?", "Use docker compose. [setup.md]"),
    ),
    (
        "gh_agent_20240102_110000_d4e5f6.json",
        _log("gh_agent", "2024-01-02", "ai-generated", "docs/spark.md", "What is a shuffle?", "A repartitioning of data across executors.", with_tool=False),
    ),
    (
        "gh_agent_20240103_120000_090807.json",
        _log("gh_agent", "2024-01-03", "user", "docs/airflow.md", "Manual question?", "Manual answer."),
    ),
    (
        "other_agent_20240104_130000_aabbcc.json",
        _log("other_agent", "2024-01-04", "ai-generated", "docs/dbt.md", "What is dbt?", "A transformation tool."),
    ),
    (
        "gh_agent_20240105_140000_ddeeff.json",
        _log("gh_agent", "2024-01-05", "ai-generated", "docs/terraform.md", "Why use IaC?", "Reproducible infrastructure. [terraform.md]"),
    ),
]

EVAL_ROWS_HEADER = (
    "file,input_tokens,output_tokens,instructions_follow,instructions_avoid,"
    "answer_relevant,answer_clear,answer_citations,completeness,tool_call_search"
)
EVAL_ROWS = [
    ("gh_agent_20240101_100000_a1b2c3.json", 1500, 2400, "true", "true", "true", "true", "true", "true", "true"),
    ("gh_agent_20240102_110000_d4e5f6.json", 1200, 1800, "true", "true", "true", "false", "false", "true", "false"),
    ("gh_agent_20240105_140000_ddeeff.json", 2000, 3200, "false", "true", "true", "true", "true", "false", "true"),
    ("gh_agent_20240106_150000_112233.json", 900, 1100, "true", "false", "false", "true", "false", "true", "false"),
]


def main() -> None:
    logdir = os.path.join(OUT, "ai_logs")
    os.makedirs(logdir, exist_ok=True)
    for name, payload in LOGS:
        with open(os.path.join(logdir, name), "w", encoding="utf-8") as f:
            json.dump(payload, f, indent=2, sort_keys=True)
    with open(os.path.join(OUT, "eval_rows.csv"), "w", encoding="utf-8") as f:
        f.write(EVAL_ROWS_HEADER + "\n")
        for row in EVAL_ROWS:
            f.write(",".join(str(x) for x in row) + "\n")
    print("fixtures written to", OUT)


if __name__ == "__main__":
    main()
