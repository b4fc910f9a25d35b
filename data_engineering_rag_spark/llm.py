"""LLM client protocol + deterministic stub (SURVEY.md §4.3.4).

The reference calls OpenAI per record (``zc_agent/llm.py:7-18``,
applied at ``prepare_data.py:194-224``). This environment has no
network, and LLM output is non-deterministic by nature, so the engine
treats the client as an injected dependency:

- ``LLMClient`` — the protocol (``complete(system, user) -> str``).
- ``DeterministicStubLLM`` — hash-of-input → templated markdown; the
  tested path. Every pipeline run is reproducible.

A real client is a drop-in (same protocol) and would be constructed
INSIDE the mapInPandas closure (one client per executor task, bounded
batch concurrency) — never serialized from the driver.
"""

from __future__ import annotations

import hashlib
from typing import Protocol


class LLMClient(Protocol):
    def complete(self, system_prompt: str, user_prompt: str) -> str: ...


class DeterministicStubLLM:
    """Deterministic, dependency-free stand-in for a chat model.

    Output = fenced markdown summary derived from a stable hash of the
    prompts, so tests can assert exact values and reruns are identical.
    The fenced wrapper deliberately exercises the downstream
    ``strip_code_fence`` step, like real model output does in the
    reference pipeline (``prepare_data.py:203-205``).
    """

    def __init__(self, seed: int = 42):
        self.seed = seed

    def complete(self, system_prompt: str, user_prompt: str) -> str:
        digest = hashlib.sha256(
            f"{self.seed}|{system_prompt}|{user_prompt}".encode("utf-8", "surrogatepass")
        ).hexdigest()
        headline = user_prompt.strip().splitlines()[0][:60] if user_prompt.strip() else ""
        return (
            "```markdown\n"
            f"# Summary {digest[:12]}\n\n"
            f"Derived from: {headline}\n"
            f"Checksum: {digest}\n"
            "```"
        )
