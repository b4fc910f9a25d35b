"""F8 fence strip + F1-F3 path functions vs reference algorithms
(``zc_agent/prepare_data.py:71-106,147-160``)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_rag_spark.functions.paths import (
    ALL_EXTENSIONS,
    extension_of,
    normalize_path,
    should_skip,
)
from data_engineering_rag_spark.functions.text import strip_code_fence_col, strip_code_fence_py


def reference_strip_code_fence(text: str) -> str:
    # prepare_data.py:147-160, reimplemented as test oracle.
    text = text.strip()
    if not text.startswith("```"):
        return text
    lines = text.splitlines()
    lines = lines[1:]
    if lines and lines[-1].strip() == "```":
        lines = lines[:-1]
    return "\n".join(lines)


def reference_get_extension(filepath: str) -> str:
    filename = filepath.lower().split("/")[-1]
    return filename.split(".")[-1] if "." in filename else ""


def reference_should_skip(filepath: str) -> bool:
    lowered = filepath.lower()
    if lowered.endswith("/"):
        return True
    if lowered.split("/")[-1].startswith("."):
        return True
    return reference_get_extension(filepath) not in ALL_EXTENSIONS


def reference_normalize(filepath: str) -> str:
    parts = filepath.split("/", maxsplit=1)
    return parts[1] if len(parts) > 1 else parts[0]


FENCE_CASES = [
    "```python\nprint('hi')\n```",
    "```\nplain\n```",
    "no fence",
    "  \n```sql\nSELECT 1\n```  \n",
    "```python\nno closing",
    "```",
    "```\n```",
    "``` \nbody\n ``` ",
    "a\n```\nb",
    "",
    "   ",
    "```x\n\n\n```",
    "```tag with words\nline1\nline2\n```",
]


def test_fence_strip_goldens(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(FENCE_CASES)], ["i", "t"])
    got = {
        r.i: r.s
        for r in df.select("i", strip_code_fence_col(F.col("t")).alias("s")).collect()
    }
    for i, t in enumerate(FENCE_CASES):
        assert got[i] == reference_strip_code_fence(t), repr(t)
        assert strip_code_fence_py(t) == reference_strip_code_fence(t), repr(t)


@settings(max_examples=80, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("`abc \n\t")),
        max_size=40,
    )
)
def test_fence_strip_property_py(text):
    # Python twin is cheap to property-test exhaustively; the Column
    # version is pinned by the goldens + oracle query.
    assert strip_code_fence_py(text) == reference_strip_code_fence(text)


PATH_CASES = [
    "repo-main/README.md",
    "repo-main/docs/setup.MD",
    "repo-main/a/b/.hidden",
    "repo-main/dir/",
    "repo-main/Makefile",
    "repo-main/archive.tar.gz",
    "standalone.md",
    "UPPER/Case.PY",
    "repo-main/noext.",
    "repo-main/.git/config",
]


def test_path_functions_goldens(spark):
    df = spark.createDataFrame([(p,) for p in PATH_CASES], ["p"])
    rows = df.select(
        "p",
        extension_of(F.col("p")).alias("ext"),
        should_skip(F.col("p")).alias("skip"),
        normalize_path(F.col("p")).alias("norm"),
    ).collect()
    for r in rows:
        assert r.ext == reference_get_extension(r.p), r.p
        assert r.skip == reference_should_skip(r.p), r.p
        assert r.norm == reference_normalize(r.p), r.p
