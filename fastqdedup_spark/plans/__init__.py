"""Physical-plan introspection helpers — the engine's answer to the
reference's trie stats (O14, /root/reference/src/fastqdedup/
_triemodule.c:929-964): instead of node histograms we audit the
Catalyst physical plan for the properties that matter at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_audit(df: DataFrame) -> dict:
    """Counts the plan features we optimize for: exchanges (shuffles),
    whole-stage-codegen spans, pushed filters, broadcast joins."""
    plan = formatted_plan(df)
    # nodes print once in the tree and once in the detail section; count
    # only the numbered detail headers
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "codegen_spans": len(set(re.findall(r"codegen id : (\d+)", plan))),
        "pushed_filters": "PushedFilters: \\[\\]" not in plan
        and "PushedFilters" in plan,
        "broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "sort_merge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
    }


def assert_pushdown(df: DataFrame, column: str) -> None:
    """Raises if the parquet scan does not push a filter on `column`."""
    plan = formatted_plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    if not m or column not in m.group(1):
        raise AssertionError(f"no pushed filter on {column}; plan:\n{plan[:2000]}")
