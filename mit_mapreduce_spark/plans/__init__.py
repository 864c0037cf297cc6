"""Physical-plan introspection and partitioning control.

The reference exposes exactly one plan-shaping knob — nReduce, the
reduce partition count (`main/mrmaster.go:23`, hash-routed at
`mr/worker.go:132`) — and no optimizer (SURVEY.md §4.1). On Spark the
optimizer is Catalyst; this module provides (a) the explicit
partition-control surface that mirrors F3, and (b) plan inspection
used by the perf-posture tests (tests/test_plans.py) and by humans
iterating on operators ("is the filter pushed? how many shuffles?").
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame


# --- F3: explicit partition control ---------------------------------------

def with_partitions(df: DataFrame, n: int, *keys: str | Column) -> DataFrame:
    """Hash-partition ``df`` into ``n`` partitions by ``keys`` — the
    DataFrame-side equivalent of the reference's nReduce routing
    (`mr/worker.go:38-42,132`). With no keys, round-robin."""
    return df.repartition(n, *keys) if keys else df.repartition(n)


def range_partitioned(df: DataFrame, n: int, *keys: str | Column) -> DataFrame:
    """Range-partition by sort keys: globally ordered output files,
    the shape wanted before a sorted sink or merge consumer."""
    return df.repartitionByRange(n, *keys)


def coalesced(df: DataFrame, n: int) -> DataFrame:
    """Reduce partition count without a shuffle (output-file control)."""
    return df.coalesce(n)


# --- plan inspection ------------------------------------------------------

def formatted_plan(df: DataFrame) -> str:
    """Untruncated formatted physical plan (explain('formatted') as a
    string — includes full PushedFilters and ReadSchema)."""
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def shuffle_count(df: DataFrame) -> int:
    """Number of exchanges in the physical plan. The first number to
    check on any new operator: each exchange is a full rewrite of the
    stream at 100 TB."""
    return len(re.findall(r"\(\d+\) Exchange", formatted_plan(df)))


def pushed_filters(df: DataFrame) -> list[str]:
    """The parquet-scan PushedFilters entries, flattened."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[list[str]]:
    """Per-scan ReadSchema column lists — verifies column pruning."""
    cols = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        fields = [f.split(":")[0] for f in m.group(1).split(",") if f]
        cols.append(fields)
    return cols


def broadcast_subtrees(df: DataFrame) -> list[str]:
    """The text of each BroadcastExchange subtree — tree lines plus the
    per-node details — so tests can assert WHAT gets broadcast (e.g.
    "the build side is the filtered 8-row query set"), not merely that
    a broadcast exists. Parsing: the formatted plan's first block is
    the indented tree with ``NodeName (id)`` labels; a node's subtree
    is every following line with deeper indentation. Details for the
    ids found in the subtree are appended from the second block."""
    plan = formatted_plan(df)
    blocks = plan.split("\n\n")
    tree = blocks[0].splitlines()
    details = "\n\n".join(blocks[1:])
    id_detail: dict[str, str] = {}
    for m in re.finditer(r"^\((\d+)\) ([^\n]+)\n((?:(?!^\(\d+\)).*\n?)*)",
                         details, re.M):
        id_detail[m.group(1)] = f"({m.group(1)}) {m.group(2)}\n{m.group(3)}"

    def indent(line: str) -> int:
        m = re.search(r"[A-Za-z=]", line)
        return m.start() if m else 0

    out: list[str] = []
    for i, line in enumerate(tree):
        if "BroadcastExchange" not in line:
            continue
        d = indent(line)
        sub = [line]
        for nxt in tree[i + 1:]:
            if indent(nxt) <= d:
                break
            sub.append(nxt)
        ids = [m.group(1) for l in sub for m in re.finditer(r"\((\d+)\)", l)]
        body = "\n".join(sub)
        detail = "\n".join(id_detail[i_] for i_ in ids if i_ in id_detail)
        out.append(body + "\n---\n" + detail)
    return out


def plan_report(df: DataFrame) -> dict:
    """One-call perf posture summary for a DataFrame plan."""
    plan = formatted_plan(df)
    return {
        "shuffles": plan.count("Exchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "cartesian_products": plan.count("CartesianProduct"),
        "whole_stage_codegen": plan.count("WholeStageCodegen"),
        "pushed_filters": pushed_filters(df),
        "scan_columns": scan_columns(df),
    }
