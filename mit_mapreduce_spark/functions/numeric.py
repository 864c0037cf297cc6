"""Deterministic numeric aggregation helpers.

Summing doubles in a distributed engine is order-dependent (partial
aggregates combine in nondeterministic order), so a double SUM can
differ between runs and between engines in the last ulps — fatal for
a value-hash correctness gate. The fix: round each row's value to a
fixed scale, sum EXACTLY in decimal, and cast the final result back
to double. Addition of decimals is associative/commutative, so the
result is bit-identical no matter how Spark (or DuckDB) parallelizes
— and this costs nothing at scale (decimal sum is still a partial
aggregation, map-side combined).

Exact half-way ties at scale 4 are reachable (dyadic doubles like
0.03125 = 1/32); Spark's HALF_UP and DuckDB's round() both round
double ties away from zero, so on 2-decimal money inputs (every use
in this repo) the engines agree. CAVEAT (cross-SF fuzz find, r5): on
ARBITRARY quotients the two round() implementations can disagree by
one unit in the last place near half-way points — Spark rounds the
exact binary expansion, DuckDB the scaled double. Do NOT feed
division results through these helpers' ROUND; snap them first with
the floor(x*scale + 0.5) idiom (identical IEEE ops on both engines —
see min_cost_supplier), then sum exactly.

The same helpers exist as SQL-text builders for the DuckDB oracle
strings, guaranteeing both sides compute the identical expression.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,4)"  # 24 integral digits: safe for 100-TB-scale sums


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c, 4).cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / exact count, divided
    as doubles (one deterministic IEEE division)."""
    c = F.col(col) if isinstance(col, str) else col
    num = F.sum(F.round(c, 4).cast(DEC)).cast("double")
    den = F.count(c).cast("double")
    return (num / den).alias(alias)


# --- SQL-text twins (ANSI, valid in both DuckDB and Spark SQL) ---

def sql_dsum(expr: str, alias: str) -> str:
    return (f"CAST(SUM(CAST(ROUND({expr}, 4) AS DECIMAL(28,4))) AS DOUBLE)"
            f" AS {alias}")


def sql_davg(expr: str, alias: str) -> str:
    return (f"(CAST(SUM(CAST(ROUND({expr}, 4) AS DECIMAL(28,4))) AS DOUBLE)"
            f" / CAST(COUNT({expr}) AS DOUBLE)) AS {alias}")
