"""Column-expression helpers shared by the query library and operators.

``dsum``/``davg`` exist for oracle determinism: double SUM/AVG results
depend on partial-aggregation order (nondeterministic across engines and
across runs), so any decimal rounding of them can flip at a half-up
boundary. Aggregating in exact DECIMAL and casting the final value to
DOUBLE yields a bit-identical result in Spark and DuckDB regardless of
execution order — and decimal aggregation stays inside whole-stage codegen
(no UDF), so it scales the same as double sums.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# 2-decimal money/measure values (prices, quantities, balances, event values)
MONEY = "decimal(12,2)"
# small 2-decimal rates in [0, 2) (discount, tax)
RATE = "decimal(4,2)"


def dec(col, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col, typ: str = MONEY) -> Column:
    """Exact decimal sum, emitted as double (deterministic across engines)."""
    return F.sum(dec(col, typ)).cast("double")


def davg(col, typ: str = MONEY) -> Column:
    """Exact-sum average: CAST(SUM(decimal) AS DOUBLE) / COUNT — both engines
    perform one identical IEEE division on identical operands."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, typ)).cast("double") / F.count(c)


def one_minus(col, typ: str = RATE) -> Column:
    """(1 - rate) in exact decimal."""
    return F.lit(1).cast(typ) - dec(col, typ)


def one_plus(col, typ: str = RATE) -> Column:
    """(1 + rate) in exact decimal."""
    return F.lit(1).cast(typ) + dec(col, typ)
