"""Cross-engine bit-exact numeric aggregation.

Floating-point sums depend on summation order, so a Spark double sum
and a DuckDB double sum differ in the low bits — and ``round()`` on
doubles is itself engine-divergent on half-boundary cases (Spark
rounds the shortest decimal repr via BigDecimal, DuckDB the binary
value). The engine therefore aggregates measure columns through exact
DECIMAL arithmetic:

    per-row double expr (bit-identical everywhere)
      -> cast decimal(30,10)   (exact, deterministic)
      -> SUM                   (exact decimal addition, order-free)
      -> round to 4 dp         (exact decimal rounding, same rule both engines)
      -> cast double           (scaled int < 2^53 -> correctly-rounded cast)

The final round matters: casting a scale-10 decimal to double is NOT
correctly rounded in every engine (the scaled int128 exceeds 2^53);
at scale 4 the scaled value is exact in a double, so the cast is a
single IEEE division — identical bits everywhere. Valid while
|sum| < 2^53 / 1e4 ≈ 9e11, far above any measure in this schema.

Besides oracle parity this buys run-to-run reproducibility at scale:
partial-aggregation order is never stable across 1000 executors, but
decimal addition is associative-exact, so results don't drift.

``*_sql`` helpers mirror the same computation in DuckDB for oracles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(30,10)"
RSCALE = 4


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str) -> Column:
    """Order-insensitive exact sum of a double column, as double."""
    return F.round(F.sum(_c(col).cast(DEC)), RSCALE).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum average: identical double bits in every engine."""
    c = _c(col)
    return F.round(F.sum(c.cast(DEC)), RSCALE).cast("double") / F.count(c)


def dsum_over(col: Column | str, window) -> Column:
    return F.round(F.sum(_c(col).cast(DEC)).over(window), RSCALE).cast("double")


def dsum_sql(expr: str) -> str:
    """DuckDB oracle text for ``dsum``."""
    return f"round(sum(({expr})::DECIMAL(30,10)), {RSCALE})::DOUBLE"


def davg_sql(expr: str) -> str:
    return f"round(sum(({expr})::DECIMAL(30,10)), {RSCALE})::DOUBLE / count({expr})"


def dsum_over_sql(expr: str, over: str) -> str:
    """DuckDB oracle text for ``dsum_over``; ``over`` is the OVER (...) body."""
    return f"round(sum(({expr})::DECIMAL(30,10)) OVER ({over}), {RSCALE})::DOUBLE"
