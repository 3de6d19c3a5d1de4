"""Skew-mitigation join (SCALING.md): explicit key salting.

AQE's skew-join handles most cases at runtime
(spark.sql.adaptive.skewJoin.enabled is on in session.py); explicit
salting is the deterministic fallback when one key dominates — e.g. a
mega-tile's annotations or a header-row hot key. The big side gets a
random-but-deterministic salt in [0, n); the small side is exploded n
ways; the join key becomes (key, salt), spreading one hot key over n
reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big`` with ``small`` on ``key`` with the hot-key
    spread over ``n_salts`` partitions. Semantically identical to
    ``big.join(small, key, how)`` for inner/left joins.

    The salt is a deterministic hash of the full row position-free
    content (monotonically_increasing_id would break retry
    determinism), so retries and speculative tasks agree.
    """
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % n_salts).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = big_s.join(small_s, [key, "_salt"], how)
    return out.drop("_salt")
