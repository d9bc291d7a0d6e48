"""Skew-resilient join via key salting.

AQE's skew-join splitting (on by default in session.py) handles most
skew at runtime; explicit salting is the deterministic fallback when
one key dominates so heavily that even split partitions bottleneck —
the classic 100 TB hot-key pattern.

``salted_join`` replicates the *build* side ``salt`` times and
scatters the probe side uniformly, so a single hot key spreads over
``salt`` reducers. Semantics are identical to the plain inner join
(verified by tests/test_operators.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join of a skewed ``probe`` against a smaller
    ``build`` with ``salt``-way key scattering."""
    on = list(on)
    probe_s = probe.withColumn(
        "__salt", (F.xxhash64(F.monotonically_increasing_id()) % salt + salt) % salt
    )
    build_s = build.crossJoin(
        F.broadcast(
            probe.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = probe_s.join(build_s, on + ["__salt"], how)
    return out.drop("__salt")
