"""Skew-resistant join strategies.

AQE's skew-join split handles most runtime skew; ``salted_join`` is the
explicit, planner-independent lever for the pathological case — one join
key owning a double-digit percentage of a 100 TB fact table, where a
single post-shuffle partition would otherwise run for hours regardless of
how AQE splits its reduce side.

Semantics are EXACTLY an inner equi-join (the correctness oracle for the
salted plan is the plain join); only the physical key distribution
changes: fact rows spread across ``n_salt`` sub-keys derived from a
deterministic per-row discriminator, and the (small) dimension side is
replicated once per salt.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str | Sequence[str],
    salt_from: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted across ``n_salt`` sub-keys.

    ``salt_from`` names a fact column whose values vary WITHIN a join key
    (a row id, an event id — anything unique-ish); the salt is
    ``pmod(xxhash64(salt_from), n_salt)``, deterministic so replays and
    oracles agree. The dimension side is exploded once per salt value —
    its shuffle volume grows ``n_salt``x, which is the entire price, so
    use it for genuinely small dimension tables (or broadcast instead
    when the dim fits — salting only matters when it does not).

    Returns the joined frame without the internal salt column.
    """
    if n_salt < 1:
        raise ValueError("n_salt must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    f = facts.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salt)))
    d = dims.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("bigint"))
    return f.join(d, [*keys, "_salt"], how).drop("_salt")
