"""Skew-safe aggregation utilities.

Samza shards hot keys only by repartitioning the intermediate topic
(IntermediateStreamManager partition calc); Spark's AQE skew-join splits
oversized JOIN partitions at runtime, but a skewed GROUP BY key still lands
its entire group on one reducer for non-algebraic shapes. These helpers
encode the standard two-phase fix:

* ``salted_agg`` — phase 1 aggregates on (keys + random salt) so a hot key
  spreads over ``salt`` reducers; phase 2 merges the partials. Works for
  algebraic aggregates (count/sum/min/max/avg) where merge(partials) =
  total.
* ``skew_safe_count_distinct`` — dedup on (keys, value) first (the shuffle
  spreads by value too), then count per key; the hot key's distinct set
  never assembles on one task.

For plain built-in aggs Spark already does map-side partial aggregation —
use these only when a single key's *post-combine* partial stream is still
too hot (e.g. billions of rows under one key at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_PHASE1 = {
    "count": lambda c: F.count(F.lit(1)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
_PHASE2 = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list,
    aggs: dict,
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> ("op", input_col) with op in
    count|sum|min|max|avg. Example::

        salted_agg(ev, ["user_id"], {"n": ("count", None),
                                     "total": ("sum", "value")})
    """
    exploded = {}
    for name, (op, col) in aggs.items():
        if op == "avg":  # avg = merged sum / merged count
            exploded[f"__{name}_sum"] = ("sum", col)
            exploded[f"__{name}_cnt"] = ("count", None)
        elif op in _PHASE1:
            exploded[name] = (op, col)
        else:
            raise ValueError(f"unsupported salted agg op: {op}")

    salted = df.withColumn("__salt", (F.rand(seed=17) * salt).cast("int"))
    p1 = salted.groupBy(*keys, "__salt").agg(
        *[_PHASE1[op](col).alias(name) for name, (op, col) in exploded.items()]
    )
    p2 = p1.groupBy(*keys).agg(
        *[_PHASE2[op](name).alias(name) for name, (op, col) in exploded.items()]
    )
    out_cols = list(keys)
    for name, (op, _col) in aggs.items():
        if op == "avg":
            out_cols.append(
                (F.col(f"__{name}_sum") / F.col(f"__{name}_cnt")).alias(name)
            )
        else:
            out_cols.append(F.col(name))
    return p2.select(*out_cols)


def skew_safe_count_distinct(
    df: DataFrame, keys: list, value_col: str, out_name: str = "n_distinct"
) -> DataFrame:
    """COUNT(DISTINCT value) per key without assembling any key's distinct
    set on one task: shuffle 1 dedups on (keys, value) — spread by value —
    then shuffle 2 counts tiny per-key partials."""
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_name))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: salt the BIG side's join key into ``n_salts``
    sub-keys and replicate the SMALL side once per salt, so a key that
    owns billions of rows spreads over ``n_salts`` reducers instead of
    serializing into one straggler task. The explicit form of what AQE's
    skew-join does for sort-merge partitions — needed when the small
    side is too large to broadcast but the big side's key histogram has
    a hot head (``key_skew_report`` is the diagnostic that says so).

    The salt is a deterministic hash of the big row's full content (no
    ``rand()`` — task retries must route identically), and it only
    affects ROUTING: the (key, salt) equi-join produces exactly the
    plain join's rows, which is the property the oracle checks.
    Replication cost: small side scanned once, exploded n_salts-fold
    into the shuffle — the price of unserializing the hot key.
    """
    salt = (
        F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % n_salts
    ).cast("int")
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {int(n_salts) - 1})"))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, on=[on, "__salt"], how=how).drop("__salt")
