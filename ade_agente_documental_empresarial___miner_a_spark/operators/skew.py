"""Skew-aware join utilities.

At 100 TB a handful of hot keys (one viral document's section, one power
user) can pin a whole shuffle partition. AQE's skew-join splitting
(enabled in ``session.py``) handles sort-merge cases at runtime; this
module adds **explicit salting** for the cases AQE can't rewrite —
aggregations over a hot key and broadcast-ineligible skewed joins.

``salted_join`` replicates the small side R times and scatters the big
side's hot keys across R salt buckets: the shuffle key becomes
(key, salt), splitting a hot key's rows over R reducers.

``two_phase_agg`` does salt → partial agg → final agg, the standard
hot-key aggregation rewrite (map-side combine already handles most of
this; the explicit form matters for high-cardinality ``collect_list``-
style aggs where combiners don't shrink data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(salt_buckets: int) -> Column:
    """Deterministic row-unique salt in [0, salt_buckets).

    Derived from ``monotonically_increasing_id()`` (partition id << 33 +
    partition-local counter), so consecutive rows of a partition round-robin
    across buckets regardless of their VALUES. Never salt from payload
    columns: a hot key whose rows share one value would collapse into a
    single bucket, defeating the rewrite.

    NONDETERMINISM CAVEAT: the id — hence the bucket assignment — varies
    with the input partitioning and across task retries. Row-level join
    results are unaffected (every salt matches the replicated small side),
    but ``two_phase_agg`` sums arrive in a run-dependent order, so its
    ``agg_col`` must be an order-insensitive type (integer/decimal — the
    catalog's ``skew_salted_agg`` pairs it with DECIMAL). For a
    float/double agg that must be bit-reproducible across runs, salt from
    a stable row key instead (e.g. ``pmod(xxhash64(<unique id col>), R)``).
    """
    return F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted over ``salt_buckets``.

    The small side is replicated ``salt_buckets`` times (explode over the
    salt range); the big side picks a deterministic salt per row. Result
    equals ``big.join(small, on, how)`` for row-level semantics.

    Only big-side-preserving join types are supported: under ``right`` or
    ``full``/``outer``, an UNMATCHED small-side row would surface once per
    replica (salt_buckets null-extended duplicates). For those, salt the
    other way around or de-duplicate the unmatched side explicitly.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)}; got {how!r} — "
            "right/full outer joins would duplicate unmatched small-side "
            "rows once per salt replica"
        )
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1))
    ).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", _row_salt(salt_buckets))
    out = big_salted.join(small_rep, [on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    agg_col: str,
    salt_buckets: int = 16,
):
    """Two-phase sum over a potentially hot key: partial per (key, salt),
    then final per key. Returns (key, total)."""
    salted = df.withColumn("_salt", _row_salt(salt_buckets))
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(agg_col).alias("_partial")
    )
    return partial.groupBy(key).agg(F.sum("_partial").alias("total"))
