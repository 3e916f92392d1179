"""Bloom-filter join pruning: the runtime-filter pattern as a library op.

The scale problem this solves: a fact⋈dim join where the dim's matching
key-set is too big to broadcast as a hash relation (tens of millions of
keys × row payload), but the JOIN only needs membership — so a few
megabits of Bloom bitmap can prune the fact's *shuffle input* to nearly
its final size. Spark's own optimizer does this automatically in narrow
cases (``spark.sql.optimizer.runtime.bloomFilter.enabled``, injected
only when a selective filter sits on the build side); this operator is
the same physics as an explicit, composable DataFrame step that works
on any build-side frame, survives checkpoints, and can be persisted and
reused across queries.

Everything stays JVM-side and declarative:

- **Build** is one aggregation job: k = ``num_hashes`` positions per key
  (seeded ``xxhash64`` — the same family the engine's dedup/split ops
  use), exploded, OR-folded per 64-bit word, then densified into ONE row
  holding the bitmap as ``array<bigint>``. Shuffle volume is ≤ one
  (word_idx, bits) pair per *set* bit-word, never per input row
  (map-side ``bit_or`` partials collapse duplicates first).
- **Probe** broadcasts that single row (the bitmap — m/8 bytes — is the
  only payload) and filters with pure codegen bit tests:
  ``(element_at(bitmap, pos/64 + 1) >> (pos % 64)) & 1`` AND-ed over the
  k hashes. No UDF, no driver collect, no Python in the row path.

Key canonicalization: both sides hash ``cast(key AS STRING)``.
``xxhash64`` is TYPE-sensitive — xxhash64(5::int) ≠ xxhash64(5::bigint)
— so hashing the raw columns silently drops EVERY true match when the
build and probe key types differ (int dim key vs bigint fact key, a
completely ordinary schema drift; empirically 0/100 matches survived).
The string form is identical for any integer/string widths, matching
the equi-join equality the filter stands in for (property-tested with
mismatched key types).

Guarantees: no false negatives ever (a true match always survives the
prune — property-tested), false positives at the textbook
``(1 - e^(-kn/m))^k`` rate, which only costs shuffle bytes: callers must
still run the real join after the prune, and the end-to-end result is
bit-identical to the unpruned plan (oracle-certified by
``q_bloom_prune_join``).

Sizing: with the default k=5, m/n ≈ 10 bits/key gives ~1% FP. At
100 TB: 100 M build keys × 10 bits = 125 MB bitmap — at that point raise
``num_bits`` only as the build key-count demands, or shard the build
side; the probe cost is independent of m.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_BITMAP = "__bloom_bitmap"
_NBITS = "__bloom_num_bits"
_NHASH = "__bloom_num_hashes"


def bloom_build(
    df: DataFrame,
    key_col: str,
    *,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """One-row DataFrame holding a Bloom filter of ``df[key_col]``.

    ``num_bits`` must be a multiple of 64 (whole bitmap words). Null keys
    are ignored (SQL join semantics: null never equals anything, so
    membership is meaningless for it).
    """
    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")
    n_words = num_bits // 64

    canon = F.col(key_col).cast("string")  # type-insensitive hash input
    positions = F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), canon), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )
    # one (word, bits) pair per set word; bit_or partials merge map-side
    words = (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(positions).alias("pos"))
        .select(
            F.expr("cast(pos div 64 as int)").alias("word"),
            # SQL-level shiftleft takes a column shift amount (the pyspark
            # wrapper's int-only signature is the wrapper's restriction)
            F.expr("shiftleft(1L, cast(pmod(pos, 64) as int))").alias("bits"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bits)").alias("bits"))
    )
    # densify sparse (word → bits) into the full fixed-length array; the
    # aggregate is ≤ n_words rows, so the single-row collapse is bounded
    # by the bitmap size — never by the input row count
    dense = words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "bits"))).alias("m")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at(F.col("m"), i), F.lit(0).cast("bigint")),
        ).alias(_BITMAP),
        F.lit(num_bits).alias(_NBITS),
        F.lit(num_hashes).alias(_NHASH),
    )
    return dense


def bloom_might_contain(key_col: str, *, num_bits: int, num_hashes: int):
    """Boolean Column: Bloom membership test against the joined bitmap row.

    Expects ``_BITMAP`` in scope (i.e. after the broadcast join that
    :func:`bloom_prune` performs). Built as one SQL expression — the
    SQL-level ``shiftright`` accepts a *column* shift amount (the pyspark
    wrapper's int-only signature is the wrapper's restriction, not the
    engine's) — so the whole test is codegen'd: element_at + variable
    shiftright + bit-and per hash, AND-folded.
    """
    conds = []
    for i in range(num_hashes):
        pos_sql = f"pmod(xxhash64({i}, cast(`{key_col}` as string)), {num_bits}L)"
        word_sql = f"element_at({_BITMAP}, cast({pos_sql} div 64 as int) + 1)"
        bit_sql = f"cast(pmod({pos_sql}, 64) as int)"
        conds.append(f"((shiftright({word_sql}, {bit_sql}) & 1L) = 1L)")
    return F.expr(" AND ".join(conds))


def bloom_prune(df: DataFrame, key_col: str, bloom: DataFrame) -> DataFrame:
    """Rows of ``df`` whose ``key_col`` might be in the Bloom filter.

    Broadcasts the one-row bitmap, applies the k bit tests, drops the
    bitmap columns — a pure row filter with no shuffle of ``df``. Null
    keys are dropped (they cannot match any equi-join anyway). Callers
    still run the real join afterwards; this only shrinks its input.
    """
    # collect the ONE row once: .first() + a later broadcast of the
    # unpersisted frame would execute the whole build aggregation twice
    # (scan + explode + bit_or shuffle), doubling the advertised
    # one-aggregation cost. The driver holds only the bitmap (m/8 bytes).
    row = bloom.first()
    num_bits, num_hashes = int(row[_NBITS]), int(row[_NHASH])
    one = df.sparkSession.createDataFrame(
        [(list(row[_BITMAP]),)], f"{_BITMAP} array<bigint>"
    )
    joined = df.join(F.broadcast(one))
    kept = joined.filter(
        F.col(key_col).isNotNull()
        & bloom_might_contain(key_col, num_bits=num_bits, num_hashes=num_hashes)
    )
    return kept.drop(_BITMAP)
