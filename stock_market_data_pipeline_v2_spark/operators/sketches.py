"""Deterministic, cross-engine-verifiable distinct-count sketches.

The reference pipeline's sketch surface (``sector_activity_sketch``)
uses Spark's native ``approx_count_distinct`` — a HyperLogLog++ whose
register updates are engine-internal, so it can only ever be
rows-only-checked against another engine. This module implements the
sketch itself — classic HyperLogLog (Flajolet et al. 2007, the
public algorithm) — from engine-neutral primitives (md5, integer
shifts, max), so the SAME register state and the SAME estimate fall
out of Spark and DuckDB bit-for-bit, and the sketch query can join
the hash-gated oracle set instead of the rows-only set.

Determinism analysis (why the estimate hash-matches):
- hash: first 8 hex chars of ``md5(cast(key as string))`` → a 32-bit
  integer. Both engines agree on md5 of identical bytes.
- register index = top ``p`` bits; rank = leading zeros of the
  remaining ``32-p`` bits + 1, computed via the LENGTH OF THE BINARY
  STRING (``bin()`` is unpadded in both engines) — integer algebra,
  no floats.
- register state = ``max(rank)`` per (group, index): integer max is
  order-free, so the state is partitioning-independent — and the
  same ``groupBy().max()`` IS the distributed merge (map-side
  combinable; sketch state is m rows per group, never the raw keys).
- indicator sum S = Σ 2^-M over the m registers (absent registers
  contribute 2^0): every term is a dyadic rational with at most
  ``32-p+1`` fractional bits, so the float64 sum is EXACT regardless
  of addition order (needs ≤ p + 33 < 53 bits of significand) —
  the one place a naive float implementation would be
  order-sensitive, closed by construction. ``2^-M`` is built as
  ``CAST(1.0 AS DOUBLE) / shiftleft(1, M)`` (exact double division —
  a bare SQL ``1.0`` is DECIMAL and rounds at 22 digits for M ≥ 23),
  never ``pow`` (libm).
- estimate = alpha_m·m²/S: one multiply and one divide on identical
  operands — deterministic. The small-range ``m·ln(m/V)`` linear-
  counting correction is deliberately OMITTED: ``ln`` pits
  java.lang.Math.log (Spark, fdlibm lineage) against glibc log
  (DuckDB) — a cross-engine ulp gamble this repo refuses on
  principle (PERF.md lesson: pow/ln/exp never cross the oracle
  boundary). Consequence: the estimator needs n ≳ 2.5·m to be
  unbiased, so ``p`` is a PARAMETER chosen per deployment — small
  for this corpus's cardinalities, 12–14 on a real cluster — and
  the registered query reports the exact count beside the estimate
  so the bias is visible, not hidden.

100 TB design: the input scan reduces to ``groups × m`` register
rows in one map-side-combinable aggregate — the whole point of a
sketch; nothing downstream touches raw keys. Registers are
mergeable across days/partitions by the same ``max``, which is how
an incremental rollup composes (union register tables, re-max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.core import round_away


def _alpha(m: int) -> float:
    """Standard HLL bias constant 0.7213/(1 + 1.079/m), evaluated
    ONCE here and inlined as the identical float64 literal into both
    the Spark plan and the generated SQL (two engines evaluating the
    division themselves is a needless 1-ulp risk)."""
    return 0.7213 / (1.0 + 1.079 / m)


def _hash32(key: Column) -> Column:
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def hll_register_table(
    df: DataFrame, group_cols: list[str], key: str, p: int
) -> DataFrame:
    """(group, register index, max rank) — the mergeable sketch state."""
    rest_bits = 32 - p
    h = _hash32(F.col(key))
    idx = F.shiftright(h, rest_bits)
    rest = h.bitwiseAND(F.lit((1 << rest_bits) - 1))
    rank = F.when(rest == 0, F.lit(rest_bits + 1)).otherwise(
        F.lit(rest_bits + 1) - F.length(F.bin(rest))
    )
    return (
        df.select(*group_cols, idx.alias("reg_idx"), rank.alias("rank"))
        .groupBy(*group_cols, "reg_idx")
        .agg(F.max("rank").cast("long").alias("reg"))
    )


def hll_estimate_only(
    df: DataFrame, group_cols: list[str], key: str, p: int = 5
) -> DataFrame:
    """Per-group HLL estimate WITHOUT the exact-count reference —
    the production shape for scales where the exact count-distinct is
    the cost being avoided (the profiler sketch tier). Output: group
    cols, ``n_registers``, ``hll_estimate`` (4 dp). Same register and
    estimator algebra as :func:`hll_distinct` (shared helpers), so
    the same cross-engine exactness argument applies."""
    m = 1 << p
    regs = hll_register_table(df, group_cols, key, p)
    ind = F.expr("CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), reg)")
    sketch = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(ind).alias("occupied_sum"),
    )
    s = F.col("occupied_sum") + (F.lit(m) - F.col("n_registers")).cast(
        "double"
    )
    est = F.lit(_alpha(m)) * F.lit(float(m * m)) / s
    return sketch.select(
        *group_cols,
        "n_registers",
        round_away(est, 4).alias("hll_estimate"),
    )


def hll_distinct(
    df: DataFrame, group_cols: list[str], key: str, p: int = 5
) -> DataFrame:
    """Per-group HLL distinct-count estimate beside the exact count.

    Output: group cols, ``n_registers`` (occupied), ``hll_estimate``
    (raw HLL, rounded 4 dp), ``exact_distinct``, ``rel_error``
    (rounded 6 dp) — the estimate/exact pair makes the sketch's
    accuracy a first-class, oracle-checked output rather than a
    claim. The exact count is kept ONLY as the accuracy reference —
    a production rollup drops it and with it the expensive
    count-distinct; the sketch side alone never shuffles more than
    group×2^p register rows.
    """
    m = 1 << p
    regs = hll_register_table(df, group_cols, key, p)
    # Σ 2^-reg over occupied registers, exact dyadic arithmetic.
    # (SQL form: the Python shiftleft binding takes only a literal
    # bit count, the SQL function accepts a column.)
    ind = F.expr("CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), reg)")
    sketch = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.sum(ind).alias("occupied_sum"),
    )
    # absent registers contribute 2^0 = 1 each
    s = F.col("occupied_sum") + (F.lit(m) - F.col("n_registers")).cast(
        "double"
    )
    est = F.lit(_alpha(m)) * F.lit(float(m * m)) / s
    exact = df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(key)).alias("exact_distinct")
    )
    return (
        sketch.join(exact, group_cols)
        .select(
            *group_cols,
            "n_registers",
            round_away(est, 4).alias("hll_estimate"),
            "exact_distinct",
            round_away(
                (est - F.col("exact_distinct").cast("double"))
                / F.col("exact_distinct").cast("double"),
                6,
            ).alias("rel_error"),
        )
        .orderBy(*group_cols)
    )


def hll_sql_parts(
    table: str, group_cols: list[str], key: str, p: int = 5
) -> tuple[str, str]:
    """The generated HLL SQL core shared by every oracle that embeds
    the sketch: (CTE chain ``h, r, regs, sk``, estimate expression
    over ``sk``). Single source for the hash/rank/estimator literals
    — :func:`hll_oracle_sql` and the profiler sketch oracle both
    splice THIS, never a second hand-maintained copy."""
    m = 1 << p
    g = ", ".join(group_cols)
    rest_bits = 32 - p
    mask = (1 << rest_bits) - 1
    est = (
        f"CAST({_alpha(m)!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)"
        f" / (sk.occupied_sum + CAST({m} - sk.n_registers AS DOUBLE))"
    )
    chain = f"""h AS (
    SELECT {g},
        CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
    FROM {table}
),
r AS (
    SELECT {g},
        h32 >> {rest_bits} AS reg_idx,
        CASE WHEN (h32 & {mask}) = 0 THEN {rest_bits + 1}
             ELSE {rest_bits + 1} - length(bin(h32 & {mask})) END AS rank
    FROM h
),
regs AS (
    SELECT {g}, reg_idx, CAST(max(rank) AS BIGINT) AS reg
    FROM r GROUP BY {g}, reg_idx
),
sk AS (
    SELECT {g},
        CAST(count(*) AS BIGINT) AS n_registers,
        sum(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << reg)) AS occupied_sum
    FROM regs GROUP BY {g}
)"""
    return chain, est


def hll_oracle_sql(
    table: str, group_cols: list[str], key: str, p: int = 5
) -> str:
    """DuckDB twin generated from the SAME literals as the Spark plan
    (the zvalue_oracle_sql / bpe_oracle_sql pattern: one source of
    truth, never two hand-maintained copies)."""
    g = ", ".join(group_cols)
    chain, est = hll_sql_parts(table, group_cols, key, p)
    return f"""
WITH {chain},
ex AS (
    SELECT {g}, CAST(count(DISTINCT {key}) AS BIGINT) AS exact_distinct
    FROM {table} GROUP BY {g}
)
SELECT {', '.join('sk.' + c for c in group_cols)}, sk.n_registers,
    round({est}, 4) AS hll_estimate,
    ex.exact_distinct,
    round(({est} - CAST(ex.exact_distinct AS DOUBLE))
          / CAST(ex.exact_distinct AS DOUBLE), 6) AS rel_error
FROM sk JOIN ex USING ({g})
ORDER BY {g}
"""


# ---------------------------------------------------------------------------
# Bloom filter — the membership sketch, same cross-engine contract as
# the HLL above: register (bit) state and every probe are integer/md5
# algebra both engines reproduce exactly, so a query BUILT ON the
# sketch can be hash-gated rather than rows-only-checked.
#
# Hash family: md5-seeded double hashing (Kirsch–Mitzenmacher 2006),
# the exact family the MinHash tier uses (dedup.py:_signatures_from):
# a = first md5 word, step = 2·(second md5 word)+1 (odd), probe i at
# bit (a + i·step) mod m. Bits pack into 32-bit words (BIGINT-held)
# so neither engine ever left-shifts past bit 31 — DuckDB's BIGINT
# << 63 is an overflow error, Spark's wraps; both stay far away.
#
# 100 TB design: the built filter is FIXED SIZE — ceil(m/32) word
# rows regardless of how many keys went in (the reason to prefer it
# over a broadcast distinct-key set once the reference side outgrows
# executor memory) — and the build is one map-side-combinable
# ``bit_or`` aggregate, mergeable across partitions/days by the same
# ``bit_or`` (union = OR, the Bloom composition law).
# ---------------------------------------------------------------------------


def _bloom_pos(key: Column, i: int, m_bits: int) -> Column:
    """Bit position of probe ``i`` for ``key`` (string column)."""
    h = F.md5(key)
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    step = F.conv(F.substring(h, 9, 8), 16, 10).cast("long") * 2 + 1
    return F.pmod(a + i * step, F.lit(m_bits))


def bloom_build_words(
    keys: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """OR-fold the keys' probe bits into (word_idx, bits) rows —
    the filter's full state, ``ceil(m_bits/32)`` rows max."""
    pos = F.explode(
        F.array(*[_bloom_pos(F.col(key_col), i, m_bits) for i in range(k)])
    )
    return (
        keys.select(pos.alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 5).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))"
            ).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_membership(
    candidates: DataFrame,
    key_col: str,
    words: DataFrame,
    m_bits: int,
    k: int,
) -> DataFrame:
    """Append ``in_bloom`` to ``candidates``: true iff ALL ``k`` probe
    bits are set. The filter side is fixed-size → broadcast; probes
    LEFT-join it (an absent word row means no bit in that word was
    ever set)."""
    probe = F.explode(
        F.array(*[_bloom_pos(F.col(key_col), i, m_bits) for i in range(k)])
    )
    probed = candidates.select("*", probe.alias("__pos")).select(
        "*",
        F.shiftright(F.col("__pos"), 5).alias("word_idx"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))"
        ).alias("__mask"),
    )
    hit = (
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__mask")) != 0
    ).cast("int")
    group_cols = [c for c in candidates.columns]
    return (
        probed.join(F.broadcast(words), "word_idx", "left")
        .select(*group_cols, hit.alias("__set"))
        .groupBy(*group_cols)
        .agg((F.sum("__set") == F.lit(k)).alias("in_bloom"))
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch — the third classic sketch beside HLL
# (distinct counts) and Bloom (membership): approximate quantiles
# whose state is bin-grain, with the same cross-engine contract. The
# native tier (approx_percentile in sector_activity_sketch) is
# rows-only by necessity; this one's estimate is bit-reproducible, so
# the approximate answer itself joins the hash-gated oracle set with
# the exact percentile_disc beside it as the accuracy reference.
#
# Determinism analysis: bin width = (max−min)/nbins and bin index =
# floor((v−min)/width) are the SAME IEEE-754 double operations in
# both engines (one subtract, one divide, one floor — no libm); bin
# counts and the cumulative crossing ceil(q·n) are integer algebra;
# the reported edge min + (bin+1)·width is one fused chain both
# engines evaluate identically. Error bound: the upper-edge estimator
# sits within one bin width above the exact quantile — (max−min)/
# nbins, an a-priori bound the err_* columns make visible per group.
#
# 100 TB design: two scans (min/max/count, then bin counts), both
# map-side-combinable; sketch state is ≤ groups×nbins rows and is
# mergeable across partitions/days by summing bin counts (fixed bins
# — unlike t-digest/GK, the merge is a plain aggregate). The exact
# percentile_disc branch is the ground-truth reference a production
# rollup drops.
# ---------------------------------------------------------------------------


def histogram_quantile_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    nbins: int = 64,
    qs: tuple[tuple[str, float], ...] = (
        ("p50", 0.5),
        ("p90", 0.9),
        ("p99", 0.99),
    ),
) -> DataFrame:
    """Per-group approximate quantiles from a fixed-bin histogram,
    beside the exact ``percentile_disc`` values and the signed error.
    Output: group cols, n_values, bin_width, then per q:
    ``approx_{q}``, ``exact_{q}``, ``err_{q}``."""
    from pyspark.sql import Window

    g = list(group_cols)
    v = F.col(value_col)
    stats = df.groupBy(*g).agg(
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
        F.count(v).cast("long").alias("n_values"),
    )
    sdf = stats.withColumn(
        "__w", (F.col("__mx") - F.col("__mn")) / F.lit(float(nbins))
    )
    binned = df.join(F.broadcast(sdf), g).select(
        *g,
        F.when(F.col("__w") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.least(
                F.floor((v - F.col("__mn")) / F.col("__w")),
                F.lit(nbins - 1).cast("long"),
            )
        )
        .alias("__bin"),
    )
    bc = binned.groupBy(*g, "__bin").agg(
        F.count(F.lit(1)).cast("long").alias("__bn")
    )
    wcum = (
        Window.partitionBy(*g)
        .orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = bc.withColumn("__cum", F.sum("__bn").over(wcum)).join(
        F.broadcast(sdf), g
    )
    edge = F.col("__mn") + (F.col("__bin") + 1).cast("double") * F.col("__w")
    sk = cum.groupBy(*g).agg(
        F.max("n_values").alias("n_values"),
        F.max("__w").alias("__width"),
        *[
            F.min(
                F.when(
                    F.col("__cum")
                    >= F.ceil(F.lit(q) * F.col("n_values")),
                    edge,
                )
            ).alias(f"__ap_{name}")
            for name, q in qs
        ],
    )
    exact = df.groupBy(*g).agg(
        *[
            F.expr(
                f"percentile_disc({q}) WITHIN GROUP (ORDER BY {value_col})"
            ).alias(f"__ex_{name}")
            for name, q in qs
        ]
    )
    out_cols = [*g, "n_values", round_away(F.col("__width"), 6).alias("bin_width")]
    for name, _q in qs:
        out_cols.append(round_away(F.col(f"__ap_{name}"), 6).alias(f"approx_{name}"))
        out_cols.append(F.col(f"__ex_{name}").alias(f"exact_{name}"))
        out_cols.append(
            round_away(
                F.col(f"__ap_{name}") - F.col(f"__ex_{name}"), 6
            ).alias(f"err_{name}")
        )
    return sk.join(exact, g).select(*out_cols).orderBy(*g)


def histogram_quantile_oracle_sql(
    table: str,
    group_cols: list[str],
    value_col: str,
    nbins: int = 64,
    qs: tuple[tuple[str, float], ...] = (
        ("p50", 0.5),
        ("p90", 0.9),
        ("p99", 0.99),
    ),
) -> str:
    """DuckDB twin of :func:`histogram_quantile_sketch`, generated
    from the same literals (single-source pattern)."""
    g = ", ".join(group_cols)
    v = value_col
    ap_exprs = ",\n        ".join(
        f"min(CASE WHEN c.cum >= ceil({q!r} * s.n_values)"
        f" THEN s.mn + (c.bin + 1) * s.w END) AS ap_{name}"
        for name, q in qs
    )
    ex_exprs = ", ".join(
        f"quantile_disc({v}, {q!r}) AS ex_{name}" for name, q in qs
    )
    out_exprs = ", ".join(
        f"round(sk.ap_{name}, 6) AS approx_{name}, ex.ex_{name} AS exact_{name}, "
        f"round(sk.ap_{name} - ex.ex_{name}, 6) AS err_{name}"
        for name, _q in qs
    )
    sg = ", ".join("sk." + c for c in group_cols)
    return f"""
WITH stats AS (
    SELECT {g}, min({v}) AS mn, max({v}) AS mx,
        CAST(count({v}) AS BIGINT) AS n_values,
        (max({v}) - min({v})) / CAST({nbins} AS DOUBLE) AS w
    FROM {table} GROUP BY {g}
),
binned AS (
    SELECT t.*, CASE WHEN s.w = 0 THEN 0
        ELSE CAST(least(floor(({v} - s.mn) / s.w), {nbins - 1}) AS BIGINT)
        END AS bin
    FROM {table} t JOIN stats s USING ({g})
),
bc AS (
    SELECT {g}, bin, CAST(count(*) AS BIGINT) AS bn
    FROM binned GROUP BY {g}, bin
),
cum AS (
    SELECT {g}, bin,
        sum(bn) OVER (PARTITION BY {g} ORDER BY bin) AS cum
    FROM bc
),
sk AS (
    SELECT c.{group_cols[0] if len(group_cols) == 1 else g},
        max(s.n_values) AS n_values,
        max(s.w) AS width,
        {ap_exprs}
    FROM cum c JOIN stats s USING ({g})
    GROUP BY c.{group_cols[0] if len(group_cols) == 1 else g}
),
ex AS (
    SELECT {g}, {ex_exprs} FROM {table} GROUP BY {g}
)
SELECT {sg}, sk.n_values, round(sk.width, 6) AS bin_width, {out_exprs}
FROM sk JOIN ex USING ({g})
ORDER BY {g}
"""


def histogram_rollup(
    df: DataFrame,
    group_cols: list[str],
    rollup_col: Column,
    value_col: str,
    nbins: int = 64,
    qs: tuple[tuple[str, float], ...] = (
        ("p50", 0.5),
        ("p90", 0.9),
        ("p99", 0.99),
    ),
) -> DataFrame:
    """The quantile twin of :func:`hll_rollup` (round 8, VERDICT r7
    #2): fixed-bin histogram states built at the FINE grain (group ×
    rollup unit, e.g. per day), then merged to the coarse grain by
    plain integer ``sum`` — the linear-sketch property — and the
    merged quantiles compared against quantiles computed directly on
    the raw data with the same bin edges. Bin counts are BIGINT sums,
    so merged state == direct state bit-for-bit and every
    ``merge_diff_*`` column is exactly 0.0 — an ORACLE-CHECKED output,
    not a docstring claim. This is what lets a 100 TB warehouse keep
    tiny per-day (group, bin) tables and answer any date-range
    quantile query without rescanning facts.

    Bin edges come from the COARSE-grain min/max (shared by fine and
    direct states — a rollup over a fixed registry of edges, the way
    a production sketch table pins its binning at table-creation
    time), so the merge identity is structural, not approximate.

    Output: group cols, n_units, n_values, then per q:
    ``merged_{q}``, ``direct_{q}``, ``merge_diff_{q}``.
    """
    from pyspark.sql import Window

    g = list(group_cols)
    v = F.col(value_col)
    df = df.withColumn("__unit", rollup_col)
    stats = df.groupBy(*g).agg(
        F.min(v).alias("__mn"),
        F.max(v).alias("__mx"),
        F.count(v).cast("long").alias("n_values"),
    )
    sdf = stats.withColumn(
        "__w", (F.col("__mx") - F.col("__mn")) / F.lit(float(nbins))
    )
    # binned feeds BOTH the fine (merged) and the direct branch —
    # uncached each branch rescans the fact and recomputes the bin
    # assignment (the shingle_jaccard `_cached_inputs` contract;
    # callers release via dedup.release_cached_inputs).
    binned = (
        df.join(F.broadcast(sdf), g)
        .select(
            *g,
            "__unit",
            F.when(F.col("__w") == 0, F.lit(0).cast("long"))
            .otherwise(
                F.least(
                    F.floor((v - F.col("__mn")) / F.col("__w")),
                    F.lit(nbins - 1).cast("long"),
                )
            )
            .alias("__bin"),
        )
        .cache()
    )
    # the per-unit sketch table a warehouse would persist
    fine = binned.groupBy(*g, "__unit", "__bin").agg(
        F.count(F.lit(1)).cast("long").alias("__bn")
    )
    # linear merge: plain SUM of fine-grain bin counts
    merged = fine.groupBy(*g, "__bin").agg(
        F.sum("__bn").cast("long").alias("__bn")
    )
    # direct state from raw rows (what the merge must reproduce)
    direct = binned.groupBy(*g, "__bin").agg(
        F.count(F.lit(1)).cast("long").alias("__bn")
    )
    units = (
        fine.select(*g, "__unit")
        .distinct()
        .groupBy(*g)
        .agg(F.count(F.lit(1)).cast("long").alias("n_units"))
    )

    def quantiles(bc: DataFrame, prefix: str) -> DataFrame:
        wcum = (
            Window.partitionBy(*g)
            .orderBy("__bin")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        cum = bc.withColumn("__cum", F.sum("__bn").over(wcum)).join(
            F.broadcast(sdf), g
        )
        edge = (
            F.col("__mn")
            + (F.col("__bin") + 1).cast("double") * F.col("__w")
        )
        return cum.groupBy(*g).agg(
            *[
                F.min(
                    F.when(
                        F.col("__cum")
                        >= F.ceil(F.lit(q) * F.col("n_values")),
                        edge,
                    )
                ).alias(f"__{prefix}_{name}")
                for name, q in qs
            ],
        )

    mq = quantiles(merged, "m")
    dq = quantiles(direct, "d")
    out_cols = [
        *g,
        "n_units",
        F.col("n_values"),
    ]
    for name, _q in qs:
        out_cols.append(
            round_away(F.col(f"__m_{name}"), 6).alias(f"merged_{name}")
        )
        out_cols.append(
            round_away(F.col(f"__d_{name}"), 6).alias(f"direct_{name}")
        )
        out_cols.append(
            round_away(
                F.col(f"__m_{name}") - F.col(f"__d_{name}"), 6
            ).alias(f"merge_diff_{name}")
        )
    out = (
        mq.join(dq, g)
        .join(units, g)
        .join(F.broadcast(sdf.select(*g, "n_values")), g)
        .select(*out_cols)
        .orderBy(*g)
    )
    out._cached_inputs = (binned,)
    return out


def histogram_rollup_oracle_sql(
    table: str,
    group_cols: list[str],
    rollup_expr: str,
    value_col: str,
    nbins: int = 64,
    qs: tuple[tuple[str, float], ...] = (
        ("p50", 0.5),
        ("p90", 0.9),
        ("p99", 0.99),
    ),
) -> str:
    """DuckDB twin of :func:`histogram_rollup`, generated from the
    same literals (single-source pattern)."""
    g = ", ".join(group_cols)
    v = value_col
    m_exprs = ",\n        ".join(
        f"min(CASE WHEN c.cum >= ceil({q!r} * s.n_values)"
        f" THEN s.mn + (c.bin + 1) * s.w END) AS m_{name}"
        for name, q in qs
    )
    d_exprs = ",\n        ".join(
        f"min(CASE WHEN c.cum >= ceil({q!r} * s.n_values)"
        f" THEN s.mn + (c.bin + 1) * s.w END) AS d_{name}"
        for name, q in qs
    )
    out_exprs = ", ".join(
        f"round(mq.m_{name}, 6) AS merged_{name}, "
        f"round(dq.d_{name}, 6) AS direct_{name}, "
        f"round(mq.m_{name} - dq.d_{name}, 6) AS merge_diff_{name}"
        for name, _q in qs
    )
    mg = ", ".join("mq." + c for c in group_cols)
    return f"""
WITH stats AS (
    SELECT {g}, min({v}) AS mn, max({v}) AS mx,
        CAST(count({v}) AS BIGINT) AS n_values,
        (max({v}) - min({v})) / CAST({nbins} AS DOUBLE) AS w
    FROM {table} GROUP BY {g}
),
binned AS (
    SELECT {g}, {rollup_expr} AS unit, CASE WHEN s.w = 0 THEN 0
        ELSE CAST(least(floor(({v} - s.mn) / s.w), {nbins - 1}) AS BIGINT)
        END AS bin
    FROM {table} t JOIN stats s USING ({g})
),
fine AS (
    SELECT {g}, unit, bin, CAST(count(*) AS BIGINT) AS bn
    FROM binned GROUP BY {g}, unit, bin
),
mrg AS (
    SELECT {g}, bin, CAST(sum(bn) AS BIGINT) AS bn
    FROM fine GROUP BY {g}, bin
),
drc AS (
    SELECT {g}, bin, CAST(count(*) AS BIGINT) AS bn
    FROM binned GROUP BY {g}, bin
),
mcum AS (
    SELECT {g}, bin,
        sum(bn) OVER (PARTITION BY {g} ORDER BY bin) AS cum
    FROM mrg
),
dcum AS (
    SELECT {g}, bin,
        sum(bn) OVER (PARTITION BY {g} ORDER BY bin) AS cum
    FROM drc
),
mq AS (
    SELECT c.{group_cols[0] if len(group_cols) == 1 else g},
        {m_exprs}
    FROM mcum c JOIN stats s USING ({g})
    GROUP BY c.{group_cols[0] if len(group_cols) == 1 else g}
),
dq AS (
    SELECT c.{group_cols[0] if len(group_cols) == 1 else g},
        {d_exprs}
    FROM dcum c JOIN stats s USING ({g})
    GROUP BY c.{group_cols[0] if len(group_cols) == 1 else g}
),
units AS (
    SELECT {g}, CAST(count(DISTINCT unit) AS BIGINT) AS n_units
    FROM fine GROUP BY {g}
)
SELECT {mg}, units.n_units, stats.n_values, {out_exprs}
FROM mq JOIN dq USING ({g}) JOIN units USING ({g}) JOIN stats USING ({g})
ORDER BY {g}
"""


def hll_rollup(
    df: DataFrame,
    group_cols: list[str],
    rollup_col: Column,
    key: str,
    p: int = 5,
) -> DataFrame:
    """The 100 TB HLL pattern made driver-visible: registers built at
    the FINE grain (group × rollup unit, e.g. per day), then merged to
    the coarse grain by the same integer ``max`` — and the merged
    estimate compared against the estimate computed directly on the
    raw data. The two are IDENTICAL by construction (max is
    associative/commutative — the Bloom ``bit_or`` composition law's
    HLL twin), which is what lets a warehouse keep tiny per-day
    sketch tables and answer any date-range distinct query without
    rescanning facts; here the identity is an ORACLE-CHECKED output
    (``merged_minus_direct`` = 0 for every group), not a docstring
    claim.

    Output: group cols, n_units (fine-grain units merged),
    n_registers, merged_estimate, direct_estimate,
    merged_minus_direct.
    """
    m = 1 << p
    fine = hll_register_table(
        df.withColumn("__unit", rollup_col), [*group_cols, "__unit"], key, p
    )
    merged = (
        fine.groupBy(*group_cols, "reg_idx")
        .agg(F.max("reg").alias("reg"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_registers"),
            F.sum(
                F.expr("CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), reg)")
            ).alias("__occ"),
        )
    )
    units = (
        fine.select(*group_cols, "__unit")
        .distinct()
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).cast("long").alias("n_units"))
    )
    direct = hll_register_table(df, group_cols, key, p).groupBy(
        *group_cols
    ).agg(
        F.count(F.lit(1)).cast("long").alias("__nr_d"),
        F.sum(
            F.expr("CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), reg)")
        ).alias("__occ_d"),
    )

    def est(occ: Column, nr: Column) -> Column:
        s = occ + (F.lit(m) - nr).cast("double")
        return F.lit(_alpha(m)) * F.lit(float(m * m)) / s

    e_m = est(F.col("__occ"), F.col("n_registers"))
    e_d = est(F.col("__occ_d"), F.col("__nr_d"))
    return (
        merged.join(units, group_cols)
        .join(direct, group_cols)
        .select(
            *group_cols,
            "n_units",
            "n_registers",
            round_away(e_m, 4).alias("merged_estimate"),
            round_away(e_d, 4).alias("direct_estimate"),
            round_away(e_m - e_d, 6).alias("merged_minus_direct"),
        )
        .orderBy(*group_cols)
    )


def hll_rollup_oracle_sql(
    table: str,
    group_cols: list[str],
    rollup_expr: str,
    key: str,
    p: int = 5,
) -> str:
    """DuckDB twin of :func:`hll_rollup`, generated from the same
    literals (single-source pattern)."""
    m = 1 << p
    g = ", ".join(group_cols)
    rest_bits = 32 - p
    mask = (1 << rest_bits) - 1
    alpha = f"CAST({_alpha(m)!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)"
    return f"""
WITH h AS (
    SELECT {g}, {rollup_expr} AS unit,
        CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
    FROM {table}
),
r AS (
    SELECT {g}, unit,
        h32 >> {rest_bits} AS reg_idx,
        CASE WHEN (h32 & {mask}) = 0 THEN {rest_bits + 1}
             ELSE {rest_bits + 1} - length(bin(h32 & {mask})) END AS rank
    FROM h
),
fine AS (
    SELECT {g}, unit, reg_idx, CAST(max(rank) AS BIGINT) AS reg
    FROM r GROUP BY {g}, unit, reg_idx
),
mrg AS (
    SELECT {g}, reg_idx, CAST(max(reg) AS BIGINT) AS reg
    FROM fine GROUP BY {g}, reg_idx
),
msk AS (
    SELECT {g},
        CAST(count(*) AS BIGINT) AS n_registers,
        sum(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << reg)) AS occ
    FROM mrg GROUP BY {g}
),
units AS (
    SELECT {g}, CAST(count(DISTINCT unit) AS BIGINT) AS n_units
    FROM fine GROUP BY {g}
),
dreg AS (
    SELECT {g}, reg_idx, CAST(max(rank) AS BIGINT) AS reg
    FROM r GROUP BY {g}, reg_idx
),
dsk AS (
    SELECT {g},
        CAST(count(*) AS BIGINT) AS nr_d,
        sum(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << reg)) AS occ_d
    FROM dreg GROUP BY {g}
)
SELECT {', '.join('msk.' + c for c in group_cols)}, units.n_units, msk.n_registers,
    round({alpha} / (msk.occ + CAST({m} - msk.n_registers AS DOUBLE)), 4)
        AS merged_estimate,
    round({alpha} / (dsk.occ_d + CAST({m} - dsk.nr_d AS DOUBLE)), 4)
        AS direct_estimate,
    round({alpha} / (msk.occ + CAST({m} - msk.n_registers AS DOUBLE))
          - {alpha} / (dsk.occ_d + CAST({m} - dsk.nr_d AS DOUBLE)), 6)
        AS merged_minus_direct
FROM msk JOIN units USING ({g}) JOIN dsk USING ({g})
ORDER BY {g}
"""


# ---------------------------------------------------------------------------
# Count-min sketch — the FREQUENCY sketch, completing the family
# (HLL = distinct counts, Bloom = membership, histogram = quantiles,
# CMS = frequencies). Same cross-engine contract: counters are
# integer sums over md5 double-hashed positions, so the whole state
# and every point estimate replay exactly in DuckDB. CMS never
# underestimates (estimates = min over d counters, each ≥ the true
# count), so `overestimate ≥ 0` is a structural invariant the oracle
# checks per key alongside the values themselves.
#
# 100 TB design: the counter table is ≤ depth·width rows no matter
# the stream size — one map-side-combinable count aggregate builds
# it, plain SUM merges shards/days (the linear-sketch property), and
# point queries broadcast-join the fixed-size state.
# ---------------------------------------------------------------------------


def _cms_pos(key: Column, row: int, width: int) -> Column:
    h = F.md5(key.cast("string"))
    a = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    step = F.conv(F.substring(h, 9, 8), 16, 10).cast("long") * 2 + 1
    return F.pmod(a + row * step, F.lit(width))


def cms_counter_table(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """(row_idx, pos, cnt) — the sketch state, ≤ depth·width rows."""
    probe = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row_idx"),
                    _cms_pos(F.col(key_col), j, width).alias("pos"),
                )
                for j in range(depth)
            ]
        )
    )
    return (
        df.select(probe.alias("__p"))
        .select(F.col("__p.row_idx").alias("row_idx"), F.col("__p.pos").alias("pos"))
        .groupBy("row_idx", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cms_point_estimates(
    keys: DataFrame,
    key_col: str,
    counters: DataFrame,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Append ``cms_estimate`` = min over the d probed counters."""
    probe = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row_idx"),
                    _cms_pos(F.col(key_col), j, width).alias("pos"),
                )
                for j in range(depth)
            ]
        )
    )
    probed = keys.select("*", probe.alias("__p")).select(
        "*",
        F.col("__p.row_idx").alias("row_idx"),
        F.col("__p.pos").alias("pos"),
    ).drop("__p")
    group_cols = keys.columns
    return (
        probed.join(F.broadcast(counters), ["row_idx", "pos"], "left")
        .groupBy(*group_cols)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long")
            .alias("cms_estimate")
        )
    )


def cms_token_frequency(
    toks: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> DataFrame:
    """Heavy-hitter check: the exact top-``top_k`` keys by frequency
    (deterministic tiebreak) with their CMS estimates and the
    guaranteed-nonnegative overestimate. ``n_total`` rides along so
    the ε·N error budget (ε ≈ e/width) is visible in the output.
    """
    counters = cms_counter_table(toks, key_col, depth, width)
    exact = toks.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    # TakeOrderedAndProject (the importance_resample lesson): a
    # distributed top-k, never a single-partition rank window.
    top = exact.orderBy(F.desc("exact_count"), F.asc(key_col)).limit(top_k)
    n_total = toks.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    est = cms_point_estimates(top, key_col, counters, depth, width)
    return (
        est.crossJoin(F.broadcast(n_total))
        .select(
            key_col,
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count")).alias(
                "overestimate"
            ),
            "n_total",
        )
        .orderBy(F.desc("exact_count"), F.asc(key_col))
    )


def cms_token_frequency_oracle_sql(
    depth: int = 4, width: int = 1024, top_k: int = 20
) -> str:
    """DuckDB twin of :func:`cms_token_frequency` over the documents
    token stream, generated from the same literals."""
    probes = f"generate_series(0, {depth - 1})"
    return f"""
WITH toks AS (
    SELECT unnest(regexp_extract_all(lower(trim(text)),
        '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS token
    FROM documents
),
h AS (
    SELECT token,
        CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS a,
        CAST(('0x' || substr(md5(token), 9, 8)) AS BIGINT) * 2 + 1 AS step
    FROM toks
),
cnts AS (
    SELECT t.j AS row_idx, (a + t.j * step) % {width} AS pos,
        CAST(count(*) AS BIGINT) AS cnt
    FROM h, {probes} AS t(j)
    GROUP BY 1, 2
),
exact AS (
    SELECT token, CAST(count(*) AS BIGINT) AS exact_count
    FROM toks GROUP BY token
),
top AS (
    SELECT token, exact_count FROM exact
    ORDER BY exact_count DESC, token ASC LIMIT {top_k}
),
tp AS (
    SELECT top.token, top.exact_count, t.j AS row_idx,
        (CAST(('0x' || substr(md5(top.token), 1, 8)) AS BIGINT)
         + t.j * (CAST(('0x' || substr(md5(top.token), 9, 8)) AS BIGINT) * 2 + 1))
            % {width} AS pos
    FROM top, {probes} AS t(j)
),
est AS (
    SELECT token, exact_count,
        CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS cms_estimate
    FROM tp LEFT JOIN cnts c USING (row_idx, pos)
    GROUP BY 1, 2
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM toks)
SELECT est.token, est.exact_count, est.cms_estimate,
    est.cms_estimate - est.exact_count AS overestimate,
    nt.n_total
FROM est CROSS JOIN nt
ORDER BY est.exact_count DESC, est.token ASC
"""


def bloom_rollup(
    df: DataFrame,
    key_col: str,
    unit_col: Column,
    m_bits: int = 1 << 14,
    k: int = 5,
    top_k: int = 20,
    absent_offset: int = 10**7,
) -> DataFrame:
    """The membership twin completing the mergeable-rollup family
    (round 8; HLL = register max, histogram = bin sum, CMS = counter
    sum, Bloom = word-wise ``bit_or``): per-unit (e.g. per-day) Bloom
    filters OR-merged to the global filter beside the filter built
    directly on the raw stream. OR is associative, commutative and
    idempotent, so merged state == direct state BIT-for-bit —
    ``words_diff`` (count of differing filter words) is an
    ORACLE-CHECKED 0, and every probe verdict agrees between the two
    (``merge_diff`` false per probe). Probes: the ``top_k`` heaviest
    keys (expected present — Bloom filters have NO false negatives,
    checked as data) plus the same keys under ``absent_offset``
    (expected absent at test scales; a true verdict there would be a
    visible false positive, not an error).

    100 TB design: each unit's filter is ≤ ceil(m_bits/32) words no
    matter the stream size; the merge is one map-side-combinable
    ``bit_or`` over units·words rows; probes broadcast-join the
    fixed-size state.
    """
    # keyed feeds the probe positions, the present/keyset probes and
    # the unit count; fpos feeds BOTH the fine (merged) and the direct
    # filter — cache each once (the histogram_rollup `_cached_inputs`
    # contract; callers release via dedup.release_cached_inputs).
    keyed = df.select(
        F.col(key_col),
        F.col(key_col).cast("string").alias("__key"),
        unit_col.alias("__unit"),
    ).cache()
    pos = F.explode(
        F.array(*[_bloom_pos(F.col("__key"), i, m_bits) for i in range(k)])
    )
    fpos = (
        keyed.select("__unit", pos.alias("__pos"))
        .select(
            "__unit",
            F.shiftright(F.col("__pos"), 5).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__pos % 32 AS INT))"
            ).alias("__mask"),
        )
        .cache()
    )
    fine = fpos.groupBy("__unit", "word_idx").agg(
        F.bit_or("__mask").alias("bits")
    )
    merged = fine.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))
    direct = fpos.groupBy("word_idx").agg(F.bit_or("__mask").alias("bits"))
    wdiff = (
        merged.withColumnRenamed("bits", "__bm")
        .join(
            direct.withColumnRenamed("bits", "__bd"), "word_idx", "full"
        )
        .agg(
            F.sum(
                F.when(
                    F.coalesce(F.col("__bm"), F.lit(0))
                    != F.coalesce(F.col("__bd"), F.lit(0)),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("words_diff")
        )
    )
    units = (
        keyed.select("__unit")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_units"))
    )
    present = (
        keyed.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.desc("__cnt"), F.asc(key_col))
        .limit(top_k)
        .select(key_col)
    )
    probeset = present.unionByName(
        present.select(
            (F.col(key_col) + F.lit(absent_offset)).alias(key_col)
        )
    )
    keyset = keyed.select(key_col).distinct().withColumn(
        "__present", F.lit(True)
    )
    cands = (
        probeset.join(keyset, key_col, "left")
        .select(
            key_col,
            F.coalesce(F.col("__present"), F.lit(False)).alias("expected"),
            F.col(key_col).cast("string").alias("__key"),
        )
    )
    in_m = bloom_membership(cands, "__key", merged, m_bits, k).select(
        key_col, "expected", F.col("in_bloom").alias("in_merged")
    )
    in_d = bloom_membership(cands, "__key", direct, m_bits, k).select(
        key_col, F.col("in_bloom").alias("in_direct")
    )
    out = (
        in_m.join(in_d, key_col)
        .crossJoin(F.broadcast(wdiff))
        .crossJoin(F.broadcast(units))
        .select(
            key_col,
            "expected",
            "in_merged",
            "in_direct",
            (F.col("in_merged") != F.col("in_direct")).alias("merge_diff"),
            (~F.col("expected") | F.col("in_merged")).alias(
                "no_false_negative"
            ),
            "words_diff",
            "n_units",
        )
        .orderBy(key_col)
    )
    out._cached_inputs = (keyed, fpos)
    return out


def bloom_rollup_oracle_sql(
    table: str,
    key: str,
    unit_expr: str,
    m_bits: int = 1 << 14,
    k: int = 5,
    top_k: int = 20,
    absent_offset: int = 10**7,
) -> str:
    """DuckDB twin of :func:`bloom_rollup`, generated from the same
    literals (single-source pattern)."""
    probes = f"generate_series(0, {k - 1})"
    kstr = f"CAST({key} AS VARCHAR)"
    return f"""
WITH h AS (
    SELECT {key} AS kk, {unit_expr} AS unit,
        CAST(('0x' || substr(md5({kstr}), 1, 8)) AS BIGINT) AS a,
        CAST(('0x' || substr(md5({kstr}), 9, 8)) AS BIGINT) * 2 + 1 AS step
    FROM {table}
),
fpos AS (
    SELECT unit, (a + t.i * step) % {m_bits} AS pos
    FROM h, {probes} AS t(i)
),
fine AS (
    SELECT unit, pos >> 5 AS word_idx,
        bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
    FROM fpos GROUP BY 1, 2
),
mrg AS (
    SELECT word_idx, bit_or(bits) AS bits FROM fine GROUP BY 1
),
drc AS (
    SELECT pos >> 5 AS word_idx,
        bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS bits
    FROM fpos GROUP BY 1
),
wdiff AS (
    SELECT CAST(count_if(coalesce(m.bits, 0) <> coalesce(d.bits, 0))
                AS BIGINT) AS words_diff
    FROM mrg m FULL JOIN drc d USING (word_idx)
),
units AS (
    SELECT CAST(count(DISTINCT unit) AS BIGINT) AS n_units FROM h
),
present AS (
    SELECT kk FROM h GROUP BY kk
    ORDER BY count(*) DESC, kk ASC LIMIT {top_k}
),
probeset AS (
    SELECT kk FROM present
    UNION ALL SELECT kk + {absent_offset} FROM present
),
keyset AS (SELECT DISTINCT kk FROM h),
cands AS (
    SELECT p.kk, (ks.kk IS NOT NULL) AS expected,
        CAST(('0x' || substr(md5(CAST(p.kk AS VARCHAR)), 1, 8)) AS BIGINT)
            AS a,
        CAST(('0x' || substr(md5(CAST(p.kk AS VARCHAR)), 9, 8)) AS BIGINT)
            * 2 + 1 AS step
    FROM probeset p LEFT JOIN keyset ks ON ks.kk = p.kk
),
cpos AS (
    SELECT kk, expected, (a + t.i * step) % {m_bits} AS pos
    FROM cands, {probes} AS t(i)
),
vm AS (
    SELECT c.kk, c.expected,
        (sum(CASE WHEN (coalesce(w.bits, 0)
                        & (CAST(1 AS BIGINT) << CAST(c.pos % 32 AS INT)))
                       <> 0 THEN 1 ELSE 0 END) = {k}) AS in_merged
    FROM cpos c LEFT JOIN mrg w ON w.word_idx = c.pos >> 5
    GROUP BY 1, 2
),
vd AS (
    SELECT c.kk,
        (sum(CASE WHEN (coalesce(w.bits, 0)
                        & (CAST(1 AS BIGINT) << CAST(c.pos % 32 AS INT)))
                       <> 0 THEN 1 ELSE 0 END) = {k}) AS in_direct
    FROM cpos c LEFT JOIN drc w ON w.word_idx = c.pos >> 5
    GROUP BY 1
)
SELECT vm.kk AS {key}, vm.expected, vm.in_merged, vd.in_direct,
    vm.in_merged <> vd.in_direct AS merge_diff,
    (NOT vm.expected) OR vm.in_merged AS no_false_negative,
    wdiff.words_diff, units.n_units
FROM vm JOIN vd USING (kk)
CROSS JOIN wdiff CROSS JOIN units
ORDER BY vm.kk
"""


def cms_rollup(
    df: DataFrame,
    key_col: str,
    unit_col: Column,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> DataFrame:
    """The frequency twin of :func:`hll_rollup` /
    :func:`histogram_rollup` (round 8): CMS counter tables built at
    the FINE grain (one per rollup unit, e.g. per day), merged to the
    global sketch by plain BIGINT ``sum`` — the linear-sketch
    property — and point-estimated beside the counter table built
    directly on the raw stream. Merged counters == direct counters
    bit-for-bit (integer sums), so ``merge_diff`` is exactly 0 for
    every probed key — an ORACLE-CHECKED output. With this, every
    sketch in the family has a registered mergeable-rollup story:
    HLL (register max), histogram (bin-count sum), CMS (counter sum).

    Probe set: the exact top-``top_k`` keys (deterministic tiebreak),
    with the structural ``overestimate ≥ 0`` invariant and ``n_total``
    for the ε·N budget, as in :func:`cms_token_frequency`.

    100 TB design: each day's counter table is ≤ depth·width rows no
    matter the stream size; the merge is one map-side-combinable sum
    over units·depth·width rows; point queries broadcast-join the
    fixed-size state. The exact column is the accuracy reference
    (production reads the merged sketch alone).
    """
    dfu = df.withColumn("__unit", unit_col)
    probe = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row_idx"),
                    _cms_pos(F.col(key_col), j, width).alias("pos"),
                )
                for j in range(depth)
            ]
        )
    )
    fine = (
        dfu.select(F.col("__unit"), probe.alias("__p"))
        .select(
            "__unit",
            F.col("__p.row_idx").alias("row_idx"),
            F.col("__p.pos").alias("pos"),
        )
        .groupBy("__unit", "row_idx", "pos")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    merged = fine.groupBy("row_idx", "pos").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
    direct = cms_counter_table(df, key_col, depth, width)
    units = (
        fine.select("__unit")
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_units"))
    )
    exact = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    top = exact.orderBy(F.desc("exact_count"), F.asc(key_col)).limit(top_k)
    n_total = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    est_m = cms_point_estimates(top, key_col, merged, depth, width)
    est_d = cms_point_estimates(
        top.select(key_col), key_col, direct, depth, width
    ).withColumnRenamed("cms_estimate", "__direct")
    return (
        est_m.join(est_d, key_col)
        .crossJoin(F.broadcast(units))
        .crossJoin(F.broadcast(n_total))
        .select(
            key_col,
            "exact_count",
            F.col("cms_estimate").alias("merged_estimate"),
            F.col("__direct").alias("direct_estimate"),
            (F.col("cms_estimate") - F.col("__direct")).alias("merge_diff"),
            (F.col("cms_estimate") - F.col("exact_count")).alias(
                "overestimate"
            ),
            "n_units",
            "n_total",
        )
        .orderBy(F.desc("exact_count"), F.asc(key_col))
    )


def cms_rollup_oracle_sql(
    table: str,
    key: str,
    unit_expr: str,
    depth: int = 4,
    width: int = 1024,
    top_k: int = 20,
) -> str:
    """DuckDB twin of :func:`cms_rollup`, generated from the same
    literals (single-source pattern)."""
    probes = f"generate_series(0, {depth - 1})"
    kstr = f"CAST({key} AS VARCHAR)"
    return f"""
WITH h AS (
    SELECT {key} AS k, {unit_expr} AS unit,
        CAST(('0x' || substr(md5({kstr}), 1, 8)) AS BIGINT) AS a,
        CAST(('0x' || substr(md5({kstr}), 9, 8)) AS BIGINT) * 2 + 1 AS step
    FROM {table}
),
fine AS (
    SELECT unit, t.j AS row_idx, (a + t.j * step) % {width} AS pos,
        CAST(count(*) AS BIGINT) AS cnt
    FROM h, {probes} AS t(j)
    GROUP BY 1, 2, 3
),
mrg AS (
    SELECT row_idx, pos, CAST(sum(cnt) AS BIGINT) AS cnt
    FROM fine GROUP BY 1, 2
),
drc AS (
    SELECT t.j AS row_idx, (a + t.j * step) % {width} AS pos,
        CAST(count(*) AS BIGINT) AS cnt
    FROM h, {probes} AS t(j)
    GROUP BY 1, 2
),
units AS (
    SELECT CAST(count(DISTINCT unit) AS BIGINT) AS n_units FROM fine
),
exact AS (
    SELECT k, CAST(count(*) AS BIGINT) AS exact_count FROM h GROUP BY k
),
top AS (
    SELECT k, exact_count FROM exact
    ORDER BY exact_count DESC, k ASC LIMIT {top_k}
),
tp AS (
    SELECT top.k, top.exact_count, t.j AS row_idx,
        (CAST(('0x' || substr(md5(CAST(top.k AS VARCHAR)), 1, 8)) AS BIGINT)
         + t.j * (CAST(('0x' || substr(md5(CAST(top.k AS VARCHAR)), 9, 8))
                       AS BIGINT) * 2 + 1)) % {width} AS pos
    FROM top, {probes} AS t(j)
),
est AS (
    SELECT tp.k, tp.exact_count,
        CAST(min(coalesce(m.cnt, 0)) AS BIGINT) AS merged_estimate,
        CAST(min(coalesce(d.cnt, 0)) AS BIGINT) AS direct_estimate
    FROM tp
    LEFT JOIN mrg m USING (row_idx, pos)
    LEFT JOIN drc d USING (row_idx, pos)
    GROUP BY 1, 2
),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM h)
SELECT est.k AS {key}, est.exact_count,
    est.merged_estimate, est.direct_estimate,
    est.merged_estimate - est.direct_estimate AS merge_diff,
    est.merged_estimate - est.exact_count AS overestimate,
    units.n_units, nt.n_total
FROM est CROSS JOIN units CROSS JOIN nt
ORDER BY est.exact_count DESC, est.k ASC
"""


def hll_set_overlap(
    df: DataFrame, group_col: str, key: str, p: int = 5
) -> DataFrame:
    """HLL SET ALGEBRA (round 7): per unordered group pair, the
    union estimate via register max-merge (union of sets = element-wise
    max of register vectors — the same composition law
    :func:`hll_rollup` oracle-checks) and the inclusion–exclusion
    intersection estimate ``est_a + est_b − est_union``, both beside
    the exact intersection. This is the query a warehouse answers
    from stored per-segment sketches without rescanning facts
    ("how many users do segments A and B share"); here every
    estimate column is hash-gated, and the signed error makes the
    known weakness of inclusion–exclusion (variance grows as the
    true intersection shrinks) a measured, visible output.

    Exactness: register merge is integer max; each indicator sum is
    the exact dyadic-rational float sum; the final combination
    ``(est_a + est_b) − est_union`` is evaluated in that fixed
    association on both engines. The exact intersection is an
    integer count of a distinct-pair self-join.

    100 TB design: the fact scan reduces to groups × 2^p register
    rows ONCE; the pair space is groups², built from register tables
    (never from facts), so adding a segment costs one sketch, not a
    rescan. The exact column rides along as the accuracy reference
    exactly as in :func:`hll_distinct` (production drops it — it is
    the only fact-scale join here).
    """
    m = 1 << p
    g = group_col
    # regs feeds sk + both pair sides (3 plan branches) — uncached its
    # lineage rescans the fact table per branch (the r6 SNM lesson);
    # released via the _cached_inputs contract. The exact-intersection
    # reference adds its own two scans by design (production drops it).
    regs = hll_register_table(df, [g], key, p).cache()

    def est(occ: Column, nr: Column) -> Column:
        s = occ + (F.lit(m) - nr).cast("double")
        return F.lit(_alpha(m)) * F.lit(float(m * m)) / s

    sk = regs.groupBy(g).agg(
        F.count(F.lit(1)).cast("long").alias("__nr"),
        F.sum(F.expr("CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), reg)")).alias(
            "__occ"
        ),
    )
    ga = F.col("type_a")
    gb = F.col("type_b")
    pairs = (
        sk.select(F.col(g).alias("type_a"))
        .crossJoin(sk.select(F.col(g).alias("type_b")))
        .filter(ga < gb)
    )
    ra = regs.select(
        F.col(g).alias("type_a"), "reg_idx", "reg"
    ).join(pairs, "type_a")
    rb = regs.select(
        F.col(g).alias("type_b"), "reg_idx", "reg"
    ).join(pairs, "type_b")
    u = (
        ra.select("type_a", "type_b", "reg_idx", "reg")
        .unionByName(rb.select("type_a", "type_b", "reg_idx", "reg"))
        .groupBy("type_a", "type_b", "reg_idx")
        .agg(F.max("reg").alias("reg"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_registers_union"),
            F.sum(
                F.expr("CAST(1.0 AS DOUBLE) / shiftleft(CAST(1 AS BIGINT), reg)")
            ).alias("__occ_u"),
        )
    )
    ka = df.select(F.col(g).alias("type_a"), F.col(key).alias("__k")).distinct()
    kb = df.select(F.col(g).alias("type_b"), F.col(key).alias("__k")).distinct()
    exact = (
        ka.join(kb, "__k")
        .filter(ga < gb)
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_intersection"))
    )
    sa = sk.select(
        F.col(g).alias("type_a"),
        F.col("__nr").alias("__nra"),
        F.col("__occ").alias("__occa"),
    )
    sb = sk.select(
        F.col(g).alias("type_b"),
        F.col("__nr").alias("__nrb"),
        F.col("__occ").alias("__occb"),
    )
    e_a = est(F.col("__occa"), F.col("__nra"))
    e_b = est(F.col("__occb"), F.col("__nrb"))
    e_u = est(F.col("__occ_u"), F.col("n_registers_union"))
    e_i = (e_a + e_b) - e_u
    ex = F.col("exact_intersection").cast("double")
    out = (
        u.join(sa, "type_a")
        .join(sb, "type_b")
        .join(exact, ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "n_registers_union",
            round_away(e_a, 4).alias("est_a"),
            round_away(e_b, 4).alias("est_b"),
            round_away(e_u, 4).alias("est_union"),
            round_away(e_i, 4).alias("est_intersection"),
            F.coalesce(
                F.col("exact_intersection"), F.lit(0).cast("long")
            ).alias("exact_intersection"),
            round_away(
                F.try_divide(
                    e_i
                    - F.coalesce(ex, F.lit(0.0)),
                    F.coalesce(ex, F.lit(0.0)),
                ),
                6,
            ).alias("rel_error"),
        )
        .orderBy("type_a", "type_b")
    )
    out._cached_inputs = (regs,)  # type: ignore[attr-defined]
    return out


def hll_set_overlap_oracle_sql(
    table: str, group_col: str, key: str, p: int = 5
) -> str:
    """DuckDB twin of :func:`hll_set_overlap`, generated from the
    same literals and reusing the shared register chain
    (:func:`hll_sql_parts` text via the same h/r/regs CTEs)."""
    m = 1 << p
    g = group_col
    chain, _ = hll_sql_parts(table, [g], key, p)

    def est(occ: str, nr: str) -> str:
        return (
            f"CAST({_alpha(m)!r} AS DOUBLE) * CAST({float(m * m)!r} AS DOUBLE)"
            f" / ({occ} + CAST({m} - {nr} AS DOUBLE))"
        )

    e_a = est("j.occa", "j.nra")
    e_b = est("j.occb", "j.nrb")
    e_u = est("j.occ_u", "j.n_registers_union")
    return f"""
WITH {chain},
pairs AS (
    SELECT a.{g} AS type_a, b.{g} AS type_b
    FROM sk a CROSS JOIN sk b WHERE a.{g} < b.{g}
),
u AS (
    SELECT p.type_a, p.type_b, rr.reg_idx, max(rr.reg) AS reg
    FROM pairs p JOIN regs rr
      ON rr.{g} = p.type_a OR rr.{g} = p.type_b
    GROUP BY p.type_a, p.type_b, rr.reg_idx
),
usk AS (
    SELECT type_a, type_b,
        CAST(count(*) AS BIGINT) AS n_registers_union,
        sum(CAST(1.0 AS DOUBLE) / (CAST(1 AS BIGINT) << reg)) AS occ_u
    FROM u GROUP BY type_a, type_b
),
ex AS (
    SELECT ka.{g} AS type_a, kb.{g} AS type_b,
        CAST(count(*) AS BIGINT) AS exact_intersection
    FROM (SELECT DISTINCT {g}, {key} AS k FROM {table}) ka
    JOIN (SELECT DISTINCT {g}, {key} AS k FROM {table}) kb USING (k)
    WHERE ka.{g} < kb.{g}
    GROUP BY 1, 2
),
j AS (
    SELECT usk.*,
        sa.n_registers AS nra, sa.occupied_sum AS occa,
        sb.n_registers AS nrb, sb.occupied_sum AS occb,
        coalesce(ex.exact_intersection, CAST(0 AS BIGINT))
            AS exact_intersection
    FROM usk
    JOIN sk sa ON sa.{g} = usk.type_a
    JOIN sk sb ON sb.{g} = usk.type_b
    LEFT JOIN ex ON ex.type_a = usk.type_a AND ex.type_b = usk.type_b
)
SELECT j.type_a, j.type_b, j.n_registers_union,
    round({e_a}, 4) AS est_a,
    round({e_b}, 4) AS est_b,
    round({e_u}, 4) AS est_union,
    round(({e_a} + {e_b}) - {e_u}, 4) AS est_intersection,
    j.exact_intersection,
    round((({e_a} + {e_b}) - {e_u}
           - CAST(j.exact_intersection AS DOUBLE))
          / CAST(j.exact_intersection AS DOUBLE), 6) AS rel_error
FROM j
ORDER BY j.type_a, j.type_b
"""
