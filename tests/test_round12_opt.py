"""Round 12 OPTIMIZATION gates: every operator whose registered
implementation was restructured this round is pinned row-for-row
against its previous (ground-truth) form — the optimization rule is
"plan may change, values may not", and these tests make that a red
bar rather than an oracle-only claim."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_profile_drift_split_bit_identical_to_two_filter_form(spark):
    """r12: q_lineitem_profile_drift now profiles the two shipdate
    halves in ONE grouped scan (profile_drift_split). It must equal
    the original two-filtered-scan profile_drift output row for row,
    including the NULL-flag drop semantics."""
    from stock_market_data_pipeline_v2_spark.operators.profiling import (
        LINEITEM_PROFILE_SPEC,
        profile_drift,
        profile_drift_split,
    )
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    li = load_table(spark, SF, "lineitem")
    cut = F.lit("1998-06-01").cast("timestamp")
    old = profile_drift(
        li.filter(F.col("l_shipdate") < cut),
        li.filter(F.col("l_shipdate") >= cut),
        LINEITEM_PROFILE_SPEC,
    )
    new = profile_drift_split(
        li, F.col("l_shipdate") >= cut, LINEITEM_PROFILE_SPEC
    )
    rows_old = _sorted_rows(old)
    assert rows_old and _sorted_rows(new) == rows_old


def test_profile_drift_split_empty_half_matches_old_behavior(spark):
    """A half with zero rows: the two-filter form raises
    DIVIDE_BY_ZERO under ANSI (0-row aggregate → rows_b = 0 → the
    null-fraction division). The one-scan pivot coalesces the missing
    half's counts to 0 for exactly that reason — SAME values, so the
    SAME ANSI error, not a silently different NULL row."""
    import pytest
    from pyspark.errors.exceptions.captured import ArithmeticException

    from stock_market_data_pipeline_v2_spark.operators.profiling import (
        profile_drift,
        profile_drift_split,
    )

    df = spark.createDataFrame(
        [(1, 2.0), (2, None), (3, 5.0)], "id long, x double"
    )
    spec = [("id", "num"), ("x", "num")]
    flag = F.col("id") > 100  # side b empty
    with pytest.raises(ArithmeticException):
        profile_drift(df.filter(~flag), df.filter(flag), spec).collect()
    with pytest.raises(ArithmeticException):
        profile_drift_split(df, flag, spec).collect()


def test_profile_drift_split_null_flag_rows_in_neither_half(spark):
    """Rows whose split predicate is NULL were dropped by BOTH
    original filters; the one-scan form must drop them too (NULL
    group excluded from both pivot sides)."""
    from stock_market_data_pipeline_v2_spark.operators.profiling import (
        profile_drift,
        profile_drift_split,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0), (4, 4.0)], "id long, x double"
    )
    spec = [("id", "num"), ("x", "num")]
    flag = F.col("x") >= 3.0  # NULL for id=2 → neither half
    old = profile_drift(df.filter(~flag), df.filter(flag), spec)
    new = profile_drift_split(df, flag, spec)
    rows_old = _sorted_rows(old)
    assert rows_old and _sorted_rows(new) == rows_old
    # the NULL-flag row (id=2) lands in neither half: id 1 on side a,
    # ids 3/4 on side b — 3 rows total across both counts, not 4
    assert rows_old[0][1] + rows_old[0][2] == 3


def test_triangle_stats_memoized_graph_path_matches_inline(spark):
    """r12: with a prebuilt graph, triangle_stats now reuses the
    index's degree column and vertex spine (no redundant re-join or
    lineitem re-scan) and hints SHUFFLE_HASH on the wedge joins. The
    graph-path output must stay identical to the from-scratch inline
    path (which still derives everything from lineitem)."""
    from stock_market_data_pipeline_v2_spark.operators.graph import (
        build_copurchase_graph,
        triangle_stats,
    )
    from stock_market_data_pipeline_v2_spark.sources.io import load_table

    li = load_table(spark, SF, "lineitem")
    inline = triangle_stats(li)
    memo = triangle_stats(li, graph=build_copurchase_graph(li))
    rows_inline = _sorted_rows(inline)
    assert rows_inline and _sorted_rows(memo) == rows_inline
