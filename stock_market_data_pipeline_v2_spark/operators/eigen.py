"""Distributed top principal component — integer-exact power iteration.

The corpus-analytics question ("what single direction explains the
most variance in this embedding space") is a Gram-matrix eigenvector;
at 100 TB the input reduction is the point: one scan folds the corpus
into a dim×dim Gram matrix (map-side-combinable integer sums), and
everything after is dim²-sized — the iteration never touches vectors
again. This module is the linear-algebra member of the repo's
integer-exact iterative family (PageRank's BIGINT micro-units,
k-core's unrolled peel): every quantity in the K-step loop is a
BIGINT both engines compute identically, so the whole iteration is
bit-exact cross-engine and the oracle unrolls into K generated CTE
stages (the ``pagerank_oracle_sql`` pattern).

Why floats can't run the loop: a float matvec Σ_j G_ij·v_j is a
partitioning-order-dependent sum, and K chained iterations amplify
the last-ulp wobble into divergent rescale decisions. Instead:

- unit vectors quantize to ``q = round(u·Q)`` (Q = 10^4) — BIGINT;
- Gram entries ``G_ij = Σ_docs q_i·q_j`` — exact BIGINT sums
  (|G_ij| ≤ n_docs·Q² keeps BIGINT headroom to ~10^10 docs);
- the Gram is rescaled to magnitude S = 10^7 and SQUARED ``squarings``
  times (rescaling after each) — repeated squaring is what makes a
  near-degenerate spectrum tractable: the synthetic corpus's eigengap
  ratio is ~0.98, so plain power iteration needs ~400 steps for 3-nines
  alignment, while G^(2^5) has ratio 0.98^32 ≈ 0.52 and converges in
  ~14 (measured across all SFs; matmul products bounded by
  dim·(2S)² ≈ 2.6e16 — exact);
- iteration: ``w = M·v`` (BIGINT), then magnitude renormalization by
  INTEGER division ``v ← sign(w)·(|w| div (max|w| div V))`` with
  V = 10^7 — sign-magnitude division, identical in Spark (`div`) and
  DuckDB (`//`) for non-negative operands;
- after K steps: loadings = v/‖v‖ (exact integer sum of squares,
  IEEE-exact sqrt, one divide, 6-dp round) and the Rayleigh quotient
  (v·Gv)/(v·v) from exact ≤1e27 integer sums (DECIMAL(38,0) on the
  Spark side, HUGEINT in DuckDB — both exact, each cast once to
  DOUBLE before the single division).

The per-step quantization (≤1 part in V) perturbs the direction far
below the 6-dp output rounding once the dominant eigengap applies;
accuracy vs numpy's float64 eigensolver is pytest-checked
(tests/test_round7_ops.py), while the oracle checks both engines run
the SAME deterministic recurrence.

Plan notes: the Gram build is the only corpus-scale stage (explode →
self-join on vec_id → ``groupBy(i,j)`` integer sum, bounded by
docs·dim² product rows, map-side combined); it materializes once
(``localCheckpoint``). The squaring/power loop itself runs DRIVER-
SIDE on the collected dim² Gram (round 8, VERDICT r7 #5): the loop is
MODEL-sized state — the same contract as collecting k-means centroids
or PQ codebooks — and running it as ~21 lazy Spark stages over 64-row
frames spent ~2× the query's wall time on scheduler round-trips
(measured 4.8–5.4 s at bench scale, most of it fixed per-stage
latency). Python's arbitrary-precision ints replicate the BIGINT
recurrence bit-for-bit (`div` on the sign-magnitude decomposition ==
`//` on non-negative operands; Spark's ANSI mode would have ABORTED
on any overflow, so the unbounded Python ints cannot diverge), the
unchanged generated oracle still replays the identical recurrence in
SQL, and the numpy parity pytest pins accuracy. The Rayleigh quotient
stays in Spark against the distributed Gram.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.core import round_away
from ..functions.vectors import as_double, l2_norm_unrolled

Q_SCALE = 10_000  # unit-vector quantization (4 dp)
S_SCALE = 10_000_000  # squared-matrix magnitude target
V_SCALE = 10_000_000  # iteration-vector magnitude target


def _quantized_coords(embeddings: DataFrame, dim: int) -> DataFrame:
    """(vec_id, i ∈ 1..dim, q BIGINT) — round(u·Q) per coordinate of
    the L2-normalized embedding; zero-norm vectors drop (they carry
    no direction)."""
    base = (
        embeddings.select(
            "vec_id", as_double(F.col("embedding")).alias("__v")
        )
        .withColumn("__n", l2_norm_unrolled("__v", dim))
        .filter(F.col("__n") > 0)
    )
    return base.select(
        "vec_id",
        "__n",
        F.posexplode("__v").alias("__i0", "__val"),
    ).select(
        "vec_id",
        (F.col("__i0") + 1).alias("i"),
        round_away(
            F.col("__val") / F.col("__n") * F.lit(float(Q_SCALE)), 0
        )
        .cast("long")
        .alias("q"),
    )


def _rescale_ints(vals: list[int], target: int) -> list[int]:
    """sign(g)·(|g| // (max|g| // target)) — the integer magnitude
    renormalization, bit-identical to the SQL ``div`` form the oracle
    replays (`//` == `div` on the non-negative magnitudes)."""
    mx = max((abs(g) for g in vals), default=0)
    d = max(mx // target, 1)
    return [(g // d) if g >= 0 else -((-g) // d) for g in vals]


def embedding_top_component(
    embeddings: DataFrame,
    dim: int = 64,
    iters: int = 14,
    squarings: int = 5,
) -> DataFrame:
    """(pos 1..dim, loading 6 dp, v_scaled BIGINT, eigenvalue 6 dp) —
    the dominant principal direction of the normalized embedding
    corpus after ``squarings`` integer matrix squarings and exactly
    ``iters`` integer power steps, plus the Rayleigh-quotient
    eigenvalue of the ORIGINAL Gram (in unit-vector Gram units, ≈
    share of corpus mass along the component)."""
    uq = _quantized_coords(embeddings, dim)
    a = uq.select("vec_id", F.col("i"), F.col("q").alias("__qa"))
    b = uq.select(
        "vec_id", F.col("i").alias("j"), F.col("q").alias("__qb")
    )
    gram = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("__qa") * F.col("__qb")).cast("long").alias("g"))
        .localCheckpoint()  # dim² rows; kills the corpus-scale lineage
        # so everything downstream replays nothing
    )
    # ---- driver-side exact-integer loop over the MODEL-sized Gram
    # (round 8, VERDICT r7 #5): dim² rows is model state — the
    # centroid-collect precedent — and the ~21 lazy 64-row stages the
    # distributed form scheduled were ~2× pure scheduler latency
    # (4.8–5.4 s at bench scale, most of it fixed per-stage cost).
    # Python ints replay the BIGINT recurrence bit-for-bit: `//` on
    # the sign-magnitude decomposition equals SQL `div`, and ANSI mode
    # would have ABORTED on any BIGINT overflow, so unbounded ints
    # cannot diverge. The generated oracle is unchanged — it still
    # replays the identical recurrence in SQL.
    spark = embeddings.sparkSession
    gr = gram.collect()
    idx = sorted({r["i"] for r in gr})
    n = len(idx)
    pos = {i: t for t, i in enumerate(idx)}
    mat = [[0] * n for _ in range(n)]
    for r in gr:
        mat[pos[r["i"]]][pos[r["j"]]] = int(r["g"])

    def rescale_mat(mm: list[list[int]], target: int) -> list[list[int]]:
        flat = _rescale_ints([g for row in mm for g in row], target)
        return [flat[t * n : (t + 1) * n] for t in range(n)]

    m = rescale_mat(mat, S_SCALE)
    for _ in range(squarings):
        prod = [
            [sum(m[ai][k] * m[k][bj] for k in range(n)) for bj in range(n)]
            for ai in range(n)
        ]
        m = rescale_mat(prod, S_SCALE)
    vv = [int(V_SCALE)] * n
    for _ in range(iters):
        w = [sum(m[ai][k] * vv[k] for k in range(n)) for ai in range(n)]
        vv = _rescale_ints(w, V_SCALE)
    vfin = spark.createDataFrame(
        [(int(i), int(vv[pos[i]])) for i in idx], "i int, v long"
    )
    # Rayleigh quotient against the ORIGINAL gram (not the squared,
    # rescaled M) so the eigenvalue is in interpretable Gram units.
    # DECIMAL(38,0) here, not BIGINT: |G|·|v| reaches n_docs·Q²·2V
    # (≈2.6e20 already at 2000 docs) — the oracle twin uses HUGEINT.
    wfin = (
        gram.join(vfin.select(F.col("i").alias("j"), "v"), "j")
        .groupBy("i")
        .agg(
            F.sum(
                F.col("g").cast("decimal(38,0)")
                * F.col("v").cast("decimal(38,0)")
            ).alias("w")
        )
    )
    # Rayleigh quotient from exact integer sums: products reach ~1e27,
    # held in DECIMAL(38,0) (exact; DuckDB twin uses HUGEINT), each
    # side cast ONCE to double before the single division.
    rq = (
        vfin.join(wfin, "i")
        .agg(
            F.sum(
                F.col("v").cast("decimal(38,0)") * F.col("w")
            ).alias("__num"),
            F.sum(
                F.col("v").cast("decimal(38,0)")
                * F.col("v").cast("decimal(38,0)")
            ).alias("__den"),
        )
        .select(
            F.try_divide(
                F.col("__num").cast("double"), F.col("__den").cast("double")
            ).alias("__lam_scaled")
        )
    )
    nrm = vfin.agg(
        F.sqrt(
            F.sum(F.col("v") * F.col("v")).cast("double")
        ).alias("__nrm")
    )
    # λ in unit-Gram units: G carries Q² per unit-gram unit.
    lam = F.col("__lam_scaled") / F.lit(float(Q_SCALE * Q_SCALE))
    return (
        vfin.crossJoin(F.broadcast(nrm))
        .crossJoin(F.broadcast(rq))
        .select(
            F.col("i").cast("long").alias("pos"),
            round_away(
                F.try_divide(F.col("v").cast("double"), F.col("__nrm")), 6
            ).alias("loading"),
            F.col("v").alias("v_scaled"),
            round_away(lam, 6).alias("eigenvalue"),
        )
        .orderBy("pos")
    )


def eigen_oracle_sql(
    dim: int = 64, iters: int = 14, squarings: int = 5
) -> str:
    """DuckDB twin of :func:`embedding_top_component` — the squarings
    and the K power steps unroll into generated MATERIALIZED CTE
    stages from the SAME (dim, iters, squarings, Q/S/V) literals
    (single-source pattern). MATERIALIZED is load-bearing: every
    stage references its predecessor twice (the max scalar + the
    rescale), so inlined CTEs would double the plan per stage —
    2^(stages) blowup (measured: the un-materialized form never
    returned)."""
    chain = " + ".join(f"v[{d}] * v[{d}]" for d in range(1, dim + 1))
    sq_stages = []
    for sq in range(1, squarings + 1):
        prev = f"m{sq - 1}"
        sq_stages.append(
            f"""p{sq} AS MATERIALIZED (
    SELECT a.i, b.j, CAST(sum(a.g * b.g) AS BIGINT) AS g
    FROM {prev} a JOIN {prev} b ON a.j = b.i
    GROUP BY a.i, b.j
),
pd{sq} AS (
    SELECT greatest(max(abs(g)) // {int(S_SCALE)},
                    CAST(1 AS BIGINT)) AS d
    FROM p{sq}
),
m{sq} AS MATERIALIZED (
    SELECT i, j, CAST(CASE WHEN g >= 0 THEN g // d
                           ELSE -((-g) // d) END AS BIGINT) AS g
    FROM p{sq}, pd{sq}
)"""
        )
    sq_chain = ",\n".join(sq_stages)
    stages = []
    for k in range(1, iters + 1):
        prev = f"v{k - 1}"
        stages.append(
            f"""w{k} AS MATERIALIZED (
    SELECT mm.i, CAST(sum(mm.g * {prev}.v) AS BIGINT) AS w
    FROM m{squarings} mm JOIN {prev} ON mm.j = {prev}.i GROUP BY mm.i
),
d{k} AS (
    SELECT greatest(max(abs(w)) // {int(V_SCALE)},
                    CAST(1 AS BIGINT)) AS d
    FROM w{k}
),
v{k} AS MATERIALIZED (
    SELECT i, CAST(CASE WHEN w >= 0 THEN w // d
                        ELSE -((-w) // d) END AS BIGINT) AS v
    FROM w{k}, d{k}
)"""
        )
    stage_chain = ",\n".join(stages)
    return f"""
WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
nrm AS (
    SELECT vec_id, v, sqrt(({chain})) AS n FROM e
),
base AS (SELECT * FROM nrm WHERE n > 0),
uq AS MATERIALIZED (
    SELECT vec_id, g.i AS i,
        CAST(round((v[g.i] / n) * {float(Q_SCALE)!r}) AS BIGINT) AS q
    FROM base, generate_series(1, {dim}) AS g(i)
),
gm AS MATERIALIZED (
    SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS g
    FROM uq a JOIN uq b USING (vec_id)
    GROUP BY 1, 2
),
gd AS (
    SELECT greatest(max(abs(g)) // {int(S_SCALE)},
                    CAST(1 AS BIGINT)) AS d
    FROM gm
),
m0 AS MATERIALIZED (
    SELECT i, j, CAST(CASE WHEN g >= 0 THEN g // d
                           ELSE -((-g) // d) END AS BIGINT) AS g
    FROM gm, gd
),
{sq_chain},
v0 AS (
    SELECT DISTINCT i, CAST({int(V_SCALE)} AS BIGINT) AS v FROM gm
),
{stage_chain},
wf AS MATERIALIZED (
    SELECT gm.i, CAST(sum(CAST(gm.g AS HUGEINT) * v{iters}.v) AS HUGEINT) AS w
    FROM gm JOIN v{iters} ON gm.j = v{iters}.i GROUP BY gm.i
),
rq AS (
    SELECT CAST(sum(CAST(v.v AS HUGEINT) * wf.w) AS DOUBLE)
           / CAST(sum(CAST(v.v AS HUGEINT) * v.v) AS DOUBLE)
           AS lam_scaled
    FROM v{iters} v JOIN wf ON v.i = wf.i
),
nn AS (
    SELECT sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm FROM v{iters}
)
SELECT CAST(v.i AS BIGINT) AS pos,
    round(CAST(v.v AS DOUBLE) / nn.nrm, 6) AS loading,
    v.v AS v_scaled,
    round(rq.lam_scaled / {float(Q_SCALE * Q_SCALE)!r}, 6) AS eigenvalue
FROM v{iters} v CROSS JOIN nn CROSS JOIN rq
ORDER BY pos
"""
