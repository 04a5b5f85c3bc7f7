"""Per-label embedding centroids: class separation + coherence —
the report a contrastive-training data team reads before trusting
its labels (collapsed classes → near-1 pairwise cosine; noisy
labels → low within-class coherence).

Exactness (the ``eigen.py`` move, same Q_SCALE literal): each
embedding is L2-normalized and quantized to BIGINT coordinates
(``round(u·10⁴)``), so every sum in the pipeline — per-label
coordinate sums, self-dots, pairwise dots — is exact integer
arithmetic with NO float-summation order hazard. Floats appear only
at the boundary: one correctly-rounded ``sqrt`` per norm and one
division per output cell, on bit-identical integer operands in both
engines.

Definitions over the quantized unit vectors u_k of label L with
S_L = Σ u_k (coordinate-wise BIGINT sums):
- ``cosine(L_a, L_b)`` = S_a·S_b / (‖S_a‖‖S_b‖) — the cosine of the
  (unnormalized-mean) centroids; n cancels, so no float mean exists.
- ``coherence(L)`` = ‖S_L‖ / (n_L·Q) — the mean resultant length
  (directional-statistics dispersion, ∈ [0,1]; 1 = all vectors
  identical in direction).

100 TB shape: ONE corpus scan explodes to (label, dim) grain and
folds map-side-combinably to |labels|·dim BIGINT sums; everything
after (self-dots, the label-pair join) is model-sized. Vectors never
shuffle. Dots accumulate in DECIMAL(38,0) (HUGEINT on the oracle
side) so the pairwise products survive far beyond BIGINT corpora.

Reference parity: the reference has no embedding layer; this extends
the SemDeDup/ANN family (`similarity.py`) with the class-level audit
those operators assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.core import round_away
from ..functions.vectors import as_double, l2_norm_unrolled
from .eigen import Q_SCALE


def label_centroid_similarity(embeddings: DataFrame, dim: int = 64) -> DataFrame:
    """(label_a, label_b, n_a, n_b, cosine, coherence_a, coherence_b)
    for every unordered label pair (a < b), label-ordered."""
    base = (
        embeddings.select(
            F.col("label").cast("long").alias("label"),
            as_double(F.col("embedding")).alias("__v"),
        )
        .withColumn("__n", l2_norm_unrolled("__v", dim))
        .filter(F.col("__n") > 0)
    )
    coords = base.select(
        "label", "__n", F.posexplode("__v").alias("__i0", "__val")
    ).select(
        "label",
        (F.col("__i0") + 1).alias("i"),
        round_away(F.col("__val") / F.col("__n") * F.lit(float(Q_SCALE)), 0)
        .cast("long")
        .alias("q"),
    )
    sums = coords.groupBy("label", "i").agg(
        F.sum("q").cast("long").alias("s")
    )
    counts = base.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    self_dot = sums.groupBy("label").agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("d")
    )
    a, b = sums.alias("a"), sums.alias("b")
    pair_dot = (
        a.join(
            F.broadcast(b),
            (F.col("a.i") == F.col("b.i"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(
            F.sum(F.col("a.s").cast("decimal(38,0)") * F.col("b.s")).alias(
                "dot"
            )
        )
    )
    da = self_dot.select(
        F.col("label").alias("label_a"), F.col("d").alias("__da")
    )
    db = self_dot.select(
        F.col("label").alias("label_b"), F.col("d").alias("__db")
    )
    ca = counts.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"))
    qd = F.lit(float(Q_SCALE))
    return (
        pair_dot.join(F.broadcast(da), "label_a")
        .join(F.broadcast(db), "label_b")
        .join(F.broadcast(ca), "label_a")
        .join(F.broadcast(cb), "label_b")
        .select(
            "label_a",
            "label_b",
            "n_a",
            "n_b",
            # exact-integer guards: a fully-cancelled centroid (‖S‖=0,
            # possible with opposing vectors) has no direction — the
            # unguarded division would ABORT under ANSI; the guard
            # predicate is integer-exact, identical on both engines.
            F.when(
                (F.col("__da") > 0) & (F.col("__db") > 0),
                round_away(
                    F.col("dot").cast("double")
                    / (
                        F.sqrt(F.col("__da").cast("double"))
                        * F.sqrt(F.col("__db").cast("double"))
                    ),
                    6,
                ),
            ).alias("cosine"),
            F.when(
                F.col("__da") > 0,
                round_away(
                    F.sqrt(F.col("__da").cast("double"))
                    / (F.col("n_a").cast("double") * qd),
                    6,
                ),
            ).alias("coherence_a"),
            F.when(
                F.col("__db") > 0,
                round_away(
                    F.sqrt(F.col("__db").cast("double"))
                    / (F.col("n_b").cast("double") * qd),
                    6,
                ),
            ).alias("coherence_b"),
        )
        .orderBy("label_a", "label_b")
    )


def label_centroid_oracle_sql(dim: int = 64) -> str:
    """DuckDB twin, generated from the SAME (dim, Q_SCALE) literals
    (single-source pattern — `eigen.py:eigen_oracle_sql`'s
    quantization CTE, re-targeted at label grain)."""
    chain = " + ".join(f"v[{d}] * v[{d}]" for d in range(1, dim + 1))
    return f"""
WITH e AS (
    SELECT CAST(label AS BIGINT) AS label, embedding::DOUBLE[] AS v
    FROM embeddings
),
nrm AS (SELECT label, v, sqrt(({chain})) AS n FROM e),
base AS (SELECT * FROM nrm WHERE n > 0),
uq AS MATERIALIZED (
    SELECT label, g.i AS i,
        CAST(round((v[g.i] / n) * {float(Q_SCALE)!r}) AS BIGINT) AS q
    FROM base, generate_series(1, {dim}) AS g(i)
),
s AS MATERIALIZED (
    SELECT label, i, CAST(sum(q) AS BIGINT) AS s FROM uq GROUP BY 1, 2
),
c AS (SELECT label, CAST(count(*) AS BIGINT) AS n FROM base GROUP BY 1),
sd AS (
    SELECT label, sum(CAST(s AS HUGEINT) * s) AS d FROM s GROUP BY 1
),
pd AS (
    SELECT a.label AS label_a, b.label AS label_b,
        sum(CAST(a.s AS HUGEINT) * b.s) AS dot
    FROM s a JOIN s b ON a.i = b.i AND a.label < b.label
    GROUP BY 1, 2
)
SELECT pd.label_a, pd.label_b, ca.n AS n_a, cb.n AS n_b,
    CASE WHEN da.d > 0 AND db.d > 0 THEN
        round(CAST(pd.dot AS DOUBLE)
            / (sqrt(CAST(da.d AS DOUBLE)) * sqrt(CAST(db.d AS DOUBLE))),
            6) END AS cosine,
    CASE WHEN da.d > 0 THEN
        round(sqrt(CAST(da.d AS DOUBLE))
            / (CAST(ca.n AS DOUBLE) * {float(Q_SCALE)!r}), 6)
        END AS coherence_a,
    CASE WHEN db.d > 0 THEN
        round(sqrt(CAST(db.d AS DOUBLE))
            / (CAST(cb.n AS DOUBLE) * {float(Q_SCALE)!r}), 6)
        END AS coherence_b
FROM pd
JOIN sd da ON da.label = pd.label_a
JOIN sd db ON db.label = pd.label_b
JOIN c ca ON ca.label = pd.label_a
JOIN c cb ON cb.label = pd.label_b
ORDER BY label_a, label_b
"""


def label_loo_outliers(
    embeddings: DataFrame, dim: int = 64, k: int = 3
) -> DataFrame:
    """Mislabel-candidate audit: per label, the k vectors with the
    LOWEST leave-one-out cosine to their own class centroid — the
    standard label-noise screen a training-data team runs before
    trusting a labeled corpus (a correctly-labeled vector sits near
    its class mean; a mislabeled one points away).

    Leave-one-out is EXACT integer algebra over the quantized unit
    vectors (no second pass, no float summation): with S the class
    coordinate-sum and q the vector's own coordinates,

        loo_cos = (q·S − q·q) / (‖q‖ · ‖S − q‖)
                = (qS − qq) / (sqrt(qq) · sqrt(SS − 2·qS + qq))

    — three BIGINT dots (qS, qq, SS) produce the self-excluded
    centroid cosine without materializing S−q per vector. Floats
    appear only in the final sqrt/divide on bit-identical integer
    operands; the per-label ranking orders those identical doubles
    with a vec_id tiebreak, so top-k is deterministic on both
    engines.

    100 TB shape: one corpus scan to coordinates; q·S is a broadcast
    join against the |labels|·dim sum frame folded back to vector
    grain (map-side combinable); the per-label bottom-k is the
    TWO-LEVEL salted rank (r10, VERDICT r9 #3): a deterministic
    ``vec_id % 64`` salt splits each label into 64 groups, a local
    window takes each (salt, label) group's bottom-k, and the final
    per-label window ranks only the ≤ 64·k survivors — no label's
    full vector grain ever sorts in one partition, and the first
    window's leading salt key spreads the shuffle uniformly. The
    output is provably identical to the single per-label window
    (every true bottom-k row is within its own salt group's
    bottom-k), so the oracle is unchanged.
    """
    base = (
        embeddings.select(
            "vec_id",
            F.col("label").cast("long").alias("label"),
            as_double(F.col("embedding")).alias("__v"),
        )
        .withColumn("__n", l2_norm_unrolled("__v", dim))
        .filter(F.col("__n") > 0)
    )
    coords = base.select(
        "vec_id",
        "label",
        "__n",
        F.posexplode("__v").alias("__i0", "__val"),
    ).select(
        "vec_id",
        "label",
        (F.col("__i0") + 1).alias("i"),
        round_away(F.col("__val") / F.col("__n") * F.lit(float(Q_SCALE)), 0)
        .cast("long")
        .alias("q"),
    )
    sums = coords.groupBy("label", "i").agg(
        F.sum("q").cast("long").alias("s")
    )
    ss = sums.groupBy("label").agg(
        F.sum(F.col("s").cast("decimal(38,0)") * F.col("s")).alias("__ss")
    )
    dots = (
        coords.join(F.broadcast(sums), ["label", "i"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("s")).alias("__qs"),
            F.sum(F.col("q").cast("decimal(38,0)") * F.col("q")).alias("__qq"),
        )
    )
    # EXACT integer pre-filter on the ‖S−q‖² term: a singleton label
    # (S = q) — or the degenerate cancellation where the rest of the
    # class sums to the zero vector — has no defined LOO direction;
    # under ANSI mode the division would ABORT the query, and a NULL
    # would order differently across engines. The predicate is pure
    # integer arithmetic, so both sides drop exactly the same rows.
    scored = (
        dots.join(F.broadcast(ss), "label")
        .withColumn(
            "__den2",
            F.col("__ss")
            - F.lit(2).cast("decimal(38,0)") * F.col("__qs")
            + F.col("__qq"),
        )
        .filter(F.col("__den2") > 0)
        .select(
            "vec_id",
            "label",
            round_away(
                (F.col("__qs") - F.col("__qq")).cast("double")
                / (
                    F.sqrt(F.col("__qq").cast("double"))
                    * F.sqrt(F.col("__den2").cast("double"))
                ),
                6,
            ).alias("loo_cosine"),
        )
    )
    n_salt = 64
    w_local = Window.partitionBy("__salt", "label").orderBy(
        F.asc("loo_cosine"), F.asc("vec_id")
    )
    survivors = (
        scored.withColumn("__salt", F.pmod(F.col("vec_id"), F.lit(n_salt)))
        .withColumn("__lrn", F.row_number().over(w_local))
        .filter(F.col("__lrn") <= int(k))
        .drop("__salt", "__lrn")
    )
    w = Window.partitionBy("label").orderBy(
        F.asc("loo_cosine"), F.asc("vec_id")
    )
    return (
        survivors.withColumn(
            "outlier_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("outlier_rank") <= int(k))
        .select("label", "outlier_rank", "vec_id", "loo_cosine")
        .orderBy("label", "outlier_rank")
    )


def label_loo_oracle_sql(dim: int = 64, k: int = 3) -> str:
    """DuckDB twin of :func:`label_loo_outliers` — same quantization
    CTE, same three-integer-dot LOO identity, same tiebreak."""
    chain = " + ".join(f"v[{d}] * v[{d}]" for d in range(1, dim + 1))
    return f"""
WITH e AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label,
        embedding::DOUBLE[] AS v
    FROM embeddings
),
nrm AS (SELECT vec_id, label, v, sqrt(({chain})) AS n FROM e),
base AS (SELECT * FROM nrm WHERE n > 0),
uq AS MATERIALIZED (
    SELECT vec_id, label, g.i AS i,
        CAST(round((v[g.i] / n) * {float(Q_SCALE)!r}) AS BIGINT) AS q
    FROM base, generate_series(1, {dim}) AS g(i)
),
s AS MATERIALIZED (
    SELECT label, i, CAST(sum(q) AS BIGINT) AS s FROM uq GROUP BY 1, 2
),
ss AS (SELECT label, sum(CAST(s AS HUGEINT) * s) AS ssum FROM s GROUP BY 1),
dots AS (
    SELECT uq.vec_id, uq.label,
        sum(CAST(uq.q AS HUGEINT) * s.s) AS qs,
        sum(CAST(uq.q AS HUGEINT) * uq.q) AS qq
    FROM uq JOIN s ON s.label = uq.label AND s.i = uq.i
    GROUP BY 1, 2
),
scored AS (
    SELECT d.vec_id, d.label,
        round(CAST(d.qs - d.qq AS DOUBLE)
            / (sqrt(CAST(d.qq AS DOUBLE))
               * sqrt(CAST(ss.ssum - 2 * d.qs + d.qq AS DOUBLE))),
            6) AS loo_cosine
    FROM dots d JOIN ss ON ss.label = d.label
    WHERE (ss.ssum - 2 * d.qs + d.qq) > 0
),
ranked AS (
    SELECT label, vec_id, loo_cosine,
        CAST(row_number() OVER (
            PARTITION BY label ORDER BY loo_cosine, vec_id
        ) AS BIGINT) AS outlier_rank
    FROM scored
)
SELECT label, outlier_rank, vec_id, loo_cosine
FROM ranked WHERE outlier_rank <= {int(k)}
ORDER BY label, outlier_rank
"""
