"""Frozen ANN index state + generated DuckDB oracles for the IVF/PQ
tiers (round 5).

VERDICT r4 asked for the approximate tiers' rows-only evidence gap to
close: "for the IVF/PQ tiers, serialize the memoized index state
(centroids + codebooks) into VALUES-literal oracle SQL keyed by
(sf_dir, seed)". Both trainers are DETERMINISTIC functions of the
sorted training sample (similarity.py:build_ivf_index round-5 Lloyd's
kernel; pq.py:build_pq_index's per-subspace kernel), so the model
state for a given testdata scale factor is a fixed set of doubles.
``tools/dump_index_state.py`` freezes that state per SF into
``index_state/<label>.json`` (shortest-repr floats — exact
round-trip), and the generators here expand it into DuckDB SQL that
replays assignment, probing, encoding and ADC scoring with literal
centroids/codebooks. Query-side float comparisons are mirrored
OPERATION-FOR-OPERATION: every dot/norm is the same left-associative
chain ``functions/vectors.py:dot_unrolled`` builds, so rank
tiebreaks agree bit-for-bit; the only unmirrorable float path is the
ADC kernel's einsum accumulation, whose ~1e-16 drift is absorbed by
the tiers' own 1e-9 candidate margin (pq.py:pq_adc_topk docstring).

The oracle strings are SF-specific (the index is trained per
corpus), selected by ``SPARK_GRAFT_ORACLE_SF`` — defaulting to
``sf0.01``, the scale the driver's correctness gate runs at;
``tools/verify_oracles.py`` sets it from ``--sf``. Drift between
frozen state and a live rebuild is guarded by
tests/test_llm_ops.py::test_frozen_index_state_matches_live_build.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

STATE_DIR = Path(__file__).resolve().parent / "index_state"

# Entry-contract geometry (must match __spark_entry__._ivf_index /
# _pq_index and the tier defaults).
IVF_N_ASSIGN = 3
IVF_N_PROBE = 16
PQ_M = 16
PQ_KSUB = 16
DIM = 64
K = 5
PQ_FETCH = 40  # refine(8) · k(5)
PQ_MARGIN = 1e-9
NEARDUP_THRESHOLD = 0.4
PROTO_KEEP_FRACTION = 0.7


def sf_label(sf_dir: str) -> str:
    """'/root/testdata/sf0.1' → 'sf0.1'."""
    return Path(sf_dir).name


def oracle_sf_label() -> str:
    return os.environ.get("SPARK_GRAFT_ORACLE_SF", "sf0.01")


def compute_state(spark, sf_dir: str) -> dict:
    """Build the SAME indexes the entry memoizes and extract their
    model state (centroids + codebook) as plain Python floats."""
    from .operators.pq import build_pq_index
    from .operators.similarity import build_ivf_index
    from .session import configure_runtime
    from .sources.io import load_table

    configure_runtime(spark)
    embs = load_table(spark, sf_dir, "embeddings")
    ivf = build_ivf_index(embs, n_assign=IVF_N_ASSIGN)
    centroids = {
        r["cell"]: [float(x) for x in r["cv"]] for r in ivf.centroids.collect()
    }
    pq = build_pq_index(embs)
    pq.codes.unpersist()
    return {
        "label": sf_label(sf_dir),
        "dim": DIM,
        "n_cells": ivf.n_cells,
        "n_assign": IVF_N_ASSIGN,
        "ivf_centroids": [centroids[c] for c in sorted(centroids)],
        "pq": {"m": pq.m, "ksub": pq.ksub, "codebook": pq.codebook_local},
    }


def load_state(label: str | None = None) -> dict:
    label = label or oracle_sf_label()
    path = STATE_DIR / f"{label}.json"
    return json.loads(path.read_text())


def _f(x: float) -> str:
    """Exact-round-trip DOUBLE literal: %.17e always carries an
    exponent, which DuckDB types as DOUBLE (a bare decimal would be
    DECIMAL and re-round)."""
    return f"{x:.17e}"


def _dot_chain(a: str, b: str, dim: int = DIM) -> str:
    """Left-associative dot chain — the dot_unrolled mirror."""
    return " + ".join(f"{a}[{i + 1}] * {b}[{i + 1}]" for i in range(dim))


def _norm_chain(a: str, dim: int = DIM) -> str:
    return (
        "sqrt(" + " + ".join(f"{a}[{i + 1}] * {a}[{i + 1}]" for i in range(dim)) + ")"
    )


def _centroid_values(state: dict) -> str:
    return ",\n        ".join(
        f"({cell}, [{', '.join(_f(x) for x in cv)}])"
        for cell, cv in enumerate(state["ivf_centroids"])
    )


def _ivf_ctes(state: dict) -> str:
    """e / cent / assignment CTEs shared by every IVF-derived oracle:
    per-vector top-``n_assign`` cells by raw dot (desc, tie → smaller
    cell), mirroring build_ivf_index's bounded top-k collapse."""
    n_assign = state["n_assign"]
    return f"""e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
en AS (SELECT vec_id, v, {_norm_chain('v')} AS nrm FROM e),
cent(cell, cv) AS (
    VALUES
        {_centroid_values(state)}
),
ad AS (
    SELECT en.vec_id, c.cell, {_dot_chain('en.v', 'c.cv')} AS d
    FROM en CROSS JOIN cent c
),
asg AS (
    SELECT vec_id, cell, rn FROM (
        SELECT vec_id, cell,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d DESC, cell ASC) AS rn
        FROM ad)
    WHERE rn <= {n_assign}
),
home AS (SELECT vec_id, cell FROM asg WHERE rn = 1)"""


def _probe_ctes(n_probe: int) -> str:
    """Query set + probe ranking (top n_probe cells by raw dot)."""
    return f"""q AS (SELECT vec_id, v, nrm FROM en WHERE vec_id % 4 = 0),
qd AS (
    SELECT q.vec_id AS query_id, c.cell, {_dot_chain('q.v', 'c.cv')} AS d
    FROM q CROSS JOIN cent c
),
probes AS (
    SELECT query_id, cell FROM (
        SELECT query_id, cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d DESC, cell ASC) AS pr
        FROM qd)
    WHERE pr <= {n_probe}
)"""


_COS = (
    f"({_dot_chain('cv.v', 'qv.v')}) / nullif(cv.nrm * qv.nrm, 0.0e0)"
)


def ann_ivf_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of similarity.py:ivf_topk over the frozen index:
    probe top-16 cells, exact cosine on home-cell members, top-5."""
    state = state or load_state()
    return f"""WITH {_ivf_ctes(state)},
{_probe_ctes(IVF_N_PROBE)},
cand AS (
    SELECT DISTINCT p.query_id, h.vec_id AS neighbor_id
    FROM probes p JOIN home h USING (cell)
    WHERE h.vec_id != p.query_id
),
s AS (
    SELECT cand.query_id, cand.neighbor_id, {_COS} AS c
    FROM cand
    JOIN en qv ON qv.vec_id = cand.query_id
    JOIN en cv ON cv.vec_id = cand.neighbor_id
),
r AS (
    SELECT query_id, neighbor_id, c,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, neighbor_id ASC) AS BIGINT)
               AS rank
    FROM s
)
SELECT query_id, neighbor_id, rank, round(c, 6) AS cosine
FROM r WHERE rank <= {K}
"""


def hard_negative_ivf_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of similarity.py:hard_negative_ivf_topk over the
    frozen index: probe top-16 cells, drop same-label members, exact
    cosine, top-5 — the ann_ivf oracle plus the label predicate."""
    state = state or load_state()
    return f"""WITH {_ivf_ctes(state)},
{_probe_ctes(IVF_N_PROBE)},
lab AS (SELECT vec_id, label FROM embeddings),
cand AS (
    SELECT DISTINCT p.query_id, h.vec_id AS neighbor_id
    FROM probes p JOIN home h USING (cell)
    WHERE h.vec_id != p.query_id
),
s AS (
    SELECT cand.query_id, ql.label AS query_label,
           cand.neighbor_id, nl.label AS neighbor_label, {_COS} AS c
    FROM cand
    JOIN en qv ON qv.vec_id = cand.query_id
    JOIN en cv ON cv.vec_id = cand.neighbor_id
    JOIN lab ql ON ql.vec_id = cand.query_id
    JOIN lab nl ON nl.vec_id = cand.neighbor_id
    WHERE ql.label <> nl.label
),
r AS (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY c DESC, neighbor_id ASC) AS BIGINT) AS rank
    FROM s
)
SELECT query_id, query_label, rank, neighbor_id, neighbor_label,
       round(c, 6) AS cosine
FROM r WHERE rank <= {K}
"""


def knn_label_eval_ivf_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of similarity.py:knn_label_eval_ivf over the
    frozen index: EVERY corpus vector probes its top-16 cells, its
    nearest home-cell member in the probed set votes (pool-3 raw
    ordering → 6-dp re-rank → head, the exact tier's compound-ulp
    contract), accuracy aggregates per label."""
    state = state or load_state()
    return f"""WITH {_ivf_ctes(state)},
qd AS (
    SELECT en.vec_id AS query_id, c.cell, {_dot_chain('en.v', 'c.cv')} AS d
    FROM en CROSS JOIN cent c
),
probes AS (
    SELECT query_id, cell FROM (
        SELECT query_id, cell,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY d DESC, cell ASC) AS pr
        FROM qd)
    WHERE pr <= {IVF_N_PROBE}
),
cand AS (
    SELECT DISTINCT p.query_id, h.vec_id AS neighbor_id
    FROM probes p JOIN home h USING (cell)
    WHERE h.vec_id != p.query_id
),
s AS (
    SELECT cand.query_id, cand.neighbor_id, {_COS} AS c
    FROM cand
    JOIN en qv ON qv.vec_id = cand.query_id
    JOIN en cv ON cv.vec_id = cand.neighbor_id
),
r AS (
    SELECT query_id, neighbor_id, round(c, 6) AS c6,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY c DESC, neighbor_id ASC) AS rk
    FROM s
),
v AS (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY c6 DESC, neighbor_id ASC) AS vrn
    FROM r WHERE rk <= 3
),
lab AS (
    SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
)
SELECT ql.label AS label, CAST(count(*) AS BIGINT) AS n_vectors,
    CAST(count_if(nl.label = ql.label) AS BIGINT) AS correct_1nn,
    round(CAST(count_if(nl.label = ql.label) AS DOUBLE) / count(*), 6)
        AS accuracy
FROM v
JOIN lab ql ON ql.vec_id = v.query_id
JOIN lab nl ON nl.vec_id = v.neighbor_id
WHERE vrn = 1
GROUP BY 1 ORDER BY 1
"""


def dedup_embedding_ivf_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of dedup.py:embedding_neardup_pairs_ivf: pairs
    sharing ≥1 of their n_assign cells, exact cosine ≥ threshold.
    (The engine's kernel pre-filter at threshold−1e-6 only prunes
    candidates the exact filter would drop; the emitted set is
    exactly this rule.)"""
    state = state or load_state()
    return f"""WITH {_ivf_ctes(state)},
cand AS (
    SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
    FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
),
s AS (
    SELECT cand.id_a, cand.id_b, ({_dot_chain('av.v', 'bv.v')})
               / nullif(av.nrm * bv.nrm, 0.0e0) AS c
    FROM cand
    JOIN en av ON av.vec_id = cand.id_a
    JOIN en bv ON bv.vec_id = cand.id_b
)
SELECT id_a, id_b, round(c, 6) AS cosine
FROM s WHERE c >= {NEARDUP_THRESHOLD}
"""


def prototypicality_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of curation.py:prototypicality_prune
    (prune_prototypes mode): cosine-to-home-centroid, per-cell rank
    asc (tie → smaller id), keep below the ceil-quota."""
    state = state or load_state()
    return f"""WITH {_ivf_ctes(state)},
cn AS (SELECT cell, cv, {_norm_chain('cv')} AS cnrm FROM cent),
p AS (
    SELECT h.vec_id AS id, h.cell,
           ({_dot_chain('en.v', 'cn.cv')}) / nullif(en.nrm * cn.cnrm, 0.0e0)
               AS proto
    FROM home h
    JOIN en ON en.vec_id = h.vec_id
    JOIN cn ON cn.cell = h.cell
),
r AS (
    SELECT id, cell, proto,
           CAST(row_number() OVER (PARTITION BY cell
                                   ORDER BY proto ASC, id ASC) AS BIGINT)
               AS cell_rank,
           count(*) OVER (PARTITION BY cell) AS cell_n
    FROM p
)
SELECT id, cell, round(proto, 6) AS prototypicality, cell_rank,
       cell_rank <= CAST(ceil(cell_n * {PROTO_KEEP_FRACTION}) AS BIGINT) AS keep
FROM r
"""


PROFILE_Q_SCALE = 10**9  # mirrors similarity.IVF_PROFILE_Q_SCALE


def _sqdist_chain(a: str, b: str, dim: int = DIM) -> str:
    """Left-associative Σ (a[i]−b[i])² — the sqdist_unrolled mirror."""
    return " + ".join(
        f"({a}[{i + 1}] - {b}[{i + 1}]) * ({a}[{i + 1}] - {b}[{i + 1}])"
        for i in range(dim)
    )


def _unit_list(dim: int = DIM) -> str:
    """Elementwise unit vector with the zero-norm guard — mirrors
    build_ivf_index's ``unit`` transform (divide each element, never
    normalize via the algebraic identity, so the doubles agree)."""
    divs = ", ".join(f"v[{i + 1}] / nrm" for i in range(dim))
    zeros = ", ".join("0.0e0" for _ in range(dim))
    return f"CASE WHEN nrm > 0.0e0 THEN [{divs}] ELSE [{zeros}] END"


def ivf_profile_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of similarity.py:ivf_cluster_profile over the
    frozen index: per-cell member count, quantized inertia (BIGINT
    sum of floor(d²·10⁹ + 0.5) — order-free exact), mean/max squared
    distance, centroid norm; empty cells kept with NULL stats."""
    state = state or load_state()
    return f"""WITH {_ivf_ctes(state)},
u AS (
    SELECT vec_id, {_unit_list()} AS uv FROM en
),
mem AS (
    SELECT h.cell, {_sqdist_chain('u.uv', 'c.cv')} AS d2
    FROM home h
    JOIN u ON u.vec_id = h.vec_id
    JOIN cent c ON c.cell = h.cell
),
agg AS (
    SELECT cell,
        CAST(count(*) AS BIGINT) AS n_members,
        CAST(sum(CAST(floor(d2 * 1.0e9 + 0.5e0) AS BIGINT)) AS BIGINT)
            AS sum_sqdist_q,
        max(d2) AS mx
    FROM mem GROUP BY cell
)
SELECT c.cell,
    coalesce(a.n_members, CAST(0 AS BIGINT)) AS n_members,
    coalesce(a.sum_sqdist_q, CAST(0 AS BIGINT)) AS sum_sqdist_q,
    CASE WHEN a.n_members > 0 THEN
        round(CAST(a.sum_sqdist_q AS DOUBLE)
              / (CAST(a.n_members AS DOUBLE) * 1.0e9), 6)
    END AS mean_sqdist,
    round(a.mx, 6) AS max_sqdist,
    round({_norm_chain('c.cv')}, 6) AS centroid_norm
FROM cent c LEFT JOIN agg a USING (cell)
ORDER BY c.cell
"""


def _uv_elem(expr: str, nrm: str) -> str:
    """One guarded unit-vector element: ``expr / nrm`` with the same
    zero-norm → 0.0 mapping the Spark side applies elementwise
    (pq.py's ``F.when(nrm > 0, x / nrm)`` transforms). For nrm > 0 the
    CASE wrapper is transparent — the division produces the identical
    double — so adding the guard cannot move any existing hash; it
    only closes the latent inf/NaN divergence a zero-norm embedding
    would cause (ADVICE r8)."""
    return f"(CASE WHEN {nrm} > 0.0e0 THEN {expr} / {nrm} ELSE 0.0e0 END)"


def _pq_ctes(state: dict) -> str:
    """Codebook literals + unit-subvector encoding CTEs: per
    (vector, subspace) argmin of the left-assoc squared distance
    (tie → smaller code), mirroring pq.py:_encode_codes."""
    pq = state["pq"]
    m, ksub = pq["m"], pq["ksub"]
    dsub = state["dim"] // m
    cb_rows = ",\n        ".join(
        f"({s}, {c}, [{', '.join(_f(x) for x in pq['codebook'][s][c])}])"
        for s in range(m)
        for c in range(ksub)
    )
    # (uv[sub·dsub+j] − center[j])² left-assoc chain, uv guarded
    sq = " + ".join(
        f"({_uv_elem(f'en.v[s.sub * {dsub} + {j + 1}]', 'en.nrm')}"
        f" - cb.ctr[{j + 1}])"
        f" * ({_uv_elem(f'en.v[s.sub * {dsub} + {j + 1}]', 'en.nrm')}"
        f" - cb.ctr[{j + 1}])"
        for j in range(dsub)
    )
    return f"""cb(sub, code, ctr) AS (
    VALUES
        {cb_rows}
),
subs AS (SELECT unnest(generate_series(0, {m - 1})) AS sub),
encd AS (
    SELECT en.vec_id, s.sub, cb.code, {sq} AS d
    FROM en CROSS JOIN subs s
    JOIN cb ON cb.sub = s.sub
),
enc AS (
    SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               row_number() OVER (PARTITION BY vec_id, sub
                                  ORDER BY d ASC, code ASC) AS rn
        FROM encd)
    WHERE rn = 1
)"""


def _adc_term(dsub: int) -> str:
    """One subspace's LUT entry: dot(query unit subvector, assigned
    center), left-assoc."""
    return " + ".join(
        f"{_uv_elem(f'q.v[enc.sub * {dsub} + {j + 1}]', 'q.nrm')}"
        f" * cb.ctr[{j + 1}]"
        for j in range(dsub)
    )


def ivf_extend_oracle_sql(
    state: dict | None = None, offset: int = 10_000_000
) -> str:
    """DuckDB twin of __spark_entry__.q_ann_index_extend: the ADD
    batch (vec_id % 4 == 2, under offset ids) assigned against the
    FROZEN centroids — assignment replay restricted to the batch.
    extend_ivf_index shares ``_encode``/assignment code with the
    build path, so the asg CTE (top-n_assign cells by raw dot, tie →
    smaller cell) is the exact mirror."""
    state = state or load_state()
    return f"""WITH {_ivf_ctes(state)}
SELECT vec_id + {offset} AS vec_id, CAST(rn AS BIGINT) AS slot, cell
FROM asg WHERE vec_id % 4 = 2
ORDER BY vec_id, slot
"""


def pq_extend_oracle_sql(
    state: dict | None = None, offset: int = 10_000_000
) -> str:
    """DuckDB twin of __spark_entry__.q_pq_index_extend: the ADD
    batch (vec_id % 4 == 3, under offset ids) encoded against the
    FROZEN codebooks — the enc CTE restricted to the batch.
    extend_pq_index shares ``_encode_codes`` with the build path, so
    the argmin replay (d ASC, code ASC) is the exact mirror."""
    state = state or load_state()
    return f"""WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
en AS (SELECT vec_id, v, {_norm_chain('v')} AS nrm FROM e),
{_pq_ctes(state)}
SELECT vec_id + {offset} AS vec_id, CAST(sub AS BIGINT) AS sub, code
FROM enc WHERE vec_id % 4 = 3
ORDER BY vec_id, sub
"""


def pq_profile_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of pq.py:pq_subspace_profile over the frozen
    codebook: re-encode (the enc CTE — already proven equal to the
    engine's persisted codes by the ADC-tier gates), then per
    subspace: code-capacity use, heaviest code load, and the BIGINT-
    quantized squared reconstruction error to the ASSIGNED center."""
    state = state or load_state()
    dsub = state["dim"] // state["pq"]["m"]
    sq = " + ".join(
        f"({_uv_elem(f'en.v[enc.sub * {dsub} + {j + 1}]', 'en.nrm')}"
        f" - cb.ctr[{j + 1}])"
        f" * ({_uv_elem(f'en.v[enc.sub * {dsub} + {j + 1}]', 'en.nrm')}"
        f" - cb.ctr[{j + 1}])"
        for j in range(dsub)
    )
    return f"""WITH e AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
en AS (SELECT vec_id, v, {_norm_chain('v')} AS nrm FROM e),
{_pq_ctes(state)},
per AS (
    SELECT enc.sub, enc.code, {sq} AS e2
    FROM enc
    JOIN cb ON cb.sub = enc.sub AND cb.code = enc.code
    JOIN en ON en.vec_id = enc.vec_id
),
pc AS (
    SELECT sub, code,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(floor(e2 * 1.0e9 + 0.5e0) AS BIGINT)) AS BIGINT)
            AS sq,
        max(e2) AS mx
    FROM per GROUP BY sub, code
)
SELECT CAST(sub AS BIGINT) AS sub,
    CAST(sum(n) AS BIGINT) AS n_vectors,
    CAST(count(*) AS BIGINT) AS codes_used,
    CAST(max(n) AS BIGINT) AS max_code_load,
    CAST(sum(sq) AS BIGINT) AS sum_sqerr_q,
    round(CAST(CAST(sum(sq) AS BIGINT) AS DOUBLE)
          / (CAST(CAST(sum(n) AS BIGINT) AS DOUBLE) * 1.0e9), 6)
        AS mean_sqerr,
    round(max(mx), 6) AS max_sqerr
FROM pc GROUP BY sub
ORDER BY sub
"""


def ann_pq_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of pq.py:pq_adc_topk in the single-block regime
    (corpus ≤ block_rows, true at every test SF): ADC-score every
    corpus vector per query, keep scores within margin of the
    fetch-th best, exact-cosine re-rank to top-5."""
    state = state or load_state()
    dsub = state["dim"] // state["pq"]["m"]
    return f"""WITH {_ivf_ctes(state)},
{_pq_ctes(state)},
q AS (SELECT vec_id, v, nrm FROM en WHERE vec_id % 4 = 0),
scores AS (
    SELECT q.vec_id AS query_id, enc.vec_id AS neighbor_id,
           sum({_adc_term(dsub)} ORDER BY enc.sub) AS adc
    FROM q
    JOIN enc ON enc.vec_id != q.vec_id
    JOIN cb ON cb.sub = enc.sub AND cb.code = enc.code
    GROUP BY q.vec_id, enc.vec_id
),
nblk AS (SELECT count(*) AS n FROM en),
ranked AS (
    SELECT query_id, neighbor_id, adc,
           row_number() OVER (PARTITION BY query_id ORDER BY adc DESC) AS rn
    FROM scores
),
thr AS (
    SELECT query_id,
           coalesce(max(CASE WHEN rn = least({PQ_FETCH}, (SELECT n FROM nblk))
                             THEN adc END),
                    '-infinity'::DOUBLE) AS thresh
    FROM ranked GROUP BY query_id
),
cand AS (
    SELECT r.query_id, r.neighbor_id
    FROM ranked r JOIN thr USING (query_id)
    WHERE r.adc >= thr.thresh - {PQ_MARGIN:.1e}
),
s AS (
    SELECT cand.query_id, cand.neighbor_id, {_COS} AS c
    FROM cand
    JOIN en qv ON qv.vec_id = cand.query_id
    JOIN en cv ON cv.vec_id = cand.neighbor_id
),
r AS (
    SELECT query_id, neighbor_id, c,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, neighbor_id ASC) AS BIGINT)
               AS rank
    FROM s
)
SELECT query_id, neighbor_id, rank, round(c, 6) AS cosine
FROM r WHERE rank <= {K}
"""


def ann_ivfpq_oracle_sql(state: dict | None = None) -> str:
    """DuckDB twin of pq.py:ivfpq_adc_topk: IVF probe → per-cell ADC
    with the per-(query, cell) fetch-th-best margin cut → global ADC
    trim to fetch → exact-cosine re-rank."""
    state = state or load_state()
    dsub = state["dim"] // state["pq"]["m"]
    return f"""WITH {_ivf_ctes(state)},
{_pq_ctes(state)},
{_probe_ctes(IVF_N_PROBE)},
mem AS (
    SELECT h.cell, enc.vec_id, enc.sub, enc.code
    FROM home h JOIN enc ON enc.vec_id = h.vec_id
),
cellsz AS (SELECT cell, count(DISTINCT vec_id) AS n FROM mem GROUP BY cell),
scores AS (
    SELECT p.query_id, p.cell, mem.vec_id AS neighbor_id,
           sum({_adc_term(dsub).replace('enc.sub', 'mem.sub')}
               ORDER BY mem.sub) AS adc
    FROM probes p
    JOIN mem ON mem.cell = p.cell AND mem.vec_id != p.query_id
    JOIN q ON q.vec_id = p.query_id
    JOIN cb ON cb.sub = mem.sub AND cb.code = mem.code
    GROUP BY p.query_id, p.cell, mem.vec_id
),
ranked AS (
    SELECT query_id, cell, neighbor_id, adc,
           row_number() OVER (PARTITION BY query_id, cell
                              ORDER BY adc DESC) AS rn
    FROM scores
),
thr AS (
    SELECT r.query_id, r.cell,
           coalesce(max(CASE WHEN r.rn = least({PQ_FETCH}, cs.n)
                             THEN r.adc END),
                    '-infinity'::DOUBLE) AS thresh
    FROM ranked r JOIN cellsz cs USING (cell)
    GROUP BY r.query_id, r.cell
),
cellcand AS (
    SELECT r.query_id, r.neighbor_id, r.adc
    FROM ranked r JOIN thr ON thr.query_id = r.query_id AND thr.cell = r.cell
    WHERE r.adc >= thr.thresh - {PQ_MARGIN:.1e}
),
trimmed AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY adc DESC, neighbor_id ASC) AS ar
        FROM cellcand)
    WHERE ar <= {PQ_FETCH}
),
s AS (
    SELECT t.query_id, t.neighbor_id, {_COS} AS c
    FROM trimmed t
    JOIN en qv ON qv.vec_id = t.query_id
    JOIN en cv ON cv.vec_id = t.neighbor_id
),
r AS (
    SELECT query_id, neighbor_id, c,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY c DESC, neighbor_id ASC) AS BIGINT)
               AS rank
    FROM s
)
SELECT query_id, neighbor_id, rank, round(c, 6) AS cosine
FROM r WHERE rank <= {K}
"""
