"""Round 12 (second half): the transactional table's remaining DML /
maintenance verbs — row UPDATE (selective COW), CHECK constraints
(Delta invariants), RESTORE, the keyed change data feed, and MERGE's
WHEN NOT MATCHED BY SOURCE THEN DELETE clause."""

import pytest
from pyspark.sql import functions as F


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, ver long")


def _read(spark, t, version=None):
    return sorted(tuple(r) for r in t.read(spark, version).collect())


def test_txn_update_semantics_and_selectivity(spark, tmp_path):
    """UPDATE: RHS evaluated against OLD values (swap works), NULL
    condition leaves the row unchanged (SQL UPDATE), values cast to
    the committed column type, selective rewrite carries
    non-intersecting files byte-identical with the full-COW twin
    reaching the same end state, and key_unique_on survives iff no
    key column is assigned."""
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    rows = [(k, f"v{k}", 1, float(k)) for k in range(1, 33)]
    df = spark.createDataFrame(rows, "k long, v string, ver long, x double")
    t = TxnTable.create(spark, str(tmp_path / "t"), df, keys=["k"])
    t.optimize(spark, cluster_col="k", n_files=4)
    m_opt = t.manifest()

    # swap x and ver for k in [1, 8]: both RHS see the OLD row
    v = t.update(
        spark,
        "k between 1 and 8",
        {"x": "ver", "ver": "cast(x as long)"},
        prune_col="k",
        prune_lo=1,
        prune_hi=8,
    )
    m = t.manifest(v)
    assert m["op"] == "update"
    assert m["key_unique_on"] == ["k"], "non-key SET keeps the proof"
    assert set(m_opt["files"]) & set(m["files"]), "selective carry"
    got = {r.k: (r.ver, r.x) for r in t.read(spark).collect()}
    assert got[3] == (3, 1.0) and got[9] == (1, 9.0)

    # full-COW twin (no prune bound) reaches the identical end state
    twin = TxnTable.create(spark, str(tmp_path / "tw"), df, keys=["k"])
    twin.update(spark, "k between 1 and 8", {"x": "ver", "ver": "cast(x as long)"})
    assert _read(spark, t) == _read(spark, twin)

    # NULL condition rows are untouched; int literal casts to double
    t2 = TxnTable.create(
        spark,
        str(tmp_path / "t2"),
        spark.createDataFrame(
            [(1, "a", 1, 1.0), (2, None, 1, 2.0)],
            "k long, v string, ver long, x double",
        ),
    )
    t2.update(spark, F.col("v") == "a", {"x": F.lit(7)})
    got2 = {r.k: r.x for r in t2.read(spark).collect()}
    assert got2 == {1: 7.0, 2: 2.0}
    assert t2.read(spark).schema["x"].dataType.simpleString() == "double"

    # assigning a key column drops the uniqueness proof
    vk = t.update(spark, "k = 1", {"k": "k + 1000"})
    assert t.manifest(vk)["key_unique_on"] is None
    with pytest.raises(ValueError, match="not in the table schema"):
        t.update(spark, "k = 1", {"nope": "1"})


def test_txn_check_constraints_enforced_everywhere(spark, tmp_path):
    """CHECK constraints: add validates the existing snapshot, every
    row-introducing path (append, merge, update, stream batch)
    refuses violating commits, NULL passes (SQL CHECK), metadata-only
    commits carry them, and drop re-opens the gate."""
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    t = TxnTable.create(
        spark, str(tmp_path / "t"), _rows(spark, [(1, "a", 1), (2, None, 1)])
    )
    # adding a constraint the data violates refuses
    with pytest.raises(ValueError, match="k_small"):
        t.add_constraint(spark, "k_small", "k < 2")
    v = t.add_constraint(spark, "k_pos", "k > 0")
    m = t.manifest(v)
    assert m["op"] == "add-constraint" and m["constraints"] == {"k_pos": "k > 0"}
    with pytest.raises(ValueError, match="already exists"):
        t.add_constraint(spark, "k_pos", "k > 0")

    # NULL passes: v is NULL on one committed row, this add succeeds
    t.add_constraint(spark, "v_not_empty", "v <> ''")

    with pytest.raises(ValueError, match="k_pos"):
        t.append(spark, _rows(spark, [(-1, "x", 1)]))
    with pytest.raises(ValueError, match="v_not_empty"):
        t.merge(spark, _rows(spark, [(3, "", 1)]), keys=["k"], version_col="ver")
    with pytest.raises(ValueError, match="k_pos"):
        t.update(spark, "k = 1", {"k": "-k"})
    with pytest.raises(ValueError, match="k_pos"):
        t.commit_stream_batch(spark, _rows(spark, [(-2, "y", 1)]), "app", 0)
    # nothing above committed
    assert {r.k for r in t.read(spark).collect()} == {1, 2}

    # conforming writes pass; constraints carry through optimize/evolve
    t.append(spark, _rows(spark, [(3, "c", 1)]))
    t.optimize(spark, cluster_col="k", n_files=2)
    t.evolve_schema(spark, [("score", "double")])
    assert t.manifest()["constraints"] == {
        "k_pos": "k > 0",
        "v_not_empty": "v <> ''",
    }

    t.drop_constraint("k_pos")
    with pytest.raises(ValueError, match="no constraint"):
        t.drop_constraint("k_pos")
    wide = spark.createDataFrame(
        [(-1, "x", 1, 0.5)], "k long, v string, ver long, score double"
    )
    t.append(spark, wide)  # k_pos gone; v_not_empty still holds
    assert {r.k for r in t.read(spark).collect()} == {1, 2, 3, -1}


def test_txn_constraint_toctou_rechecked_per_retry(spark, tmp_path):
    """An append that loses its race to an add-constraint commit must
    re-validate against the NEW parent's constraint set and refuse —
    the schema-guard TOCTOU discipline applied to invariants."""
    from stock_market_data_pipeline_v2_spark.sources import txn_table as tt

    root = str(tmp_path / "t")
    t = tt.TxnTable.create(spark, root, _rows(spark, [(1, "a", 1)]))

    class RacedByConstraint(tt.TxnTable):
        def _stage(self, df, stats_col=None):
            out = super()._stage(df, stats_col=stats_col)
            if not getattr(self, "_raced", False):
                self._raced = True
                tt.TxnTable(self.root).add_constraint(
                    spark, "k_cap", "k < 100"
                )
            return out

    with pytest.raises(ValueError, match="k_cap"):
        RacedByConstraint(root).append(spark, _rows(spark, [(500, "big", 1)]))
    # the constraint commit won; the violating append never landed
    assert {r.k for r in t.read(spark).collect()} == {1}
    assert t.manifest()["constraints"] == {"k_cap": "k < 100"}


def test_txn_restore(spark, tmp_path):
    """RESTORE commits the target's files/schema/stats/uniqueness/
    constraints as a NEW forward version (bad versions stay
    time-travelable), refuses expired targets, and never rolls back
    the exactly-once stream watermarks."""
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    t = TxnTable.create(
        spark,
        str(tmp_path / "t"),
        _rows(spark, [(k, f"v{k}", 1) for k in range(1, 9)]),
        keys=["k"],
    )
    t.add_constraint(spark, "k_pos", "k > 0")          # v2
    t.commit_stream_batch(spark, _rows(spark, [(9, "s", 1)]), "app", 5)  # v3
    t.delete(spark, "k <= 4")                          # v4 (the "bad" op)
    good = _read(spark, t, version=3)

    v = t.restore(3)
    assert v == 5 and t.manifest()["op"] == "restore"
    assert _read(spark, t) == good
    assert t.manifest()["key_unique_on"] is None  # v3 was post-append
    assert t.manifest()["constraints"] == {"k_pos": "k > 0"}
    # the bad version is still readable history
    assert _read(spark, t, version=4) != good
    # watermarks did NOT roll back: the replayed batch is still a no-op
    assert t.last_committed_batch("app") == 5
    assert t.commit_stream_batch(
        spark, _rows(spark, [(9, "s", 1)]), "app", 5
    ) is None

    # restoring to a PRE-constraint version rolls the invariant back
    t.restore(1)
    assert t.manifest()["constraints"] == {}
    assert t.manifest()["key_unique_on"] == ["k"]

    t.expire_snapshots(keep_last=2)
    with pytest.raises(FileNotFoundError, match="expired"):
        t.restore(1)


def test_txn_change_feed(spark, tmp_path):
    """changes(): keyed snapshot diff emits insert / delete / both
    update images, requires manifest-proven key-uniqueness on BOTH
    ends, compares on the common non-key columns across an
    evolve_schema, and is empty for identical versions."""
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    base = _rows(spark, [(1, "a", 1), (2, "b", 1), (3, "c", 1)])
    t = TxnTable.create(spark, str(tmp_path / "t"), base, keys=["k"])
    t.merge(
        spark,
        _rows(spark, [(2, "B", 2), (4, "d", 1)]),
        keys=["k"],
        version_col="ver",
    )
    t.delete(spark, "k = 1")

    got = sorted(
        (r.k, r._change_type, r.v)
        for r in t.changes(spark, ["k"], 1, 3).collect()
    )
    assert got == [
        (1, "delete", "a"),
        (2, "update_postimage", "B"),
        (2, "update_preimage", "b"),
        (4, "insert", "d"),
    ]
    assert t.changes(spark, ["k"], 2, 2).count() == 0
    # defaulting v_to to latest
    assert sorted(
        (r.k, r._change_type) for r in t.changes(spark, ["k"], 2).collect()
    ) == [(1, "delete")]

    # uniqueness gate: an appended (unproven) snapshot refuses
    t.append(spark, _rows(spark, [(9, "z", 1)]))
    with pytest.raises(ValueError, match="key-unique"):
        t.changes(spark, ["k"], 1)

    # across an evolution: compare on the common columns only
    t2 = TxnTable.create(spark, str(tmp_path / "t2"), base, keys=["k"])
    t2.evolve_schema(spark, [("score", "double")])
    wide = spark.createDataFrame(
        [(3, "C", 2, 0.5)], "k long, v string, ver long, score double"
    )
    t2.merge(spark, wide, keys=["k"], version_col="ver")
    got2 = sorted(
        (r.k, r._change_type, r.v)
        for r in t2.changes(spark, ["k"], 1, 3).collect()
    )
    assert got2 == [(3, "update_postimage", "C"), (3, "update_preimage", "c")]
    cols = t2.changes(spark, ["k"], 1, 3).columns
    assert cols == ["k", "v", "ver", "_change_type"], cols


def test_txn_sync_merge_not_matched_by_source_delete(spark, tmp_path):
    """MERGE … WHEN NOT MATCHED BY SOURCE THEN DELETE: the committed
    snapshot holds exactly the source's key set (latest-wins per
    key); sync mode forces the full rewrite even when the selective
    gate would otherwise engage — a non-intersecting file is exactly
    one whose rows must all be deleted."""
    from stock_market_data_pipeline_v2_spark.sources.txn_table import TxnTable

    base = _rows(spark, [(k, f"v{k}", 1) for k in range(1, 33)])
    t = TxnTable.create(spark, str(tmp_path / "t"), base, keys=["k"])
    t.optimize(spark, cluster_col="k", n_files=4)
    m_opt = t.manifest()

    src = _rows(spark, [(1, "V1", 2), (2, "v2", 0), (99, "new", 1)])
    v = t.merge(
        spark,
        src,
        keys=["k"],
        version_col="ver",
        zone_map_col="k",
        when_not_matched_by_source="delete",
    )
    m = t.manifest(v)
    assert not (set(m_opt["files"]) & set(m["files"])), "sync = full COW"
    assert m["key_unique_on"] == ["k"]
    got = {r.k: r.v for r in t.read(spark).collect()}
    # 1 updated (higher ver), 2 kept (existing ver wins), 99 inserted,
    # every other key deleted
    assert got == {1: "V1", 2: "v2", 99: "new"}

    with pytest.raises(ValueError, match="only 'delete'"):
        t.merge(
            spark,
            src,
            keys=["k"],
            version_col="ver",
            when_not_matched_by_source="update",
        )
