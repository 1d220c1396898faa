"""Skew-safe per-group top-k (operators/skew.topk_per_group_salted)
and row-level table reconciliation (sources/tools.table_diff).
Registered-query parity is covered in test_oracle_parity; these pin
exactness under ties, the empty-diff identity, and bucket pruning."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hadoop_3_3_6_spark.operators.skew import topk_per_group_salted
from hadoop_3_3_6_spark.session import load_table
from hadoop_3_3_6_spark.sources.tools import table_diff


def test_topk_salted_equals_single_window_with_ties(spark):
    # heavy ties: value has only 3 distinct levels, so the k boundary
    # cuts through tie groups — the tiebreak column must decide
    # identically in both forms
    rows = [(i % 4, i % 3, i) for i in range(1000)]
    df = spark.createDataFrame(rows, "g int, v int, id int")
    got = topk_per_group_salted(df, ["g"], "v", k=5, tiebreak_col="id", num_salts=8)
    w = Window.partitionBy("g").orderBy(F.col("v").desc(), F.col("id").asc())
    want = df.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_topk_salted_ascending(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    got = topk_per_group_salted(
        ev, ["event_type"], "value", k=3, tiebreak_col="event_id", ascending=True
    )
    w = Window.partitionBy("event_type").orderBy(F.col("value").asc(), F.col("event_id").asc())
    want = ev.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
    assert sorted((r.event_type, r.event_id, r.rank) for r in got.collect()) == sorted(
        (r.event_type, r.event_id, r.rank) for r in want.collect()
    )


def test_table_diff_identical_tables_is_empty(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    diff = table_diff(orders, orders, ["o_orderkey"], ["o_totalprice", "o_orderstatus"])
    assert diff.count() == 0


def test_table_diff_classifies_and_prunes(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    # one removed, one changed, one added — everything else untouched
    rm_key, ch_key = [r.o_orderkey for r in orders.select("o_orderkey").orderBy("o_orderkey").limit(2).collect()]
    b = (
        orders.filter(F.col("o_orderkey") != rm_key)
        .withColumn(
            "o_totalprice",
            F.when(F.col("o_orderkey") == ch_key, F.col("o_totalprice") + 1).otherwise(
                F.col("o_totalprice")
            ),
        )
    )
    added = orders.limit(1).withColumn("o_orderkey", F.lit(-42).cast("bigint"))
    diff = table_diff(orders, b.unionByName(added), ["o_orderkey"], ["o_totalprice", "o_orderstatus"])
    got = {(r.o_orderkey, r.diff_status) for r in diff.collect()}
    assert got == {(rm_key, "removed"), (ch_key, "changed"), (-42, "added")}


def test_table_diff_null_safe_keys_and_payload(spark):
    a = spark.createDataFrame([(1, "x"), (2, None), (3, "z")], "k int, v string")
    b = spark.createDataFrame([(1, "x"), (2, None), (3, "w")], "k int, v string")
    diff = table_diff(a, b, ["k"], ["v"])
    assert [(r.k, r.diff_status) for r in diff.collect()] == [(3, "changed")]


def test_table_diff_detects_null_column_swap(spark):
    """Regression: multi-arg xxhash64 skips NULL arguments, so a value
    moving between columns via a null swap used to produce identical
    row digests and the changed row vanished from the diff.  Null
    position is now digest-relevant."""
    a = spark.createDataFrame([(1, "v", None), (2, "p", "q")], "k int, c1 string, c2 string")
    b = spark.createDataFrame([(1, None, "v"), (2, "p", "q")], "k int, c1 string, c2 string")
    got = {(r.k, r.diff_status) for r in table_diff(a, b, ["k"], ["c1", "c2"]).collect()}
    assert got == {(1, "changed")}


def test_topk_randomized_python_reference(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    rows = [
        (int(g), int(v), int(i))
        for i, (g, v) in enumerate(zip(rng.integers(0, 6, 500), rng.integers(0, 20, 500)))
    ]
    df = spark.createDataFrame(rows, "g long, v long, id long")
    got = sorted((r.g, r.id, r.rank) for r in topk_per_group_salted(df, ["g"], "v", k=4, tiebreak_col="id", num_salts=5).collect())
    want = []
    by_g = {}
    for g, v, i in rows:
        by_g.setdefault(g, []).append((v, i))
    for g, vs in by_g.items():
        for rank, (v, i) in enumerate(sorted(vs, key=lambda t: (-t[0], t[1]))[:4], 1):
            want.append((g, i, rank))
    assert got == sorted(want)


def test_similarity_rank_topk_equals_single_window_both_modes(spark):
    """The r8 similarity rank stage (_rank_topk) must be row-AND-rank
    identical to the naive single window it replaced, in BOTH modes:
    score-descending (cosine tiers) and distance-ascending (ADC tier).
    Randomized scores with deliberate duplicates exercise the tie path
    the exactness argument rests on ((order, neighbor_id) total order
    per probe)."""
    import numpy as np

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from hadoop_3_3_6_spark.functions.similarity import _rank_topk

    rng = np.random.default_rng(23)
    rows = [
        (int(p), int(n), float(s) / 4.0)  # /4 -> many exact ties
        for p, n, s in zip(
            rng.integers(0, 8, 600), range(600), rng.integers(0, 40, 600)
        )
    ]
    df = spark.createDataFrame(rows, "probe_id long, neighbor_id long, score double")
    for ascending in (False, True):
        got = sorted(
            map(tuple, _rank_topk(df, 5, "score", ascending=ascending).collect())
        )
        direction = F.col("score").asc() if ascending else F.col("score").desc()
        w = Window.partitionBy("probe_id").orderBy(direction, F.col("neighbor_id").asc())
        want = sorted(
            map(
                tuple,
                df.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 5)
                .collect(),
            )
        )
        assert got == want, f"ascending={ascending}"


def test_table_diff_randomized_python_reference(spark):
    import numpy as np

    rng = np.random.default_rng(19)
    a_rows = {int(k): int(v) for k, v in zip(rng.choice(300, 150, replace=False), rng.integers(0, 50, 150))}
    b_rows = dict(a_rows)
    removed = list(a_rows)[:10]
    for k in removed:
        del b_rows[k]
    changed = list(b_rows)[:12]
    for k in changed:
        b_rows[k] = b_rows[k] + 1000
    added = [int(k) for k in rng.choice(500, 8, replace=False) + 1000]
    for k in added:
        b_rows[k] = 1
    a = spark.createDataFrame(list(a_rows.items()), "k long, v long")
    b = spark.createDataFrame(list(b_rows.items()), "k long, v long")
    got = {(r.k, r.diff_status) for r in table_diff(a, b, ["k"], ["v"], num_buckets=32).collect()}
    want = (
        {(k, "removed") for k in removed}
        | {(k, "changed") for k in changed}
        | {(k, "added") for k in added}
    )
    assert got == want


def test_table_diff_randomized_with_nulls(spark):
    """Randomized two-nullable-column reconciliation: python reference
    with null-aware equality — guards the (value, is-null) digest
    encoding against every random mix of null placements, including
    cross-column null swaps."""
    import numpy as np

    rng = np.random.default_rng(23)

    def gen(n):
        rows = {}
        for k in rng.choice(400, n, replace=False):
            c1 = None if rng.random() < 0.3 else int(rng.integers(0, 5))
            c2 = None if rng.random() < 0.3 else int(rng.integers(0, 5))
            rows[int(k)] = (c1, c2)
        return rows

    a_rows = gen(200)
    b_rows = dict(a_rows)
    ks = list(a_rows)
    for k in ks[:15]:
        del b_rows[k]  # removed
    for k in ks[20:45]:  # perturb (may coincide with original -> no diff)
        c1, c2 = b_rows[k]
        if rng.random() < 0.5:
            b_rows[k] = (c2, c1)  # null/value swap across columns
        else:
            b_rows[k] = (None if rng.random() < 0.4 else int(rng.integers(0, 5)), c2)
    for k in range(1000, 1010):
        b_rows[k] = (1, None)  # added

    a = spark.createDataFrame([(k, *v) for k, v in a_rows.items()], "k long, c1 int, c2 int")
    b = spark.createDataFrame([(k, *v) for k, v in b_rows.items()], "k long, c1 int, c2 int")
    got = {(r.k, r.diff_status) for r in table_diff(a, b, ["k"], ["c1", "c2"], num_buckets=16).collect()}
    want = set()
    for k in set(a_rows) | set(b_rows):
        if k not in b_rows:
            want.add((k, "removed"))
        elif k not in a_rows:
            want.add((k, "added"))
        elif a_rows[k] != b_rows[k]:
            want.add((k, "changed"))
    assert got == want
