"""Physical-plan contracts — the plan we'd want at 100 TB, asserted.

Correctness tests prove the numbers; these prove the SHAPE: filters reach
the parquet scan, projections prune columns, small dimensions broadcast,
candidate generation never degenerates to a cartesian product, and the
hot relational path stays inside whole-stage codegen. A regression in any
of these is invisible at test scale and catastrophic at cluster scale.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from olr_cdc_oracle_with_dbz_spark.catalog import Catalog
from olr_cdc_oracle_with_dbz_spark.registry import load_all


@pytest.fixture(scope="module")
def reg():
    return load_all()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _full_plan(df) -> str:
    # includes AQE's final plan after an action is unnecessary here: the
    # static physical plan already shows scans/joins/codegen boundaries
    return df._jdf.queryExecution().toString()


def test_filter_pushed_to_parquet_scan(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    df = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    plan = _full_plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30" in plan


def test_projection_prunes_scan_schema(spark, sf_dir):
    li = Catalog(spark, sf_dir).lineitem
    df = li.select("l_orderkey", "l_quantity")
    plan = _full_plan(df)
    schema_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in schema_line and "l_quantity" in schema_line
    assert "l_comment" not in schema_line  # widest column must not be read


def test_dimension_join_broadcasts(spark, sf_dir, reg):
    """q14: nation ⋈ region must be a broadcast join, never a shuffle."""
    plan = _plan(reg["q14_broadcast_join"].spark_fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_fact_join_not_broadcast_on_fact_side(spark, sf_dir):
    """lineitem ⋈ orders: neither 600k-row side may be broadcast at scale;
    locally both fit under the threshold, so pin the contract explicitly
    with hints off — the plan must be a shuffle join when sizes exceed the
    threshold (simulated by disabling auto-broadcast)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        c = Catalog(spark, sf_dir)
        df = c.lineitem.join(c.orders, c.lineitem.l_orderkey == c.orders.o_orderkey)
        plan = _plan(df)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_lsh_candidates_are_equi_join_not_cartesian(spark, sf_dir, reg):
    """l2 minhash banding + l4 ANN: candidate generation must never plan
    a cartesian/BNL all-pairs comparison — l2's banding is an equi-join
    on (band, bucket); l4's bucket matching lives inside its fused
    kernel (r20) with no join at all."""
    for name in ("l2_minhash_lsh", "l4_ann_lsh"):
        plan = _plan(reg[name].spark_fn(spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_flagship_agg_stays_in_codegen(spark, sf_dir, reg):
    """q22 (TPC-H Q1): scan→filter→partial agg must sit inside a
    WholeStageCodegen span, and aggregation must be two-phase hash."""
    df = reg["q22_hash_agg_tpch_q1"].spark_fn(spark, sf_dir)
    df.collect()  # materialize so AQE's final plan (with codegen) exists
    plan = _plan(df)
    # codegen span markers render as `*(n) Operator` in executedPlan text
    assert "*(1) HashAggregate" in plan and "*(1) Filter" in plan
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan  # no Python in the relational path


def test_exact_topk_uses_broadcast_side_for_queries(spark, sf_dir, reg):
    """l3 (r6 shape): the bounded query matrix rides a task broadcast into
    a mapInPandas GEMM+fold kernel; the corpus (the side that is 100 TB in
    production) is never broadcast, joined, or shuffled — the only
    exchanges are the |queries|·k merge window and the final sort."""
    plan = _plan(reg["l3_cosine_topk"].spark_fn(spark, sf_dir))
    assert "MapInPandas" in plan
    assert "Join" not in plan  # no pair materialization of any kind
    assert "BroadcastExchange" not in plan  # corpus never broadcast


def test_compaction_is_single_shuffle_window(spark, sf_dir, reg):
    """q52: latest-per-key compaction = one hash exchange on the PK + one
    window sort; a second exchange would double the dominant cost."""
    plan = _plan(reg["q52_upsert_compaction"].spark_fn(spark, sf_dir))
    pre_sort = plan.split("Sort", 1)[0]
    assert plan.count("Exchange hashpartitioning(id") == 1
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_funnel_and_retention_single_user_shuffle(spark, sf_dir, reg):
    """q21b/q21c: one hash exchange on user_id feeds the whole analysis —
    per-stage self-joins would multiply that at scale."""
    for name in ("q21b_funnel", "q21c_retention"):
        plan = _plan(reg[name].spark_fn(spark, sf_dir))
        assert plan.count("Exchange hashpartitioning(user_id") <= 2, name
        assert "CartesianProduct" not in plan, name


def test_global_topk_is_take_ordered(spark, sf_dir, reg):
    """q36: sort+limit must plan as TakeOrderedAndProject (distributed
    per-partition top-k), never a single-partition full sort of the input."""
    plan = _plan(reg["q36_limit_topk"].spark_fn(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan


def test_minhash_signatures_zero_shuffle(spark, sf_dir):
    """MinHash signatures are a pure per-row map (one fused Arrow kernel:
    shingle hashing from the raw text buffer + the permutation minima) —
    the plan must contain NO exchange at all: signatures cost exactly one
    scan at any corpus size. The kernel must ride Arrow (MapInArrow since
    r20 — the r19 shape was a JVM HOF shingle chain feeding an
    ArrowEvalPython pandas UDF), never the row-pickling BatchEvalPython
    path; its XXH64 arithmetic is pinned bit-identical to the JVM in
    test_llmops."""
    from olr_cdc_oracle_with_dbz_spark.llmops.dedup import minhash_signatures

    docs = Catalog(spark, sf_dir).documents
    plan = _plan(minhash_signatures(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    assert "MapInArrow" in plan  # the fused shingle+permutation kernel


def test_l2d_block_pairs_distributed_no_cartesian(spark, sf_dir, reg):
    """l2d exact cosine near-dup: block-matrix self-join must be a grouped
    applyInPandas over (pi, pj) block pairs — never a cartesian product and
    never a corpus-sized broadcast. This is the shape that replaced the
    round-1 driver-side toPandas() materialization."""
    plan = _plan(reg["l2d_embedding_neardup"].spark_fn(spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastExchange" not in plan  # corpus must not be broadcast


def test_l4b_corpus_never_broadcast_or_shuffled_wide(spark, sf_dir, reg):
    """l4b brute-force top-k: the corpus side streams through mapInPandas
    with only the bounded query matrix broadcast (sc.broadcast, not a plan
    BroadcastExchange); the only exchanges are the corpus repartition and
    the |queries|·k top-k merge."""
    plan = _plan(reg["l4b_bruteforce_matmul"].spark_fn(spark, sf_dir))
    assert "MapInPandas" in plan
    assert "BroadcastExchange" not in plan
    assert "CartesianProduct" not in plan


def test_l2e_partitioning_follows_edge_volume(spark, sf_dir):
    """l2e: the propagation join's parallelism must be derived from measured
    edge volume (the round-2 verdict's scale-sizing ask), not a hard-coded
    local constant — while tiny local graphs keep the 2-partition floor."""
    from olr_cdc_oracle_with_dbz_spark.llmops.dedup import propagation_partitions

    # floor for tiny/empty local graphs (unchanged round-2 behavior)
    assert propagation_partitions(0) == 2
    assert propagation_partitions(1_000) == 2
    assert propagation_partitions(1_000_000) == 2
    # grows ~linearly with the graph at scale
    assert propagation_partitions(5_000_000) == 5
    assert propagation_partitions(1_000_000_000) == 1000
    # ceil, not floor: a straggler tail still gets its own task
    assert propagation_partitions(2_000_001) == 3
    # the dial is honored end-to-end: forcing ~1 edge per task must yield a
    # many-partition propagation frame, and the result must be unchanged.
    # local_max_edges=0 forces the DISTRIBUTED phase (the default finishes
    # driver-side below the two-phase threshold), so this also asserts the
    # two phases agree on the same graph.
    from olr_cdc_oracle_with_dbz_spark.llmops.dedup import l2e_dup_clusters

    base = l2e_dup_clusters(spark, sf_dir).toPandas()
    wide = l2e_dup_clusters(spark, sf_dir, edges_per_task=1, local_max_edges=0).toPandas()
    assert base.equals(wide)


def test_l2e_edge_symmetrization_single_join(spark, sf_dir):
    """l2e: both edge directions must come from ONE evaluation of the
    inverted-index pair join. union(pairs, swap(pairs)) plants the join
    subtree in the physical plan twice — the explode-based symmetrization
    keeps exactly one ShuffledHashJoin."""
    import pyspark.sql.functions as F

    from olr_cdc_oracle_with_dbz_spark.llmops.dedup import _jaccard_pairs

    pairs = _jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    raw = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("doc_a").alias("s"), F.col("doc_b").alias("d")),
                F.struct(F.col("doc_b").alias("s"), F.col("doc_a").alias("d")),
            )
        ).alias("e")
    ).select("e.s", "e.d")
    plan = _plan(raw)
    assert plan.count("ShuffledHashJoin") == 1


def test_q23_multi_distinct_partial_below_exchange(spark, sf_dir, reg):
    """q23: Catalyst's RewriteDistinctAggregates plans N distinct columns
    as Expand → map-side dedup HashAggregate (keys include gid) → Exchange,
    so the shuffle carries |distinct (group, gid, value)| rows, never
    N·|rows| — the N× blow-up is confined to two pipelined operators of
    one stage. Pin both halves: the Expand exists, and the dedup aggregate
    sits BELOW the first exchange (r9 measurement: this form beats every
    manual decomposition — stack+distinct, split-join, encoded-pair)."""
    df = reg["q23_count_distinct"].spark_fn(spark, sf_dir)
    plan = _plan(df)
    assert "Expand" in plan
    # between the LAST exchange above the Expand and the Expand itself
    # there must be a dedup HashAggregate keyed on gid (map-side combine)
    above_expand = plan[: plan.index("Expand")]
    below_last_exchange = above_expand[above_expand.rindex("Exchange") :]
    assert "HashAggregate" in below_last_exchange
    assert "gid" in below_last_exchange


def test_udf_explodes_evaluate_signature_once(spark, sf_dir, reg):
    """l4/l4c (r20 shape): probe + rerank are ONE fused MapInArrow pass
    over the corpus — no signature/assignment ArrowEvalPython projections
    left in the query plan, no cogroup dispatch, and no exchange below
    the kernel (the corpus is never shuffled; only the top-k window and
    presentation sort exchange)."""
    plan_lsh = _plan(reg["l4_ann_lsh"].spark_fn(spark, sf_dir))
    assert "MapInArrow" in plan_lsh
    assert "ArrowEvalPython" not in plan_lsh
    assert "Exchange" not in plan_lsh[plan_lsh.index("MapInArrow") :]
    # l4c: probe + rerank are ONE fused MapInArrow pass over
    # the corpus — no assignment-UDF projections left in the query plan
    # (the Lloyd build's UDFs run at construction), no cogroup dispatch,
    # no exchange below the top-k window, and never a candidate pair-join
    # (r6: the pair-join + per-pair aggregate() dot made approx slower
    # than exact brute force at sf0.1).
    plan_ivf = _plan(reg["l4c_ann_ivf"].spark_fn(spark, sf_dir))
    assert "MapInArrow" in plan_ivf
    assert "ArrowEvalPython" not in plan_ivf
    assert "FlatMapCoGroupsInPandas" not in plan_ivf
    assert "SortMergeJoin" not in plan_ivf and "BroadcastHashJoin" not in plan_ivf
    # the corpus is never shuffled before the kernel: everything below
    # the MapInArrow node is projection/scan only (the plan prints
    # children below their parent, so the kernel's subtree is the text
    # after its node line)
    below_kernel = plan_ivf[plan_ivf.index("MapInArrow") :]
    assert "Exchange" not in below_kernel


def test_range_join_is_banded_equi_join(spark, sf_dir, reg):
    """q18: the 1h range join must run as an equi-join that includes the
    hour-bucket key — a join keyed on user_id alone enumerates a key's
    whole history per probe (quadratic in per-user density at scale)."""
    plan = _plan(reg["q18_range_join"].spark_fn(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the bucket column must participate in the JOIN KEY list itself —
    # "_b in plan" alone is vacuously true when the bucket ends up only in
    # a post-join filter, the exact regression this test guards against
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[[^\]]*_b#", plan
    ), plan


def test_math_funcs_single_pass(spark, sf_dir, reg):
    """q42: scan → project → one range exchange for the presentation sort.
    Anything more (a second scan, an extra exchange, a Python eval node)
    is a plan regression — pinned after the r5→r6 drift investigation
    concluded the timing swing was machine noise, not shape."""
    plan = _plan(reg["q42_math_funcs"].spark_fn(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Exchange") == 1
    assert "Python" not in plan


def test_scalar_subquery_two_scans(spark, sf_dir, reg):
    """q47: the count+sum threshold must come from ONE merged single-row
    aggregate (orders scanned twice total: aggregate + filter). Separate
    scalar subqueries plan three scans — the r6 rewrite this pins."""
    plan = _plan(reg["q47_scalar_subquery"].spark_fn(spark, sf_dir))
    assert plan.count("orders.parquet") == 2, plan.count("orders.parquet")


def test_exact_stats_aggs_hash_only(spark, sf_dir, reg):
    """q26/q27 (r6 integer-moment rework): one scan, hash aggregation
    (long/decimal(38,0) sums stay in HashAggregate — a SortAggregate
    means an accumulator type fell off the hash path). q27 has two
    exchanges (aggregation shuffle + presentation range sort). q26 (r9)
    aggregates over the CO-BUCKETED lineitem — the bucket files satisfy
    the aggregation's distribution, so its input is never exchanged and
    its single exchange is the output-sized presentation sort."""
    for name, n_exchanges in (("q27_stats_aggs", 2), ("q26_having", 1)):
        plan = _plan(reg[name].spark_fn(spark, sf_dir))
        assert "SortAggregate" not in plan, name
        assert plan.count("Exchange") == n_exchanges, (name, plan.count("Exchange"))
    q27 = _plan(reg["q27_stats_aggs"].spark_fn(spark, sf_dir))
    assert q27.count("lineitem.parquet") == 1
    q26 = _plan(reg["q26_having"].spark_fn(spark, sf_dir))
    assert "SelectedBucketsCount: 16 out of 16" in q26  # bucketed scan
    # the one exchange sits on the HAVING-filtered OUTPUT, above the agg
    assert q26.index("Exchange") < q26.index("HashAggregate")


def test_simhash_single_shuffle(spark, sf_dir, reg):
    """l2c: SimHash is a per-document MAP — since r6 the whole signature
    computes inside one mapInPandas pass, so the only exchange allowed is
    the presentation range partitioning. A second exchange means an
    explode/aggregate crept back in."""
    plan = _plan(reg["l2c_simhash"].spark_fn(spark, sf_dir))
    assert "MapInPandas" in plan
    assert plan.count("Exchange") <= 1, plan.count("Exchange")


def test_python_kernels_above_range_exchange(spark, sf_dir, reg):
    """r7 presort pin, r8 static form: for per-doc Python kernels the
    clustering exchange must sit BELOW the kernel (plan prints parents
    first, so the kernel node appears earlier in the string) — an exchange
    ABOVE would re-execute the kernel in its boundary sampler (measured
    3.9 s → 0.6 s for l7 at sf1, r7). Since r8 the exchange is the
    SAMPLE-FREE static-bucket hash exchange on the _srp tag
    (presort_static) — a rangepartitioning exchange anywhere in these
    plans means the sampler came back."""
    for name in ("l7_fingerprint", "l2c_simhash", "l5d_redact_pii",
                 "m2_multimodal_features"):
        plan = _plan(reg[name].spark_fn(spark, sf_dir))
        assert "MapInPandas" in plan, name
        assert "rangepartitioning" not in plan, name
        assert "Exchange hashpartitioning(_srp" in plan, name
        assert plan.index("MapInPandas") < plan.index("Exchange hashpartitioning(_srp"), name


def test_window_family_single_range_exchange(spark, sf_dir, reg):
    """r7 cluster-before-window pin, r8 static form: the window queries and
    the tokenize projections run over ONE exchange that serves both the
    window/agg required distribution and the presentation order. Since r8
    that exchange is the sample-free static-bucket hash exchange on _srp
    (presort_static; window/groupBy keys carry the tag so Catalyst sees
    HashPartitioning(_srp) ⊆ ClusteredDistribution([_srp, key])). A
    SECOND exchange of any kind, or a rangepartitioning one (the sampler),
    is a regression back to double execution."""
    for name in ("q31_ranking", "q32_lag_lead", "q33_frames",
                 "q34_topk_per_group", "q26_having",
                 "l5_text_stats", "l5b_lang_id", "l5c_quality_score",
                 "q45_json_funcs", "q43c_higher_order"):
        plan = _plan(reg[name].spark_fn(spark, sf_dir))
        assert plan.count("Exchange") == 1, (name, plan.count("Exchange"))
        assert "rangepartitioning" not in plan, name
        assert plan.count("Exchange hashpartitioning(_srp") == 1, name


def test_l2d_sort_needs_no_sampling(spark, sf_dir, reg):
    """l2d: the presentation sort's child is the GEMM cogroup — a
    multi-partition range sort would sample it, running every block
    product twice. A single range partition plans no sampling pass."""
    plan = _plan(reg["l2d_embedding_neardup"].spark_fn(spark, sf_dir))
    # repartitionByRange(1, ...) plans as a sample-free SinglePartition
    # exchange; a rangepartitioning exchange here means sampling came back
    assert "Exchange SinglePartition" in plan
    assert "rangepartitioning" not in plan, plan


def test_slot_labels_match_spark_hash(spark):
    """The driver-side Murmur3 in plans/canonical.py must agree with
    Spark's hash() for LongType, or static-bucket partitions land out of
    order. Checked for every partition count the engine uses."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.plans.canonical import (
        _murmur3_long,
        slot_labels,
    )

    probe = list(range(64)) + [2**33 + 7, -5, 2**62]
    rows = spark.createDataFrame([(v,) for v in probe], "v long").select(
        F.col("v"), F.hash("v").alias("h")
    ).collect()
    for r in rows:
        assert _murmur3_long(r.v) == r.h, r.v
    for p in (4, 8, 16):
        labels = slot_labels(p)
        assert [(_murmur3_long(v)) % p for v in labels] == list(range(p))


def test_ordered_static_equals_orderby(spark, sf_dir, reg):
    """ordered_static must reproduce orderBy's exact global row order —
    including NULL keys (first under asc) and keys outside the provided
    bounds (clamped, monotone) — and plan NO rangepartitioning (the
    sampling job is the thing it exists to remove)."""
    from pyspark.sql import functions as F

    from olr_cdc_oracle_with_dbz_spark.plans.canonical import ordered_static

    o = reg and spark.read.parquet(f"{sf_dir}/orders.parquet")
    base = o.select(
        F.when(F.col("o_orderkey") % 11 == 0, None)
        .otherwise(F.col("o_orderkey"))
        .alias("k"),
        "o_custkey",
    )
    want = [tuple(r) for r in base.orderBy("k", "o_custkey").collect()]
    # deliberately WRONG, too-narrow bounds: correctness must not depend
    got_df = ordered_static(base, (100.0, 200.0), "k", "o_custkey")
    assert "rangepartitioning" not in _plan(got_df)
    got = [tuple(r) for r in got_df.collect()]
    assert got == want


def test_sized_partitions_formula():
    """Exchange width tracks data volume: ceil(rows/per), clamped; zero or
    unknown row counts fall back to the lower clamp."""
    from olr_cdc_oracle_with_dbz_spark.plans.canonical import sized_partitions

    assert sized_partitions(0, 100_000) == 8
    assert sized_partitions(-1, 100_000) == 8
    assert sized_partitions(100, 100_000, lo=8) == 8
    assert sized_partitions(1_000_000, 100_000) == 10
    assert sized_partitions(1_000_001, 100_000) == 11  # ceil, not floor
    assert sized_partitions(10**12, 100_000, hi=48) == 48
    assert sized_partitions(4_500_000, 140_000, lo=16) == 33


def test_row_count_matches_actual(spark, sf_dir):
    """catalog.row_count (parquet footer metadata, zero jobs) must agree
    with the actual table row count."""
    from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, row_count

    cat = Catalog(spark, sf_dir)
    for t in ("orders", "lineitem", "region"):
        assert row_count(sf_dir, t) == cat.table(t).count(), t


def test_srp_collision_guards(spark, sf_dir):
    """ADVICE r8: a pre-existing _srp column must not be silently
    overwritten. ordered_static renames its internal tag; presort_static
    (whose tag name is part of the keep_tag contract) refuses loudly."""
    import pytest as _pytest

    from olr_cdc_oracle_with_dbz_spark.catalog import Catalog, key_bounds
    from olr_cdc_oracle_with_dbz_spark.plans.canonical import (
        ordered_static,
        presort_static,
    )

    o = Catalog(spark, sf_dir).orders.withColumn("_srp", F.lit(7))
    bounds = key_bounds(sf_dir, "orders")
    out = ordered_static(o, bounds, "o_orderkey", partitions=4)
    assert "_srp" in out.columns  # the user's column survives
    assert out.filter(F.col("_srp") != 7).count() == 0
    with _pytest.raises(ValueError, match="_srp"):
        presort_static(o, bounds, "o_orderkey")
