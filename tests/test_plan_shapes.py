"""Physical-plan regression guards: the properties that keep the engine
fast at 100 TB must be visible in the executed plans at any scale.

These assert on `.explain` output — if a refactor silently turns a
broadcast join into a shuffle or breaks filter pushdown, these fail long
before a cluster run would reveal it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR
from clinical_trials_data_pipeline_analyis_spark.operators.skew import (
    salted_count,
    salted_count_distinct,
)
from clinical_trials_data_pipeline_analyis_spark.suite import spark_queries


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _analyzed_optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    """Predicates on scans must appear as PushedFilters in the parquet
    scan (Catalyst pushdown, SURVEY §4)."""
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection must not read all lineitem columns."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(df)
    scan_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in scan_schema and "l_quantity" in scan_schema
    assert "l_comment" not in scan_schema and "l_shipdate" not in scan_schema


def test_mapping_join_broadcasts(spark):
    """q03's mapping lookup must be a broadcast hash join, never a
    shuffled join (J1 scale contract)."""
    df = spark_queries()["q03_mapping_standardize"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_date_spine_join_broadcasts(spark):
    """Role-playing date-dimension joins broadcast the spine (J4)."""
    df = spark_queries()["q10_star_role_playing_dates"](spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2


def test_silver_studies_is_single_projection(spark):
    """The whole silver cleaner must collapse to one Project over the
    scan — no shuffles, no extra stages (E2 lifecycle contract)."""
    from clinical_trials_data_pipeline_analyis_spark.plans import silver_studies
    from clinical_trials_data_pipeline_analyis_spark.schemas import STUDIES_SCHEMA

    bronze = spark.createDataFrame([], STUDIES_SCHEMA)
    out = silver_studies(bronze)
    optimized = _analyzed_optimized(out)
    assert "Exchange" not in optimized and "Join" not in optimized
    # exactly one Project node over the relation
    assert optimized.count("Project") == 1


def test_topk_plans_take_ordered(spark):
    """ORDER BY + LIMIT must plan TakeOrderedAndProject, not a global
    sort (O1 scale contract)."""
    df = spark_queries()["q02_priority_frequency_topk"](spark, SF_DIR)
    assert "TakeOrderedAndProject" in _plan(df)


def test_whole_stage_codegen_covers_cleaner(spark):
    """The categorizer projection must run inside whole-stage codegen
    (the `*(n)` prefix in the executed plan marks codegen'd operators)."""
    df = spark_queries()["q04_category_case_chain"](spark, SF_DIR)
    plan = _plan(df)
    assert "*(1) Project" in plan or "WholeStageCodegen" in plan


def test_salted_count_matches_plain(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["count"]
        for r in salted_count(df, ["l_returnflag"]).collect()
    }
    want = {
        r["l_returnflag"]: r["count"]
        for r in df.groupBy("l_returnflag").count().collect()
    }
    assert got == want


def test_salted_count_distinct_matches_plain(spark):
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    got = {
        r["l_returnflag"]: r["distinct_count"]
        for r in salted_count_distinct(df, ["l_returnflag"], "l_partkey").collect()
    }
    want = {
        r["l_returnflag"]: r["cnt"]
        for r in df.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("cnt"))
        .collect()
    }
    assert got == want


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned writes must prune at the source: a filter on
    the partition column shows up as PartitionFilters on the scan, so at
    100 TB a day's query reads a day's files, not the table."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("p")
    )
    df.write.mode("overwrite").partitionBy("p").parquet(str(tmp_path / "t"))
    back = spark.read.parquet(str(tmp_path / "t")).filter(F.col("p") == 3)
    assert back.count() == 20
    plan = _plan(back)
    part_filters = plan.split("PartitionFilters")[1][:120]
    assert "p#" in part_filters and "= 3" in part_filters, plan


def test_simhash_candidates_has_no_nested_loop_join(spark):
    """SimHash pair generation must be hash equi-joins on the 16-bit
    halves (union of two), never an OR-join that Spark can only plan as
    a BroadcastNestedLoopJoin / cartesian product."""
    df = spark_queries()["a23_dedup_simhash_pairs"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the two banded equi-joins are hash joins
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_quantize_plan_is_row_local(spark):
    """int8 quantization must plan as scan -> project/generate with no
    join, no aggregate, and (round 10) NO exchange: the explode is the
    output format, not a join feed, so parallelism comes from the scan's
    splits — a repartition here would shuffle the whole embedding table
    at corpus scale for zero benefit (it was ~60% of a29's sf0.1 wall)."""
    df = spark_queries()["a29_embedding_quantize"](spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert "Exchange" not in plan


def test_pq_encode_codebook_is_broadcast(spark):
    """PQ encode must cross the corpus with a BROADCAST codebook — the
    argmin window is the only shuffle; a shuffled codebook join or a
    nested-loop would not survive a 100 TB corpus."""
    df = spark_queries()["a32_pq_encode"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_pq_adc_join_is_broadcast_on_codes(spark):
    """ADC search touches the codes table with one broadcast LUT join —
    query cost must not involve any embedding-array math on the corpus
    side (no nested loop, LUT broadcast)."""
    df = spark_queries()["a33_pq_adc_topk"](spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivfpq_plan_broadcasts_all_small_sides(spark):
    """IVFADC search: probes, candidate pairs, and the LUT must all be
    broadcast; the corpus-sized codes/assignment tables may never feed a
    nested loop. (The only allowed CartesianProduct-ish shape is the
    centroid crossJoin, which is itself a broadcast.)"""
    for name in ("a38_ivfpq_topk", "a43_ivfpq_residual_topk"):
        df = spark_queries()[name](spark, SF_DIR)
        plan = _plan(df)
        assert "CartesianProduct" not in plan, name
        # The only nested loops allowed are the broadcast centroid
        # cross-scorings (corpus x centroids, queries x centroids):
        # every BNLJ must be an explicit Cross with the centroids
        # broadcast — an Inner BNLJ would mean a join condition
        # degenerated to a filter.
        bnlj = [l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l]
        assert all("Cross" in l for l in bnlj), name
        # Probe restriction, candidate cut, and LUT are all hash joins.
        assert plan.count("BroadcastHashJoin") >= 4, name


def test_repetition_features_crafted(spark):
    """Hand-computable fixture: signals must match exact hand counts."""
    from clinical_trials_data_pipeline_analyis_spark.operators.repetition import (
        repetition_features,
    )

    docs = spark.createDataFrame(
        [
            (1, "a a a b"),          # runs: aaa,b -> max_run 3; bigrams: aa,aa,ab -> top 2/3
            (2, "x y x y"),          # max_run 1; bigrams: xy,yx,xy -> top 2/3
            (3, "solo"),             # 1 token: no bigrams -> frac 0
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_features(docs).collect()}
    assert rows[1]["max_run"] == 3
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["distinct_ratio"] == 0.5
    assert abs(rows[1]["top_bigram_frac"] - 2 / 3) < 1e-6
    assert rows[2]["max_run"] == 1
    assert abs(rows[2]["top_bigram_frac"] - 2 / 3) < 1e-6
    assert rows[3]["max_run"] == 1
    assert rows[3]["top_bigram_frac"] == 0.0
    assert rows[3]["distinct_ratio"] == 1.0


def _semantic_blocked(spark):
    from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
        ivf_assign,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") % 97 == 0)
    assigned = ivf_assign(emb, cent)
    return (
        emb.select(F.col("vec_id"), F.col("embedding").alias("vec"))
        .join(
            assigned.select(
                "vec_id", "centroid_id", F.col("cosine").alias("cos_centroid")
            ),
            "vec_id",
        )
        .localCheckpoint()
    )


def test_semantic_dedup_large_path_is_cell_keyed_shuffle(spark):
    """Past the broadcast limit, the SemDeDup pair scan must be a
    cell-keyed shuffle join: no BroadcastNestedLoopJoin, no cartesian,
    and no single-partition Exchange — the round-3 finding was an
    unconditional full-corpus broadcast that caps at the broadcast
    threshold; this pins the scale path that replaces it."""
    from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
        semantic_pair_candidates,
    )

    blocked = _semantic_blocked(spark)
    pairs = semantic_pair_candidates(blocked, 0.95, broadcast_limit=0)
    plan = _plan(pairs)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" not in plan  # the point: NOT broadcast
    assert "Exchange SinglePartition" not in plan
    # both sides hash-partitioned on the cell key, >1 partition
    assert "hashpartitioning(cell_a" in plan
    assert "hashpartitioning(cell_b" in plan


def test_semantic_dedup_small_path_broadcasts(spark):
    """Below the limit the measured-fastest broadcast plan is kept."""
    from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
        semantic_pair_candidates,
    )

    blocked = _semantic_blocked(spark)
    pairs = semantic_pair_candidates(blocked, 0.95)
    assert "BroadcastHashJoin" in _plan(pairs)


def test_semantic_dedup_paths_agree(spark):
    """Broadcast and cell-keyed paths must produce identical dedup
    decisions end-to-end (same components, same kept flags)."""
    from clinical_trials_data_pipeline_analyis_spark.operators.similarity import (
        semantic_dedup,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent = emb.filter(F.col("vec_id") % 97 == 0)
    small = semantic_dedup(emb, cent, 0.95)
    large = semantic_dedup(emb, cent, 0.95, broadcast_limit=0)
    key = lambda r: (r["vec_id"], r["component"], r["cos_centroid"], r["kept"])
    assert sorted(map(key, small.collect())) == sorted(map(key, large.collect()))


def test_pii_redaction_is_row_local(spark):
    """PII scrub must be a pure codegen projection: no join, no
    aggregate, no exchange — regexp chains stay row-local."""
    df = spark_queries()["a51_pii_redaction"](spark, SF_DIR)
    plan = _plan(df)
    assert "Join" not in plan
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert "Exchange" not in plan


# ---------------------------------------------------------------------
# Registry-wide sweep (VERDICT r04 ask #3): the anti-patterns this
# engine polices must be absent from EVERY registered query's physical
# plan — a standing guard, not a per-operator spot check.
# ---------------------------------------------------------------------

#: Queries allowed to carry the Arrow-vectorized Python crossing
#: (mapInPandas): the multimodal decode/resize/frame-sample family,
#: where the per-batch pandas transform IS the operator. Nothing else
#: may cross into Python.
_ARROW_ALLOWED = {
    "a27_multimodal_resize",
    "a28_multimodal_frames",
    "x15_multimodal_metadata",
}

#: Queries allowed a non-Cross BroadcastNestedLoopJoin: x19's range
#: join is an inequality join (value BETWEEN lo AND hi) — no equi-key
#: exists, and the broadcast build side keeps it one pass over the big
#: side. Every other BNLJ in the registry must be an explicit Cross
#: with a broadcast build (the centroid/query cross-scorings).
_NON_CROSS_BNLJ_ALLOWED = {"x19_range_join"}


@pytest.mark.parametrize("name", sorted(spark_queries()))
def test_registry_plan_has_no_antipatterns(spark, name):
    """No row-at-a-time Python, no scalar-pandas eval outside the
    multimodal family, no CartesianProduct, and every nested-loop join
    is an intentional broadcast Cross (or the allowlisted broadcast
    range join) — for every registered query."""
    df = spark_queries()[name](spark, SF_DIR)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "ArrowEvalPython" not in plan, f"{name}: scalar pandas UDF"
    if name not in _ARROW_ALLOWED:
        assert "MapInPandas" not in plan, f"{name}: unexpected Python crossing"
        assert "FlatMapGroupsInPandas" not in plan, f"{name}: unexpected Python crossing"
    assert "CartesianProduct" not in plan, f"{name}: non-broadcast cartesian"
    bnlj_lines = [
        l for l in plan.splitlines() if "BroadcastNestedLoopJoin" in l
    ]
    if name not in _NON_CROSS_BNLJ_ALLOWED:
        bad = [l.strip() for l in bnlj_lines if "Cross" not in l]
        assert not bad, f"{name}: non-Cross nested loop join: {bad}"


def _join_count(plan: str) -> int:
    return sum(
        plan.count(j)
        for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
    )


def test_rhp_verify_is_in_join(spark):
    """rhp_near_duplicates must verify cosine INSIDE the band bucket
    join — exactly ONE join in the plan. The pre-round-10 shape
    (narrow candidates -> distinct -> re-join both vectors) had three,
    and the two vector re-joins shuffled O(candidates x vec_size):
    ~150 GB at the 1M rung, ENOSPC on a geometry whose candidate
    budget passed. See BASELINE '1M rung, round 10'."""
    df = spark_queries()["a53_rhp_embedding_neardup"](spark, SF_DIR)
    plan = _plan(df)
    assert _join_count(plan) == 1, plan


def test_simhash_verify_is_in_join(spark):
    """simhash_near_duplicates: the Hamming verify runs in the two band
    joins' projections (bit_count present), with NO post-candidate
    re-join of fingerprints — exactly TWO candidate-pair joins (lo half,
    hi half). The bucket-size cap probe adds semi-joins that filter
    oversized buckets BEFORE the pair join; those must all be broadcast
    LeftSemi (a pre-filter, never a fingerprint re-join), so they are
    counted separately and pinned to that shape."""
    df = spark_queries()["a26_dedup_simhash_verified"](spark, SF_DIR)
    plan = _plan(df)
    join_lines = [
        l
        for l in plan.splitlines()
        if any(
            j in l
            for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")
        )
    ]
    pair_joins = [l for l in join_lines if "LeftSemi" not in l]
    probe_joins = [l for l in join_lines if "LeftSemi" in l]
    assert len(pair_joins) == 2, plan
    assert all("BroadcastHashJoin" in l for l in probe_joins), plan
    assert "bit_count" in plan


def test_minhash_estimate_is_in_join(spark):
    """x17: the Jaccard estimate is computed in the band join — one
    join, signatures never re-joined onto the candidate stream."""
    df = spark_queries()["x17_dedup_minhash_estimate"](spark, SF_DIR)
    plan = _plan(df)
    assert _join_count(plan) == 1, plan


def test_ngram_jaccard_joins_are_post_aggregation(spark):
    """x07: exactly THREE joins — the per-shingle inverted-index
    self-join plus two size lookups. The invariant that makes three
    acceptable where a candidate re-join is not: the self-join's output
    feeds a partial-combining aggregate IMMEDIATELY (count per pair), so
    the size joins run on the COLLAPSED (doc_a, doc_b, intersection)
    stream — O(distinct surviving pairs) rows of 8-byte payloads, never
    the exploded per-shingle candidate stream. A refactor inserting a
    fourth join (re-joining shingle sets onto candidates) or deferring
    the aggregate fails here."""
    df = spark_queries()["x07_dedup_ngram_jaccard"](spark, SF_DIR)
    plan = _plan(df)
    assert _join_count(plan) == 3, plan


def test_semantic_dedup_verify_is_in_join(spark):
    """a45: exactly TWO joins — the within-cell pair scan (cosine
    verified inside its projection: vectors + norms ride the join
    sides) and the final keep-rank join of components back onto the
    checkpointed blocked frame. A third join would mean the verify
    left the pair scan (the pre-r8 candidate re-join shape)."""
    df = spark_queries()["a45_semantic_dedup"](spark, SF_DIR)
    plan = _plan(df)
    assert _join_count(plan) == 2, plan
