#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of representative queries.

The plan IS the product at 100 TB — this artifact lets a reviewer read the
chosen physical strategies (pushdown, broadcast vs SMJ, bucketing, partition
pruning, codegen spans) without running anything. Regenerate after plan-
affecting changes: ``python tools/dump_plans.py``.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"

# query -> one-line "what to look for"
SHOWCASE = {
    "q1_pricing_summary": "filter pushed to parquet scan; single partial+final agg; whole-stage codegen",
    "q3_shipping_priority": "optimizer-chosen broadcast of filtered customer; TakeOrderedAndProject top-k",
    "q5_region_revenue": "nation/region broadcast by hint, customer/supplier by size; one fact-fact shuffle",
    "q7_volume_shipping": "5-way join, nation dims broadcast, disjunctive pair filter as join residual",
    "q17_small_quantity_revenue": "correlated subquery decorrelated to aggregate-then-join",
    "q21_suppliers_kept_waiting": "EXISTS/NOT EXISTS as left_semi/left_anti with non-equi residuals",
    "bucketed_join_revenue": "bucketed SMJ: NO Exchange, NO Sort below the join",
    "partition_pruned_scan": "PartitionFilters prune event_type directories before IO",
    "events_topk_users": "TakeOrderedAndProject (heap top-k), no global sort",
    "asof_latest_order_per_event": "as-of join as union + last(ignorenulls) window — one shuffle",
    "range_join_event_pairs": "interval join bucketized to an equi-join on (key, bucket)",
    "dedup_minhash_lsh": "signature pipeline evaluated once; groupBy-bucket pair expansion, no self-join",
    "dedup_simhash_md5": "pure-expression 60-bit signature; banded blocking; bit_count verify",
    "rollup_daily_to_monthly": "two-level aggregation: daily partials reused for monthly",
    "rollup_incremental_merge": "MV refresh: pushed delta cutoff + stored-partials merge, no history rescan",
    "embedding_pq_codes": "PQ encode: literal codebook, zero-shuffle codegen row work",
    "transitive_closure_depth": "recursive closure as log-depth pointer-doubling self-joins",
    "skew_join_salted": "hot key fanned over 16 salts; dim replicated; shuffle-hash join",
    "corpus_quality_pipeline": "dedup window + map-side filters + partial-agg audit in one plan",
    "lm_trigram_score": "trigram explode, model join, 1-row total broadcast",
    "zorder_box_query": "2-D box folded into z-prefix PartitionFilters; residual predicates inside",
    "sequence_packing": "two-level parallel prefix sum: per-block window + tiny block-offset broadcast",
    "passthrough_route_relational": "pure-DataFrame lifecycle: broadcast control joins; per-batch running count as two-level prefix over time buckets (no one-task-per-batch window)",
    "dedup_passage_shingles": "shingle occurrences md5-keyed; partial-agg dup counts; only duplicated keys join back — O(total shingles), no pair explosion",
    "dedup_semantic_ivf": "broadcast centroid assignment; within-cell equi-join pairing only (SemDeDup bound)",
    "mixture_token_budget": "two-level prefix over hash-prefix buckets; no one-task-per-source window",
    "bm25_keyword_search": "map-side tf columns; 1-row stats broadcast; TakeOrderedAndProject top-k",
    "quality_repetition_filters": "per-doc n-gram stats as array lambdas — zero shuffle, pure codegen",
    "boilerplate_coverage": "one df aggregation; tiny boilerplate list broadcast back onto the scan",
    "set_similarity_prefix_join": "prefix-filtered candidate join on rare tokens only; exact array_intersect verify",
    "decontam_bloom_prefilter": "8 KiB literal bloom bitmap probed in codegen; exact-confirm semi-join after",
    "max_concurrent_sessions": "sweep line: intra-day running sums + one-row-per-day offset broadcast",
    "equi_depth_histogram": "two-level cumulative histogram; 9-value boundary literal; map-side binning",
    "events_ewma_blocked": "blocked linear recurrence: per-block windows + 3-lag carry, bounded exponents",
    "column_profile_stats": "melted two-phase NDV: (col,value) explode collapses map-side to distinct pairs (r6: 2.7x over the Expand multi-distinct form); base stats stay one scan",
    "dedup_containment_removal": "df-capped inverted-index candidates; one-sided containment bound prune; exact array verify; per-removed-doc keeper window",
    "tfidf_shingle_cosine_pairs": "idf-weighted posting-list pair expansion — hot shingles zero-weight by definition, so candidates = nonzero-dot pairs exactly",
    "bfs_hops_from_hub": "level-synchronous BFS: per-hop equi-join + anti-join, frontiers localCheckpointed to truncate plan lineage",
    "char_entropy_quality": "26 in-row length-difference terms; zero shuffle before the TakeOrdered top-k",
    "frequent_triples_apriori": "L2 self-join candidates pruned by downward closure before any triple counting",
    "ann_ivf_durable_topk": "on-disk IVF index: PartitionFilters list only the probed cells' directories — the unprobed corpus is zero-IO at planning time",
    "ann_ivfpq_durable_topk": "codes-only index scan (no raw vectors) pruned to probed cells; codebook-literal decode + ADC in codegen; exact rerank joins the corpus just for the shortlist",
    "custom_source_batch_envelope": "Python Data Source scan: 8 planned InputPartitions feeding a partial+final aggregate",
    "welch_t_event_values": "one grouped moment pass; |types|-row theta self-join for all pairwise tests",
    "holt_winters_level_trend": "blocked 2x2 matrix recurrence: literal A-power weight arrays, plain groupBy block sums, 4-lag carry window per key",
    "rfm_customer_segments": "melted single boundary job: dim in every partition key, banded two-level prefix sums, literal boundary binning",
    "pagerank_supplier_coparts": "3 unrolled join+aggregate power iterations; broadcast degrees; persisted edge list",
    "hybrid_search_rrf": "two TakeOrderedAndProject channel cuts; rank windows only over the 50-row results; full-outer fusion join",
    "pmi_cooccurrence_topk": "in-row skip-gram pair construction; broadcast vocabulary joins; 1-row corpus-totals broadcast",
    "seasonal_decompose_additive": "per-key centered 24h frame; broadcast hour-of-day/series means; densified grid join",
    "multimodal_arrow_byte_stats": "MapInArrow node — Arrow-tier Python, no pandas conversion, pure map",
    "stream_rate_limiter_backlog": "Lindley queue as reflected prefix sums: two ordered windows over the (hours x types) streamed table, densified grid join",
    "community_label_propagation": "2 unrolled mode-propagation rounds: labels-join-edges + per-node rank; persisted mutual-kNN edge subtree shared with pagerank",
    "zonemap_pruned_revenue": "file-skipping read: scan lists ONLY the manifest-surviving files (2/16 at sf0.01); exact predicate re-pushed to the parquet reader",
    "quantile_sketch_value_by_type": "one map-side-combined (type,bin) count; readout windows over the ~98-bin grid, never rows",
    "hll_cardinality_portable": "register build = one grouped max over the hashed scan; harmonic sum = integer shift-left aggregate over the types x 1024 grid",
    "ann_nprobe_recall_sweep": "single max-nprobe candidate materialization; sweep points are explode+filter (no re-scan); per-(nprobe,qid) rank windows over tiny candidates",
    "ann_pq_depth_recall_sweep": "ONE reranked max-depth ADC shortlist; depth points are explode+filter (no second rerank); per-(depth,qid) rank windows over the tiny reranked set",
    "ann_ivf_trained_topk": "probes resolved from sidecar centroids (literal-array posexplode — no corpus E-step on the read path); index scan partition-pruned to probed cells (PartitionFilters on cell)",
    "table_checksum_integrity": "md5-prefix row hashes in codegen; BIT_XOR partial-agg per bucket (map-side combine); 16-row join",
    "window_navigation_showcase": "single Window node computing the whole navigation set per customer partition — one shuffle, no global sort",
    "pca_power_iteration": "unrolled 64-term dot in whole-stage codegen (no array lambdas); one posexplode groupBy carrying dim-cardinality partials",
    "bootstrap_ci_event_values": "32-replica multiplier bootstrap in ONE pass: bounded explode, partial-agg per (type, replica), rank-based CI",
    "ohlc_hourly_bars": "single partial-aggregated groupBy; open/close as struct min/max with field extraction — no window, no sort",
    "attribution_last_touch": "union + last_value(struct) IGNORE NULLS running window — one shuffle, no purchase-touch self-join",
    "ann_sq8_adc_topk": "SQ8 quantize∘decode as map-side array lambdas (codegen, zero Python); broadcast query set; partial WindowGroupLimit pushes the shortlist cut map-side before the one qid shuffle; exact rerank joins raw vectors only for the shortlist",
    "ann_ivf_filtered_topk": "metadata predicate evaluated on the CANDIDATE side inside probed cells (codegen filter directly above the assignment scan, before any distance work) — never post-filtering an underfilled top-k",
}


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    qs = entry.queries()
    out = [
        "# PLANS — physical plans of representative queries (auto-generated)",
        "",
        f"Regenerate with `python tools/dump_plans.py` (sf dir: {SF}).",
        "Each section notes what the plan is supposed to show; grep the plan",
        "text below it to confirm.",
        "",
    ]
    for name, claim in SHOWCASE.items():
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out += [f"## {name}", "", f"**Claim:** {claim}", "", "```", plan.rstrip(), "```", ""]
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote PLANS.md with {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
