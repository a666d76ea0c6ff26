"""Generate PLANS.md: formatted physical plans + extracted scale
evidence for the headline queries.

For each audited query we record:
- the operator tree (the compact section of ``explain('formatted')``),
- every parquet-scan detail line showing PushedFilters / ReadSchema
  (is the filter/projection reaching the scan?),
- join strategies used, and the number of shuffle Exchanges.

Run: ``python tools/plan_audit.py`` (rewrites PLANS.md).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")

#: query -> one-line why-this-plan-scales note
AUDITED = {
    "q1_pricing_summary": "single scan, pushed timestamp filter, map-side partial agg",
    "nation_pair_revenue": "broadcast dims (nation), AQE picks fact-fact strategy",
    "preagg_join_order_totals": "aggregate BEFORE the join: shuffle carries totals, not line items",
    "topk_parts_per_brand": "window partitioned by brand — no global sort",
    "top_tokens": "orderBy().limit() compiles to TakeOrderedAndProject (per-partition top-k)",
    "dedup_minhash_lsh": "banded candidate join — O(near-dups), never all-pairs",
    "decontaminate_docs": "bench shingle set broadcast; corpus side map-side to one per-doc count",
    "unigram_lm_score": "top-V vocab broadcast; rounded+DECIMAL sums for order-independence",
    "embed_quantize_int8": "pure map-side expression — zero Exchanges",
    "sample_stratified": "one CASE filter over the scan — no shuffle, no join",
    "ingest_dedup": "batch vs history: equi-joins on hash/band keys; history text never re-scanned",
    "profile_customer": "all per-column aggs in ONE job (Expand for exact distincts; approx mode = HLL, no Expand)",
    "dedup_paragraphs": "winner per paragraph-hash is min(struct) aggregate — skew-safe, no Window",
    "snapshot_diff_orders": "map-side row hashes; one narrow pk shuffle per side; O(changes) output",
    "fk_orphan_report": "all FKs in one fact scan: broadcast left-joins + single-row agg, no fact shuffle",
    "dedup_semantic": "bucketed pair join + component labeling touch only dup docs; corpus labeled in one left join",
    "sample_temperature_mix": "count agg (stratum-cardinality rows) -> broadcast hex cutoffs -> map-side filter; corpus never shuffles",
    "url_canonical_dedup": "regex canonicalization in codegen; one shuffle on canonical key with map-side partials",
    "sql_surface_revenue": "SQL front-end shares Catalyst: same broadcast/pushdown plan as the DataFrame twin",
    "incremental_rollup_orders": "history scanned once; each batch folds O(rollup-rows) partials — DECIMAL sums merge exactly in any order",
    "expectations_orders": "all quality checks in ONE aggregate over one fact scan; FK dims broadcast as null markers",
    "duplicate_spans_docs": "window hashing map-side (tokens materialized pre-lambda); shuffles carry only hashes + flagged positions",
    "skew_report_events": "per-key counts with map-side partials; top slice is TakeOrderedAndProject — no global sort",
    "q3_shipping_priority": "filters pushed to all 3 scans; decimal partial aggs; top-10 = TakeOrderedAndProject",
    "ann_topk_ivf_probe4": "broadcast centroids assign cells map-side; probe side = n_probe rows/query (broadcast); search is one equi-join on cell id",
    "ann_topk_multitable": "multi-table OR: table id folded into ONE equi-join key; candidate pairs dedup in a group-by — never all-pairs",
    "dedup_keep_best": "clusters read from the session-shared materialized pair/cluster stage (build-once, leaf scan here); clustered/singleton split keeps the corpus map-side — labels, winners, and the anti-join are all broadcast; winner per cluster = one max(struct) aggregate over the small side (skew-safe under hot dup clusters)",
    "embed_pq_codes": "PQ encode is pure map-side: per-subvector argmin over a literal codebook (parse-cached) — zero Exchanges, codes are 8 small ints per vector",
    "bigram_lm_score": "top-V unigram+bigram tables broadcast; per-doc score = one explode + codegen'd sum of rounded DECIMAL log-probs — order-independent merges",
    "ann_ivf_cells": "the flat-IVF index build: broadcast codebook, map-side literal-expression argmax, zero corpus shuffles; materialized once per session and served to the whole ann_topk_ivf family",
    "ann_ivf2_cells": "two-level index build: coarse assignment reused from the flat stage; sub-codebook CASE is parse-cached and the (vid, coarse, sub) relation checkpointed — later searches are leaf scans",
    "quality_quantile_filter": "one exact-percentile agg -> one-row broadcast threshold -> map-side filter; corpus never shuffles (percentile_approx at 100 TB)",
    "export_tar_manifest": "deterministic key%n shard cols; ONE repartition shuffle then per-task streamed tar writes inside mapInPandas",
    "zorder_key_orders": "O(1) min/max agg feeds literal bounds; Morton key is pure codegen bit math — no UDF, no shuffle",
    "corpus_to_training_shards": "score/filter/tokenize map-side; pack = per-shard window (no global sort); export = one repartition; tokens ride keep_cols so the UDF runs once",
    "chunk_token_stream_docs": "per-shard window cumsum; docs explode map-side into only the sequences they overlap; ONE (shard,seq) group-by reassembles",
    "sample_by_perplexity_bucket": "scoring explode is the only corpus shuffle; quartile thresholds broadcast; bucket+sample are one map-side CASE filter",
    "pack_sequences": "per-shard window (no global sort); running sum materialized ONCE — Catalyst does not CSE window exprs, so deriving bin+offset from a single _cum column keeps the Window node to one aggregate",
    "ann_topk_ivf2": "two bounded codebooks give k1*k2 effective cells; assignment is map-side literal-expression argmax (zero corpus shuffles); search = one equi-join on the composite (coarse, sub) key",
    "corpus_curate": "clusters from the session-shared stage (leaf scan); O(dup-docs) drop-list broadcast keeps the corpus anti-join map-side; pack = per-shard window",
    "ann_topk_ivf_pq": "candidate scan reads (vid, cell, codes) — never raw vectors; ADC = broadcast per-query LUTs + element_at lookups; exact re-rank joins full vectors for O(rerank*queries) rows",
    "hard_negatives": "IVF candidate plan with the near-dup cosine ceiling filtered BEFORE ranking — the false-negative guard costs nothing extra",
    "sample_cluster_balanced": "map-side cluster assignment (zero shuffles) + one count agg; per-cluster md5 thresholds broadcast back — corpus never shuffles for the sample decision",
    "decontaminate_fuzzy_docs": "bench band table broadcast; corpus pays ONE signature pass (explode + codegen min aggs) + a broadcast equi-join — never all-pairs",
    "quality_zscore_by_source": "one scoring pass + stratum-cardinality agg broadcast back; z computed map-side",
    "dedup_remove_runs_exact": "same single coverage explode + (doc, tpos) aggregation as the window policy — owner protection folds in as max(own) on the same shuffle",
    "q5_local_supplier_volume": "region/nation/supplier dims broadcast and prune before any fact shuffle; DECIMAL revenue partials merge order-independently",
    "q10_returned_items": "quarter+returnflag filters pushed to both fact scans; top-20 = TakeOrderedAndProject, no global sort",
    "dedup_remove_runs": "O(dup-volume) explode: only FLAGGED window positions explode into (doc, tpos) coverage; per-doc gaps-and-islands is a doc-partitioned window (no global sort); removal rebuild touches only docs that had a span",
    "quality_repetition": "one explode of the combined token+2-gram stream -> (doc, w, gram) count -> per-doc max: two shuffles, both map-side partial-aggregated and keyed per document (no hot key); dup_line_frac is a pure per-row array expression riding the same scan",
    "embed_pq_codes": "PQ index build stage for the family: seeded codebooks collected once (bounded n_codes rows), encode = map-side literal argmax; the (vid, codes) relation is session-shared (stage_cache) so ann_topk_ivf_pq reuses this exact build",
    "html_extract_text": "HTML -> text + link density as ONE map-side projection (regex cascade inside codegen, zero Exchanges) — at 100 TB this pipelines into the WARC scan",
    "corpus_blocklist_filter": "policy wordlist rides the plan as a literal IN-list; one map-side pass over tokens, no shuffle, keep/drop fully auditable per doc",
    "audio_mel_features": "decode + STFT + mel filterbank all inside one mapInPandas pass (Arrow-batched); per-file rows stay in their input partition — zero Exchanges before the bounded summary agg",
    "audio_resample_16k": "decode + polyphase windowed-sinc resample in one Arrow-batched mapInPandas pass; numpy-vectorized per clip, tap table cached per executor — zero Exchanges, embarrassingly parallel over the binary column",
    "image_neardup_pairs": "dHash computed per image map-side; near-dup candidates via banded-hamming equi-join on 16-bit bands — O(colliding pairs), never all-pairs",
    "audio_neardup_pairs": "spectral fingerprint per clip map-side (decode+resample+FFT in one mapInPandas pass); pair search is the same banded-hamming equi-join as the image stage — O(colliding pairs), never all-pairs",
    "video_neardup_pairs": "per-frame dHash map-side; frame-level banded-hamming equi-join + distinct-frame rollup to video pairs — O(colliding frame pairs), hot hashes bounded by the distinct rollup",
    "unigram_tokenize_corpus": "one word-count shuffle; EM + prune run driver-side on the bounded Zipf head (TakeOrderedAndProject, never the corpus); Viterbi apply is map-side with broadcast vocab + word cache — zero extra Exchanges",
    "warc_extract_text": "WARC blobs fan out to records in one mapInPandas pass; HTTP split + HTML->text are map-side column work pipelined behind it — zero Exchanges, the shape of a 1000-executor crawl scan",
    "quality_classifier_scores": "each GD round = two map-side-combined shuffles (per-doc score, per-bucket gradient) + a <=513-row weight collect; weights broadcast back — the corpus is never driver-side",
    "entity_pagerank": "one dst-keyed shuffle per iteration (contributions map-side combined), single-row dangling aggregate, flat lineage via per-round localCheckpoint — nothing but that scalar is ever collected",
    "ppjoin_exact_pairs": "prefix filter bounds the candidate join to ~(1-t)*|d| rarity-ordered features per doc (hot tokens sit outside every prefix); per-doc window, no global sort; verification touches candidates only — lossless recall without all-pairs",
    "bm25_search": "query-term isin filter prunes the exploded tokens before any shuffle; doc stats broadcast as one row; top-k = TakeOrderedAndProject",
    "dp_release_counts": "one groupBy shuffle; the seeded Laplace noise is a pure column expression over the (group-cardinality-sized) aggregate — codegen, no UDF, nothing collected",
    "q4_order_priority": "EXISTS = LEFT SEMI with the non-equi lateness predicate in the join condition; orders quarter-pruned at the scan — one orderkey shuffle",
    "q8_market_share": "ECONOMY part + ASIA customer prune both fact sides via broadcast BEFORE the orders-lineitem shuffle; numerator/denominator are sibling DECIMAL partials in one aggregate",
    "q13_customer_distribution": "left join keeps zero-order customers (filter in the JOIN condition, not WHERE); per-customer count groups on the join key so the shuffle is shared",
    "q18_large_volume_customers": "HAVING subquery and outer agg share one grouped child — per-order quantity computed once; customer broadcasts onto survivors; top-100 = TakeOrderedAndProject",
    "q19_disjunctive_revenue": "the FULL brand/size/quantity disjunction is pushed per-table to both parquet scans (row-group pruning on every OR arm); part broadcasts",
    "q21_waiting_orders": "EXISTS/NOT EXISTS de-correlated into one grouped pass per (order, supplier) + one per order — no probe joins, no window; blame filter is two scalar compares",
    "ivm_join_orders_customer": "delta algebra: each batch joins only dF x D_new (broadcast) + F_old x dD (broadcast dim delta) — history never rejoined wholesale, the view accumulates as unions of per-batch deltas",
    "gapfill_monthly_revenue": "spine = broadcast cross of two tiny relations (bounds x nations); fact aggregates once; running total is a nation-partitioned window — no global sort at any history length",
    "dup_graph_triangles": "edges from the session-shared minhash stage (leaf scan); oriented 3-way self-join over a<b edges counts each triangle once — input already O(near-dups), never all-pairs",
    "embed_pca_whiten": "fit = one mapInPandas pass reducing each partition to a (count, sum, Gram) row (driver merges #partitions rows); apply = zip_with/aggregate literal folds inside whole-stage codegen, zero Exchanges",
    "bloom_prefilter_revenue": "8 KiB bitmap from one bit_or aggregate; probe = literal-array bit math in the orders-side Filter BEFORE any join; exact join after keeps semantics",
    "entity_resolution_customers": "blocking (nation x 15-char name prefix) bounds the candidate self-join BEFORE levenshtein; components touch only linked ids (hash-min over O(dup) edges); golden-record rollup is one grouped pass; the label join carries NO broadcast hint — AQE broadcasts while dup volume is small and degrades to SMJ instead of OOM on a pathological dup rate",
    "ann_topk_ivf_trained": "Lloyd's rounds: assignment is broadcast-centroid map-side math; per-(cell,dim) means get map-side partial aggregation (never collect_list of vectors); per-round localCheckpoint keeps lineage flat — the NON-VACUOUS per-iteration plan is captured pre-checkpoint below",
    "minhash_calibration": "exact Jaccard computed ONLY for LSH candidate pairs (rides the session-shared banded pair stage); per-pair shingle intersection is an equi-join with map-side partials; estimate bucketing is a codegen CASE",
    "cms_heavy_hitters": "the sketch is 2048 mergeable counter rows (depth 4 x width 512) built in one grouped pass with map-side combine; point estimates = min over the 4 depth rows; the exact top-20 compare rides the same scan",
    "audio_mfcc_stack": "decode + mel + DCT + delta/delta-delta stack in ONE Arrow-batched mapInPandas pass — per-clip rows never leave their input partition; the only shuffle is the bounded fingerprint summary",
    "multimodal_real_decode": "embarrassingly parallel mapInPandas over the binary column, zero Exchanges; per-codec kernel cost is split out by bench.py's codec_breakdown so one kernel regression cannot hide in the aggregate wall",
    "dedup_ngram_jaccard": "shingle pair candidates via the ubiquity-capped equi-join (never all-pairs); per-pair exact Jaccard is one grouped intersection count",
    "decontaminate_containment": "bench shingles broadcast WITH their set sizes; corpus explodes once and stays map-side until the matched-pair group-by — bounded by shared-shingle volume, never |bench| x |corpus|",
    "dedup_simhash": "64-bit simhash is pure codegen bit math over token hashes (no UDF); near-dup candidates via 16-bit banded equi-join — O(colliding pairs), never all-pairs; hamming verify is one xor+popcount per candidate",
    "sql_recursive_reachability": "WITH RECURSIVE executor: per-round work is the FRONTIER delta only (distinct + anti-join vs accumulated), localCheckpoint keeps lineage flat; rounds bounded by graph diameter, never row count",
    "sql_asof_attribution": "tier-3 ASOF executor delegates to the union+last-over-window operator (r10): one shuffle on the equi-keys, per-key window sort, ZERO pair inflation — the physical plan has no join node at all",
}

#: iterative queries whose loop bodies localCheckpoint: the final plan
#: truncates to Scan ExistingRDD, so the engine captures the plan
#: PRE-checkpoint (planhook.capture in the loop) and the audit emits it.
ITER_LABELS = {
    "entity_pagerank": ["pagerank_iteration"],
    "ann_topk_ivf_trained": ["kmeans_iteration"],
    "quality_classifier_scores": ["logreg_gradient_round"],
}


def formatted_plan(df) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def evidence(plan: str) -> list[str]:
    out = []
    joins = sorted(set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin)", plan)))
    out.append(f"joins: {', '.join(joins) or 'none'}")
    n_ex = len(re.findall(r"\bExchange\b", tree_section(plan, max_lines=10**6)))
    out.append(f"shuffle exchanges in tree: {n_ex}")
    pushed = [ln.strip() for ln in plan.splitlines() if "PushedFilters" in ln]
    for ln in pushed:
        if "[]" not in ln:
            out.append(ln[:140])
    schemas = [ln.strip() for ln in plan.splitlines() if "ReadSchema" in ln]
    for ln in schemas[:4]:
        out.append(ln[:140])
    if "TakeOrderedAndProject" in plan:
        out.append("TakeOrderedAndProject: per-partition top-k, no global sort partition")
    return out


def tree_section(plan: str, max_lines: int = 40) -> str:
    """The compact operator tree (before the numbered-node details)."""
    lines = plan.splitlines()
    tree = []
    for ln in lines:
        if ln.startswith("(1)"):
            break
        tree.append(ln.rstrip())
    tree = [t for t in tree if t]
    if len(tree) > max_lines:
        tree = tree[:max_lines] + [f"... ({len(tree) - max_lines} more nodes)"]
    return "\n".join(tree)


def main() -> int:
    from data_migration_etl_scripts_spark import get_spark, planhook
    from data_migration_etl_scripts_spark import queries as q

    spark = get_spark(app_name="plan_audit")
    planhook.enable()  # record pre-checkpoint iteration plans
    all_q = q.all_queries()
    captured: dict[str, str] = {}
    parts = [
        "# PLANS — physical-plan audit (auto-generated by tools/plan_audit.py)",
        "",
        f"Plans captured at `{SF_DIR}`; shapes are data-size-independent "
        "(AQE may re-pick join strategies at runtime — that is the point).",
        "",
    ]
    for name, note in AUDITED.items():
        df = all_q[name](spark, SF_DIR)
        p = formatted_plan(df)
        captured.update(planhook.drain())
        parts.append(f"## {name}")
        parts.append("")
        parts.append(f"**Why this scales:** {note}")
        parts.append("")
        parts.append("**Evidence:**")
        for ev in evidence(p):
            parts.append(f"- `{ev}`")
        parts.append("")
        parts.append("```")
        parts.append(tree_section(p))
        parts.append("```")
        parts.append("")
        for label in ITER_LABELS.get(name, []):
            cap = captured.get(label)
            if cap is None:
                parts.append(f"_pre-checkpoint capture `{label}` missing!_")
                parts.append("")
                continue
            parts.append(
                f"**Per-iteration plan (pre-checkpoint, `{label}`)** — the "
                "final plan above ends at the checkpoint's `Scan "
                "ExistingRDD`; this is one real loop-body plan:"
            )
            parts.append("")
            parts.append("**Evidence:**")
            for ev in evidence(cap):
                parts.append(f"- `{ev}`")
            parts.append("")
            parts.append("```")
            parts.append(tree_section(cap))
            parts.append("```")
            parts.append("")
        print(f"audited {name}")
    with open(OUT, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
