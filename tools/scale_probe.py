"""Scale probe: synthesize an M× corpus from an existing SF dir and
time the data-bound operator families on it — the local evidence that
plan shapes stay sub-quadratic as the corpus grows (the 100 TB
extrapolation argument in docs/SCALE.md).

The synthesis is deterministic and dedup-aware:
- documents: M near-duplicate copies (each copy appends one distinct
  token, so the near-dup family sees M-sized duplicate clusters —
  candidate volume grows M×N×(M-1)/2, the worst case a duplicated
  corpus produces, NOT an artifact-free easy case);
- embeddings: M copies with a per-copy deterministic offset on one
  dimension (near-identical vectors stress the ANN bucket occupancy);
- events: M copies shifted by one hour per copy (extends the time
  span, so the gap-fill grid and session windows grow too);
- lineitem: M plain copies with re-keyed orderkeys (for the TPC-H
  aggregate path).

Usage: python tools/scale_probe.py [multiplier] [src_sf_dir]
Writes parquet under /tmp/scale_probe_mult<M>/ and prints one JSON
line {"multiplier": M, "rows": {...}, "queries": {name: sec}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from free_etl_spark.session import get_spark
from free_etl_spark.tables import load_table
import free_etl_spark.queries as q

PROBE_QUERIES = [
    # near-dup family (candidate volume is the scale risk)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_containment",
    "text_boilerplate_lines",
    # ANN family (bucket occupancy is the scale risk)
    "sim_ann_lsh",
    "sim_ivf_topk",
    "sim_pq_topk",
    "dedup_embedding_cosine",
    # corpus-shuffle text ops
    "text_unigram_logprob",
    "text_entropy_ttr",
    # events / relational
    "events_sessionize",
    "events_gap_fill",
    "tpch_q1_pricing_summary",
    # r5 wave-3: iterative-graph + robust stats + streaming CDC apply
    # (distillation / percentile pass / merge rewrite are the
    # data-bound parts; the rank/recursion iterations are
    # aggregate-sized and should stay flat as the corpus grows)
    "graph_pagerank_2iter",
    "graph_reachability_rcte",
    "events_winsorized_stats",
    "events_welch_ttest",
    "streaming_cdc_upsert",
    # r5 wave-5: duplicated-span volume scales with the planted M-way
    # duplicate clusters (worst case for the span-frequency shuffle);
    # bigram LM joins grow with bigram vocabulary; triangle/LPA
    # distill the grown event log but iterate over aggregates; CMS is
    # vocabulary-bound; the as-of tolerance mask is a projection
    "dedup_substring_spans",
    "text_bigram_lm_score",
    "graph_triangle_count",
    "graph_label_propagation",
    "agg_heavy_hitters_cms",
    "emb_outlier_zscore",
    "join_asof_tolerance_events",
    # r7 wave: the fuzzy-decontamination band probe and IVF append
    # scale with corpus bands / batch size; percentile cut + reservoir
    # exercise the prefix/two-phase-top-R forms; also-bought's pair
    # join is the co-occurrence quadratic risk (basket-capped); SCD2
    # and DAU/WAU/MAU grow with user-days; audio energy is the
    # map-only linearity check; bloom prescreen is map-side probe
    "text_contamination_fuzzy",
    "sim_ivf_append",
    "text_quality_percentile_cut",
    "sample_reservoir_per_group",
    "orders_also_bought",
    "events_scd2_intervals",
    "events_dau_wau_mau",
    "multimodal_audio_energy",
    "dedup_bloom_prescreen",
    # r10 wave: canonical-URL dedup is map+agg (linearity check); the
    # IVF family rides the shared nearest-centroid relation (K=sqrt(N)
    # growth); frame dedup's DF cap must drop the M-way duplicated
    # class frames (the boilerplate path) while text-copy frames pair;
    # fertility joins the per-lang vocabulary against the merged fit
    "dedup_url_canonicalize",
    "sim_range_search",
    "sim_ivf_recall_curve",
    "sim_ivf_build_stats",
    "multimodal_caption_align",
    "multimodal_frame_phash_dedup",
    "text_bpe_fertility_by_lang",
    "sample_epoch_mix_schedule",
]


def synthesize(spark, src: str, dst: str, mult: int) -> dict:
    os.makedirs(dst, exist_ok=True)
    rows = {}

    docs = load_table(spark, src, "documents")
    n_docs = docs.count()
    copies = spark.range(mult).select(F.col("id").alias("copy"))
    big_docs = (
        docs.crossJoin(F.broadcast(copies))
        .select(
            (F.col("doc_id") + F.col("copy") * n_docs).alias("doc_id"),
            # each copy appends one distinct token -> copies are
            # near-dups of each other, not byte-dups
            F.concat(
                F.col("text"), F.lit(" copyof"), F.col("copy").cast("string")
            ).alias("text"),
            "lang",
            "source",
            (F.col("n_chars") + 8).alias("n_chars"),
        )
    )
    big_docs.write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))
    rows["documents"] = n_docs * mult

    emb = load_table(spark, src, "embeddings")
    n_emb = emb.count()
    big_emb = (
        emb.crossJoin(F.broadcast(copies))
        .select(
            (F.col("vec_id") + F.col("copy") * n_emb).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: (
                    x + F.when(i == 0, F.col("copy").cast("float") * 1e-3)
                    .otherwise(F.lit(0.0))
                ).cast("float"),
            ).alias("embedding"),
            "label",
        )
    )
    big_emb.write.mode("overwrite").parquet(os.path.join(dst, "embeddings.parquet"))
    rows["embeddings"] = n_emb * mult

    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    n_ev = ev.count()
    big_ev = (
        ev.crossJoin(F.broadcast(copies))
        .select(
            (F.col("event_id") + F.col("copy") * n_ev).alias("event_id"),
            (F.col("ts") + F.col("copy") * F.expr("interval 1 hour")).alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    )
    big_ev.write.mode("overwrite").parquet(os.path.join(dst, "events.parquet"))
    rows["events"] = n_ev * mult

    li = spark.read.parquet(os.path.join(src, "lineitem.parquet"))
    n_li = li.count()
    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    big_li = li.crossJoin(F.broadcast(copies)).select(
        (F.col("l_orderkey") + F.col("copy") * (max_ok + 1)).alias("l_orderkey"),
        *[c for c in li.columns if c != "l_orderkey"],
    ).drop("copy")
    big_li.write.mode("overwrite").parquet(os.path.join(dst, "lineitem.parquet"))
    rows["lineitem"] = n_li * mult

    # remaining tables: straight copies so load_table finds them
    for t in ["region", "nation", "customer", "supplier", "part", "orders"]:
        spark.read.parquet(os.path.join(src, f"{t}.parquet")).write.mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{t}.parquet"))
    return rows


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    # optional trailing query names restrict the probe (re-probing one
    # family at a higher multiplier without re-timing the heavy ones)
    subset = [a for a in sys.argv[3:] if a in q.QUERIES]
    dst = f"/tmp/scale_probe_mult{mult}"
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(dst, "lineitem.parquet")):
        shutil.rmtree(dst, ignore_errors=True)
        rows = synthesize(spark, src, dst, mult)
    else:
        rows = {}
    timings = {}
    for name in subset or PROBE_QUERIES:
        t0 = time.time()
        q.QUERIES[name](spark, dst).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    print(json.dumps({"multiplier": mult, "rows": rows, "queries": timings}))


if __name__ == "__main__":
    main()
