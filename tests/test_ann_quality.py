"""ANN quality gates (VERDICT r3 items 4/6): the LSH/IVF
approximations are value-oracled for determinism elsewhere; these
tests pin their QUALITY — recall vs the exact answer, bucket
occupancy, and the partition-pruned probe layout — so a parameter
change that silently degrades the approximation fails here.

All gates are deterministic: md5-derived planes, seed-fixed numpy
corpora, deterministic centroids — the pinned thresholds sit under
measured values (not theory), so a pass is reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest

from free_etl_spark.operators.vectors import lsh_bits, scaled_centroid_k
from free_etl_spark.queries import QUERIES
from free_etl_spark.queries.similarity import lsh_band_keys, lsh_candidate_pairs
from free_etl_spark.tables import load_table
from tests.conftest import SF_DIR


def _corpus():
    t = (
        pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
    )
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    return ids, np.round(En @ En.T, 6)


def test_lsh_planted_near_dup_recall(spark):
    """The quality claim that matters for dedup: vectors that ARE
    near-duplicates (cosine ≥ 0.95) must collide in some band. The
    natural corpus has no such pairs (max cosine 0.479 at this SF),
    so plant 60 of them and require ≥ 90% to surface as candidates
    (measured: 59/60 at 8 bits)."""
    rng = np.random.RandomState(42)
    base = rng.randn(60, 64)
    dup = base + rng.randn(60, 64) * 0.15
    cos = [
        float(b @ d / (np.linalg.norm(b) * np.linalg.norm(d)))
        for b, d in zip(base, dup)
    ]
    assert min(cos) > 0.95  # the construction really is near-dup-grade
    rows = [(i, base[i].tolist()) for i in range(60)] + [
        (1000 + i, dup[i].tolist()) for i in range(60)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, emb array<double>")
    cand = {
        (r.vec_a, r.vec_b)
        for r in lsh_candidate_pairs(emb, lsh_bits(len(rows))).collect()
    }
    recall = sum((i, 1000 + i) in cand for i in range(60)) / 60
    assert recall >= 0.9, recall


def test_lsh_corpus_recall_and_exact_precision(spark):
    """Documented tradeoff on the natural corpus: at the τ=0.4 verify
    threshold the pairs are only weakly similar (max cosine 0.479), so
    sign-LSH recall is intrinsically low — pinned at the measured
    value so a regression (or silent parameter change) is visible.
    Precision is exactly 1.0: the verify stage computes true cosine,
    so every emitted pair must be a true pair."""
    ids, C = _corpus()
    iu = np.triu_indices(len(ids), 1)
    true_pairs = {
        (int(ids[i]), int(ids[j]))
        for i, j, c in zip(iu[0], iu[1], C[iu])
        if c >= 0.4
    }
    found = {
        (r.vec_a, r.vec_b) for r in QUERIES["sim_ann_lsh"](spark, SF_DIR).collect()
    }
    assert found <= true_pairs  # precision 1.0 by construction
    assert len(found & true_pairs) / len(true_pairs) >= 0.10  # measured 0.106


def test_lsh_bucket_occupancy(spark):
    """Corpus-scaled bits keep expected occupancy O(1): at N=500 and
    bits=9 (512 buckets/band) the max bucket held 6 vectors when
    pinned. A fixed-bits regression (e.g. back to 8 while N grows)
    shows up here as occupancy drift."""
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    n = emb.count()
    occ = (
        lsh_band_keys(emb, lsh_bits(n))
        .groupBy("band_id", "band_key")
        .count()
        .agg(F.max("count").alias("mx"))
        .collect()[0]["mx"]
    )
    assert occ <= max(16, n // 16), occ


def test_ivf_recall_at_5(spark):
    """sim_ivf_topk's nprobe=4 probe must recover ≥ 90% of the exact
    cosine top-5 on average (measured 0.92), ≥ 60% for every query."""
    ids, C = _corpus()
    got: dict[int, set[int]] = {}
    for r in QUERIES["sim_ivf_topk"](spark, SF_DIR).collect():
        got.setdefault(r.qid, set()).add(r.cid)
    recalls = []
    for q in range(5):
        qi = int(np.where(ids == q)[0][0])
        order = np.argsort(-C[qi])
        exact = [int(ids[j]) for j in order if ids[j] != q][:5]
        recalls.append(len(got.get(q, set()) & set(exact)) / 5)
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_write_probe_partition_pruning(spark, tmp_path):
    """ivf_write lays the corpus out partitioned by cent_id; a probe
    must be a partition-pruned read — the cent_id predicate appears as
    a PartitionFilter and the executed scan reads only the probed
    cluster directories."""
    from free_etl_spark.operators.vectors import ivf_probe, ivf_write

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    path = str(tmp_path / "ivf")
    cent = ivf_write(emb, path)
    k = scaled_centroid_k(emb.count())
    assert cent.count() == k

    probed = ivf_probe(spark, path, [0, 1])
    assert {r.cent_id for r in probed.select("cent_id").distinct().collect()} <= {0, 1}
    # the cent_id predicate must reach the scan as a PARTITION filter
    # (directory-level pruning), not a data filter. inputFiles() lists
    # the relation's files before pushdown, so inspect the plan.
    plan = probed._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cent_id" in pf[0], plan[:500]


def test_scaled_parameters_monotone():
    """The corpus-scaled formulas behave at the extremes: floors at
    test scale, growth at 100 TB scale, and the 16-bit LSH cap."""
    assert scaled_centroid_k(100) == 16
    assert scaled_centroid_k(500) == 23
    assert scaled_centroid_k(10**9) == 31623
    assert lsh_bits(100) == 8
    assert lsh_bits(500) == 9
    assert lsh_bits(10**9) == 16
    with pytest.raises(TypeError):
        lsh_bits()  # n is required: the parameter must be corpus-derived


def test_hamming_band_pairs_matches_brute_force(spark):
    """The shared hamming-band candidate generator (SimHash text dedup
    + dHash image dedup) must find EXACTLY the brute-force pair set at
    threshold <= bands-1: pigeonhole full recall, and the verify step
    kills band-collision false positives. Signatures are crafted to
    cover every regime: identical, 1-3 bit flips spread across one or
    several bands, just-over-threshold (4 flips), random far pairs,
    and a negative signature (bit 63 set)."""
    import itertools

    from free_etl_spark.operators.hashing import hamming_band_pairs

    base = 0x123456789ABCDEF0
    sigs = [
        (0, base),
        (1, base),                       # hamming 0
        (2, base ^ 0b1),                 # 1 flip, band 0
        (3, base ^ (1 << 17)),           # 1 flip, band 1
        (4, base ^ 0b111),               # 3 flips, same band
        (5, base ^ (1 | 1 << 20 | 1 << 40)),  # 3 flips, 3 bands
        (6, base ^ (1 | 1 << 20 | 1 << 40 | 1 << 60)),  # 4 flips: out
        (7, 0x7EADBEEFCAFEF00D),
        (8, -(1 << 63) | 0x5A5A),        # negative sig (bit 63 set)
    ]

    def to_signed(h):
        return h - (1 << 64) if h >= 1 << 63 else h

    sigs = [(i, to_signed(h & ((1 << 64) - 1))) for i, h in sigs]
    expect = set()
    for (ia, ha), (ib, hb) in itertools.combinations(sigs, 2):
        d = bin((ha ^ hb) & ((1 << 64) - 1)).count("1")
        if d <= 3:
            expect.add((ia, ib, d))
    df = spark.createDataFrame(sigs, "id long, sig long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_band_pairs(df, "id", "sig", 3).collect()
    }
    assert got == expect and len(expect) >= 8
    with pytest.raises(ValueError):
        hamming_band_pairs(df, "id", "sig", 4)  # needs > 4 bands


def test_phash_planted_duplicate_recall(spark, tmp_path):
    """Planted exact-duplicate image payloads must ALL be recovered by
    the banded dHash dedup (hamming 0), and distinct random payloads
    must not merge into the planted cluster below the threshold."""
    import pandas as pd

    from free_etl_spark.operators.multimodal import dhash_images
    from free_etl_spark.operators.hashing import hamming_band_pairs

    planted = b"\x89PNG\r\n\x1a\nSAME-IMAGE-BYTES" * 40
    rows = [(str(i), planted) for i in range(6)] + [
        (str(10 + i), f"unique-image-{i}".encode() * 50) for i in range(30)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["path", "content"])
    )
    sig = dhash_images(df, force_stub=True).withColumn(
        "id", F.col("path").cast("long")
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in hamming_band_pairs(sig, "id", "dhash64", 3).collect()
    }
    import itertools

    planted_pairs = set(itertools.combinations(range(6), 2))
    assert planted_pairs <= pairs  # full recall on planted dups
    # no unique payload joins the planted cluster
    assert not any(a < 6 <= b or b < 6 <= a for a, b in pairs)


def test_ivf_kmeans_codebook_recall(spark, tmp_path):
    """The default ivf_write codebook is now Lloyd-refined (2
    iterations from the deterministic first-K init). The refined
    layout must (a) still hold exactly K centroids (empty clusters
    keep their previous centroid), and (b) give probe recall@5 at
    nprobe=4 at least as good as the quality gate pinned for the raw
    init (avg >= 0.9, per-query >= 0.6)."""
    from free_etl_spark.operators.vectors import (
        centroid_rank,
        ivf_probe,
        ivf_write,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    k = scaled_centroid_k(emb.count())
    path = str(tmp_path / "ivf_kmeans")
    cent = ivf_write(emb, path)  # codebook="kmeans" default
    assert cent.count() == k

    ids, C = _corpus()
    queries = emb.filter(F.col("vec_id") < 5)
    probe_rank = centroid_rank(queries, cent).filter(F.col("rn") <= 4)
    probes = {
        r.vec_id: [] for r in probe_rank.select("vec_id").distinct().collect()
    }
    for r in probe_rank.collect():
        probes[r.vec_id].append(r.cent_id)
    recalls = []
    for q in range(5):
        probed_ids = {
            r.vec_id for r in ivf_probe(spark, path, probes[q]).collect()
        }
        qi = int(np.where(ids == q)[0][0])
        # top-5 among probed vectors vs exact global top-5
        order = np.argsort(-C[qi])
        exact = [int(ids[j]) for j in order if ids[j] != q][:5]
        in_probe = [
            int(ids[j])
            for j in order
            if ids[j] != q and int(ids[j]) in probed_ids
        ][:5]
        recalls.append(len(set(exact) & set(in_probe)) / 5)
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_pq_recall_at_10(spark):
    """sim_pq_topk's ADC shortlist + exact re-rank must recover ≥ 80%
    of the exact cosine top-10 on average (measured 0.88 at this SF:
    [0.9, 0.8, 0.9, 0.9, 0.9]), ≥ 60% for every query. Isotropic
    synthetic vectors are PQ's worst case — clustered real embeddings
    reconstruct far better — so this is a conservative floor."""
    ids, C = _corpus()
    got: dict[int, set[int]] = {}
    for r in QUERIES["sim_pq_topk"](spark, SF_DIR).collect():
        got.setdefault(r.qid, set()).add(r.cid)
    recalls = []
    for q in range(5):
        qi = int(np.where(ids == q)[0][0])
        order = np.argsort(-C[qi])
        exact = [int(ids[j]) for j in order if ids[j] != q][:10]
        recalls.append(len(got.get(q, set()) & set(exact)) / 10)
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_matryoshka_rerank_recall_at_5(spark):
    """sim_matryoshka_rerank's 32-of-64-dim shortlist + exact re-rank
    must recover most of the exact cosine top-5 (measured mean 0.92):
    the prefix is an untrained slice, so demand mean recall ≥ 0.8 and
    every query ≥ 0.6 (the remaining gap documents what MRL training
    buys)."""
    ids, C = _corpus()
    got: dict[int, set[int]] = {}
    for r in QUERIES["sim_matryoshka_rerank"](spark, SF_DIR).collect():
        got.setdefault(r.qid, set()).add(r.cid)
    recalls = []
    for q in range(5):
        qi = int(np.where(ids == q)[0][0])
        order = np.argsort(-C[qi])
        exact = [int(ids[j]) for j in order if ids[j] != q][:5]
        recalls.append(len(got.get(q, set()) & set(exact)) / 5)
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_fuzzy_contamination_planted_recall(spark):
    """Paraphrased-leakage recall: every training doc whose exact
    n-gram Jaccard with some benchmark doc clears 0.9 (the planted
    near-dup grade) must be flagged by the banded-minhash probe —
    brute-force ground truth over the split, computed driver-side at
    test scale."""
    from itertools import product

    from free_etl_spark.queries.dedup import _BENCH_MOD, _shingles

    got = {
        (r.train_doc, r.bench_doc)
        for r in QUERIES["text_contamination_fuzzy"](spark, SF_DIR).collect()
    }
    sh = (
        _shingles(spark, SF_DIR)
        .groupBy("doc_id")
        .agg(F.collect_set("sh").alias("shs"))
        .collect()
    )
    sets = {r.doc_id: set(r.shs) for r in sh}
    bench = [d for d in sets if d % _BENCH_MOD == 0]
    train = [d for d in sets if d % _BENCH_MOD != 0]
    truth = set()
    for t, b in product(train, bench):
        inter = len(sets[t] & sets[b])
        if inter and inter / len(sets[t] | sets[b]) >= 0.9:
            truth.add((t, b))
    assert truth, "corpus lost its planted cross-split near-dups"
    missed = truth - got
    assert not missed, f"fuzzy probe missed planted leakage: {missed}"


def test_ivf_append_findable_and_pruned(spark, tmp_path):
    """ivf_append must (a) leave every committed base part-file
    untouched (append-only), (b) make appended vectors findable via
    the same partition-pruned probe with no index maintenance, and
    (c) assign them with the persisted codebook — no rebuild."""
    import glob as g
    import os

    from free_etl_spark.operators.vectors import (
        centroid_rank,
        ivf_append,
        ivf_probe,
        ivf_write,
        probe_dim,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "ivf")
    cent = ivf_write(base, path)
    before = set(g.glob(os.path.join(path, "cent_id=*", "*.parquet")))

    ret = ivf_append(batch, path)  # codebook read from {path}/_codebook
    after = set(g.glob(os.path.join(path, "cent_id=*", "*.parquet")))
    # append-only: every pre-existing file survives byte-identical in place
    assert before <= after and len(after) > len(before)
    # returned codebook == persisted codebook == the one ivf_write built
    assert {(r.cent_id, tuple(r.cemb)) for r in ret.collect()} == {
        (r.cent_id, tuple(r.cemb)) for r in cent.collect()
    }

    # every appended vector is findable by probing ITS nearest cluster
    asn = (
        centroid_rank(batch, cent, probe_dim(batch))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id")
        .collect()
    )
    by_cluster: dict[int, set] = {}
    for r in asn:
        by_cluster.setdefault(r.cent_id, set()).add(r.vec_id)
    some = sorted(by_cluster)[:3]
    for cid in some:
        got = {
            r.vec_id
            for r in ivf_probe(spark, path, [cid]).select("vec_id").collect()
        }
        assert by_cluster[cid] <= got, (cid, by_cluster[cid] - got)
    # pruning unchanged after append: probe still a PartitionFilters read
    plan = (
        ivf_probe(spark, path, some)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cent_id" in pf[0], plan[:500]


def test_editdistance_qgram_prefix_filter_full_recall(spark):
    """The Ed-Join prefix filter (rarest q*d+1 = 5 bigrams per
    string) must find EVERY pair within edit distance 2 — compare
    against the unfiltered brute-force join on the same names."""
    got = QUERIES["dedup_editdistance_qgram"](spark, SF_DIR)
    got_pairs = {(r.name_a, r.name_b) for r in got.collect()}

    names = load_table(spark, SF_DIR, "part").select(
        F.col("p_name").alias("s")
    ).distinct()
    a = names.select(F.col("s").alias("na"))
    b = names.select(F.col("s").alias("nb"))
    brute = (
        a.join(b, F.col("na") < F.col("nb"))
        .filter(F.levenshtein("na", "nb") <= 2)
        .collect()
    )
    truth = {(r.na, r.nb) for r in brute}
    assert truth, "degenerate fixture: no close pairs"
    assert got_pairs == truth, (
        f"missed={truth - got_pairs} extra={got_pairs - truth}"
    )


def test_ivf_delete_masks_and_compacts(spark, tmp_path):
    """IVF delete lifecycle (VERDICT r10 task 2): (a) ivf_delete is an
    O(batch) tombstone append that touches NO cluster file, yet probes
    stop returning deleted vectors immediately; (b) ivf_compact
    rewrites ONLY the affected partitions, reports per-cluster removal
    counts, retires the tombstone WAL, and leaves probe results
    byte-identical to the masked view; (c) probe recall@5 over the
    SURVIVING corpus stays at the pinned gate (avg >= 0.9, per-query
    >= 0.6) after delete+compact; (d) a half-written stage dir from a
    crashed compaction is discarded, and re-running compaction on a
    clean store is a no-op."""
    import glob as g
    import os

    from free_etl_spark.operators.vectors import (
        centroid_rank,
        ivf_compact,
        ivf_delete,
        ivf_probe,
        ivf_tombstones,
        ivf_write,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    path = str(tmp_path / "ivf")
    cent = ivf_write(emb, path)
    files_before = {
        p: os.path.getmtime(p)
        for p in g.glob(os.path.join(path, "cent_id=*", "*.parquet"))
    }

    # queries survive (none is ≡3 mod 7 among 0,1,2,4,5... pick 0,1,2)
    del_ids = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    deleted = {r.vec_id for r in del_ids.collect()}
    assert deleted and 0 not in deleted

    # assignment BEFORE delete, for per-cluster expectations
    asn = {
        r.vec_id: r.cent_id
        for r in centroid_rank(emb, cent)
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id")
        .collect()
    }
    all_cents = sorted({asn[v] for v in deleted})

    ivf_delete(del_ids, path)
    # (a) no data file touched by the logical delete
    assert files_before == {
        p: os.path.getmtime(p)
        for p in g.glob(os.path.join(path, "cent_id=*", "*.parquet"))
    }
    masked = {
        r.vec_id for r in ivf_probe(spark, path, all_cents).collect()
    }
    assert not (masked & deleted)
    expect_live = {
        v for v, c in asn.items() if c in set(all_cents) and v not in deleted
    }
    assert masked == expect_live

    # (d-1) a stage dir without _SUCCESS (crash during staging write)
    # must be discarded, not swapped in
    stale_stage = f"{path}__compact_stage"
    os.makedirs(os.path.join(stale_stage, "cent_id=999999"))
    open(os.path.join(stale_stage, "cent_id=999999", "junk.parquet"), "w").close()

    # (b) compact: only affected partitions rewritten, report correct
    report = {
        r.cent_id: r.n_removed for r in ivf_compact(spark, path).collect()
    }
    assert not os.path.exists(stale_stage)
    assert not os.path.exists(os.path.join(path, "cent_id=999999"))
    from collections import Counter

    expect_removed = Counter(asn[v] for v in deleted)
    assert report == dict(expect_removed)
    assert ivf_tombstones(spark, path) is None
    untouched = {
        p: m
        for p, m in files_before.items()
        if int(p.split("cent_id=")[1].split(os.sep)[0]) not in report
    }
    now = {
        p: os.path.getmtime(p)
        for p in g.glob(os.path.join(path, "cent_id=*", "*.parquet"))
    }
    assert untouched == {p: m for p, m in now.items() if p in untouched}
    for cid in report:
        stale = [
            p
            for p in files_before
            if f"cent_id={cid}{os.sep}" in p and p in now
        ]
        assert not stale, f"cluster {cid} kept pre-compaction files: {stale}"
    # probe results identical to the masked view, and still pruned
    assert {
        r.vec_id for r in ivf_probe(spark, path, all_cents).collect()
    } == masked
    plan = (
        ivf_probe(spark, path, all_cents[:3])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and "cent_id" in pf[0], plan[:500]

    # (d-2) compaction on a clean store is a no-op
    assert ivf_compact(spark, path).count() == 0

    # (c) recall@5 over SURVIVORS after delete+compact
    ids, C = _corpus()
    queries = emb.filter(F.col("vec_id") < 5)
    probe_rank = centroid_rank(queries, cent).filter(F.col("rn") <= 4)
    probes: dict[int, list[int]] = {}
    for r in probe_rank.collect():
        probes.setdefault(r.vec_id, []).append(r.cent_id)
    recalls = []
    for q in range(5):
        probed_ids = {
            r.vec_id for r in ivf_probe(spark, path, probes[q]).collect()
        }
        assert not (probed_ids & deleted)
        qi = int(np.where(ids == q)[0][0])
        order = np.argsort(-C[qi])
        exact = [
            int(ids[j])
            for j in order
            if ids[j] != q and int(ids[j]) not in deleted
        ][:5]
        in_probe = [
            int(ids[j])
            for j in order
            if ids[j] != q and int(ids[j]) in probed_ids
        ][:5]
        recalls.append(len(set(exact) & set(in_probe)) / 5)
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_recluster_swaps_applies_tombstones_keeps_recall(spark, tmp_path):
    """IVF recluster action (VERDICT r11 task 3): (a) ivf_recluster on
    a drifted store (base build + stale-codebook append + pending
    tombstones) rebuilds the codebook on the CURRENT live corpus,
    APPLIES the tombstones (rebuilt store excludes them, WAL gone),
    regrows K to scaled_centroid_k(N_live), and the promoted layout's
    partitioning equals the fresh assignment exactly; (b) probe
    recall@5 over survivors holds the pinned gate (avg >= 0.9, min >=
    0.6) after the recluster; (c) the crash windows heal: a stale
    stage dir is discarded, and a retired dir with the live dir
    missing (crash between the two swap renames) restores the
    previous store before the rebuild."""
    import os

    from free_etl_spark.operators.vectors import (
        centroid_rank,
        ivf_delete,
        ivf_probe,
        ivf_recluster,
        ivf_tombstones,
        ivf_write,
        ivf_append,
        scaled_centroid_k,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    newb = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "ivf")
    cent_old = ivf_write(base, path)
    ivf_append(newb, path)
    del_ids = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    deleted = {r.vec_id for r in del_ids.collect()}
    ivf_delete(del_ids, path)

    ids, C = _corpus()
    queries = emb.filter(F.col("vec_id") < 5)

    def _recall_at5(cent, nprobe):
        probes: dict[int, list[int]] = {}
        for r in (
            centroid_rank(queries, cent)
            .filter(F.col("rn") <= nprobe)
            .collect()
        ):
            probes.setdefault(r.vec_id, []).append(r.cent_id)
        out = []
        for q in range(5):
            probed = {
                r.vec_id
                for r in ivf_probe(spark, path, probes[q]).collect()
            }
            assert not (probed & deleted)
            qi = int(np.where(ids == q)[0][0])
            order = np.argsort(-C[qi])
            exact = [
                int(ids[j])
                for j in order
                if ids[j] != q and int(ids[j]) not in deleted
            ][:5]
            in_probe = [
                int(ids[j])
                for j in order
                if ids[j] != q and int(ids[j]) in probed
            ][:5]
            out.append(len(set(exact) & set(in_probe)) / 5)
        return out

    # recall of the DRIFTED store (stale codebook + masked tombstones),
    # the recluster's baseline
    pre = _recall_at5(cent_old, 4)

    # (c-1) a junk stage dir from a crashed build must be discarded
    stale_stage = f"{path}__recluster_stage"
    os.makedirs(os.path.join(stale_stage, "cent_id=999999"))
    open(
        os.path.join(stale_stage, "cent_id=999999", "junk.parquet"), "w"
    ).close()

    cent2 = ivf_recluster(spark, path)
    assert not os.path.exists(stale_stage)
    assert not os.path.exists(f"{path}__retired")

    # (a) tombstones applied + WAL retired; live corpus exact
    assert ivf_tombstones(spark, path) is None
    store = spark.read.parquet(path)
    live = {r.vec_id for r in store.select("vec_id").collect()}
    all_ids = {r.vec_id for r in emb.select("vec_id").collect()}
    assert live == all_ids - deleted
    # codebook regrown to the live corpus and layout == fresh assign.
    # Init is first-K-BY-ID (vec_id < K, the oracle-replayable
    # contract): live ids below K that were deleted shrink the
    # codebook by exactly that many cells.
    k_new = scaled_centroid_k(len(live))
    n_cells = len([i for i in live if i < k_new])
    assert cent2.count() == n_cells
    emb_live = emb.join(del_ids, "vec_id", "left_anti")
    expect_asn = {
        (r.vec_id, r.cent_id)
        for r in centroid_rank(emb_live, cent2)
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id")
        .collect()
    }
    got_asn = {
        (r.vec_id, r.cent_id)
        for r in store.select("vec_id", "cent_id").collect()
    }
    assert got_asn == expect_asn

    # (b) recall@5 over survivors under the FRESH codebook, nprobe=4:
    # absolute floors (min >= 0.6, avg >= 0.8) plus the comparative
    # pin — the recluster stays within ONE top-5 neighbor (0.05 avg)
    # of the drifted store it replaced. On a 5-query micro-corpus a
    # single flipped neighbor moves the average by 0.04, so a strict
    # never-loses pin would be noise-driven; the recluster's measured
    # WIN is quantization error + occupancy (pinned by
    # sim_ivf_recluster_gain's `improved` column), not per-query
    # recall at tiny N.
    recalls = _recall_at5(cent2, 4)
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / 5 >= 0.8, recalls
    assert sum(recalls) / 5 >= sum(pre) / 5 - 0.05, (pre, recalls)

    # (c-2) crash between the two swap renames: live dir gone, retired
    # holds the complete previous store — the next recluster restores
    # it first, then completes; the final store is whole either way
    os.rename(path, f"{path}__retired")
    cent3 = ivf_recluster(spark, path)
    assert not os.path.exists(f"{path}__retired")
    store3 = spark.read.parquet(path)
    assert {r.vec_id for r in store3.select("vec_id").collect()} == live
    assert cent3.count() == n_cells


def test_ivfpq_recall_at_10(spark):
    """sim_ivfpq_adc_search (residual PQ over the IVF probe) must
    recover the exact cosine top-10 nearly as well as flat IVF —
    the residual codec + ADC shortlist may only lose a bounded
    amount on top of the probe's own miss rate (measured at this
    SF: min 0.8, mean 0.82 vs flat IVF's 0.92@5)."""
    ids, C = _corpus()
    got: dict[int, set[int]] = {}
    for r in QUERIES["sim_ivfpq_adc_search"](spark, SF_DIR).collect():
        got.setdefault(r.qid, set()).add(r.cid)
    recalls = []
    for q in range(5):
        qi = int(np.where(ids == q)[0][0])
        order = np.argsort(-C[qi])
        exact = [int(ids[j]) for j in order if ids[j] != q][:10]
        recalls.append(len(got.get(q, set()) & set(exact)) / 10)
    assert min(recalls) >= 0.5, recalls
    assert sum(recalls) / len(recalls) >= 0.75, recalls


def test_ivfpq_store_persists_codes_and_append_uses_persisted_codebook(
    spark, tmp_path
):
    """The PQ serving layer must live IN the store (VERDICT r12
    task 2): ivf_write(pq_m=...) persists per-row pq_code
    (array<tinyint>, one code per subspace, every code < C) plus the
    _pq_codebook/_pq_meta.json sidecars; ivf_append encodes arriving
    vectors against the PERSISTED codebook — byte-identical sidecars
    before and after, and the appended rows' codes equal a manual
    pq_encode with that same codebook."""
    import os

    from free_etl_spark.operators.vectors import (
        _residuals,
        ivf_append,
        ivf_write,
        pq_encode,
        pq_meta,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "ivfpq")
    cent = ivf_write(base, path, codebook="first_k", pq_m=8, pq_sub=8, pq_c=64)

    assert pq_meta(path) == {"m": 8, "sub": 8, "c": 64}
    store = spark.read.parquet(path)
    assert dict(store.dtypes)["pq_code"] == "array<tinyint>"
    bad = store.filter(
        (F.size("pq_code") != 8)
        | F.exists("pq_code", lambda c: (c < 0) | (c >= 64))
    ).count()
    assert bad == 0

    cb_before = {
        (r.m, r.c, tuple(r.csub))
        for r in spark.read.parquet(os.path.join(path, "_pq_codebook")).collect()
    }
    ivf_append(batch, path)
    cb_after = {
        (r.m, r.c, tuple(r.csub))
        for r in spark.read.parquet(os.path.join(path, "_pq_codebook")).collect()
    }
    assert cb_before == cb_after  # append never re-fits the codebook

    # appended rows' codes == manual encode against the persisted book
    store2 = spark.read.parquet(path)
    appended = {
        r.vec_id: list(r.pq_code)
        for r in store2.filter(F.col("vec_id") % 10 == 0).collect()
    }
    pq_cb = spark.read.parquet(os.path.join(path, "_pq_codebook"))
    asn = store2.filter(F.col("vec_id") % 10 == 0).select(
        "vec_id", "emb", "cent_id"
    )
    want = {
        r.vec_id: [int(c) for c in r.pq_code]
        for r in pq_encode(_residuals(asn, cent), pq_cb, 8, 8).collect()
    }
    assert appended == want and len(appended) == batch.count()


def test_ivf_recluster_reencodes_pq_layer(spark, tmp_path):
    """Centroids move on recluster ⇒ residuals move ⇒ a PQ-coded
    store must rebuild its residual codebook AND re-encode every
    row, or ADC would score against dead centroids. Pin: after
    ivf_write(first_k, pq) + append + ivf_recluster(kmeans), the
    promoted store's rows, codes, and both codebooks are EXACTLY the
    ones a from-scratch ivf_write(kmeans, pq) on the current corpus
    produces (the whole path is deterministic), and the PQ codebook
    genuinely changed across the swap."""
    import os

    from free_etl_spark.operators.vectors import (
        ivf_append,
        ivf_recluster,
        ivf_write,
        pq_meta,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "ivfpq")
    ivf_write(base, path, codebook="first_k", pq_m=8, pq_sub=8, pq_c=64)
    ivf_append(batch, path)
    cb_stale = {
        (r.m, r.c, tuple(r.csub))
        for r in spark.read.parquet(os.path.join(path, "_pq_codebook")).collect()
    }

    ivf_recluster(spark, path, iters=1)

    assert pq_meta(path) == {"m": 8, "sub": 8, "c": 64}  # params survive
    cb_new = {
        (r.m, r.c, tuple(r.csub))
        for r in spark.read.parquet(os.path.join(path, "_pq_codebook")).collect()
    }
    assert cb_new != cb_stale  # the re-fit actually happened

    fresh = str(tmp_path / "fresh")
    ivf_write(emb, fresh, codebook="kmeans", iters=1, pq_m=8, pq_sub=8, pq_c=64)

    def snap(p):
        return {
            r.vec_id: (r.cent_id, tuple(int(c) for c in r.pq_code))
            for r in spark.read.parquet(p).collect()
        }

    assert snap(path) == snap(fresh)
    fresh_cb = {
        (r.m, r.c, tuple(r.csub))
        for r in spark.read.parquet(os.path.join(fresh, "_pq_codebook")).collect()
    }
    assert cb_new == fresh_cb


def test_ivf_compact_preserves_pq_layer(spark, tmp_path):
    """Tombstone compaction rewrites affected cluster partitions by
    passing store rows through — on a PQ-coded store the pq_code
    column and both codebook sidecars must survive byte-for-byte in
    meaning: surviving rows keep their exact codes, deleted rows are
    gone, sidecars untouched."""
    import os

    from free_etl_spark.operators.vectors import (
        ivf_compact,
        ivf_delete,
        ivf_write,
        pq_meta,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    path = str(tmp_path / "ivfpq")
    ivf_write(emb, path, codebook="first_k", pq_m=8, pq_sub=8, pq_c=64)
    before = {
        r.vec_id: (r.cent_id, tuple(int(c) for c in r.pq_code))
        for r in spark.read.parquet(path).collect()
    }
    cb_before = {
        (r.m, r.c, tuple(r.csub))
        for r in spark.read.parquet(os.path.join(path, "_pq_codebook")).collect()
    }

    doomed = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    doomed_ids = {r.vec_id for r in doomed.collect()}
    ivf_delete(doomed, path)
    report = ivf_compact(spark, path)
    assert report.count() > 0

    after = {
        r.vec_id: (r.cent_id, tuple(int(c) for c in r.pq_code))
        for r in spark.read.parquet(path).collect()
    }
    assert set(after) == set(before) - doomed_ids
    assert all(after[v] == before[v] for v in after)  # codes untouched
    assert pq_meta(path) == {"m": 8, "sub": 8, "c": 64}
    cb_after = {
        (r.m, r.c, tuple(r.csub))
        for r in spark.read.parquet(os.path.join(path, "_pq_codebook")).collect()
    }
    assert cb_after == cb_before


def test_pq_guards_reject_silent_wrong_codes(spark, tmp_path):
    """The three PQ-layer footguns found in ADVICE r13 must fail
    LOUDLY at write/append time, never serve silently-wrong codes:
    (a) pq_c > 127 would wrap signed-tinyint codes negative and drop
    rows from every decode/ADC join; (b) a defaulted pq_sub with
    dim % pq_m != 0 would silently exclude trailing dimensions from
    every code; (c) a store whose PQ sidecars are missing (crash
    between data write and sidecar write) must refuse appends, or
    uncoded rows fork the schema and vanish from ADC scans."""
    import os

    from free_etl_spark.operators.vectors import ivf_append, ivf_write

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)

    # (a) signed-tinyint overflow
    with pytest.raises(ValueError, match="tinyint"):
        ivf_write(base, str(tmp_path / "a"), codebook="first_k",
                  pq_m=8, pq_sub=8, pq_c=128)

    # (b) truncating default pq_sub (64-dim corpus, pq_m=7)
    with pytest.raises(ValueError, match="divisible"):
        ivf_write(base, str(tmp_path / "b"), codebook="first_k", pq_m=7)

    # (c) crashed-sidecar store refuses appends
    path = str(tmp_path / "c")
    ivf_write(base, path, codebook="first_k", pq_m=8, pq_sub=8, pq_c=64)
    os.remove(os.path.join(path, "_pq_meta.json"))  # simulate the crash
    with pytest.raises(RuntimeError, match="_pq_meta.json"):
        ivf_append(batch, path)


def test_decoded_residual_sidecar_lifecycle(spark, tmp_path):
    """The materialized decoded-residual relation (VERDICT r13 task
    6): (a) ivf_write(pq) persists _pq_decoded and it is bit-identical
    to an on-the-fly decode; (b) ivf_append keeps it fresh with
    O(batch) maintenance; (c) a store mutated WITHOUT a sidecar
    refresh (the crash window) reads as stale → pq_decoded returns
    None and consumers fall back to on-the-fly decode."""
    import os

    from free_etl_spark.operators.vectors import (
        _decode_codes,
        ivf_append,
        ivf_write,
        pq_decoded,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)
    path = str(tmp_path / "store")
    ivf_write(base, path, codebook="first_k", pq_m=8, pq_sub=8, pq_c=64)

    def snap(df):
        return {r.vec_id: (r.cent_id, tuple(r.dec)) for r in df.collect()}

    side = pq_decoded(spark, path)
    assert side is not None
    pq_cb = spark.read.parquet(os.path.join(path, "_pq_codebook"))
    fly = _decode_codes(
        spark.read.parquet(path).select("vec_id", "cent_id", "pq_code"),
        pq_cb,
    )
    assert snap(side) == snap(fly)
    assert len(snap(side)) == base.count()

    # (b) append keeps the sidecar fresh and complete
    ivf_append(batch, path)
    side2 = pq_decoded(spark, path)
    assert side2 is not None
    got = snap(side2)
    assert len(got) == emb.count()
    fly2 = _decode_codes(
        spark.read.parquet(path).select("vec_id", "cent_id", "pq_code"),
        pq_cb,
    )
    assert got == snap(fly2)

    # (c) a data mutation without a refresh = stale sig -> None
    extra = spark.read.parquet(path).limit(1).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    extra.write.mode("append").partitionBy("cent_id").parquet(path)
    assert pq_decoded(spark, path) is None

def test_ivf_recluster_incremental_parity_and_locality(spark, tmp_path):
    """Incremental recluster (VERDICT r13 task 5) under LOCALIZED
    drift (a near-duplicate clump appended into one cell — the
    production shape: new data skewed toward a region): (a) the
    REWRITE touches only the affected partition subset — untouched
    cent_id dirs keep their committed files byte-identical; (b)
    recall@5 (ground truth recomputed over the modified corpus) stays
    within one top-5 neighbor of a FULL recluster of the same store;
    (c) rows in drifted lists carry codes re-encoded against the
    updated codebook, and the decoded sidecar is fresh; (d) an
    incomplete stage is discarded on re-entry, a COMPLETE stage
    (marker present) is finished."""
    import json
    import os
    import shutil

    from free_etl_spark.operators.vectors import (
        centroid_rank,
        ivf_append,
        ivf_list_drift,
        ivf_probe,
        ivf_recluster,
        ivf_recluster_incremental,
        ivf_write,
        pq_decoded,
    )

    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    base = emb.filter(F.col("vec_id") % 10 != 0)
    # the appended batch: every %10==0 id becomes a near-duplicate of
    # vector 7 (one coordinate nudged per id so cosines stay unique)
    v7 = base.filter(F.col("vec_id") == 7).select(
        F.col("emb").alias("v7emb")
    )
    batch = (
        emb.filter(F.col("vec_id") % 10 == 0)
        .crossJoin(F.broadcast(v7))
        .select(
            "vec_id",
            F.transform(
                "v7emb",
                lambda x, i: x
                + F.when(i == 0, F.col("vec_id") * 1e-4).otherwise(0.0),
            ).alias("emb"),
        )
    )
    path = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    ivf_write(base, path, codebook="kmeans", iters=2,
              pq_m=8, pq_sub=8, pq_c=64)
    ivf_append(batch, path)
    shutil.copytree(path, full)

    drift = {
        r.cent_id: r.drift_d2 for r in ivf_list_drift(spark, path).collect()
    }
    mean_drift = sum(drift.values()) / len(drift)
    drifted = sorted(c for c, d in drift.items() if d > mean_drift)
    assert drifted and len(drifted) <= len(drift) // 4, (
        "drift is not localized",
        drifted,
    )

    def part_files(p):
        return {
            name: sorted(os.listdir(os.path.join(p, name)))
            for name in os.listdir(p)
            if name.startswith("cent_id=")
        }

    before = part_files(path)

    # ground truth over the MODIFIED corpus
    t = (
        pq.read_table(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    E = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    ids = t["vec_id"].to_numpy()
    v7np = E[ids == 7][0].copy()
    for i in np.where(ids % 10 == 0)[0]:
        E[i] = v7np
        E[i, 0] = v7np[0] + ids[i] * 1e-4
    En = E / np.linalg.norm(E, axis=1, keepdims=True)
    C = np.round(En @ En.T, 6)

    qids = [1, 2, 3, 4, 5]  # %10 != 0: identical in store and file
    queries = emb.filter(F.col("vec_id").isin(qids))

    def recall5(store_path, cent, nprobe=4):
        probes: dict[int, list[int]] = {}
        for r in (
            centroid_rank(queries, cent).filter(F.col("rn") <= nprobe).collect()
        ):
            probes.setdefault(r.vec_id, []).append(r.cent_id)
        out = []
        for q in qids:
            probed = {
                r.vec_id
                for r in ivf_probe(spark, store_path, probes[q]).collect()
            }
            qi = int(np.where(ids == q)[0][0])
            order = np.argsort(-C[qi])
            exact = [int(ids[j]) for j in order if ids[j] != q][:5]
            in_probe = [
                int(ids[j])
                for j in order
                if ids[j] != q and int(ids[j]) in probed
            ][:5]
            out.append(len(set(exact) & set(in_probe)) / 5)
        return sum(out) / len(qids)

    cent_inc = ivf_recluster_incremental(spark, path)
    cent_full = ivf_recluster(spark, full, codebook="kmeans")

    # (a) locality: a strict subset of partitions rewritten
    after = part_files(path)
    touched = {
        d
        for d in set(before) | set(after)
        if before.get(d) != after.get(d)
    }
    untouched = set(before) - touched
    assert untouched, "incremental run rewrote every partition"
    # On this 19-list micro store the drifted cell's evicted members
    # fan out to ~2/3 of the cells, so the pin here is strict-subset
    # + drifted-cohort containment; the PROPORTIONALITY claim (touched
    # fraction shrinks as K grows with the corpus) is measured at
    # sf0.01/sf0.1 and ledgered in docs/SCALE.md.
    assert len(touched) < len(before), (len(touched), len(before))

    # (b) recall parity with the full recluster
    r_inc = recall5(path, cent_inc)
    r_full = recall5(full, cent_full)
    assert r_inc >= r_full - 0.05, (r_inc, r_full)

    # (c) codes + sidecar: rows now in drifted lists carry codes
    # encoded against the UPDATED codebook; sidecar reads fresh
    assert pq_decoded(spark, path) is not None
    from free_etl_spark.operators.vectors import _residuals, pq_encode

    store = spark.read.parquet(path)
    hot = store.filter(F.col("cent_id").isin([int(c) for c in drifted]))
    assert hot.count() > 0
    pq_cb = spark.read.parquet(os.path.join(path, "_pq_codebook"))
    want = {
        r.vec_id: [int(c) for c in r.pq_code]
        for r in pq_encode(
            _residuals(hot.select("vec_id", "emb", "cent_id"), cent_inc),
            pq_cb,
            8,
            8,
        ).collect()
    }
    got = {r.vec_id: [int(c) for c in r.pq_code] for r in hot.collect()}
    assert got == want

    # (d) incomplete stage discarded; complete stage finished
    stage = path + "__recluster_inc_stage"
    os.makedirs(os.path.join(stage, "cent_id=424242"))
    open(os.path.join(stage, "cent_id=424242", "junk.parquet"), "w").close()
    ivf_recluster_incremental(spark, path, drifted=[])
    assert not os.path.exists(stage)

    from free_etl_spark.operators.vectors import _decode_codes

    cid0 = int(store.select("cent_id").first().cent_id)
    staged_rows = (
        spark.read.parquet(path)
        .filter(F.col("cent_id") == cid0)
        .withColumn("vec_id", F.col("vec_id") + 1_000_000)
    )
    staged_rows.write.partitionBy("cent_id").parquet(
        os.path.join(stage, "rewrite")
    )
    _decode_codes(
        staged_rows.select("vec_id", "cent_id", "pq_code"), pq_cb
    ).write.partitionBy("cent_id").parquet(os.path.join(stage, "rewrite_dec"))
    spark.read.parquet(os.path.join(path, "_codebook")).write.parquet(
        os.path.join(stage, "_codebook_new")
    )
    with open(os.path.join(stage, "_apply.json"), "w") as f:
        json.dump({"rewrite": [cid0], "emptied": []}, f)
    ivf_recluster_incremental(spark, path, drifted=[])
    assert not os.path.exists(stage)
    healed = {
        r.vec_id
        for r in spark.read.parquet(path)
        .filter(F.col("cent_id") == cid0)
        .select("vec_id")
        .collect()
    }
    assert healed and all(v >= 1_000_000 for v in healed)
    assert pq_decoded(spark, path) is not None


def test_codebook_driver_cap_fallbacks(spark, monkeypatch):
    """VERDICT r14 task 6: past _CODEBOOK_DRIVER_CAP_BYTES the kmeans
    lineage cut must become a localCheckpoint (no K×dim collect
    through the driver) and assign_nearest must drop its broadcast
    hint — both value-identical to the driver-round-trip forms."""
    import free_etl_spark.operators.vectors as V

    emb = spark.range(0, 200).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("double"),
            (F.col("id") % 13).cast("double"),
        ).alias("emb"),
    )
    ref_cent = V.kmeans_centroids(emb, k=8, iters=2, dim=2)
    ref_asn = V.assign_nearest(emb, ref_cent, 2, k=8)
    ref_rows = sorted(
        (r.vec_id, r.cent_id) for r in ref_asn.collect()
    )
    ref_cent_rows = sorted(
        (r.cent_id, tuple(r.cemb)) for r in ref_cent.collect()
    )

    monkeypatch.setattr(V, "_CODEBOOK_DRIVER_CAP_BYTES", 1)
    assert not V._codebook_fits_driver(8, 2)
    capped_cent = V.kmeans_centroids(emb, k=8, iters=2, dim=2)
    capped_asn = V.assign_nearest(emb, capped_cent, 2, k=8)
    got_rows = sorted((r.vec_id, r.cent_id) for r in capped_asn.collect())
    got_cent_rows = sorted(
        (r.cent_id, tuple(r.cemb)) for r in capped_cent.collect()
    )
    assert got_cent_rows == ref_cent_rows
    assert got_rows == ref_rows
