"""End-to-end training-data curation pipeline over the documents and
embeddings tables — the LLM-data tier in one flow:

    quality/repetition filter -> exact dedup -> MinHash-LSH cluster
    dedup (keep one per component) -> benchmark decontamination ->
    train/test hash split -> sequence packing -> token budget report
    -> ANN neighbor audit

Run: python examples/llm_pipeline.py [sf_dir]   (default sf0.001)
Every stage is a lazy DataFrame; one action at the end materializes the
curated corpus report. At scale the same code runs with the documents
table partitioned by shard — every join here is either a broadcast or a
bounded equi-join on a signature key.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from finmlkit_spark.operators import dedup as D  # noqa: E402
from finmlkit_spark.operators import sampling as SMP  # noqa: E402
from finmlkit_spark.operators import similarity as SIM  # noqa: E402
from finmlkit_spark.operators import text as TX  # noqa: E402
from finmlkit_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llm-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # 1. quality + language gate (pure projections — scale-free)
    scored = docs.select(
        "doc_id",
        "text",
        "source",
        TX.quality_score().alias("quality"),
        TX.lang_guess().alias("lang"),
        TX.repetition_ratio().alias("rep3"),
        TX.token_count().alias("ws_tokens"),
        TX.bpe_token_count().alias("bpe_tokens"),
    )
    kept = scored.where(
        (F.col("quality") >= 0.5) & (F.col("lang") == "en") & (F.col("rep3") < 0.5)
    )

    # 2. exact dedup: keep the lowest doc_id per content hash
    exact = D.exact_dedup(kept, "text", "doc_id").select("keep_id")
    kept = kept.join(exact, kept.doc_id == exact.keep_id).drop("keep_id")

    # 3. near-dup removal: MinHash-LSH pairs -> connected components ->
    #    keep exactly one doc per cluster (transitive dups collapse too)
    pairs = D.minhash_lsh_pairs(kept, "text", "doc_id", threshold=0.6)
    curated = D.keep_canonical(kept, pairs)

    # 3b. decontamination: drop anything sharing shingles with the
    #     held-out benchmark slice (here: doc_id % 97 == 0 stands in)
    bmk = docs.where(F.col("doc_id") % 97 == 0)
    contaminated = D.decontaminate(curated, bmk).select("doc_id")
    curated = curated.join(contaminated, "doc_id", "left_anti")

    # 3c. content-keyed train/test split + greedy sequence packing of
    #     the train side (budget 2048 tokens per training sequence)
    split = SMP.hash_split(curated, test_permille=100)
    train = split.where(F.col("split") == "train")
    packs = SMP.sequence_packing(train, budget=2048, group_col="source")

    # 4. token budget accounting per language bucket
    report = curated.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("ws_tokens").alias("ws_tokens"),
        F.sum("bpe_tokens").alias("bpe_tokens"),
        F.avg("quality").alias("avg_quality"),
    )

    # 5. embedding-space audit: brute-force top-5 neighbors for the first
    #    queries; at scale the same audit runs over PQ codes (m bytes
    #    per vector instead of dim floats — the FAISS-style path)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ann = SIM.ann_brute_topk(emb, query_ids=[0, 1, 2], k=5)
    ann_pq = SIM.ann_pq_topk(emb, n_queries=3, k=5, m=8, ksub=16)

    # 5b. substring-level dedup: report the duplicated token spans, then
    #     actually CUT them from the corpus (Lee et al. 2021)
    cleaned = D.remove_dup_spans(docs, k=3)

    print("=== curated corpus ===")
    for r in report.collect():
        print(r)
    print("=== packing ===")
    n_packs = packs.agg(F.countDistinct("group", "pack_id").alias("n")).collect()[0]["n"]
    print(f"train sequences packed: {n_packs}")
    print("=== sample neighbors (exact) ===")
    for r in ann.orderBy("query_id", "rank").collect()[:15]:
        print(r)
    print("=== sample neighbors (PQ/ADC codes) ===")
    for r in ann_pq.orderBy("query_id", "rank").collect()[:15]:
        print(r)
    print("=== span dedup ===")
    cut_stats = cleaned.agg(
        F.sum("n_tokens").alias("tokens"),
        F.sum(F.col("n_tokens") - F.col("n_kept")).alias("tokens_cut"),
    ).collect()[0]
    print(f"tokens cut by span dedup: {cut_stats['tokens_cut']} / {cut_stats['tokens']}")

    # 6. the same flow, declaratively: a CurationKit recipe is the
    #    JSON-versionable form of stages 1-3c, folded into ONE lazy plan
    from finmlkit_spark.plans import curation as CK

    kit = CK.CurationKit(
        [
            CK.QualityFilter(min_quality=0.5, lang="en", max_rep3=0.5),
            CK.ExactDedup(),
            CK.NearDupDedup(threshold=0.6),
            CK.Decontaminate(bench_filter="doc_id % 97 = 0"),
            CK.HashSplit(test_permille=100, side="train"),
        ]
    )
    print("=== kit recipe ===")
    import json

    print(json.dumps(kit.to_config()))
    curated = kit.run(docs)
    print("kit-curated docs:", curated.count())

    # 7. persist the curated corpus partitioned by split (pruned reads
    #    downstream) — the round-5 corpus sink
    import tempfile

    from finmlkit_spark.sources.corpus_io import read_corpus, upsert_corpus, write_corpus

    with tempfile.TemporaryDirectory() as td:
        out = curated.withColumn(
            "split", F.when(F.col("doc_id") % 10 == 0, "test").otherwise("train")
        )
        write_corpus(out, td, partition_by=("split",))
        print("train partition rows:", read_corpus(spark, td, split="train").count())
        # next day's ingest (late round 13): re-scored docs replace
        # their rows in-place, only the touched partition rewrites
        rescored = out.where("split = 'train'").limit(5).withColumn(
            "quality", F.lit(1.0)
        )
        upsert_corpus(rescored.select(*out.columns), td)
        print("rows after upsert:", read_corpus(spark, td).count())

    # 8. retrieval tier (late round 11): index + BM25 over the CURATED
    #    corpus; the centrality election runs on the RAW corpus, where
    #    the near-dup clusters still exist (election precedes removal)
    from finmlkit_spark.operators import retrieval as RT

    inv = RT.inverted_index(curated, postings_cap=8)
    print("index terms:", inv.count())
    hits = RT.bm25_topk(curated, ["dup", "join", "table"], k=5)
    print("bm25 top-5:", [(r["doc_id"], round(r["score"], 3)) for r in hits.collect()])
    edges = D.simhash_near_pairs(docs).select("doc_a", "doc_b")
    reps = RT.central_reps(edges, a_col="doc_a", b_col="doc_b")
    print("cluster representatives:", reps.count())

    # 9. corpus accounting at sketch cost (round 12): per-source
    #    distinct-doc tallies in 64 registers per source (however many
    #    rows ever stream through), source-overlap estimates from the
    #    same sketches, heavy-hitter token frequencies in a d·w-row
    #    table, and an LM-quality decile split for mixture weighting
    from finmlkit_spark.operators import corpus as CP
    from finmlkit_spark.operators import sketches as SK

    hll = SK.hll_counts(curated, "source", "doc_id")
    print("distinct docs/source (HLL):",
          [(r["source"], round(r["est"])) for r in hll.collect()])
    ov = SK.kmv_overlap(docs.select("source", "text"), "source", "text")
    print("cross-source text overlap (KMV):",
          [(r["source_a"], r["source_b"], round(r["est_jaccard"], 3))
           for r in ov.collect()[:5]])
    toks = curated.select(F.explode(TX.tokens("text")).alias("token"))
    cm = SK.cm_freq_audit(toks, "token", top=5)
    print("top tokens (exact vs count-min):",
          [(r["token"], r["exact_n"], r["cm_est"]) for r in cm.collect()])

    # 10. embedding hygiene before the ANN stages: flag statistical
    #     outliers (corrupt encoders / wrong-modality rows)
    out = SIM.embedding_outliers(emb, k=5)
    print("embedding outliers:",
          [(r["vec_id"], round(r["score"], 1)) for r in out.collect()])

    # 11. production retrieval index (late round 13): materialize the
    #     TF·IDF weight table ONCE at ingest, then every hybrid query
    #     skips the corpus tokenize+count build — bit-identical results
    #     (at real scale, write with bucketBy(h) so the token-keyed
    #     probe join co-locates without an exchange)
    import tempfile

    with tempfile.TemporaryDirectory() as wd:
        RT.materialize_lexical_weights(curated, f"{wd}/lexweights")
        w = RT.read_lexical_weights(spark, f"{wd}/lexweights")
        qids = [r["doc_id"] for r in curated.select("doc_id").limit(3).collect()]
        lex = RT.tfidf_topk(curated, qids, k=10, weights=w)
        sem = SIM.ann_brute_topk(emb, qids, k=10)
        fused = RT.rrf_fuse(lex, sem, k=5)
        print("hybrid search over the materialized index:", fused.count(), "rows")

        # 12. production dup graph (late round 13): materialize the
        #     SimHash near-dup edge list ONCE at ingest — the edge
        #     table is output-scale (pairs a human would review), so
        #     every centrality / clustering query over it skips the
        #     corpus shingle+fingerprint+band-join build entirely
        D.materialize_simhash_edges(docs, f"{wd}/shedges")
        se = D.read_simhash_edges(spark, f"{wd}/shedges").select("doc_a", "doc_b")
        pr = RT.pagerank(se, a_col="doc_a", b_col="doc_b")
        reps2 = RT.central_reps(se, a_col="doc_a", b_col="doc_b")
        print("pagerank nodes over the materialized dup graph:", pr.count())
        assert reps2.count() == reps.count()  # bit-identical election


if __name__ == "__main__":
    main()
