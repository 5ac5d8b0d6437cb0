"""CurationKit: declarative curation pipeline — JSON round-trip,
stage-by-stage semantics vs the underlying operators, one-plan run."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from finmlkit_spark.plans import curation as C


def _docs(spark):
    rows = [
        # good docs (en stopwords, long enough, distinct)
        (0, "the quick brown fox jumps over the lazy dog near a river bank today", "web"),
        (1, "a slow green turtle walks under the warm sun and rests by the pond", "web"),
        (2, "the market data stream of trades and bars flows to the feature store", "code"),
        # exact dup of 0
        (3, "the quick brown fox jumps over the lazy dog near a river bank today", "web"),
        # low quality: too short
        (4, "tiny", "web"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_kit_round_trip_and_run(spark, tmp_path):
    kit = C.CurationKit(
        [
            C.QualityFilter(min_quality=0.5, lang="en", max_rep3=0.9),
            C.ExactDedup(),
            C.HashSplit(test_permille=0, side="train"),
        ]
    )
    p = str(tmp_path / "recipe.json")
    kit.save_config(p)
    kit2 = C.CurationKit.load_config(p)
    assert kit2.to_config() == kit.to_config()
    cfg = json.load(open(p))
    assert [s["kind"] for s in cfg["stages"]] == [
        "quality_filter",
        "exact_dedup",
        "hash_split",
    ]

    out = kit2.run(_docs(spark))
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 4 dropped by quality (short), 3 dropped as exact dup of 0
    assert ids == [0, 1, 2]
    # run() is one lazy plan: no action happened before collect, and the
    # output schema is the input schema
    assert out.columns == ["doc_id", "text", "source"]


def test_report_counts_monotone(spark):
    kit = C.CurationKit([C.QualityFilter(), C.ExactDedup()])
    rep = kit.report(_docs(spark))
    assert rep["input"] == 5
    assert rep["input"] >= rep["quality_filter"] >= rep["exact_dedup"]
    assert rep["exact_dedup"] == 3


def test_c4_and_decontaminate_stages(spark):
    docs = _docs(spark)
    c4 = C.C4Filter().apply(docs)
    assert sorted(r["doc_id"] for r in c4.select("doc_id").collect()) == [0, 1, 2, 3]

    # doc_id % 3 == 0 as bench slice: docs 0,3 are bench; doc 1,2 share
    # no trigram with them -> decontaminated set keeps 1,2,4
    dec = C.Decontaminate(bench_filter="doc_id % 3 = 0").apply(docs)
    assert sorted(r["doc_id"] for r in dec.select("doc_id").collect()) == [1, 2, 4]


def test_near_dup_and_mixture_stages(spark):
    docs = _docs(spark)
    nd = C.NearDupDedup(threshold=0.5).apply(docs)
    ids = sorted(r["doc_id"] for r in nd.select("doc_id").collect())
    assert 0 in ids and 3 not in ids  # exact dup collapses to canonical 0

    mix = C.MixtureSample(weights={"web": 1.0, "code": 1.0}).apply(docs)
    # dominant group keeps rate 1.0 -> no group is upsampled, output subset
    assert mix.count() <= docs.count()
    assert set(mix.columns) >= {"doc_id", "text", "source"}


def test_persist_after_round_trip(spark):
    kit = C.CurationKit(
        [C.ExactDedup(), C.Decontaminate()], persist_after=["exact_dedup"]
    )
    kit2 = C.CurationKit.from_config(kit.to_config())
    assert kit2.persist_after == ["exact_dedup"]
    out = kit2.run(_docs(spark))
    assert out.count() > 0


def test_gopher_repetition_stage(spark):
    """The repetition stage drops exactly the docs gopher_repetition
    rejects, composes in a kit, and JSON round-trips."""
    from pyspark.sql import functions as F

    from finmlkit_spark.operators import corpus as CP

    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),           # top-2gram > 0.2
            (1, "a perfectly ordinary sentence with words"),
            (2, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    )
    kit = C.CurationKit([C.GopherRepetitionFilter()])
    out = sorted(r["doc_id"] for r in kit.run(docs).collect())
    exp = sorted(
        r["doc_id"]
        for r in CP.gopher_repetition(docs).where("keep").collect()
    )
    assert out == exp and 0 not in out and 1 in out
    # config round-trip through the registry
    cfg = kit.to_config()
    kit2 = C.CurationKit(
        [C.stage_from_config(sc) for sc in cfg["stages"]]
    )
    assert kit2.to_config() == cfg
