"""Differential tests: the new corpus/similarity operators vs
independent pure-Python reference implementations on a seeded random
corpus — a third engine besides Spark and the DuckDB oracle."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from finmlkit_spark.operators import corpus as CP
from finmlkit_spark.operators import similarity as SIM

VOCAB = ["the", "a", "of", "and", "to", "fox", "dog", "run", "sun", "x{y", "verylongtoken" * 2]


@pytest.fixture(scope="module")
def rand_docs(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        n = int(rng.integers(1, 40))
        words = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), n)]
        rows.append((i, " ".join(words)))
    # a handful of exact repeats to force shared segments
    rows += [(100 + i, rows[i][1]) for i in range(5)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def _segments(text: str, k: int = 8) -> list[str]:
    t = text.split()
    return [" ".join(t[i : i + k]) for i in range(0, len(t), k)]


def test_segment_dedup_matches_python_reference(rand_docs):
    rows, df = rand_docs
    seen: set[str] = set()
    ref = {}
    for doc_id, text in sorted(rows):
        segs = _segments(text)
        kept = []
        for s in segs:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        ref[doc_id] = (
            len(segs),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    out = CP.segment_dedup(df, seg_tokens=8).collect()
    assert len(out) == len(ref)
    for r in out:
        assert (r["n_segments"], r["n_kept"], r["clean_md5"]) == ref[r["doc_id"]], r


def test_c4_signals_match_python_reference(rand_docs):
    rows, df = rand_docs
    stop = {"the", "a", "of", "and", "to"}
    out = CP.c4_filter_signals(df).collect()
    for r in out:
        text = dict(rows)[r["doc_id"]]
        t = text.split()
        freqs = {}
        for w in t:
            freqs[w] = freqs.get(w, 0) + 1
        top = max(freqs.values())
        low = text.lower()
        bad = "lorem ipsum" in low or "javascript" in low or "{" in low
        hits = sum(1 for w in t if w in stop)
        keep = (
            len(t) >= 5
            and max(len(w) for w in t) <= 20
            and not bad
            and hits > 0
            and top / len(t) <= 0.3
        )
        assert r["n_tokens"] == len(t)
        assert r["max_token_len"] == max(len(w) for w in t)
        assert r["has_bad_substring"] == bad
        assert r["stop_hits"] == hits
        assert r["top_token_freq"] == top
        assert r["keep"] == keep


def test_unigram_logprob_matches_python_reference(rand_docs):
    rows, df = rand_docs
    cnt: dict[str, int] = {}
    for _, text in rows:
        for w in text.split():
            cnt[w] = cnt.get(w, 0) + 1
    total = sum(cnt.values())
    out = CP.unigram_logprob(df).collect()
    for r in out:
        t = dict(rows)[r["doc_id"]].split()
        mean = sum(math.log(cnt[w] / total) for w in t) / len(t)
        assert r["n_tokens"] == len(t)
        assert abs(r["mean_logprob"] - round(mean, 6)) <= 2e-6
        assert abs(r["perplexity"] - round(math.exp(-mean), 6)) <= 2e-4


def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(80, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    k, iters = 4, 2

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    cent = {c: vecs[c].copy() for c in range(k)}
    for _ in range(iters):
        assign = {}
        for i in range(80):
            # max cosine, tie -> lower cid (mirror the operator)
            best = max(cent, key=lambda c: (cos(vecs[i], cent[c]), -c))
            assign[i] = best
        cent = {
            c: np.round(
                np.mean([vecs[i] for i in assign if assign[i] == c], axis=0), 6
            )
            for c in set(assign.values())
        }
    out = SIM.kmeans_assign(df, k=k, iters=iters).collect()
    assert len(out) == 80
    for r in out:
        i = r["vec_id"]
        best = max(cent, key=lambda c: (cos(vecs[i], cent[c]), -c))
        assert r["cluster_id"] == best, (i, r["cluster_id"], best)
        assert abs(r["cos_sim"] - round(cos(vecs[i], cent[best]), 6)) <= 2e-6
