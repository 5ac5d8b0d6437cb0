"""Unit tests for the SQ8 scalar quantizer: encode clipping contract,
reconstruction error bound, rank parity with a python reference, and
the promised plan shape (no explode, WindowGroupLimit top-k)."""

from __future__ import annotations

import math

import pytest

from finmlkit_spark.operators import similarity as SIM

DIM = 4
VECS = [
    (0, [0.0, 1.0, -1.0, 5.0]),
    (1, [1.0, 0.5, 0.0, 5.0]),
    (2, [0.5, 0.0, 1.0, 5.0]),
    (3, [0.25, 0.75, -0.5, 5.0]),
]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id long, embedding array<double>",
    )


def test_sq8_train_bounds(emb_df):
    vmin, vmax = SIM.sq8_train(emb_df)
    assert list(vmin) == [0.0, 0.0, -1.0, 5.0]
    assert list(vmax) == [1.0, 1.0, 1.0, 5.0]


def test_sq8_encode_codes_and_constant_dim(emb_df):
    rows = {r["vec_id"]: r["codes"] for r in SIM.sq8_encode(emb_df).collect()}
    # dim 0: range [0,1] -> code = round(x*255)
    assert rows[0][0] == 0 and rows[1][0] == 255
    assert rows[2][0] == round(0.5 / (1 / 255.0))
    # dim 3 is constant -> always 0
    assert all(c[3] == 0 for c in rows.values())


def test_sq8_encode_clips_out_of_sample(spark, emb_df):
    # bounds trained on emb_df, applied to values outside [min,max]
    wide = spark.createDataFrame(
        [(9, [2.0, -3.0, 0.0, 5.0])], "vec_id long, embedding array<double>"
    )
    b = SIM.sq8_train(emb_df)
    codes = SIM.sq8_encode(wide, bounds=b).collect()[0]["codes"]
    assert codes[0] == 255 and codes[1] == 0


def test_sq8_reconstruction_error_bounded(emb_df):
    vmin, vmax = SIM.sq8_train(emb_df)
    d255 = (vmax - vmin) / 255.0
    rows = {r["vec_id"]: r["codes"] for r in SIM.sq8_encode(emb_df).collect()}
    for vid, v in VECS:
        for d in range(DIM):
            if d255[d] == 0:
                continue
            recon = vmin[d] + rows[vid][d] * d255[d]
            assert abs(recon - v[d]) <= d255[d] / 2 + 1e-12


def _reference_topk(n_queries=2, k=2, scale=10**6):
    import numpy as np

    X = np.array([v for _, v in VECS], dtype=np.float64)
    vmin, vmax = X.min(axis=0), X.max(axis=0)
    d255 = (vmax - vmin) / 255.0
    with np.errstate(divide="ignore", invalid="ignore"):
        r = (X - vmin) / d255
    codes = np.where(d255 > 0, np.clip(np.floor(r + 0.5), 0, 255), 0).astype(int)
    vminq = np.floor(vmin * scale + 0.5).astype(int)
    deltaq = np.floor(d255 * scale + 0.5).astype(int)
    out = []
    for qi in range(n_queries):
        qs = np.floor(X[qi] * scale + 0.5).astype(int)
        dists = []
        for ci in range(len(VECS)):
            if ci == qi:
                continue
            dq = int(sum((qs - (vminq + codes[ci] * deltaq)) ** 2))
            dists.append((dq, ci))
        dists.sort()
        for rank, (dq, ci) in enumerate(dists[:k], 1):
            out.append((qi, ci, dq / scale**2, rank))
    return out


def test_ann_sq8_topk_matches_reference(emb_df):
    got = sorted(
        (r["query_id"], r["cand_id"], r["sq_dist"], r["rank"])
        for r in SIM.ann_sq8_topk(emb_df, n_queries=2, k=2).collect()
    )
    want = sorted(_reference_topk())
    assert [(a, b, d) for a, b, _, d in got] == [(a, b, d) for a, b, _, d in want]
    for g, w in zip(got, want):
        assert g[2] == pytest.approx(w[2], abs=1e-12)


def test_ann_sq8_plan_shape(spark):
    from finmlkit_spark.suite import QUERIES

    df = QUERIES["ann_sq8_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    assert "Generate explode" not in plan and "PosExplode" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan


def test_ann_ivf_sq8_full_probe_equals_sq8_topk(spark):
    """With nprobe == k_coarse the IVF restriction admits the whole
    corpus, so ann_ivf_sq8 must return EXACTLY ann_sq8_topk's rows —
    same int64 fold, same (dist ASC, cand_id ASC) tie-break, same
    ranks. Pins the probe ranking, the shared distance fold, and the
    rank ordering in one shot."""
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    full = sorted(
        map(tuple, SIM.ann_ivf_sq8(embs, n_queries=6, k=4, k_coarse=8, nprobe=8).collect())
    )
    flat = sorted(map(tuple, SIM.ann_sq8_topk(embs, n_queries=6, k=4).collect()))
    assert full == flat and len(full) == 24


def test_ann_ivf_sq8_probe_restriction_and_plan(spark):
    """nprobe=1: every candidate must live in its query's one probed
    (max-cosine) cell; plan keeps the audited shape — zero
    SinglePartition, broadcast probe + query joins, WindowGroupLimit
    top-k, no cartesian."""
    import numpy as np

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = SIM.ann_ivf_sq8(embs, n_queries=6, k=4, k_coarse=8, nprobe=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    assert plan.count("BroadcastExchange") >= 2
    assert "WindowGroupLimit" in plan
    assert "Cartesian" not in plan
    rows = out.collect()
    assert rows
    enc = {
        r["vec_id"]: r["cell_id"]
        for r in SIM.ivf_sq8_encode(embs, k_coarse=8).collect()
    }
    seeds = SIM.kmeans_seeds(embs, 8)
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in embs.where("vec_id < 6").collect()
    }
    for r in rows:
        q = vecs[r["query_id"]]
        nv = np.sqrt((q * q).cumsum()[-1])
        best = sorted(
            (-(q * np.asarray(c, float)).cumsum()[-1] / (nv * cn), cid)
            for cid, c, cn in seeds
        )[0][1]
        assert enc[r["cand_id"]] == best, (r["query_id"], r["cand_id"])
        assert r["cand_id"] != r["query_id"]
