"""Similarity search over embedding columns (array<float>) —
brute-force cosine top-k baseline + LSH-bucketed scale path.

Vector math is higher-order-function expressions (zip_with + aggregate:
JVM-side, no Python). The brute-force path broadcasts the query set; the
LSH path buckets by random-hyperplane signs so candidate generation is
an equi-join on the bucket — the 100 TB shape (signatures are a narrow
projection; only same-bucket pairs pay the exact cosine).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .. import cache
from ..functions.sqlstage import sql_stage

DIM = 64
N_PLANES = 16


def as_double(col) -> Column:
    return F.transform(col if isinstance(col, Column) else F.col(col), lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_batch_udf():
    """The raw Arrow pandas_udf behind :func:`cosine_batch` — exposed so
    SQL stages can ``spark.udf.register`` it and call it by name."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def _cos(va, vb):
        if len(va) == 0:
            return pd.Series(np.empty(0, dtype=np.float64))
        A = np.stack(va.values).astype(np.float64)
        B = np.stack(vb.values).astype(np.float64)
        dots = (A * B).cumsum(axis=1)[:, -1]
        na = np.sqrt((A * A).cumsum(axis=1)[:, -1])
        nb = np.sqrt((B * B).cumsum(axis=1)[:, -1])
        return pd.Series(dots / (na * nb))

    return _cos


def cosine_batch(a: Column, b: Column) -> Column:
    """Arrow-batched pair cosine, bit-identical to :func:`cosine`.

    The HOF fold costs ~µs/element interpreted (SCALE.md lesson 3); at
    SemDeDup pair volumes (Σ|cluster|² pairs × 3 folds × dim) that
    dominates the query. This UDF reproduces the fold's EXACT float
    semantics — elementwise products then a SEQUENTIAL left-to-right
    summation via cumsum (numpy's sum/dot use pairwise summation, which
    would drift in the last ulp and break oracle hash equality) — at
    numpy batch speed. Requires equal-length (padded) vectors per batch.
    """
    return cosine_batch_udf()(a, b)


def _plane_weight(j, i) -> Column:
    """Deterministic pseudo-random hyperplane weights in [-0.5, 0.5):
    LCG over the flat (plane, dim) index — reproducible in plain SQL."""
    idx = (j * DIM + i + 1).cast("long")
    return ((F.lit(1103515245).cast("long") * idx + 12345) % F.lit(2147483648)).cast(
        "double"
    ) / F.lit(2147483648.0) - 0.5


def lsh_bucket(emb: Column, n_planes: int = N_PLANES) -> Column:
    """Random-hyperplane LSH: bucket = Σ [proj_j >= 0]·2^j over n planes."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.aggregate(
                F.zip_with(
                    emb,
                    F.transform(F.sequence(F.lit(0), F.lit(DIM - 1)), lambda i: _plane_weight(j, i)),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            >= 0,
            F.pow(F.lit(2.0), j).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )


def _rp_weight(j, i, dim: int) -> Column:
    """Deterministic integer projection weight in [-32768, 32768): the
    same LCG family as ``_plane_weight``, kept INTEGER so the projection
    sum is exact int64 arithmetic (order-independent, hence
    bit-reproducible in plain SQL)."""
    idx = (j * dim + i + 1).cast("long")
    return (F.lit(1103515245).cast("long") * idx + 12345) % F.lit(65536) - F.lit(32768)


def random_projection(
    emb_df: DataFrame,
    out_dim: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int = DIM,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection to ``out_dim`` dims — the
    dimensionality-reduction stage in front of ANN/clustering at scale
    (project 100 TB of wide embeddings once, run candidate generation in
    the narrow space, verify exact in the original space).

    Exactness posture: components quantize to 1e-6 units (BIGINT), the
    per-output-dim weighted sum runs entirely in int64 (|q|·|w|·dim ≤
    ~4e12 ≪ 2^63 — no overflow, no float fold-order), and ONE terminal
    division rescales to double — so Spark and any SQL engine produce
    bit-identical projections regardless of summation order. Weights
    come from a seeded integer LCG over the flat (out_dim × dim) index,
    reproducible in plain SQL (``random_projection`` oracle).

    Pure JVM higher-order-function expression: fine at out_dim·dim ≈ 1k
    interpreted ops per row (SCALE.md lesson 3's threshold); swap the
    inner fold for an Arrow matmul kernel if out_dim·dim grows 100×.
    """
    v = as_double(emb_col)
    q = F.transform(v, lambda x: F.floor(x * 1e6 + 0.5).cast("long"))

    def project(qb: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(0), F.lit(out_dim - 1)),
            lambda j: F.aggregate(
                F.zip_with(
                    qb,
                    F.transform(
                        F.sequence(F.lit(0), F.lit(dim - 1)),
                        lambda i: _rp_weight(j, i, dim),
                    ),
                    lambda x, w: x * w,
                ),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ).cast("double")
            / F.lit(1e6 * 32768.0),
        )

    # let-bind the quantized array: it is referenced by all out_dim
    # lambda bodies and Catalyst re-inlines per reference (lesson 1)
    proj = F.get(F.transform(F.array(q), project), 0)
    return emb_df.select(F.col(id_col), proj.alias("projection"))


def ann_brute_topk(
    emb_df: DataFrame, query_ids: list[int], k: int = 5, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query vectors against the
    corpus; deterministic ranking by (cosine desc, id)."""
    base = emb_df.select(F.col(id_col).alias("cand_id"), as_double(emb_col).alias("v"))
    q = emb_df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), as_double(emb_col).alias("qv")
    )
    j = base.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("cand_id"))
    scored = j.select(
        "query_id", "cand_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ann_projected_topk(
    emb_df: DataFrame,
    query_ids: list[int],
    k: int = 5,
    shortlist: int = 25,
    out_dim: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN: candidate generation by cosine in the
    Johnson-Lindenstrauss PROJECTED space (:func:`random_projection`,
    ``out_dim`` ≪ dim), exact re-scoring in the original space for the
    shortlist only — the standard reduce-then-verify recipe: at 100 TB
    the wide vectors are touched for |queries|·shortlist rows instead of
    |queries|·|corpus|, and the projected scan is dim/out_dim× narrower.
    Deterministic end-to-end: projections are bit-exact (integer-scaled
    sums), both cosines fold sequentially, ties break toward the lower
    candidate id at both stages.
    """
    # cache.cut, not keep: the projection column is array<double>
    # and the columnar cache serializes nested arrays pathologically
    # (SCALE.md lesson 2); RDD storage via localCheckpoint instead
    proj = cache.cut(random_projection(emb_df, out_dim=out_dim, id_col=id_col, emb_col=emb_col))
    base = proj.select(F.col(id_col).alias("cand_id"), F.col("projection").alias("pv"))
    q = proj.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("projection").alias("qpv")
    )
    scored = (
        base.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine(F.col("qpv"), F.col("pv")).alias("psim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("psim").desc(), F.col("cand_id"))
    cand = scored.withColumn("prank", F.row_number().over(w)).where(
        F.col("prank") <= shortlist
    )
    # exact verify: wide vectors only for the shortlist
    e = emb_df.select(F.col(id_col).alias("cand_id"), as_double(emb_col).alias("v"))
    qe = emb_df.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), as_double(emb_col).alias("qv")
    )
    exact = (
        cand.select("query_id", "cand_id")
        .join(e, "cand_id")
        .join(F.broadcast(qe), "query_id")
        .select("query_id", "cand_id", cosine(F.col("qv"), F.col("v")).alias("cos_sim"))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    return exact.withColumn("rank", F.row_number().over(w2)).where(F.col("rank") <= k)


def lsh_near_pairs(
    emb_df: DataFrame, threshold: float = 0.9, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """Embedding near-dup pairs via LSH bucket equi-join + exact cosine
    verification >= threshold."""
    d = emb_df.select(
        F.col(id_col).alias("id"), as_double(emb_col).alias("v")
    ).withColumn("bucket", lsh_bucket(F.col("v")))
    l = d.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    r = d.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    cand = l.join(r, "bucket").where(F.col("id_a") < F.col("id_b"))
    out = cand.select(
        "id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim")
    )
    return out.where(F.col("cos_sim") >= threshold)


def kmeans_assign(
    emb_df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    ndigits: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Lloyd k-means over the embedding column by max-cosine assignment —
    the trainable coarse quantizer for IVF search (``ann_ivf`` uses fixed
    seed centroids; this learns them).

    Fully distributed, no driver-side model state: centroids live in a
    k-row table that is broadcast into the assignment cross join; the
    update is a per-(cluster, dimension) hash aggregate (k·dim rows,
    tiny) re-assembled into arrays. The Lloyd iterations are UNROLLED
    into one server-parsed SQL CTE chain (round-6 A/B, sf0.1 best-of-3:
    this form 2.15 s total vs 2.23 s for the per-iteration
    localCheckpoint form, with build collapsing 1.81 -> 0.22 s — the
    cut paid ~0.5 s/iteration of driver-side RDD manufacture; the
    op-chained lazy form and an MLlib-style driver round-trip both
    measured worse in round 5. Residual exec cost is AQE query-stage
    scheduling across the iteration exchanges — constant in data size,
    amortizes at scale). Determinism: seeding takes the first
    ``k`` vectors by id, assignment ties break toward the lower cluster
    id, and the centroid mean is computed as an INTEGER-scaled sum
    (component quantized to 1e-``ndigits`` units as BIGINT, summed
    exactly — order-independent — then divided by the count): both
    engines, and repeated Spark runs with different partition orders,
    iterate from bit-identical state. The previous ``round(avg, 6)``
    re-synchronization carried a residual flake: a mean within an ulp of
    a rounding-digit boundary rounds differently per fold order. Empty
    clusters drop out (standard Lloyd); the final row set is one
    assignment per vector.

    ``dim`` (probed from the first row when omitted) assumes FIXED-width
    embeddings — the wide per-dimension aggregate reads ``element_at``
    up to ``dim``, so ragged inputs must be padded upstream.
    """
    e = emb_df.select(F.col(id_col).alias("vid"), as_double(emb_col).alias("v"))
    scale = 10 ** ndigits
    if dim is None:
        # one-row probe for the embedding width (driver-side scalar
        # config inference, the SURVEY §7-sanctioned pattern) — enables
        # the single-shuffle wide-aggregate update below for any input
        first = emb_df.select(F.size(emb_col).alias("d")).head(1)
        dim = int(first[0]["d"]) if first else 0
    if dim <= 0:
        # empty input (or zero-width vectors): the f-string expression
        # lists below would render "struct(, count(1) AS n)" — a
        # ParseException at plan time. Degrade gracefully to an empty
        # assignment frame instead, like the old posexplode form did.
        return e.select(
            F.col("vid").alias(id_col),
            F.lit(0).cast("long").alias("cluster_id"),
            F.lit(0.0).alias("cos_sim"),
        ).where(F.lit(False))
    # --- ONE server-parsed SQL stage with the Lloyd iterations UNROLLED
    # as a CTE chain (round-6): the per-iteration localCheckpoint form
    # paid ~0.5 s of driver-side RDD manufacture (codegen + DAG build)
    # per cut — 2 iterations cost ~1.2 s of BUILD on a 500-vector input
    # (measured, queries_build split). The chain below is one analysis
    # pass and one lazy job; nothing is referenced twice except the
    # input embeddings (scanned iters+2 times — the base scan; callers
    # with an expensive upstream persist it). Expression text per
    # iteration is IDENTICAL to the previous form (same sums/means
    # strings, same max_by tie-break struct), so centroids stay
    # bit-identical across engines and partition orders.
    sums = ", ".join(
        f"sum(CAST(floor((element_at(v, {i + 1}) * {scale}.0e0) + 0.5e0) AS BIGINT))"
        f" AS s{i}"
        for i in range(dim)
    )
    means = ", ".join(
        f"(CAST(st.s{i} AS DOUBLE) / CAST(st.n AS DOUBLE)) / {scale}.0e0"
        for i in range(dim)
    )
    spark = emb_df.sparkSession
    spark.udf.register("fmk_cos_batch", cosine_batch_udf())

    def assign_cte(c: str) -> str:
        # argmax by hash aggregate, NOT a per-vector window: map-side
        # partial max_by collapses the broadcast-join fan-out (n·k rows)
        # before the shuffle, so only n rows move. Tie-break toward the
        # lower cid via the (sim, -cid) ordering struct; the pair
        # similarity runs through the registered cosine_batch Arrow UDF
        # (bit-identical sequential fold — SCALE.md lesson 3).
        return f"""(
  SELECT vid, first(v) AS v,
         max_by(struct(cid, sim), struct(sim, -cid)) AS best
  FROM (SELECT /*+ BROADCAST(c) */ e.vid, e.v, c.cid,
               fmk_cos_batch(e.v, c.cv) AS sim
        FROM {{e}} e CROSS JOIN {c} c)
  GROUP BY vid
)"""

    ctes = [f"c0 AS (SELECT CAST(vid AS BIGINT) AS cid, v AS cv FROM {{e}} WHERE vid < {int(k)})"]
    for t in range(1, iters + 1):
        ctes.append(f"a{t} AS {assign_cte(f'c{t - 1}')}")
        ctes.append(
            f"u{t} AS (SELECT cid, struct({sums}, count(1) AS n) AS st "
            f"FROM (SELECT best.cid AS cid, v FROM a{t}) GROUP BY cid)"
        )
        ctes.append(f"c{t} AS (SELECT cid, array({means}) AS cv FROM u{t})")
    ctes.append(f"a{iters + 1} AS {assign_cte(f'c{iters}')}")
    # no output rounding: sim is deterministic (sequential dot-product
    # fold over bit-identical centroids), and cross-engine round() is
    # itself not guaranteed identical at digit boundaries
    final_sql = (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT vid AS {id_col}, best.cid AS cluster_id, "
        f"best.sim AS cos_sim FROM a{iters + 1}"
    )
    return sql_stage(final_sql, e=e)


def semantic_dup_pairs(
    emb_df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): Lloyd
    k-means partitions the embedding space, then cosine pairs are
    computed only WITHIN each cluster — the candidate set shrinks from
    |corpus|² to Σ|cluster|², which is the method's entire scale story.
    Returns (id_a, id_b, cos_sim) with id_a < id_b, cos_sim >= threshold.

    The within-cluster self-join is an equi-join on cluster_id; skew
    (one giant cluster) is bounded by raising k — cluster sizes are the
    knob, exactly as in the paper.
    """
    import numpy as np
    import pandas as pd

    a = kmeans_assign(emb_df, k=k, iters=iters, id_col=id_col, emb_col=emb_col, dim=dim)
    v = emb_df.select(F.col(id_col).alias("id"), as_double(emb_col).alias("v"))
    m = a.select(F.col(id_col).alias("id"), "cluster_id").join(v, "id")

    # Within-cluster pairs as grouped applyInPandas, NOT a self-join:
    # each vector crosses Arrow ONCE (n_c rows per cluster), the
    # |cluster|² pair products exist only inside numpy (row-blocked to
    # bound memory), and only surviving pairs return — vs a cluster_id
    # self-join that ships BOTH pair arrays through the shuffle and the
    # UDF boundary (O(Σ|c|²·dim) Arrow traffic; measured 40% slower at
    # sf0.1 even Arrow-batched). Float semantics are preserved exactly:
    # elementwise products then SEQUENTIAL cumsum summation — identical
    # to the zip_with+aggregate fold and the oracle's list_dot_product
    # (numpy sum/dot would use pairwise summation and drift in the last
    # ulp). The pre-filter keeps a 1e-6 guard band; the authoritative
    # round+threshold stays Spark-side (HALF_UP, matching the oracle).
    # Skew: one task per cluster — k is the cluster-size knob (paper's
    # own posture); the row-block keeps peak memory at block×dim.
    guard = threshold - 1e-6
    id_type = dict(emb_df.dtypes)[id_col]

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n_rows = len(pdf)
        if n_rows < 2:
            return pd.DataFrame(
                {
                    "id_a": pdf["id"].iloc[:0],
                    "id_b": pdf["id"].iloc[:0],
                    "cos_raw": pd.Series([], dtype="float64"),
                }
            )
        ids = pdf["id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        X = np.stack(pdf["v"].to_numpy()[order]).astype(np.float64)
        nrm = np.sqrt((X * X).cumsum(axis=1)[:, -1])
        # pair indices are generated INCREMENTALLY per anchor block (never
        # np.triu_indices over the whole cluster: those index arrays alone
        # are O(n^2) int64 — a 125k-row cluster would need ~125 GB before
        # any cosine math). Block size adapts so each round materializes
        # ~200k pairs; peak memory is pairs_per_block x dim, independent
        # of cluster size.
        oa, ob, oc = [], [], []
        blk = max(1, 200_000 // (n_rows - 1))
        for s in range(0, n_rows - 1, blk):
            e = min(s + blk, n_rows - 1)
            anchors = np.arange(s, e)
            ia = np.repeat(anchors, (n_rows - 1) - anchors)
            ib = np.concatenate([np.arange(i + 1, n_rows) for i in anchors])
            for t in range(0, len(ia), 200_000):
                sa, sb = ia[t : t + 200_000], ib[t : t + 200_000]
                cos = (X[sa] * X[sb]).cumsum(axis=1)[:, -1] / (nrm[sa] * nrm[sb])
                keep = cos >= guard
                oa.append(ids[sa][keep])
                ob.append(ids[sb][keep])
                oc.append(cos[keep])
        return pd.DataFrame(
            {
                "id_a": np.concatenate(oa),
                "id_b": np.concatenate(ob),
                "cos_raw": np.concatenate(oc),
            }
        )

    pairs = m.groupBy("cluster_id").applyInPandas(
        _pairs, f"id_a {id_type}, id_b {id_type}, cos_raw double"
    )
    # raw threshold compare, no rounding: cos_raw reproduces the
    # sequential fold exactly, so both engines filter identical values
    return pairs.select(
        "id_a", "id_b", F.col("cos_raw").alias("cos_sim")
    ).where(F.col("cos_sim") >= threshold)
