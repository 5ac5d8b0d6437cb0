"""Sequential-recurrence kernels (SURVEY.md §2.5 "seq" rows + §2.3
stateful bar indexers) — the grouped Arrow pandas-UDF tier.

These operators are true recurrences (EWMA family, Wilder smoothing,
CUSUM state machines, reset-semantics bar indexers) with no bounded
window form. Execution model: ``applyInPandas`` over a group key —
sequential *within* a (symbol) group, parallel *across* groups, exactly
mirroring the reference's per-array Numba kernels run per instrument.

Scale posture (100 TB): state per group is O(1)-O(window), so the only
constraint is one task per symbol; for a single huge symbol, chunk by
time with warmup overlap (EWMA memory ≈ a few half-lives) — helpers
accept pre-chunked input and the truncation error is quantified in the
docstrings.

Reference behavior parity (math re-derived, no code reuse):
EWMA family ``core/ma.py:6-43``, EW std ``core/volatility.py:9-219``,
RSI ``core/momentum.py:25-65``, EMA-ATR ``core/volatility.py:352-437``,
ADX ``core/trend.py:8-96``, CUSUM filter ``sampling/filters.py:6-70``,
CUSUM test ``core/structural_break/cusum.py``, volume/CUSUM bar
indexers ``bar/logic.py:87-221``.
"""

from __future__ import annotations

import math
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_sequential(
    df: DataFrame,
    kernel: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: str,
    by: str | None = None,
    order: tuple[str, ...] = ("ts_ns", "trade_id"),
) -> DataFrame:
    """Run an ordered per-group kernel via applyInPandas (Arrow-batched).

    ``kernel`` receives the group's rows sorted by ``order`` and returns
    the output frame matching ``out_schema``.
    """
    drop_key = False
    if by is None:
        df = df.withColumn("_g", F.lit(1))
        by, drop_key = "_g", True

    cols = list(order)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return kernel(pdf.sort_values(cols).reset_index(drop=True))

    out = df.groupBy(by).applyInPandas(fn, schema=out_schema)
    return out.drop("_g") if drop_key else out


# --- EWMA family ------------------------------------------------------------

def ewma(x: np.ndarray, span: float) -> np.ndarray:
    """pandas-equivalent adjust=True EWMA: y_t = Σ(1−α)^k x_{t−k} / Σ(1−α)^k."""
    return pd.Series(x).ewm(span=span, adjust=True, ignore_na=False).mean().to_numpy()


def ewms(x: np.ndarray, span: float) -> np.ndarray:
    """Adjust=True bias-corrected EW std (reliability-weight correction
    V²/(V²−V2), pandas ``ewm.std(bias=False)``)."""
    return pd.Series(x).ewm(span=span, adjust=True, ignore_na=False).std(bias=False).to_numpy()


def ewmst(ts_ns: np.ndarray, y: np.ndarray, halflife_ns: float) -> np.ndarray:
    """Time-decay EW std on an irregular series: weight of sample i at
    time t is exp(−(t−t_i)·ln2/halflife); bias-corrected like ``ewms``.

    O(1) state recurrence (V, V2, Sy, Syy decay by d = w^Δt per step) —
    the closed form over absolute time is what the DuckDB oracle uses.

    Numerical note: the E[y²]−E[y]² form cancels catastrophically when
    std ≪ |mean| (error ~ sqrt(eps)·|mean|, i.e. ~1e-6 per 1e2 of price
    level — negligible at realistic volatility, bounded in
    tests/test_kernel_properties.py). Chosen deliberately so the SQL
    oracle computes the *identical* expression.
    """
    lam = math.log(2.0) / halflife_ns
    out = np.full(len(y), np.nan)
    V = V2 = Sy = Syy = 0.0
    prev_t = None
    for i in range(len(y)):
        if np.isnan(y[i]):
            out[i] = np.nan if V == 0 else out[i - 1]
            continue
        d = 1.0 if prev_t is None else math.exp(-lam * (ts_ns[i] - prev_t))
        V = 1.0 + d * V
        V2 = 1.0 + d * d * V2
        Sy = y[i] + d * Sy
        Syy = y[i] * y[i] + d * Syy
        prev_t = ts_ns[i]
        if V * V > V2:
            m = Sy / V
            var = max(Syy / V - m * m, 0.0) * (V * V) / (V * V - V2)
            out[i] = math.sqrt(var)
    return out


def ewma_chunked(
    df: DataFrame,
    col: str,
    span: float,
    order_col: str = "ts_ns",
    chunk_ns: int = 86_400_000_000_000,
    warmup_mult: float = 10.0,
    by: str | None = None,
    out: str = "ewma",
) -> DataFrame:
    """Time-chunked parallel EWMA for a single huge symbol (SURVEY §7
    "what's hard"): each chunk is computed *independently* with a warmup
    overlap read from the previous chunk, then warmup rows are dropped.

    Exactness: adjust=True EWMA memory decays as (1−α)^k; with a warmup
    of ``warmup_mult``·span rows the truncation error is
    (1−α)^(warmup_mult·span) ≈ e^(−2·warmup_mult) (≈ 2e-9 at 10×) —
    below any practical tolerance. Parallelism = number of chunks, even
    within one symbol; state never crosses a task.
    """
    by_cols = [by] if by else []
    chunk = F.floor(F.col(order_col) / F.lit(chunk_ns))
    d = df.withColumn("_chunk", chunk)
    # rows also participate in the NEXT chunk as warmup (duplicate + tag)
    main = d.withColumn("_tgt", F.col("_chunk")).withColumn("_warm", F.lit(False))
    warm = d.withColumn("_tgt", F.col("_chunk") + 1).withColumn("_warm", F.lit(True))
    u = main.unionByName(warm)

    warmup_rows = int(warmup_mult * span)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([order_col]).reset_index(drop=True)
        # keep only the trailing warmup_rows of the warm prefix
        warm_mask = pdf["_warm"].to_numpy()
        n_warm = int(warm_mask.sum())
        start = max(0, n_warm - warmup_rows)
        pdf = pdf.iloc[start:].reset_index(drop=True)
        pdf[out] = ewma(pdf[col].to_numpy(), span)
        return pdf.loc[~pdf["_warm"], [*by_cols, order_col, out]]

    schema_parts = [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in by_cols]
    schema_parts.append(f"`{order_col}` {df.schema[order_col].dataType.simpleString()}")
    schema_parts.append(f"`{out}` double")
    return u.groupBy(*by_cols, "_tgt").applyInPandas(
        kernel, schema=", ".join(schema_parts)
    )


def ewma_parallel(
    df: DataFrame,
    col: str,
    span: float,
    order_col: str = "ts_ns",
    chunk_rows: int = 4096,
    by: str | None = None,
    out: str = "ewma",
    coarse_span: int = 86_400_000_000_000,
) -> DataFrame:
    """EXACT parallel EWMA via a two-pass chunked scan — no warmup
    truncation at all (vs :func:`ewma_chunked`'s ~e^(−2·warmup_mult)
    error). The sequential tier's real scale answer for one huge symbol.

    adjust=True EWMA is a ratio of two linear recurrences
    (``core/ma.py:6-43`` semantics):

        y_t = N_t / D_t,  N_t = x_t + q·N_{t−1},  D_t = 1 + q·D_{t−1}

    with q = 1−α. Linearity gives the scan a closed combine: split rows
    into chunks of ``chunk_rows`` by exact global row number
    (``chunked_window.with_global_row_number`` — no global sort); each
    chunk computes its LOCAL decayed sums independently (Arrow kernel,
    C-speed ``pandas.ewm``); then the cross-chunk carry is a closed
    form over the one-row-per-chunk summary table:

        carry_N(c) = Σ_{j<c} NL_j · q^(rows between end of j and start of c)
        y_t = (N_loc,t + q^pos_t · carry_N) / (D_loc,t + q^pos_t · carry_D)

    The carry sum is a triangular join over the tiny summary (same
    pattern as chunked_window offsets; terms underflow to 0 once the
    gap exceeds ~−745/ln q rows, which is exactly the memory horizon).
    Deviation from the strict sequential fold is pure float
    reassociation (~1e−12 relative; parity-tested) — NOT a truncation.
    Parallelism = number of chunks, even within one symbol.
    """
    from .chunked_window import with_global_row_number

    q = 1.0 - 2.0 / (span + 1.0)
    by_cols = [by] if by else []
    if by:
        # per-group rn: the group is already the parallelism unit
        d = df.withColumn(
            "_rn", F.row_number().over(Window.partitionBy(by).orderBy(order_col))
        )
    else:
        # single stream: exact global rn with no global sort
        d = with_global_row_number(df, order_col, coarse_span=coarse_span, rn_col="_rn")
    d = d.withColumn("_ck", F.floor((F.col("_rn") - 1) / chunk_rows))
    d = d.withColumn("_pos", (F.col("_rn") - 1) % chunk_rows + 1)

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pos").reset_index(drop=True)
        x = pdf[col].to_numpy(dtype=np.float64)
        alpha = 2.0 / (span + 1.0)
        p = np.arange(1, len(x) + 1, dtype=np.float64)
        d_loc = (1.0 - q**p) / (1.0 - q)
        # pandas C-speed ewm mean; local decayed numerator = mean·denom
        n_loc = pd.Series(x).ewm(span=span, adjust=True, ignore_na=False).mean().to_numpy() * d_loc
        return pd.DataFrame(
            {
                **{k: pdf[k] for k in by_cols},
                order_col: pdf[order_col],
                "_ck": pdf["_ck"],
                "_pos": pdf["_pos"],
                "_nloc": n_loc,
                "_dloc": d_loc,
            }
        )

    sch = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in by_cols]
        + [
            f"`{order_col}` {df.schema[order_col].dataType.simpleString()}",
            "`_ck` long",
            "`_pos` long",
            "`_nloc` double",
            "`_dloc` double",
        ]
    )
    scanned = d.groupBy(*by_cols, "_ck").applyInPandas(local_scan, schema=sch)

    summary = scanned.groupBy(*by_cols, "_ck").agg(
        F.max_by("_nloc", "_pos").alias("_nl"),
        F.max_by("_dloc", "_pos").alias("_dl"),
        F.count(F.lit(1)).alias("_len"),
    )
    a = summary.select(*by_cols, "_ck")
    b = summary.select(
        *[F.col(c).alias(f"_b_{c}") for c in by_cols],
        F.col("_ck").alias("_ckb"),
        "_nl",
        "_dl",
        "_len",
    )
    cond = [F.col(f"_b_{c}") == F.col(c) for c in by_cols] + [F.col("_ckb") < F.col("_ck")]
    # rows between the end of chunk j and the start of chunk c (exclusive
    # of both chunks): full chunks strictly between them
    gap = (F.col("_ck") - F.col("_ckb") - 1) * chunk_rows
    carries = (
        a.join(b, cond, "left")
        .groupBy(*by_cols, "_ck")
        .agg(
            F.coalesce(F.sum(F.col("_nl") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_cn"),
            F.coalesce(F.sum(F.col("_dl") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_cd"),
        )
    )
    outdf = scanned.join(F.broadcast(carries), [*by_cols, "_ck"])
    qp = F.pow(F.lit(q), F.col("_pos"))
    y = (F.col("_nloc") + qp * F.col("_cn")) / (F.col("_dloc") + qp * F.col("_cd"))
    return outdf.select(*by_cols, order_col, y.alias(out))


def ewms_parallel(
    df: DataFrame,
    col: str,
    span: float,
    order_col: str = "ts_ns",
    chunk_rows: int = 4096,
    by: str | None = None,
    out: str = "ewms",
    coarse_span: int = 86_400_000_000_000,
) -> DataFrame:
    """EXACT parallel EW moving std (adjust=True, bias-corrected) — the
    four decayed moments behind :func:`ewms` (V, V2, Sy, Syy) are each
    linear recurrences in q = 1−α (V2 in q²), so the same two-pass
    chunked scan as :func:`ewma_parallel` combines them in closed form:
    local moments per chunk at C speed, carries over the
    one-row-per-chunk summary via a broadcast triangular join, then the
    reliability-weight variance V²/(V²−V2)·(Syy/V − (Sy/V)²). Zero
    truncation; deviation from the sequential fold is float
    reassociation only (parity-tested).
    """
    from .chunked_window import with_global_row_number

    q = 1.0 - 2.0 / (span + 1.0)
    q2 = q * q
    by_cols = [by] if by else []
    if by:
        d = df.withColumn(
            "_rn", F.row_number().over(Window.partitionBy(by).orderBy(order_col))
        )
    else:
        d = with_global_row_number(df, order_col, coarse_span=coarse_span, rn_col="_rn")
    d = d.withColumn("_ck", F.floor((F.col("_rn") - 1) / chunk_rows))
    d = d.withColumn("_pos", (F.col("_rn") - 1) % chunk_rows + 1)

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pos").reset_index(drop=True)
        x = pdf[col].to_numpy(dtype=np.float64)
        p = np.arange(1, len(x) + 1, dtype=np.float64)
        v = (1.0 - q**p) / (1.0 - q)
        v2 = (1.0 - q2**p) / (1.0 - q2)
        ew = pd.Series(x).ewm(span=span, adjust=True, ignore_na=False)
        sy = ew.mean().to_numpy() * v
        syy = pd.Series(x * x).ewm(span=span, adjust=True, ignore_na=False).mean().to_numpy() * v
        return pd.DataFrame(
            {
                **{k: pdf[k] for k in by_cols},
                order_col: pdf[order_col],
                "_ck": pdf["_ck"],
                "_pos": pdf["_pos"],
                "_v": v,
                "_v2": v2,
                "_sy": sy,
                "_syy": syy,
            }
        )

    sch = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in by_cols]
        + [
            f"`{order_col}` {df.schema[order_col].dataType.simpleString()}",
            "`_ck` long",
            "`_pos` long",
            "`_v` double",
            "`_v2` double",
            "`_sy` double",
            "`_syy` double",
        ]
    )
    scanned = d.groupBy(*by_cols, "_ck").applyInPandas(local_scan, schema=sch)

    summary = scanned.groupBy(*by_cols, "_ck").agg(
        F.max_by("_v", "_pos").alias("_vl"),
        F.max_by("_v2", "_pos").alias("_v2l"),
        F.max_by("_sy", "_pos").alias("_syl"),
        F.max_by("_syy", "_pos").alias("_syyl"),
    )
    a = summary.select(*by_cols, "_ck")
    b = summary.select(
        *[F.col(c).alias(f"_b_{c}") for c in by_cols],
        F.col("_ck").alias("_ckb"),
        "_vl",
        "_v2l",
        "_syl",
        "_syyl",
    )
    cond = [F.col(f"_b_{c}") == F.col(c) for c in by_cols] + [F.col("_ckb") < F.col("_ck")]
    gap = (F.col("_ck") - F.col("_ckb") - 1) * chunk_rows
    carries = (
        a.join(b, cond, "left")
        .groupBy(*by_cols, "_ck")
        .agg(
            F.coalesce(F.sum(F.col("_vl") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_cv"),
            F.coalesce(F.sum(F.col("_v2l") * F.pow(F.lit(q2), gap)), F.lit(0.0)).alias("_cv2"),
            F.coalesce(F.sum(F.col("_syl") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_csy"),
            F.coalesce(F.sum(F.col("_syyl") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_csyy"),
        )
    )
    outdf = scanned.join(F.broadcast(carries), [*by_cols, "_ck"])
    qp = F.pow(F.lit(q), F.col("_pos"))
    qp2 = F.pow(F.lit(q2), F.col("_pos"))
    V = F.col("_v") + qp * F.col("_cv")
    V2 = F.col("_v2") + qp2 * F.col("_cv2")
    Sy = F.col("_sy") + qp * F.col("_csy")
    Syy = F.col("_syy") + qp * F.col("_csyy")
    rn = F.col("_ck") * chunk_rows + F.col("_pos")
    m = Sy / V
    var = F.greatest(Syy / V - m * m, F.lit(0.0)) * V * V / (V * V - V2)
    std = F.when((rn > 1) & (V * V > V2), F.sqrt(var))
    return outdf.select(*by_cols, order_col, std.alias(out))


def ewmst_parallel(
    df: DataFrame,
    ts_col: str,
    y_col: str,
    halflife_ns: float,
    chunk_rows: int = 4096,
    by: str | None = None,
    out: str = "ewmst",
    coarse_span: int = 86_400_000_000_000,
) -> DataFrame:
    """EXACT parallel time-decay EW std (:func:`ewmst` semantics) — the
    reference's volatility estimator for TBM targets, parallel within
    one symbol with zero truncation.

    All four moments are ABSOLUTE-TIME decayed sums over non-NaN
    samples: M_t = Σ_i f(y_i)·exp(−λ(t − t_i)) (V2 with 2λ), because
    the per-step decays exp(−λΔ) telescope. So chunks (by exact global
    row number) scan locally from zero state, and the cross-chunk carry
    anchored at T_ref(c) = the latest sample time before chunk c is

        C_M(c) = Σ_{j<c} M_end(j)·exp(−λ(T_ref(c) − T_j))

    — which IS the combined end-state of the previous chunks, so the
    per-row combine is one decay factor exp(−λ(t − T_ref)). Exponents
    are never positive: no overflow, and terms underflow to zero
    exactly at the estimator's memory horizon. NaN inputs emit the
    previous sample's std (sequential semantics) via an ignore-nulls
    forward fill within the chunk, falling back to the carry's own std
    at chunk heads; rows before any sample stay NULL.

    Caveat (documented, irrelevant for distinct-timestamp bar data): if
    two samples share one timestamp the V²>V2 guard can suppress a
    mid-series std, and a NaN immediately after would fill from an
    older value than the sequential kernel's NaN.
    """
    from .chunked_window import with_global_row_number

    lam = math.log(2.0) / float(halflife_ns)
    by_cols = [by] if by else []
    if by:
        d = df.withColumn(
            "_rn", F.row_number().over(Window.partitionBy(by).orderBy(ts_col))
        )
    else:
        d = with_global_row_number(df, ts_col, coarse_span=coarse_span, rn_col="_rn")
    d = d.withColumn("_ck", F.floor((F.col("_rn") - 1) / chunk_rows))

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col).reset_index(drop=True)
        t = pdf[ts_col].to_numpy(dtype=np.int64)
        y = pdf[y_col].to_numpy(dtype=np.float64)
        n = len(y)
        Vv = np.full(n, np.nan)
        V2v = np.full(n, np.nan)
        Syv = np.full(n, np.nan)
        Syyv = np.full(n, np.nan)
        V = V2 = Sy = Syy = 0.0
        prev_t = None
        for i in range(n):
            if np.isnan(y[i]):
                continue
            dec = 1.0 if prev_t is None else math.exp(-lam * (t[i] - prev_t))
            V = 1.0 + dec * V
            V2 = 1.0 + dec * dec * V2
            Sy = y[i] + dec * Sy
            Syy = y[i] * y[i] + dec * Syy
            prev_t = t[i]
            Vv[i], V2v[i], Syv[i], Syyv[i] = V, V2, Sy, Syy
        return pd.DataFrame(
            {
                **{k: pdf[k] for k in by_cols},
                ts_col: pdf[ts_col],
                "_ck": pdf["_ck"],
                "_y": y,
                "_v": Vv,
                "_v2": V2v,
                "_sy": Syv,
                "_syy": Syyv,
            }
        )

    sch = ", ".join(
        [f"`{c}` {df.schema[c].dataType.simpleString()}" for c in by_cols]
        + [
            f"`{ts_col}` {df.schema[ts_col].dataType.simpleString()}",
            "`_ck` long",
            "`_y` double",
            "`_v` double",
            "`_v2` double",
            "`_sy` double",
            "`_syy` double",
        ]
    )
    scanned = d.groupBy(*by_cols, "_ck").applyInPandas(local_scan, schema=sch)

    nn = scanned.where(~F.isnan("_v") & F.col("_v").isNotNull())
    summary = nn.groupBy(*by_cols, "_ck").agg(
        F.max(ts_col).alias("_T"),
        F.max_by("_v", ts_col).alias("_vl"),
        F.max_by("_v2", ts_col).alias("_v2l"),
        F.max_by("_sy", ts_col).alias("_syl"),
        F.max_by("_syy", ts_col).alias("_syyl"),
    )
    a = summary.select(*by_cols, "_ck")
    b = summary.select(
        *[F.col(c).alias(f"_b_{c}") for c in by_cols],
        F.col("_ck").alias("_ckb"),
        F.col("_T").alias("_Tb"),
        "_vl",
        "_v2l",
        "_syl",
        "_syyl",
    )
    cond = [F.col(f"_b_{c}") == F.col(c) for c in by_cols] + [F.col("_ckb") < F.col("_ck")]
    tref = (
        a.join(b, cond, "left")
        .groupBy(*by_cols, "_ck")
        .agg(F.max("_Tb").alias("_Tref"))
    )
    # second triangular pass: decayed sums anchored at T_ref(c)
    dec1 = F.exp(-lam * (F.col("_Tref") - F.col("_Tb")))
    dec2 = F.exp(-2.0 * lam * (F.col("_Tref") - F.col("_Tb")))
    carries = (
        tref.join(b, cond, "left")
        .groupBy(*by_cols, "_ck", "_Tref")
        .agg(
            F.coalesce(F.sum(F.col("_vl") * dec1), F.lit(0.0)).alias("_cv"),
            F.coalesce(F.sum(F.col("_v2l") * dec2), F.lit(0.0)).alias("_cv2"),
            F.coalesce(F.sum(F.col("_syl") * dec1), F.lit(0.0)).alias("_csy"),
            F.coalesce(F.sum(F.col("_syyl") * dec1), F.lit(0.0)).alias("_csyy"),
        )
    )

    def _std(V, V2, Sy, Syy):
        m = Sy / V
        var = F.greatest(Syy / V - m * m, F.lit(0.0)) * V * V / (V * V - V2)
        return F.when((V > 0) & (V * V > V2), F.sqrt(var))

    outdf = scanned.join(F.broadcast(carries), [*by_cols, "_ck"], "left")
    has_c = F.col("_Tref").isNotNull()
    # NB: Arrow maps the kernel's NaN to Spark NULL, and Spark's
    # isnan(NULL) is FALSE — so the sample test must check BOTH
    is_sample = F.col("_y").isNotNull() & ~F.isnan("_y")
    rdec1 = F.when(has_c, F.exp(-lam * (F.col(ts_col) - F.col("_Tref")))).otherwise(F.lit(0.0))
    rdec2 = F.when(has_c, F.exp(-2.0 * lam * (F.col(ts_col) - F.col("_Tref")))).otherwise(F.lit(0.0))
    V = F.when(is_sample, F.col("_v")).otherwise(F.lit(0.0)) + rdec1 * F.coalesce("_cv", F.lit(0.0))
    V2 = F.when(is_sample, F.col("_v2")).otherwise(F.lit(0.0)) + rdec2 * F.coalesce("_cv2", F.lit(0.0))
    Sy = F.when(is_sample, F.col("_sy")).otherwise(F.lit(0.0)) + rdec1 * F.coalesce("_csy", F.lit(0.0))
    Syy = F.when(is_sample, F.col("_syy")).otherwise(F.lit(0.0)) + rdec1 * F.coalesce("_csyy", F.lit(0.0))
    std_sample = F.when(is_sample, _std(V, V2, Sy, Syy))
    outdf = outdf.withColumn("_std_s", std_sample)
    wfill = Window.partitionBy(*by_cols, "_ck").orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    carry_std = _std(
        F.col("_cv"), F.col("_cv2"), F.col("_csy"), F.col("_csyy")
    )
    filled = F.when(
        is_sample, F.col("_std_s")
    ).otherwise(
        F.coalesce(F.last("_std_s", ignorenulls=True).over(wfill), F.when(has_c, carry_std))
    )
    return outdf.select(*by_cols, ts_col, filled.alias(out))


def rsi_parallel(
    df: DataFrame,
    close_col: str,
    n: int,
    order_col: str = "ts_ns",
    chunk_rows: int = 4096,
    out: str = "rsi",
    rn_col: str | None = None,
    coarse_span: int = 86_400_000_000_000,
) -> DataFrame:
    """EXACT parallel Wilder RSI — same two-pass closed-combine scan as
    :func:`ewma_parallel`, single symbol, zero truncation.

    After its SMA seed, each Wilder average is one linear recurrence
    avg_t = q·avg_{t−1} + x_t/n (q = (n−1)/n). Chunk 0 runs the true
    seeded recurrence sequentially (the seed never crosses a chunk:
    ``chunk_rows`` must exceed n); later chunks compute local decayed
    sums at C speed, and the carry is the usual triangular combine —
    chunk 0's summary contribution is its true seeded end state, so
    the expansion reproduces the seeded recurrence everywhere. Each
    chunk reads ONE warmup row (previous close) for its first diff via
    ``chunked_window.with_row_chunks(warmup=1)``.

    ``rn_col`` optionally exposes the exact global row number (for
    warmup filtering downstream). Parity vs :func:`rsi_wilder` is float
    reassociation only.
    """
    from .chunked_window import CHUNK, GLOBAL_RN, WARM, with_row_chunks

    if chunk_rows <= n + 1:
        raise ValueError(f"chunk_rows ({chunk_rows}) must exceed n+1 ({n + 1})")
    q = (n - 1.0) / n
    d = with_row_chunks(
        df, order_col, warmup=1, chunk_rows=chunk_rows, coarse_span=coarse_span
    )

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(GLOBAL_RN).reset_index(drop=True)
        close = pdf[close_col].to_numpy(dtype=np.float64)
        warm = pdf[WARM].to_numpy(dtype=bool)
        ck = int(pdf[CHUNK].iloc[0])
        diff = np.diff(close, prepend=np.nan)
        gain = np.where(diff > 0, diff, 0.0)
        loss = np.where(diff < 0, -diff, 0.0)
        real = ~warm
        g, l = gain[real], loss[real]
        m = len(g)
        if ck == 0:
            ag = np.full(m, np.nan)
            al = np.full(m, np.nan)
            if m > n:
                a_g = g[1 : n + 1].mean()
                a_l = l[1 : n + 1].mean()
                ag[n], al[n] = a_g, a_l
                for i in range(n + 1, m):
                    a_g = ((n - 1) * a_g + g[i]) / n
                    a_l = ((n - 1) * a_l + l[i]) / n
                    ag[i], al[i] = a_g, a_l
        else:
            p = np.arange(1, m + 1, dtype=np.float64)
            scale = 1.0 - q**p
            ag = pd.Series(g).ewm(alpha=1.0 / n, adjust=True).mean().to_numpy() * scale
            al = pd.Series(l).ewm(alpha=1.0 / n, adjust=True).mean().to_numpy() * scale
        return pd.DataFrame(
            {
                order_col: pdf[order_col].to_numpy()[real],
                "_rng": pdf[GLOBAL_RN].to_numpy()[real],
                "_ck": ck,
                "_pos": np.arange(1, m + 1),
                "_lg": ag,
                "_ll": al,
            }
        )

    sch = ", ".join(
        [
            f"`{order_col}` {df.schema[order_col].dataType.simpleString()}",
            "`_rng` long",
            "`_ck` long",
            "`_pos` long",
            "`_lg` double",
            "`_ll` double",
        ]
    )
    scanned = d.groupBy(CHUNK).applyInPandas(local_scan, schema=sch)

    summary = scanned.groupBy("_ck").agg(
        F.max_by("_lg", "_pos").alias("_lgl"),
        F.max_by("_ll", "_pos").alias("_lll"),
    )
    a = summary.select("_ck")
    b = summary.select(
        F.col("_ck").alias("_ckb"), "_lgl", "_lll"
    )
    gap = (F.col("_ck") - F.col("_ckb") - 1) * chunk_rows
    carries = (
        a.join(b, F.col("_ckb") < F.col("_ck"), "left")
        .groupBy("_ck")
        .agg(
            F.coalesce(F.sum(F.col("_lgl") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_cg"),
            F.coalesce(F.sum(F.col("_lll") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_cl"),
        )
    )
    outdf = scanned.join(F.broadcast(carries), ["_ck"])
    qp = F.pow(F.lit(q), F.col("_pos"))
    ag = F.col("_lg") + qp * F.col("_cg")
    al = F.col("_ll") + qp * F.col("_cl")
    # Scale-invariant form: 100·(ag/(ag+al)) == 100 − 100/(1 + ag/al) but never
    # forms the ag/al quotient; the bounded quotient ag/(ag+al) ∈ [0,1] is
    # formed FIRST so neither factor can overflow (100·ag would hit +Inf
    # above ~1.8e306 if multiplied before dividing).
    rsi = F.when(al == 0, F.lit(100.0)).otherwise(100.0 * (ag / (ag + al)))
    cols = [order_col, rsi.alias(out)]
    if rn_col:
        cols.insert(1, F.col("_rng").alias(rn_col))
    return outdf.select(*cols)


def atr_ema_parallel(
    df: DataFrame,
    n: int,
    order_col: str = "ts_ns",
    high_col: str = "high",
    low_col: str = "low",
    close_col: str = "close",
    chunk_rows: int = 4096,
    out: str = "atr",
    rn_col: str | None = None,
    coarse_span: int = 86_400_000_000_000,
) -> DataFrame:
    """EXACT parallel Wilder EMA ATR — the single-recurrence sibling of
    :func:`rsi_parallel`: chunk 0 runs the true SMA-seeded fold, later
    chunks fold the linear recurrence atr_t = q·atr_{t−1} + tr_t/n via
    local decayed sums + triangular carries; each chunk reads ONE
    warmup row for its first true-range's previous close. Rows where
    the sequential kernel emits NaN (the first n) are dropped, matching
    the registry query's non-null contract.
    """
    from .chunked_window import CHUNK, GLOBAL_RN, WARM, with_row_chunks

    if chunk_rows <= n + 1:
        raise ValueError(f"chunk_rows ({chunk_rows}) must exceed n+1 ({n + 1})")
    q = (n - 1.0) / n
    d = with_row_chunks(
        df, order_col, warmup=1, chunk_rows=chunk_rows, coarse_span=coarse_span
    )

    def local_scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(GLOBAL_RN).reset_index(drop=True)
        tr_all = true_range_np(
            pdf[high_col].to_numpy(dtype=np.float64),
            pdf[low_col].to_numpy(dtype=np.float64),
            pdf[close_col].to_numpy(dtype=np.float64),
        )
        warm = pdf[WARM].to_numpy(dtype=bool)
        ck = int(pdf[CHUNK].iloc[0])
        tr = tr_all[~warm]
        m = len(tr)
        if ck == 0:
            vals = np.full(m, np.nan)
            if m > n:
                a = 0.0
                for i in range(1, n + 1):
                    a = a + tr[i]
                a = a / n
                vals[n] = a
                for i in range(n + 1, m):
                    a = ((n - 1) * a + tr[i]) / n
                    vals[i] = a
        else:
            p = np.arange(1, m + 1, dtype=np.float64)
            vals = (
                pd.Series(tr).ewm(alpha=1.0 / n, adjust=True).mean().to_numpy()
                * (1.0 - q**p)
            )
        return pd.DataFrame(
            {
                order_col: pdf[order_col].to_numpy()[~warm],
                "_rng": pdf[GLOBAL_RN].to_numpy()[~warm],
                "_ck": ck,
                "_pos": np.arange(1, m + 1),
                "_lt": vals,
            }
        )

    sch = ", ".join(
        [
            f"`{order_col}` {df.schema[order_col].dataType.simpleString()}",
            "`_rng` long",
            "`_ck` long",
            "`_pos` long",
            "`_lt` double",
        ]
    )
    scanned = d.groupBy(CHUNK).applyInPandas(local_scan, schema=sch)
    summary = scanned.groupBy("_ck").agg(F.max_by("_lt", "_pos").alias("_ltl"))
    a = summary.select("_ck")
    b = summary.select(F.col("_ck").alias("_ckb"), "_ltl")
    gap = (F.col("_ck") - F.col("_ckb") - 1) * chunk_rows
    carries = (
        a.join(b, F.col("_ckb") < F.col("_ck"), "left")
        .groupBy("_ck")
        .agg(F.coalesce(F.sum(F.col("_ltl") * F.pow(F.lit(q), gap)), F.lit(0.0)).alias("_ct"))
    )
    outdf = scanned.join(F.broadcast(carries), ["_ck"])
    atr = F.col("_lt") + F.pow(F.lit(q), F.col("_pos")) * F.col("_ct")
    cols = [order_col, atr.alias(out)]
    if rn_col:
        cols.insert(1, F.col("_rng").alias(rn_col))
    return outdf.select(*cols).where(F.col(out).isNotNull() & ~F.isnan(out))


# --- Wilder recurrences -----------------------------------------------------

def rsi_wilder(close: np.ndarray, n: int) -> np.ndarray:
    """RSI with Wilder smoothing: seed = SMA of first n gains/losses, then
    avg = ((n−1)·avg + x)/n. NaN for the first n rows."""
    diff = np.diff(close, prepend=np.nan)
    gain = np.where(diff > 0, diff, 0.0)
    loss = np.where(diff < 0, -diff, 0.0)
    out = np.full(len(close), np.nan)
    if len(close) <= n:
        return out
    ag = np.mean(gain[1 : n + 1])
    al = np.mean(loss[1 : n + 1])
    for i in range(n, len(close)):
        if i > n:
            ag = ((n - 1) * ag + gain[i]) / n
            al = ((n - 1) * al + loss[i]) / n
        out[i] = 100.0 if al == 0 else 100.0 * (ag / (ag + al))
    return out


def true_range_np(high, low, close):
    pc = np.roll(close, 1)
    pc[0] = np.nan
    return np.nanmax(
        np.stack([high - low, np.abs(high - pc), np.abs(low - pc)]), axis=0
    )


def atr_ema(high: np.ndarray, low: np.ndarray, close: np.ndarray, n: int) -> np.ndarray:
    """Wilder EMA ATR: seed = SMA of first n TRs, then ((n−1)·atr + tr)/n."""
    tr = true_range_np(high, low, close)
    out = np.full(len(close), np.nan)
    if len(close) <= n:
        return out
    # Sequential-order seed sum (not np.mean): np.mean's unrolled/pairwise
    # accumulation rounds differently from a left-to-right fold, and the
    # DuckDB recursive-CTE oracle replays the fold — keep both bit-identical.
    a = 0.0
    for i in range(1, n + 1):
        a = a + tr[i]
    a = a / n
    out[n] = a
    for i in range(n + 1, len(close)):
        a = ((n - 1) * a + tr[i]) / n
        out[i] = a
    return out


def adx(high: np.ndarray, low: np.ndarray, close: np.ndarray, n: int) -> np.ndarray:
    """ADX: Wilder-accumulated TR/±DM → DI± → DX → Wilder-smoothed ADX."""
    m = len(close)
    tr = true_range_np(high, low, close)
    up = high - np.roll(high, 1)
    dn = np.roll(low, 1) - low
    up[0] = dn[0] = np.nan
    pdm = np.where((up > dn) & (up > 0), up, 0.0)
    ndm = np.where((dn > up) & (dn > 0), dn, 0.0)
    out = np.full(m, np.nan)
    if m <= 2 * n:
        return out
    str_, spdm, sndm = np.sum(tr[1 : n + 1]), np.sum(pdm[1 : n + 1]), np.sum(ndm[1 : n + 1])
    dx = np.full(m, np.nan)
    for i in range(n + 1, m):
        str_ = str_ - str_ / n + tr[i]
        spdm = spdm - spdm / n + pdm[i]
        sndm = sndm - sndm / n + ndm[i]
        pdi = 100.0 * spdm / str_ if str_ > 0 else 0.0
        ndi = 100.0 * sndm / str_ if str_ > 0 else 0.0
        dx[i] = 100.0 * abs(pdi - ndi) / (pdi + ndi) if (pdi + ndi) > 0 else 0.0
    a = np.mean(dx[n + 1 : 2 * n + 1])
    out[2 * n] = a
    for i in range(2 * n + 1, m):
        a = ((n - 1) * a + dx[i]) / n
        out[i] = a
    return out


# --- CUSUM state machines ---------------------------------------------------

def cusum_filter_state(
    r: np.ndarray, thr: np.ndarray, sp: float, sn: float
) -> tuple[np.ndarray, float, float]:
    """:func:`cusum_filter_np` body with an explicit entry state —
    the chunk-stitch building block. Returns (flags, sp_exit, sn_exit)."""
    out = np.zeros(len(r), dtype=np.int32)
    for i in range(len(r)):
        if np.isnan(r[i]):
            continue
        sp = max(0.0, sp + r[i])
        sn = min(0.0, sn + r[i])
        # reference order/strictness (filters.py:48-55): negative side
        # first, strict comparisons (both can never trigger in one step —
        # post-check invariants sp <= thr, sn >= -thr make a same-step
        # double trigger need r > 0 and r < 0 at once)
        if sn < -thr[i]:
            out[i] = 1
            sn = 0.0
        elif sp > thr[i]:
            out[i] = 1
            sp = 0.0
    return out, sp, sn


def cusum_filter_np(r: np.ndarray, threshold: float | np.ndarray) -> np.ndarray:
    """Symmetric CUSUM filter on (log) returns (AFML snippet 2.4;
    reference ``sampling/filters.py:6-70``): S± accumulate, reset on
    trigger; returns 0/1 event flags."""
    thr = np.broadcast_to(np.asarray(threshold, dtype=float), r.shape)
    return cusum_filter_state(r, thr, 0.0, 0.0)[0]


def cusum_bar_state(
    r: np.ndarray,
    sigma: np.ndarray,
    mult: float,
    floor_thr: float,
    sp: float,
    sn: float,
    last_sig: float,
) -> tuple[np.ndarray, float, float, float, int]:
    """:func:`cusum_bar_ids` body with an explicit entry state — the
    chunk-stitch building block. Local bar ids start at 0; returns
    (local_ids, sp_exit, sn_exit, last_sig_exit, bars_closed)."""
    out = np.zeros(len(r), dtype=np.int64)
    bar = 0
    for i in range(len(r)):
        sig = sigma[i]
        if np.isnan(sig):
            sig = last_sig
        else:
            last_sig = sig
        thr = max(mult * sig, floor_thr)
        x = 0.0 if np.isnan(r[i]) else r[i]
        sp = max(0.0, sp + x)
        sn = min(0.0, sn + x)
        out[i] = bar  # the triggering row closes ITS bar (end-inclusive)
        if sp >= thr or sn <= -thr:
            sp = sn = 0.0
            bar += 1
    return out, sp, sn, last_sig, bar


def cusum_bar_ids(
    r: np.ndarray, sigma: np.ndarray, mult: float, floor_thr: float
) -> np.ndarray:
    """CUSUM bar indexer with adaptive threshold max(mult·σ_i, floor)
    (reference ``logic.py:152-221``): NaN σ carries the last valid value;
    bar id increments on trigger."""
    return cusum_bar_state(r, sigma, mult, floor_thr, 0.0, 0.0, floor_thr)[0]


def volume_bar_ids_exact(qty: np.ndarray, threshold: float) -> np.ndarray:
    """Exact reset-to-zero volume bar indexer (reference ``logic.py:87-115``:
    cumulative volume resets to 0 on close — no carry-over)."""
    out = np.empty(len(qty), dtype=np.int64)
    cum = 0.0
    bar = 0
    for i in range(len(qty)):
        cum += qty[i]
        out[i] = bar
        if cum >= threshold:
            bar += 1
            cum = 0.0
    return out


def imbalance_bar_ids(
    side: np.ndarray, qty: np.ndarray, ewma_span: float = 100.0, init_expected: float = 100.0
) -> np.ndarray:
    """Volume-imbalance bars (AFML §2.3.2.1; the reference only declares
    this sampler, ``logic.py:224-241`` NotImplementedError — implemented
    here beyond-reference): close a bar when |Σ signed volume| exceeds
    the expected imbalance, E updated as an EWMA of realized per-bar
    |imbalance| (adjust=False, span ``ewma_span``)."""
    alpha = 2.0 / (ewma_span + 1.0)
    out = np.empty(len(side), dtype=np.int64)
    theta = 0.0
    expected = init_expected
    bar = 0
    for i in range(len(side)):
        theta += side[i] * qty[i]
        out[i] = bar
        if abs(theta) >= expected:
            expected = (1 - alpha) * expected + alpha * abs(theta)
            theta = 0.0
            bar += 1
    return out


def run_bar_ids(
    side: np.ndarray, qty: np.ndarray, ewma_span: float = 100.0, init_expected: float = 100.0
) -> np.ndarray:
    """Volume-run bars (AFML §2.3.2.2; reference ``logic.py:244-261``
    NotImplementedError — implemented beyond-reference): track the max of
    one-sided cumulative volumes within the bar; close when it exceeds
    the expected run, E updated as EWMA of realized runs."""
    alpha = 2.0 / (ewma_span + 1.0)
    out = np.empty(len(side), dtype=np.int64)
    buy = sell = 0.0
    expected = init_expected
    bar = 0
    for i in range(len(side)):
        if side[i] > 0:
            buy += qty[i]
        else:
            sell += qty[i]
        out[i] = bar
        run = max(buy, sell)
        if run >= expected:
            expected = (1 - alpha) * expected + alpha * run
            buy = sell = 0.0
            bar += 1
    return out


# --- chunked CUSUM scale-out (round 6) --------------------------------------
#
# The CUSUM family's reset state machines have no closed combine (the
# round-4/5 escape hatch for EWMA/EWMS/EWMST/RSI/ATR), so one huge
# symbol used to mean one task. The stitch: time-chunk the stream, run
# every chunk's kernel in parallel from an ENTRY-STATE GUESS, collect
# the k chunk exit states (k rows — scalar-tier driver traffic, the
# connected-components precedent), chain them in chunk order on the
# driver, and re-run only the chunks whose entry changed — a fixed
# point that is provably reached in <= k rounds (chunk c's entry is
# exact once chunks 1..c-1 are), and in practice in 2-3 because a reset
# inside a chunk makes everything after it entry-independent. The
# converged entries then feed ONE final flags/ids pass. Worst case
# (a degenerate stream that never triggers) degrades to sequential-
# equivalent total work spread over rounds; typical streams trigger
# every few hundred rows and converge immediately.

def _state_eq(a: tuple, b: tuple) -> bool:
    """Elementwise state equality with NaN == NaN (states are exact
    float/int replays, so bitwise-style equality is the right test)."""
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float) \
                and math.isnan(x) and math.isnan(y):
            continue
        return False
    return True


class _ChunkStitch:
    """Entry-state fixed-point engine over time chunks of one stream.

    ``d`` is a persisted projection carrying ``_ck`` (the time-chunk id)
    plus the kernel's input columns. ``kernel(pdf, entry) -> (exit,
    count)`` replays the sequential state machine over one chunk from an
    explicit entry state. ``state_types`` gives each state field's Spark
    type — exact-integer fields (e.g. the EWMST ``prev_t`` anchor, whose
    ns magnitude exceeds double's 2^53 integer range) MUST be ``long``.

    Round 1 runs EVERY chunk from the seed state in one job (this also
    discovers the chunk list — no separate distinct() pass); each later
    round chains the k exit states on the driver (k rows — scalar-tier
    traffic, the connected-components precedent) and re-runs only chunks
    whose entry changed. Chunk c's entry is exact once chunks 1..c-1
    are, so <= k rounds always converge; in practice 2-3 because a reset
    (or, for decayed moments, float absorption of the entry term) makes
    a chunk's exit entry-independent. ``solve`` returns ordered
    ``[(ck, converged_entry, count_prefix)]`` for the final output pass.
    """

    def __init__(self, d: DataFrame, order_col: str, state0: tuple,
                 state_types: list[str], kernel):
        self.d, self.order_col = d, order_col
        self.state0, self.types, self.kernel = state0, state_types, kernel
        self.spark = d.sparkSession
        n = len(state0)
        self.ent_sch = "_ck long, " + ", ".join(
            f"_e{i} {t}" for i, t in enumerate(state_types))
        self.out_sch = "_ck long, " + ", ".join(
            f"_x{i} {t}" for i, t in enumerate(state_types)) + ", _nb long"
        order, kern = order_col, kernel

        def k(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order).reset_index(drop=True)
            entry = tuple(pdf[f"_e{i}"].iloc[0].item() for i in range(n))
            ex, nb = kern(pdf, entry)
            row = {"_ck": [int(pdf["_ck"].iloc[0])], "_nb": [int(nb)]}
            row.update({f"_x{i}": [ex[i]] for i in range(n)})
            return pd.DataFrame(row)

        self._k = k

    def _coerce(self, state: tuple) -> tuple:
        return tuple(
            int(x) if t in ("long", "bigint", "int") else float(x)
            for x, t in zip(state, self.types)
        )

    def with_entries(self, rows: list[tuple]) -> DataFrame:
        """Join per-chunk entry rows (ck, *state[, extra]) onto ``d``."""
        sch = self.ent_sch + (", _base long" if len(rows[0]) > len(self.types) + 1
                              else "")
        ent = self.spark.createDataFrame(rows, sch)
        return self.d.join(F.broadcast(ent), "_ck")

    def _run(self, stale, entries) -> dict:
        if stale is None:  # round 1: every chunk from the seed state
            lits = {
                f"_e{i}": F.lit(x).cast(t)
                for i, (x, t) in enumerate(zip(self._coerce(self.state0),
                                               self.types))
            }
            dd = self.d.withColumns(lits)
        else:
            dd = self.with_entries(
                [(int(ck), *self._coerce(entries[ck])) for ck in stale])
        rows = dd.groupBy("_ck").applyInPandas(self._k, self.out_sch).collect()
        n = len(self.state0)
        return {r["_ck"]: (tuple(r[f"_x{i}"] for i in range(n)), r["_nb"])
                for r in rows}

    def solve(self) -> list[tuple[int, tuple, int]]:
        got = self._run(None, {})
        cks = sorted(got)
        if not cks:
            return []
        cache = {ck: (self.state0, got[ck]) for ck in cks}
        for _ in range(len(cks) + 1):
            entries: dict[int, tuple] = {}
            e = self.state0
            stale: list[int] = []
            for ck in cks:
                entries[ck] = e
                ent_used, (ex, _nb) = cache[ck]
                if not _state_eq(ent_used, e):
                    stale.append(ck)
                # downstream chaining guess: the last computed exit —
                # exact when this chunk's entry was, else refined next
                # round
                e = ex
            if not stale:
                base, out = 0, []
                for ck in cks:
                    out.append((ck, entries[ck], base))
                    base += cache[ck][1][1]
                return out
            got = self._run(stale, entries)
            for ck, exnb in got.items():
                cache[ck] = (entries[ck], exnb)
        raise RuntimeError("cusum chunk stitch did not converge "
                           "(impossible: bounded by chunk count)")


def _chunked_projection(df: DataFrame, order_col: str, cols: list[str],
                        chunk_ns: int, persist: bool) -> DataFrame:
    d = df.select(order_col, *cols).withColumn(
        "_ck", F.floor(F.col(order_col) / F.lit(int(chunk_ns)))
    )
    if persist:
        from .. import cache as _cache

        d = _cache.keep(d)
    return d


def cusum_filter_chunked(
    df: DataFrame,
    threshold: float | None = None,
    r_col: str = "r",
    order_col: str = "ts_ns",
    chunk_ns: int = 86_400_000_000_000,
    thr_col: str | None = None,
    persist: bool = True,
) -> DataFrame:
    """Symmetric CUSUM filter (:func:`cusum_filter_np` semantics,
    reference ``sampling/filters.py:6-70``) for ONE huge un-partitioned
    stream: time-chunked parallel kernel runs + the driver-chained
    entry-state fixed point (:class:`_ChunkStitch`) — bit-identical to
    the single-task kernel (differential-tested). ``thr_col`` selects
    the vector-threshold form; otherwise ``threshold`` is the constant
    h. The projected input is persisted across the stitch rounds unless
    ``persist=False``. Returns (order_col, flag)."""
    if (threshold is None) == (thr_col is None):
        raise ValueError("pass exactly one of threshold / thr_col")
    cols = [r_col] + ([thr_col] if thr_col else [])
    d = _chunked_projection(df, order_col, cols, chunk_ns, persist)

    def _thr_arr(pdf):
        if thr_col:
            return pdf[thr_col].to_numpy(np.float64)
        return np.full(len(pdf), float(threshold))

    def kern(pdf, entry):
        _, sp, sn = cusum_filter_state(
            pdf[r_col].to_numpy(np.float64), _thr_arr(pdf), entry[0], entry[1]
        )
        return (sp, sn), 0

    st = _ChunkStitch(d, order_col, (0.0, 0.0), ["double", "double"], kern)
    solved = st.solve()
    if not solved:
        return d.select(order_col, F.lit(0).alias("flag")).where(F.lit(False))

    def k_final(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        flags, _, _ = cusum_filter_state(
            pdf[r_col].to_numpy(np.float64), _thr_arr(pdf),
            float(pdf["_e0"].iloc[0]), float(pdf["_e1"].iloc[0]),
        )
        return pd.DataFrame({order_col: pdf[order_col], "flag": flags})

    sch = f"`{order_col}` {df.schema[order_col].dataType.simpleString()}, flag int"
    return (
        st.with_entries([(int(ck), e[0], e[1]) for ck, e, _ in solved])
        .groupBy("_ck")
        .applyInPandas(k_final, sch)
    )


def cusum_bar_ids_chunked(
    df: DataFrame,
    mult: float,
    floor_thr: float,
    r_col: str = "r",
    sigma_col: str = "sigma",
    order_col: str = "ts_ns",
    chunk_ns: int = 86_400_000_000_000,
    persist: bool = True,
) -> DataFrame:
    """CUSUM bar indexer (:func:`cusum_bar_ids` semantics, reference
    ``logic.py:152-221``) over a PRECOMPUTED sigma column, for one huge
    stream via the chunk-entry fixed point; state = (sp, sn, last_sig).
    Global bar ids = local ids + the exclusive prefix of converged
    per-chunk bar counts (chained on the driver from the same k-row
    exits). When sigma itself is the reference's EWMST estimate, use
    :func:`cusum_adaptive_bars_chunked` — it carries the EWMST moments
    in the same stitch, keeping the whole composition bit-exact.
    Returns (order_col, bar_id)."""
    d = _chunked_projection(df, order_col, [r_col, sigma_col], chunk_ns, persist)

    def kern(pdf, entry):
        _, sp, sn, sig, bars = cusum_bar_state(
            pdf[r_col].to_numpy(np.float64),
            pdf[sigma_col].to_numpy(np.float64),
            mult, floor_thr, entry[0], entry[1], entry[2],
        )
        return (sp, sn, sig), bars

    st = _ChunkStitch(d, order_col, (0.0, 0.0, float(floor_thr)),
                      ["double"] * 3, kern)
    solved = st.solve()
    if not solved:
        return d.select(order_col, F.lit(0).cast("long").alias("bar_id")).where(
            F.lit(False)
        )

    def k_final(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        ids, *_ = cusum_bar_state(
            pdf[r_col].to_numpy(np.float64),
            pdf[sigma_col].to_numpy(np.float64),
            mult, floor_thr,
            float(pdf["_e0"].iloc[0]), float(pdf["_e1"].iloc[0]),
            float(pdf["_e2"].iloc[0]),
        )
        return pd.DataFrame(
            {order_col: pdf[order_col], "bar_id": ids + int(pdf["_base"].iloc[0])}
        )

    sch = f"`{order_col}` {df.schema[order_col].dataType.simpleString()}, bar_id long"
    return (
        st.with_entries([(int(ck), e[0], e[1], e[2], base) for ck, e, base in solved])
        .groupBy("_ck")
        .applyInPandas(k_final, sch)
    )


def ewmst_state(
    ts_ns: np.ndarray,
    y: np.ndarray,
    halflife_ns: float,
    V: float, V2: float, Sy: float, Syy: float,
    prev_t: int, last_out: float,
) -> tuple[np.ndarray, float, float, float, float, int, float]:
    """:func:`ewmst` body with an explicit entry state — the chunk-
    stitch building block. ``prev_t`` is the EXACT int64 ns anchor of
    the last non-NaN sample (< 0 = none yet: ns epochs exceed double's
    2^53 integer range, so it must never pass through a float);
    ``last_out`` is the previous emitted std for the NaN-carry. Returns
    (sigma, V, V2, Sy, Syy, prev_t, last_out) — bit-identical to the
    sequential kernel given the exact entry state (same op order)."""
    lam = math.log(2.0) / halflife_ns
    out = np.full(len(y), np.nan)
    for i in range(len(y)):
        if np.isnan(y[i]):
            if V != 0:
                out[i] = out[i - 1] if i > 0 else last_out
            continue
        d = 1.0 if prev_t < 0 else math.exp(-lam * (ts_ns[i] - prev_t))
        V = 1.0 + d * V
        V2 = 1.0 + d * d * V2
        Sy = y[i] + d * Sy
        Syy = y[i] * y[i] + d * Syy
        prev_t = int(ts_ns[i])
        if V * V > V2:
            m = Sy / V
            var = max(Syy / V - m * m, 0.0) * (V * V) / (V * V - V2)
            out[i] = math.sqrt(var)
    if len(y):
        last_out = float(out[-1])
    return out, V, V2, Sy, Syy, prev_t, last_out


def cusum_adaptive_bars_chunked(
    df: DataFrame,
    mult: float,
    floor_thr: float,
    halflife_ns: float,
    r_col: str = "r",
    order_col: str = "ts_ns",
    chunk_ns: int = 604_800_000_000_000,
    persist: bool = True,
) -> DataFrame:
    """The reference's full adaptive CUSUM bar indexer — σ = time-decay
    EW std of returns (halflife), threshold max(mult·σ, floor)
    (``bar/logic.py:152-221``) — for one huge stream, scaled out by
    carrying the FUSED state (EWMST moments V,V2,Sy,Syy + exact prev_t
    anchor + NaN-carry std + CUSUM sp,sn,last_sig) through the chunk
    stitch, so the composition replays the sequential
    ``ewmst -> cusum_bar_ids`` pipeline bit-for-bit. Convergence note:
    beyond a trigger reset, the EWMST entry terms decay as
    2^(−Δt/halflife) and are ABSORBED exactly by float addition once
    below one ulp of the local sums — pick ``chunk_ns`` ≫ halflife
    (default one week) and exits become entry-independent, so the fixed
    point lands in 2-3 rounds. Returns (order_col, bar_id)."""
    d = _chunked_projection(df, order_col, [r_col], chunk_ns, persist)
    state0 = (0.0, 0.0, 0.0, 0.0, -1, float("nan"), 0.0, 0.0, float(floor_thr))
    types = ["double"] * 4 + ["long"] + ["double"] * 4

    def kern(pdf, entry):
        V, V2, Sy, Syy, prev_t, last_out, sp, sn, last_sig = entry
        ts = pdf[order_col].to_numpy(np.int64)
        r = pdf[r_col].to_numpy(np.float64)
        sigma, V, V2, Sy, Syy, prev_t, last_out = ewmst_state(
            ts, r, halflife_ns, V, V2, Sy, Syy, int(prev_t), last_out
        )
        _, sp, sn, last_sig, bars = cusum_bar_state(
            r, sigma, mult, floor_thr, sp, sn, last_sig
        )
        return (V, V2, Sy, Syy, prev_t, last_out, sp, sn, last_sig), bars

    st = _ChunkStitch(d, order_col, state0, types, kern)
    solved = st.solve()
    if not solved:
        return d.select(order_col, F.lit(0).cast("long").alias("bar_id")).where(
            F.lit(False)
        )

    def k_final(pdf):
        pdf = pdf.sort_values(order_col).reset_index(drop=True)
        ts = pdf[order_col].to_numpy(np.int64)
        r = pdf[r_col].to_numpy(np.float64)
        sigma, *_ = ewmst_state(
            ts, r, halflife_ns,
            float(pdf["_e0"].iloc[0]), float(pdf["_e1"].iloc[0]),
            float(pdf["_e2"].iloc[0]), float(pdf["_e3"].iloc[0]),
            int(pdf["_e4"].iloc[0]), float(pdf["_e5"].iloc[0]),
        )
        ids, *_ = cusum_bar_state(
            r, sigma, mult, floor_thr,
            float(pdf["_e6"].iloc[0]), float(pdf["_e7"].iloc[0]),
            float(pdf["_e8"].iloc[0]),
        )
        return pd.DataFrame(
            {order_col: pdf[order_col], "bar_id": ids + int(pdf["_base"].iloc[0])}
        )

    sch = f"`{order_col}` {df.schema[order_col].dataType.simpleString()}, bar_id long"
    return (
        st.with_entries(
            [(int(ck), *st._coerce(e), base) for ck, e, base in solved]
        )
        .groupBy("_ck")
        .applyInPandas(k_final, sch)
    )


def cusum_test_chunked(
    df: DataFrame,
    w: int,
    warmup: int = 30,
    y_col: str = "close",
    order_col: str = "ts_ns",
    chunk_rows: int = 8192,
) -> DataFrame:
    """Chu-Stinchcombe-White rolling CUSUM statistic
    (:func:`cusum_test_rolling`, reference
    ``core/structural_break/cusum.py:11-274``) for one huge stream —
    NO fixed point needed: the statistic looks back exactly ``w`` rows
    (plus one for the diff), so the warmup-overlap row-chunk machinery
    (``functions.chunked_window``) reproduces the global kernel
    bit-for-bit. Rows below the global ``warmup`` index are dropped,
    exactly like the sequential form leaves them NaN-only.
    Returns (order_col, cusum_stat)."""
    from .chunked_window import CHUNK, GLOBAL_RN, WARM, with_row_chunks

    d = with_row_chunks(
        df.select(order_col, y_col), order_col, warmup=w + 1, chunk_rows=chunk_rows
    )

    def k(pdf):
        pdf = pdf.sort_values(GLOBAL_RN).reset_index(drop=True)
        y = pdf[y_col].to_numpy(np.float64)
        # local warmup 1 skips only the frameless first row; the global
        # warmup gate is applied on the exact global row number below
        stat = cusum_test_rolling(y, w, warmup=min(1, len(y)))
        out = pd.DataFrame(
            {order_col: pdf[order_col], "cusum_stat": stat,
             "_rn": pdf[GLOBAL_RN], "_warm": pdf[WARM]}
        )
        out = out[(~out["_warm"]) & (out["_rn"] > warmup)]
        return out[[order_col, "cusum_stat"]]

    sch = (
        f"`{order_col}` {df.schema[order_col].dataType.simpleString()}, "
        "cusum_stat double"
    )
    return d.groupBy(CHUNK).applyInPandas(k, sch)


# --- complexity / long-memory estimators -----------------------------------

def hurst_rolling(y: np.ndarray, w: int, lags=(1, 2, 4, 8)) -> np.ndarray:
    """Aggregated-variance Hurst exponent over a rolling window
    (reference ``transforms.py:1341``): for each window, var of m-lag
    differences for m in lags; H = OLS slope of log(var) vs log(m) / 2."""
    m = len(y)
    out = np.full(m, np.nan)
    lx = np.log(np.asarray(lags, dtype=float))
    for t in range(w - 1, m):
        win = y[t - w + 1 : t + 1]
        lv = []
        for lag_ in lags:
            d = win[lag_:] - win[:-lag_]
            v = np.var(d)
            if not v > 0:
                lv = None
                break
            lv.append(np.log(v))
        if lv is None:
            continue
        ly = np.asarray(lv)
        slope = np.polyfit(lx, ly, 1)[0]
        out[t] = slope / 2.0
    return out


def approx_entropy(win: np.ndarray, m: int = 2, r_mult: float = 0.2) -> float:
    """Pincus approximate entropy of one window: phi(m) − phi(m+1) with
    Chebyshev tolerance r = r_mult·std (reference wraps antropy;
    re-derived from the standard definition)."""
    n = len(win)
    r = r_mult * np.std(win)
    if not r > 0 or n <= m + 1:
        return float("nan")

    def phi(mm: int) -> float:
        emb = np.lib.stride_tricks.sliding_window_view(win, mm)
        dist = np.max(np.abs(emb[:, None, :] - emb[None, :, :]), axis=2)
        c = (dist <= r).mean(axis=1)
        return float(np.mean(np.log(c)))

    return phi(m) - phi(m + 1)


# --- CUSUM structural-break test -------------------------------------------

def cusum_test_rolling(y: np.ndarray, w: int, warmup: int = 30) -> np.ndarray:
    """Chu-Stinchcombe-White CUSUM test statistic over a rolling window
    (reference ``core/structural_break/cusum.py:11-274``):

        S_t = max_{s ∈ [t−w, t)} |y_t − y_s| / (σ̂_t · sqrt(t − s))

    with σ̂_t the std of 1-step diffs up to t (rolling w). Vectorized per
    row with NumPy broadcasting (O(w) per row, like the reference)."""
    m = len(y)
    out = np.full(m, np.nan)
    d = np.diff(y, prepend=np.nan)
    for t in range(warmup, m):
        lo = max(0, t - w)
        win = d[max(1, lo) : t + 1]
        sig = np.nanstd(win, ddof=1)
        if not sig > 0:
            continue
        s_idx = np.arange(lo, t)
        stats = np.abs(y[t] - y[s_idx]) / (sig * np.sqrt(t - s_idx))
        out[t] = np.max(stats)
    return out
