"""Footprint operators (SURVEY.md §2.4; reference ``base.py:615-850``).

The reference stores per-bar ragged arrays (price levels × buy/sell
volume/ticks). Spark-first design: a **long-form footprint table**
``(bar_close_ns, level, buy_vol, sell_vol, buy_ticks, sell_ticks)`` —
one groupBy away from trades, join/agg friendly, explodes ~levels× rows
instead of nesting. ``collect_list(struct(...))`` packing is offered
only at the API edge (``pack_footprint``) for pandas interop parity
with ``FootprintData.get_df`` (``bar/utils.py:129-209``).

Price levels are integer ticks (float-error avoidance, reference
``base.py:688-708``): level = round(price / tick) computed as
round(price · 1/tick) identically in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sqlstage import sql_stage


def footprint_long(trades_sided: DataFrame, tick: float, key: str = "bar_close_ns") -> DataFrame:
    """Trades (with side + bar key) -> long footprint table
    (``comp_bar_footprints`` ``base.py:615-752``): per (bar, level)
    buy/sell volume and tick counts. One hash aggregation, no state."""
    inv = 1.0 / tick
    lvl = F.round(F.col("price") * inv).cast("long")
    df = trades_sided.withColumn("level", lvl)
    return df.groupBy(key, "level").agg(
        F.sum(F.when(F.col("side") == 1, F.col("qty")).otherwise(0.0)).alias("buy_vol"),
        F.sum(F.when(F.col("side") == -1, F.col("qty")).otherwise(0.0)).alias("sell_vol"),
        F.sum(F.when(F.col("side") == 1, 1).otherwise(0)).cast("long").alias("buy_ticks"),
        F.sum(F.when(F.col("side") == -1, 1).otherwise(0)).cast("long").alias("sell_ticks"),
    )


def footprint_features(
    fp: DataFrame,
    imb_mult: float = 3.0,
    key: str = "bar_close_ns",
    tick: float = 0.01,
    bar_vwap: DataFrame | None = None,
    engine: str = "arrow",
) -> DataFrame:
    """Per-bar footprint features (``comp_footprint_features``
    ``base.py:755-850``):

    - diagonal imbalance flags: sell[l] > m·buy[l+1] (sell imbalance),
      buy[l] > m·sell[l−1] (buy imbalance) — lag/lead over the level
      window within the bar (``base.py:795-798``);
    - buy/sell imbalance counts; SIGNED longest imbalance run — buy
      priority on dual-imbalance levels, first maximal run wins ties
      (gaps-and-islands over levels, ``base.py:800-822``);
    - COT level = argmax total volume, lowest level on ties
      (``base.py:828-830``);
    - vp_skew: the reference computes Σ(level−level_vwap)·vol/Σvol, which
      is IDENTICALLY ZERO (deviation around its own weighted mean,
      ``base.py:838-843``); we fix the semantics by skewing around the
      bar's TRADE vwap (pass ``bar_vwap``); vp_var is the matching
      2nd moment Σv·(p−bar_vwap)²/Σv — the SHIFTED one-pass form, a
      sum of non-negative terms (no ``E[x²]−E[x]²`` cancellation: the
      naive form amplifies a 1-ulp pow() difference by mean²/var,
      which broke cross-engine parity at condition numbers ~1e12);
      NULL when no ``bar_vwap`` is supplied, like vp_skew; vp_gini =
      1−Σ(vol/Σvol)² (``base.py:845-848``).

    Late-r13 determinism rework: every moment term is HALF_UP-quantized
    to 1e6 integer units BEFORE summing (``floor(term·1e6 + 0.5)``, the
    ``embedding_outliers`` discipline), so the sums are exact integers
    in ANY fold order and the final ratios are one identical double
    expression in both engines — the float form's last-ulp fold-order
    drift (which could flip a value sitting exactly on a round(·,6)
    boundary: the one documented sf0.1 miss) is gone by construction.
    Exactness bound: |term|·1e6 < 2^63 per level (per-level vol ≤ ~3e6
    and |p−vwap|²·vol ≤ ~9e12); the SQL engine folds decimal(38,0) and
    the Arrow kernel int64 — identical through the shared regime.

    Two engines, bit-identical outputs (pinned by test):

    - ``engine="arrow"`` (default): ONE hash aggregation per bar —
      ``sort_array(collect_list(struct(level, vols)))`` — feeding a
      vectorized Arrow kernel that replays the window chain per bar
      (lead/lag imbalance flags, gaps-and-islands signed run,
      first-max argmax ≡ the SQL ``min_by(.., struct(-x, level))``
      tie-break, exact quantized-int64 moment sums — associative, so
      no fold-order replay is needed). Replaces the window
      exchange+sort stage and its 2-3
      downstream AQE jobs with a single agg + one Arrow projection
      (round-8: exec 0.46 → ~0.2 s at sf0.1 on the cached-input A/B);
      per-bar array length is bounded by the price range per bar, so
      the packed row stays small at any data scale.
    - ``engine="sql"``: one server-parsed SQL stage (round-7 — same
      Catalyst expressions and output bits as the op-chained form).
      All windows share one (bar, level) exchange+sort; the run length
      is the running last-run-start arithmetic (no second partitioning
      — see the im/ch/st CTE chain). Zero Python in the plan — for
      SQL-only deployment surfaces.

    The final vp_skew/vp_var/vp_gini ratios are computed by the SAME
    Catalyst expressions in both engines (the kernel emits the
    quantized integer moment sums), so engine choice never moves an
    output bit.
    """
    if engine == "arrow":
        return _footprint_features_arrow(fp, imb_mult, key, tick, bar_vwap)
    if engine != "sql":
        raise ValueError(f"footprint_features: unknown engine {engine!r}")
    m = f"CAST('{float(imb_mult)!r}' AS DOUBLE)"
    tk = f"CAST('{float(tick)!r}' AS DOUBLE)"
    if bar_vwap is not None:
        bv_sql = f"SELECT s.*, b.bar_vwap FROM st s JOIN (SELECT {key}, bar_vwap FROM {{bar_vwap}}) b USING ({key})"
        frames = {"fp": fp, "bar_vwap": bar_vwap}
    else:
        bv_sql = "SELECT s.*, CAST(NULL AS DOUBLE) AS bar_vwap FROM st s"
        frames = {"fp": fp}
    price = f"(level * {tk})"
    sql = f"""
WITH im AS (
  SELECT *, buy_vol + sell_vol AS vol,
         CAST(floor(buy_vol * 1000000.0d + 0.5d) AS BIGINT)
           + CAST(floor(sell_vol * 1000000.0d + 0.5d) AS BIGINT) AS volq,
         CAST(sell_vol > {m} * lead(buy_vol) OVER wl AS INT) AS sell_imb,
         CAST(buy_vol > {m} * lag(sell_vol) OVER wl AS INT) AS buy_imb
  FROM {{fp}}
  WINDOW wl AS (PARTITION BY {key} ORDER BY level)
),
sg AS (
  SELECT *, CASE WHEN buy_imb = 1 THEN 1
                 WHEN sell_imb = 1 THEN -1
                 ELSE 0 END AS imb_sgn
  FROM im
),
ch AS (
  SELECT *,
         CASE WHEN imb_sgn != lag(imb_sgn, 1, 0) OVER wl THEN 1 ELSE 0 END AS chg,
         row_number() OVER wl AS _rn
  FROM sg
  WINDOW wl AS (PARTITION BY {key} ORDER BY level)
),
st AS (
  SELECT *,
         CASE WHEN imb_sgn != 0
              THEN _rn - last(CASE WHEN chg = 1 THEN _rn END, true)
                     OVER (PARTITION BY {key} ORDER BY level
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1
              ELSE 0 END AS run_len
  FROM ch
),
bvj AS ({bv_sql}),
a AS (
  SELECT {key},
         CAST(count(*) AS BIGINT) AS n_levels,
         CAST(sum(coalesce(buy_imb, 0)) AS BIGINT) AS buy_imb_sum,
         CAST(sum(coalesce(sell_imb, 0)) AS BIGINT) AS sell_imb_sum,
         CAST(min_by(run_len * imb_sgn, struct(-run_len AS nr, level)) AS BIGINT) AS max_imb_run,
         min_by(level, struct(-vol AS nv, level)) AS cot_level,
         sum(CAST(floor((CAST(volq AS DOUBLE) / 1000000.0d) * (CAST(volq AS DOUBLE) / 1000000.0d) * 1000000.0d + 0.5d) AS DECIMAL(38,0))) AS _v2q,
         sum(CAST(volq AS DECIMAL(38,0))) AS _v1q,
         sum(CAST(floor(({price} - bar_vwap) * ({price} - bar_vwap) * (CAST(volq AS DOUBLE) / 1000000.0d) * 1000000.0d + 0.5d) AS DECIMAL(38,0))) AS _var_q,
         sum(CAST(floor(({price} - bar_vwap) * (CAST(volq AS DOUBLE) / 1000000.0d) * 1000000.0d + 0.5d) AS DECIMAL(38,0))) AS _skew_q
  FROM bvj GROUP BY {key}
)
SELECT {key}, n_levels, buy_imb_sum, sell_imb_sum, max_imb_run, cot_level,
       CAST(_skew_q AS DOUBLE) / nullif(CAST(_v1q AS DOUBLE), 0.0d) AS vp_skew,
       CAST(_var_q AS DOUBLE) / nullif(CAST(_v1q AS DOUBLE), 0.0d) AS vp_var,
       CAST('1.0' AS DOUBLE) - CAST(_v2q AS DOUBLE) * 1000000.0d
         / nullif(CAST(_v1q AS DOUBLE) * CAST(_v1q AS DOUBLE), 0.0d) AS vp_gini
FROM a
"""
    return sql_stage(sql, **frames)


def _footprint_features_arrow(
    fp: DataFrame,
    imb_mult: float,
    key: str,
    tick: float,
    bar_vwap: DataFrame | None,
) -> DataFrame:
    """Arrow engine behind :func:`footprint_features` — see its
    docstring for the parity contract. The kernel mirrors the SQL
    window chain row-for-row: NULL lead/lag flags count as 0 everywhere
    they are consumed (``coalesce`` in the sums, ``= 1`` in the sign),
    ``np.argmax`` returns the FIRST maximum over level-ascending rows ≡
    ``min_by(.., struct(-x, level))``, and every moment is a sequential
    left-to-right fold over level order (``np.cumsum``) — the exact
    accumulation the SQL hash agg performs on the window stage's sorted
    output."""
    import numpy as np
    import pandas as pd

    m = float(imb_mult)
    tk = float(tick)

    @F.pandas_udf(
        "struct<n_levels:bigint,buy_imb_sum:bigint,sell_imb_sum:bigint,"
        "max_imb_run:bigint,cot_level:bigint,_v1q:bigint,_v2q:bigint,"
        "_var_q:bigint,_skew_q:bigint>"
    )
    def _fold(levels, bvols, svols, vwaps):
        nseg = len(levels)
        if nseg == 0:
            return pd.DataFrame(
                {
                    c: pd.Series([], dtype="int64")
                    for c in (
                        "n_levels", "buy_imb_sum", "sell_imb_sum",
                        "max_imb_run", "cot_level", "_v1q", "_v2q",
                    )
                }
                | {
                    c: pd.Series([], dtype="Int64")
                    for c in ("_var_q", "_skew_q")
                }
            )
        # flatten the batch: one set of vectorized segment ops instead of
        # a per-bar Python loop (round-8 A/B: the loop form cost ~0.4 s
        # of pure numpy-call overhead per batch at sf0.1)
        lens = np.fromiter(map(len, levels.values), dtype=np.int64, count=nseg)
        starts = np.zeros(nseg, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        seg = np.repeat(np.arange(nseg), lens)
        lv = np.concatenate(list(levels.values)).astype(np.int64)
        b = np.concatenate(list(bvols.values)).astype(np.float64)
        s = np.concatenate(list(svols.values)).astype(np.float64)
        n = len(lv)
        idx = np.arange(n)
        first = idx == starts[seg]
        last = idx == (starts[seg] + lens[seg] - 1)
        # SQL: sell_vol > m*lead(buy_vol); buy_vol > m*lag(sell_vol)
        # within the bar (NULL at the edges -> contributes 0, the sign
        # case falls through)
        sell = np.zeros(n, dtype=bool)
        buy = np.zeros(n, dtype=bool)
        if n > 1:
            sell[:-1] = s[:-1] > m * b[1:]
            buy[1:] = b[1:] > m * s[:-1]
        sell[last] = False
        buy[first] = False
        sgn = np.where(buy, 1, np.where(sell, -1, 0)).astype(np.int64)
        # gaps-and-islands: group starts where sgn changes (lag default 0
        # at each bar's first row); the running group-start index never
        # leaks across bars for sgn!=0 rows because a bar's first nonzero
        # row always differs from its (forced-0) predecessor
        prevs = np.concatenate(([0], sgn[:-1]))
        prevs[first] = 0
        newgrp = sgn != prevs
        gstart = np.maximum.accumulate(np.where(newgrp, idx, -1))
        run = np.where(sgn != 0, idx - np.where(gstart < 0, 0, gstart) + 1, 0)
        big = np.iinfo(np.int64).max
        # first index of the per-bar max == min_by(.., struct(-x, level))
        runmax = np.maximum.reduceat(run, starts)
        j = np.minimum.reduceat(np.where(run == runmax[seg], idx, big), starts)
        vol = b + s
        volmax = np.maximum.reduceat(vol, starts)
        c = np.minimum.reduceat(np.where(vol == volmax[seg], idx, big), starts)
        price = lv * tk
        vw = np.asarray(vwaps.values, dtype=np.float64)
        # moment sums as HALF_UP-1e6-quantized EXACT int64 folds
        # (late-r13: the float form needed a -0.0-padded sequential
        # cumsum to bit-match the SQL hash agg's fold ORDER, and even
        # then a cross-engine last-ulp could flip a value sitting on a
        # round(·,6) boundary — footprint_features' one documented
        # sf0.1 miss. Integer sums are associative: np.add.reduceat is
        # exact in any order and both engines floor the SAME doubles,
        # so the final ratios are identical by construction at every
        # scale. Exactness bound: |term|·1e6 < 2^63, i.e. per-level
        # vol ≤ ~3e6 — document-scale safe; the SQL engine folds
        # decimal(38,0) and agrees through the shared < 2^63 regime.)
        # d computed ONCE then squared term-wise — same value and op
        # order as the SQL `(p - bar_vwap) * (p - bar_vwap) * vol`
        d = price - vw[seg]
        nanv = np.isnan(d)
        d0 = np.where(nanv, 0.0, d)
        # per-level volumes quantized FIRST (buy/sell separately — the
        # same ints the SQL engine's volq computes), then ONE identical
        # vold double feeds every moment term: the raw buy_vol/sell_vol
        # floats are cross-engine sums whose last ulp differs, and a
        # term's floor would flip on that ulp near a boundary
        vq = np.floor(b * 1e6 + 0.5).astype(np.int64) + np.floor(
            s * 1e6 + 0.5
        ).astype(np.int64)
        vold = vq / 1e6
        v2q = np.floor(vold * vold * 1e6 + 0.5).astype(np.int64)
        varq = np.floor(d0 * d0 * vold * 1e6 + 0.5).astype(np.int64)
        skewq = np.floor(d0 * vold * 1e6 + 0.5).astype(np.int64)
        out = pd.DataFrame(
            {
                "n_levels": lens,
                "buy_imb_sum": np.add.reduceat(buy.astype(np.int64), starts),
                "sell_imb_sum": np.add.reduceat(sell.astype(np.int64), starts),
                "max_imb_run": run[j] * sgn[j],
                "cot_level": lv[c],
                "_v1q": np.add.reduceat(vq, starts),
                "_v2q": np.add.reduceat(v2q, starts),
            }
        )
        # NULL bar_vwap must surface as NULL (not a garbage fold) like
        # the SQL sums — nullable Int64 so Arrow emits bigint NULLs
        out["_var_q"] = (
            pd.Series(np.add.reduceat(varq, starts))
            .mask(np.isnan(vw))
            .astype("Int64")
        )
        out["_skew_q"] = (
            pd.Series(np.add.reduceat(skewq, starts))
            .mask(np.isnan(vw))
            .astype("Int64")
        )
        return out

    packed = fp.groupBy(key).agg(
        F.sort_array(
            F.collect_list(F.struct("level", "buy_vol", "sell_vol"))
        ).alias("_lv")
    )
    if bar_vwap is not None:
        packed = packed.join(bar_vwap.select(key, "bar_vwap"), key)
        vw_col = F.col("bar_vwap")
    else:
        vw_col = F.lit(None).cast("double")
    folded = packed.select(
        key,
        _fold(
            F.col("_lv.level"), F.col("_lv.buy_vol"), F.col("_lv.sell_vol"), vw_col
        ).alias("_f"),
    )
    # the SAME final Catalyst expressions as the SQL engine (pow/div on
    # bit-identical sums) — keeps the two engines byte-equal end-to-end
    tail = f"""
SELECT {key}, _f.n_levels AS n_levels, _f.buy_imb_sum AS buy_imb_sum,
       _f.sell_imb_sum AS sell_imb_sum, _f.max_imb_run AS max_imb_run,
       _f.cot_level AS cot_level,
       CAST(_f._skew_q AS DOUBLE) / nullif(CAST(_f._v1q AS DOUBLE), 0.0d) AS vp_skew,
       CAST(_f._var_q AS DOUBLE) / nullif(CAST(_f._v1q AS DOUBLE), 0.0d) AS vp_var,
       CAST('1.0' AS DOUBLE) - CAST(_f._v2q AS DOUBLE) * 1000000.0d
         / nullif(CAST(_f._v1q AS DOUBLE) * CAST(_f._v1q AS DOUBLE), 0.0d) AS vp_gini
FROM {{folded}}
"""
    return sql_stage(tail, folded=folded)


def pack_footprint(fp: DataFrame, key: str = "bar_close_ns") -> DataFrame:
    """API-edge packing to one nested row per bar (pandas interop parity
    with ``FootprintData.get_df``)."""
    return fp.groupBy(key).agg(
        F.sort_array(
            F.collect_list(
                F.struct("level", "buy_vol", "sell_vol", "buy_ticks", "sell_ticks")
            )
        ).alias("footprint")
    )
