"""Interleaved A/B of the cache.keep boundary strategy under the
HONEST bench timing (r14: release_all before every timed run, so each
timed run pays cache materialization exactly like bench.py does).

Sides monkeypatch cache.keep globally for the process:
  keep  — as shipped (persist, CacheManager plan-match within a run)
  cut   — localCheckpoint(eager=False) instead (no plan-match; eager
          materialization at build under AQE)
  none  — identity (no storage boundary; every consumer recomputes)

cache.cut call sites are NEVER touched (loop lineage cuts are
correctness-of-latency critical; see the r13 eager-AQE trap note).

Usage: python tools/abkeep.py <sf_dir> [--reps=N] [--queries=a,b,c] [--sides=keep,cut,none]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# headline queries that hit a cache.keep site (tools mapping, r14)
DEFAULT_QUERIES = [
    "minhash_lsh", "dedup_clusters", "dedup_clusters_star",
    "ngram_jaccard", "simhash_near_pairs", "dup_graph_pagerank",
    "keep_central", "cross_source_dup_matrix", "tfidf_cosine_pairs",
    "perplexity_buckets", "cm_token_freq", "hybrid_search",
    "curation_pipeline", "event_funnel", "funnel_latency",
]


def build_session():
    from finmlkit_spark.session import get_spark

    return get_spark("abkeep")


def main():
    argv = sys.argv[1:]
    reps = 2
    queries = DEFAULT_QUERIES
    sides = ["keep", "cut", "none"]
    args: list[str] = []
    for a in argv:
        if a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--queries="):
            queries = a.split("=", 1)[1].split(",")
        elif a.startswith("--sides="):
            sides = a.split("=", 1)[1].split(",")
        else:
            args.append(a)
    sf_dir = args[0]

    from finmlkit_spark import cache, suite

    orig_keep = cache.keep

    def set_side(side: str) -> None:
        if side == "keep":
            cache.keep = orig_keep
        elif side == "cut":
            cache.keep = lambda df, level=None: cache.cut(df)
        elif side == "none":
            cache.keep = lambda df, level=None: df
        else:
            raise ValueError(side)

    results: dict[str, dict[str, float]] = {s: {} for s in sides}
    for rep in range(reps):
        for side in sides:
            set_side(side)
            spark = build_session()
            t_side0 = time.time()
            for name in queries:
                fn = suite.QUERIES[name]
                try:
                    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                    best = float("inf")
                    for _ in range(2):
                        cache.release_all()
                        t0 = time.time()
                        df = fn(spark, sf_dir)
                        df.write.format("noop").mode("overwrite").save()
                        best = min(best, time.time() - t0)
                    prev = results[side].get(name, float("inf"))
                    results[side][name] = min(prev, best)
                except Exception as e:  # noqa: BLE001
                    results[side][name] = float("nan")
                    print(f"ERROR {side} {name}: {type(e).__name__}: {e}"[:200],
                          file=sys.stderr)
                finally:
                    cache.release_all()
            print(
                f"rep{rep} side={side:<5} running-min total "
                f"{sum(results[side].values()):7.3f}s loadavg {os.getloadavg()[0]:.2f}",
                flush=True,
            )
            spark.stop()
    set_side("keep")

    print()
    hdr = "query".ljust(28) + "".join(s.rjust(13) for s in sides)
    print(hdr)
    for name in queries:
        row = name.ljust(28)
        for s in sides:
            row += f"{results[s].get(name, float('nan')):13.3f}"
        print(row)
    row = "TOTAL".ljust(28)
    for s in sides:
        row += f"{sum(results[s].values()):13.3f}"
    print(row)


if __name__ == "__main__":
    main()
