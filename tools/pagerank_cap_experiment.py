"""Degree-cap scale evidence for pagerank(max_degree=k) — SCALE.md row.

The replicated scale-harness corpus has ZERO cross-replica overlap by
construction, so the weak-tie graph's edges grow linearly there and the
cap never matters (SCALE.md's dup_graph_pagerank 1.5× row). A REAL
boilerplate-heavy corpus is the opposite: a template shared by k
documents is a k-clique at Jaccard >= 0.02, |E| ~ k², and every
message-passing round pays it. This experiment isolates that regime:

* a hub block of ``K`` mutually-similar nodes (the k-clique) + a sparse
  linear tail, synthetic weights;
* pagerank uncapped vs max_degree=3 over the SAME edge list;
* reports pre/post-cap symmetrized |E| and wall per variant.

Run: python tools/pagerank_cap_experiment.py [K] [TAIL]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from shopify_etl_spark.operators.graph import pagerank  # noqa: E402
from shopify_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    TAIL = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    spark = get_spark("pagerank-cap", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    # clique: all pairs (i < j) among nodes [0, K) — |E| = K(K-1)/2;
    # deterministic pseudo-weights from the pair ids
    a = spark.range(K).select(F.col("id").alias("d1"))
    b = spark.range(K).select(F.col("id").alias("d2"))
    clique = a.join(b, F.col("d1") < F.col("d2")).select(
        "d1", "d2",
        F.round(
            F.lit(0.02) + (F.abs(F.xxhash64("d1", "d2")) % 9800) / 10000.0, 4
        ).alias("jaccard"),
    )
    # sparse tail: node i — node i+1 chain over [K, K+TAIL)
    tail = spark.range(K, K + TAIL - 1).select(
        F.col("id").alias("d1"),
        (F.col("id") + 1).alias("d2"),
        F.lit(0.5).alias("jaccard"),
    )
    edges = clique.unionByName(tail).localCheckpoint()
    n_pairs = edges.count()
    print(f"nodes={K + TAIL} unique pairs={n_pairs} "
          f"(clique {K * (K - 1) // 2} + chain {TAIL - 1})")

    for label, kwargs in (("uncapped", {}), ("max_degree=3", {"max_degree": 3})):
        t0 = time.time()
        out = pagerank(edges, **kwargs)
        n_nodes = out.count()
        deg_sum = out.agg(F.sum("degree")).collect()[0][0]
        wall = time.time() - t0
        print(f"{label:14s} wall={wall:6.1f}s nodes={n_nodes} "
              f"sym_edges={deg_sum}")


if __name__ == "__main__":
    main()
