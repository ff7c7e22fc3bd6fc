"""Measure the driver-memory cost of `_local_cc` at the LOCAL_CC_MAX_EDGES
rail bound (VERDICT r08 blemish 2: "document the driver-memory budget that
justified 2 M").

Builds a worst-case railed graph — LOCAL_CC_MAX_EDGES nodes AND the same
number of symmetric edge rows (long chains, so union-find actually works) —
runs `_local_cc` on it, and reports the driver's peak-RSS delta plus wall
time. Run:

    python scripts/cc_rail_budget.py [n]
"""

import json
import resource
import sys
import time

sys.path.insert(0, ".")

from ictspark.session import get_spark  # noqa: E402
from ictspark.extras import incremental  # noqa: E402


def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else incremental.LOCAL_CC_MAX_EDGES
    spark = get_spark(cpus=8, shuffle_partitions=16)
    # chain edges (i -> i+1) within 1000-node components: n nodes, ~n sym
    # rows after symmetrization of the n/2 undirected half — use exactly n
    # directed rows so both rail dimensions sit AT the bound.
    nodes = spark.range(n).toDF("doc_id")
    half = (
        spark.range(n // 2)
        .selectExpr("id * 2 as doc_a", "id * 2 + 1 as doc_b")
        .where("doc_a % 1000 != 998")  # break chains into components
    )
    sym = half.unionByName(half.selectExpr("doc_b as doc_a", "doc_a as doc_b"))
    n_sym = sym.count()
    assert n_sym <= incremental.LOCAL_CC_MAX_EDGES
    nodes.localCheckpoint(eager=True)
    before = peak_rss_mb()
    t0 = time.time()
    out = incremental._local_cc(spark, nodes, sym)
    n_comp = out.select("component").distinct().count()
    t1 = time.time()
    after = peak_rss_mb()
    print(
        json.dumps(
            {
                "n_nodes": n,
                "n_sym_edges": n_sym,
                "n_components": n_comp,
                "peak_rss_before_mb": round(before, 1),
                "peak_rss_after_mb": round(after, 1),
                "peak_rss_delta_mb": round(after - before, 1),
                "wall_s": round(t1 - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
