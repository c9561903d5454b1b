"""Dump .explain("formatted") evidence for the r7 optimization round.

For every bench leg touched this round, writes <leg>_{before|after}.txt
under plans/r07/ (tag from $PLAN_TAG). Iterative operators' in-loop plans
are captured by wrapping plans.flat.flat_checkpoint with a recorder: every
materialized round plan's formatted explain is collected, the file gets a
header listing the Exchange count of each materialization (the compact
before/after story) followed by the full text of the last steady-state
plan. Non-iterative legs get their end-to-end query explain.

Run twice:
    PLAN_TAG=after  python tools/dump_plans_r07.py
    PLAN_TAG=before PYTHONPATH=<round-start worktree> python tools/dump_plans_r07.py
(the script itself only uses the public package API present in both trees).
"""

from __future__ import annotations

import os
import re
import sys

TAG = os.environ.get("PLAN_TAG", "after")
OUT = os.environ.get("PLAN_OUT", "/root/repo/plans/r07")
SF = os.environ.get("PLAN_SF", "/root/testdata/sf0.1")

# PYTHONPATH (the before-tree worktree) must win over /root/repo
here = os.environ.get("PYTHONPATH")
if here:
    sys.path.insert(0, here.split(":")[0])
else:
    sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from pds_hw2_mpi_connected_components_spark.plans.session import get_spark  # noqa: E402
from pds_hw2_mpi_connected_components_spark.plans import flat as flat_mod  # noqa: E402

os.makedirs(OUT, exist_ok=True)

captures: list[str] = []
_orig_flat = flat_mod.flat_checkpoint


def _recording_flat(df, *a, **kw):
    try:
        captures.append(
            df._jdf.queryExecution().explainString(
                df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))
    except Exception:
        try:
            captures.append(df._jdf.queryExecution().toString())
        except Exception:
            captures.append("<explain failed>")
    return _orig_flat(df, *a, **kw)


def patch_all():
    """Point every operator module's flat_checkpoint at the recorder
    (modules import the symbol by name, so patching flat_mod alone is not
    enough)."""
    import importlib
    flat_mod.flat_checkpoint = _recording_flat
    pkg = "pds_hw2_mpi_connected_components_spark"
    for mod in ("operators.pagerank", "operators.hits", "operators.scc",
                "operators.kcore", "operators.labelprop", "operators.paths",
                "operators.anf", "operators.frontier", "operators.cc",
                "operators.bowtie", "operators.dedup", "sources.graph_build"):
        try:
            m = importlib.import_module(f"{pkg}.{mod}")
            if hasattr(m, "flat_checkpoint"):
                m.flat_checkpoint = _recording_flat
        except Exception:
            pass


def n_exchanges(plan: str) -> int:
    return len(re.findall(r"\bExchange\b", plan.split("\n\n")[0]))


def dump(leg: str, run, tail_plans: int = 1):
    global captures
    captures = []
    extra = ""
    try:
        direct = run()
    except Exception as exc:  # version drift between trees
        direct = None
        extra = f"\n<leg failed on this tree: {exc!r}>\n"
    with open(os.path.join(OUT, f"{leg}_{TAG}.txt"), "w") as f:
        f.write(f"# {leg} ({TAG}) — captured via flat_checkpoint hook\n")
        f.write(f"# materializations: {len(captures)}\n")
        if captures:
            f.write("# exchanges per materialized plan (tree order): "
                    f"{[n_exchanges(c) for c in captures]}\n")
        f.write(extra)
        if direct is not None:
            f.write("\n## end-to-end query plan\n")
            f.write(direct)
        for c in captures[-tail_plans:]:
            f.write("\n## last materialized (steady-state round) plan\n")
            f.write(c)
    print(f"{leg}: {len(captures)} materializations "
          f"{[n_exchanges(c) for c in captures][:40]}")


def explain_str(df) -> str:
    try:
        return df._jdf.queryExecution().explainString(
            df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
    except Exception:
        return df._jdf.queryExecution().toString()


def main():
    spark = get_spark(master="local[32]", app_name=f"plans_{TAG}",
                      shuffle_partitions=32)
    patch_all()
    import importlib
    pkg = "pds_hw2_mpi_connected_components_spark"
    de = importlib.import_module(f"{pkg}.sources.doc_edges")
    eb = _orig_flat(de.doc_edges_blocked(spark, SF))
    eg = _orig_flat(de.doc_edges_global(spark, SF))
    verts = de.doc_vertices(spark, SF)

    pr = importlib.import_module(f"{pkg}.operators.pagerank")
    dump("doc_pagerank_20it",
         lambda: pr.pagerank(eg, vertices=verts, tol=0.0, max_iter=3) and None)

    hi = importlib.import_module(f"{pkg}.operators.hits")
    dump("doc_hits_10it",
         lambda: hi.hits(eg, vertices=verts, tol=0.0, max_iter=3) and None)

    sc_mod = importlib.import_module(f"{pkg}.operators.scc")
    def run_scc():
        try:
            sc_mod.strongly_connected_components(
                eb, vertices=verts, local_threshold=0)
        except TypeError:
            sc_mod.strongly_connected_components(eb, vertices=verts)
    dump("doc_scc_distributed", run_scc)
    def run_scc_default():
        sc_mod.strongly_connected_components(eb, vertices=verts)
    dump("doc_scc", run_scc_default)

    bt = importlib.import_module(f"{pkg}.operators.bowtie")
    dump("doc_bowtie", lambda: bt.bowtie(eb, vertices=verts) and None)

    anf_mod = importlib.import_module(f"{pkg}.operators.anf")
    dump("doc_anf_16t",
         lambda: anf_mod.anf(eg, vertices=verts, n_trials=16, max_hops=4) and None)

    lp = importlib.import_module(f"{pkg}.operators.labelprop")
    gb = importlib.import_module(f"{pkg}.sources.graph_build")
    dump("doc_labelprop_5it",
         lambda: lp.label_propagation(gb.symmetrize(eb), vertices=verts,
                                      max_iter=3) and None)

    kc = importlib.import_module(f"{pkg}.operators.kcore")
    dump("doc_kcore3", lambda: kc.k_core(eb, k=3) and None)
    dump("doc_coreness", lambda: kc.coreness(eb) and None)

    cc = importlib.import_module(f"{pkg}.operators.cc")
    dump("doc_cc_global",
         lambda: cc.connected_components(eg, vertices=verts) and None)

    fr = importlib.import_module(f"{pkg}.operators.frontier")
    dump("doc_cc_global_frontier",
         lambda: fr.connected_components_frontier(
             eg, vertices=verts, broadcast_threshold=100_000) and None)

    dd = importlib.import_module(f"{pkg}.operators.dedup")
    n_hot = 20_000
    hot = _orig_flat(spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the common filler u"), F.col("id").cast("string"),
                 F.lit(" v"), (F.col("id") * 7 % 997).cast("string")).alias("text"),
        (F.col("id") % 8).cast("string").alias("source"),
    ))
    dump("jaccard_hot20k",
         lambda: explain_str(dd.jaccard_pairs(hot, threshold=0.3)))
    degen = _orig_flat(spark.range(n_hot).select(
        F.col("id").alias("doc_id"), F.lit("boilerplate stub page").alias("text")))
    dump("lsh_hot20k",
         lambda: explain_str(dd.minhash_lsh_candidates(degen)))

    dg = importlib.import_module(f"{pkg}.sources.datagen")
    pages = _orig_flat(dg.generate_pages(spark, 30_000, n_components=16,
                                         num_partitions=32))
    def run_build():
        g = gb.build_graph(pages)
        return explain_str(g.edges)
    dump("pipeline_build_graph", run_build)

    spark.stop()


if __name__ == "__main__":
    main()
