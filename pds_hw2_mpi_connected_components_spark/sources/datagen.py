"""Deterministic synthetic Common-Crawl-style ``pages`` generator.

Schema is exactly BASELINE.json ``input_hint``:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``.

Every field is a pure arithmetic function of the page id (splitmix64-style
integer mixing, vectorized in numpy) — NO stateful RNG — so the output is
byte-identical regardless of partitioning, parallelism, or generation order.
That property backs the determinism tests (same labels at local[8] vs
local[32]) which mirror the reference's trial-consistency check
(/root/reference/src/benchmark.c:275-284).

Graph structure (known ground truth by construction, mirroring the
reference's known-answer checks — friendster=1 component, mawi=3,971,144;
/root/reference/docs/benchmark-results/*:23):

- ``n_components`` disjoint clusters; page ``i`` belongs to cluster
  ``i % n_components``.
- a deterministic *spine* link (each page links to the previous page of its
  cluster) guarantees each cluster is connected => component count is exactly
  ``n_components``.
- extra links are hash-derived within the cluster, biased toward the first
  ``hub_count`` pages of the cluster => power-law-ish in-degree (hub skew, the
  stress case for J1 join salting; see SURVEY.md §2.4/§4 X6).
- a fraction of pages are dangling (no out-links except none at all) to
  exercise PageRank dangling-mass handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_WORDS = np.array(
    "the web page link graph crawl data spark engine query scale shuffle "
    "partition vertex edge label rank component cluster hub join merge "
    "batch arrow vector column row hash sort scan filter".split()
)
_LANGS = np.array(["en", "de", "el"])


def pages_schema() -> str:
    return PAGES_SCHEMA


def _mix(x: np.ndarray, salt: int) -> np.ndarray:
    """splitmix64 finalizer — vectorized deterministic uint64 hash.
    uint64 wrap-around is the intended modular arithmetic."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(salt) * np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & np.uint64(0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return z ^ (z >> np.uint64(31))


def page_url(page_id: int, n_components: int) -> str:
    c = page_id % n_components
    return f"https://site{c:04d}.example.org/page/{page_id:010d}"


def _out_link_ids(ids: np.ndarray, n_pages: int, n_components: int,
                  hub_count: int, seed: int, max_extra: int) -> list[list[int]]:
    """Deterministic out-link page ids per page (list per row)."""
    n_components = int(n_components)
    c = ids % n_components
    # local index within the cluster and cluster size
    li = ids // n_components
    csize = (n_pages - c - 1) // n_components + 1  # pages i with i%C==c
    h0 = _mix(ids.astype(np.uint64), seed)
    no_extra = (h0 % np.uint64(20)) == 0  # ~5% of pages emit only the spine link
    n_extra = (_mix(ids.astype(np.uint64), seed + 1) % np.uint64(max_extra + 1)).astype(np.int64)
    n_extra[no_extra] = 0
    out: list[list[int]] = []
    for k in range(len(ids)):
        links: list[int] = []
        # spine: every page (except the cluster head) links to the previous
        # page of its cluster => each cluster is connected by construction,
        # so the component count is exactly n_components. Cluster heads have
        # no spine link; heads that also draw 0 extra links are the graph's
        # dangling pages (PageRank dangling-mass path).
        if li[k] > 0:
            links.append(int(ids[k] - n_components))
        for j in range(int(n_extra[k])):
            hj = int(_mix(np.uint64(ids[k] * 131 + j), seed + 2))
            if hj % 5 < 2 and csize[k] > hub_count:  # 40%: hub bias
                t_li = hj % hub_count
            else:
                t_li = hj % int(csize[k])
            t = int(c[k] + t_li * n_components)
            if t != ids[k]:
                links.append(t)
        out.append(links)
    return out


def _render(ids: np.ndarray, n_pages: int, n_components: int,
            hub_count: int, seed: int, max_extra: int) -> pd.DataFrame:
    links = _out_link_ids(ids, n_pages, n_components, hub_count, seed, max_extra)
    h_text = _mix(ids.astype(np.uint64), seed + 3)
    n_words = 20 + (h_text % np.uint64(60)).astype(np.int64)
    lang = _LANGS[(_mix(ids.astype(np.uint64), seed + 4) % np.uint64(3)).astype(np.int64)]
    rows = []
    for k, pid in enumerate(ids):
        widx = _mix(np.uint64(pid) * np.uint64(1_000_003) + np.arange(n_words[k], dtype=np.uint64), seed + 5)
        body_text = " ".join(_WORDS[(widx % np.uint64(len(_WORDS))).astype(np.int64)])
        anchors = "".join(
            f'<a href="{page_url(t, n_components)}">link {t}</a> ' for t in links[k]
        )
        html = (
            f"<html><head><title>Page {pid}</title></head><body>"
            f"<p>{body_text}</p>{anchors}</body></html>"
        )
        rows.append(
            (
                page_url(int(pid), n_components),
                pd.Timestamp("2025-01-01", tz="UTC") + pd.Timedelta(seconds=int(pid)),
                html.encode("utf-8"),
                None,  # text column filled by the extraction pipeline
                str(lang[k]),
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_components: int = 8,
    hub_count: int = 8,
    seed: int = 42,
    max_extra_links: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table (mapInPandas over spark.range)."""
    if num_partitions is None:
        num_partitions = max(1, min(64, n_pages // 2000 + 1))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            yield _render(ids, n_pages, n_components, hub_count, seed, max_extra_links)

    return (
        spark.range(0, n_pages, 1, num_partitions)
        .mapInPandas(gen, schema=PAGES_SCHEMA)
    )


def generate_pages_local(
    n_pages: int,
    n_components: int = 8,
    hub_count: int = 8,
    seed: int = 42,
    max_extra_links: int = 6,
) -> pd.DataFrame:
    """Pure-pandas twin of :func:`generate_pages` (test oracle)."""
    ids = np.arange(n_pages, dtype=np.int64)
    return _render(ids, n_pages, n_components, hub_count, seed, max_extra_links)


def generate_edges(
    spark: SparkSession,
    n_vertices: int,
    n_components: int = 16,
    hub_count: int = 8,
    max_extra: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """Pure-JVM deterministic edge generator for scale benchmarks.

    Same topology family as :func:`generate_pages` (clustered spine +
    hub-biased extra links => exactly ``n_components`` components, power-law
    in-degree skew) but built entirely from Catalyst expressions over
    ``spark.range`` — whole-stage codegen, no Python, so multi-million-edge
    graphs materialize in seconds. Used by the N-vs-4N scaling bench where
    the *algorithm* must dominate, not datagen.
    """
    if num_partitions is None:
        num_partitions = max(8, n_vertices // 250_000)
    C = n_components
    ids = spark.range(0, n_vertices, 1, num_partitions).select(F.col("id"))
    c = (F.col("id") % C).alias("c")
    base = ids.select("id", c, (F.col("id") - (F.col("id") % C)).alias("li_base"))
    spine = base.where(F.col("id") >= C).select(
        F.col("id").alias("src"), (F.col("id") - C).alias("dst")
    )
    csize = (F.lit(n_vertices) - F.col("c") - 1 - ((F.lit(n_vertices) - F.col("c") - 1) % C)) / C + 1
    exploded = base.select(
        "id", "c", csize.cast("long").alias("csize"),
        F.explode(F.sequence(F.lit(0), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(max_extra)))).alias("j"),
    )
    h = F.pmod(F.xxhash64("id", "j", F.lit(2)), F.lit(1_000_000_007))
    hubby = F.pmod(h, F.lit(5)) < 2
    tgt_idx = F.when(hubby & (F.col("csize") > hub_count), F.pmod(h, F.lit(hub_count))).otherwise(
        F.pmod(h, F.col("csize"))
    )
    extra = exploded.select(
        F.col("id").alias("src"), (F.col("c") + tgt_idx * C).alias("dst")
    ).where(F.col("src") != F.col("dst"))
    return spine.union(extra).distinct()


def true_out_links(n_pages: int, n_components: int = 8, hub_count: int = 8,
                   seed: int = 42, max_extra_links: int = 6) -> dict[int, list[int]]:
    """Ground-truth out-link ids per page (for graph-build assertions)."""
    ids = np.arange(n_pages, dtype=np.int64)
    links = _out_link_ids(ids, n_pages, n_components, hub_count, seed, max_extra_links)
    return {int(i): links[k] for k, i in enumerate(ids)}
