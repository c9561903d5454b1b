"""Public one-call entry points with execution-mode auto-selection:
``cc()`` for connected components and ``pagerank_auto()`` for PageRank.

Three CC execution modes exist with identical semantics (min-vid-per-
component labels, cross-mode checksum-tested) but different scaling
envelopes; ``cc()`` picks the right one so callers don't have to:

- ``csr`` (operators/csr.py) — the reference's own design: the FULL label
  vector is broadcast every superstep (MPI_Allgatherv analog,
  /root/reference/src/connected_components.c:98-101). Per-superstep cost is
  O(n) replicated state, so it is only safe — and, measured on the bench,
  fastest — while the vertex set is small: fixed per-round costs dominate
  and the broadcast is a few MB.
- ``df`` (operators/cc.py) — large-star/small-star contraction: O(log n)
  rounds, everything distributed, per-round volume tracks the shrinking
  edge set. The 10^12-edge default; supports checkpoint/resume and exact
  hub salting.
- ``frontier`` (operators/frontier.py) — min-label propagation with a
  shrinking broadcast frontier: O(diameter) rounds, right for short-
  diameter (web-like) graphs; never auto-selected because its round count
  is graph-shape-dependent — opt in explicitly when you know the shape.

Auto rule: ``csr`` iff vertex count <= ``csr_max_vertices`` (default 2M:
a 2M-vertex label vector is a 16 MB broadcast per superstep — comfortably
inside executor memory, and past the point where csr's fixed-cost advantage
has already faded into df's territory) AND no checkpoint store was given
(csr is not resumable); otherwise ``df``. The vertex count is taken from
``vertices`` when provided; else the distinct edge-endpoint universe is
materialized ONCE here and handed to the selected mode, so the routing
count and the mode's own label init share a single scan.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointStore
from .cc import connected_components
from .csr import connected_components_csr, pagerank_csr
from .frontier import connected_components_frontier
from .pagerank import pagerank as pagerank_df
from ..plans.flat import flat_checkpoint

DEFAULT_CSR_MAX_VERTICES = 2_000_000

# df-mode CC converging within this many star-contraction rounds marks the
# graph "frontier_eligible" in its final metrics row (small effective
# diameter => the O(diameter)-round frontier mode is worth trying next run)
FRONTIER_ELIGIBLE_MAX_ROUNDS = 5


class CCResult(NamedTuple):
    labels: DataFrame  # (vid long, label long), label = min vid of component
    metrics: list      # per-round metrics from the underlying mode
    mode: str          # "df" | "csr" | "frontier" — what actually ran


def cc(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    mode: str = "auto",
    checkpoint: Optional[CheckpointStore] = None,
    csr_max_vertices: int = DEFAULT_CSR_MAX_VERTICES,
    broadcast_threshold: int = 2_000_000,
    salt_buckets: int = 0,
) -> CCResult:
    """Connected components with automatic execution-mode selection.

    ``mode``: "auto" (default), or force "df" / "csr" / "frontier".
    ``csr_max_vertices``: auto picks csr at or below this vertex count
    (see module docstring for the rationale). ``broadcast_threshold``:
    frontier mode's max broadcast rows. ``salt_buckets``: df mode's exact
    hub-salting. Returns CCResult(labels, metrics, mode)."""
    if mode not in ("auto", "df", "csr", "frontier"):
        raise ValueError(f"unknown cc mode {mode!r}: use auto|df|csr|frontier")
    chosen = mode
    if mode == "auto":
        if vertices is None:
            # materialize the vertex universe ONCE and hand it to the chosen
            # mode — the count below and the mode's label init share the scan
            vertices = (
                edges.select(F.col("src").alias("vid"))
                .union(edges.select(F.col("dst").alias("vid")))
                .distinct()
                .transform(flat_checkpoint)
            )
        n = vertices.count()
        chosen = "csr" if (n <= csr_max_vertices and checkpoint is None) else "df"
    if chosen == "csr":
        if checkpoint is not None:
            raise ValueError(
                "csr mode keeps no distributed state to checkpoint — use "
                "mode='df' or 'frontier' for resumable runs"
            )
        labels, metrics = connected_components_csr(edges, vertices=vertices)
    elif chosen == "frontier":
        labels, metrics = connected_components_frontier(
            edges,
            vertices=vertices,
            broadcast_threshold=broadcast_threshold,
            checkpoint=checkpoint,
        )
    else:
        labels, metrics = connected_components(
            edges, vertices=vertices, checkpoint=checkpoint, salt_buckets=salt_buckets
        )
        if metrics:
            # post-hoc shape hint (evidence only, no behavior change): star
            # contraction converging in few rounds implies a small effective
            # diameter, which is exactly when the O(diameter)-round frontier
            # mode is competitive — record it so operators learn the graph
            # shape for next runs without paying a probe.
            metrics[-1]["frontier_eligible"] = (
                len(metrics) <= FRONTIER_ELIGIBLE_MAX_ROUNDS
            )
    return CCResult(labels, metrics, chosen)


class PRResult(NamedTuple):
    ranks: DataFrame   # (vid long, rank double), sums to 1.0
    metrics: list      # per-iteration metrics from the underlying mode
    mode: str          # "df" | "csr" — what actually ran


def pagerank_auto(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    mode: str = "auto",
    alpha: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    checkpoint: Optional[CheckpointStore] = None,
    csr_max_vertices: int = DEFAULT_CSR_MAX_VERTICES,
    salt_buckets: int = 0,
) -> PRResult:
    """PageRank with the same execution-mode auto-selection as ``cc()``.

    The two modes agree to allclose 1e-6 per vertex (not bit-identical —
    float summation order differs; tested in tests/test_csr.py). ``csr``
    replicates the rank vector per iteration (fast while n fits node
    memory, not resumable); ``df`` is the distributed scale mode with
    checkpoint/resume and optional contribution salting. Auto picks csr
    iff vertex count <= ``csr_max_vertices`` and no checkpoint was given.
    """
    if mode not in ("auto", "df", "csr"):
        raise ValueError(f"unknown pagerank mode {mode!r}: use auto|df|csr")
    chosen = mode
    if mode == "auto":
        if vertices is None:
            vertices = (
                edges.select(F.col("src").alias("vid"))
                .union(edges.select(F.col("dst").alias("vid")))
                .distinct()
                .transform(flat_checkpoint)
            )
        n = vertices.count()
        chosen = "csr" if (n <= csr_max_vertices and checkpoint is None) else "df"
    if chosen == "csr":
        if checkpoint is not None:
            raise ValueError(
                "csr mode keeps no distributed state to checkpoint — use "
                "mode='df' for resumable runs"
            )
        ranks, metrics = pagerank_csr(
            edges, vertices=vertices, alpha=alpha, tol=tol, max_iter=max_iter
        )
    else:
        ranks, metrics = pagerank_df(
            edges, vertices=vertices, alpha=alpha, tol=tol, max_iter=max_iter,
            checkpoint=checkpoint, salt_buckets=salt_buckets,
        )
    return PRResult(ranks, metrics, chosen)
