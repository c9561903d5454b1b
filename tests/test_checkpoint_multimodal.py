"""CheckpointStore resume semantics (kill mid-iteration -> resume ->
identical result) + multimodal plumbing."""

import numpy as np
import pytest

from pds_hw2_mpi_connected_components_spark.operators.cc import connected_components
from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank
from pds_hw2_mpi_connected_components_spark.plans.checkpoint import CheckpointStore
from pds_hw2_mpi_connected_components_spark.sources.multimodal import (
    decode_image,
    extract_features,
    frame_sample,
    media_repartition_by_bytes,
    resize_image,
    synth_media,
)
from tests.conftest import make_edges


def _ring_edges(spark, n):
    return make_edges(spark, [(i, (i + 1) % n) for i in range(n)])


def test_cc_resume_mid_iteration(spark, tmp_path):
    edges = _ring_edges(spark, 64)  # long diameter -> several rounds
    full, _ = connected_components(edges)
    want = {(r["vid"], r["label"]) for r in full.collect()}

    # run 1: crash after round 1 (simulated via max_rounds)
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    with pytest.raises(RuntimeError):
        connected_components(edges, checkpoint=store, max_rounds=2)
    assert store.latest("cc_edges") is not None

    # run 2: resumes from the committed round, finishes
    labels, metrics = connected_components(edges, checkpoint=store)
    assert {(r["vid"], r["label"]) for r in labels.collect()} == want
    assert metrics[0]["round"] >= 2  # did not restart from scratch
    assert len(store.metrics("cc")) >= len(metrics)


def test_pagerank_resume(spark, tmp_path):
    edges = _ring_edges(spark, 10)
    full, _ = pagerank(edges, tol=0.0, max_iter=6)
    want = {r["vid"]: r["rank"] for r in full.collect()}

    store = CheckpointStore(spark, str(tmp_path / "pk"))
    pagerank(edges, tol=0.0, max_iter=3, checkpoint=store)
    resumed, metrics = pagerank(edges, tol=0.0, max_iter=6, checkpoint=store)
    got = {r["vid"]: r["rank"] for r in resumed.collect()}
    assert metrics[0]["iter"] == 3
    assert all(abs(got[v] - want[v]) < 1e-12 for v in want)


def test_checkpoint_manifest_atomicity(spark, tmp_path):
    store = CheckpointStore(spark, str(tmp_path / "mk"))
    df = spark.range(10).selectExpr("id as vid", "id as label")
    store.write("cc_edges", 0, df)
    # torn write: parquet dir exists but no manifest -> invisible to latest()
    df.write.mode("overwrite").parquet(str(tmp_path / "mk" / "cc_edges" / "iter=00001"))
    it, state = store.latest("cc_edges")
    assert it == 0 and state.count() == 10


def test_iceberg_backend_unavailable(spark, tmp_path):
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        CheckpointStore(spark, str(tmp_path / "ib"), backend="iceberg")


# ---- multimodal ----------------------------------------------------------

def test_media_features_deterministic(spark):
    media = synth_media(spark, 40)
    f1 = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    f2 = {r["media_id"]: list(r["feature"]) for r in extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 48 for v in f1.values())
    # unit norm
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-5 for v in f1.values())


def test_media_resize_and_bytes_partitioning(spark):
    media = media_repartition_by_bytes(synth_media(spark, 40), target_bytes=4096)
    small = resize_image(media, 4, 4)
    rows = small.collect()
    assert all(r["n_bytes"] == 4 * 4 * 3 for r in rows)
    assert len(rows) == 40


def test_decode_stub_raises_on_real_codec(spark):
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg", 1, 1)


def test_frame_sample_video(spark):
    """Videos i have 2+i%4 frames; every_n=2 keeps frames 0,2,4,... and the
    emitted payload must equal the exact frame slice."""
    import numpy as np

    from pds_hw2_mpi_connected_components_spark.sources.multimodal import decode_image

    media = synth_media(spark, 5, kind="video")
    frames = frame_sample(media, every_n=2)
    assert frames.columns == ["media_id", "frame_idx", "fmt", "width", "height", "payload"]
    got = [(r["media_id"], r["frame_idx"], bytes(r["payload"])) for r in frames.collect()]
    n_frames = {i: 2 + i % 4 for i in range(5)}
    want_count = sum(-(-f // 2) for f in n_frames.values())  # ceil(f/2)
    assert len(got) == want_count
    rows = {r["media_id"]: r for r in media.collect()}
    for mid, fidx, payload in got:
        r = rows[mid]
        vid = decode_image(r["payload"], r["fmt"], r["width"], r["height"])
        assert fidx % 2 == 0 and fidx < n_frames[mid] * 2
        assert payload == vid[fidx].tobytes()


def test_frame_sample_image_passthrough(spark):
    frames = frame_sample(synth_media(spark, 4, kind="image"), every_n=3)
    rows = frames.collect()
    assert len(rows) == 4 and all(r["frame_idx"] == 0 for r in rows)


def test_features_match_per_row_histogram_reference(spark):
    """The batch-vectorized flat bincount must equal the naive per-row
    np.histogram implementation exactly (incl. the v*n_bins>>8 binning
    equivalence for uint8)."""
    import numpy as np

    from pds_hw2_mpi_connected_components_spark.sources.multimodal import decode_image

    media = synth_media(spark, 40)
    rows = media.collect()
    got = {r["media_id"]: np.array(r["feature"]) for r in extract_features(media).collect()}
    for r in rows:
        img = decode_image(r["payload"], r["fmt"], r["width"], r["height"])
        hist = [np.histogram(img[:, :, c], bins=16, range=(0, 255))[0] for c in range(3)]
        f = np.concatenate(hist).astype(np.float64)
        norm = np.linalg.norm(f)
        want = (f / norm if norm else f).astype(np.float32)
        assert np.array_equal(got[r["media_id"]], want), r["media_id"]


def test_resize_matches_per_row_reference(spark):
    import numpy as np

    from pds_hw2_mpi_connected_components_spark.sources.multimodal import decode_image

    media = synth_media(spark, 25)
    rows = {r["media_id"]: r for r in media.collect()}
    small = {r["media_id"]: r for r in resize_image(media, 5, 3).collect()}
    for mid, r in rows.items():
        img = decode_image(r["payload"], r["fmt"], r["width"], r["height"])
        yi = (np.arange(3) * r["height"] // 3).astype(int)
        xi = (np.arange(5) * r["width"] // 5).astype(int)
        want = img[np.ix_(yi, xi)].tobytes()
        s = small[mid]
        assert (s["width"], s["height"], s["n_bytes"]) == (5, 3, len(want))
        assert bytes(s["payload"]) == want
