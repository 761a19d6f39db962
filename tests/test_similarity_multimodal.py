"""Similarity search + multimodal plumbing tests."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from movex_cdc_ray.functions.multimodal import (
    RECOMMENDED_MEDIA_BATCH_SIZE,
    DecodeStage,
    FrameSampleStage,
    ResizeStage,
    synth_media_table,
)
from movex_cdc_ray.functions.similarity import brute_force_topk, lsh_bucketed_ann


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    rng = np.random.default_rng(5)
    mat = rng.standard_normal((200, 32)).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(200, dtype=np.int64)),
            "embedding": pa.array([list(map(float, v)) for v in mat], pa.list_(pa.float32())),
        }
    )
    return rd.from_arrow(t), mat


def _exact_topk(mat, qid, k):
    m = mat.astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m[qid]
    order = np.lexsort((np.arange(len(m)), -sims))
    return [int(i) for i in order if i != qid][:k]


def test_brute_force_topk_matches_numpy(emb_ds):
    ds, mat = emb_ds
    out = brute_force_topk(ds, query_ids=[0, 7], k=5)
    for qid in (0, 7):
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        assert got == _exact_topk(mat, qid, 5)
    assert out.groupby("query_id")["rank"].apply(list).tolist() == [[1, 2, 3, 4, 5]] * 2


def test_lsh_ann_recall(emb_ds):
    ds, mat = emb_ds
    out = lsh_bucketed_ann(ds, query_ids=[0, 7], k=5, n_bits=6)
    # approximate: require >= 40% recall of the exact top-5 (deterministic seed)
    hits = 0
    for qid in (0, 7):
        exact = set(_exact_topk(mat, qid, 5))
        got = set(out[out["query_id"] == qid]["neighbor_id"].tolist())
        hits += len(exact & got)
    assert hits >= 3  # approximate by design; exact recall depends on seed
    # deterministic across runs
    out2 = lsh_bucketed_ann(ds, query_ids=[0, 7], k=5, n_bits=6)
    assert out.equals(out2)


def test_multimodal_decode_pipeline(ray_session):
    media = synth_media_table(64, seed=9, payload_bytes=1024)
    ds = rd.from_arrow(media)
    out = ds.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE, concurrency=2
    ).take_all()
    assert len(out) == 64
    import hashlib

    expected_sha = hashlib.sha256(media["payload"][0].as_py()).hexdigest()
    row0 = next(r for r in out if r["media_id"] == 0)
    assert row0["payload_sha"] == expected_sha
    assert len(row0["feature"]) == 64
    # deterministic fake decode: same payload → same features
    out2 = ds.map_batches(
        DecodeStage, batch_format="pyarrow", batch_size=RECOMMENDED_MEDIA_BATCH_SIZE, concurrency=2
    ).take_all()
    assert {r["media_id"]: r["feature_norm"] for r in out} == {
        r["media_id"]: r["feature_norm"] for r in out2
    }


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError, match="decoding"):
        DecodeStage(real=True)


def test_resize_and_frame_sample_stages(ray_session):
    media = synth_media_table(8, kind="video", payload_bytes=256)
    resized = ResizeStage(32, 32)(media)
    metas = resized["meta"].to_pylist()
    assert all(m["width"] == 32 and m["height"] == 32 for m in metas)
    frames = FrameSampleStage(n_frames=4)(media)
    assert len(frames) == 32
    assert frames["frame_idx"].to_pylist()[:4] == [0, 1, 2, 3]


def test_frame_sample_then_decode_chained_pipeline(ray_session):
    # video → frame explosion → per-frame decode, chained as Ray stages
    media = synth_media_table(6, kind="video", payload_bytes=512)
    ds = rd.from_arrow(media)
    frames = ds.map_batches(FrameSampleStage(n_frames=3), batch_format="pyarrow")

    def add_kind(batch):
        import pyarrow as pa

        return batch.append_column("kind", pa.array(["video"] * len(batch)))

    out = (
        frames.map_batches(add_kind, batch_format="pyarrow")
        .map_batches(DecodeStage, batch_format="pyarrow", batch_size=8, concurrency=2)
        .take_all()
    )
    assert len(out) == 18  # 6 videos x 3 frames
    assert all(len(r["feature"]) == 64 for r in out)
