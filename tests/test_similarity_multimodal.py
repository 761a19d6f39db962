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


def test_real_codecs_roundtrip():
    # byte→pixels→byte fidelity of the pure-numpy codecs
    import numpy as np

    from movex_cdc_ray.functions.multimodal import (
        decode_bmp,
        decode_ppm,
        decode_wav,
        encode_bmp,
        encode_ppm,
        encode_wav,
        sniff_format,
    )

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(12, 17, 3), dtype=np.uint8)  # odd width → row padding
    assert (decode_bmp(encode_bmp(px)) == px).all()
    assert (decode_ppm(encode_ppm(px)) == px).all()
    samples = (rng.standard_normal(500) * 1000).astype(np.int16)
    out, rate = decode_wav(encode_wav(samples, 8000))
    assert rate == 8000 and (out == samples).all()
    assert sniff_format(encode_bmp(px)) == "bmp"
    assert sniff_format(encode_wav(samples)) == "wav"
    with pytest.raises(ValueError, match="unknown media"):
        sniff_format(b"\x89PNG....")


def test_real_decode_pipeline(ray_session):
    # DecodeStage(real=True) really decodes BMP/PPM/WAV payloads: features
    # derive from pixels/samples, dims are reported, runs deterministic
    from movex_cdc_ray.functions.multimodal import synth_real_media_table

    media = synth_real_media_table(30, seed=7)
    ds = rd.from_arrow(media)
    out = ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real": True},
        batch_format="pyarrow",
        batch_size=RECOMMENDED_MEDIA_BATCH_SIZE,
        concurrency=2,
    ).take_all()
    assert len(out) == 30
    metas = media["meta"].to_pylist()
    by_id = {r["media_id"]: r for r in out}
    for i, m in enumerate(metas):
        r = by_id[i]
        if m["format"] in ("bmp", "ppm"):
            assert (r["decoded_width"], r["decoded_height"]) == (m["width"], m["height"])
            assert r["decoded_samples"] == 0
        else:
            assert r["decoded_samples"] == 1600 and r["decoded_width"] == 0
        assert r["feature_norm"] > 0
    # white image → known channel-mean features (content, not hash, drives them)
    import numpy as np

    from movex_cdc_ray.functions.multimodal import encode_ppm

    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    st = DecodeStage(real=True)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": ["image"],
            "payload": pa.array([encode_ppm(white)], pa.binary()),
        }
    )
    feats = st(t)["feature"][0].as_py()
    assert feats[:3] == pytest.approx([1.0, 1.0, 1.0])  # channel means /255
    assert feats[3:6] == pytest.approx([0.0, 0.0, 0.0])  # stds


def test_real_decode_rejects_unknown_container():
    st = DecodeStage(real=True)
    t = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": ["image"],
            "payload": pa.array([b"\xff\xd8\xffJPEGISH"], pa.binary()),
        }
    )
    with pytest.raises(ValueError, match="unknown media"):
        st(t)


def test_resize_and_frame_sample_stages(ray_session):
    media = synth_media_table(8, kind="video", payload_bytes=256)
    resized = ResizeStage(32, 32)(media)
    metas = resized["meta"].to_pylist()
    assert all(m["width"] == 32 and m["height"] == 32 for m in metas)
    frames = FrameSampleStage(n_frames=4)(media)
    assert len(frames) == 32
    assert frames["frame_idx"].to_pylist()[:4] == [0, 1, 2, 3]


def test_real_resize_decodes_to_target_dimensions(ray_session):
    from movex_cdc_ray.functions.multimodal import (
        decode_bmp,
        decode_ppm,
        sniff_format,
        synth_real_media_table,
    )

    media = synth_real_media_table(20, seed=11)
    out = ResizeStage(12, 9, real=True)(media)
    for payload in out["payload"].to_pylist():
        fmt = sniff_format(payload)
        if fmt == "bmp":
            px = decode_bmp(payload)
            assert px.shape[:2] == (9, 12)
        elif fmt == "ppm":
            px = decode_ppm(payload)
            assert px.shape[:2] == (9, 12)
        # wav payloads pass through untouched (resize is an image op)
    # same-size nearest-neighbor resize is the identity on pixels
    is_bmp = pa.array([sniff_format(p) == "bmp" for p in media["payload"].to_pylist()])
    one = media.filter(is_bmp).slice(0, 1)
    px0 = decode_bmp(one["payload"][0].as_py())
    same = ResizeStage(px0.shape[1], px0.shape[0], real=True)(one)
    assert (decode_bmp(same["payload"][0].as_py()) == px0).all()


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


def test_ivf_topk_matches_bruteforce_on_clustered_data(ray_session):
    # clustered corpus: IVF with enough probes must recover the true top-k
    import numpy as np

    from movex_cdc_ray.functions.similarity import brute_force_topk, ivf_topk

    rng = np.random.default_rng(21)
    centers = rng.standard_normal((4, 12)) * 3
    vecs = np.concatenate([c + 0.3 * rng.standard_normal((50, 12)) for c in centers])
    t = pa.table(
        {
            "vec_id": pa.array(list(range(len(vecs))), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t)
    exact = brute_force_topk(ds, query_ids=[0, 60], k=5)
    approx = ivf_topk(rd.from_arrow(t), query_ids=[0, 60], k=5, n_centroids=8, n_probe=8)
    # n_probe == n_centroids → every cell probed → recall 1.0, exact match
    ga = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    gb = approx.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert ga["neighbor_id"].tolist() == gb["neighbor_id"].tolist()
    # deterministic across runs
    approx2 = ivf_topk(rd.from_arrow(t), query_ids=[0, 60], k=5, n_centroids=8, n_probe=8)
    assert approx.equals(approx2)


def test_ivf_topk_partial_probe_is_subset(ray_session):
    import numpy as np

    from movex_cdc_ray.functions.similarity import ivf_topk

    rng = np.random.default_rng(22)
    vecs = rng.standard_normal((120, 8))
    t = pa.table(
        {
            "vec_id": pa.array(list(range(120)), pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
        }
    )
    out = ivf_topk(rd.from_arrow(t), query_ids=[3], k=5, n_centroids=8, n_probe=2)
    assert len(out) <= 5 and (out["query_id"] == 3).all()
    assert out["rank"].tolist() == list(range(1, len(out) + 1))


def test_ppm_stream_roundtrip_and_real_frame_sampling(ray_session):
    import ray.data as rd

    from movex_cdc_ray.functions.multimodal import (
        DecodeStage,
        FrameSampleStage,
        decode_ppm_stream,
        encode_ppm_stream,
        synth_video_table,
    )

    rng = np.random.Generator(np.random.PCG64(3))
    frames = rng.integers(0, 256, size=(5, 6, 4, 3), dtype=np.uint8)
    stream = encode_ppm_stream(frames)
    back = decode_ppm_stream(stream)
    assert len(back) == 5 and all((a == b).all() for a, b in zip(frames, back))

    videos = synth_video_table(6, n_frames=10, seed=42)
    out = (
        rd.from_arrow(videos)
        .map_batches(FrameSampleStage, fn_constructor_kwargs={"n_frames": 4, "real": True},
                     batch_format="pyarrow", concurrency=2)
        .to_pandas()
    )
    # 4 evenly-spaced DISTINCT frames per video, real dims from the headers
    assert len(out) == 6 * 4
    assert sorted(out[out["media_id"] == 0]["frame_idx"]) == [0, 3, 6, 9]
    assert (out["src_frames"] == 10).all()
    assert (out["frame_h"] == 12).all()

    # sampled frames are standalone P6 payloads -> real decode composes;
    # the per-frame brightness stamp makes features frame-dependent
    frames_ds = rd.from_pandas(out[["media_id", "frame_idx", "payload"]].assign(kind="image"))
    feats = frames_ds.map_batches(
        DecodeStage, fn_constructor_kwargs={"real": True}, batch_format="pyarrow", concurrency=2
    ).to_pandas()
    v0 = feats[feats["media_id"] == 0].sort_values("frame_idx")
    assert v0["feature_norm"].nunique() == 4  # distinct per sampled frame


def test_frame_sample_stage_rejects_non_stream_payloads(ray_session):
    from movex_cdc_ray.functions.multimodal import FrameSampleStage, synth_media_table

    stage = FrameSampleStage(n_frames=2, real=True)
    with pytest.raises(ValueError, match="P6"):
        stage(synth_media_table(2, seed=1))  # random bytes: not a PPM stream


def test_lsh_multi_table_recall_monotone(emb_ds):
    ds, mat = emb_ds

    def recall(n_tables):
        out = lsh_bucketed_ann(ds, query_ids=[0, 7], k=5, n_bits=6, n_tables=n_tables)
        hits = 0
        for qid in (0, 7):
            exact = set(_exact_topk(mat, qid, 5))
            hits += len(exact & set(out[out["query_id"] == qid]["neighbor_id"]))
        return hits, out

    h1, _ = recall(1)
    h4, out4 = recall(4)
    # union of independent candidate sets can only help (fixed seeds)
    assert h4 >= h1
    # deterministic across runs, ranks well-formed
    _, again = recall(4)
    assert out4.equals(again)
    assert (out4.groupby("query_id")["rank"].min() == 1).all()


def test_ann_missing_queries_clear_error(ray_session):
    import pytest
    import ray.data as rd

    from movex_cdc_ray.functions.similarity import brute_force_topk, lsh_bucketed_ann

    empty = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([], pa.int64()),
                "embedding": pa.array([], pa.list_(pa.float32())),
            }
        )
    )
    for fn in (brute_force_topk, lsh_bucketed_ann):
        with pytest.raises(ValueError, match="no query vectors"):
            fn(empty, query_ids=[0, 1], k=3)


def _emb_table(mat: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, r)) for r in mat], pa.list_(pa.float32())
            ),
        }
    )


def test_kmeans_full_block_split_invariance(ray_session):
    from movex_cdc_ray.functions.similarity import kmeans_full

    rng = np.random.default_rng(7)
    mat = np.round(rng.normal(size=(60, 5)).astype(np.float32), 3)
    t = _emb_table(mat)
    one = kmeans_full(rd.from_arrow(t), k=4, iters=3)
    many = kmeans_full(rd.from_arrow(t).repartition(7), k=4, iters=3)
    assert one.equals(many)
    assert list(one.columns) == ["cluster", "i", "centroid_x", "n_vecs"]
    assert len(one) == 4 * 5
    # every vector assigned exactly once in the final iteration
    assert int(one[one["i"] == 1]["n_vecs"].sum()) == 60


def test_kmeans_full_empty_cluster_carries_centroid(ray_session):
    from movex_cdc_ray.functions.similarity import kmeans_full

    # id2's vector duplicates id0's: every point ties toward the LOWER
    # cluster, so cluster 2 is empty after iteration 1 and must carry its
    # init centroid with n_vecs 0 (the SQL LEFT-JOIN carry rule).
    mat = np.array(
        [[0.0, 0.0], [10.0, 10.0], [0.0, 0.0], [0.1, -0.1], [9.9, 10.2]],
        dtype=np.float32,
    )
    ds = rd.from_arrow(_emb_table(mat))
    out = kmeans_full(ds, k=3, iters=1)
    c2 = out[out["cluster"] == 2].sort_values("i")
    assert (c2["n_vecs"] == 0).all()
    assert list(c2["centroid_x"]) == [0.0, 0.0]
    assert int(out[out["i"] == 1]["n_vecs"].sum()) == 5
    # and the carried centroid stays LIVE: once cluster 0's mean moves off
    # [0,0], iteration 2 re-captures the duplicate points for cluster 2
    out2 = kmeans_full(ds, k=3, iters=2)
    c2b = out2[(out2["cluster"] == 2) & (out2["i"] == 1)]
    assert int(c2b["n_vecs"].iloc[0]) == 2


def test_kmeans_full_missing_init_rows_raises(ray_session):
    from movex_cdc_ray.functions.similarity import kmeans_full

    mat = np.ones((2, 3), dtype=np.float32)
    with pytest.raises(ValueError, match="init needs"):
        kmeans_full(rd.from_arrow(_emb_table(mat)), k=5, iters=1)
