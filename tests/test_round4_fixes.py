"""Round-4 directives: delta-mode incremental views (maintenance at
compaction), user-registry import/export (`import_export_config.rb:66-77,
134-156`), source-introspection verbs (`config/routes.rb:12-17`),
consumer-group introspection (`config/routes.rb:29-30`), degree-orientation
triangle counting, and the advice-item guards."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from movex_cdc_ray.api import Engine
from movex_cdc_ray.auth import AuthRegistry, NotAuthorized, SchemaRight, User
from movex_cdc_ray.config import ViewSpec, default_code_cdc_config
from movex_cdc_ray.pipelines.replay import compact, compact_view, read_view, replay
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

SPEC = StreamSpec(n_events=8_000, n_repos=8, paths_per_repo=40, chunk_size=1_600,
                  evolve_at_event=6_000)


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_r4"))
    generate_stream(d, SPEC)
    return d


def _cfg():
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.views = [ViewSpec("by_repo", ["repo"], ["size"])]
    return cfg


def _view_pdf(lake):
    pdf = read_view(lake, "by_repo").to_pandas()
    pdf["n_rows"] = pdf["n_rows"].astype("int64")
    pdf["sum_size"] = pdf["sum_size"].astype("int64")
    return (
        pdf.sort_values("repo").reset_index(drop=True)[["repo", "n_rows", "sum_size"]]
    )


# ---------------------------------------------------------------------------
# delta-mode incremental views: maintenance at compaction
# ---------------------------------------------------------------------------


def test_delta_mode_view_matches_rewrite(ray_session, stream_dir, tmp_path):
    # rewrite mode maintains per-epoch; delta mode defers to compact() —
    # after the final compaction both must fold to the identical view
    rw, dl = str(tmp_path / "rw"), str(tmp_path / "dl")
    replay(stream_dir, rw, _cfg(), chunks_per_epoch=1)
    cfg = _cfg()
    replay(stream_dir, dl, cfg, chunks_per_epoch=1, merge_mode="delta")
    compact(dl, cfg)
    pd.testing.assert_frame_equal(_view_pdf(rw), _view_pdf(dl))


def test_delta_mode_view_compaction_interval_invariance(ray_session, stream_dir, tmp_path):
    # one mid-stream compaction vs a single final one: the view delta math
    # must be associative across compaction intervals
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    cfg_a, cfg_b = _cfg(), _cfg()
    replay(stream_dir, a, cfg_a, chunks_per_epoch=1, max_epochs=2,
           merge_mode="delta", drain_retries=False)
    compact(a, cfg_a)
    replay(stream_dir, a, cfg_a, chunks_per_epoch=1, merge_mode="delta")
    compact(a, cfg_a)
    replay(stream_dir, b, cfg_b, chunks_per_epoch=1, merge_mode="delta")
    compact(b, cfg_b)
    pd.testing.assert_frame_equal(_view_pdf(a), _view_pdf(b))


def test_delta_mode_view_lags_until_compaction(ray_session, stream_dir, tmp_path):
    # before any compaction the view is empty (documented lag — delta
    # epochs write no view deltas); after compact() it converges
    lake = str(tmp_path / "lag")
    cfg = _cfg()
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, merge_mode="delta")
    assert read_view(lake, "by_repo").count() == 0
    compact(lake, cfg)
    assert len(_view_pdf(lake)) > 0


def test_delta_mode_compact_view_parity(ray_session, stream_dir, tmp_path):
    # folding the compaction-written deltas into a snapshot must preserve
    # the view exactly (compact_view over delta-mode maintenance)
    lake = str(tmp_path / "snapfold")
    cfg = _cfg()
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, merge_mode="delta")
    compact(lake, cfg)
    before = _view_pdf(lake)
    snap = compact_view(lake, "by_repo")
    assert snap and snap.endswith(".snap")
    pd.testing.assert_frame_equal(before, _view_pdf(lake))


def test_delta_mode_compact_idempotent_retry(ray_session, stream_dir, tmp_path):
    # a crashed compaction attempt (view deltas staged, no commit) must be
    # invisible after the retry — the pre-clean + deterministic paths rule
    import shutil as sh

    lake = str(tmp_path / "retry")
    cfg = _cfg()
    replay(stream_dir, lake, cfg, chunks_per_epoch=1, merge_mode="delta")
    # simulate: first compaction writes view deltas, then we roll back the
    # manifest commit and re-run
    from movex_cdc_ray.state.manifest import Manifest

    before_epoch = Manifest.latest(lake).epoch
    compact(lake, cfg)
    good = _view_pdf(lake)
    manifests = sorted(
        os.path.join(lake, "_manifests", f)
        for f in os.listdir(os.path.join(lake, "_manifests"))
        if f.startswith("epoch-")
    )
    os.remove(manifests[-1])  # lose the compaction commit; deltas remain staged
    assert Manifest.latest(lake).epoch == before_epoch
    compact(lake, cfg)  # retry must pre-clean and restage
    pd.testing.assert_frame_equal(good, _view_pdf(lake))


def test_tail_delta_mode_compact_every_refreshes_views(ray_session, stream_dir, tmp_path):
    # a delta-mode tailer with compact_every both bounds the chains and
    # refreshes the compaction-maintained views; final state equals a
    # rewrite-mode replay of the same stream
    from movex_cdc_ray.pipelines.replay import tail
    from movex_cdc_ray.state.manifest import Manifest

    lake = str(tmp_path / "lake_tail")
    cfg = _cfg()
    tail(stream_dir, lake, cfg, chunks_per_epoch=1, poll_interval=0.05,
         max_idle_cycles=1, merge_mode="delta", compact_every=2)
    # any residual chain folds at a final explicit compaction
    compact(lake, cfg)
    assert not any(
        p.get("deltas") for p in Manifest.latest(lake).partitions.values()
    )
    rw = str(tmp_path / "lake_rw")
    replay(stream_dir, rw, _cfg(), chunks_per_epoch=1)
    pd.testing.assert_frame_equal(_view_pdf(rw), _view_pdf(lake))


# ---------------------------------------------------------------------------
# degree-orientation triangle counting (hub-heavy graph)
# ---------------------------------------------------------------------------


def _brute_triangles(edges: list[tuple[int, int]]) -> set:
    es = {tuple(sorted(e)) for e in edges}
    verts = sorted({v for e in es for v in e})
    out = set()
    for i, a in enumerate(verts):
        for b in verts[i + 1:]:
            if (a, b) not in es:
                continue
            for c in verts:
                if c > b and (a, c) in es and (b, c) in es:
                    out.add((a, b, c))
    return out


def test_degree_oriented_triangles_hub_graph(ray_session):
    # hub-heavy: vertex 0 connects to everyone (degree 40), plus a ring and
    # a few chords — the shape where id-orientation's wedge fan-out explodes
    import ray.data as rd

    from movex_cdc_ray.pipelines.queries import triangles_degree_oriented

    n = 40
    edges = [(0, i) for i in range(1, n + 1)]
    edges += [(i, i + 1) for i in range(1, n)]
    edges += [(i, i + 7) for i in range(1, n - 7, 3)]
    u = np.array([min(e) for e in edges], dtype=np.int64)
    v = np.array([max(e) for e in edges], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"u": pa.array(u), "v": pa.array(v)}))
    tris = triangles_degree_oriented(ds).to_pandas()
    got = {tuple(sorted((a, b, c))) for a, b, c in tris[["a", "b", "c"]].to_numpy()}
    exp = _brute_triangles(edges)
    assert got == exp
    assert len(tris) == len(got)  # each triangle exactly once


def test_degree_oriented_triangles_empty(ray_session):
    import ray.data as rd

    from movex_cdc_ray.pipelines.queries import triangles_degree_oriented

    ds = rd.from_arrow(
        pa.table({"u": pa.array([], pa.int64()), "v": pa.array([], pa.int64())})
    )
    assert triangles_degree_oriented(ds).count() == 0


# ---------------------------------------------------------------------------
# user-registry import/export (import_export_config.rb semantics)
# ---------------------------------------------------------------------------


def _auth():
    return AuthRegistry(
        users=[User(email="admin@x", yn_admin=True), User(email="dev@x")],
        schema_rights=[SchemaRight(user_email="dev@x", schema_name="CODE")],
    )


def test_export_embeds_users_and_rights(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=_auth(), actor="admin@x")
    doc = json.loads(eng.export_config())
    assert [u["email"] for u in doc["users"]] == ["admin@x", "dev@x"]
    assert doc["schemas"][0]["schema_rights"] == [{"email": "dev@x", "info": None}]
    # the document stays loadable by the plain config parser
    from movex_cdc_ray.config import CaptureConfig

    CaptureConfig.from_json(eng.export_config())


def test_import_config_roundtrips_authz(tmp_path):
    src = Engine(default_code_cdc_config(4), str(tmp_path / "a"), auth=_auth(), actor="admin@x")
    doc = src.export_config()
    dst_auth = AuthRegistry(users=[User(email="admin@x", yn_admin=True)])
    dst = Engine(default_code_cdc_config(4), str(tmp_path / "b"), auth=dst_auth, actor="admin@x")
    dst.import_config(doc)
    # dev@x existed only in the import doc: created LOCKED for reference
    u = dst_auth.find_user_case_insensitive("dev@x")
    assert u is not None and u.yn_account_locked
    assert any(
        r.user_email == "dev@x" and r.schema_name == "CODE" for r in dst_auth.schema_rights
    )


def test_import_config_revokes_surplus_rights(tmp_path):
    auth = _auth()
    auth.schema_rights.append(SchemaRight(user_email="admin@x", schema_name="CODE"))
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=auth, actor="admin@x")
    doc = json.loads(eng.export_config())
    # import doc listing ONLY dev@x on CODE: admin's CODE grant is revoked
    doc["schemas"][0]["schema_rights"] = [{"email": "dev@x", "info": "kept"}]
    eng.import_config(json.dumps(doc))
    rights = [(r.user_email, r.schema_name) for r in auth.schema_rights]
    assert ("admin@x", "CODE") not in rights
    assert ("dev@x", "CODE") in rights
    # ... and the info field was updated in place
    assert [r.info for r in auth.schema_rights if r.user_email == "dev@x"] == ["kept"]


def test_import_deactivates_surplus_schema_rights(tmp_path):
    # full import: rights on schemas ABSENT from the import are destroyed
    # (deactivate_surplus_schema) — users themselves are never deleted
    auth = _auth()
    auth.schema_rights.append(SchemaRight(user_email="dev@x", schema_name="LEGACY"))
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=auth, actor="admin@x")
    eng.import_config(eng.export_config())  # export lists only CODE
    assert {r.schema_name for r in auth.schema_rights} == {"CODE"}
    assert auth.find_user_case_insensitive("dev@x") is not None


def test_import_users_update_add_never_delete():
    auth = _auth()
    res = auth.import_users(
        [
            {"email": "DEV@X", "first_name": "Dee"},  # case-insensitive match
            {"email": "new@x", "db_user": "scott"},
        ]
    )
    assert res == {"updated": 1, "added": 1}
    assert auth.find_user_case_insensitive("dev@x").first_name == "Dee"
    assert auth.find_user_case_insensitive("new@x").db_user == "scott"
    assert auth.find_user_case_insensitive("admin@x") is not None  # untouched


def test_engine_import_users_admin_only(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=_auth(), actor="dev@x")
    with pytest.raises(NotAuthorized, match="not an admin"):
        eng.import_users(json.dumps({"users": [{"email": "x@x"}]}))


def test_import_unknown_right_user_raises(tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=_auth(), actor="admin@x")
    doc = json.loads(eng.export_config())
    doc["schemas"][0]["schema_rights"] = [{"email": "nobody@x", "info": None}]
    doc["users"] = []  # referenced user in neither registry nor import list
    with pytest.raises(ValueError, match="neither in the registry"):
        eng.import_config(json.dumps(doc))


# ---------------------------------------------------------------------------
# source introspection (db_schemas / db_tables / db_columns analogs)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def source_root(tmp_path_factory):
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("srcdb")
    d = root / "sales"
    d.mkdir()
    pq.write_table(
        pa.table({"order_id": pa.array([1, 2], pa.int64()),
                  "item": pa.array(["a", "b"]),
                  "qty": pa.array([3, 4], pa.int32()),
                  "price": pa.array([1.5, 2.5], pa.float64())}),
        str(d / "orders.parquet"),
    )
    pq.write_table(
        pa.table({"item": pa.array(["a"]), "label": pa.array(["x"])}),
        str(d / "items.parquet"),
    )
    (root / "empty_dir").mkdir()
    return str(root)


def test_list_source_schemas_tables_columns(source_root, tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path))
    assert eng.list_source_schemas(source_root) == ["SALES"]
    assert eng.list_source_tables(source_root, "SALES") == ["items", "orders"]
    cols = eng.list_source_columns(source_root, "SALES", "orders")
    assert [c["name"] for c in cols] == ["order_id", "item", "qty", "price"]
    assert cols[0]["type"] == "int64"


def test_introspection_respects_grants(source_root, tmp_path):
    eng = Engine(default_code_cdc_config(4), str(tmp_path), auth=_auth(), actor="dev@x")
    with pytest.raises(NotAuthorized):
        eng.list_source_tables(source_root, "SALES")  # dev@x holds CODE only


def test_seed_config_from_introspection_alone(ray_session, source_root, tmp_path):
    # the GUI's add-table flow: introspect → config → snapshot INIT runs
    from movex_cdc_ray.pipelines.snapshot import snapshot_events
    from movex_cdc_ray.sources.introspect import seed_capture_config

    cfg = seed_capture_config(
        source_root, "SALES", "orders", pk_columns=["order_id"], num_partitions=2
    )
    assert cfg.tables[0].pk_columns == ["order_id"]
    assert cfg.latest_version().payload_fields["qty"] == "int32"
    events = snapshot_events(
        os.path.join(source_root, "sales", "orders.parquet"), cfg, cfg.tables[0]
    ).to_pandas()
    assert len(events) == 2
    assert set(events["op"]) == {"i"}


def test_flat_dir_is_main_schema(tmp_path):
    import pyarrow.parquet as pq

    from movex_cdc_ray.sources import introspect as intr

    pq.write_table(pa.table({"a": pa.array([1], pa.int64())}), str(tmp_path / "t.parquet"))
    assert intr.list_source_schemas(str(tmp_path)) == ["MAIN"]
    assert intr.list_source_tables(str(tmp_path), "MAIN") == ["t"]


# ---------------------------------------------------------------------------
# consumer-group introspection (kafka#groups / #describe_group analogs)
# ---------------------------------------------------------------------------


def test_groups_and_describe_group(ray_session, stream_dir, tmp_path):
    from movex_cdc_ray.pipelines.produce import consume_topic, produce

    out = str(tmp_path / "topics")
    cfg = config_for_spec(SPEC, num_partitions=4)
    produce(stream_dir, out, cfg, chunks_per_epoch=2)
    eng = Engine(cfg, out)
    topic = eng.list_topics()[0]
    assert eng.groups() == []  # no committed offsets yet
    got = consume_topic(out, topic, "g1", max_messages=100)
    assert len(got) == 100
    assert eng.groups() == [{"group": "g1", "topic": topic}]
    d = eng.describe_group("g1")
    assert d["group"] == "g1"
    total_end = sum(r["log_end_offset"] for r in d["partitions"])
    assert sum(r["committed_offset"] for r in d["partitions"]) == 100
    assert d["total_lag"] == total_end - 100
    assert all(r["lag"] >= 0 for r in d["partitions"])
    # drain fully: lag reaches zero
    consume_topic(out, topic, "g1")
    assert eng.describe_group("g1")["total_lag"] == 0
    with pytest.raises(KeyError):
        eng.describe_group("nope")


# ---------------------------------------------------------------------------
# fake-decode plumbing: engine-side re-derivation (replaces the one
# rows-only driver query; multimodal_decode_real is the driver contract)
# ---------------------------------------------------------------------------


def test_fake_decode_rederivation(ray_session):
    import hashlib

    from movex_cdc_ray.pipelines.queries import multimodal_decode
    from movex_cdc_ray.functions.multimodal import synth_media_table

    got = multimodal_decode("ignored")
    media = synth_media_table(200, seed=42).to_pandas()
    # independent re-derivation of the PCG64 feature path: seed from
    # sha256(payload)[:8], standard normals at float32, norm at float64
    rows = []
    for _, r in media.iterrows():
        p = r["payload"]
        seed = int.from_bytes(hashlib.sha256(p).digest()[:8], "big")
        feats = (
            np.random.Generator(np.random.PCG64(seed)).standard_normal(64)
            .astype(np.float32)
        )
        rows.append(
            {"media_id": r["media_id"],
             "payload_sha": hashlib.sha256(p).hexdigest(),
             "payload_bytes": len(p),
             "feature_norm": round(float(np.linalg.norm(feats.astype(np.float64))), 4)}
        )
    exp = pd.DataFrame(rows).sort_values("media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns.tolist()])


def test_delta_mode_view_table_scoping(ray_session, tmp_path):
    # the compact-task's spec.table prefix filter (delta-mode view path)
    # must scope exactly like the merge-side filter does in rewrite mode
    import pyarrow.parquet as pq

    from movex_cdc_ray.config import ColumnConfig, TableConfig, default_code_cdc_config
    from movex_cdc_ray.pipelines.replay import run_epoch
    from movex_cdc_ray.state.manifest import Manifest, new_writer_token
    from tests.test_multi_table import _events

    cfg = default_code_cdc_config(num_partitions=2)
    cfg.tables.append(TableConfig(
        name="DOCS", schema_name="CODE", table_id=2, key_handling="P",
        pk_columns=["repo", "path"],
        columns=[ColumnConfig(c) for c in ("repo", "path", "commit", "lang", "content", "size", "stars")],
    ))
    cfg.views = [ViewSpec("all_repo", ["repo"]),
                 ViewSpec("docs_repo", ["repo"], table="CODE.DOCS")]

    chunk = str(tmp_path / "chunk.parquet")
    pq.write_table(pa.concat_tables([
        _events(1, [10, 11], path="p1"),
        _events(2, [12], path="p2"),
    ]), chunk)
    lake = str(tmp_path / "lake")
    m, _ = run_epoch(cfg, Manifest(lake_dir=lake), 1, [chunk], lake,
                     new_writer_token(), merge_mode="delta")
    assert read_view(lake, "all_repo").count() == 0  # deferred
    compact(lake, cfg, m)
    allv = read_view(lake, "all_repo").to_pandas()
    docs = read_view(lake, "docs_repo").to_pandas()
    assert allv["n_rows"].sum() == 2  # FILES LWW key + DOCS key
    assert docs["n_rows"].sum() == 1  # only the DOCS row


# ---------------------------------------------------------------------------
# incremental vector index: re-embedding is an UPDATE, not a rebuild
# ---------------------------------------------------------------------------


def test_ann_incremental_update_reembeds(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data as rd

    from movex_cdc_ray.functions.similarity import ivf_topk
    from movex_cdc_ray.pipelines.queries import (
        _ann_inc_config,
        _lake_vector_dataset,
        _vector_events,
    )
    from movex_cdc_ray.pipelines.replay import replay

    sf = "/root/testdata/sf0.001"
    docs = (
        pq.read_table(os.path.join(sf, "embeddings.parquet"), columns=["vec_id", "embedding"])
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    # epoch 1: full corpus; epoch 2: RE-EMBED 20 docs (deterministic
    # perturbation, ids above the quantizer's vec_id<256 sample so the
    # coarse quantizer is unchanged)
    upd = docs[docs["vec_id"].between(300, 319)].copy()
    upd["embedding"] = upd["embedding"].map(
        lambda v: (np.asarray(v, dtype=np.float64)[::-1] + 0.25).tolist()
    )
    stream = str(tmp_path / "stream")
    lake = str(tmp_path / "lake")
    os.makedirs(stream)
    id_top = int(docs["vec_id"].max()) + 2
    pq.write_table(_vector_events(docs), os.path.join(stream, "chunk_000000.parquet"))
    ev2 = _vector_events(upd, op="U", id_offset=id_top)
    pq.write_table(ev2, os.path.join(stream, "chunk_000001.parquet"))
    replay(stream, lake, _ann_inc_config(num_partitions=4), chunks_per_epoch=1)

    # the incrementally-maintained index must answer exactly like an index
    # built from scratch over the UPDATED corpus
    updated = docs.set_index("vec_id")
    for _, r in upd.iterrows():
        updated.at[r["vec_id"], "embedding"] = r["embedding"]
    updated = updated.reset_index()
    fresh = rd.from_arrow(
        pa.table({
            "vec_id": pa.array(updated["vec_id"].to_numpy(), pa.int64()),
            "embedding": pa.array(
                [list(map(float, v)) for v in updated["embedding"]], pa.list_(pa.float64())
            ),
        })
    )
    got = ivf_topk(_lake_vector_dataset(lake), query_ids=[0, 1, 2], k=5)
    exp = ivf_topk(fresh, query_ids=[0, 1, 2], k=5)
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        exp.sort_values(key).reset_index(drop=True),
    )
    # and the update really changed the index state
    lake_pdf = _lake_vector_dataset(lake).to_pandas()
    row = lake_pdf[lake_pdf["vec_id"] == 300]["embedding"].iloc[0]
    assert not np.allclose(row, np.asarray(docs[docs["vec_id"] == 300]["embedding"].iloc[0], dtype=np.float64))


def test_binary_payload_produce_renders_hex(ray_session, tmp_path):
    # a binary payload column flows through the FULL delivery path: capture
    # envelope -> JSON message (upper-hex per the reference's convert_col
    # binary arm) -> KafkaMock conformance -> consumer sees the exact bytes
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.produce import consume_topic, produce
    from movex_cdc_ray.pipelines.queries import _ann_inc_config, _vector_events

    cfg = _ann_inc_config(num_partitions=2)
    cfg.tables[0].topic = "lake.vectors"
    docs = pd.DataFrame(
        {"vec_id": [1, 2, 3],
         "embedding": [[1.0, 2.0], [0.5, -0.25], [3.0, 4.0]]}
    )
    stream = str(tmp_path / "stream")
    os.makedirs(stream)
    pq.write_table(_vector_events(docs), os.path.join(stream, "chunk_000000.parquet"))
    out = str(tmp_path / "topics")
    produce(stream, out, cfg, chunks_per_epoch=1)
    msgs = consume_topic(out, "lake.vectors", "g1")
    assert len(msgs) == 3
    by_id = {m["value"]["new"]["vec_id"]: m for m in msgs}
    hex_payload = by_id[1]["value"]["new"]["embedding"]
    assert bytes.fromhex(hex_payload) == np.asarray([1.0, 2.0], dtype=np.float64).tobytes()
    assert hex_payload == hex_payload.upper()


def test_incremental_df_retracts_on_doc_delete(ray_session, tmp_path):
    # DF maintained as CDC state + view: deleting a doc retracts its terms'
    # df (the op a batch DF table needs a corpus rescan for)
    import pyarrow.parquet as pq

    from movex_cdc_ray.config import (
        CaptureConfig, ColumnConfig, SchemaConfig, SchemaVersion, TableConfig, ViewSpec,
    )
    from movex_cdc_ray.pipelines.replay import read_view, replay

    v1 = SchemaVersion(version=1, active_from_id=0,
                       payload_fields={"term": "string", "doc_id": "int64"})
    table = TableConfig(
        name="TERMS", schema_name="CORPUS", table_id=1, key_handling="P",
        pk_columns=["term", "doc_id"],
        columns=[ColumnConfig("term"), ColumnConfig("doc_id")],
    )
    cfg = CaptureConfig(
        schemas=[SchemaConfig(name="CORPUS")], tables=[table],
        schema_versions=[v1], num_partitions=2, capture_parallelism=1,
        views=[ViewSpec("df", ["term"])],
    )
    ts = pa.scalar(1_700_000_000_000_000, pa.timestamp("us")).as_py()

    def ev(rows, op, base):
        n = len(rows)
        return pa.table(
            {"id": pa.array(range(base, base + n), pa.int64()),
             "table_id": pa.array([1] * n, pa.int32()),
             "op": pa.array([op] * n),
             "dbuser": pa.array(["c"] * n),
             "txn_id": pa.nulls(n, pa.string()),
             "created_at": pa.array([ts] * n, pa.timestamp("us")),
             "retry_count": pa.array(np.zeros(n, np.int32)),
             "new_term": pa.array([r[0] for r in rows], pa.string()),
             "new_doc_id": pa.array([r[1] for r in rows], pa.int64()),
             # DELETE re-derives its key from the old image
             "old_term": pa.array([r[0] if op == "D" else None for r in rows], pa.string()),
             "old_doc_id": pa.array([r[1] if op == "D" else None for r in rows], pa.int64())}
        )

    stream = str(tmp_path / "s")
    lake = str(tmp_path / "l")
    os.makedirs(stream)
    # doc 1: {a, b}; doc 2: {a}; then DELETE doc 1's memberships
    pq.write_table(ev([("a", 1), ("b", 1), ("a", 2)], "I", 1),
                   os.path.join(stream, "chunk_000000.parquet"))
    pq.write_table(ev([("a", 1), ("b", 1)], "D", 10),
                   os.path.join(stream, "chunk_000001.parquet"))
    replay(stream, lake, cfg, chunks_per_epoch=1)
    df = read_view(lake, "df").to_pandas().set_index("term")["n_rows"].astype(int).to_dict()
    assert df == {"a": 1}  # b fully retracted, a down to doc 2 only


# ---------------------------------------------------------------------------
# advice-item guards
# ---------------------------------------------------------------------------


def test_minhash_batch_path_matches_scalar():
    # the Arrow-native batch signature path must stay byte-identical to the
    # per-doc scalar path (the SQL oracle derives from the scalar contract)
    from movex_cdc_ray.functions.dedup import MinHasher

    texts = pd.Series(
        ["", "one two", "a b c d e", "a a a a", "x_1 y-2 z!3 x_1", "Unicode Wörter hier drei mal"]
    )
    scalar = MinHasher()
    exp = np.stack([scalar.signature(t) for t in texts])
    got = MinHasher()._batch_signatures(texts)
    assert np.array_equal(got, exp)


def test_simhash_batch_path_matches_scalar():
    from movex_cdc_ray.functions.dedup import SimHasher

    texts = pd.Series(["", "one", "a b c", "x x x y", "Wörter über alles", "tie tie"])
    exp = np.array([SimHasher().simhash(t) for t in texts], dtype=np.uint64)
    got = SimHasher()._batch_simhashes(texts)
    assert np.array_equal(got, exp)


def test_kcenter_k_exceeds_corpus_raises(ray_session):
    import ray.data as rd

    from movex_cdc_ray.functions.similarity import kcenter_select

    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array([1, 2], pa.int64()),
                  "emb": pa.array([[0.0, 1.0], [1.0, 0.0]], pa.list_(pa.float64()))})
    )
    with pytest.raises(ValueError, match="exceeds corpus size"):
        kcenter_select(ds, k=5, id_col="vec_id", vec_col="emb")
