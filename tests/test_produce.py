"""Transactional topic delivery (produce.py): exactly-once message files,
per-key ascending-id ordering (the KafkaMock check), oversized-message DLQ,
byte-identical crash recovery."""

import glob
import hashlib
import json
import os

import pytest

from movex_cdc_ray.pipelines.produce import produce, topic_messages
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

SPEC = StreamSpec(n_events=5_000, n_repos=5, paths_per_repo=25, chunk_size=1_000)
TOPIC = "lake.code.files"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_prod"))
    generate_stream(d, SPEC)
    return d


def _tree_digest(out_dir):
    h = hashlib.sha256()
    for f in sorted(glob.glob(os.path.join(out_dir, "topics", "**", "*.jsonl"),
                              recursive=True)):
        h.update(f.removeprefix(out_dir).encode())
        h.update(open(f, "rb").read())
    return h.hexdigest()


def test_produce_delivery_and_ordering(ray_session, stream_dir, tmp_path):
    out = str(tmp_path / "t")
    rep = produce(stream_dir, out, config_for_spec(SPEC, num_partitions=4),
                  chunks_per_epoch=2)
    msgs = topic_messages(out, TOPIC)
    assert rep["delivered"] == len(msgs) > 0
    assert rep["oversized"] == 0
    # the full envelope made it out
    v = msgs[0]["value"]
    assert {"id", "schema", "tablename", "operation", "timestamp"} <= set(v)
    assert v["schema"] == "CODE" and v["tablename"] == "FILES"
    # per-key ascending ids within each partition (kafka_mock.rb:49-63)
    last: dict = {}
    for m in msgs:
        k = (m["_part"], m["key"])
        assert k not in last or m["value"]["id"] > last[k]
        last[k] = m["value"]["id"]
    # DELETE messages carry the old image and key from it
    dels = [m for m in msgs if m["value"]["operation"] == "DELETE"]
    assert dels and all("new" not in m["value"] and "old" in m["value"] for m in dels)


def test_produce_resume_is_noop_and_crash_recovers(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    produce(stream_dir, a, cfg, chunks_per_epoch=1)
    digest = _tree_digest(a)
    # resume on a converged dir delivers nothing and changes no bytes
    rep2 = produce(stream_dir, a, cfg, chunks_per_epoch=1)
    assert rep2["epochs"] == 0 and _tree_digest(a) == digest
    # crash after staging, before commit: lose the newest manifest, re-run
    produce(stream_dir, b, cfg, chunks_per_epoch=1)
    manifests = sorted(glob.glob(os.path.join(b, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])
    rep3 = produce(stream_dir, b, cfg, chunks_per_epoch=1)
    assert rep3["epochs"] == 1  # only the lost epoch re-ran
    assert _tree_digest(b) == digest


def test_oversized_messages_quarantined(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.max_message_bytes = 420  # flagship values render ~450-550 bytes
    out = str(tmp_path / "o")
    rep = produce(stream_dir, out, cfg, chunks_per_epoch=2)
    assert rep["oversized"] > 0
    assert rep["delivered"] + rep["oversized"] == rep["events_in"]
    for m in topic_messages(out, TOPIC):
        assert len(json.dumps(m["value"], separators=(", ", ": ")).encode()) <= 4200
    dlq = glob.glob(os.path.join(out, "_oversized", "epoch=*", "*.parquet"))
    assert dlq


def test_uncommitted_epoch_invisible(ray_session, stream_dir, tmp_path):
    # stage one epoch, then delete its manifest: readers must see nothing
    cfg = config_for_spec(SPEC, num_partitions=4)
    out = str(tmp_path / "u")
    produce(stream_dir, out, cfg, chunks_per_epoch=1, max_epochs=1)
    n_committed = len(topic_messages(out, TOPIC))
    assert n_committed > 0
    manifests = sorted(glob.glob(os.path.join(out, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])
    assert topic_messages(out, TOPIC) == []  # staged-but-uncommitted hidden


def test_produce_rebatched_crash_no_phantoms(ray_session, stream_dir, tmp_path):
    # crash after staging a 2-chunk epoch, resume with chunks_per_epoch=1:
    # attempt-1's leftover (topic, part) files must not deliver phantoms
    cfg = config_for_spec(SPEC, num_partitions=4)
    clean, crashed = str(tmp_path / "c"), str(tmp_path / "x")
    produce(stream_dir, clean, cfg, chunks_per_epoch=1)
    exp_ids = sorted(m["value"]["id"] for m in topic_messages(clean, TOPIC))
    produce(stream_dir, crashed, cfg, chunks_per_epoch=2)
    manifests = sorted(glob.glob(os.path.join(crashed, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])
    produce(stream_dir, crashed, cfg, chunks_per_epoch=1)
    got_ids = sorted(m["value"]["id"] for m in topic_messages(crashed, TOPIC))
    assert got_ids == exp_ids  # no duplicates, no gaps


def test_produce_drops_refed_retries(ray_session, stream_dir, tmp_path):
    # a re-fed retry event (id below the watermark) must NOT be re-delivered:
    # delivery has no per-key stale-drop to compensate with
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movex_cdc_ray.pipelines.produce import produce_epoch
    from movex_cdc_ray.sources.stream import list_chunks
    from movex_cdc_ray.state.manifest import Manifest, new_writer_token

    cfg = config_for_spec(SPEC, num_partitions=4)
    out = str(tmp_path / "r")
    chunks = list_chunks(stream_dir)
    m, agg1 = produce_epoch(cfg, Manifest(lake_dir=out), 1, chunks[:1], out,
                            new_writer_token())
    assert agg1["delivered"] > 0
    t = pq.read_table(chunks[0])
    t = t.set_column(t.column_names.index("retry_count"), "retry_count",
                     pa.array([1] * len(t), pa.int32()))
    retry_chunk = str(tmp_path / "retry.parquet")
    pq.write_table(t, retry_chunk)
    m, agg2 = produce_epoch(cfg, m, 2, [retry_chunk], out, new_writer_token())
    assert agg2["delivered"] == 0
    assert agg2["events_below_watermark"] == agg2["events_in"]


def test_produce_cloudevents_headers(ray_session, stream_dir, tmp_path):
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.tables[0].yn_add_cloudevents_header = True
    out = str(tmp_path / "ce")
    produce(stream_dir, out, cfg, chunks_per_epoch=4)
    msgs = topic_messages(out, TOPIC)
    assert msgs
    for m in msgs[:50]:
        h = m["headers"]
        assert h["ce_specversion"] == "1.0"
        assert h["ce_id"] == str(m["value"]["id"])
        assert h["ce_source"] and h["ce_operation"] == m["value"]["operation"]


def test_tail_produce_follows_growing_stream(ray_session, stream_dir, tmp_path):
    import shutil as sh
    import threading
    import time

    from movex_cdc_ray.pipelines.produce import tail_produce
    from movex_cdc_ray.sources.stream import list_chunks, publish_chunk

    live, out = str(tmp_path / "live"), str(tmp_path / "out")
    os.makedirs(live)
    chunks = list_chunks(stream_dir)
    publish_chunk(chunks[0], live)

    def feeder():
        for c in chunks[1:]:
            time.sleep(0.3)
            publish_chunk(c, live)

    t = threading.Thread(target=feeder)
    t.start()
    cfg = config_for_spec(SPEC, num_partitions=4)
    rep = tail_produce(live, out, cfg, chunks_per_epoch=2, poll_interval=0.2,
                       max_idle_cycles=4)
    t.join()
    rep2 = tail_produce(live, out, cfg, chunks_per_epoch=2, poll_interval=0.1,
                        max_idle_cycles=2)  # drain stragglers
    # converged delivery equals a one-shot produce of the full stream
    ref = str(tmp_path / "ref")
    produce(stream_dir, ref, cfg, chunks_per_epoch=2)
    got = sorted(m["value"]["id"] for m in topic_messages(out, TOPIC))
    exp = sorted(m["value"]["id"] for m in topic_messages(ref, TOPIC))
    assert got == exp


def test_zombie_writer_cannot_destroy_committed_output(ray_session, stream_dir, tmp_path):
    # a stale writer re-attempting an ALREADY-COMMITTED epoch must fail at
    # the early fence BEFORE its pre-clean deletes committed message files
    from movex_cdc_ray.pipelines.produce import produce_epoch
    from movex_cdc_ray.sources.stream import list_chunks
    from movex_cdc_ray.state.manifest import Manifest, new_writer_token

    cfg = config_for_spec(SPEC, num_partitions=4)
    out = str(tmp_path / "z")
    produce(stream_dir, out, cfg, chunks_per_epoch=2)
    before = _tree_digest(out)
    stale = Manifest(lake_dir=out)  # zombie that never saw the commits
    with pytest.raises(RuntimeError, match="fencing"):
        produce_epoch(cfg, stale, 1, list_chunks(stream_dir)[:1], out,
                      new_writer_token())
    assert _tree_digest(out) == before  # committed bytes untouched


def test_consumer_group_offsets(ray_session, stream_dir, tmp_path):
    from movex_cdc_ray.pipelines.produce import (
        commit_offsets, consume_topic, group_offsets, produce,
    )

    out = str(tmp_path / "cg")
    cfg = config_for_spec(SPEC, num_partitions=4)
    produce(stream_dir, out, cfg, chunks_per_epoch=1, max_epochs=3)
    all_now = topic_messages(out, TOPIC)

    # fresh group sees everything, commits, then sees nothing new
    got1 = consume_topic(out, TOPIC, "g1")
    assert [(m["_part"], m["value"]["id"]) for m in got1] == [
        (m["_part"], m["value"]["id"]) for m in all_now
    ]
    assert consume_topic(out, TOPIC, "g1") == []

    # new epochs → only the delta is consumed
    produce(stream_dir, out, cfg, chunks_per_epoch=1)
    delta = consume_topic(out, TOPIC, "g1")
    assert len(delta) == len(topic_messages(out, TOPIC)) - len(all_now) > 0
    assert consume_topic(out, TOPIC, "g1") == []

    # at-least-once: commit=False leaves offsets untouched (re-read on crash)
    got_a = consume_topic(out, TOPIC, "g2", max_messages=10, commit=False)
    got_b = consume_topic(out, TOPIC, "g2", max_messages=10, commit=False)
    assert got_a == got_b and len(got_a) == 10
    # manual commit advances the cursor
    offs = dict(group_offsets(out, TOPIC, "g2"))
    for m in got_a:
        offs[m["_part"]] = offs.get(m["_part"], 0) + 1
    commit_offsets(out, TOPIC, "g2", offs)
    got_c = consume_topic(out, TOPIC, "g2", max_messages=10, commit=False)
    assert got_c and got_c[0] != got_a[0]

    # groups are independent
    assert len(consume_topic(out, TOPIC, "g3")) == len(topic_messages(out, TOPIC))


def test_gzip_delivery_matches_plain(ray_session, stream_dir, tmp_path):
    # the reference producer's compression.type=gzip (kafka_java.rb:186-199):
    # identical messages, identical epoch shas (they hash UNCOMPRESSED
    # bytes), smaller files, and extension-agnostic readers
    cfg_plain = config_for_spec(SPEC, num_partitions=4)
    cfg_gz = config_for_spec(SPEC, num_partitions=4)
    cfg_gz.producer_compression = "gzip"
    out_p, out_g = str(tmp_path / "p"), str(tmp_path / "g")
    rep_p = produce(stream_dir, out_p, cfg_plain, chunks_per_epoch=2)
    rep_g = produce(stream_dir, out_g, cfg_gz, chunks_per_epoch=2)
    assert rep_g["delivered"] == rep_p["delivered"] > 0
    mp, mg = topic_messages(out_p, TOPIC), topic_messages(out_g, TOPIC)
    assert mp == mg
    gz_files = glob.glob(os.path.join(out_g, "topics", "**", "*.jsonl.gz"),
                         recursive=True)
    assert gz_files and not glob.glob(
        os.path.join(out_g, "topics", "**", "*.jsonl"), recursive=True)
    # compression actually compresses
    assert sum(os.path.getsize(f) for f in gz_files) < sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(out_p, "topics", "**", "*.jsonl"),
                           recursive=True))
    # read_topic (the Dataset reader) sees the same message count
    from movex_cdc_ray.pipelines.produce import read_topic

    assert read_topic(out_g, TOPIC).count() == len(mp)


def test_gzip_crash_reattempt_byte_identical(ray_session, stream_dir, tmp_path):
    # mtime=0 in the gzip header pins the bytes: deleting the newest
    # manifest (crash after staging, before commit) and re-producing must
    # reproduce every committed .gz file EXACTLY
    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.producer_compression = "gzip"
    out = str(tmp_path / "t")
    produce(stream_dir, out, cfg, chunks_per_epoch=2)

    def digest():
        h = hashlib.sha256()
        for f in sorted(glob.glob(os.path.join(out, "topics", "**", "*.jsonl.gz"),
                                  recursive=True)):
            h.update(f.removeprefix(out).encode())
            h.update(open(f, "rb").read())
        return h.hexdigest()

    d1 = digest()
    manifests = sorted(glob.glob(os.path.join(out, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])
    produce(stream_dir, out, cfg, chunks_per_epoch=2)
    assert digest() == d1


def test_consumer_group_over_gzip(ray_session, stream_dir, tmp_path):
    from movex_cdc_ray.pipelines.produce import consume_topic

    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.producer_compression = "gzip"
    out = str(tmp_path / "t")
    produce(stream_dir, out, cfg, chunks_per_epoch=2)
    first = consume_topic(out, TOPIC, "g1", max_messages=50)
    rest = consume_topic(out, TOPIC, "g1")
    assert len(first) == 50 and len(rest) > 0
    assert len(first) + len(rest) == len(topic_messages(out, TOPIC))
    assert consume_topic(out, TOPIC, "g1") == []  # offsets committed


def test_multi_table_produce_routes_per_topic(ray_session, tmp_path):
    """Two configured tables sharing one stream deliver to their OWN topic
    directories (M11 routing on the delivery path), with per-topic message
    counts matching the per-table event counts and no cross-contamination."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from movex_cdc_ray.config import ColumnConfig, TableConfig, default_code_cdc_config
    from movex_cdc_ray.pipelines.produce import produce_epoch
    from movex_cdc_ray.state.manifest import Manifest, new_writer_token
    from tests.test_multi_table import _events

    cfg = default_code_cdc_config(num_partitions=2)
    cfg.tables.append(TableConfig(
        name="DOCS", schema_name="CODE", table_id=2, topic="lake.code.docs",
        key_handling="P", pk_columns=["repo", "path"],
        columns=[ColumnConfig(c) for c in
                 ("repo", "path", "commit", "lang", "content", "size", "stars")],
    ))
    chunk = str(tmp_path / "chunk.parquet")
    both = pa.concat_tables([_events(1, [10, 11, 12]), _events(2, [13, 14])])
    pq.write_table(both, chunk)

    out = str(tmp_path / "topics")
    produce_epoch(cfg, Manifest(lake_dir=out), 1, [chunk], out, new_writer_token())

    files = topic_messages(out, "lake.code.files")
    docs = topic_messages(out, "lake.code.docs")
    assert len(files) == 3 and len(docs) == 2
    assert all(m["value"]["tablename"] == "FILES" for m in files)
    assert all(m["value"]["tablename"] == "DOCS" for m in docs)


def _frames_equal(got, want, cols):
    import pandas as pd

    g = got[cols].sort_values("_key").reset_index(drop=True)
    w = want[cols].sort_values("_key").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, w.astype(g.dtypes.to_dict()), check_exact=True)


def test_consumer_state_rebuild_equals_lake(ray_session, tmp_path):
    """The delivered message feed is a COMPLETE changelog: a downstream
    consumer folding only the topic messages (materialize_topic) converges
    to the same state as the direct lake merge — inserts, updates, deletes
    AND the mid-stream schema evolution all survive the render → JSON →
    parse round trip."""
    from movex_cdc_ray.pipelines.produce import materialize_topic
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay

    spec = StreamSpec(n_events=4_000, n_repos=5, paths_per_repo=20,
                      chunk_size=1_000, evolve_at_event=3_000)
    stream, lake, out = str(tmp_path / "s"), str(tmp_path / "l"), str(tmp_path / "t")
    generate_stream(stream, spec)
    cfg = config_for_spec(spec, num_partitions=4)
    replay(stream, lake, cfg, chunks_per_epoch=2)
    produce(stream, out, cfg, chunks_per_epoch=2)

    got = materialize_topic(out, TOPIC, cfg).to_pandas()
    want = lake_to_pandas(lake)
    assert len(got) == len(want) > 0
    # tombstoned keys really are absent on the consumer side too
    assert (want["_last_op"] != "D").all() and (got["_last_op"] != "D").all()
    _frames_equal(got, want,
                  ["_key", "_last_id", "_last_op", "repo", "path", "commit",
                   "lang", "content", "size", "stars"])


def test_consumer_state_rebuild_over_gzip(ray_session, stream_dir, tmp_path):
    """Same rebuild through gzip-compressed delivery files."""
    from movex_cdc_ray.pipelines.produce import materialize_topic
    from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay

    cfg = config_for_spec(SPEC, num_partitions=4)
    cfg.producer_compression = "gzip"
    lake, out = str(tmp_path / "l"), str(tmp_path / "t")
    replay(stream_dir, lake, config_for_spec(SPEC, num_partitions=4),
           chunks_per_epoch=3)
    produce(stream_dir, out, cfg, chunks_per_epoch=3)

    got = materialize_topic(out, TOPIC, cfg).to_pandas()
    want = lake_to_pandas(lake)
    assert len(got) == len(want) > 0
    _frames_equal(got, want,
                  ["_key", "_last_id", "_last_op", "repo", "path", "commit",
                   "lang", "content", "size"])


def test_consumer_state_ignores_uncommitted_epochs(ray_session, stream_dir, tmp_path):
    """Exactly-once on the read side: staged-but-uncommitted message files
    (crash after staging, before manifest commit) are invisible to the
    rebuild, so consumer state equals the last COMMITTED epoch's state."""
    from movex_cdc_ray.pipelines.produce import materialize_topic

    cfg = config_for_spec(SPEC, num_partitions=4)
    out = str(tmp_path / "t")
    produce(stream_dir, out, cfg, chunks_per_epoch=2, max_epochs=1)
    committed = materialize_topic(out, TOPIC, cfg).to_pandas()

    produce(stream_dir, out, cfg, chunks_per_epoch=2, max_epochs=1)
    manifests = sorted(glob.glob(os.path.join(out, "_manifests", "epoch-*.json")))
    os.remove(manifests[-1])  # second epoch staged its files but lost its commit
    again = materialize_topic(out, TOPIC, cfg).to_pandas()
    _frames_equal(again, committed, list(committed.columns))
