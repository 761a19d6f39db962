"""Source-format interop: a JSONL chunk stream replays to the identical lake
as the same stream in Parquet (operator S1 over a second wire format)."""

import shutil

from movex_cdc_ray.pipelines.replay import lake_to_pandas, replay
from movex_cdc_ray.sources.stream import convert_chunks_to_jsonl, list_chunks
from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream

SPEC = StreamSpec(n_events=6000, n_repos=6, paths_per_repo=20, chunk_size=2000)


def test_jsonl_stream_replays_to_identical_lake(ray_session, tmp_path):
    pq_stream = str(tmp_path / "pq_stream")
    js_stream = str(tmp_path / "js_stream")
    generate_stream(pq_stream, SPEC)
    convert_chunks_to_jsonl(pq_stream, js_stream)
    assert len(list_chunks(js_stream)) == len(list_chunks(pq_stream))

    cfg = config_for_spec(SPEC, num_partitions=4)
    lake_a = str(tmp_path / "lake_a")
    lake_b = str(tmp_path / "lake_b")
    shutil.rmtree(lake_a, ignore_errors=True)
    shutil.rmtree(lake_b, ignore_errors=True)
    rep_a = replay(pq_stream, lake_a, cfg, chunks_per_epoch=2)
    rep_b = replay(js_stream, lake_b, cfg, chunks_per_epoch=2)
    assert rep_a.events_in == rep_b.events_in

    a = lake_to_pandas(lake_a).reset_index(drop=True)
    b = lake_to_pandas(lake_b).reset_index(drop=True)
    cols = [c for c in a.columns]
    assert a[cols].equals(b[cols])
