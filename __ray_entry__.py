"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay: a deterministic binlog-style change
stream over the north-rule source-code table (repo, path, commit, lang,
content) is captured, hash-partitioned, merged exactly-once into a lake, and
the converged lake Dataset is returned.

``queries()`` / ``oracle_sql()`` expose one entry per implemented operator
from SURVEY.md §2 plus the training-data extensions; see
``movex_cdc_ray/pipelines/queries.py``.

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import shutil
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: synthetic change-stream replay → converged lake.

    Uses the deterministic synthesizer (the north-rule input shape — testdata
    has no binlog table); stream size is sf0.001-scale. Returns the lake as a
    ray.data.Dataset.
    """
    from movex_cdc_ray.pipelines.replay import read_lake, replay
    from movex_cdc_ray.synth import StreamSpec, config_for_spec, generate_stream, stream_matches_spec

    spec = StreamSpec(
        n_events=8_000, n_repos=10, paths_per_repo=50, chunk_size=4_000, evolve_at_event=6_000
    )
    stream_dir = "/tmp/movex_entry/stream"
    lake_dir = "/tmp/movex_entry/lake"
    # _SPEC.json equality certifies a complete, spec-exact cached stream
    # (a bare chunk count would reuse stale/truncated dirs across versions)
    if not stream_matches_spec(stream_dir, spec):
        shutil.rmtree(stream_dir, ignore_errors=True)
        generate_stream(stream_dir, spec)
    shutil.rmtree(lake_dir, ignore_errors=True)
    cfg = config_for_spec(spec, num_partitions=8)
    replay(stream_dir, lake_dir, cfg, chunks_per_epoch=2)
    return read_lake(lake_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from movex_cdc_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (same column names/values).
    EVERY queries() key has a value oracle (no rows-only entries since
    round 4: the fake-feature plumbing mode is pytest-locked by an
    independent PCG64 re-derivation instead of a driver row count;
    multimodal_decode_real is the driver-visible decode contract), including
    the seeded hash families (minhash perms, simhash, hyperplane LSH), the
    IVF k-means quantizer (unrolled Lloyd iterations as materialized CTEs),
    BPE tokenizer training AND encoding (pipe-wrapped symbols make each
    merge round one boundary-safe REPLACE; 30 rounds unrolled as
    materialized CTEs), the flagship replay's staged binlog, and the real
    multimodal decodes (byte-level BMP/PPM/WAV re-decode in SQL)."""
    from movex_cdc_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
