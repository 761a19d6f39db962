"""Command-line entry points — the operational surface a reference user gets
from its service + REST API, as `python -m movex_cdc_ray <cmd>`.

Commands own the Ray session (guarded init / shutdown); library code never
initialises Ray.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys


def _ray_init_kwargs(num_cpus: int | None, env: dict | None = None) -> dict:
    """ray.init kwargs for a CLI driver. ``RAY_ADDRESS`` decides the mode:
    unset/'local' starts a single-node session (num_cpus honored); anything
    else — what `ray job submit` exports for the job driver — JOINS the
    existing cluster, where num_cpus must not (and does not) constrain the
    session. The same `python -m movex_cdc_ray <cmd>` line is therefore the
    `ray job submit --working-dir . -- ...` entrypoint unchanged."""
    import os

    address = (env if env is not None else os.environ).get("RAY_ADDRESS", "local")
    kwargs = {"address": address, "include_dashboard": False, "logging_level": "ERROR"}
    if num_cpus and address == "local":
        kwargs["num_cpus"] = num_cpus
    return kwargs


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(**_ray_init_kwargs(num_cpus))
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_config(args) -> "CaptureConfig":
    from .config import CaptureConfig
    from .synth import StreamSpec, config_for_spec

    if getattr(args, "config", None):
        with open(args.config) as f:
            return CaptureConfig.from_json(f.read())
    cfg = config_for_spec(StreamSpec(n_events=0), num_partitions=args.partitions)
    return cfg


def cmd_synth(args) -> int:
    from .synth import StreamSpec, generate_stream

    spec = StreamSpec(
        n_events=args.events,
        n_repos=args.repos,
        paths_per_repo=args.paths_per_repo,
        hot_repo_fraction=args.hot_fraction,
        chunk_size=args.chunk_size,
        seed=args.seed,
        evolve_at_event=args.evolve_at,
    )
    paths = generate_stream(args.stream_dir, spec)
    print(json.dumps({"chunks": len(paths), "events": args.events, "dir": args.stream_dir}))
    return 0


def cmd_replay(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.replay import replay

    cfg = _load_config(args)
    rep = replay(
        args.stream_dir,
        args.lake_dir,
        cfg,
        chunks_per_epoch=args.chunks_per_epoch,
        merge_mode=args.merge_mode,
        shuffle_mode=args.shuffle_mode,
        compact_every=args.compact_every,
    )
    print(
        json.dumps(
            {
                "epochs": rep.epochs,
                "events_in": rep.events_in,
                "events_success": rep.events_success,
                "delayed_errors": rep.events_delayed_errors,
                "final_errors": rep.events_final_errors,
                "lake_rows": rep.lake_rows,
                "elapsed_sec": round(rep.elapsed_sec, 3),
                "events_per_sec": round(rep.events_per_sec),
            }
        )
    )
    ray.shutdown()
    return 0


def cmd_tail(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.replay import tail

    cfg = _load_config(args)
    rep = tail(
        args.stream_dir,
        args.lake_dir,
        cfg,
        chunks_per_epoch=args.chunks_per_epoch,
        poll_interval=args.poll_interval,
        max_idle_cycles=args.max_idle_cycles,
        merge_mode=args.merge_mode,
        compact_every=args.compact_every,
    )
    print(json.dumps({"epochs": rep.epochs, "events_in": rep.events_in, "lake_rows": rep.lake_rows}))
    ray.shutdown()
    return 0


def cmd_compact(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.replay import compact

    cfg = _load_config(args)
    m = compact(args.lake_dir, cfg)
    print(json.dumps({"epoch": m.epoch, "partitions": len(m.partitions), "rows": m.total_rows()}))
    ray.shutdown()
    return 0


def cmd_purge_tombstones(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.replay import purge_tombstones

    cfg = _load_config(args)
    m = purge_tombstones(args.lake_dir, cfg, force=args.force)
    print(json.dumps({"epoch": m.epoch, "metrics": m.metrics}, default=str))
    ray.shutdown()
    return 0


def cmd_delete_where(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.replay import delete_where

    cfg = _load_config(args)
    m, n = delete_where(args.lake_dir, cfg, args.column, args.values)
    print(json.dumps({"epoch": m.epoch, "rows_erased": n}, default=str))
    ray.shutdown()
    return 0


def cmd_repartition(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.replay import repartition_lake

    cfg = _load_config(args)
    m = repartition_lake(args.lake_dir, cfg, args.new_partitions)
    print(json.dumps({"epoch": m.epoch, "num_partitions": m.num_partitions,
                      "partitions": len(m.partitions), "rows": m.total_rows()}))
    ray.shutdown()
    return 0


def cmd_produce(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.produce import produce

    cfg = _load_config(args)
    rep = produce(args.stream_dir, args.out_dir, cfg,
                  chunks_per_epoch=args.chunks_per_epoch)
    print(json.dumps(rep))
    ray.shutdown()
    return 0


def cmd_consume(args) -> int:
    # pure filesystem read — no Ray session needed (saves the multi-second
    # ray.init warm-up just to print a few JSON lines)
    if args.group:
        from .pipelines.produce import consume_topic

        msgs = consume_topic(args.out_dir, args.topic, args.group,
                             max_messages=args.limit)
        for m in msgs:
            print(json.dumps(m))
        print(json.dumps({"topic": args.topic, "group": args.group,
                          "consumed": len(msgs)}))
        return 0
    from .pipelines.produce import topic_messages

    msgs = topic_messages(args.out_dir, args.topic)
    for m in msgs[: args.limit]:
        print(json.dumps(m))
    print(json.dumps({"topic": args.topic, "total_messages": len(msgs)}))
    return 0


def cmd_materialize(args) -> int:
    """Rebuild converged state from a topic's delivered messages (the
    downstream-consumer fold) and write it as partitioned parquet."""
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.produce import materialize_topic

    cfg = _load_config(args)
    ds = materialize_topic(args.out_dir, args.topic, cfg,
                           num_partitions=args.partitions)
    ds.write_parquet(args.state_dir)
    n = ray.data.read_parquet(args.state_dir).count()
    print(json.dumps({"topic": args.topic, "state_dir": args.state_dir, "rows": n}))
    ray.shutdown()
    return 0


def cmd_view(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.replay import compact_view, read_view

    if args.compact:
        path = compact_view(args.lake_dir, args.name)
        print(json.dumps({"view": args.name, "snapshot": path}))
    else:
        rows = read_view(args.lake_dir, args.name).take(args.limit)
        print(json.dumps({"view": args.name, "rows": rows}, default=str))
    ray.shutdown()
    return 0


def cmd_corpus_prep(args) -> int:
    """Run the composed training-data prep flagship and write the result as
    split-partitioned parquet (train/val/test directories) — partitioned
    output so a re-run can skip finished partitions."""
    from .pipelines.queries import corpus_prep_pipeline

    _ray_init(args.num_cpus)
    ds = corpus_prep_pipeline(args.sf_dir).materialize()  # count() is then
    ds.write_parquet(args.out_dir, partition_cols=["split"])  # metadata-only
    print(json.dumps({"out_dir": args.out_dir, "rows": ds.count()}))
    return 0


def cmd_corpus_stats(args) -> int:
    """Corpus profile from the mergeable-sketch family: HLL approximate
    distinct texts, count-min-backed frequencies for the exact heavy
    hitters, and KMV-sampled doc-length quantiles. The three sketches run
    as ONE fused streaming scan (`sketch.corpus_profile`: every batch
    emits the tagged union of its three bounded partials); the exact
    heavy-hitter pass is the only second read."""
    import numpy as np
    import ray.data as rd

    from .functions.corpus import top_tokens
    from .functions.sketch import corpus_profile, count_min_query

    _ray_init(args.num_cpus)
    path = args.docs if args.docs.endswith(".parquet") else f"{args.docs}/documents.parquet"
    ds = rd.read_parquet(path, columns=["doc_id", "text"])
    prof = corpus_profile(ds, k=500)
    distinct = prof["approx_distinct"]
    top = top_tokens(ds, k=args.top_k).to_pandas()
    cms = count_min_query(prof["cms_cells"], top["token"].tolist())
    lens = prof["sample"]["text_chars"].to_numpy(dtype="float64")
    qs = [0.25, 0.5, 0.9, 0.99]
    quants = dict(zip((str(q) for q in qs), np.round(np.percentile(lens, [q * 100 for q in qs]), 1)))
    print(
        json.dumps(
            {
                "docs": ds.count(),
                "approx_distinct_texts": round(distinct),
                "top_tokens": [
                    {"token": t, "n": int(n), "cms_estimate": cms[t]}
                    for t, n in zip(top["token"], top["n"])
                ],
                "doc_chars_quantiles_sampled": quants,
            }
        )
    )
    return 0


def cmd_health(args) -> int:
    from .stages.stats import health_check

    print(json.dumps(health_check(args.lake_dir), default=str))
    return 0


def cmd_lookup(args) -> int:
    """Point lookup: one key's live state, one partition file touched —
    no Ray job, no lake scan."""
    from .pipelines.replay import lookup_key

    df = lookup_key(args.lake_dir, args.key, at_epoch=args.at_epoch)
    print(df.to_json(orient="records", date_format="iso"))
    return 0


def cmd_reprocess(args) -> int:
    from .stages.errors import reprocess_final_errors
    from .state.manifest import Manifest

    n = reprocess_final_errors(args.lake_dir, Manifest.latest(args.lake_dir).epoch)
    print(json.dumps({"reprocessed": n}))
    return 0


def cmd_verify_lake(args) -> int:
    from .pipelines.replay import lake_to_pandas

    g = lake_to_pandas(args.lake_dir)
    if len(g) == 0:
        print(json.dumps({"rows": 0, "digest": None}))
        return 0
    g = g.sort_values("_key").reset_index(drop=True)
    # digest over ALL payload columns (everything not engine-reserved), not
    # a hard-coded 'content' — custom-config lakes are first-class here
    payload_cols = [c for c in g.columns if not c.startswith("_")]
    sha = hashlib.sha256()
    for k, row in zip(g["_key"], g[payload_cols].itertuples(index=False)):
        body = "\x1f".join("" if v is None else str(v) for v in row)
        csha = hashlib.sha256(body.encode()).hexdigest()
        sha.update(f"{k}:{csha}\n".encode())
    print(json.dumps({"rows": len(g), "digest": sha.hexdigest()}))
    return 0


def cmd_validate(args) -> int:
    _ray_init(args.num_cpus)
    import ray

    from .pipelines.conformance import conformance_check

    cfg = _load_config(args)
    print(json.dumps(conformance_check(args.stream_dir, cfg, args.max_chunks)))
    ray.shutdown()
    return 0


def cmd_export_config(args) -> int:
    cfg = _load_config(args)
    print(cfg.to_json())
    return 0


def cmd_groups(args) -> int:
    """kafka#groups / #describe_group analogs (config/routes.rb:29-30) —
    driver-side directory reads, no Ray session."""
    from .pipelines.produce import describe_group, list_groups

    if args.group:
        print(json.dumps(describe_group(args.out_dir, args.group)))
    else:
        print(json.dumps(list_groups(args.out_dir)))
    return 0


def cmd_introspect(args) -> int:
    """db_schemas/db_tables/db_columns analogs (config/routes.rb:12-17) —
    footer-only metadata reads, no Ray session."""
    from .sources import introspect as intr

    if args.table:
        out = intr.list_source_columns(args.source_root, args.schema, args.table)
    elif args.schema:
        out = intr.list_source_tables(args.source_root, args.schema)
    else:
        out = intr.list_source_schemas(args.source_root)
    print(json.dumps(out))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="movex_cdc_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp, lake=True, config=True):
        if lake:
            sp.add_argument("--lake-dir", required=True)
        if config:
            sp.add_argument("--config", help="CaptureConfig JSON file")
            sp.add_argument("--partitions", type=int, default=32)
        sp.add_argument("--num-cpus", type=int, default=None)

    sp = sub.add_parser("synth", help="generate a deterministic change stream")
    sp.add_argument("--stream-dir", required=True)
    sp.add_argument("--events", type=int, default=100_000)
    sp.add_argument("--repos", type=int, default=50)
    sp.add_argument("--paths-per-repo", type=int, default=200)
    sp.add_argument("--hot-fraction", type=float, default=0.2)
    sp.add_argument("--chunk-size", type=int, default=100_000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--evolve-at", type=int, default=None)
    sp.set_defaults(fn=cmd_synth)

    sp = sub.add_parser("replay", help="replay a change stream into the lake")
    sp.add_argument("--stream-dir", required=True)
    common(sp)
    sp.add_argument("--chunks-per-epoch", type=int, default=8)
    sp.add_argument("--merge-mode", choices=["rewrite", "delta"], default="rewrite")
    sp.add_argument("--shuffle-mode", choices=["groupby", "files"], default="groupby")
    sp.add_argument("--compact-every", type=int, default=0)
    sp.set_defaults(fn=cmd_replay)

    sp = sub.add_parser("tail", help="continuously follow a growing stream dir")
    sp.add_argument("--stream-dir", required=True)
    common(sp)
    sp.add_argument("--chunks-per-epoch", type=int, default=8)
    sp.add_argument("--poll-interval", type=float, default=1.0)
    sp.add_argument("--max-idle-cycles", type=int, default=3)
    sp.add_argument("--merge-mode", choices=["rewrite", "delta"], default="rewrite")
    sp.add_argument("--compact-every", type=int, default=0,
                    help="delta mode: fold chains (and refresh views) every k epochs")
    sp.set_defaults(fn=cmd_tail)

    sp = sub.add_parser("compact", help="fold delta chains into fresh bases")
    common(sp)
    sp.set_defaults(fn=cmd_compact)

    sp = sub.add_parser("produce", help="deliver a change stream to per-topic message files (exactly-once)")
    sp.add_argument("--stream-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--chunks-per-epoch", type=int, default=8)
    sp.add_argument("--config", help="CaptureConfig JSON file")
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_produce)

    sp = sub.add_parser("consume", help="read committed messages of a topic")
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--topic", required=True)
    sp.add_argument("--limit", type=int, default=10)
    sp.add_argument("--group", default=None,
                    help="consumer group: resume after the group's committed offsets and auto-commit")
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_consume)

    sp = sub.add_parser("materialize", help="rebuild converged state from a topic's delivered messages")
    sp.add_argument("--out-dir", required=True, help="produce output dir (topics root)")
    sp.add_argument("--topic", required=True)
    sp.add_argument("--state-dir", required=True, help="parquet output directory")
    sp.add_argument("--config", help="CaptureConfig JSON file")
    sp.add_argument("--partitions", type=int, default=32)
    sp.add_argument("--num-cpus", type=int, default=None)
    sp.set_defaults(fn=cmd_materialize)

    sp = sub.add_parser("view", help="read or compact an incrementally-maintained view")
    common(sp, config=False)
    sp.add_argument("--name", required=True)
    sp.add_argument("--compact", action="store_true", help="fold the delta chain into a snapshot")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_view)

    sp = sub.add_parser("purge-tombstones", help="drop tombstone fences once the retry ledger is drained")
    common(sp)
    sp.add_argument("--force", action="store_true")
    sp.set_defaults(fn=cmd_purge_tombstones)

    sp = sub.add_parser("delete-where", help="GDPR-style targeted erasure: live rows matching column IN values become tombstone fences")
    common(sp)
    sp.add_argument("--column", required=True)
    sp.add_argument("--values", nargs="+", required=True)
    sp.set_defaults(fn=cmd_delete_where)

    sp = sub.add_parser("repartition", help="re-key the lake to a new partition count P")
    common(sp)
    sp.add_argument("--new-partitions", type=int, required=True)
    sp.set_defaults(fn=cmd_repartition)

    sp = sub.add_parser("corpus-prep", help="gate→decontaminate→dedup→split→pack; split-partitioned parquet out")
    sp.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    sp.add_argument("--out-dir", required=True)
    common(sp, lake=False, config=False)
    sp.set_defaults(fn=cmd_corpus_prep)

    sp = sub.add_parser("corpus-stats", help="one-pass sketch profile: HLL distinct, heavy hitters + count-min, sampled length quantiles")
    sp.add_argument("--docs", default="/root/testdata/sf0.001", help="documents.parquet or its sf dir")
    sp.add_argument("--top-k", type=int, default=10)
    common(sp, lake=False, config=False)
    sp.set_defaults(fn=cmd_corpus_stats)

    sp = sub.add_parser("health", help="health check from manifests (no data scan)")
    common(sp, config=False)
    sp.set_defaults(fn=cmd_health)

    sp = sub.add_parser("lookup", help="point lookup of one key's live state (single-partition read)")
    sp.add_argument("--key", required=True, help="full key_string (SCHEMA.TABLE\\x1f<pk...>)")
    sp.add_argument("--at-epoch", type=int, default=None)
    common(sp, config=False)
    sp.set_defaults(fn=cmd_lookup)

    sp = sub.add_parser("reprocess-final-errors", help="requeue quarantined events")
    common(sp, config=False)
    sp.set_defaults(fn=cmd_reprocess)

    sp = sub.add_parser("verify-lake", help="content-sha256 digest of the converged lake")
    common(sp, config=False)
    sp.set_defaults(fn=cmd_verify_lake)

    sp = sub.add_parser("validate", help="KafkaMock-mode conformance check of a stream")
    sp.add_argument("--stream-dir", required=True)
    common(sp, lake=False)
    sp.add_argument("--max-chunks", type=int, default=None)
    sp.set_defaults(fn=cmd_validate)

    sp = sub.add_parser("export-config", help="print the (default or given) config JSON")
    common(sp, lake=False)
    sp.set_defaults(fn=cmd_export_config)

    sp = sub.add_parser("groups", help="list consumer groups, or describe one group's per-partition lag")
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--group", help="describe this group (omit to list all)")
    sp.set_defaults(fn=cmd_groups)

    sp = sub.add_parser("introspect", help="list source schemas / tables / columns of a parquet source dir")
    sp.add_argument("--source-root", required=True)
    sp.add_argument("--schema", help="list tables of this schema")
    sp.add_argument("--table", help="list columns of this table (needs --schema)")
    sp.set_defaults(fn=cmd_introspect)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
