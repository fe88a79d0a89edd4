"""Command-line tools for shardpack datasets — the reference's
hypothetical `shardpack` CLI (docs/draft.md:132-148) backed by the
distributed engine:

    python -m shardpack_spark pack   <input_dir> <dataset>  [options]
    python -m shardpack_spark ls     <dataset>
    python -m shardpack_spark verify <dataset>
    python -m shardpack_spark compact <dataset> [--sort-by-key]
    python -m shardpack_spark vacuum <dataset> [--keep-versions N] [--dry-run]
    python -m shardpack_spark fold   <dataset> [--keep-last N]

`pack` is `shardpack create`: it packs a directory tree into shards with
one distributed job (grouping sample+annotation files by stem),
`--record-size-limit` maps to the writer's max_record_bytes, and
`--metadata k=v` records dataset-level custom fields.  `ls` is
metadata-only (no shard opened).  Every command prints one JSON object
so output is scriptable.
"""

from __future__ import annotations

import argparse
import json
import sys


def _parse_kv(pairs: list[str]) -> dict[str, str]:
    out: dict[str, str] = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--metadata expects k=v, got {p!r}")
        k, v = p.split("=", 1)
        out[k] = v
    return out


def _spark():
    from shardpack_spark.session import get_spark

    return get_spark("shardpack_cli")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="shardpack_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pack", help="pack a directory tree into a dataset")
    p.add_argument("input")
    p.add_argument("dataset")
    p.add_argument("--no-group", action="store_true",
                   help="one record per file (default groups by stem)")
    p.add_argument("--glob", default=None, help="pathGlobFilter, e.g. '*.jpg'")
    p.add_argument("--key-prefix", default="")
    p.add_argument("--compression", default="none",
                   choices=["none", "gzip", "lz4", "zstd", "snappy"])
    p.add_argument("--target-shard-bytes", type=int, default=None)
    p.add_argument("--record-size-limit", type=int, default=None,
                   help="max bytes per record (writer max_record_bytes)")
    p.add_argument("--partition-by", default=None,
                   help="comma-separated metadata keys")
    p.add_argument("--metadata", nargs="*", default=[], metavar="K=V",
                   help="dataset-level custom metadata fields")
    p.add_argument("--mode", default="append", choices=["append", "overwrite"])

    for name in ("ls", "verify"):
        q = sub.add_parser(name)
        q.add_argument("dataset")

    c = sub.add_parser("compact")
    c.add_argument("dataset")
    c.add_argument("--sort-by-key", action="store_true")
    c.add_argument("--target-shard-bytes", type=int, default=None)

    v = sub.add_parser("vacuum")
    v.add_argument("dataset")
    v.add_argument("--keep-versions", type=int, default=3)
    v.add_argument("--grace-seconds", type=int, default=3600)
    v.add_argument("--dry-run", action="store_true")

    f = sub.add_parser("fold")
    f.add_argument("dataset")
    f.add_argument("--keep-last", type=int, default=100)

    h = sub.add_parser("head", help="preview records (plans ~1 shard)")
    h.add_argument("dataset")
    h.add_argument("-n", type=int, default=10)

    e = sub.add_parser("export", help="dataset -> parquet (exploded entries)")
    e.add_argument("dataset")
    e.add_argument("parquet_out")
    e.add_argument("--mode", default="overwrite", choices=["append", "overwrite"])

    i = sub.add_parser("import", help="exploded-entry parquet -> dataset")
    i.add_argument("parquet_in")
    i.add_argument("dataset")
    i.add_argument("--compression", default="none",
                   choices=["none", "gzip", "lz4", "zstd", "snappy"])
    i.add_argument("--mode", default="append", choices=["append", "overwrite"])

    args = ap.parse_args(argv)
    from shardpack_spark.format import datasource as ds

    if args.cmd == "pack":
        opts: dict = {"compression": args.compression}
        if args.target_shard_bytes:
            opts["target_shard_bytes"] = args.target_shard_bytes
        if args.record_size_limit:
            opts["max_record_bytes"] = args.record_size_limit
        if args.partition_by:
            opts["partition_by"] = args.partition_by
        md = _parse_kv(args.metadata)
        if md:
            opts["dataset_metadata"] = json.dumps(md)
        ds.ingest_files(
            _spark(),
            args.input,
            args.dataset,
            group_by_stem=not args.no_group,
            key_prefix=args.key_prefix,
            glob=args.glob,
            mode=args.mode,
            **opts,
        )
        m = ds._load_manifest(args.dataset) or {}
        report = {
            "dataset": args.dataset,
            "version": m.get("version_id"),
            "shards": len(m.get("shards", [])),
            "records": m.get("total_records"),
        }
    elif args.cmd == "ls":
        m = ds._load_manifest(args.dataset) or {}
        report = {
            "dataset": args.dataset,
            "version": m.get("version_id"),
            "versions": [v["version"] for v in ds.list_versions(args.dataset)],
            "shards": len(m.get("shards", [])),
            "records": m.get("total_records"),
            "compression": m.get("compression"),
            "partition_by": m.get("partition_by"),
            "partitions": ds.dataset_partitions(args.dataset),
            "user_metadata": m.get("user_metadata"),
        }
    elif args.cmd == "verify":
        report = ds.verify_dataset(_spark(), args.dataset)
    elif args.cmd == "compact":
        kw = {"sort_by_key": args.sort_by_key}
        if args.target_shard_bytes:
            kw["target_shard_bytes"] = args.target_shard_bytes
        report = ds.compact_dataset(_spark(), args.dataset, **kw)
    elif args.cmd == "vacuum":
        report = ds.vacuum(
            args.dataset,
            keep_versions=args.keep_versions,
            grace_seconds=args.grace_seconds,
            dry_run=args.dry_run,
        )
    elif args.cmd == "head":
        # limit_records stops planning at the first shards covering n —
        # previewing a huge dataset opens ~1 shard, payloads skipped
        rows = ds.read_shardpack(
            _spark(), args.dataset, columns=["key", "metadata"],
            limit_records=args.n,
        ).limit(args.n).collect()
        report = {
            "dataset": args.dataset,
            "rows": [{"key": r["key"], "metadata": dict(r["metadata"] or {})}
                     for r in rows],
        }
    elif args.cmd == "import":
        spark = _spark()
        ds.records_from_entries(spark.read.parquet(args.parquet_in)).write.format(
            "shardpack"
        ).option("compression", args.compression).mode(args.mode).save(args.dataset)
        m = ds._load_manifest(args.dataset) or {}
        report = {
            "dataset": args.dataset,
            "version": m.get("version_id"),
            "records": m.get("total_records"),
        }
    elif args.cmd == "export":
        # migration escape hatch: one row per file entry, bytes intact
        ds.read_shardpack(_spark(), args.dataset, explode_entries=True).write.mode(
            args.mode
        ).parquet(args.parquet_out)
        report = {"dataset": args.dataset, "parquet": args.parquet_out}
    else:  # fold
        report = ds.fold_stream_markers(args.dataset, keep_last=args.keep_last)

    print(json.dumps(report, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
