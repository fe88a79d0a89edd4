"""Manifest-checkpoint scale probe: commit-chain depth vs plan cost.

Measures, at growing commit depths, (a) the per-commit publish cost —
median and max, the max capturing the periodic checkpoint fold that
rewrites the live shard list into one part — and (b) the planning
flatten: wall time and the NUMBER OF PART OBJECTS read, the figure that
becomes S3 GET round-trips on a real store.  Run on the local FS:

    python tools/checkpoint_probe.py [max_depth] [checkpoint_parts]

The claim this pins (README "Design for 100 TB"): with
manifest_checkpoint_parts=N the planning read count is bounded by N+1
at ANY depth, commit cost stays flat in the median (the every-Nth fold
pays O(live shards), amortized O(live/N) per commit), while the
unbounded variant reads one part per historical commit.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shardpack_spark.format import commit, manifest, storage  # noqa: E402


def run_chain(root: str, depth: int, checkpoint: int) -> dict:
    times: list[float] = []
    for i in range(depth):
        t0 = time.perf_counter()
        commit.commit_shards(
            root,
            [{"path": f"s-{i:06d}.shardpack", "records": 1, "bytes": 128}],
            manifest_checkpoint_parts=checkpoint,
        )
        times.append(time.perf_counter() - t0)

    be = storage.for_path(root)
    reads = {"parts": 0}
    real_read = be.read_bytes

    def counting_read(p):
        if "/part-" in p or "\\part-" in p:
            reads["parts"] += 1
        return real_read(p)

    be.read_bytes = counting_read
    try:
        t0 = time.perf_counter()
        m, _ = manifest._observe_latest(root, flatten=True)
        plan_s = time.perf_counter() - t0
    finally:
        be.read_bytes = real_read
    assert m is not None and len(m["shards"]) == depth, "flatten lost commits"
    return {
        "depth": depth,
        "checkpoint": checkpoint,
        "commit_ms_median": round(1000 * statistics.median(times), 3),
        "commit_ms_p99": round(1000 * sorted(times)[int(0.99 * len(times))], 3),
        "commit_ms_max": round(1000 * max(times), 3),
        "plan_flatten_ms": round(1000 * plan_s, 3),
        "parts_read": reads["parts"],
    }


def post_vacuum(root: str, checkpoint: int) -> dict:
    """Vacuum the chain's expired archived roots, then measure 100 more
    commits: shows the O(total history) share of commit cost (the
    archived-root LISTING in _observe_latest) is bounded by retention,
    not by lifetime commit count."""
    from shardpack_spark.format import datasource as ds

    t0 = time.perf_counter()
    ds.vacuum(root, keep_versions=8, grace_seconds=0.0)
    vac_s = time.perf_counter() - t0
    times = []
    base = len(manifest._root_ids(root))
    for i in range(100):
        t0 = time.perf_counter()
        commit.commit_shards(
            root,
            [{"path": f"pv-{i:06d}.shardpack", "records": 1, "bytes": 128}],
            manifest_checkpoint_parts=checkpoint,
        )
        times.append(time.perf_counter() - t0)
    return {
        "vacuum_s": round(vac_s, 3),
        "archived_roots_after_vacuum": base,
        "post_vacuum_commit_ms_median": round(
            1000 * statistics.median(times), 3
        ),
    }


def main() -> None:
    max_depth = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    checkpoint = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    depths = [d for d in (500, 2000, 5000, 10000) if d <= max_depth]
    for depth in depths:
        for cp in (checkpoint, 0):
            if cp == 0 and depth > 2000:
                # the unbounded variant is the thing being avoided; two
                # points establish its linear slope
                continue
            with tempfile.TemporaryDirectory(prefix="cpprobe_") as d:
                out = run_chain(d, depth, cp)
                if cp and depth == max(depths):
                    out.update(post_vacuum(d, cp))
                print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
