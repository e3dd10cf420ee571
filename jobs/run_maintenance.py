"""spark-submit entry point for lake maintenance (compaction + vacuum).

Usage (run between or after pipeline runs — vacuum's retention window
protects an in-flight batch, but maintenance is cheapest on a quiet lake):

    spark-submit --master local[8] \
        [--py-files dist/iees.zip] \
        jobs/run_maintenance.py \
        --lake /path/lake \
        [--compact] [--vacuum] \
        [--tables triples mentions] \
        [--target-file-mb 128] [--older-than-hours 1]

With neither --compact nor --vacuum, both run — VACUUM FIRST: compacting
an orphan partition would reset its mtimes and hide it from the same
run's retention window (besides wasting a rewrite of data about to be
deleted).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    try:
        from tools.make_pyfiles_zip import require_fresh_zip
    except ImportError:
        pass
    else:
        require_fresh_zip()
    p = argparse.ArgumentParser()
    p.add_argument("--lake", required=True)
    p.add_argument("--compact", action="store_true")
    p.add_argument("--vacuum", action="store_true")
    p.add_argument(
        "--manifest", action="store_true",
        help="use the manifest-pointer commit protocol "
        "(operators.manifest): immutable data files, one pointer-object "
        "flip per table as the commit, unreferenced-file vacuum — the "
        "object-store-safe path (also works on POSIX)",
    )
    p.add_argument(
        "--tables", nargs="*", default=None,
        help="restrict to these tables (default: every table in the lake)",
    )
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument(
        "--older-than-hours", type=float, default=1.0,
        help="retention window for BOTH actions — partitions touched more "
        "recently are treated as in-flight and left alone",
    )
    args = p.parse_args()
    do_compact = args.compact or not (args.compact or args.vacuum)
    do_vacuum = args.vacuum or not (args.compact or args.vacuum)

    from incremental_entity_extraction_spark.operators.maintenance import (
        compact_lake_table,
        vacuum_lake,
    )
    from incremental_entity_extraction_spark.pipeline import Lake
    from incremental_entity_extraction_spark.session import get_spark

    lake = Lake(args.lake)
    tables = args.tables
    if tables is None:
        tables = sorted(
            t
            for t in (os.listdir(args.lake) if os.path.isdir(args.lake) else [])
            if os.path.isdir(lake.path(t)) and not t.startswith((".", "_"))
        )
    report: dict = {"lake": args.lake, "tables": tables}
    window_s = args.older_than_hours * 3600.0
    if args.manifest:
        from incremental_entity_extraction_spark.operators.manifest import (
            ConcurrentMaintenance,
            compact_table_manifest,
            vacuum_unreferenced,
        )

        if do_vacuum:
            # vacuum FIRST: it clears ripe staged manifests/files left by a
            # crashed pre-flip pass, which would otherwise make compaction's
            # put-if-absent staging collide (ConcurrentMaintenance)
            report["vacuum"] = {
                t: vacuum_unreferenced(
                    lake.path(t), older_than_seconds=window_s
                )
                for t in tables
            }
        if do_compact:
            # only compaction needs Spark; vacuum is a pure filesystem pass
            spark = get_spark(app_name="lake-maintenance")
            compact_report: dict = {}
            for t in tables:
                try:
                    compact_report[t] = compact_table_manifest(
                        spark, lake.path(t),
                        target_file_bytes=args.target_file_mb << 20,
                        older_than_seconds=window_s,
                    )
                except ConcurrentMaintenance as e:
                    # another maintainer (or a recent crashed pass still
                    # inside the retention window) owns this table's next
                    # seq — skip it this run, never last-write-win
                    compact_report[t] = {"skipped_concurrent": str(e)}
            report["compact"] = compact_report
            spark.stop()
        print(json.dumps(report))
        return
    if do_vacuum:
        # pure filesystem pass, no Spark session — and it must run BEFORE
        # compaction (see module docstring)
        report["vacuum"] = vacuum_lake(lake, tables, older_than_seconds=window_s)
    if do_compact:
        spark = get_spark(app_name="lake-maintenance")
        report["compact"] = {
            t: compact_lake_table(
                spark, lake, t,
                target_file_bytes=args.target_file_mb << 20,
                older_than_seconds=window_s,
            )
            for t in tables
        }
        spark.stop()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
