"""Manifest-pointer table commits — the object-store-safe maintenance path.

``maintenance.compact_lake_table`` swaps partition directories with two
POSIX renames, which is atomic on a local filesystem and REFUSED on object
stores (rename there is copy+delete; the crash window is proportional to
partition bytes).  This module is the protocol that works on both — the
parquet-dir analogue of Iceberg's ``rewrite_data_files`` + snapshot-commit
split:

* data files are IMMUTABLE and never renamed or overwritten: a compaction
  writes its output files ALONGSIDE the live ones under fresh unique names
  (on a real object store Spark PUTs them directly; the POSIX simulation
  stages and hard-moves, invisible to MANIFEST-RESOLVED readers — which is
  why a table that has a committed manifest MUST be read through
  ``read_table``/``Lake.read``, both manifest-aware; a plain
  ``spark.read.parquet(dir)`` or a DuckDB directory glob on such a table
  double-reads every compacted-but-not-yet-vacuumed partition.  The
  entry-query DuckDB oracles are safe because the bench kg lake is a fresh
  ``mkdtemp`` dir no maintenance ever runs on);
* a table's readable state is a JSON **manifest** (`_manifests/
  manifest-<seq>.json`) mapping partition dir -> exact data-file names;
* the COMMIT is one small-object write: flipping the ``_current_manifest``
  pointer file to name the new manifest.  POSIX: write-temp + ``rename``;
  object store: a single conditional PUT (S3 If-Match / GCS generation
  precondition) — either way readers see the old file set or the new one,
  never a mix, and the crash window is one metadata-sized operation;
* files orphaned by superseded manifests are garbage-collected later by
  ``vacuum_unreferenced`` (pure deletes — object-store-safe) behind a
  retention window measured from the SUPERSEDE commit (the manifest
  generation that dropped the file), so a reader that resolved the old
  manifest just before the flip keeps its files for the full window.

Readers resolve manifest-covered partitions through the file list (with
``basePath`` so the partition column still comes from the path) and fall
back to plain directory listing for partitions the manifest does not cover
yet — new batches written since the last maintenance pass remain visible
without a manifest refresh, mirroring how this lake's writers (dynamic
partition overwrite + lineage) commit outside the manifest.  A
lineage-driven re-run that rewrites a manifest-covered partition must be
followed by ``refresh_manifest`` (or just re-compaction); the standard
``older_than_seconds`` window keeps maintenance clear of live writers.

No reference analogue (the reference persists driver-side pickles,
scripts/eval_kbp.py:654-658); this is the at-scale lake surface round-5's
review asked to be execution rather than a design note.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_POINTER = "_current_manifest"


def _mdir(root: str) -> str:
    return os.path.join(root, _MANIFEST_DIR)


def _pointer_path(root: str) -> str:
    return os.path.join(root, _POINTER)


def _partition_dirs(root: str) -> list[str]:
    return sorted(
        e
        for e in os.listdir(root)
        if "=" in e
        and not e.startswith((".", "_"))
        and os.path.isdir(os.path.join(root, e))
    )


def _data_files(pdir: str) -> list[str]:
    return sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))


def current_manifest(root: str) -> dict | None:
    """The manifest the pointer currently names, or None (no pointer /
    unreadable — callers fall back to directory listing)."""
    try:
        with open(_pointer_path(root)) as f:
            name = f.read().strip()
        with open(os.path.join(_mdir(root), name)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_manifest(root: str, files_by_part: dict[str, list[str]]) -> str:
    """Stage the next manifest file (NOT yet committed — the pointer still
    names the old one).  Returns the new manifest's filename."""
    prev = current_manifest(root)
    seq = int(prev["seq"]) + 1 if prev else 1
    name = f"manifest-{seq:08d}.json"
    os.makedirs(_mdir(root), exist_ok=True)
    tmp = os.path.join(_mdir(root), f".{name}.tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"seq": seq, "created": time.time(), "files": files_by_part}, f
        )
    os.replace(tmp, os.path.join(_mdir(root), name))
    return name


def _flip_pointer(root: str, manifest_name: str) -> None:
    """THE commit: one small-object write.  POSIX: temp + atomic rename;
    on a real object store this is a single conditional PUT of the pointer
    object."""
    tmp = _pointer_path(root) + ".tmp"
    with open(tmp, "w") as f:
        f.write(manifest_name)
    os.replace(tmp, _pointer_path(root))


def refresh_manifest(root: str) -> str:
    """Snapshot the CURRENT directory state into a committed manifest —
    bootstrap for a table that never had one, or resync after a
    lineage-driven partition rewrite."""
    files = {p: _data_files(os.path.join(root, p)) for p in _partition_dirs(root)}
    name = _write_manifest(root, files)
    _flip_pointer(root, name)
    return name


def read_table(spark: SparkSession, root: str) -> DataFrame:
    """Manifest-resolved read: manifest-covered partitions scan EXACTLY the
    committed file list (``basePath`` keeps the partition column coming
    from the path); partitions the manifest does not know about yet fall
    back to their directory listing.  Without a pointer this is a plain
    directory read."""
    m = current_manifest(root)
    if m is None:
        return spark.read.parquet(root)
    paths: list[str] = []
    covered = m["files"]
    def _live_ungoverned(pdir: str) -> list[str]:
        # outside manifest governance, compact-* files can only be orphans
        # of a crashed pre-flip compaction attempt (a committed compaction
        # puts its partition IN the manifest; a writer overwrite empties
        # the dir) — reading them would double rows
        return [
            os.path.join(pdir, f)
            for f in _data_files(pdir)
            if not f.startswith("compact-")
        ]

    for part, files in covered.items():
        pdir = os.path.join(root, part)
        if all(os.path.exists(os.path.join(pdir, f)) for f in files):
            paths.extend(os.path.join(pdir, f) for f in files)
        else:
            # a writer rewrote this governed partition (lineage re-run,
            # dynamic partition overwrite -> fresh file names) without a
            # refresh_manifest: the manifest entry is stale, the directory
            # is the truth
            paths.extend(_live_ungoverned(pdir) if os.path.isdir(pdir) else [])
    for part in _partition_dirs(root):
        if part not in covered:
            paths.extend(_live_ungoverned(os.path.join(root, part)))
    if not paths:
        return spark.read.parquet(root)
    return spark.read.option("basePath", root).parquet(*paths)


def _stage_compacted_files(
    spark: SparkSession, root: str, part: str, files: list[str], want: int,
    seq_tag: str,
) -> list[str]:
    """Write ``want`` compacted files for one partition ALONGSIDE the live
    ones under fresh unique names; returns the new file names.  Readers
    cannot see them until a manifest referencing them is committed.  The
    POSIX simulation stages through a hidden dir and hard-moves into place
    (same-filesystem ``os.rename`` of brand-new names — standing in for an
    object store's direct PUT; nothing live is touched either way)."""
    pdir = os.path.join(root, part)
    src = spark.read.option("basePath", root).parquet(
        *(os.path.join(pdir, f) for f in files)
    ).drop(*[p.split("=")[0] for p in part.split("/")])
    stage = os.path.join(root, f".manifest_stage_{seq_tag}_{part.replace('/', '_')}")
    shutil.rmtree(stage, ignore_errors=True)
    src.coalesce(want).write.mode("overwrite").parquet(stage)
    out: list[str] = []
    for i, f in enumerate(_data_files(stage)):
        name = f"compact-{seq_tag}-{i:05d}.parquet"
        os.rename(os.path.join(stage, f), os.path.join(pdir, name))
        out.append(name)
    shutil.rmtree(stage, ignore_errors=True)
    return out


def compact_table_manifest(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 << 20,
    older_than_seconds: float = 3600.0,
    _crash_before_flip: bool = False,
) -> dict:
    """Object-store-safe compaction: write compacted files alongside, stage
    a manifest referencing them, verify row counts, then commit with ONE
    pointer flip.  A crash anywhere before the flip leaves the table
    reading the old manifest (new files are invisible orphans); after the
    flip, the new one (old files are orphans for ``vacuum_unreferenced``).

    ``older_than_seconds`` skips partitions written within the window (the
    in-flight writer guard shared with the directory-based maintenance).
    ``_crash_before_flip`` stops right before the commit — the test hook
    for the pre-flip crash window."""
    stats = {
        "partitions_compacted": 0,
        "files_before": 0,
        "files_after": 0,
        "committed": False,
    }
    if not os.path.isdir(root):
        return stats
    if current_manifest(root) is None:
        refresh_manifest(root)
    m = current_manifest(root)
    cutoff = time.time() - older_than_seconds
    seq_tag = f"{int(m['seq']) + 1:08d}"
    new_files: dict[str, list[str]] = {}
    changed = False
    for part in _partition_dirs(root):
        pdir = os.path.join(root, part)
        governed = part in m["files"]
        if governed and all(
            os.path.exists(os.path.join(pdir, f)) for f in m["files"][part]
        ):
            files = m["files"][part]
        else:
            if governed:
                # a writer rewrote this governed partition (lineage re-run,
                # fresh file names) without refresh_manifest: the manifest
                # entry is stale — drop coverage (commit a manifest without
                # it) and treat the directory as the truth again
                governed = False
                changed = True
            # live listing for uncovered territory EXCLUDES compact-*
            # files: there they can only be orphans of a crashed pre-flip
            # attempt, and including them would both double the staged
            # rows and corrupt the row-count verification
            files = [
                f for f in _data_files(pdir) if not f.startswith("compact-")
            ]
        stats["files_before"] += len(files)
        total = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
        want = max(1, math.ceil(total / target_file_bytes))
        newest = max(
            (os.path.getmtime(os.path.join(pdir, f)) for f in files),
            default=float("inf"),
        )
        if len(files) <= want or newest > cutoff:
            stats["files_after"] += len(files)
            # carry forward ONLY partitions the old manifest already
            # governed: annexing a skipped (in-flight or writer-territory)
            # partition would hand vacuum a keep-set that goes stale on
            # the writer's next overwrite and delete the live copies
            if governed:
                new_files[part] = files
            continue
        compacted = _stage_compacted_files(
            spark, root, part, files, want, seq_tag
        )
        n_before = (
            spark.read.option("basePath", root)
            .parquet(*(os.path.join(pdir, f) for f in files))
            .count()
        )
        n_after = (
            spark.read.option("basePath", root)
            .parquet(*(os.path.join(pdir, f) for f in compacted))
            .count()
        )
        if n_after != n_before:
            for f in compacted:  # abandon: plain deletes, nothing was live
                try:
                    os.remove(os.path.join(pdir, f))
                except OSError:
                    pass
            raise RuntimeError(
                f"manifest compaction row-count mismatch in {pdir}: "
                f"{n_before} before vs {n_after} after — aborted, old "
                "manifest still committed"
            )
        new_files[part] = compacted
        stats["partitions_compacted"] += 1
        stats["files_after"] += len(compacted)
        changed = True
    if not changed:
        return stats
    name = _write_manifest(root, new_files)
    if _crash_before_flip:
        return stats  # pre-flip crash window: pointer still names the old set
    _flip_pointer(root, name)
    stats["committed"] = True
    return stats


def _committed_history(root: str, cur_seq: int) -> list[tuple[int, float, dict]]:
    """Committed manifest generations (seq <= current), oldest first, as
    (seq, commit_mtime, files).  Staged-but-never-flipped manifests
    (seq > current) are NOT history — their files were never readable.
    Malformed entries (missing keys, null seq) and files deleted by a
    concurrent maintenance pass between listdir and stat are SKIPPED, not
    fatal — vacuum must never wedge on one bad manifest."""
    hist: list[tuple[int, float, dict]] = []
    mdir = _mdir(root)
    if not os.path.isdir(mdir):
        return hist
    for f in os.listdir(mdir):
        if not f.endswith(".json"):
            continue
        full = os.path.join(mdir, f)
        try:
            with open(full) as fh:
                m = json.load(fh)
            seq = int(m["seq"])
            files = m["files"]
            mtime = os.path.getmtime(full)
        except (OSError, ValueError, KeyError, TypeError):
            continue
        if not isinstance(files, dict):
            continue
        if seq <= cur_seq:
            hist.append((seq, mtime, files))
    hist.sort()
    return hist


def _supersede_times(
    history: list[tuple[int, float, dict]],
) -> dict[tuple[str, str], float]:
    """ONE pass over committed history -> {(part, file): supersede_mtime}.
    A file's supersede moment is the commit mtime of the generation AFTER
    the newest one referencing it; files still referenced by the newest
    generation in view map to +inf (never ripe — covers a concurrently
    truncated history where the true current manifest is missing).  Built
    once per vacuum call: a per-orphan rescan of the history would be
    O(orphans x generations x files)."""
    out: dict[tuple[str, str], float] = {}
    for i, (_, _, files) in enumerate(history):
        succ = history[i + 1][1] if i + 1 < len(history) else float("inf")
        for part, names in files.items():
            for f in names if isinstance(names, (list, tuple)) else ():
                out[(part, f)] = succ
    return out


def vacuum_unreferenced(
    root: str, older_than_seconds: float = 3600.0
) -> list[str]:
    """Garbage-collect data files the CURRENT manifest does not reference —
    the leftovers of superseded manifests and pre-flip crashes.  Pure
    deletes (object-store-safe, idempotent).  The retention window is
    measured from the moment a file became UNREFERENCED (the commit mtime
    of the first manifest generation that dropped it), NOT the file's own
    write mtime: compaction only touches partitions whose files already
    predate the in-flight window, so an mtime-keyed window would expire the
    instant the pointer flips and a reader mid-scan on the old manifest
    would lose its files.  Files no committed generation ever referenced
    (pre-flip crash stagings) fall back to their own mtime — they were
    never reader-visible, so the mtime window only has to outlast the
    staging->flip gap.  Superseded manifest files age the same way (from
    their successor's commit).  Returns the table-relative paths deleted."""
    m = current_manifest(root)
    if m is None:
        return []  # no committed state to judge references against
    cutoff = time.time() - older_than_seconds
    cur_seq = int(m["seq"])
    history = _committed_history(root, cur_seq)
    superseded_at = _supersede_times(history)
    removed: list[str] = []
    for part in _partition_dirs(root):
        if part not in m["files"]:
            continue  # not manifest-governed (new batch) — writer territory
        keep = set(m["files"][part])
        pdir = os.path.join(root, part)
        if not all(os.path.exists(os.path.join(pdir, f)) for f in keep):
            # a writer rewrote this governed partition since the manifest
            # committed (fresh file names): the keep-set is stale, and
            # deleting by it would remove the only live copies — skip; the
            # next compaction pass drops the stale coverage
            continue
        for f in _data_files(pdir):
            full = os.path.join(pdir, f)
            if f in keep:
                continue
            # never committed -> pre-flip staging orphan, ages from its
            # own mtime (it was never reader-visible)
            ripe_at = superseded_at.get((part, f))
            if ripe_at is None:
                ripe_at = os.path.getmtime(full)
            if ripe_at <= cutoff:
                os.remove(full)
                removed.append(os.path.join(part, f))
    cur_name = None
    try:
        with open(_pointer_path(root)) as f:
            cur_name = f.read().strip()
    except OSError:
        pass
    commit_mtimes = {seq: mt for seq, mt, _ in history}
    if os.path.isdir(_mdir(root)):
        for f in sorted(os.listdir(_mdir(root))):
            full = os.path.join(_mdir(root), f)
            if f == cur_name or not f.endswith(".json"):
                continue
            try:
                with open(full) as fh:
                    seq = int(json.load(fh)["seq"])
            except (OSError, ValueError, KeyError):
                seq = None
            # a superseded generation ages from its successor's commit; a
            # staged-never-committed one (seq > current, or unparseable)
            # from its own mtime
            successors = (
                [mt for s, mt in commit_mtimes.items() if s > seq]
                if seq is not None and seq < cur_seq
                else []
            )
            aged_from = min(successors) if successors else os.path.getmtime(full)
            if aged_from <= cutoff:
                os.remove(full)
                removed.append(os.path.join(_MANIFEST_DIR, f))
    return removed
