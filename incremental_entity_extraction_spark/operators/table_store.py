"""Pluggable table-store seam under the manifest-pointer commit protocol.

``operators.manifest`` promises "readers see the old file set or the new
one, never a mix, and the commit is ONE conditional metadata write".  That
promise needs two primitives no plain POSIX call provides by accident:

* **put-if-absent** — staging the next ``manifest-<seq>.json`` must FAIL
  LOUDLY if a concurrent (or crashed) maintenance pass already staged the
  same sequence number, instead of last-write-winning silently;
* **put-if-matches** (compare-and-swap) — flipping the ``_current_manifest``
  pointer must fail if the pointer changed since this maintainer read it.

On a real object store these are native (S3 ``If-None-Match: *`` /
``If-Match``, GCS ``ifGenerationMatch``).  This module is the seam where
those plug in: ``manifest.py`` performs every metadata read/write through a
store object, so swapping ``PosixStore`` for an s3/gs implementation
changes NO protocol logic.

Two planes, deliberately asymmetric:

* the **metadata plane** (``_manifests/*.json``, ``_current_manifest``) —
  small objects written with conditional semantics.  This is the only
  plane that ever needs read-modify-write.
* the **data plane** (``part=<v>/<file>.parquet``) — immutable blobs under
  unique names, written once (``ingest_data`` has put-if-absent semantics;
  unique run-tagged names make collisions impossible outside a replayed
  crash) and scanned by Spark THROUGH REAL PATHS (``data_path``).  Spark's
  own writers PUT directly into this plane exactly as an object-store
  connector would; the store never proxies bulk bytes.

Implementations:

* ``PosixStore`` — the local-filesystem table.  put-if-absent is atomic
  via write-temp + ``os.link`` (``EEXIST`` -> ``StoreConflict``; the linked
  name appears with full content or not at all).  put-if-matches is a
  lock-based CAS: an ``flock`` on ``_manifests/.commit_lock`` serializes
  read-compare-replace among COOPERATING maintainers on one host — the
  POSIX analogue of the object store's native precondition.  Maintainers
  that bypass the store (hand-editing the pointer) are outside the
  contract, exactly as out-of-band writes are on S3.
* ``FakeObjectStore`` — the in-memory fake for tests: the metadata plane
  is a dict of ``(bytes, etag, mtime)`` guarded by a lock, with REAL
  conditional failures and a ``before_cas`` hook for race injection; the
  data plane delegates to a backing directory so Spark can still scan.

Etags are content hashes (like S3), so a CAS expects "the pointer still
says what I read", not a file identity.

No reference analogue — the reference persists driver-side pickles
(scripts/eval_kbp.py:654-658); this is the at-scale commit surface the
round-6 review asked to be enforced rather than simulated.
"""

from __future__ import annotations

import hashlib
import os
import threading
import time

__all__ = ["StoreConflict", "PosixStore", "FakeObjectStore"]


class StoreConflict(Exception):
    """A conditional write lost: the key already exists (put-if-absent) or
    its etag no longer matches (put-if-matches).  Callers treat this as
    "another maintainer got there first" — never retry blindly into it."""


def _etag(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()[:16]


class PosixStore:
    """Table rooted at a local directory.  Data plane = the directory
    itself (Spark reads/writes it natively); metadata plane = small files
    with genuine conditional semantics (link-based put-if-absent,
    flock-based CAS)."""

    def __init__(self, root: str):
        self.root = root

    # -- data plane ---------------------------------------------------
    def list_partitions(self) -> list[str]:
        if not os.path.isdir(self.root):
            return []
        return sorted(
            e
            for e in os.listdir(self.root)
            if "=" in e
            and not e.startswith((".", "_"))
            and os.path.isdir(os.path.join(self.root, e))
        )

    def list_data_files(self, part: str) -> list[str]:
        pdir = os.path.join(self.root, part)
        if not os.path.isdir(pdir):
            return []
        return sorted(f for f in os.listdir(pdir) if f.endswith(".parquet"))

    def data_path(self, part: str, name: str = "") -> str:
        """Real filesystem path for Spark scans (basePath = table root)."""
        return os.path.join(self.root, part, name) if name else os.path.join(
            self.root, part
        )

    def data_exists(self, part: str, name: str) -> bool:
        return os.path.exists(self.data_path(part, name))

    def data_size(self, part: str, name: str) -> int:
        return os.path.getsize(self.data_path(part, name))

    def data_mtime(self, part: str, name: str) -> float:
        return os.path.getmtime(self.data_path(part, name))

    def ingest_data(self, part: str, name: str, local_src: str) -> None:
        """Move a staged local file in as an immutable data object —
        put-if-absent: ``os.link`` fails with EEXIST if the name is taken
        (a replayed crash attempt), so nothing live is ever overwritten."""
        dst = self.data_path(part, name)
        try:
            os.link(local_src, dst)
        except FileExistsError as e:
            raise StoreConflict(f"data object already exists: {dst}") from e
        os.unlink(local_src)

    def delete_data(self, part: str, name: str) -> None:
        try:
            os.remove(self.data_path(part, name))
        except FileNotFoundError:
            pass

    def scratch_dir(self, tag: str) -> str:
        """A directory (under the table, hidden from readers by the
        leading dot) where Spark stages a compaction's output before
        ingest."""
        return os.path.join(self.root, f".stage_{tag}")

    # -- metadata plane -----------------------------------------------
    def _meta_path(self, key: str) -> str:
        return os.path.join(self.root, key)

    def get_meta(self, key: str) -> tuple[bytes, str] | None:
        try:
            with open(self._meta_path(key), "rb") as f:
                data = f.read()
        except OSError:
            return None
        return data, _etag(data)

    def list_meta(self, prefix: str) -> list[str]:
        d = self._meta_path(prefix)
        if not os.path.isdir(d):
            return []
        return sorted(
            f"{prefix}/{f}"
            for f in os.listdir(d)
            # dotfiles are this store's own bookkeeping (.commit_lock,
            # in-flight .put/.cas temps) — not table metadata objects
            if not f.startswith(".") and os.path.isfile(os.path.join(d, f))
        )

    def meta_mtime(self, key: str) -> float:
        return os.path.getmtime(self._meta_path(key))

    def delete_meta(self, key: str) -> None:
        try:
            os.remove(self._meta_path(key))
        except FileNotFoundError:
            pass

    def put_meta_if_absent(self, key: str, data: bytes) -> str:
        """Atomic create-with-content: write a temp, ``os.link`` it to the
        final name (EEXIST -> StoreConflict), unlink the temp.  The final
        name appears with its FULL content or not at all — no partial-write
        window for readers or crash recovery to tolerate."""
        path = self._meta_path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        # dot-prefixed temp: a crash between write and link leaves litter
        # that is HIDDEN from list_meta/readers instead of a stray object
        tmp = os.path.join(
            os.path.dirname(path),
            f".{os.path.basename(path)}.put.{os.getpid()}.{threading.get_ident()}",
        )
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            os.link(tmp, path)
        except FileExistsError as e:
            raise StoreConflict(f"metadata object already exists: {key}") from e
        finally:
            os.unlink(tmp)
        return _etag(data)

    def put_meta_if_matches(self, key: str, data: bytes, expected_etag: str) -> str:
        """Lock-based CAS — the POSIX stand-in for S3 If-Match / GCS
        ifGenerationMatch.  The flock makes read-compare-replace atomic
        among cooperating maintainers (same host); a mismatch raises
        StoreConflict and writes nothing."""
        path = self._meta_path(key)
        lock_dir = os.path.join(self.root, "_manifests")
        os.makedirs(lock_dir, exist_ok=True)
        lock_path = os.path.join(lock_dir, ".commit_lock")
        import fcntl

        with open(lock_path, "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            cur = self.get_meta(key)
            if cur is None or cur[1] != expected_etag:
                raise StoreConflict(
                    f"CAS failed on {key}: expected etag {expected_etag}, "
                    f"found {cur[1] if cur else None}"
                )
            tmp = os.path.join(
                os.path.dirname(path),
                f".{os.path.basename(path)}.cas.{os.getpid()}."
                f"{threading.get_ident()}",
            )
            with open(tmp, "wb") as f:
                f.write(data)
            os.replace(tmp, path)
        return _etag(data)


class FakeObjectStore(PosixStore):
    """In-memory metadata plane with REAL conditional-PUT semantics over a
    directory-backed data plane (Spark still needs real paths to scan).

    Models an object store faithfully where it matters: metadata existence,
    content, etags, and mtimes live ONLY in the dict — a file on disk under
    ``_manifests/`` would be invisible — and every conditional failure is
    decided under one lock.  ``before_cas`` (if set) runs inside
    put_meta_if_matches after this pass's pointer read but before the
    conditional write, OUTSIDE the lock — deliberately: the hook typically
    re-enters store operations to inject the racing commit, which would
    deadlock on the non-reentrant lock; the compare itself is still decided
    atomically under the lock."""

    def __init__(self, root: str):
        super().__init__(root)
        self._meta: dict[str, tuple[bytes, str, float]] = {}
        self._lock = threading.Lock()
        self.before_cas = None  # test hook: callable(key) or None

    def get_meta(self, key: str) -> tuple[bytes, str] | None:
        with self._lock:
            ent = self._meta.get(key)
        return (ent[0], ent[1]) if ent else None

    def list_meta(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._meta if k.startswith(prefix + "/"))

    def meta_mtime(self, key: str) -> float:
        with self._lock:
            ent = self._meta.get(key)
        if ent is None:
            raise FileNotFoundError(key)
        return ent[2]

    def set_meta_mtime(self, key: str, mtime: float) -> None:
        """Test helper — backdating a commit (the fake's ``os.utime``)."""
        with self._lock:
            data, etag, _ = self._meta[key]
            self._meta[key] = (data, etag, mtime)

    def delete_meta(self, key: str) -> None:
        with self._lock:
            self._meta.pop(key, None)

    def put_meta_if_absent(self, key: str, data: bytes) -> str:
        with self._lock:
            if key in self._meta:
                raise StoreConflict(f"metadata object already exists: {key}")
            tag = _etag(data)
            self._meta[key] = (data, tag, time.time())
        return tag

    def put_meta_if_matches(self, key: str, data: bytes, expected_etag: str) -> str:
        if self.before_cas is not None:
            self.before_cas(key)
        with self._lock:
            ent = self._meta.get(key)
            if ent is None or ent[1] != expected_etag:
                raise StoreConflict(
                    f"CAS failed on {key}: expected etag {expected_etag}, "
                    f"found {ent[1] if ent else None}"
                )
            tag = _etag(data)
            self._meta[key] = (data, tag, time.time())
        return tag
