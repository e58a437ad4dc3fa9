"""E8/E12: exactly-once partition commit + lineage manifest + resume planner.

Reference parity (M6): a message leaves the queue only when ``Ack()`` runs
*after* the store succeeds (`/root/reference/internal/repository/messages.go:131`
follows the exec at `messages.go:89`; AMQP basic.ack at
`/root/reference/internal/consumer/rmq/rmq.go:237-239`).  Our partition-level
analog:

    write staged file -> fsync -> atomic rename into place
    -> atomically create one manifest JSON per partition

A partition is "acked" iff its manifest entry exists.  Crash windows:
  * before data rename      -> debris in _staging/, GC'd at plan time
  * after rename, before manifest -> data present but uncommitted; the rerun
    rewrites the same deterministic file name (idempotent os.replace) and
    then commits — never duplicated, never lost.

Layout (SURVEY.md §4.3):
    out/tier=1m/source=s03/part-000120-000179.parquet
    out/_staging/<run_id>/...
    out/_MANIFEST/tier=1m__source=s03__part-000120-000179.json
    out/rejects/...   out/metrics/...

On a real multi-node cluster ``out`` is shared storage (S3/NFS); rename-level
atomicity maps to S3 multipart-complete / conditional put.  Manifest reads at
plan time happen only on the driver.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from .. import __version__

MANIFEST_DIR = "_MANIFEST"
STAGING_DIR = "_staging"
FOLDED_LOG = "folded.jsonl"
# fold the per-partition JSONs once the entry-file count passes this bound
# (keeps plan-time listdir O(new-since-last-fold), not O(all partitions))
FOLD_THRESHOLD = 10_000


class CommitPhaseError(RuntimeError):
    """A partition commit failed in a specific phase of the reference's
    error ladder (/root/reference/internal/repository/messages.go:90-146):
    ``exec`` = the staged data write (ExecContext analog) failed; ``ack`` =
    the atomic rename / manifest create (basic.ack analog) failed.  Callers
    dead-letter a partition-level reject row with this reason, then re-raise
    so Ray's task retry (and ultimately the run) still sees the failure —
    data is never silently dropped."""

    def __init__(self, phase: str, cause: BaseException):
        super().__init__(f"{phase}: {cause}")
        self.phase = phase
        self.cause = cause


def _fsync_dir(path: str) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    except OSError:
        pass


class Manifest:
    """Driver- and task-side view of the commit log (a directory of JSONs)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.mdir = os.path.join(out_dir, MANIFEST_DIR)
        os.makedirs(self.mdir, exist_ok=True)
        self._folded_cache: tuple[float, dict[str, dict]] | None = None

    @staticmethod
    def entry_name(tier: str, partition: str) -> str:
        return f"tier={tier}__{partition}.json"

    # ---- folded log (scale path for million-partition out_dirs) ----
    #
    # Per-partition JSON files keep commits lock-free and atomic, but
    # plan-time listdir is O(all partitions ever).  ``fold()`` compacts the
    # files into one append-only snapshot (``folded.jsonl``); afterwards
    # the live directory holds only entries committed since the last fold.
    # Readers merge (folded, then files) with FILE WINS: an entry file can
    # only be newer than its folded copy (a retire tombstone), never staler,
    # and a fold crash mid-unlink just leaves duplicates the rule resolves.

    def _folded(self) -> dict[str, dict]:
        p = os.path.join(self.mdir, FOLDED_LOG)
        try:
            mtime = os.path.getmtime(p)
        except OSError:
            return {}
        if self._folded_cache is not None and self._folded_cache[0] == mtime:
            return self._folded_cache[1]
        out: dict[str, dict] = {}
        with open(p) as f:
            for line in f:
                if line.strip():
                    row = json.loads(line)
                    out[row["key"]] = row
        self._folded_cache = (mtime, out)
        return out

    def fold(self, threshold: int = FOLD_THRESHOLD) -> int:
        """Fold entry FILES into ``folded.jsonl`` when there are at least
        ``threshold`` of them; returns the number folded.  Crash- and
        replica-safe: the snapshot is written tmp+rename under a flock, and
        only the exact files captured in it are unlinked — a concurrent
        commit's new file survives, and a concurrent retire's rename makes
        our unlink a no-op while its tombstone file out-votes the folded
        live copy (file wins)."""
        import fcntl

        names = [
            n for n in os.listdir(self.mdir)
            if n.endswith(".json") and n != FOLDED_LOG
            or n.endswith(".json.retired")
        ]
        names = [n for n in names if n not in ("layout.json",)]
        if len(names) < threshold:
            return 0
        lockp = os.path.join(self.mdir, ".foldlock")
        fd = os.open(lockp, os.O_CREAT | os.O_WRONLY, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            merged = dict(self._folded())
            captured: list[str] = []
            for name in sorted(names):
                retired = name.endswith(".json.retired")
                key = (
                    name[: -len(".json.retired")] if retired
                    else name[: -len(".json")]
                )
                try:
                    with open(os.path.join(self.mdir, name)) as f:
                        entry = json.load(f)
                except (OSError, ValueError):
                    continue  # mid-rename / mid-write: leave for next fold
                merged[key] = dict(key=key, retired=retired, entry=entry)
                captured.append(name)
            p = os.path.join(self.mdir, FOLDED_LOG)
            tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                for row in merged.values():
                    f.write(json.dumps(row) + "\n")
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, p)
            _fsync_dir(self.mdir)
            for name in captured:
                try:
                    os.unlink(os.path.join(self.mdir, name))
                except OSError:
                    pass  # concurrently renamed (retire) — file wins anyway
            self._folded_cache = None
            return len(captured)
        finally:
            os.close(fd)

    def is_committed(self, tier: str, partition: str) -> bool:
        """Acked = live entry OR retired tombstone: a retention-expired
        partition must never be recommitted by a replayed epoch."""
        base = os.path.join(self.mdir, self.entry_name(tier, partition))
        if os.path.exists(base) or os.path.exists(base + ".retired"):
            return True
        key = self.entry_name(tier, partition)[: -len(".json")]
        return key in self._folded()

    def committed(
        self, tier: str | None = None, include_retired: bool = False
    ) -> dict[str, dict]:
        out = {}
        prefix = f"tier={tier}__" if tier else ""
        for key, row in self._folded().items():
            if not key.startswith(prefix):
                continue
            if row.get("retired") and not include_retired:
                continue
            entry = dict(row["entry"])
            entry["retired"] = bool(row.get("retired"))
            out[key] = entry
        for name in os.listdir(self.mdir):
            live = name.endswith(".json") and name not in (FOLDED_LOG, "layout.json")
            retired = name.endswith(".json.retired")
            if not (live or retired):
                continue
            if not name.startswith(prefix):
                continue
            key = name[: -len(".json")] if live else name[: -len(".json.retired")]
            if retired and not include_retired:
                out.pop(key, None)  # file wins: folded live copy is stale
                continue
            with open(os.path.join(self.mdir, name)) as f:
                entry = json.load(f)
            entry["retired"] = retired
            out[key] = entry
        return out

    def retire(self, entry_key: str) -> dict:
        """Atomically tombstone one committed entry (retention, E8 analog of
        the broker expiring an acked message's payload: the *ack* survives).
        Returns the entry; caller deletes the data file afterwards — a crash
        in between leaves an orphan file that no reader will list (readers
        plan from the manifest / tier_view reads only live entries' files).

        A folded entry (no individual file) is tombstoned by CREATING the
        ``.retired`` file from the folded copy — file wins over the folded
        live row until the next fold absorbs it."""
        src = os.path.join(self.mdir, entry_key + ".json")
        if os.path.exists(src):
            with open(src) as f:
                entry = json.load(f)
            try:
                os.replace(src, src + ".retired")
                _fsync_dir(self.mdir)
                return entry
            except FileNotFoundError:
                pass  # concurrent fold absorbed the file — tombstone below
        self._folded_cache = None  # the fold may have just replaced the log
        row = self._folded().get(entry_key)
        if row is None or row.get("retired"):
            raise FileNotFoundError(entry_key)
        entry = row["entry"]
        tmp = src + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, src + ".retired")
        _fsync_dir(self.mdir)
        return entry

    def invalidate(self, entry_key: str) -> dict | None:
        """Hard-remove one entry so ``is_committed`` returns FALSE — the
        REPAIR primitive.  ``retire`` keeps the ack (a retention-expired
        partition must never be recomputed); ``invalidate`` revokes it so
        a surgical recompute can land fresh bytes under the same
        partition name.  Manifest first, data file after (the retire
        orphan rule: readers plan from the manifest, so a crash in
        between leaves an invisible orphan, never a half-read).

        Runs under the SAME flock as ``fold``: live/retired entry files
        unlink and the folded log rewrites without the key atomically
        (tmp+rename), so a concurrent fold can neither resurrect the key
        from a captured file nor lose a concurrent commit."""
        import fcntl

        entry: dict | None = None
        lockp = os.path.join(self.mdir, ".foldlock")
        fd = os.open(lockp, os.O_CREAT | os.O_WRONLY, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            for suffix in (".json", ".json.retired"):
                p = os.path.join(self.mdir, entry_key + suffix)
                try:
                    with open(p) as f:
                        entry = json.load(f)
                    os.unlink(p)
                except OSError:
                    pass
            folded = dict(self._folded())
            if entry_key in folded:
                row = folded.pop(entry_key)
                entry = entry or row["entry"]
                p = os.path.join(self.mdir, FOLDED_LOG)
                tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
                with open(tmp, "w") as f:
                    for r in folded.values():
                        f.write(json.dumps(r) + "\n")
                    f.flush()
                    os.fsync(f.fileno())
                os.replace(tmp, p)
            _fsync_dir(self.mdir)
            self._folded_cache = None
            return entry
        finally:
            os.close(fd)

    def commit_file(
        self,
        tier: str,
        partition: str,
        staged_path: str,
        final_relpath: str,
        meta: dict,
    ) -> str:
        """Atomic data rename + atomic manifest create (the 'ack')."""
        final_path = os.path.join(self.out_dir, final_relpath)
        os.makedirs(os.path.dirname(final_path), exist_ok=True)
        with open(staged_path, "rb") as f:
            os.fsync(f.fileno())
        os.replace(staged_path, final_path)
        _fsync_dir(os.path.dirname(final_path))
        entry = dict(
            tier=tier,
            partition=partition,
            path=final_relpath,
            engine_version=__version__,
            committed_at=time.time(),
            **meta,
        )
        epath = os.path.join(self.mdir, self.entry_name(tier, partition))
        tmp = epath + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, epath)
        _fsync_dir(self.mdir)
        return final_path

    def pin_layout(self, **kv) -> None:
        """Persist layout-affecting parameters (e.g. window_buckets) on
        first use and REFUSE a run whose parameters differ: partition names
        derive from them, so a changed value would commit a second,
        differently-named copy of the same data beside the old one and
        every merged view would double-count.

        The check-then-write is guarded by the same flock pattern as
        ``_commit_raw_dir`` (lock a persistent file, re-check inside):
        two replicas racing the FIRST run on one out_dir with different
        window_buckets would otherwise both see no layout.json and commit
        mixed-grid partitions — the exact hazard the pin exists to stop."""
        import fcntl

        p = os.path.join(self.mdir, "layout.json")

        def check() -> bool:
            if not os.path.exists(p):
                return False
            with open(p) as f:
                pinned = json.load(f)
            if pinned != kv:
                raise ValueError(
                    f"layout mismatch for {self.out_dir}: pinned {pinned}, "
                    f"run requested {kv} — changing layout parameters over "
                    "an existing out_dir would double-count; use a new "
                    "out_dir (or compact+migrate)"
                )
            return True

        if check():
            return
        fd = os.open(os.path.join(self.mdir, ".layoutlock"),
                     os.O_CREAT | os.O_WRONLY, 0o644)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            if check():  # a racing replica pinned while we waited
                return
            tmp = p + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(kv, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, p)
            _fsync_dir(self.mdir)
        finally:
            os.close(fd)

    def layout(self) -> dict:
        """The pinned layout parameters ({} before the first run)."""
        p = os.path.join(self.mdir, "layout.json")
        if not os.path.exists(p):
            return {}
        with open(p) as f:
            return json.load(f)

    def staging_path(self, run_id: str, relpath: str) -> str:
        p = os.path.join(self.out_dir, STAGING_DIR, run_id, relpath)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    def claim_run(self, run_id: str) -> None:
        """Mark a run's staging tree as LIVE (pid lockfile) so a concurrent
        replica's plan-time GC (competing-consumer pattern, reference
        docker-compose.yaml:88-146) does not collect it mid-flight.  On a
        multi-node cluster the check degrades to a liveness heartbeat file;
        here pid-on-host suffices."""
        p = os.path.join(self.out_dir, STAGING_DIR, run_id, ".lock")
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(str(os.getpid()))

    @staticmethod
    def _pid_alive(pid: int) -> bool:
        """Only ESRCH proves the pid is gone.  EPERM means the process EXISTS
        but belongs to another user — the reference deploys competing replicas
        as separate containers/users (docker-compose.yaml:88-146), and treating
        such a replica as dead would let gc_staging rmtree its live staging
        tree mid-write."""
        try:
            os.kill(pid, 0)
            return True
        except ProcessLookupError:
            return False
        except PermissionError:
            return True
        except OSError:
            return False

    def gc_staging(self) -> int:
        """Remove crash debris (E12).  Driver-side, at plan time.

        A staging dir whose ``.lock`` names a still-running pid belongs to a
        live concurrent replica and is left alone; dead-pid or lock-less
        dirs are debris and are collected."""
        import shutil

        sdir = os.path.join(self.out_dir, STAGING_DIR)
        n = 0
        if os.path.isdir(sdir):
            for name in os.listdir(sdir):
                p = os.path.join(sdir, name)
                lock = os.path.join(p, ".lock")
                try:
                    with open(lock) as f:
                        if self._pid_alive(int(f.read().strip())):
                            continue
                except (OSError, ValueError):
                    pass
                shutil.rmtree(p, ignore_errors=True)
                n += 1
        return n


def write_partition_atomic(
    manifest: Manifest,
    run_id: str,
    tier: str,
    partition: str,
    relpath: str,
    table: pa.Table,
    meta: dict | None = None,
) -> dict:
    """Stage + commit one deterministic parquet partition; returns the
    manifest entry meta (used as the per-partition metrics row, E10).

    Skips (and does not touch) already-committed partitions — the resume
    path (E12).  Deterministic bytes: fixed writer options + pre-sorted
    input mean a rerun's os.replace writes identical content.
    """
    if manifest.is_committed(tier, partition):
        return dict(tier=tier, partition=partition, skipped=True, rows=int(table.num_rows))
    t0 = time.perf_counter()
    try:
        staged = manifest.staging_path(run_id, relpath)
        pq.write_table(table, staged, compression="zstd", row_group_size=128 * 1024)
    except Exception as e:  # storage execute failed (messages.go:90-108)
        raise CommitPhaseError("exec", e) from e
    fingerprint = _content_fingerprint(table)
    meta = dict(meta or {})
    meta.update(
        rows=int(table.num_rows),
        input_fingerprint=fingerprint,
        wall_ms=int((time.perf_counter() - t0) * 1000),
        skipped=False,
    )
    try:
        manifest.commit_file(tier, partition, staged, relpath, meta)
    except Exception as e:  # ack failed (messages.go:131-146)
        raise CommitPhaseError("ack", e) from e
    return dict(tier=tier, partition=partition, **meta)


def _content_fingerprint(table: pa.Table) -> str:
    """Order-insensitive xor-of-row-hashes content identity (FIXTURES §4).

    Vectorized (polars xxhash over the first column) so raw-tier partitions
    with millions of rows fingerprint in milliseconds.
    """
    import numpy as np
    import polars as pl

    # binary columns (series blobs) are fine; hash_rows covers every column
    hashes = pl.from_arrow(table).hash_rows(seed=42).to_numpy().astype(np.uint64)
    return f"{int(np.bitwise_xor.reduce(hashes)) if len(hashes) else 0:016x}"
