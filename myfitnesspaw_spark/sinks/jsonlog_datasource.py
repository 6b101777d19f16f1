"""Spark 4 Python DataSource WRITER — a partition-parallel JSON-lines
sink with two-phase commit.

The reference's sinks are driver-side ``executemany`` into SQLite
(`/root/reference/myfitnesspaw/tasks.py:39-128`) — single-writer,
transactional.  The engine-grade equivalent of a custom sink is a
``DataSourceWriter``: every partition writes its rows independently
(executor-side, no driver funnel), and atomicity comes from the
two-phase protocol — tasks write to attempt-unique temp files and
return a commit message; only the DRIVER's ``commit`` renames them
into place and stamps a ``_SUCCESS`` manifest, so a failed/speculated
task attempt can never leave partial output visible (``abort`` removes
the temps).  That is the same contract Spark's own file committers
implement, here over the Python DataSource API so the pattern is
visible end-to-end.

Local filesystem paths only in this sandbox; on a cluster the target
must be shared storage (the protocol itself is storage-agnostic).
Usage::

    register(spark)
    df.write.format("jsonlog").mode("overwrite").save("/path/dir")
    spark.read.schema(ddl).json("/path/dir")  # read-back
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


def _stamp_success(path: str) -> None:
    """Derive ``_SUCCESS`` (total rows/files) from the per-job
    manifests and stamp it atomically.

    Each job's own counts live in its ``_job-<token>.manifest`` —
    written exactly once, never modified — so the per-job numbers are
    exact under any concurrency; this function only SUMMARIZES them.
    A best-effort ``O_EXCL`` lock file serializes concurrent stamps on
    filesystems that support it (every local/NFS-style FS; on object
    stores without atomic create the lock degrades to advisory, the
    job manifests remain the source of truth, and a reader wanting
    exact totals under concurrent writers sums them directly)."""
    lock = os.path.join(path, "._success.lock")
    acquired = False
    owner_token = uuid.uuid4().hex
    wait = 10.0
    # Steal threshold is DECOUPLED from the waiter window (ADVICE r7):
    # stamping is sub-second, so a lock this old cannot belong to a
    # live stamp even through a long GC/NFS pause — 3x the wait window
    # means an owner paused up to 30 s keeps its lock, while waiters
    # that exhaust their own 10 s window fall through to the advisory
    # (duplicate-but-idempotent) stamp path instead of stealing a
    # possibly-live lock.
    stale_after = 3 * wait
    deadline = time.time() + wait
    while time.time() < deadline:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            # Ownership token: a stamper that stalls past the steal
            # window and resumes must not remove a lock a waiter has
            # since stolen and re-acquired — release checks the token.
            os.write(fd, owner_token.encode())
            os.close(fd)
            acquired = True
            break
        except FileExistsError:
            # A writer killed between os.open and the finally-cleanup
            # leaves the lock behind forever; a lock older than
            # stale_after cannot belong to a live stamp, so break it
            # and retry the O_EXCL create.
            # The break is an atomic RENAME-steal, not check-then-
            # remove: only the one waiter whose rename succeeds owns
            # the stale file, so a waiter can never delete the FRESH
            # lock another writer just re-acquired after its own steal.
            try:
                if time.time() - os.path.getmtime(lock) > stale_after:
                    stolen = f"{lock}.stale-{uuid.uuid4().hex[:8]}"
                    os.rename(lock, stolen)
                    os.remove(stolen)
                    continue
            except OSError:
                pass  # raced with the owner's cleanup or another steal
            time.sleep(0.05)
        except OSError:
            break  # FS without O_EXCL semantics: advisory only
    try:
        n_rows = 0
        n_files = 0
        for mp in glob.glob(os.path.join(path, "_job-*.manifest")):
            try:
                with open(mp) as fh:
                    m = json.load(fh)
                n_rows += int(m.get("n_rows", 0))
                n_files += int(m.get("n_files", 0))
            except (ValueError, OSError):
                pass
        tmp = os.path.join(path, f"._success-{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as fh:
            json.dump({"n_rows": n_rows, "n_files": n_files}, fh)
        os.replace(tmp, os.path.join(path, "_SUCCESS"))
    finally:
        if acquired:
            try:
                with open(lock) as fh:
                    still_mine = fh.read() == owner_token
                if still_mine:
                    os.remove(lock)
                # Foreign token: our lock was stale-stolen while we
                # stalled — the current holder owns cleanup now.  (A
                # TOCTOU sliver remains between read and remove; the
                # stamp itself is an idempotent manifest sum with an
                # atomic replace, so a double-entry degrades to a
                # duplicate stamp, never a corrupt _SUCCESS.)
            except OSError:
                pass


class JsonLogCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class JsonLogWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlog sink requires a save path")
        self.overwrite = overwrite
        # Driver-side, once per write job.  Appended jobs publish under
        # job-unique names so a second append can never clobber an
        # earlier job's part files (same guarantee Spark's file
        # committers get from jobId-bearing file names).
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator) -> JsonLogCommit:
        # Executor-side, one call per partition.  The temp name carries
        # partition id AND task attempt id: concurrent attempts of the
        # same partition (speculation, retries) write distinct files
        # and only the committed attempt's file survives.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".part-{pid:05d}-{attempt}.jsonl.tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonLogCommit(tmp, n)

    def commit(self, messages) -> None:
        # Driver-side, once, after every partition succeeded: publish
        # atomically (rename) and stamp the manifests LAST so readers
        # gating on _SUCCESS never observe a partial write.
        #
        # Overwrite mode cleared the directory before tasks launched, so
        # plain indexed names are unambiguous.  Append mode embeds the
        # job token: earlier jobs' part files keep their own tokens and
        # are never touched.
        #
        # Counts are PER-JOB manifests (``_job-<token>.manifest``),
        # each written exactly once by its own job — no shared mutable
        # state, so two concurrent appends cannot lose each other's
        # totals (the old read-modify-write of one shared _SUCCESS
        # could, ADVICE r5).  _SUCCESS is DERIVED: the sum over all
        # job manifests, restamped after each commit under a
        # best-effort lock (see _stamp_success).
        total = 0
        for i, m in enumerate(messages):
            if self.overwrite:
                final = os.path.join(self.path, f"part-{i:05d}.jsonl")
            else:
                final = os.path.join(
                    self.path, f"part-{self.job_token}-{i:05d}.jsonl"
                )
            if os.path.exists(final):
                os.remove(final)
            os.replace(m.tmp_path, final)
            total += m.n_rows
        job_manifest = os.path.join(
            self.path, f"_job-{self.job_token}.manifest"
        )
        tmp = job_manifest + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"job": self.job_token, "n_rows": total, "n_files": len(messages)},
                fh,
            )
        os.replace(tmp, job_manifest)
        _stamp_success(self.path)

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonLogStreamWriter(DataSourceStreamWriter):
    """Streaming form: per-micro-batch two-phase commit.

    Same executor-write / driver-publish split as the batch writer,
    with the batch id woven into every published name — the committed
    output of batch N is ``batch-N-part-*.jsonl`` plus a
    ``_batch-N.manifest``, so a restarted query that re-attempts batch
    N (checkpoint replay) idempotently overwrites exactly that batch's
    files and nothing else.  That name-by-batch-id discipline is the
    exactly-once contract every streaming file sink reduces to.
    """

    def __init__(self, options: dict):
        # No checkpointLocation fallback: data files must never land in
        # the checkpoint directory next to Spark's offset/commit logs.
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlog stream sink requires a path option")

    def write(self, iterator) -> JsonLogCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        attempt = ctx.taskAttemptId() if ctx else 0
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f".stream-{pid:05d}-{attempt}.jsonl.tmp")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return JsonLogCommit(tmp, n)

    def commit(self, messages, batchId: int) -> None:
        # A checkpoint replay of batch N may produce FEWER partitions
        # than a prior partially-committed attempt; sweep every
        # existing batch-N part file first so readers that do not gate
        # on the manifest can never see stale duplicates.
        for stale in glob.glob(
            os.path.join(self.path, f"batch-{batchId}-part-*.jsonl")
        ):
            try:
                os.remove(stale)
            except OSError:
                pass
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"batch-{batchId}-part-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            total += m.n_rows
        with open(os.path.join(self.path, f"_batch-{batchId}.manifest"), "w") as fh:
            json.dump({"batch": batchId, "n_rows": total, "n_files": len(messages)}, fh)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except OSError:
                pass


class JsonLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlog"

    def writer(self, schema, overwrite: bool) -> JsonLogWriter:
        if overwrite:
            path = self.options.get("path")
            if path and os.path.isdir(path):
                shutil.rmtree(path)
        return JsonLogWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> JsonLogStreamWriter:
        return JsonLogStreamWriter(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom sink."""
    spark.dataSource.register(JsonLogDataSource)
