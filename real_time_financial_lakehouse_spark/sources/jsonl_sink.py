"""``rtfl_jsonl``: a custom Spark 4 Python DataSource WRITER -- the
write-side counterpart of ``tick_source``, demonstrating the connector
commit protocol the reference's Kafka producer / CSV export rely on
(producer.py:22, the dashboard CSV path):

* each TASK serializes its partition to its own JSONL shard
  (executor-side, no driver funnel) and returns a ``WriterCommitMessage``
  naming the shard and its row count;
* the DRIVER's ``commit(messages)`` runs once, after every task
  succeeded, and publishes the ``_MANIFEST.json`` naming exactly the
  committed shards -- readers resolve the manifest, so a half-written
  job (task retry, speculative twin, abort) is never visible.  That is
  the same visibility discipline as a Hadoop commit protocol or a Delta
  transaction log, at connector scale.

Rows serialize with sorted keys and ISO timestamps, so the file bytes
are deterministic for a deterministic input order."""

from __future__ import annotations

import datetime as dt
import json
import os

try:  # pragma: no cover - import surface depends on the Spark build
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    _HAVE_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    DataSource = object  # type: ignore[assignment,misc]
    DataSourceWriter = object  # type: ignore[assignment,misc]
    WriterCommitMessage = object  # type: ignore[assignment,misc]
    _HAVE_DATASOURCE_API = False


class _ShardCommit(WriterCommitMessage if _HAVE_DATASOURCE_API else object):
    def __init__(self, filename: str, n_rows: int) -> None:
        self.filename = filename
        self.n_rows = n_rows


def _json_val(v):
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    return v


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def write(self, iterator) -> _ShardCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        # task-unique temp name (attempt number disambiguates retries /
        # speculative twins); only commit() publishes it
        attempt = ctx.taskAttemptId() if ctx is not None else 0
        name = f"part-{pid:05d}-{attempt}.jsonl"
        n = 0
        with open(os.path.join(self.path, name), "w") as f:
            for row in iterator:
                f.write(
                    json.dumps(
                        {k: _json_val(v) for k, v in row.asDict().items()},
                        sort_keys=True,
                    )
                    + "\n"
                )
                n += 1
        return _ShardCommit(name, n)

    def _sweep_orphans(self, keep: set[str]) -> None:
        # Tasks that crashed mid-write (or speculative twins killed before
        # returning a WriterCommitMessage) leave temp shards no message
        # ever names.  Readers are manifest-gated so they never see them,
        # but a naive glob reader or a disk audit would -- remove every
        # part-* file the commit decision did not keep.
        try:
            entries = os.listdir(self.path)
        except OSError:
            return
        for fname in entries:
            if fname.startswith("part-") and fname.endswith(".jsonl") and fname not in keep:
                try:
                    os.remove(os.path.join(self.path, fname))
                except OSError:
                    pass

    def _manifest_shards(self) -> set[str]:
        # Shards published by the directory's LIVE manifest (a previous
        # successful commit).  Task shard names embed the monotonically
        # increasing taskAttemptId, so a later job in the same Spark
        # application can never collide with them.
        try:
            with open(os.path.join(self.path, "_MANIFEST.json")) as f:
                return {s["file"] for s in json.load(f)["shards"]}
        except (OSError, ValueError, KeyError, TypeError):
            return set()

    def commit(self, messages) -> None:
        # a zero-partition write runs no tasks, so no task ever created
        # the directory -- the driver-side commit must not assume it
        os.makedirs(self.path, exist_ok=True)
        manifest = {
            "shards": sorted(
                ({"file": m.filename, "n_rows": m.n_rows} for m in messages),
                key=lambda d: d["file"],
            ),
            "total_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, indent=1)
        self._sweep_orphans({m.filename for m in messages})

    def abort(self, messages) -> None:
        # abort restores the PRE-JOB state: this job's shards -- whether
        # named by a WriterCommitMessage or orphaned by a crashed /
        # speculative task -- are dropped, but shards published by a
        # previous successful commit (named by the live _MANIFEST.json)
        # must survive, or an aborted re-write to an existing sink path
        # would destroy committed data (round-6 advisory).
        self._sweep_orphans(self._manifest_shards())


class JsonlDataSource(DataSource):
    """``df.write.format("rtfl_jsonl").option("path", dir).save()``."""

    @classmethod
    def name(cls) -> str:  # noqa: D102
        return "rtfl_jsonl"

    def writer(self, schema, overwrite):  # noqa: D102
        return _JsonlWriter(self.options)


def read_manifested(spark, path: str, schema: str):
    """Reader side of the commit protocol: resolve ``_MANIFEST.json``
    and load EXACTLY the committed shards -- uncommitted/aborted temp
    files in the directory are invisible, the property the two-phase
    commit exists to provide."""
    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    files = [os.path.join(path, s["file"]) for s in manifest["shards"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def register_jsonl_sink(spark) -> None:
    """Idempotent registration (shared-registry tolerant, session-object
    marker -- same rationale as register_tick_source)."""
    if not _HAVE_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError(
            "this Spark build lacks the Python DataSource API"
        )
    if getattr(spark, "_rtfl_jsonl_registered", False):
        return
    try:
        spark.dataSource.register(JsonlDataSource)
    except Exception as ex:  # noqa: BLE001
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(ex):
            raise
    spark._rtfl_jsonl_registered = True
