"""DeltaLogTable — a second, independent TableFormat binding.

Where :class:`~.laketable.LakeTable` publishes Iceberg-style snapshots
(one complete metadata JSON per version + an advance-only CURRENT
pointer), this binding uses the OTHER mainstream lakehouse commit
protocol — a Delta-Lake-style **ordered action log**:

* every commit is ``_log/<20-digit version>.json`` holding a list of
  actions (``metaData`` / ``add`` / ``remove`` / ``txn``); the
  exclusive-create of that file IS the atomic commit (Delta's
  put-if-absent contract);
* table state is reconstructed by REPLAYING the log — O(tail) from the
  newest ``_log/checkpoint-<v>.json``, written every
  ``CHECKPOINT_EVERY`` commits (Delta's parquet checkpoint analogue);
* data files live FLAT under ``files/`` — the bucket is carried in the
  ``add`` action, not the directory layout (physically distinct from
  LakeTable's ``data/bucket=K/`` tree, so nothing about the engine can
  secretly depend on either layout).

The engine's writers (``cdc.merge``, ``cdc.scd2``, ``CdcPipeline``)
drive both bindings through the same :class:`~.format.TableFormat`
protocol; ``tests/test_cdc_replay.py`` replays the full CDC flow over
each.  Merge-on-read SCAN semantics are format-independent and shared
via :mod:`.mor` — exactly as Iceberg v2 and Hudi readers share Spark's
scan machinery while disagreeing about commit protocols.

Concurrency: same optimistic contract as LakeTable — losers of the
version race reload, re-validate (appends always rebase; replacing or
upsert-appending into a concurrently-rewritten bucket raises
:class:`~.laketable.CommitConflict`), and retry.  ``txn`` actions give
cross-writer exactly-once, with the same watermark compaction keeping
checkpoint metadata O(1) in table history.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from .laketable import (
    BUCKET_COL,
    MAX_COMMIT_RETRIES,
    CommitConflict,
    _compact_applied_batches,
    _batch_applied_kv,
    _utcnow_iso,
    bucket_expr,
)
from .mor import resolve_deltas, validate_mor

CHECKPOINT_EVERY = 10
_PAD = 20


class _State:
    """Replayed log state (the Delta 'snapshot' equivalent)."""

    __slots__ = (
        "version", "schema", "key_col", "n_buckets", "merge_on_read",
        "files", "delta_files", "applied_batches", "watermarks",
    )

    def __init__(self):
        self.version = -1
        self.schema: StructType | None = None
        self.key_col = ""
        self.n_buckets = 0
        self.merge_on_read: dict | None = None
        self.files: dict[int, list[str]] = {}
        # delta lane: [path, size_bytes, dseq] — dseq IS the committing
        # log version (assigned by the exclusive-create that won the
        # race, so it can never be stale or shared between commits;
        # Delta's commit-time sequence-number semantics), and size rides
        # the action so read-side broadcast decisions and the lane-bytes
        # compaction trigger never stat the filesystem
        self.delta_files: dict[int, list[list]] = {}
        self.applied_batches: dict[str, Any] = {}
        self.watermarks: dict[str, int] = {}

    def apply_actions(self, version: int, actions: list[dict]) -> None:
        self.version = version
        for a in actions:
            if "metaData" in a:
                m = a["metaData"]
                self.schema = StructType.fromJson(json.loads(m["schema"]))
                self.key_col = m["key_col"]
                self.n_buckets = m["n_buckets"]
                self.merge_on_read = m.get("merge_on_read")
            elif "add" in a:
                d = a["add"]
                b = int(d["bucket"])
                if d["lane"] == "delta":
                    # dseq defaults to the committing version; a delta
                    # FOLD overrides it with the max folded stamp so
                    # ties against later commits keep true commit order
                    self.delta_files.setdefault(b, []).append(
                        [d["path"], d.get("size"), d.get("dseq", version)]
                    )
                else:
                    self.files.setdefault(b, []).append(d["path"])
            elif "remove" in a:
                p = a["remove"]["path"]
                for fs in self.files.values():
                    if p in fs:
                        fs.remove(p)
                for fs in self.delta_files.values():
                    fs[:] = [e for e in fs if e[0] != p]
            elif "txn" in a:
                self.applied_batches[a["txn"]["key"]] = a["txn"].get("info") or {}
                _compact_applied_batches(self.applied_batches, self.watermarks)

    def to_checkpoint(self) -> dict:
        return {
            "version": self.version,
            "schema": self.schema.json(),
            "key_col": self.key_col,
            "n_buckets": self.n_buckets,
            "merge_on_read": self.merge_on_read,
            "files": {str(b): fs for b, fs in self.files.items() if fs},
            "delta_files": {
                str(b): fs for b, fs in self.delta_files.items() if fs
            },
            "applied_batches": self.applied_batches,
            "watermarks": self.watermarks,
        }

    @classmethod
    def from_checkpoint(cls, m: dict) -> "_State":
        s = cls()
        s.version = m["version"]
        s.schema = StructType.fromJson(json.loads(m["schema"]))
        s.key_col = m["key_col"]
        s.n_buckets = m["n_buckets"]
        s.merge_on_read = m.get("merge_on_read")
        s.files = {int(b): list(fs) for b, fs in m["files"].items()}
        s.delta_files = {
            int(b): list(fs) for b, fs in m.get("delta_files", {}).items()
        }
        s.applied_batches = dict(m["applied_batches"])
        s.watermarks = dict(m.get("watermarks", {}))
        return s


class DeltaLogTable:
    """Ordered-action-log table format (Delta-style commit protocol)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._log_dir = os.path.join(self.path, "_log")
        self._files_dir = os.path.join(self.path, "files")
        self._state: _State | None = None
        self.bytes_written_total = 0  # write-amplification instrument

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: StructType,
        key_col: str,
        n_buckets: int = 16,
        overwrite: bool = False,
        merge_on_read: dict[str, Any] | None = None,
    ) -> "DeltaLogTable":
        tbl = cls(spark, path)
        if os.path.exists(tbl._log_dir):
            if not overwrite:
                raise FileExistsError(f"DeltaLogTable already exists at {path}")
            shutil.rmtree(tbl.path)
        if merge_on_read is not None:
            validate_mor(merge_on_read, schema, key_col)
        os.makedirs(tbl._log_dir, exist_ok=True)
        os.makedirs(tbl._files_dir, exist_ok=True)
        actions = [
            {
                "metaData": {
                    "schema": schema.json(),
                    "key_col": key_col,
                    "n_buckets": n_buckets,
                    "merge_on_read": merge_on_read,
                }
            }
        ]
        with open(tbl._log_path(0), "x") as f:
            json.dump({"actions": actions, "committed_at": _utcnow_iso()}, f)
        tbl._state = tbl._replay()
        return tbl

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "DeltaLogTable":
        tbl = cls(spark, path)
        if not cls.exists(path):
            # fail fast like LakeTable.load: replaying an empty/absent
            # log would hand back a version=-1 schema=None handle whose
            # first use dies with a confusing AttributeError
            raise FileNotFoundError(
                f"no DeltaLogTable at {path} (missing {tbl._log_path(0)})"
            )
        tbl._state = tbl._replay()
        return tbl

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(
            os.path.join(os.path.abspath(path), "_log", f"{0:0{_PAD}d}.json")
        )

    # ------------------------------------------------------------------
    # log replay
    # ------------------------------------------------------------------
    def _log_path(self, v: int) -> str:
        return os.path.join(self._log_dir, f"{v:0{_PAD}d}.json")

    def _latest_checkpoint(self, max_version: int | None = None) -> _State | None:
        """Newest checkpoint, optionally bounded at `max_version` (time
        travel replays from the newest checkpoint <= the target instead
        of from v0 — O(tail), not O(version))."""
        best = -1
        for name in os.listdir(self._log_dir):
            if name.startswith("checkpoint-") and name.endswith(".json"):
                v = int(name[len("checkpoint-"):-len(".json")])
                if max_version is None or v <= max_version:
                    best = max(best, v)
        if best < 0:
            return None
        with open(os.path.join(self._log_dir, f"checkpoint-{best}.json")) as f:
            return _State.from_checkpoint(json.load(f))

    def _replay(self) -> _State:
        """Reconstruct state: newest checkpoint + the log tail after it."""
        state = self._latest_checkpoint() or _State()
        v = state.version + 1
        while os.path.exists(self._log_path(v)):
            with open(self._log_path(v)) as f:
                state.apply_actions(v, json.load(f)["actions"])
            v += 1
        return state

    def _state_at(self, version: int) -> _State:
        """State as of log version `version` (Delta VERSION AS OF):
        newest checkpoint <= version, then the bounded tail."""
        state = self._latest_checkpoint(max_version=version) or _State()
        for v in range(state.version + 1, version + 1):
            with open(self._log_path(v)) as f:
                state.apply_actions(v, json.load(f)["actions"])
        return state

    def refresh(self) -> "DeltaLogTable":
        self._state = self._replay()
        return self

    # ------------------------------------------------------------------
    # protocol: identity / layout
    # ------------------------------------------------------------------
    @property
    def state(self) -> _State:
        assert self._state is not None
        return self._state

    @property
    def schema(self) -> StructType:
        return self.state.schema

    @property
    def version(self) -> int:
        return self.state.version

    @property
    def key_col(self) -> str:
        return self.state.key_col

    @property
    def n_buckets(self) -> int:
        return self.state.n_buckets

    @property
    def merge_on_read(self) -> dict[str, Any] | None:
        return self.state.merge_on_read

    def bucket_of(self, key_col: str | None = None):
        return bucket_expr(key_col or self.key_col, self.n_buckets)

    def has_batch(self, batch_key: str) -> bool:
        return _batch_applied_kv(
            self.state.applied_batches, self.state.watermarks, str(batch_key)
        )

    def file_stats(self) -> dict[int, int]:
        out = {b: len(fs) for b, fs in self.state.files.items() if fs}
        for b, fs in self.state.delta_files.items():
            if fs:
                out[b] = out.get(b, 0) + len(fs)
        return out

    def delta_stats(self) -> dict[int, int]:
        return {b: len(fs) for b, fs in self.state.delta_files.items() if fs}

    def base_file_stats(self) -> dict[int, int]:
        return {b: len(fs) for b, fs in self.state.files.items() if fs}

    def delta_bytes(self) -> dict[int, int]:
        """bucket -> un-folded delta-lane bytes from the add actions
        (lane-size compaction trigger input; no filesystem stat)."""
        return {
            b: sum(int(e[1] or 0) for e in fs)
            for b, fs in self.state.delta_files.items()
            if fs
        }

    # ------------------------------------------------------------------
    # read
    # ------------------------------------------------------------------
    def read(
        self,
        buckets: Iterable[int] | None = None,
        version: int | None = None,
        with_deltas: bool = True,
    ) -> DataFrame:
        if version is not None:
            # time travel: checkpoint-bounded replay (VERSION AS OF)
            state = self._state_at(version)
        else:
            state = self.state
        sel = set(buckets) if buckets is not None else None
        paths = [
            os.path.join(self.path, rel)
            for b, fs in state.files.items()
            if sel is None or b in sel
            for rel in fs
        ]
        dfiles = [
            (os.path.join(self.path, e[0]), e[1], e[2])
            for b, fs in state.delta_files.items()
            if sel is None or b in sel
            for e in fs
        ]
        if version is not None:
            # a time-travelled state may reference data files a later
            # vacuum already deleted — fail with a clear error instead
            # of a mid-job FileNotFoundException (Delta raises the same
            # way when VERSION AS OF crosses the VACUUM horizon).
            # Driver-side existence probe is O(files of that snapshot);
            # an object-storage deployment would instead persist the
            # vacuum horizon (last vacuumed version) in the log and
            # compare versions — kept simple here because time travel
            # is an operator tool, not a hot path
            gone = [
                p
                for p in paths + [p for p, _s, _d in dfiles]
                if not os.path.exists(p)
            ]
            if gone:
                raise FileNotFoundError(
                    f"time travel to version {version} of {self.path} "
                    f"references {len(gone)} vacuumed data file(s) "
                    f"(e.g. {gone[0]}); expire_snapshots already removed "
                    "that history"
                )
        base = (
            self.spark.read.schema(state.schema).parquet(*paths)
            if paths
            else self.spark.createDataFrame([], state.schema)
        )
        if not dfiles or not with_deltas:
            return base
        return resolve_deltas(
            self.spark, state.schema, state.merge_on_read, base, dfiles
        )

    # ------------------------------------------------------------------
    # write plumbing
    # ------------------------------------------------------------------
    def _write_files(
        self, df: DataFrame, lane: str, prepartitioned: bool = False
    ) -> list[dict]:
        """Write df bucket-partitioned into files/ (flat layout); returns
        the `add` action payloads.  Data lane frames are coerced to the
        table schema; delta lane frames are written as-is."""
        if lane == "data":
            keep_bucket = prepartitioned and BUCKET_COL in df.columns
            for field in self.schema.fields:
                if field.name not in df.columns:
                    df = df.withColumn(field.name, F.lit(None).cast(field.dataType))
            cols = [F.col(f.name).cast(f.dataType) for f in self.schema.fields]
            if keep_bucket:
                df = df.select(*cols, F.col(BUCKET_COL))
            else:
                df = df.select(*cols).withColumn(BUCKET_COL, self.bucket_of())
                df = df.repartition(2 * self.n_buckets, F.col(BUCKET_COL))
        elif BUCKET_COL not in df.columns:
            df = df.withColumn(BUCKET_COL, self.bucket_of())
            df = df.repartition(2 * self.n_buckets, F.col(BUCKET_COL))

        stage = os.path.join(self.path, f"_stage-{uuid.uuid4().hex}")
        df.write.partitionBy(BUCKET_COL).parquet(stage)
        adds: list[dict] = []
        for entry in sorted(os.listdir(stage)):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            b = int(entry.split("=", 1)[1])
            for fname in sorted(os.listdir(os.path.join(stage, entry))):
                if not fname.endswith(".parquet"):
                    continue
                new_name = f"{uuid.uuid4().hex}.parquet"
                src = os.path.join(stage, entry, fname)
                size = os.path.getsize(src)
                self.bytes_written_total += size
                os.replace(src, os.path.join(self._files_dir, new_name))
                adds.append(
                    {"path": os.path.join("files", new_name), "bucket": b,
                     "lane": lane, "size": size}
                )
        shutil.rmtree(stage)
        return adds

    def _drop_orphans(self, adds: list[dict]) -> None:
        for a in adds:
            try:
                os.remove(os.path.join(self.path, a["path"]))
            except OSError:
                pass

    def _commit(self, build_actions, batch_key, batch_info) -> bool:
        """Optimistic log append: build_actions(state) returns the action
        list (re-validating against the fresh state — raises
        CommitConflict when it cannot rebase); exclusive-create of the
        next log file is the commit point."""
        for _ in range(MAX_COMMIT_RETRIES):
            state = self._replay()
            self._state = state
            if batch_key is not None and _batch_applied_kv(
                state.applied_batches, state.watermarks, str(batch_key)
            ):
                return False
            actions = build_actions(state)
            if batch_key is not None:
                actions = actions + [
                    {"txn": {"key": str(batch_key), "info": batch_info or {}}}
                ]
            v = state.version + 1
            try:
                with open(self._log_path(v), "x") as f:
                    json.dump(
                        {"actions": actions, "committed_at": _utcnow_iso()}, f
                    )
            except FileExistsError:
                continue  # lost the race: reload, re-validate, retry
            state.apply_actions(v, actions)
            if v % CHECKPOINT_EVERY == 0:
                tmp = os.path.join(self._log_dir, f".ckpt-{uuid.uuid4().hex}")
                with open(tmp, "w") as f:
                    json.dump(state.to_checkpoint(), f)
                os.replace(
                    tmp, os.path.join(self._log_dir, f"checkpoint-{v}.json")
                )
            return True
        raise CommitConflict(
            f"commit on {self.path} lost the log race {MAX_COMMIT_RETRIES} times"
        )

    # ------------------------------------------------------------------
    # protocol: write / commit
    # ------------------------------------------------------------------
    def append(
        self,
        df: DataFrame,
        batch_key: str | None = None,
        batch_info: dict[str, Any] | None = None,
    ) -> None:
        adds = self._write_files(df, "data")
        if not self._commit(lambda state: [{"add": a} for a in adds],
                            batch_key, batch_info):
            self._drop_orphans(adds)

    def append_rows(
        self,
        rows: list[dict[str, Any]],
        batch_key: str | None = None,
        batch_info: dict[str, Any] | None = None,
    ) -> None:
        """Driver-side pyarrow micro-append (single-bucket tables), same
        contract as LakeTable.append_rows."""
        if self.n_buckets != 1:
            raise ValueError("append_rows requires a single-bucket table")
        import pyarrow as pa
        import pyarrow.parquet as pq

        from .laketable import _arrow_type

        arrow_fields = [
            pa.field(f.name, _arrow_type(f.dataType)) for f in self.schema.fields
        ]
        cols = {f.name: [r.get(f.name) for r in rows] for f in self.schema.fields}
        tbl = pa.Table.from_pydict(cols, schema=pa.schema(arrow_fields))
        fname = f"{uuid.uuid4().hex}.parquet"
        tmp = os.path.join(self._files_dir, f".tmp-{fname}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(self._files_dir, fname))
        adds = [{"path": os.path.join("files", fname), "bucket": 0, "lane": "data"}]
        if not self._commit(lambda state: [{"add": a} for a in adds],
                            batch_key, batch_info):
            self._drop_orphans(adds)

    def replace_buckets(
        self,
        df: DataFrame,
        buckets: Iterable[int],
        batch_key: str | None = None,
        batch_info: dict[str, Any] | None = None,
        prepartitioned: bool = False,
    ) -> None:
        replaced = set(int(b) for b in buckets)
        base = self.state
        adds = self._write_files(df, "data", prepartitioned=prepartitioned)
        for a in adds:
            if a["bucket"] not in replaced:
                self._drop_orphans(adds)
                raise ValueError(
                    f"write produced rows for bucket {a['bucket']} outside "
                    f"replace set {replaced}"
                )

        def build(state: _State) -> list[dict]:
            removes = []
            for b in replaced:
                if state.files.get(b, []) != base.files.get(b, []) or (
                    state.delta_files.get(b, [])
                    != base.delta_files.get(b, [])
                ):
                    raise CommitConflict(
                        f"bucket {b} of {self.path} was rewritten concurrently"
                    )
                removes += [
                    {"remove": {"path": p}}
                    for p in state.files.get(b, [])
                    + [e[0] for e in state.delta_files.get(b, [])]
                ]
            return removes + [{"add": a} for a in adds]

        try:
            committed = self._commit(build, batch_key, batch_info)
        except Exception:
            self._drop_orphans(adds)
            raise
        if not committed:
            self._drop_orphans(adds)

    def merge_append(
        self,
        new_rows: DataFrame | None,
        delta: DataFrame | None,
        buckets: Iterable[int],
        batch_key: str | None = None,
        batch_info: dict[str, Any] | None = None,
        prepartitioned: bool = False,
    ) -> None:
        mor = self.merge_on_read
        if mor is None:
            raise ValueError("merge_append requires a merge_on_read table")
        touched = set(int(b) for b in buckets)
        base = self.state
        # no write-time _dseq stamp: the stamp IS the committing log
        # version — apply_actions assigns it when the winning commit's
        # add actions replay, so a lost-race retry that lands at a
        # higher version automatically carries the higher stamp
        adds = (
            self._write_files(new_rows, "data", prepartitioned=prepartitioned)
            if new_rows is not None
            else []
        )
        adds += (
            self._write_files(delta, "delta") if delta is not None else []
        )
        for a in adds:
            if a["bucket"] not in touched:
                self._drop_orphans(adds)
                raise ValueError(
                    f"write produced rows for bucket {a['bucket']} outside "
                    f"touch set {touched}"
                )

        def build(state: _State) -> list[dict]:
            if mor["mode"] == "upsert":
                for b in touched:
                    planned_d = base.delta_files.get(b, [])
                    # ANY base change of a touched bucket — compaction,
                    # replace, or plain append — invalidates the batch's
                    # _in_base flags (appended keys would read back
                    # duplicated); exact equality, not prefix
                    if (
                        state.delta_files.get(b, [])[: len(planned_d)]
                        != planned_d
                        or state.files.get(b, []) != base.files.get(b, [])
                    ):
                        raise CommitConflict(
                            f"bucket {b} of {self.path} was compacted/"
                            "rewritten/appended concurrently; _in_base "
                            "flags are stale"
                        )
            return [{"add": a} for a in adds]

        try:
            committed = self._commit(build, batch_key, batch_info)
        except Exception:
            self._drop_orphans(adds)
            raise
        if not committed:
            self._drop_orphans(adds)

    def record_batch(
        self, batch_key: str, batch_info: dict[str, Any] | None = None
    ) -> None:
        self._commit(lambda state: [], batch_key, batch_info)

    # ------------------------------------------------------------------
    # protocol: schema evolution / maintenance
    # ------------------------------------------------------------------
    def add_columns(self, new_fields: StructType | list) -> bool:
        fields = list(new_fields)
        existing = {f.name for f in self.schema.fields}
        if all(f.name in existing for f in fields):
            return False

        def build(state: _State) -> list[dict]:
            have = {f.name for f in state.schema.fields}
            to_add = [f for f in fields if f.name not in have]
            if not to_add:
                return []
            return [
                {
                    "metaData": {
                        "schema": StructType(state.schema.fields + to_add).json(),
                        "key_col": state.key_col,
                        "n_buckets": state.n_buckets,
                        "merge_on_read": state.merge_on_read,
                    }
                }
            ]

        self._commit(build, None, None)
        return True

    def compact(
        self,
        max_files_per_bucket: int = 8,
        max_delta_bytes_per_bucket: int | None = None,
    ) -> list[int]:
        victims = {
            b for b, n in self.file_stats().items() if n > max_files_per_bucket
        }
        if max_delta_bytes_per_bucket is not None:
            victims |= {
                b
                for b, nbytes in self.delta_bytes().items()
                if nbytes > max_delta_bytes_per_bucket
            }
        victims = sorted(victims)
        if not victims:
            return []
        # bucket-pure input partitions (see LakeTable.compact): write
        # prepartitioned, no full-width shuffle per fold
        df = self.read(buckets=victims).withColumn(BUCKET_COL, self.bucket_of())
        self.replace_buckets(
            df, victims, batch_info={"compaction": True}, prepartitioned=True
        )
        return victims

    def fold_delta_lane(
        self, buckets: Iterable[int] | None = None, min_files: int = 2
    ) -> list[int]:
        """Minor compaction over the action log — same semantics as
        :meth:`LakeTable.fold_delta_lane` (remove actions for the
        folded adds, one new add per bucket carrying an explicit
        ``dseq`` = max folded stamp)."""
        mor = self.merge_on_read
        if mor is None:
            return []
        base = self.state
        sel = set(int(b) for b in buckets) if buckets is not None else None
        victims = sorted(
            b
            for b, fs in base.delta_files.items()
            if len(fs) >= min_files and (sel is None or b in sel)
        )
        if not victims:
            return []
        from .mor import fold_survivors, read_delta_lane

        dfiles = [
            (os.path.join(self.path, e[0]), e[1], e[2])
            for b in victims
            for e in base.delta_files[b]
        ]
        folded = fold_survivors(
            read_delta_lane(self.spark, base.schema, mor, dfiles), mor
        )
        folded = folded.withColumn(
            BUCKET_COL, self.bucket_of(mor["row_id_cols"][0])
        ).repartition(max(1, len(victims)), F.col(BUCKET_COL))
        adds = self._write_files(folded, "delta")
        for a in adds:
            if a["bucket"] not in set(victims):
                self._drop_orphans(adds)
                raise ValueError(
                    f"fold produced rows for non-victim bucket {a['bucket']}"
                )
        maxd = {b: max(e[2] for e in base.delta_files[b]) for b in victims}
        for a in adds:
            a["dseq"] = maxd[a["bucket"]]

        def build(state: _State) -> list[dict]:
            actions = []
            for b in victims:
                planned = base.delta_files.get(b, [])
                if state.delta_files.get(b, [])[: len(planned)] != planned or (
                    mor["mode"] == "upsert"
                    and state.files.get(b, []) != base.files.get(b, [])
                ):
                    raise CommitConflict(
                        f"bucket {b} of {self.path} changed concurrently; "
                        "delta fold is stale — refresh and retry"
                    )
                actions += [{"remove": {"path": e[0]}} for e in planned]
            return actions + [{"add": a} for a in adds]

        try:
            committed = self._commit(build, None, None)
        except Exception:
            self._drop_orphans(adds)
            raise
        if not committed:
            self._drop_orphans(adds)
        return victims

    def expire_snapshots(
        self, keep_last: int = 2, retention_seconds: float = 600.0
    ) -> int:
        """Vacuum: delete data files that are (a) unreferenced by the
        last `keep_last` reconstructable states — time travel within
        that horizon keeps working, older VERSION AS OF raises the
        vacuumed-files error in read() — AND (b) older than
        `retention_seconds` (Delta VACUUM's retention window: writers
        move files into files/ BEFORE their log commit, so an
        unreferenced-but-young file may be a concurrent writer's
        in-flight commit whose add actions land a moment later —
        deleting it would publish dangling paths).  The action log
        itself is kept (tiny)."""
        import time as _time

        cur = self.state.version
        live: set[str] = set()
        for v in range(max(0, cur - keep_last + 1), cur + 1):
            st = self.state if v == cur else self._state_at(v)
            for fs in st.files.values():
                live.update(fs)
            for fs in st.delta_files.values():
                live.update(e[0] for e in fs)
        horizon = _time.time() - retention_seconds
        removed = 0
        for fname in os.listdir(self._files_dir):
            if fname.startswith("."):
                continue
            if os.path.join("files", fname) in live:
                continue
            full = os.path.join(self._files_dir, fname)
            try:
                if os.path.getmtime(full) > horizon:
                    continue
                os.remove(full)
                removed += 1
            except FileNotFoundError:
                pass
        return removed
