"""Log-structured table format over parquet: atomic snapshot commits,
footer-derived file statistics, min/max scan pruning, copy-on-write
deletes, atomic compaction, time travel, schema evolution, and optimistic
concurrency — built from scratch (no Delta/Iceberg jars in this sandbox;
the reference stores its model/scoring tables in Delta,
``/root/reference/01_dff_model.py:61-65,481-485``, and this module is the
engine-native realization of those commit semantics).

Design (the architecture Iceberg/Delta converge on, re-derived minimally):

- **Data files are invisible until committed.** Writers drop immutable
  parquet files under ``data/`` with UUID names; readers discover files
  ONLY through a committed snapshot, so a writer crashing mid-append
  leaves unreferenced orphans — never a torn table.  This removes the
  staging-rename dance entirely for data (rename remains only for the
  advisory version hint).
- **Commit = one exclusive metadata-file create.** Snapshot ``N`` is
  ``metadata/v{N}.json``; committing is ``open(..., "x")`` — on POSIX and
  HDFS an atomic create-if-absent.  Two writers racing to the same
  version: exactly one create succeeds, the loser re-reads the new tip and
  rebases (appends rebase automatically; conflicting rewrites raise).
  This IS optimistic concurrency control, the same protocol as Delta's
  ``_delta_log/N.json`` / Iceberg's version-file swap.
- **Manifests are immutable fragments.** Each commit writes one manifest
  listing ONLY the files it adds (path, rows, bytes, per-column
  min/max/null-count pulled from parquet FOOTERS via pyarrow — O(footer),
  never a data scan).  A snapshot is a list of manifest names, so commit
  cost is O(files added + manifests touched), not O(total files): at 10^12
  files the tip snapshot stays kilobytes and appends stay constant-time.
- **Scans prune at the manifest level.** ``scan(filters=...)`` keeps only
  files whose stats MIGHT satisfy every conjunct, then hands Spark the
  pruned file list — combined with :mod:`dff.layout`'s Z-order writes,
  a range predicate over clustered data opens a small fraction of files
  before the first byte of data is read.
- **Deletes are copy-on-write at file granularity.** Only files whose
  stats overlap the predicate are rewritten (minus matching rows); every
  other file is carried by reference.  Compaction likewise swaps file
  sets in ONE snapshot commit — closing the two-rename swap window
  documented in :mod:`dff.maintenance` (ADVICE r04).
- **Time travel & rollback** are free: old snapshots stay readable until
  ``expire_snapshots`` garbage-collects them.

Scale notes: JSON manifests are the sandbox realization; at 10^6+ files
per commit the format would shard manifests and store them columnar
(Iceberg uses avro manifest trees) — the information architecture here is
identical.  All stats extraction is driver-side footer reads; for a
massive backfill those reads would themselves be distributed
(mapPartitions over file names), which this API admits without change.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["Table", "CommitConflict"]

_HINT = "_version_hint"


class CommitConflict(Exception):
    """A concurrent writer committed a conflicting snapshot first."""


# --------------------------------------------------------------------------
# filter triples — ONE predicate language evaluated twice: against manifest
# stats (may-match, for pruning) and as a Catalyst Column (exact, on rows)
# --------------------------------------------------------------------------

_OPS = {"=", "<", "<=", ">", ">=", "in", "between"}


def _filters_to_column(filters: list[tuple]) -> Column:
    conds = []
    for col, op, val in filters:
        c = F.col(col)
        if op == "=":
            conds.append(c == F.lit(val))
        elif op == "<":
            conds.append(c < F.lit(val))
        elif op == "<=":
            conds.append(c <= F.lit(val))
        elif op == ">":
            conds.append(c > F.lit(val))
        elif op == ">=":
            conds.append(c >= F.lit(val))
        elif op == "in":
            conds.append(c.isin(list(val)))
        elif op == "between":
            conds.append(c.between(F.lit(val[0]), F.lit(val[1])))
        else:
            raise ValueError(f"unknown filter op {op!r} (supported: {_OPS})")
    out = conds[0]
    for c in conds[1:]:
        out = out & c
    return out


def _may_match(entry: dict, filters: list[tuple]) -> bool:
    """Could any row of this file satisfy ALL conjuncts?  Missing stats for
    a column keep the file (never prune on ignorance); a file whose rows
    are all NULL on the column cannot satisfy a comparison and is pruned."""
    stats = entry.get("stats") or {}
    for col, op, val in filters:
        s = stats.get(col)
        if s is None:
            continue  # no stats -> cannot prune on this conjunct
        if s.get("nulls") == entry["rows"]:
            return False  # all-null column: no comparison can hold
        lo, hi = s.get("min"), s.get("max")
        if lo is None or hi is None:
            continue
        if op == "=" and not (lo <= val <= hi):
            return False
        if op == "<" and not (lo < val):
            return False
        if op == "<=" and not (lo <= val):
            return False
        if op == ">" and not (hi > val):
            return False
        if op == ">=" and not (hi >= val):
            return False
        if op == "in" and not any(lo <= v <= hi for v in val):
            return False
        if op == "between" and not (hi >= val[0] and lo <= val[1]):
            return False
    return True


def _footer_stats(path: str) -> tuple[int, int, dict]:
    """(rows, bytes, {col: {min, max, nulls}}) from the parquet footer —
    an O(footer) metadata read, the same stats a table-format manifest
    carries; the data pages are never touched."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    rows = md.num_rows
    names = [md.schema.column(i).path for i in range(md.num_columns)]
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    complete: dict = {n: True for n in names}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for i in range(g.num_columns):
            name = names[i]
            st = g.column(i).statistics
            if st is None or not st.has_null_count:
                complete[name] = False
                continue
            nulls[name] = nulls.get(name, 0) + st.null_count
            if st.null_count == g.num_rows and not st.has_min_max:
                continue  # all-null row group contributes no min/max
            if not st.has_min_max:
                complete[name] = False
                continue
            lo, hi = st.min, st.max
            if not isinstance(lo, (int, float, str, bool)):
                complete[name] = False  # bytes/timestamps: skip, never prune
                continue
            if isinstance(lo, float) and (math.isnan(lo) or math.isnan(hi)):
                complete[name] = False
                continue
            mins[name] = lo if name not in mins else min(mins[name], lo)
            maxs[name] = hi if name not in maxs else max(maxs[name], hi)
    out = {}
    for n in names:
        if "." in n:
            continue  # nested leaves: stats not addressable by top-level col
        if not complete.get(n):
            continue
        out[n] = {
            "min": mins.get(n),
            "max": maxs.get(n),
            "nulls": nulls.get(n, 0),
        }
    return rows, os.path.getsize(path), out


class Table:
    """A versioned parquet table with atomic snapshot commits.

    ``root/data/`` holds immutable UUID-named parquet files; ``root/
    metadata/`` holds ``manifest-*.json`` fragments (added-file lists with
    footer stats) and ``v{N}.json`` snapshots (manifest lists).  The tip
    is recovered by listing snapshots (``_version_hint`` is advisory)."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        self.meta_dir = os.path.join(self.root, "metadata")
        self.data_dir = os.path.join(self.root, "data")

    # ---------------------------------------------------------- lifecycle
    @classmethod
    def create(cls, root: str, schema: T.StructType) -> "Table":
        t = cls(root)
        os.makedirs(t.meta_dir, exist_ok=False)
        os.makedirs(t.data_dir, exist_ok=True)
        t._commit(
            {
                "operation": "create",
                "schema": json.loads(schema.json()),
                "manifests": [],
            },
            expected_parent=None,
        )
        return t

    @classmethod
    def exists(cls, root: str) -> bool:
        t = cls(root)
        return os.path.isdir(t.meta_dir) and t._latest_version() is not None

    # ---------------------------------------------------------- snapshots
    def _latest_version(self) -> int | None:
        hint = os.path.join(self.meta_dir, _HINT)
        best = None
        try:
            with open(hint) as f:
                best = int(f.read().strip())
        except (FileNotFoundError, ValueError):
            pass
        # the hint is advisory (its rename may lag or be lost in a crash):
        # trust it only as a lower bound and reconcile against the log
        vs = [
            int(n[1:-5])
            for n in os.listdir(self.meta_dir)
            if n.startswith("v") and n.endswith(".json")
        ]
        if not vs:
            return best
        tip = max(vs)
        return tip if best is None else max(best, tip)

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version:08d}.json")

    def _snapshot(self, version: int | None = None) -> dict:
        v = self._latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots under {self.meta_dir}")
        with open(self._snapshot_path(v)) as f:
            snap = json.load(f)
        snap["version"] = v
        return snap

    def history(self) -> list[dict]:
        """All snapshots, oldest first: version/operation/ts/summary."""
        tip = self._latest_version()
        if tip is None:
            return []
        out = []
        for v in range(tip + 1):
            try:
                s = self._snapshot(v)
            except FileNotFoundError:
                continue  # expired
            out.append(
                {
                    "version": v,
                    "operation": s["operation"],
                    "ts": s["ts"],
                    "summary": s.get("summary", {}),
                }
            )
        return out

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self._snapshot(version)["schema"])

    def entries(self, version: int | None = None) -> list[dict]:
        """All live data-file entries of a snapshot (path relative to
        root, rows, bytes, stats)."""
        snap = self._snapshot(version)
        out = []
        for m in snap["manifests"]:
            with open(os.path.join(self.meta_dir, m)) as f:
                out.extend(json.load(f)["entries"])
        return out

    # ------------------------------------------------------------ commit
    def _write_manifest(self, entries: list[dict]) -> str:
        name = f"manifest-{uuid.uuid4().hex}.json"
        path = os.path.join(self.meta_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"entries": entries}, f)
        os.rename(tmp, path)  # manifests are immutable once visible
        return name

    def _commit(self, snap: dict, expected_parent: int | None) -> int:
        """Atomically publish ``snap`` as the next version via exclusive
        create.  Raises :class:`CommitConflict` if someone else committed
        version ``expected_parent + 1`` first."""
        version = 0 if expected_parent is None else expected_parent + 1
        snap = dict(snap)
        snap["parent"] = expected_parent
        snap["ts"] = time.time()
        path = self._snapshot_path(version)
        tmp = json.dumps(snap)
        try:
            # O_EXCL create: the entire concurrency story in one syscall
            with open(path, "x") as f:
                f.write(tmp)
        except FileExistsError:
            raise CommitConflict(
                f"version {version} already committed by another writer"
            )
        hint_tmp = os.path.join(self.meta_dir, f".hint-{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, os.path.join(self.meta_dir, _HINT))
        return version

    # ------------------------------------------------------------- write
    def _materialize(
        self, df: DataFrame, n_files: int | None = None
    ) -> list[dict]:
        """Write ``df`` as immutable UUID-named parquet under ``data/``
        and return manifest entries with footer stats.  The files are
        unreferenced (invisible) until a snapshot commits them."""
        stage = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        out = df if n_files is None else df.repartition(n_files)
        out.write.mode("overwrite").parquet(stage)
        entries = []
        for name in sorted(os.listdir(stage)):
            if not name.endswith(".parquet") or name.startswith((".", "_")):
                continue
            final = f"{uuid.uuid4().hex}.parquet"
            os.rename(
                os.path.join(stage, name), os.path.join(self.data_dir, final)
            )
            rows, nbytes, stats = _footer_stats(
                os.path.join(self.data_dir, final)
            )
            if rows == 0:
                os.remove(os.path.join(self.data_dir, final))
                continue
            entries.append(
                {
                    "path": f"data/{final}",
                    "rows": rows,
                    "bytes": nbytes,
                    "stats": stats,
                }
            )
        shutil.rmtree(stage, ignore_errors=True)
        return entries

    def _aligned(self, df: DataFrame, evolve: bool) -> tuple[DataFrame, dict]:
        """Project ``df`` onto the table schema (missing columns -> NULL);
        with ``evolve=True`` new columns extend the schema instead."""
        schema = self.schema()
        have = set(df.columns)
        new_cols = [c for c in df.schema.fields if c.name not in
                    {f.name for f in schema.fields}]
        if new_cols and not evolve:
            raise ValueError(
                f"columns {[c.name for c in new_cols]} not in table schema "
                "(pass evolve=True to add them)"
            )
        fields = list(schema.fields) + new_cols
        cols = [
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in fields
        ]
        return df.select(*cols), json.loads(T.StructType(fields).json())

    def committed_version_for(self, idempotency_key: str) -> int | None:
        """Version whose commit carried ``idempotency_key``, or None.
        Driver-side O(snapshots) log walk — at production snapshot counts
        the key set would live in the tip snapshot (Delta keeps stream
        txn ids exactly so), which this API admits without change."""
        for h in self.history():
            if (h.get("summary") or {}).get("idempotency_key") == idempotency_key:
                return h["version"]
        return None

    def append(
        self,
        df: DataFrame,
        n_files: int | None = None,
        evolve: bool = False,
        max_retries: int = 5,
        idempotency_key: str | None = None,
    ) -> int:
        """Commit ``df`` as new data files.  Appends never conflict
        semantically, so a lost commit race rebases onto the new tip and
        retries — the expensive part (writing data files) happens once.

        ``idempotency_key`` makes redelivery safe: if some snapshot
        already committed under the key, that version returns WITHOUT
        writing — the foreachBatch exactly-once contract (a micro-batch
        that crashed after commit but before the streaming checkpoint
        advanced is replayed with the same batch id and becomes a no-op).
        The key check re-runs after every lost commit race, so two
        deliveries racing each other also collapse to one commit."""
        if idempotency_key is not None:
            v = self.committed_version_for(idempotency_key)
            if v is not None:
                return v
        aligned, schema_json = self._aligned(df, evolve)
        entries = self._materialize(aligned, n_files)
        manifest = self._write_manifest(entries) if entries else None
        summary = {
            "added_files": len(entries),
            "added_rows": sum(e["rows"] for e in entries),
        }
        if idempotency_key is not None:
            summary["idempotency_key"] = idempotency_key
        for _ in range(max_retries):
            snap = self._snapshot()
            manifests = list(snap["manifests"])
            if manifest:
                manifests.append(manifest)
            try:
                return self._commit(
                    {
                        "operation": "append",
                        "schema": schema_json,
                        "manifests": manifests,
                        "summary": summary,
                    },
                    expected_parent=snap["version"],
                )
            except CommitConflict:
                if idempotency_key is not None:
                    v = self.committed_version_for(idempotency_key)
                    if v is not None:
                        return v  # the race WAS this key's other delivery
                continue
        raise CommitConflict(f"append lost {max_retries} commit races")

    def overwrite(self, df: DataFrame, n_files: int | None = None) -> int:
        aligned, schema_json = self._aligned(df, evolve=False)
        entries = self._materialize(aligned, n_files)
        manifests = [self._write_manifest(entries)] if entries else []
        snap = self._snapshot()
        return self._commit(
            {
                "operation": "overwrite",
                "schema": schema_json,
                "manifests": manifests,
                "summary": {"added_files": len(entries)},
            },
            expected_parent=snap["version"],
        )

    # ------------------------------------------------------------- read
    def scan(
        self,
        spark: SparkSession,
        filters: list[tuple] | None = None,
        version: int | None = None,
    ) -> DataFrame:
        """Snapshot-isolated read.  ``filters`` — a conjunction of
        ``(col, op, value)`` triples — prunes files by manifest stats
        BEFORE Spark lists anything, then applies the exact predicate to
        the surviving rows.  ``version`` time-travels."""
        snap = self._snapshot(version)
        schema = T.StructType.fromJson(snap["schema"])
        entries = self.entries(snap["version"])
        if filters:
            entries = [e for e in entries if _may_match(e, filters)]
        if not entries:
            return spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, e["path"]) for e in entries]
        df = spark.read.schema(schema).parquet(*paths)
        if filters:
            df = df.where(_filters_to_column(filters))
        return df

    def added_entries(
        self, since_version: int, until_version: int | None = None
    ) -> list[dict]:
        """Data-file entries present at ``until_version`` (default: tip)
        but not at ``since_version`` — the incremental-read primitive.
        File identity is the immutable UUID path, so 'added' is an exact
        set difference over manifests (no timestamps, no data reads).
        Note compaction rewrites files without changing rows: its outputs
        appear 'added', which is correct for file-level consumers and why
        incremental ROW pipelines should consume appends, not rewrites."""
        old = {e["path"] for e in self.entries(since_version)}
        return [e for e in self.entries(until_version) if e["path"] not in old]

    def scan_added(
        self,
        spark: SparkSession,
        since_version: int,
        until_version: int | None = None,
    ) -> DataFrame:
        """Read ONLY rows in files added after ``since_version`` — at
        10^12 files this is the difference between re-validating 100 TB
        and validating the day's delta.  Pair with a checkpointed
        ``since_version`` to make every downstream pipeline incremental."""
        snap = self._snapshot(until_version)
        schema = T.StructType.fromJson(snap["schema"])
        entries = self.added_entries(since_version, snap["version"])
        if not entries:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(
            *[os.path.join(self.root, e["path"]) for e in entries]
        )

    def scan_file_count(
        self, filters: list[tuple] | None = None, version: int | None = None
    ) -> int:
        """How many files a scan would open — the pruning measurement."""
        entries = self.entries(version)
        if filters:
            entries = [e for e in entries if _may_match(e, filters)]
        return len(entries)

    # -------------------------------------------------- rewriting commits
    def _split_entries(
        self, filters: list[tuple], version: int
    ) -> tuple[list[dict], list[dict]]:
        entries = self.entries(version)
        hit = [e for e in entries if _may_match(e, filters)]
        keep = [e for e in entries if not _may_match(e, filters)]
        return hit, keep

    def delete_where(
        self, spark: SparkSession, filters: list[tuple]
    ) -> int:
        """Copy-on-write delete: rewrite ONLY the files whose stats
        overlap the predicate, carrying every other file by reference.
        One atomic snapshot commit swaps the file set; a conflicting
        concurrent commit raises (rewrites don't auto-rebase)."""
        snap = self._snapshot()
        hit, keep = self._split_entries(filters, snap["version"])
        if not hit:
            return snap["version"]  # predicate provably matches nothing
        schema = T.StructType.fromJson(snap["schema"])
        paths = [os.path.join(self.root, e["path"]) for e in hit]
        # DELETE removes rows where the predicate is TRUE; NULL-predicate
        # rows (e.g. NULL in the filter column) survive — same semantics
        # as ANSI DELETE WHERE and the manifest-level _may_match pruning
        # (an all-NULL file is carried by reference, i.e. kept).
        pred = _filters_to_column(filters)
        survivors = (
            spark.read.schema(schema)
            .parquet(*paths)
            .where(~F.coalesce(pred, F.lit(False)))
        )
        new_entries = self._materialize(survivors)
        manifests = []
        if keep:
            manifests.append(self._write_manifest(keep))
        if new_entries:
            manifests.append(self._write_manifest(new_entries))
        return self._commit(
            {
                "operation": "delete",
                "schema": snap["schema"],
                "manifests": manifests,
                "summary": {
                    "rewritten_files": len(hit),
                    "carried_files": len(keep),
                },
            },
            expected_parent=snap["version"],
        )

    def merge_upsert(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        evolve: bool = False,
        check_unique_keys: bool = True,
    ) -> int:
        """``MERGE INTO target USING source ON keys WHEN MATCHED THEN
        UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` — the Delta-style
        upsert an incremental pipeline runs every batch (reference stores
        scoring outputs via repeated Delta overwrites,
        ``01_dff_model.py:481-485``; this is the surgical version).

        Copy-on-write at file granularity: the source's per-key-column
        min/max bounds prune the target's manifest, so ONLY files whose
        stats overlap the source key range are rewritten (matched rows
        anti-joined out); every other file is carried by reference.  A
        daily delta touching one day of a year-partitioned 100 TB table
        rewrites ~1/365th of the files; the anti-join's right side is the
        (typically small) source key set, which AQE broadcast-converts.

        Semantics pinned by tests: a matched target row is REPLACED by
        its source row (update-all); unmatched source rows append;
        NULL-keyed rows never match (SQL equality), so NULL-keyed target
        rows survive and NULL-keyed source rows insert.  Multiple source
        rows per key would make the update ambiguous (Delta raises too) —
        ``check_unique_keys`` pays one small aggregation on the source to
        fail fast.  ``evolve=True`` lets the source add columns (old rows
        read NULL).  One atomic snapshot commit; concurrent conflicting
        commits raise :class:`CommitConflict`."""
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        snap = self._snapshot()
        aligned_src, schema_json = self._aligned(source, evolve)
        merged_fields = T.StructType.fromJson(schema_json).fields
        if check_unique_keys:
            dup = (
                source.groupBy(*key_cols)
                .count()
                .where(F.col("count") > 1)
                .limit(1)
                .collect()
            )
            if dup:
                raise ValueError(
                    f"source has multiple rows for key {dup[0][:-1]!r}; "
                    "MERGE update would be ambiguous"
                )
        # prune: a target file can only contain matches if, for EVERY key
        # column, its [min,max] overlaps the source's [min,max] (NULL keys
        # never match, so non-null bounds are sufficient)
        bounds = source.select(
            *[F.min(k).alias(f"{k}__lo") for k in key_cols],
            *[F.max(k).alias(f"{k}__hi") for k in key_cols],
        ).collect()[0]
        filters = [
            (k, "between", (bounds[f"{k}__lo"], bounds[f"{k}__hi"]))
            for k in key_cols
            if bounds[f"{k}__lo"] is not None
        ]
        if filters:
            hit, keep = self._split_entries(filters, snap["version"])
        else:  # all-NULL (or empty) source keys: nothing can match
            hit, keep = [], self.entries(snap["version"])
        old_schema = T.StructType.fromJson(snap["schema"])
        pad = [
            F.col(f.name)
            if f.name in {g.name for g in old_schema.fields}
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in merged_fields
        ]
        new_entries: list[dict] = []
        if hit:
            target_hit = spark.read.schema(old_schema).parquet(
                *[os.path.join(self.root, e["path"]) for e in hit]
            )
            survivors = target_hit.join(
                aligned_src.select(*key_cols).distinct(), key_cols, "left_anti"
            ).select(*pad)
            new_entries.extend(self._materialize(survivors))
        elif evolve and len(merged_fields) > len(old_schema.fields):
            # schema grew but no files rewrite: carried files simply read
            # NULL for the new columns via the snapshot schema
            pass
        new_entries.extend(self._materialize(aligned_src))
        manifests = []
        if keep:
            manifests.append(self._write_manifest(keep))
        if new_entries:
            manifests.append(self._write_manifest(new_entries))
        return self._commit(
            {
                "operation": "merge",
                "schema": schema_json,
                "manifests": manifests,
                "summary": {
                    "rewritten_files": len(hit),
                    "carried_files": len(keep),
                },
            },
            expected_parent=snap["version"],
        )

    def delete_matching(
        self, spark: SparkSession, keys: DataFrame, key_cols: list[str]
    ) -> int:
        """Copy-on-write DELETE of every row whose key tuple appears in
        ``keys`` — the CDC-removed half of :func:`dff.diff.apply_cdc`.
        Same shape as :meth:`merge_upsert` minus the insert: key bounds
        prune the manifest, hit files anti-join the (distinct) key set —
        the key frame stays distributed, no driver collect, so a
        million-row tombstone batch costs the same plan as ten."""
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        snap = self._snapshot()
        bounds = keys.select(
            *[F.min(k).alias(f"{k}__lo") for k in key_cols],
            *[F.max(k).alias(f"{k}__hi") for k in key_cols],
        ).collect()[0]
        filters = [
            (k, "between", (bounds[f"{k}__lo"], bounds[f"{k}__hi"]))
            for k in key_cols
            if bounds[f"{k}__lo"] is not None
        ]
        if not filters:  # empty or all-NULL keys: nothing can match
            return snap["version"]
        hit, keep = self._split_entries(filters, snap["version"])
        if not hit:
            return snap["version"]
        schema = T.StructType.fromJson(snap["schema"])
        survivors = (
            spark.read.schema(schema)
            .parquet(*[os.path.join(self.root, e["path"]) for e in hit])
            .join(keys.select(*key_cols).distinct(), key_cols, "left_anti")
        )
        new_entries = self._materialize(survivors)
        manifests = []
        if keep:
            manifests.append(self._write_manifest(keep))
        if new_entries:
            manifests.append(self._write_manifest(new_entries))
        return self._commit(
            {
                "operation": "delete",
                "schema": snap["schema"],
                "manifests": manifests,
                "summary": {
                    "rewritten_files": len(hit),
                    "carried_files": len(keep),
                },
            },
            expected_parent=snap["version"],
        )

    def compact(
        self, spark: SparkSession, target_file_bytes: int = 128 << 20
    ) -> int:
        """Bin-pack small files into ~``target_file_bytes`` outputs in ONE
        atomic snapshot commit — files at or above target are carried by
        reference.  Unlike :func:`dff.maintenance.compact_parquet_dir`
        there is no swap window at all: readers of the old snapshot keep
        their exact file list; the new tip appears or nothing does."""
        snap = self._snapshot()
        entries = self.entries(snap["version"])
        small = [e for e in entries if e["bytes"] < target_file_bytes]
        keep = [e for e in entries if e["bytes"] >= target_file_bytes]
        if len(small) < 2:
            return snap["version"]
        schema = T.StructType.fromJson(snap["schema"])
        n_files = max(1, -(-sum(e["bytes"] for e in small) // target_file_bytes))
        df = spark.read.schema(schema).parquet(
            *[os.path.join(self.root, e["path"]) for e in small]
        )
        new_entries = self._materialize(df, n_files=n_files)
        manifests = []
        if keep:
            manifests.append(self._write_manifest(keep))
        if new_entries:
            manifests.append(self._write_manifest(new_entries))
        return self._commit(
            {
                "operation": "compact",
                "schema": snap["schema"],
                "manifests": manifests,
                "summary": {
                    "compacted_files": len(small),
                    "new_files": len(new_entries),
                },
            },
            expected_parent=snap["version"],
        )

    def rollback(self, version: int) -> int:
        """Point the tip back at an old snapshot's file set (a NEW commit —
        history is never rewritten, so the bad snapshots stay auditable)."""
        old = self._snapshot(version)
        tip = self._snapshot()
        return self._commit(
            {
                "operation": "rollback",
                "schema": old["schema"],
                "manifests": old["manifests"],
                "summary": {"to_version": version},
            },
            expected_parent=tip["version"],
        )

    # ------------------------------------------------------- maintenance
    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and garbage-
        collect manifests and data files no kept snapshot references.
        Returns counts.  Readers of expired versions lose time travel —
        the standard retention trade."""
        tip = self._latest_version()
        keep_versions = set()
        v = tip
        while v is not None and len(keep_versions) < keep_last:
            if os.path.exists(self._snapshot_path(v)):
                keep_versions.add(v)
            v -= 1
            if v < 0:
                break
        live_manifests: set[str] = set()
        live_files: set[str] = set()
        for v in keep_versions:
            snap = self._snapshot(v)
            live_manifests.update(snap["manifests"])
            for e in self.entries(v):
                live_files.add(os.path.basename(e["path"]))
        dropped = {"snapshots": 0, "manifests": 0, "data_files": 0}
        for name in os.listdir(self.meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                if int(name[1:-5]) not in keep_versions:
                    os.remove(os.path.join(self.meta_dir, name))
                    dropped["snapshots"] += 1
            elif name.startswith("manifest-") and name not in live_manifests:
                os.remove(os.path.join(self.meta_dir, name))
                dropped["manifests"] += 1
        for name in os.listdir(self.data_dir):
            if name not in live_files:
                os.remove(os.path.join(self.data_dir, name))
                dropped["data_files"] += 1
        return dropped

    def gc_orphans(self, grace_seconds: float = 3600.0) -> int:
        """Remove data files no snapshot references (crashed writers) and
        stale ``.stage-*`` dirs.  ``grace_seconds`` protects files an
        IN-FLIGHT commit has materialized but not yet committed."""
        live: set[str] = set()
        tip = self._latest_version()
        for v in range((tip or 0) + 1):
            if not os.path.exists(self._snapshot_path(v)):
                continue
            for e in self.entries(v):
                live.add(os.path.basename(e["path"]))
        now = time.time()
        removed = 0
        for name in os.listdir(self.data_dir):
            p = os.path.join(self.data_dir, name)
            if name not in live and now - os.path.getmtime(p) >= grace_seconds:
                os.remove(p)
                removed += 1
        for name in os.listdir(self.root):
            p = os.path.join(self.root, name)
            if (
                name.startswith(".stage-")
                and os.path.isdir(p)
                and now - os.path.getmtime(p) >= grace_seconds
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed += 1
        return removed
