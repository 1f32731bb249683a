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
- **Field-id schema evolution.** A column's identity is a permanent
  integer id (assigned at create/add, never reused); its name is a
  label.  ``rename_column`` / ``drop_column`` / ``add_column`` are
  metadata-only commits: every data file is stamped with the schema id
  current when it was written, and reads project physical (write-time)
  names to current names through the id — so old files survive renames,
  pre-add files read NULL, and a dropped-then-re-added name never
  resurrects old values.  Stats/bloom pruning translates filter names
  per entry the same way.

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


# -- memoized manifest parsing (r6, VERDICT r05 #2) ----------------------
# Manifests are immutable once written (new commits write NEW manifest
# files), so repeated scans / COW ops / file counts of the same snapshot
# re-parsed identical JSON on every call.  Keyed by (path, mtime_ns,
# size) so an overwritten or recreated file can never serve stale
# entries; bounded by a total-entry budget, evicting oldest-inserted.
_MANIFEST_CACHE: dict = {}
_MANIFEST_CACHE_MAX_ENTRIES = int(
    os.environ.get("DFF_MANIFEST_CACHE_ENTRIES", "500000")
)
_manifest_cache_entries = [0]

#: manifest-JSON byte threshold above which filtered scans / COW pruning
#: route through the distributed planner (~10k entries at the 4 MB
#: default; entries serialize at roughly 400 B).  Parameterised so a
#: cluster deployment can tune it; 0 forces the distributed path (used by
#: the auto-path parity test).
_DISTPLAN_MIN_MANIFEST_BYTES = int(
    os.environ.get("DFF_DISTPLAN_MIN_MANIFEST_BYTES", "4000000")
)


def _load_manifest(path: str) -> list[dict]:
    st = os.stat(path)
    key = (path, st.st_mtime_ns, st.st_size)
    hit = _MANIFEST_CACHE.get(key)
    if hit is not None:
        return hit
    with open(path) as f:
        entries = json.load(f)["entries"]
    if len(entries) <= _MANIFEST_CACHE_MAX_ENTRIES:
        # evict oldest-inserted manifests until the new one fits
        while (
            _MANIFEST_CACHE
            and _manifest_cache_entries[0] + len(entries)
            > _MANIFEST_CACHE_MAX_ENTRIES
        ):
            oldest = next(iter(_MANIFEST_CACHE))
            _manifest_cache_entries[0] -= len(_MANIFEST_CACHE.pop(oldest))
        _MANIFEST_CACHE[key] = entries
        _manifest_cache_entries[0] += len(entries)
    return entries


class CommitConflict(Exception):
    """A concurrent writer committed a conflicting snapshot first."""


class CheckConstraintViolation(Exception):
    """A write produced rows that fail a table CHECK constraint.  The
    staged files are unreferenced (no snapshot committed them) and are
    reclaimed by ``gc_orphans``.  Carries ``violations``: constraint
    name -> violating-row count."""

    def __init__(self, violations: dict):
        self.violations = dict(violations)
        super().__init__(
            "check constraint(s) violated by written rows: "
            + ", ".join(f"{k}={v}" for k, v in sorted(violations.items()))
        )


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


def _bloom_key(v) -> bytes:
    """Canonical hash input: integral floats collapse onto ints so a
    probe of 7 finds a stored 7.0 (stats comparisons coerce numerics;
    the bloom must not be stricter or it would WRONGLY prune)."""
    if isinstance(v, bool):
        return f"b:{v}".encode()
    if isinstance(v, float) and v.is_integer():
        v = int(v)
    if isinstance(v, int):
        return f"i:{v}".encode()
    if isinstance(v, float):
        return f"f:{v!r}".encode()
    if isinstance(v, str):
        return b"s:" + v.encode()
    return repr(v).encode()


def _bloom_build(values, rows: int) -> dict:
    """Per-file Bloom filter over a column's values: ~10 bits/row, k=7
    (FPR ~1%), capped at 256 Kibit (32 KiB -> ~43 KB base64 in the
    manifest) — big files trade a little FPR for bounded metadata.  Only
    the DRIVER ever probes these (prune-or-keep), so the hash needs no
    Spark twin."""
    import base64
    import hashlib

    m = (min(max(1024, rows * 10), 1 << 18) + 7) & ~7  # whole bytes
    buf = bytearray(m // 8)
    for v in values:
        if v is None:
            continue
        h = hashlib.blake2b(_bloom_key(v), digest_size=16).digest()
        h1 = int.from_bytes(h[:8], "little")
        h2 = int.from_bytes(h[8:], "little") | 1
        for i in range(7):
            p = (h1 + i * h2) % m
            buf[p >> 3] |= 1 << (p & 7)
    return {
        "m": m,
        "k": 7,
        "b64": base64.b64encode(bytes(buf)).decode(),
    }


def _bloom_may_contain(bloom: dict, v) -> bool:
    import base64
    import hashlib

    if v is None:
        return True  # equality with NULL never matches; stats handle it
    buf = base64.b64decode(bloom["b64"])
    m = bloom["m"]
    h = hashlib.blake2b(_bloom_key(v), digest_size=16).digest()
    h1 = int.from_bytes(h[:8], "little")
    h2 = int.from_bytes(h[8:], "little") | 1
    for i in range(bloom["k"]):
        p = (h1 + i * h2) % m
        if not (buf[p >> 3] & (1 << (p & 7))):
            return False
    return True


def _bloom_may_match(entry: dict, filters: list[tuple]) -> bool:
    """False only when a bloom PROVES no row carries the probed value(s).
    Range operators can't probe a bloom; missing blooms keep the file."""
    blooms = entry.get("blooms") or {}
    for col, op, val in filters:
        b = blooms.get(col)
        if b is None:
            continue
        if op == "=" and not _bloom_may_contain(b, val):
            return False
        if op == "in" and not any(_bloom_may_contain(b, v) for v in val):
            return False
    return True


_SAFE_WIDENINGS = {
    # every pair preserves values EXACTLY (no int->float32 / long->double:
    # those lose precision past 2^24 / 2^53)
    ("byte", "short"), ("byte", "int"), ("byte", "bigint"),
    ("short", "int"), ("short", "bigint"),
    ("int", "bigint"),
    ("byte", "float"), ("short", "float"),
    ("byte", "double"), ("short", "double"), ("int", "double"),
    ("float", "double"),
}


def _safe_widening(src, dst) -> bool:
    return (src.simpleString(), dst.simpleString()) in _SAFE_WIDENINGS


# widening only ever involves these atomic types (see _SAFE_WIDENINGS)
_ATOMIC_TYPES = {
    "byte": T.ByteType(), "short": T.ShortType(), "int": T.IntegerType(),
    "bigint": T.LongType(), "float": T.FloatType(), "double": T.DoubleType(),
}


def _phys_type_overrides(snap: dict | None, file_seq: int) -> dict[int, str]:
    """field id -> PHYSICAL (write-time) simpleString type for data files
    committed at sequence number ``file_seq``, covering fields whose type
    was widened AFTER the file was written (appends cast at write, so a
    file's physical type is the table type as of its commit).  The
    chronological ``widen_history`` makes this derivable: the physical
    type is the ``from`` side of the EARLIEST widen that postdates the
    file.  Empty in steady state (no widening ever happened)."""
    if snap is None:
        return {}
    out: dict[int, str] = {}
    for w in snap.get("widen_history") or ():
        if file_seq < w["seq"] and w["field_id"] not in out:
            out[w["field_id"]] = w["from"]
    return out


def _name_map_for(snap: dict | None, sid) -> dict[str, str] | None:
    """CURRENT column name -> PHYSICAL (write-time) name for data files
    stamped with schema id ``sid``.  This is the field-id indirection
    (Iceberg's schema-evolution core): a column's identity is its id, not
    its name, so renames and drops are metadata-only commits and old
    files keep reading correctly under whatever name they were written
    with.  Returns None for identity (legacy snapshot without field-id
    metadata, or an entry that predates stamping).  A current field whose
    id is absent from the write-time map simply has no key in the result
    — the file was written before the field existed (or before it was
    re-added with a fresh id), so the column reads as NULL."""
    if snap is None or sid is None:
        return None
    fields = snap.get("fields")
    schemas = snap.get("schemas")
    if not fields or not schemas:
        return None
    wmap = schemas.get(str(sid))
    if wmap is None:
        return None  # sid minted on another chain: never reinterpret
    return {
        fl["name"]: wmap[str(fl["id"])]
        for fl in fields
        if str(fl["id"]) in wmap
    }


def _phys_filters(
    filters: list[tuple],
    nmap: dict[str, str] | None,
    field_names: set[str] | None = None,
) -> list[tuple] | None:
    """Translate current-name filters to an entry's physical stat/bloom
    names.  Returns None when some filtered CURRENT FIELD does not
    physically exist in the file (it was added — or dropped and re-added
    — after the file was written): every supported op is NULL-rejecting,
    so such a file cannot contain a matching row and may be pruned
    outright.  A filter on a name that is not a table field at all
    passes through untranslated — no file carries stats for it, so it
    never prunes anything (keep on ignorance, parity with _may_match)."""
    if nmap is None:
        return filters
    out = []
    for col, op, val in filters:
        p = nmap.get(col)
        if p is None:
            if field_names is not None and col not in field_names:
                out.append((col, op, val))
                continue
            return None
        out.append((p, op, val))
    return out


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


# --------------------------------------------------------------------------
# partition transforms (Iceberg-style hidden partitioning): data is
# clustered on TRANSFORMED values at write time, and scans prune whole
# files by evaluating predicates on the source column against the stored
# transform output — the user never writes the transform in a query.
# ``bucket`` is the one transform min/max stats cannot emulate: a point
# lookup on a hash-scattered key opens 1/n of the files.  Our bucket hash
# is crc32(cast(col as string)) % n — chosen because Spark's F.crc32 and
# Python's zlib.crc32 agree bit-for-bit, so the driver can prune without
# a JVM round-trip (Iceberg specs murmur3; the protocol is identical).
# --------------------------------------------------------------------------

_NULL_PV = "__HIVE_DEFAULT_PARTITION__"
_TRANSFORMS = {"identity", "bucket", "truncate", "day", "month", "hour"}
_MONOTONIC = {"identity", "truncate", "day", "month", "hour"}


def _normalize_spec(spec: list, schema: T.StructType) -> list[dict]:
    by_name = {f.name: f.dataType.simpleString() for f in schema.fields}
    out = []
    for s in spec:
        if isinstance(s, (tuple, list)):
            s = {"col": s[0], "transform": s[1],
                 "param": s[2] if len(s) > 2 else None}
        col, tr, param = s["col"], s["transform"], s.get("param")
        if col not in by_name:
            raise ValueError(f"partition column {col!r} not in schema")
        if tr not in _TRANSFORMS:
            raise ValueError(f"transform {tr!r} not in {sorted(_TRANSFORMS)}")
        typ = by_name[col]
        if tr in ("bucket", "truncate"):
            if not isinstance(param, int) or param <= 0:
                raise ValueError(f"{tr} needs a positive int param")
            if tr == "bucket" and typ not in (
                "int", "bigint", "smallint", "tinyint", "string"
            ):
                raise ValueError(f"bucket supports int/string cols, not {typ}")
        if tr in ("day", "month", "hour") and typ not in (
            "timestamp", "timestamp_ntz", "date"
        ):
            raise ValueError(f"{tr} needs a timestamp/date col, not {typ}")
        out.append({"col": col, "transform": tr, "param": param, "type": typ})
    return out


def _transform_expr(s: dict) -> Column:
    c = F.col(s["col"])
    tr = s["transform"]
    if tr == "identity":
        return c
    if tr == "bucket":
        return F.pmod(F.crc32(c.cast("string")), F.lit(s["param"]))
    if tr == "truncate":
        if s["type"] == "string":
            return F.substring(c, 1, s["param"])
        return c - F.pmod(c, F.lit(s["param"]))
    # day/month/hour: canonical "yyyy-MM-dd HH:mm:ss" strings — same
    # format driver-side, and lexicographic order == chronological order
    return F.date_trunc(tr, c).cast("string")


def _transform_value(s: dict, val):
    """Driver-side twin of :func:`_transform_expr` — applied to FILTER
    values so pruning happens with zero JVM round-trips."""
    import datetime
    import zlib

    tr = s["transform"]
    if tr == "identity":
        return val
    if tr == "bucket":
        return zlib.crc32(str(val).encode("utf-8")) % s["param"]
    if tr == "truncate":
        if s["type"] == "string":
            return val[: s["param"]]
        return val - (val % s["param"])
    if isinstance(val, str):
        val = datetime.datetime.fromisoformat(val)
    elif isinstance(val, datetime.date) and not isinstance(
        val, datetime.datetime
    ):
        val = datetime.datetime(val.year, val.month, val.day)
    if tr == "hour":
        val = val.replace(minute=0, second=0, microsecond=0)
    else:
        val = val.replace(hour=0, minute=0, second=0, microsecond=0)
        if tr == "month":
            val = val.replace(day=1)
    return val.strftime("%Y-%m-%d %H:%M:%S")


def _parse_pv(raw: str, s: dict):
    """Typed partition value from a hive-style ``__pt_i=<raw>`` dir."""
    from urllib.parse import unquote

    if raw == _NULL_PV:
        return None
    raw = unquote(raw)
    if s["transform"] == "bucket" or (
        s["transform"] in ("identity", "truncate")
        and s["type"] in ("int", "bigint", "smallint", "tinyint")
    ):
        return int(raw)
    return raw


def _at_lower_boundary(s: dict, val) -> bool:
    """True when ``val`` is the minimum of its transform class — then a
    strict ``<`` filter excludes the whole equal partition."""
    tr = s["transform"]
    if tr == "identity":
        return True
    if tr == "truncate":
        if s["type"] == "string":
            return len(val) <= s["param"]
        return val % s["param"] == 0
    if tr in ("day", "month", "hour"):
        import datetime

        v = (
            datetime.datetime.fromisoformat(val)
            if isinstance(val, str)
            else val
        )
        if not isinstance(v, datetime.datetime):
            return True  # a date IS its day's lower boundary
        if v.minute or v.second or v.microsecond:
            return False
        if tr == "hour":
            return True
        if v.hour:
            return False
        return tr == "day" or v.day == 1
    return False


def _partition_may_match(entry: dict, filters: list[tuple], spec: list[dict]) -> bool:
    """False only when the file's partition value PROVES no row matches.
    A null partition (all rows NULL in the source col) fails every
    supported predicate, so those files prune for any filter on the col."""
    part = entry.get("partition")
    if not part:
        return True  # written before the spec (or unpartitioned rewrite)
    for fcol, op, val in filters:
        for i, s in enumerate(spec):
            if s["col"] != fcol or str(i) not in part:
                continue
            pv = part[str(i)]
            if pv is None:
                return False  # NULL source rows satisfy no predicate here
            monotonic = s["transform"] in _MONOTONIC
            if op == "=":
                if pv != _transform_value(s, val):
                    return False
            elif op == "in":
                if pv not in {_transform_value(s, v) for v in val}:
                    return False
            elif monotonic and op in (">", ">="):
                tv = _transform_value(s, val)
                if pv < tv:
                    return False
                # x > val within val's own class is impossible only for
                # identity (the class is a single point)
                if op == ">" and pv == tv and s["transform"] == "identity":
                    return False
            elif monotonic and op in ("<", "<="):
                tv = _transform_value(s, val)
                if pv > tv:
                    return False
                # strict < with val exactly at its class's lower boundary:
                # no x in the pv == tv class can satisfy x < val
                if op == "<" and pv == tv and _at_lower_boundary(s, val):
                    return False
            elif monotonic and op == "between":
                if not (
                    _transform_value(s, val[0])
                    <= pv
                    <= _transform_value(s, val[1])
                ):
                    return False
            # non-monotonic (bucket) range ops: cannot prune
    return True


class Table:
    """A versioned parquet table with atomic snapshot commits.

    ``root/data/`` holds immutable UUID-named parquet files; ``root/
    metadata/`` holds ``manifest-*.json`` fragments (added-file lists with
    footer stats) and ``v{N}.json`` snapshots (manifest lists).  The tip
    is recovered by listing snapshots (``_version_hint`` is advisory)."""

    def __init__(self, root: str, branch: str | None = None):
        self.root = os.path.abspath(root)
        self.branch = branch
        # manifests are shared across branches (immutable, uuid-named);
        # only the SNAPSHOT chain is per-branch — a branch is just another
        # linear commit log pointing into the same data + manifest pool
        self.manifest_dir = os.path.join(self.root, "metadata")
        self.meta_dir = (
            self.manifest_dir
            if branch is None
            else os.path.join(self.root, "metadata", "branches", branch)
        )
        self.data_dir = os.path.join(self.root, "data")

    # ---------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        root: str,
        schema: T.StructType,
        partition_spec: list | None = None,
        bloom_cols: list[str] | None = None,
        change_feed: bool = False,
    ) -> "Table":
        """``partition_spec`` — list of ``(col, transform[, param])``:
        ``identity`` / ``bucket(n)`` / ``truncate(w)`` / ``day`` /
        ``month`` / ``hour``.  Hidden partitioning: writes cluster on the
        transformed values; scans on the SOURCE column prune whole files.

        ``bloom_cols``: per-file Bloom filters in the manifest for these
        columns — the skipping device min/max stats CANNOT provide for a
        point lookup on a high-cardinality UNCLUSTERED column (every
        file's range spans the probe, but only ~one file's bloom says
        maybe).  Costs one column re-read per file at write time and
        ~KBs of manifest per file; ``=`` and ``in`` scans prune on it.

        ``change_feed``: COW delete/update/merge commits additionally
        materialize their changed rows as change files, enabling
        :meth:`scan_changes` (CDC reads) across every operation.
        Appends, overwrites and MOR commits never pay extra — their
        changes derive from the log."""
        t = cls(root)
        os.makedirs(t.meta_dir, exist_ok=False)
        os.makedirs(t.data_dir, exist_ok=True)
        fields = [
            {"id": i + 1, "name": f.name}
            for i, f in enumerate(schema.fields)
        ]
        snap = {
            "operation": "create",
            "schema": json.loads(schema.json()),
            "manifests": [],
            # field-id metadata: ids are a column's permanent identity;
            # names are labels.  ``schemas`` is the registry of every
            # schema id ever current (id -> name at that point), so a
            # data file stamped with its write-time schema id maps its
            # physical column names forward forever.
            "fields": fields,
            "next_field_id": len(fields) + 1,
            "schema_id": 0,
            "schemas": {"0": {str(fl["id"]): fl["name"] for fl in fields}},
        }
        if bloom_cols:
            missing = [
                c for c in bloom_cols
                if c not in {f.name for f in schema.fields}
            ]
            if missing:
                raise ValueError(f"bloom_cols not in schema: {missing}")
            snap["bloom_cols"] = list(bloom_cols)
        if change_feed:
            snap["change_feed"] = True
        if partition_spec:
            spec = _normalize_spec(partition_spec, schema)
            snap["partition_spec"] = spec
            snap["partition_specs"] = [spec]
            snap["default_spec_id"] = 0
        t._commit(snap, expected_parent=None)
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

    def _snapshot(self, version: "int | str | None" = None) -> dict:
        if isinstance(version, str):
            version = self._resolve_tag(version)
        v = self._latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no snapshots under {self.meta_dir}")
        with open(self._snapshot_path(v)) as f:
            snap = json.load(f)
        snap["version"] = v
        return snap

    # -------------------------------------------------------------- tags
    def _resolve_tag(self, name: str) -> int:
        tags = self.tags()
        if name not in tags:
            raise KeyError(f"no tag {name!r} (have {sorted(tags)})")
        return tags[name]

    def tags(self) -> dict[str, int]:
        """Named snapshot refs (Iceberg tags): tag name -> version.  The
        tip snapshot carries the ref registry; every ``version=`` API
        accepts a tag name wherever it accepts a number."""
        with open(self._snapshot_path(self._latest_version())) as f:
            return dict(json.load(f).get("tags") or {})

    def tag(self, name: str, version: int | None = None) -> int:
        """Pin a snapshot under a name — a METADATA-ONLY commit (the ref
        registry rides the tip).  Tagged snapshots and everything they
        reference survive :meth:`expire_snapshots` until the tag drops —
        the audit/repro primitive ('the snapshot the Q3 model trained
        on') that version numbers alone can't provide once retention
        kicks in."""
        self._require_main("tag")
        snap = self._snapshot()
        v = snap["version"] if version is None else version
        if not os.path.exists(self._snapshot_path(v)):
            raise FileNotFoundError(f"no snapshot v{v} to tag")
        tags = dict(snap.get("tags") or {})
        if tags.get(name) == v:
            return snap["version"]  # no-op
        tags[name] = v
        return self._commit(
            {
                "operation": "tag",
                "schema": snap["schema"],
                "manifests": list(snap["manifests"]),
                "tags": tags,
                "summary": {"tag": {name: v}},
            },
            expected_parent=snap["version"],
        )

    def drop_tag(self, name: str) -> int:
        self._require_main("drop_tag")
        snap = self._snapshot()
        tags = dict(snap.get("tags") or {})
        if name not in tags:
            raise KeyError(f"no tag {name!r}")
        v = tags.pop(name)
        return self._commit(
            {
                "operation": "drop-tag",
                "schema": snap["schema"],
                "manifests": list(snap["manifests"]),
                "tags": tags,
                "summary": {"drop_tag": {name: v}},
            },
            expected_parent=snap["version"],
        )

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
            out.extend(_load_manifest(os.path.join(self.manifest_dir, m)))
        return out

    def delete_entries(self, version: int | None = None) -> list[dict]:
        """Pending equality-delete file entries of a snapshot (path, rows,
        bytes, ``cols`` — the key tuple — and ``seq``).  Empty on a table
        with no merge-on-read deletes outstanding."""
        snap = self._snapshot(version)
        out = []
        for m in snap.get("delete_manifests", []):
            out.extend(_load_manifest(os.path.join(self.manifest_dir, m)))
        return out

    def change_entries(self, version: int | None = None) -> list[dict]:
        """Change-file entries a commit materialized (CDC pre/post images
        and deletes, each tagged ``change_type``).  Only COW delete/
        update/merge commits on a ``change_feed=True`` table carry any."""
        snap = self._snapshot(version)
        name = snap.get("change_manifest")
        if not name:
            return []
        with open(os.path.join(self.manifest_dir, name)) as f:
            return json.load(f)["entries"]

    @staticmethod
    def _seq_of(snap: dict) -> int:
        # sequence numbers order writes for delete applicability; they are
        # decoupled from version numbers so a branch publish can adopt the
        # branch chain's higher sequences without renumbering manifests
        return snap.get("seq", snap["version"])

    def _live_delete_manifests(
        self, data_entries: list[dict], names: list[str]
    ) -> list[str]:
        """Drop delete manifests that no longer apply to ANY data entry
        (every remaining file is newer than the delete) — rewrites call
        this so applied deletes are reclaimed instead of haunting scans."""
        if not names:
            return []
        min_seq = min((e.get("seq", 0) for e in data_entries), default=None)
        if min_seq is None:
            return []  # empty table: nothing left to delete from
        keep = []
        for m in names:
            with open(os.path.join(self.manifest_dir, m)) as f:
                des = json.load(f)["entries"]
            if any(d["seq"] > min_seq for d in des):
                keep.append(m)
        return keep

    # ------------------------------------------------------------ commit
    def _write_manifest(self, entries: list[dict]) -> str:
        name = f"manifest-{uuid.uuid4().hex}.json"
        path = os.path.join(self.manifest_dir, name)
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
        if expected_parent is not None:
            parent = self._snapshot(expected_parent)
            if "partition_spec" not in snap and parent.get("partition_spec"):
                snap["partition_spec"] = parent["partition_spec"]
            if "partition_specs" not in snap and parent.get(
                "partition_specs"
            ):
                snap["partition_specs"] = parent["partition_specs"]
                snap["default_spec_id"] = parent.get("default_spec_id", 0)
            if "bloom_cols" not in snap and parent.get("bloom_cols"):
                snap["bloom_cols"] = parent["bloom_cols"]
            if "seq" not in snap:
                snap["seq"] = self._seq_of(parent) + 1
            if "delete_manifests" not in snap:
                # pending MOR deletes survive unrelated commits untouched
                snap["delete_manifests"] = parent.get("delete_manifests", [])
            if "widen_history" not in snap and parent.get("widen_history"):
                # type-widening eras survive unrelated commits untouched
                snap["widen_history"] = parent["widen_history"]
            if "change_feed" not in snap and parent.get("change_feed"):
                snap["change_feed"] = True
            if "tags" not in snap and parent.get("tags"):
                # the ref registry rides the tip across unrelated commits
                snap["tags"] = parent["tags"]
            if "check_constraints" not in snap and parent.get(
                "check_constraints"
            ):
                # table CHECK constraints ride the tip like tags
                snap["check_constraints"] = parent["check_constraints"]
            if "fields" not in snap and parent.get("fields"):
                # derive field ids for this commit's schema from the
                # parent: known names keep their id, new names (evolve
                # appends/merges) mint fresh ids and register a new
                # schema id.  Explicit schema-change commits (rename/
                # drop/add/rollback) set these keys themselves.
                names = [f["name"] for f in snap["schema"]["fields"]]
                by_name = {fl["name"]: fl["id"] for fl in parent["fields"]}
                nfi = parent.get(
                    "next_field_id",
                    1 + max(fl["id"] for fl in parent["fields"]),
                )
                fields = []
                for n in names:
                    if n in by_name:
                        fields.append({"id": by_name[n], "name": n})
                    else:
                        fields.append({"id": nfi, "name": n})
                        nfi += 1
                snap["fields"] = fields
                snap["next_field_id"] = nfi
                schemas = dict(parent.get("schemas") or {})
                cur_map = {str(fl["id"]): fl["name"] for fl in fields}
                parent_sid = parent.get("schema_id", 0)
                if cur_map == (schemas.get(str(parent_sid)) or {}):
                    snap["schema_id"] = parent_sid
                else:
                    sid = (
                        max(int(k) for k in schemas) + 1 if schemas else 0
                    )
                    schemas[str(sid)] = cur_map
                    snap["schema_id"] = sid
                snap["schemas"] = schemas
        else:
            snap.setdefault("seq", 0)
        snap["parent"] = expected_parent
        snap["ts"] = time.time()
        path = self._snapshot_path(version)
        tmp = json.dumps(snap)
        # write the full content to a hidden tmp, then hardlink to the
        # final name: link(2) fails with EEXIST if a rival committed
        # first (the same mutual exclusion O_EXCL create gives) AND the
        # snapshot appears to readers fully written — a bare O_EXCL
        # create+write exposes a visibility window where a concurrent
        # _snapshot() reads an empty/partial file
        tmp_path = os.path.join(
            self.meta_dir, f".v{version}-{uuid.uuid4().hex}"
        )
        with open(tmp_path, "w") as f:
            f.write(tmp)
        try:
            os.link(tmp_path, path)
        except FileExistsError:
            raise CommitConflict(
                f"version {version} already committed by another writer"
            )
        finally:
            os.unlink(tmp_path)
        hint_tmp = os.path.join(self.meta_dir, f".hint-{uuid.uuid4().hex}")
        with open(hint_tmp, "w") as f:
            f.write(str(version))
        os.replace(hint_tmp, os.path.join(self.meta_dir, _HINT))
        return version

    def _derive_schema_meta(
        self,
        parent: dict,
        schema_json: dict,
        write_names_by_id: dict[int, str],
    ) -> dict:
        """Field-id bookkeeping for an evolve append: known names keep
        their parent id, new names mint fresh ids.  Registers (deduped
        against every already-registered map) both the commit's CURRENT
        map (id -> post-rebase name, becomes the snapshot's schema_id)
        and the FILE map (id -> physical write-time name, stamps this
        commit's manifest entries).  The two differ only when a
        concurrent rename rebased in between write and commit."""
        names = [f["name"] for f in schema_json["fields"]]
        by_name = {fl["name"]: fl["id"] for fl in parent["fields"]}
        nfi = parent.get(
            "next_field_id", 1 + max(fl["id"] for fl in parent["fields"])
        )
        fields = []
        for n in names:
            if n in by_name:
                fields.append({"id": by_name[n], "name": n})
            else:
                fields.append({"id": nfi, "name": n})
                nfi += 1
        schemas = dict(parent.get("schemas") or {})

        def register(m: dict[str, str]) -> int:
            for k, v in schemas.items():
                if v == m:
                    return int(k)
            sid = max((int(k) for k in schemas), default=-1) + 1
            schemas[str(sid)] = m
            return sid

        cur_map = {str(fl["id"]): fl["name"] for fl in fields}
        file_map = {
            str(fl["id"]): write_names_by_id.get(fl["id"], fl["name"])
            for fl in fields
        }
        return {
            "fields": fields,
            "next_field_id": nfi,
            "schemas": schemas,
            "schema_id": register(cur_map),
            "file_sid": register(file_map),
        }

    # ------------------------------------------------------------- write
    def partition_spec(self, version: int | None = None) -> list[dict]:
        return self._snapshot(version).get("partition_spec") or []

    def partition_specs(self, version: int | None = None) -> list[list]:
        """Every spec this table has ever written under, index = spec_id.
        Entries record the spec_id they were written with, so evolution
        never reinterprets (or rewrites) a single old file."""
        snap = self._snapshot(version)
        if "partition_specs" in snap:
            return snap["partition_specs"]
        return [snap["partition_spec"]] if snap.get("partition_spec") else []

    def evolve_partition_spec(
        self, partition_spec: list | None
    ) -> int:
        """Change how FUTURE writes partition — a metadata-only commit
        (Iceberg partition evolution).  Existing files are untouched and
        keep pruning under the spec they were written with; new files
        cluster and prune under the new one.  Repartitioning a 100 TB
        table is one kilobyte commit, not a rewrite.  ``None`` stops
        partitioning future writes."""
        snap = self._snapshot()
        specs = list(self.partition_specs(snap["version"]))
        if partition_spec:
            spec = _normalize_spec(
                partition_spec, T.StructType.fromJson(snap["schema"])
            )
            specs.append(spec)
        else:
            spec = []
            specs.append([])
        return self._commit(
            {
                "operation": "set-partition-spec",
                "schema": snap["schema"],
                "manifests": list(snap["manifests"]),
                "partition_spec": spec,
                "partition_specs": specs,
                "default_spec_id": len(specs) - 1,
                "summary": {"spec": spec},
            },
            expected_parent=snap["version"],
        )

    # ------------------------------------------------- schema evolution
    def _require_field_ids(self, snap: dict) -> list[dict]:
        fields = snap.get("fields")
        if not fields:
            raise ValueError(
                "table predates field-id metadata; rename/drop/add need a "
                "table created by this version of the format"
            )
        return fields

    def rename_column(self, old: str, new: str, max_retries: int = 5) -> int:
        """Rename a column WITHOUT rewriting a single data file — a
        metadata-only commit (Iceberg schema evolution, field-id based).
        Old files keep their physical name and map forward through the
        field id; manifests, stats and blooms are untouched because scans
        translate filter names per entry.  Historical partition-spec
        labels are refreshed to the new name (partition values are
        positional, names are labels), so source-column pruning keeps
        working across the rename."""
        self._require_main("rename_column")
        for _ in range(max_retries):
            snap = self._snapshot()
            fields = self._require_field_ids(snap)
            names = [fl["name"] for fl in fields]
            if old not in names:
                raise ValueError(f"no column {old!r} (have {names})")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            self._refuse_constrained_column(snap, old, "rename")
            new_fields = [
                {"id": fl["id"], "name": new if fl["name"] == old else fl["name"]}
                for fl in fields
            ]
            schema_json = json.loads(json.dumps(snap["schema"]))
            for f in schema_json["fields"]:
                if f["name"] == old:
                    f["name"] = new
            schemas = dict(snap.get("schemas") or {})
            sid = max(int(k) for k in schemas) + 1
            schemas[str(sid)] = {
                str(fl["id"]): fl["name"] for fl in new_fields
            }
            commit = {
                "operation": "rename-column",
                "schema": schema_json,
                "manifests": list(snap["manifests"]),
                "fields": new_fields,
                "next_field_id": snap["next_field_id"],
                "schema_id": sid,
                "schemas": schemas,
                "summary": {"renamed": {old: new}},
            }

            def relabel(spec: list[dict]) -> list[dict]:
                return [
                    dict(s, col=new if s.get("col") == old else s["col"])
                    for s in spec
                ]

            specs = self.partition_specs(snap["version"])
            if specs:
                commit["partition_specs"] = [relabel(s) for s in specs]
                commit["partition_spec"] = relabel(
                    snap.get("partition_spec") or []
                )
                commit["default_spec_id"] = snap.get("default_spec_id", 0)
            if snap.get("bloom_cols"):
                commit["bloom_cols"] = [
                    new if c == old else c for c in snap["bloom_cols"]
                ]
            try:
                return self._commit(commit, expected_parent=snap["version"])
            except CommitConflict:
                continue
        raise CommitConflict(f"rename_column lost {max_retries} commit races")

    def drop_column(self, name: str, max_retries: int = 5) -> int:
        """Drop a column without touching data files: the field id leaves
        the schema, scans stop projecting it, and a later re-add of the
        SAME name mints a fresh id — old values never resurrect.  Refused
        while the column sources the current partition spec (evolve the
        spec first) or keys a pending MOR tombstone (compact first):
        both would leave metadata pointing at a field that no longer
        exists."""
        self._require_main("drop_column")
        for _ in range(max_retries):
            snap = self._snapshot()
            fields = self._require_field_ids(snap)
            names = [fl["name"] for fl in fields]
            if name not in names:
                raise ValueError(f"no column {name!r} (have {names})")
            if len(names) == 1:
                raise ValueError("cannot drop the last column")
            self._refuse_constrained_column(snap, name, "drop")
            for s in snap.get("partition_spec") or []:
                if s.get("col") == name:
                    raise ValueError(
                        f"{name!r} sources the current partition spec; "
                        "evolve_partition_spec first"
                    )
            for d in self.delete_entries(snap["version"]):
                dmap = _name_map_for(snap, d.get("schema_id"))
                inv = {p: c for c, p in dmap.items()} if dmap else {}
                cur = [inv.get(p, p) for p in d["cols"]]
                if name in cur:
                    raise ValueError(
                        f"{name!r} keys a pending MOR tombstone; compact "
                        "or rewrite before dropping"
                    )
            dropped_id = next(
                fl["id"] for fl in fields if fl["name"] == name
            )
            new_fields = [fl for fl in fields if fl["name"] != name]
            schema_json = json.loads(json.dumps(snap["schema"]))
            schema_json["fields"] = [
                f for f in schema_json["fields"] if f["name"] != name
            ]
            schemas = dict(snap.get("schemas") or {})
            sid = max(int(k) for k in schemas) + 1
            schemas[str(sid)] = {
                str(fl["id"]): fl["name"] for fl in new_fields
            }
            commit = {
                "operation": "drop-column",
                "schema": schema_json,
                "manifests": list(snap["manifests"]),
                "fields": new_fields,
                "next_field_id": snap["next_field_id"],
                "schema_id": sid,
                "schemas": schemas,
                "summary": {"dropped": name},
            }
            specs = self.partition_specs(snap["version"])
            if specs:
                # historical specs may label the dropped source column;
                # tombstone the label so a future re-add of the same name
                # can never be pruned against the OLD field's partition
                # values
                sentinel = f"__dropped_{dropped_id}"

                def relabel(spec: list[dict]) -> list[dict]:
                    return [
                        dict(s, col=sentinel if s.get("col") == name
                             else s["col"])
                        for s in spec
                    ]

                commit["partition_specs"] = [relabel(s) for s in specs]
                commit["partition_spec"] = relabel(
                    snap.get("partition_spec") or []
                )
                commit["default_spec_id"] = snap.get("default_spec_id", 0)
            if snap.get("bloom_cols"):
                commit["bloom_cols"] = [
                    c for c in snap["bloom_cols"] if c != name
                ]
            try:
                return self._commit(commit, expected_parent=snap["version"])
            except CommitConflict:
                continue
        raise CommitConflict(f"drop_column lost {max_retries} commit races")

    def add_column(
        self, name: str, dtype: T.DataType, max_retries: int = 5
    ) -> int:
        """Add a nullable column as a metadata-only commit: existing
        files read NULL for it (their schema id predates the field), new
        writes carry it.  Equivalent to ``append(..., evolve=True)``
        without having to write data."""
        self._require_main("add_column")
        for _ in range(max_retries):
            snap = self._snapshot()
            fields = self._require_field_ids(snap)
            names = [fl["name"] for fl in fields]
            if name in names:
                raise ValueError(f"column {name!r} already exists")
            fid = snap["next_field_id"]
            new_fields = fields + [{"id": fid, "name": name}]
            schema_json = json.loads(json.dumps(snap["schema"]))
            schema_json["fields"].append(
                T.StructField(name, dtype, True).jsonValue()
            )
            schemas = dict(snap.get("schemas") or {})
            sid = max(int(k) for k in schemas) + 1
            schemas[str(sid)] = {
                str(fl["id"]): fl["name"] for fl in new_fields
            }
            try:
                return self._commit(
                    {
                        "operation": "add-column",
                        "schema": schema_json,
                        "manifests": list(snap["manifests"]),
                        "fields": new_fields,
                        "next_field_id": fid + 1,
                        "schema_id": sid,
                        "schemas": schemas,
                        "summary": {
                            "added": {name: dtype.simpleString()}
                        },
                    },
                    expected_parent=snap["version"],
                )
            except CommitConflict:
                continue
        raise CommitConflict(f"add_column lost {max_retries} commit races")

    def widen_column_type(
        self, name: str, new_type: T.DataType, max_retries: int = 5
    ) -> int:
        """Widen a column's type WITHOUT rewriting a single data file —
        the last evolution verb (Iceberg type promotion).  Only exact-
        value promotions are allowed (:data:`_SAFE_WIDENINGS`; no
        int->float / long->double precision loss).  Old files keep their
        narrow physical type: the widen is recorded as ``(field_id,
        from, to, seq)`` in the snapshot's chronological
        ``widen_history``, so every file's physical type is derivable
        from its commit sequence number and reads cast per era.  New
        writes carry the wide type (append already casts at write).

        Refused while branches are open: branch chains mint sequence
        numbers concurrently with main, so a branch file's seq has no
        defined order against the widen's seq — the same rule publish
        applies to concurrent tombstones.  Publish or drop branches
        first."""
        self._require_main("widen_column_type")
        bdir = os.path.join(self.manifest_dir, "branches")
        open_branches = sorted(os.listdir(bdir)) if os.path.isdir(bdir) else []
        if open_branches:
            raise ValueError(
                f"widen_column_type with open branches {open_branches} "
                "could mis-type branch files (concurrent sequence "
                "numbers); publish or drop them first"
            )
        for _ in range(max_retries):
            snap = self._snapshot()
            fields = self._require_field_ids(snap)
            names = [fl["name"] for fl in fields]
            if name not in names:
                raise ValueError(f"no column {name!r} (have {names})")
            schema = T.StructType.fromJson(snap["schema"])
            cur = schema[name].dataType
            if cur.simpleString() == new_type.simpleString():
                return snap["version"]  # already that type: no-op
            if not _safe_widening(cur, new_type):
                raise ValueError(
                    f"cannot widen {name!r} {cur.simpleString()} -> "
                    f"{new_type.simpleString()}: not an exact-value "
                    "promotion"
                )
            fid = next(fl["id"] for fl in fields if fl["name"] == name)
            schema_json = json.loads(json.dumps(snap["schema"]))
            for f in schema_json["fields"]:
                if f["name"] == name:
                    f["type"] = json.loads(new_type.json())
            seq = self._seq_of(snap) + 1
            wh = list(snap.get("widen_history") or []) + [
                {
                    "field_id": fid,
                    "from": cur.simpleString(),
                    "to": new_type.simpleString(),
                    "seq": seq,
                }
            ]
            commit = {
                "operation": "widen-column",
                "schema": schema_json,
                "manifests": list(snap["manifests"]),
                "fields": fields,
                "next_field_id": snap["next_field_id"],
                "schema_id": snap.get("schema_id", 0),
                "schemas": snap.get("schemas"),
                "seq": seq,
                "widen_history": wh,
                "summary": {
                    "widened": {
                        name: [cur.simpleString(), new_type.simpleString()]
                    }
                },
            }
            try:
                return self._commit(commit, expected_parent=snap["version"])
            except CommitConflict:
                continue
        raise CommitConflict(
            f"widen_column_type lost {max_retries} commit races"
        )

    # ------------------------------------------------- CHECK constraints
    @staticmethod
    def _refuse_constrained_column(snap: dict, col: str, what: str) -> None:
        """Schema changes must not orphan a CHECK predicate: a rename or
        drop of a referenced column would leave the expression pointing
        at a name that no longer exists (constraint exprs bind by NAME,
        unlike data files which bind by field id)."""
        from .compiler import referenced_identifiers

        for cname, cexpr in (snap.get("check_constraints") or {}).items():
            refs = {i.lower() for i in referenced_identifiers(cexpr)}
            if col.lower() in refs:
                raise ValueError(
                    f"cannot {what} column {col!r}: referenced by check "
                    f"constraint {cname!r} — drop the constraint first"
                )

    def check_constraints(self, version: int | None = None) -> dict:
        """Active table CHECK constraints: name -> SQL predicate.  Every
        row-writing path (append, overwrite, MERGE, UPDATE, COW rewrites)
        enforces them on the rows it writes (Delta's ``ALTER TABLE ADD
        CONSTRAINT`` semantics): a batch with a violating row raises
        :class:`CheckConstraintViolation` and commits nothing."""
        return dict(self._snapshot(version).get("check_constraints") or {})

    def add_check_constraint(
        self,
        spark: SparkSession,
        name: str,
        expr: str,
        max_retries: int = 5,
    ) -> int:
        """Attach a CHECK constraint as a METADATA-ONLY commit — after
        first proving the EXISTING rows satisfy it (one scan; Delta does
        the same on ADD CONSTRAINT), so a reader can trust the invariant
        over the whole table, not just post-add writes.  SQL-standard
        semantics: a row violates only when the predicate is FALSE —
        NULL passes (constrain nullability with an explicit
        ``IS NOT NULL`` predicate).  The predicate is validated through
        the rule compiler's identifier whitelist (columns + a bounded SQL
        vocabulary, no ';'), the same guard user rule SQL goes through.

        This is the table-format realization of the engine's rule DAG
        for WRITE-time enforcement: the same predicate language, applied
        as a commit gate instead of a scan-time report (the reference
        runs its rules as post-hoc scoring, 02_dff_orchestration.py;
        WAP branches audit whole batches — CHECK constraints guard every
        individual write path)."""
        import re as _re

        from .compiler import validate_rule_sql

        self._require_main("add_check_constraint")
        if not _re.match(r"^[A-Za-z_][A-Za-z0-9_]*$", name):
            raise ValueError(
                f"constraint name must be an identifier, got {name!r}"
            )
        for _ in range(max_retries):
            snap = self._snapshot()
            checks = dict(snap.get("check_constraints") or {})
            if name in checks:
                raise ValueError(f"constraint {name!r} already exists")
            cols = [f["name"] for f in snap["schema"]["fields"]]
            validate_rule_sql(expr, cols)
            # prove the predicate parses AND holds on existing rows
            existing = self.scan(spark, version=snap["version"])
            n_bad = existing.where(
                ~F.coalesce(F.expr(expr), F.lit(True))
            ).count()
            if n_bad:
                raise CheckConstraintViolation({name: n_bad})
            checks[name] = expr
            commit = {
                "operation": "add-constraint",
                "schema": snap["schema"],
                "manifests": list(snap["manifests"]),
                "check_constraints": checks,
                "summary": {"added_constraint": name},
            }
            try:
                return self._commit(commit, expected_parent=snap["version"])
            except CommitConflict:
                continue  # re-validate against the mover's rows
        raise CommitConflict(
            f"add_check_constraint lost {max_retries} commit races"
        )

    def drop_check_constraint(self, name: str, max_retries: int = 5) -> int:
        """Detach a CHECK constraint (metadata-only commit)."""
        self._require_main("drop_check_constraint")
        for _ in range(max_retries):
            snap = self._snapshot()
            checks = dict(snap.get("check_constraints") or {})
            if name not in checks:
                raise ValueError(
                    f"no constraint {name!r} (have {sorted(checks)})"
                )
            del checks[name]
            commit = {
                "operation": "drop-constraint",
                "schema": snap["schema"],
                "manifests": list(snap["manifests"]),
                "check_constraints": checks,
                "summary": {"dropped_constraint": name},
            }
            try:
                return self._commit(commit, expected_parent=snap["version"])
            except CommitConflict:
                continue
        raise CommitConflict(
            f"drop_check_constraint lost {max_retries} commit races"
        )

    def _entry_partition_ok(
        self, e: dict, filters: list[tuple], specs: list[list]
    ) -> bool:
        """Partition pruning under the spec the ENTRY was written with."""
        if not specs:
            return True
        sid = e.get("spec_id", 0)
        spec = specs[sid] if 0 <= sid < len(specs) else []
        return not spec or _partition_may_match(e, filters, spec)

    def _materialize(
        self,
        df: DataFrame,
        n_files: int | None = None,
        max_rows_per_file: int | None = None,
        partitioned: bool = True,
    ) -> list[dict]:
        """Write ``df`` as immutable UUID-named parquet under ``data/``
        and return manifest entries with footer stats.  The files are
        unreferenced (invisible) until a snapshot commits them.  Under a
        partition spec the write fans out through Spark's partitioned
        writer on the TRANSFORMED values (one distributed pass — the
        shuffle clusters each partition into one task), and every entry
        records its typed partition tuple for driver-side pruning."""
        # partitioned=False marks auxiliary files (equality-delete
        # tombstones): no partition fanout, no bloom computation
        exists = self.exists(self.root)
        checks = (
            (self._snapshot().get("check_constraints") or {})
            if partitioned and exists
            else {}
        )
        obs = None
        if checks:
            # CHECK enforcement rides the write itself (CollectMetrics —
            # zero extra scans): every data-row write path funnels here,
            # so appends, MERGE outputs, UPDATE rewrites and COW
            # survivors are all gated.  SQL semantics: only FALSE
            # violates; NULL passes.  Raise happens after the stage
            # write but BEFORE any commit references the files — a
            # violating batch is invisible and gc_orphans reclaims it.
            from pyspark.sql import Observation

            obs = Observation()
            df = df.observe(
                obs,
                *[
                    F.sum(
                        (~F.coalesce(F.expr(e), F.lit(True))).cast("long")
                    ).alias(n)
                    for n, e in sorted(checks.items())
                ],
            )
        spec = self.partition_spec() if partitioned and exists else []
        bloom_cols = (
            (self._snapshot().get("bloom_cols") or [])
            if partitioned and exists
            else []
        )
        stage = os.path.join(self.root, f".stage-{uuid.uuid4().hex}")
        entries = []
        if spec:
            sid = self._snapshot().get("default_spec_id", 0)
            pts = [f"__pt_{i}" for i in range(len(spec))]
            out = df
            for name, s in zip(pts, spec):
                out = out.withColumn(name, _transform_expr(s))
            out = (
                out.repartition(*pts)
                if n_files is None
                else out.repartition(n_files, *pts)
            )
            writer = out.write.mode("overwrite")
            if max_rows_per_file:
                # caps a hot partition's file size without extra shuffles:
                # the writer rolls to a new file every N records
                writer = writer.option("maxRecordsPerFile", max_rows_per_file)
            writer.partitionBy(*pts).parquet(stage)
            found = []
            for dirpath, _, files in os.walk(stage):
                rel = os.path.relpath(dirpath, stage)
                for name in files:
                    if name.endswith(".parquet") and not name.startswith(
                        (".", "_")
                    ):
                        found.append((rel, name))
            for rel, name in sorted(found):
                part = {}
                for comp in rel.split(os.sep):
                    if "=" not in comp:
                        continue
                    k, raw = comp.split("=", 1)
                    i = int(k[len("__pt_"):])
                    part[str(i)] = _parse_pv(raw, spec[i])
                entries.extend(
                    self._move_into_data(
                        os.path.join(stage, rel, name),
                        partition=part,
                        bloom_cols=bloom_cols,
                    )
                )
            for e in entries:
                e["spec_id"] = sid
        else:
            out = df if n_files is None else df.repartition(n_files)
            writer = out.write.mode("overwrite")
            if max_rows_per_file:
                writer = writer.option("maxRecordsPerFile", max_rows_per_file)
            writer.parquet(stage)
            for name in sorted(os.listdir(stage)):
                if not name.endswith(".parquet") or name.startswith((".", "_")):
                    continue
                entries.extend(
                    self._move_into_data(
                        os.path.join(stage, name), bloom_cols=bloom_cols
                    )
                )
        shutil.rmtree(stage, ignore_errors=True)
        if obs is not None:
            got = obs.get  # write finished; metrics are final
            bad = {k: v for k, v in got.items() if v and v > 0}
            if bad:
                # staged files were already moved under data/ but no
                # snapshot references them — invisible; GC reclaims
                raise CheckConstraintViolation(bad)
        if exists:
            cur_sid = self._snapshot().get("schema_id")
            if cur_sid is not None:
                # physical column names in these files are the names
                # current NOW; the stamp lets every future reader map
                # them through renames/drops via field ids
                for e in entries:
                    e["schema_id"] = cur_sid
        return entries

    def _move_into_data(
        self,
        src: str,
        partition: dict | None = None,
        bloom_cols: list[str] | None = None,
    ) -> list[dict]:
        final = f"{uuid.uuid4().hex}.parquet"
        os.rename(src, os.path.join(self.data_dir, final))
        rows, nbytes, stats = _footer_stats(os.path.join(self.data_dir, final))
        if rows == 0:
            os.remove(os.path.join(self.data_dir, final))
            return []
        entry = {
            "path": f"data/{final}",
            "rows": rows,
            "bytes": nbytes,
            "stats": stats,
        }
        if partition:
            entry["partition"] = partition
        if bloom_cols:
            import pyarrow.parquet as pq

            fpath = os.path.join(self.data_dir, final)
            present = [
                c
                for c in bloom_cols
                if c in pq.ParquetFile(fpath).schema_arrow.names
            ]
            if present:
                cols = pq.read_table(fpath, columns=present)
                entry["blooms"] = {
                    c: _bloom_build(cols.column(c).to_pylist(), rows)
                    for c in present
                }
        return [entry]

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
        src_types = {f.name: f.dataType for f in df.schema.fields}
        cols = []
        for f in fields:
            if f.name not in have:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
                continue
            st = src_types[f.name]
            # simpleString ignores nullability flags (valueContainsNull /
            # containsNull / nested nullable) — advisory in Spark, and a
            # mismatch there must not be treated as a type change
            if st == f.dataType or (
                st.simpleString() == f.dataType.simpleString()
            ):
                cols.append(F.col(f.name))
            elif _safe_widening(st, f.dataType):
                # exact-value promotion (Iceberg's type-promotion set,
                # extended to exact integer->float cases): cast at write
                # so every data file carries the table's physical type
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
            else:
                raise ValueError(
                    f"column {f.name!r}: source type {st.simpleString()} "
                    f"does not safely widen to table type "
                    f"{f.dataType.simpleString()}; cast explicitly"
                )
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
        max_rows_per_file: int | None = None,
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
        base_names = {f.name for f in self.schema().fields}
        aligned, schema_json = self._aligned(df, evolve)
        added_fields = [
            fd for fd in schema_json["fields"] if fd["name"] not in base_names
        ]
        # Physical column names in the files about to be written = the
        # names current NOW (pre-existing fields) + the evolve-added
        # names.  Captured BEFORE materialize so a commit-race rebase
        # (which may pick up a concurrent rename) still stamps the files
        # with the map describing what is physically inside them.
        write_names_by_id = {
            fl["id"]: fl["name"]
            for fl in (self._snapshot().get("fields") or [])
        }
        enforced_checks = self._snapshot().get("check_constraints") or {}
        entries = self._materialize(aligned, n_files, max_rows_per_file)
        summary = {
            "added_files": len(entries),
            "added_rows": sum(e["rows"] for e in entries),
        }
        if idempotency_key is not None:
            summary["idempotency_key"] = idempotency_key
        manifest = None
        stamped_seq = None
        stamped_sid = None
        for _ in range(max_retries):
            snap = self._snapshot()
            if not (
                set((snap.get("check_constraints") or {}).items())
                <= set(enforced_checks.items())
            ):
                # a constraint landed AFTER this batch was validated: the
                # written rows never faced the new gate, so rebasing them
                # in would smuggle unchecked rows past it.  (A concurrent
                # DROP is fine — the batch passed a superset.)  The caller
                # re-runs the append, now enforcing the tip's set.
                raise CommitConflict(
                    "check constraints changed concurrently; the written "
                    "batch was not validated against them — retry the write"
                )
            # rebase the commit schema onto the CURRENT tip: a concurrent
            # rename/drop must not be reverted by replaying names aligned
            # against the old tip.  The data files are untouched — their
            # schema-id stamp maps the write-time physical names forward.
            tip_names = {f["name"] for f in snap["schema"]["fields"]}
            schema_json = dict(
                snap["schema"],
                fields=list(snap["schema"]["fields"])
                + [fd for fd in added_fields if fd["name"] not in tip_names],
            )
            seq = self._seq_of(snap) + 1
            # Evolve appends mint field ids for the added columns at
            # commit time — derive them HERE (not in _commit) so the
            # manifest entries can be stamped with a schema id whose map
            # actually covers the new columns; otherwise the new files'
            # added column would read NULL (its id absent from the
            # write-time map).
            meta = (
                self._derive_schema_meta(
                    snap, schema_json, write_names_by_id
                )
                if added_fields and snap.get("fields")
                else None
            )
            file_sid = meta["file_sid"] if meta else None
            if entries and (seq != stamped_seq or file_sid != stamped_sid):
                # re-seq after a lost race: the manifest (cheap JSON) is
                # rewritten so these files sort AFTER the commit that won
                # — a concurrent MOR delete must not claim rows it never
                # saw.  Data files are untouched; stale manifests are GC'd.
                for e in entries:
                    e["seq"] = seq
                    if file_sid is not None:
                        e["schema_id"] = file_sid
                manifest = self._write_manifest(entries)
                stamped_seq = seq
                stamped_sid = file_sid
            manifests = list(snap["manifests"])
            if manifest:
                manifests.append(manifest)
            commit_snap = {
                "operation": "append",
                "schema": schema_json,
                "manifests": manifests,
                "seq": seq,
                "summary": summary,
            }
            if meta:
                commit_snap.update(
                    fields=meta["fields"],
                    next_field_id=meta["next_field_id"],
                    schemas=meta["schemas"],
                    schema_id=meta["schema_id"],
                )
            try:
                return self._commit(
                    commit_snap, expected_parent=snap["version"]
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
        snap = self._snapshot()
        seq = self._seq_of(snap) + 1
        for e in entries:
            e["seq"] = seq
        manifests = [self._write_manifest(entries)] if entries else []
        return self._commit(
            {
                "operation": "overwrite",
                "schema": schema_json,
                "manifests": manifests,
                "seq": seq,
                "delete_manifests": [],  # the replaced rows take any
                # pending tombstones with them
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
        entries = self._plan_entries(spark, snap, filters)
        return self._read_with_deletes(
            spark,
            entries,
            schema,
            self.delete_entries(snap["version"]),
            filters=filters,
            snap=snap,
        )

    def _manifest_bytes(self, snap: dict) -> int:
        total = 0
        for m in snap["manifests"]:
            try:
                total += os.path.getsize(os.path.join(self.manifest_dir, m))
            except OSError:
                pass
        return total

    def _plan_entries(
        self,
        spark: SparkSession | None,
        snap: dict,
        filters: list[tuple] | None,
    ) -> list[dict]:
        """Pruned entry list for a snapshot — AUTO-routed (r6, VERDICT
        r05 #2): below ``DFF_DISTPLAN_MIN_MANIFEST_BYTES`` of manifest
        JSON (~10k entries at default 4 MB) the driver loop runs as
        before; above it, pruning goes through
        :meth:`plan_files_distributed` so the per-entry stat evaluation
        is a parallel Catalyst job and the driver only materializes the
        SURVIVING entries.  The two paths keep bit-parity (pinned by
        test_distplan + the auto-path test); unfiltered scans need every
        entry on the driver anyway and always use the loop."""
        if (
            filters
            and spark is not None
            and self._manifest_bytes(snap) >= _DISTPLAN_MIN_MANIFEST_BYTES
        ):
            return self.plan_files_distributed(
                spark, filters, snap["version"]
            )
        entries = self.entries(snap["version"])
        if filters:
            specs = self.partition_specs(snap["version"])
            entries = self._keep_under_filters(snap, entries, filters, specs)
        return entries

    def _keep_under_filters(
        self,
        snap: dict,
        entries: list[dict],
        filters: list[tuple],
        specs: list[list],
    ) -> list[dict]:
        """Manifest pruning with per-entry name translation: stats and
        blooms are keyed by the PHYSICAL (write-time) names, so filters
        on current names map through each entry's schema id; partition
        specs are kept relabelled to current names on rename, so they
        take the filters untranslated.  An entry whose file physically
        lacks a filtered field is pruned outright (all ops are
        NULL-rejecting)."""
        known = {fl["name"] for fl in (snap.get("fields") or [])}
        maps: dict = {}
        out = []
        for e in entries:
            sid = e.get("schema_id")
            if sid not in maps:
                maps[sid] = _name_map_for(snap, sid)
            pf = _phys_filters(filters, maps[sid], known)
            if pf is None:
                continue
            if (
                _may_match(e, pf)
                and _bloom_may_match(e, pf)
                and self._entry_partition_ok(e, filters, specs)
            ):
                out.append(e)
        return out

    def _read_with_deletes(
        self,
        spark: SparkSession,
        entries: list[dict],
        schema: T.StructType,
        deletes: list[dict],
        filters: list[tuple] | None = None,
        snap: dict | None = None,
    ) -> DataFrame:
        """Read data entries with pending equality deletes applied.  A
        delete file applies to a data file iff the data file's sequence
        number is strictly LOWER (rows appended after the delete survive).
        Entries are grouped by (applicable-delete subset, write-time
        schema id) — in steady state one group — and each group anti-joins
        the union of its delete files per key-column tuple, broadcast
        while the tombstones are small (they are bounded by churn, not
        table size).

        ``snap`` (when given) carries field-id metadata: each group is
        read under its PHYSICAL write-time column names and projected to
        the current names via field ids, so files written before a rename
        keep reading, files written before a column existed read NULL for
        it, and a dropped-then-re-added column never resurrects old data.
        Tombstone key columns map the same way."""
        if not entries:
            return spark.createDataFrame([], schema)
        groups: dict[tuple, list[dict]] = {}
        for e in entries:
            applicable = tuple(
                i
                for i, d in enumerate(deletes)
                if e.get("seq", 0) < d["seq"]
            )
            # widened fields split read groups by era: each group reads
            # its files under their physical write-time types and casts
            pt = tuple(
                sorted(_phys_type_overrides(snap, e.get("seq", 0)).items())
            )
            groups.setdefault(
                (applicable, e.get("schema_id"), pt), []
            ).append(e)
        ident = {f.name: f.name for f in schema.fields}
        ids_by_name = (
            {fl["name"]: fl["id"] for fl in (snap.get("fields") or [])}
            if snap
            else {}
        )
        out = None
        for (applicable, sid, pt), es in groups.items():
            overrides = dict(pt)
            nmap = _name_map_for(snap, sid)
            paths = [os.path.join(self.root, e["path"]) for e in es]
            if (nmap is None or nmap == ident) and not overrides:
                df = spark.read.schema(schema).parquet(*paths)
            else:
                names = nmap if nmap is not None else ident
                read_fields, proj = [], []
                for f in schema.fields:
                    pn = names.get(f.name)
                    if pn is None:
                        proj.append(
                            F.lit(None).cast(f.dataType).alias(f.name)
                        )
                        continue
                    fid = ids_by_name.get(f.name)
                    tp = (
                        _ATOMIC_TYPES[overrides[fid]]
                        if fid in overrides
                        else f.dataType
                    )
                    read_fields.append(T.StructField(pn, tp, True))
                    col = F.col(pn)
                    if tp != f.dataType:
                        col = col.cast(f.dataType)
                    proj.append(col.alias(f.name))
                df = (
                    spark.read.schema(T.StructType(read_fields))
                    .parquet(*paths)
                    .select(*proj)
                )
            if filters:
                df = df.where(_filters_to_column(filters))
            bycols: dict[tuple, list[dict]] = {}
            for i in applicable:
                bycols.setdefault(
                    (deletes[i].get("schema_id"), tuple(deletes[i]["cols"])),
                    [],
                ).append(deletes[i])
            for (dsid, cols), ds in bycols.items():
                dmap = _name_map_for(snap, dsid)
                if dmap is None:
                    cur_cols = list(cols)
                    sel = [F.col(c) for c in cols]
                else:
                    inv = {p: c for c, p in dmap.items()}
                    missing = [p for p in cols if p not in inv]
                    if missing:
                        raise RuntimeError(
                            f"pending delete file keys on column(s) "
                            f"{missing} that were dropped from the schema; "
                            "compact or apply tombstones before dropping"
                        )
                    cur_cols = [inv[p] for p in cols]
                    sel = [F.col(p).alias(inv[p]) for p in cols]
                dk = (
                    spark.read.parquet(
                        *[os.path.join(self.root, d["path"]) for d in ds]
                    )
                    .select(*sel)
                    .distinct()
                )
                if sum(d["bytes"] for d in ds) < (32 << 20):
                    dk = F.broadcast(dk)
                df = df.join(dk, cur_cols, "left_anti")
            out = df if out is None else out.unionByName(df)
        return out

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
        return self._read_with_deletes(
            spark,
            entries,
            schema,
            self.delete_entries(snap["version"]),
            snap=snap,
        )

    def scan_changes(
        self,
        spark: SparkSession,
        since_version: int,
        until_version: int | None = None,
    ) -> DataFrame:
        """Change-data-feed read: every row-level change committed in
        ``(since_version, until_version]``, as the table's current
        columns plus ``_change_type`` ('insert' / 'delete' /
        'update_preimage' / 'update_postimage') and ``_commit_version``
        — the CDC primitive that turns a downstream pipeline incremental
        even across deletes and updates (``scan_added`` only sees new
        files).

        Where each op's changes come from:

        - **append / publish**: inserts derive from the added data files
          — no extra storage, ever.
        - **COW delete / update / merge**: read from the change files the
          commit materialized (requires ``change_feed=True`` at create;
          raises otherwise — rewritten files mix changed and carried
          rows, so changes are not derivable after the fact).
        - **MOR delete / merge**: deletes compute ON READ — the prior
          snapshot is manifest-pruned by the tombstone files' own key
          stats, read, and semi-joined against the keys; MOR merge
          therefore surfaces as delete + insert (state-equivalent to the
          COW merge's update pre/post pair).
        - **overwrite**: prior snapshot as deletes, new snapshot as
          inserts.
        - layout/metadata ops (compact, optimize, schema/spec changes):
          no row changes, skipped.  **rollback** in range raises — its
          inverse-change semantics are ambiguous; consumers should
          re-sync from a fresh snapshot.
        """
        snap_u = self._snapshot(until_version)
        until = snap_u["version"]
        if since_version > until:
            raise ValueError(f"since {since_version} > until {until}")
        schema = T.StructType.fromJson(snap_u["schema"])
        specs = self.partition_specs(until)

        def with_meta(df: DataFrame, ctype: str, v: int) -> DataFrame:
            return df.select(
                *[F.col(f.name) for f in schema.fields],
                F.lit(ctype).alias("_change_type"),
                F.lit(v).cast("long").alias("_commit_version"),
            )

        parts: list[DataFrame] = []
        prev_entries = self.entries(since_version)
        prev_dels = self.delete_entries(since_version)
        _SKIP = {
            "create", "branch", "compact", "optimize", "rewrite-manifests",
            "rename-column", "drop-column", "add-column", "widen-column",
            "set-partition-spec", "tag", "drop-tag",
            "add-constraint", "drop-constraint",
        }
        for v in range(since_version + 1, until + 1):
            s = self._snapshot(v)  # FileNotFoundError when expired
            op = s["operation"]
            cur_entries = self.entries(v)
            cur_dels = self.delete_entries(v)
            if op == "rollback":
                raise ValueError(
                    f"v{v} is a rollback: its change semantics are "
                    "ambiguous; re-sync from a fresh snapshot instead"
                )
            if op in ("delete", "update", "merge"):
                if not s.get("change_feed"):
                    raise ValueError(
                        f"v{v} ({op}) carries no change data — create the "
                        "table with change_feed=True to read CDC across "
                        "copy-on-write commits"
                    )
                by_type: dict[str, list[dict]] = {}
                for e in self.change_entries(v):
                    by_type.setdefault(e["change_type"], []).append(e)
                for ctype, es in sorted(by_type.items()):
                    parts.append(
                        with_meta(
                            self._read_with_deletes(
                                spark, es, schema, [], snap=snap_u
                            ),
                            ctype,
                            v,
                        )
                    )
            elif op == "overwrite":
                if prev_entries:
                    parts.append(
                        with_meta(
                            self._read_with_deletes(
                                spark, prev_entries, schema, prev_dels,
                                snap=snap_u,
                            ),
                            "delete",
                            v,
                        )
                    )
                if cur_entries:
                    parts.append(
                        with_meta(
                            self._read_with_deletes(
                                spark, cur_entries, schema, [], snap=snap_u
                            ),
                            "insert",
                            v,
                        )
                    )
            elif op not in _SKIP:
                # append / publish / merge-mor / mor-delete: derive
                seen = {e["path"] for e in prev_entries}
                added = [e for e in cur_entries if e["path"] not in seen]
                dseen = {d["path"] for d in prev_dels}
                new_dels = [d for d in cur_dels if d["path"] not in dseen]
                if added:
                    parts.append(
                        with_meta(
                            self._read_with_deletes(
                                spark, added, schema, [], snap=snap_u
                            ),
                            "insert",
                            v,
                        )
                    )
                for d in new_dels:
                    # current names for the tombstone's physical key cols
                    dmap = _name_map_for(snap_u, d.get("schema_id"))
                    inv = {p: c for c, p in dmap.items()} if dmap else {}
                    cur_cols = [inv.get(p, p) for p in d["cols"]]
                    missing = [c for c in cur_cols if c not in
                               {f.name for f in schema.fields}]
                    if missing:
                        raise RuntimeError(
                            f"v{v} tombstone keys on dropped column(s) "
                            f"{missing}"
                        )
                    # manifest-prune the prior snapshot by the tombstone
                    # file's OWN key stats: at 100 TB a daily delete's
                    # pre-images read the overlapping files, not the table
                    st = d.get("stats") or {}
                    filters = [
                        (c, "between", (st[p]["min"], st[p]["max"]))
                        for c, p in zip(cur_cols, d["cols"])
                        if p in st and st[p]["min"] is not None
                    ]
                    pruned = (
                        self._keep_under_filters(
                            snap_u, prev_entries, filters, specs
                        )
                        if filters
                        else prev_entries
                    )
                    if not pruned:
                        continue
                    base = self._read_with_deletes(
                        spark, pruned, schema, prev_dels, snap=snap_u
                    )
                    dk = (
                        spark.read.parquet(
                            os.path.join(self.root, d["path"])
                        )
                        .select(
                            *[
                                F.col(p).alias(c)
                                for p, c in zip(d["cols"], cur_cols)
                            ]
                        )
                        .distinct()
                    )
                    parts.append(
                        with_meta(
                            base.join(F.broadcast(dk), cur_cols, "left_semi"),
                            "delete",
                            v,
                        )
                    )
            prev_entries = cur_entries
            prev_dels = cur_dels
        meta_fields = schema.fields + [
            T.StructField("_change_type", T.StringType(), False),
            T.StructField("_commit_version", T.LongType(), False),
        ]
        if not parts:
            return spark.createDataFrame([], T.StructType(meta_fields))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def files_df(
        self, spark: SparkSession, version: int | None = None
    ) -> DataFrame:
        """The ``.files`` metadata table (Iceberg parity): one row per
        live data file with path/rows/bytes/seq/spec_id — built from the
        manifest JSONs by Spark, so inspecting a 10^9-file table is a
        distributed job, not a driver loop.  Stats and partition tuples
        stay queryable as nested columns when present."""
        snap = self._snapshot(version)
        if not snap["manifests"]:
            return spark.createDataFrame(
                [], "path string, rows long, bytes long"
            )
        return (
            spark.read.json(
                [
                    os.path.join(self.manifest_dir, m)
                    for m in snap["manifests"]
                ]
            )
            .select(F.explode("entries").alias("e"))
            .select("e.*")
        )

    def snapshots_df(self, spark: SparkSession) -> DataFrame:
        """The ``.snapshots`` metadata table: version/operation/commit
        time/summary for every retained snapshot.  Driver-side O(retained
        snapshots) — retention (``expire_snapshots``) bounds it."""
        rows = [
            (
                h["version"],
                h["operation"],
                float(h["ts"]),
                json.dumps(h.get("summary", {}), sort_keys=True),
            )
            for h in self.history()
        ]
        return spark.createDataFrame(
            rows, "version long, operation string, ts double, summary string"
        )

    def plan_files_distributed(
        self,
        spark: SparkSession,
        filters: list[tuple] | None = None,
        version: int | None = None,
    ) -> list[dict]:
        """Manifest pruning as a DISTRIBUTED job: the same keep-or-prune
        decision as the driver loop (``_may_match``, bit-identical
        semantics — parity pinned by tests), but evaluated by Catalyst
        over the manifest JSONs.  The driver loop is O(total files) in
        Python — fine at thousands of files, hours at the 10^9 files a
        100 TB table carries; here each manifest fragment is one input
        row, the stat predicate runs JVM-side in parallel, and the driver
        only ever materializes the SURVIVING entries (bounded by the
        files the query will actually open, which any scan pays anyway).
        Returns entry dicts with path/rows/bytes.

        Partition-transform pruning is applied driver-side to the
        survivors (cheap: the stat filter has already done the heavy
        cut); a file with no stats for a filtered column is kept — never
        prune on ignorance."""
        snap = self._snapshot(version)
        names = snap["manifests"]
        if not names:
            return []
        df = (
            spark.read.json(
                [os.path.join(self.manifest_dir, m) for m in names]
            )
            .select(F.explode("entries").alias("e"))
            .select("e.*")
        )
        if filters:
            stats_fields = set()
            if "stats" in df.columns and isinstance(
                df.schema["stats"].dataType, T.StructType
            ):
                stats_fields = {
                    f.name for f in df.schema["stats"].dataType.fields
                }

            def keep_pred(fs: list[tuple]) -> Column:
                # same keep-or-prune decision as _may_match, one Column
                pred = F.lit(True)
                for col, op, val in fs:
                    if col not in stats_fields:
                        continue  # no stats anywhere -> can't prune on it
                    s = F.col("stats").getField(col)
                    lo, hi, nulls = (
                        s.getField("min"),
                        s.getField("max"),
                        s.getField("nulls"),
                    )
                    if op == "=":
                        base = (lo <= F.lit(val)) & (hi >= F.lit(val))
                    elif op == "<":
                        base = lo < F.lit(val)
                    elif op == "<=":
                        base = lo <= F.lit(val)
                    elif op == ">":
                        base = hi > F.lit(val)
                    elif op == ">=":
                        base = hi >= F.lit(val)
                    elif op == "in":
                        base = F.lit(False)
                        for v in val:
                            base = base | (
                                (lo <= F.lit(v)) & (hi >= F.lit(v))
                            )
                    elif op == "between":
                        base = (hi >= F.lit(val[0])) & (lo <= F.lit(val[1]))
                    else:
                        continue
                    keep = (
                        F.when(nulls == F.col("rows"), F.lit(False))
                        .when(lo.isNull() | hi.isNull(), F.lit(True))
                        .otherwise(base)
                    )
                    pred = pred & F.coalesce(keep, F.lit(True))
                return pred

            schemas = snap.get("schemas") or {}
            maps = {
                int(k): _name_map_for(snap, int(k)) for k in schemas
            }
            uniform = len(
                {tuple(sorted(m.items())) for m in maps.values() if m}
            ) <= 1
            if uniform or "schema_id" not in df.columns:
                # no rename/drop ever happened (or pre-field-id
                # manifests): one stats namespace, one predicate
                df = df.where(keep_pred(filters))
            else:
                # stats are keyed by write-time names: evaluate the same
                # predicate per schema id with translated column names;
                # unknown/unstamped schema ids are never pruned
                known = {fl["name"] for fl in (snap.get("fields") or [])}
                sid_col = F.col("schema_id")
                keep = ~sid_col.isin(list(maps))
                for sid, nmap in maps.items():
                    pf = _phys_filters(filters, nmap, known)
                    if pf is None:
                        continue  # filtered field absent in these files
                    keep = keep | ((sid_col == F.lit(sid)) & keep_pred(pf))
                df = df.where(sid_col.isNull() | keep)
        cols = [
            c
            for c in (
                "path", "rows", "bytes", "seq", "partition", "spec_id",
                "schema_id", "blooms",
            )
            if c in df.columns
        ]
        out = [r.asDict(recursive=True) for r in df.select(*cols).collect()]
        if filters:
            specs = self.partition_specs(snap["version"])
            if specs:
                out = [
                    e
                    for e in out
                    if e.get("partition") is None
                    or self._entry_partition_ok(
                        {k: v for k, v in e.items() if v is not None},
                        filters,
                        specs,
                    )
                ]
            # blooms probe driver-side over the already-thinned survivors
            # (bounded), keeping bit-parity with the driver loop; bloom
            # keys are write-time names, so translate per entry
            known = {fl["name"] for fl in (snap.get("fields") or [])}
            bmaps: dict = {}
            kept = []
            for e in out:
                sid = e.get("schema_id")
                if sid not in bmaps:
                    bmaps[sid] = _name_map_for(snap, sid)
                pf = _phys_filters(filters, bmaps[sid], known)
                if pf is None:
                    continue
                if _bloom_may_match(
                    {"blooms": {
                        c: b for c, b in (e.get("blooms") or {}).items()
                        if b is not None
                    }},
                    pf,
                ):
                    kept.append(e)
            out = kept
        return out

    def scan_file_count(
        self, filters: list[tuple] | None = None, version: int | None = None
    ) -> int:
        """How many files a scan would open — the pruning measurement.
        Auto-routes through the distributed planner above the manifest
        threshold when a session is active (see :meth:`_plan_entries`)."""
        snap = self._snapshot(version)
        spark = SparkSession.getActiveSession()
        return len(self._plan_entries(spark, snap, filters))

    # -------------------------------------------------- rewriting commits
    def _split_entries(
        self,
        filters: list[tuple],
        version: int,
        spark: SparkSession | None = None,
    ) -> tuple[list[dict], list[dict]]:
        snap = self._snapshot(version)
        entries = self.entries(version)
        # the PRUNING decision (the O(total files) Python stat loop) auto-
        # routes through the distributed planner; ``keep`` — every entry a
        # COW commit carries by reference — is needed driver-side
        # regardless (it is written into the new manifest), and the
        # memoized manifest cache makes that re-read cheap.
        hit = self._plan_entries(
            spark or SparkSession.getActiveSession(), snap, filters
        )
        paths = {e["path"] for e in hit}
        keep = [e for e in entries if e["path"] not in paths]
        return hit, keep

    def _capture_changes(
        self, parts: list[tuple[DataFrame, str]], seq: int
    ) -> str | None:
        """Materialize CDC rows as change files — ``parts`` is a list of
        ``(frame, change_type)`` — and return the manifest name (None
        when every frame is empty).  Change files are invisible to scans
        (only :meth:`scan_changes` reads them) but are GC-protected like
        data files."""
        entries = []
        for df, ctype in parts:
            es = self._materialize(df, partitioned=False)
            for e in es:
                e["change_type"] = ctype
                e["seq"] = seq
            entries.extend(es)
        return self._write_manifest(entries) if entries else None

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
        deletes = self.delete_entries(snap["version"])
        seq = self._seq_of(snap) + 1
        # DELETE removes rows where the predicate is TRUE; NULL-predicate
        # rows (e.g. NULL in the filter column) survive — same semantics
        # as ANSI DELETE WHERE and the manifest-level _may_match pruning
        # (an all-NULL file is carried by reference, i.e. kept).  Pending
        # MOR deletes are applied to the rewritten rows (the new files get
        # a NEWER sequence, so the old tombstones would stop covering
        # them — dropping the rows now prevents resurrection).
        pred = _filters_to_column(filters)
        rows = self._read_with_deletes(spark, hit, schema, deletes, snap=snap)
        survivors = rows.where(~F.coalesce(pred, F.lit(False)))
        new_entries = self._materialize(survivors)
        for e in new_entries:
            e["seq"] = seq
        change_manifest = None
        if snap.get("change_feed"):
            change_manifest = self._capture_changes(
                [(rows.where(F.coalesce(pred, F.lit(False))), "delete")], seq
            )
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
                **(
                    {"change_manifest": change_manifest}
                    if change_manifest
                    else {}
                ),
                "seq": seq,
                "delete_manifests": self._live_delete_manifests(
                    keep + new_entries, snap.get("delete_manifests", [])
                ),
                "summary": {
                    "rewritten_files": len(hit),
                    "carried_files": len(keep),
                },
            },
            expected_parent=snap["version"],
        )

    def update_where(
        self,
        spark: SparkSession,
        filters: list[tuple],
        assignments: dict[str, "Column | str"],
    ) -> int:
        """Copy-on-write ``UPDATE ... SET ... WHERE``: rewrite ONLY the
        files whose stats overlap the predicate, applying ``assignments``
        (column -> Column or SQL expression string, evaluated over the
        row's current values) to the rows where the predicate is TRUE;
        NULL-predicate rows keep their values (ANSI WHERE semantics).
        Assigned expressions are cast to the column's existing type —
        UPDATE never changes the schema.  Every other file is carried by
        reference; one atomic snapshot commit swaps the file set.  At
        100 TB the cost is proportional to the stat-overlapping files
        (a point fix on a clustered key rewrites ~1 file), not the
        table."""
        snap = self._snapshot()
        schema = T.StructType.fromJson(snap["schema"])
        by_name = {f.name: f for f in schema.fields}
        unknown = set(assignments) - set(by_name)
        if unknown:
            raise ValueError(f"no such column(s): {sorted(unknown)}")
        hit, keep = self._split_entries(filters, snap["version"])
        if not hit:
            return snap["version"]  # predicate provably matches nothing
        deletes = self.delete_entries(snap["version"])
        seq = self._seq_of(snap) + 1
        pred = F.coalesce(_filters_to_column(filters), F.lit(False))
        rows = self._read_with_deletes(spark, hit, schema, deletes, snap=snap)
        cols = []
        for f in schema.fields:
            if f.name in assignments:
                a = assignments[f.name]
                expr = F.expr(a) if isinstance(a, str) else a
                cols.append(
                    F.when(pred, expr.cast(f.dataType))
                    .otherwise(F.col(f.name))
                    .alias(f.name)
                )
            else:
                cols.append(F.col(f.name))
        new_entries = self._materialize(rows.select(*cols))
        for e in new_entries:
            e["seq"] = seq
        change_manifest = None
        if snap.get("change_feed"):
            change_manifest = self._capture_changes(
                [
                    (rows.where(pred), "update_preimage"),
                    # filter BEFORE transforming: the SET may rewrite the
                    # predicate's own column
                    (rows.where(pred).select(*cols), "update_postimage"),
                ],
                seq,
            )
        manifests = []
        if keep:
            manifests.append(self._write_manifest(keep))
        if new_entries:
            manifests.append(self._write_manifest(new_entries))
        return self._commit(
            {
                "operation": "update",
                "schema": snap["schema"],
                "manifests": manifests,
                **(
                    {"change_manifest": change_manifest}
                    if change_manifest
                    else {}
                ),
                "seq": seq,
                "delete_manifests": self._live_delete_manifests(
                    keep + new_entries, snap.get("delete_manifests", [])
                ),
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
        mode: str = "cow",
        idempotency_key: str | None = None,
        matched_condition: str | None = None,
        matched_delete_condition: str | None = None,
        not_matched_condition: str | None = None,
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
        commits raise :class:`CommitConflict`.

        ``mode="mor"`` is the merge-on-read realization: the source keys
        become an equality-delete file and the source rows append — the
        TARGET IS NEVER READ, so a daily upsert into a 100 TB table costs
        O(batch) regardless of how many files the keys overlap.  Readers
        pay a broadcast anti-join until :meth:`compact` folds the
        tombstones in.  Row-level semantics are identical to COW (pinned
        by tests); MOR merges are additive, so lost commit races rebase
        and retry like appends instead of raising.

        Conditional clauses (the full Delta/Iceberg MERGE surface):
        ``matched_condition`` — SQL over aliases ``t`` (target) and ``s``
        (source); a matched row updates only when it is TRUE, otherwise
        the target row survives unchanged.  ``matched_delete_condition``
        — matched rows satisfying it are DELETED (checked before the
        update condition, like Delta's clause ordering).
        ``not_matched_condition`` — SQL over the source row (alias
        ``s``); unmatched source rows insert only when TRUE.  A NULL
        condition counts as not-satisfied (Delta semantics).  Conditions
        require reading the matched rows, so they are COW-only —
        ``mode="mor"`` never reads the target and raises."""
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        if mode not in ("cow", "mor"):
            raise ValueError(f"mode must be 'cow' or 'mor', got {mode!r}")
        conditional = any(
            c is not None
            for c in (
                matched_condition,
                matched_delete_condition,
                not_matched_condition,
            )
        )
        if conditional and mode == "mor":
            raise ValueError(
                "conditional MERGE clauses require reading the matched "
                "rows; mode='mor' never reads the target — use mode='cow'"
            )
        if idempotency_key is not None:
            v = self.committed_version_for(idempotency_key)
            if v is not None:
                return v  # this delivery already merged: no-op replay
        if mode == "mor":
            return self._merge_upsert_mor(
                spark,
                source,
                key_cols,
                evolve,
                check_unique_keys,
                idempotency_key=idempotency_key,
            )
        snap = self._snapshot()
        aligned_src, schema_json = self._aligned(source, evolve)
        merged_fields = T.StructType.fromJson(schema_json).fields
        # evolve-added columns are physically present in every file this
        # merge writes (rewritten survivors read them as NULL, source
        # rows carry values) — mint their field ids NOW and stamp the new
        # entries, or the added column would read NULL everywhere (its id
        # absent from the pre-commit schema map)
        grew = len(merged_fields) > len(snap["schema"]["fields"])
        meta = (
            self._derive_schema_meta(
                snap,
                schema_json,
                {fl["id"]: fl["name"] for fl in snap["fields"]},
            )
            if grew and snap.get("fields")
            else None
        )
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
        seq = self._seq_of(snap) + 1
        new_entries: list[dict] = []
        target_hit = None
        change_parts: list[tuple[DataFrame, str]] = []
        cdc = bool(snap.get("change_feed"))
        if hit:
            target_hit = self._read_with_deletes(
                spark,
                hit,
                old_schema,
                self.delete_entries(snap["version"]),
                snap=snap,
            )
            if not conditional:
                # update-all fast path: matched target rows are simply
                # replaced, so an anti-join (broadcast source keys) drops
                # them and the whole source appends below
                survivors = target_hit.join(
                    aligned_src.select(*key_cols).distinct(),
                    key_cols,
                    "left_anti",
                ).select(*pad)
                new_entries.extend(self._materialize(survivors))
                if cdc:
                    hit_keys = target_hit.select(*key_cols).distinct()
                    change_parts += [
                        (
                            target_hit.join(
                                aligned_src.select(*key_cols).distinct(),
                                key_cols,
                                "left_semi",
                            ).select(*pad),
                            "update_preimage",
                        ),
                        (
                            aligned_src.join(
                                hit_keys, key_cols, "left_semi"
                            ),
                            "update_postimage",
                        ),
                    ]
            else:
                # per-row outcome needs the matched PAIR: broadcast the
                # (small) source onto the hit rows only — carried files
                # never join.  NULL keys never match (equality join).
                t = target_hit.select(*pad).alias("t")
                s = F.broadcast(
                    aligned_src.withColumn("__s_present", F.lit(True))
                ).alias("s")
                on = None
                for k in key_cols:
                    c = F.col(f"t.{k}") == F.col(f"s.{k}")
                    on = c if on is None else (on & c)
                j = t.join(s, on, "left")
                matched = F.col("s.__s_present").isNotNull()
                dele = matched & (
                    F.coalesce(
                        F.expr(matched_delete_condition), F.lit(False)
                    )
                    if matched_delete_condition
                    else F.lit(False)
                )
                upd = (
                    matched
                    & ~dele
                    & (
                        F.coalesce(F.expr(matched_condition), F.lit(False))
                        if matched_condition
                        else F.lit(True)
                    )
                )
                out_cols = [
                    F.when(upd, F.col(f"s.{f.name}"))
                    .otherwise(F.col(f"t.{f.name}"))
                    .alias(f.name)
                    for f in merged_fields
                ]
                new_entries.extend(
                    self._materialize(j.where(~dele).select(*out_cols))
                )
                if cdc:
                    t_cols = [
                        F.col(f"t.{f.name}").alias(f.name)
                        for f in merged_fields
                    ]
                    s_cols = [
                        F.col(f"s.{f.name}").alias(f.name)
                        for f in merged_fields
                    ]
                    change_parts += [
                        (j.where(upd).select(*t_cols), "update_preimage"),
                        (j.where(upd).select(*s_cols), "update_postimage"),
                        (j.where(dele).select(*t_cols), "delete"),
                    ]
        elif evolve and len(merged_fields) > len(old_schema.fields):
            # schema grew but no files rewrite: carried files simply read
            # NULL for the new columns via the snapshot schema
            pass
        if not conditional:
            new_entries.extend(self._materialize(aligned_src))
            if cdc:
                ins = aligned_src
                if target_hit is not None:
                    ins = ins.join(
                        target_hit.select(*key_cols).distinct(),
                        key_cols,
                        "left_anti",
                    )
                change_parts.append((ins, "insert"))
        else:
            # inserts = source keys matching NO target row among the hit
            # files (bounds pruning guarantees no match hides in a
            # carried file), optionally gated by the insert condition
            ins = aligned_src
            if target_hit is not None:
                ins = ins.join(
                    target_hit.select(*key_cols).distinct(),
                    key_cols,
                    "left_anti",
                )
            if not_matched_condition:
                ins = ins.alias("s").where(
                    F.coalesce(F.expr(not_matched_condition), F.lit(False))
                )
            new_entries.extend(self._materialize(ins))
            if cdc:
                change_parts.append((ins, "insert"))
        for e in new_entries:
            e["seq"] = seq
            if meta:
                e["schema_id"] = meta["file_sid"]
        change_manifest = (
            self._capture_changes(change_parts, seq) if change_parts else None
        )
        manifests = []
        if keep:
            manifests.append(self._write_manifest(keep))
        if new_entries:
            manifests.append(self._write_manifest(new_entries))
        commit_snap = {
            "operation": "merge",
            "schema": schema_json,
            "manifests": manifests,
            **(
                {"change_manifest": change_manifest}
                if change_manifest
                else {}
            ),
            "seq": seq,
            "delete_manifests": self._live_delete_manifests(
                keep + new_entries, snap.get("delete_manifests", [])
            ),
            "summary": {
                "rewritten_files": len(hit),
                "carried_files": len(keep),
            },
        }
        if meta:
            commit_snap.update(
                fields=meta["fields"],
                next_field_id=meta["next_field_id"],
                schemas=meta["schemas"],
                schema_id=meta["schema_id"],
            )
        return self._commit(commit_snap, expected_parent=snap["version"])

    def _merge_upsert_mor(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        evolve: bool,
        check_unique_keys: bool,
        max_retries: int = 5,
        idempotency_key: str | None = None,
    ) -> int:
        aligned_src, schema_json = self._aligned(source, evolve)
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
        # NULL keys never match (SQL equality) — they insert but must not
        # land in the tombstone set, or they'd null-safe-nothing anyway;
        # filtering keeps the delete file dense
        dk = aligned_src.select(*key_cols).distinct()
        for k in key_cols:
            dk = dk.where(F.col(k).isNotNull())
        write_names_by_id = {
            fl["id"]: fl["name"]
            for fl in (self._snapshot().get("fields") or [])
        }
        n_base = len(self._snapshot()["schema"]["fields"])
        enforced_checks = self._snapshot().get("check_constraints") or {}
        del_entries = self._materialize(dk, n_files=1, partitioned=False)
        data_entries = self._materialize(aligned_src)
        stamped_seq = None
        stamped_sid = None
        dm = data_manifest = None
        for _ in range(max_retries):
            snap = self._snapshot()
            if not (
                set((snap.get("check_constraints") or {}).items())
                <= set(enforced_checks.items())
            ):
                # same rule as append: rows written before a concurrent
                # ADD CONSTRAINT must not rebase past the new gate
                raise CommitConflict(
                    "check constraints changed concurrently; the written "
                    "batch was not validated against them — retry the write"
                )
            seq = self._seq_of(snap) + 1
            # evolve-added columns: mint field ids here (not in _commit)
            # so the data entries carry a schema id covering them
            meta = (
                self._derive_schema_meta(
                    snap, schema_json, write_names_by_id
                )
                if len(schema_json["fields"]) > n_base and snap.get("fields")
                else None
            )
            file_sid = meta["file_sid"] if meta else None
            if seq != stamped_seq or file_sid != stamped_sid:
                # source data files get seq == the delete's seq: strict-<
                # applicability deletes every OLDER copy of a key but
                # never the row this very merge appends
                for e in del_entries:
                    e["seq"] = seq
                    e["cols"] = list(key_cols)
                for e in data_entries:
                    e["seq"] = seq
                    if file_sid is not None:
                        e["schema_id"] = file_sid
                dm = (
                    self._write_manifest(del_entries)
                    if del_entries
                    else None
                )
                data_manifest = (
                    self._write_manifest(data_entries)
                    if data_entries
                    else None
                )
                stamped_seq = seq
                stamped_sid = file_sid
            manifests = list(snap["manifests"])
            if data_manifest:
                manifests.append(data_manifest)
            delete_manifests = list(snap.get("delete_manifests", []))
            if dm:
                delete_manifests.append(dm)
            summary = {
                "added_files": len(data_entries),
                "delete_files": len(del_entries),
                "cols": list(key_cols),
            }
            if idempotency_key is not None:
                summary["idempotency_key"] = idempotency_key
            commit_snap = {
                "operation": "merge-mor",
                "schema": schema_json,
                "manifests": manifests,
                "seq": seq,
                "delete_manifests": delete_manifests,
                "summary": summary,
            }
            if meta:
                commit_snap.update(
                    fields=meta["fields"],
                    next_field_id=meta["next_field_id"],
                    schemas=meta["schemas"],
                    schema_id=meta["schema_id"],
                )
            try:
                return self._commit(
                    commit_snap, expected_parent=snap["version"]
                )
            except CommitConflict:
                if idempotency_key is not None:
                    v = self.committed_version_for(idempotency_key)
                    if v is not None:
                        return v  # the race WAS this key's other delivery
                continue
        raise CommitConflict(
            f"merge-mor lost {max_retries} commit races"
        )

    def delete_matching_mor(
        self,
        spark: SparkSession,
        keys: DataFrame,
        key_cols: list[str],
        n_files: int = 1,
        max_retries: int = 5,
    ) -> int:
        """Merge-on-read DELETE: write the key tuples as an equality-
        delete file and commit — NO data file is read or rewritten.
        Scans anti-join pending tombstones against every data file with
        a LOWER sequence number, so rows appended after the delete with
        the same key survive; :meth:`compact` (or any COW rewrite of the
        covered files) folds tombstones in and reclaims them.  Deleting
        yesterday's bad batch from a 100 TB table costs O(batch): one
        tombstone write plus one O(1) commit, where COW pays a rewrite of
        every stat-overlapping file.  NULL-keyed rows never match (SQL
        equality — same contract as :meth:`delete_matching`).  Deletes
        are additive, so lost commit races rebase and retry; the
        serialized order is commit order, meaning a delete that loses a
        race to a concurrent append of key K deletes K's new row too —
        exactly what DELETE-after-INSERT means."""
        if not key_cols:
            raise ValueError("key_cols must be non-empty")
        dk = keys.select(*key_cols).distinct()
        for k in key_cols:
            dk = dk.where(F.col(k).isNotNull())
        entries = self._materialize(dk, n_files=n_files, partitioned=False)
        if not entries:
            return self._snapshot()["version"]
        stamped_seq = None
        dm = None
        for _ in range(max_retries):
            snap = self._snapshot()
            seq = self._seq_of(snap) + 1
            if seq != stamped_seq:
                for e in entries:
                    e["seq"] = seq
                    e["cols"] = list(key_cols)
                dm = self._write_manifest(entries)
                stamped_seq = seq
            try:
                return self._commit(
                    {
                        "operation": "mor-delete",
                        "schema": snap["schema"],
                        "manifests": list(snap["manifests"]),
                        "seq": seq,
                        "delete_manifests": list(
                            snap.get("delete_manifests", [])
                        )
                        + [dm],
                        "summary": {
                            "delete_files": len(entries),
                            "delete_rows": sum(e["rows"] for e in entries),
                            "cols": list(key_cols),
                        },
                    },
                    expected_parent=snap["version"],
                )
            except CommitConflict:
                continue
        raise CommitConflict(
            f"mor-delete lost {max_retries} commit races"
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
        seq = self._seq_of(snap) + 1
        survivors = self._read_with_deletes(
            spark, hit, schema, self.delete_entries(snap["version"]), snap=snap
        ).join(keys.select(*key_cols).distinct(), key_cols, "left_anti")
        new_entries = self._materialize(survivors)
        for e in new_entries:
            e["seq"] = seq
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
                "seq": seq,
                "delete_manifests": self._live_delete_manifests(
                    keep + new_entries, snap.get("delete_manifests", [])
                ),
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
        their exact file list; the new tip appears or nothing does.

        Pending MOR tombstones are folded into whatever this call
        rewrites (and reclaimed once no remaining file is older than
        them); tombstones covering only carried-by-reference files stay
        pending — raise ``target_file_bytes`` (or ``rewrite_clustered``)
        to fold the table completely."""
        snap = self._snapshot()
        entries = self.entries(snap["version"])
        deletes = self.delete_entries(snap["version"])
        small = [e for e in entries if e["bytes"] < target_file_bytes]
        keep = [e for e in entries if e["bytes"] >= target_file_bytes]
        if deletes and not small:
            # nothing to bin-pack, but pending tombstones: fold them into
            # their covered files so readers stop paying the anti-join
            covered = [
                e
                for e in entries
                if any(e.get("seq", 0) < d["seq"] for d in deletes)
            ]
            small = covered
            keep = [e for e in entries if e not in covered]
        if len(small) < 2 and not (deletes and small):
            return snap["version"]
        schema = T.StructType.fromJson(snap["schema"])
        seq = self._seq_of(snap) + 1
        n_files = max(1, -(-sum(e["bytes"] for e in small) // target_file_bytes))
        df = self._read_with_deletes(spark, small, schema, deletes, snap=snap)
        new_entries = self._materialize(df, n_files=n_files)
        for e in new_entries:
            e["seq"] = seq
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
                "seq": seq,
                "delete_manifests": self._live_delete_manifests(
                    keep + new_entries, snap.get("delete_manifests", [])
                ),
                "summary": {
                    "compacted_files": len(small),
                    "new_files": len(new_entries),
                },
            },
            expected_parent=snap["version"],
        )

    def rewrite_manifests(self, target_entries: int = 100_000) -> int:
        """Manifest compaction: every append adds one manifest fragment,
        so after 10^5 commits the tip snapshot lists 10^5 fragment names
        and planning opens them all.  This merges the fragments into
        ceil(files / target_entries) manifests in ONE metadata-only
        commit — entries are carried verbatim (stats, seq, spec_id,
        blooms, partition tuples untouched), data files are never read.
        Like any rewrite, it conflicts with a concurrent branch publish
        whose fork predates it (the branch re-forks)."""
        snap = self._snapshot()
        if len(snap["manifests"]) <= 1:
            return snap["version"]
        entries = self.entries(snap["version"])
        manifests = [
            self._write_manifest(entries[i:i + target_entries])
            for i in range(0, len(entries), target_entries)
        ] if entries else []
        return self._commit(
            {
                "operation": "rewrite-manifests",
                "schema": snap["schema"],
                "manifests": manifests,
                "delete_manifests": snap.get("delete_manifests", []),
                "summary": {
                    "before": len(snap["manifests"]),
                    "after": len(manifests),
                },
            },
            expected_parent=snap["version"],
        )

    def rollback(self, version: int) -> int:
        """Point the tip back at an old snapshot's file set (a NEW commit —
        history is never rewritten, so the bad snapshots stay auditable)."""
        old = self._snapshot(version)
        tip = self._snapshot()
        snap = {
            "operation": "rollback",
            "schema": old["schema"],
            "manifests": old["manifests"],
            # the old file set pairs with the old tombstone set —
            # restoring one without the other would resurrect rows
            "delete_manifests": old.get("delete_manifests", []),
            # the restored schema pairs with the type eras as of that
            # snapshot (rolled-back widens covered only since-dropped
            # files, so the narrower history stays consistent); set even
            # when empty so _commit doesn't inherit the tip's
            "widen_history": old.get("widen_history", []),
            # restored rows pair with the constraint set they satisfied
            # (set even when empty so _commit doesn't inherit the tip's)
            "check_constraints": old.get("check_constraints", {}),
            "summary": {"to_version": version},
        }
        if old.get("fields"):
            # restore the old schema's exact field ids (deriving from the
            # tip would mint NEW ids for any since-renamed name); the
            # registry and the id high-water mark stay the TIP's — ids
            # are never reused, and old stamps must keep resolving
            snap["fields"] = old["fields"]
            snap["schema_id"] = old.get("schema_id", 0)
            snap["schemas"] = tip.get("schemas", old.get("schemas"))
            snap["next_field_id"] = tip.get(
                "next_field_id", old.get("next_field_id")
            )
        return self._commit(snap, expected_parent=tip["version"])

    def rewrite_clustered(
        self,
        spark: SparkSession,
        cluster_by: list[str],
        n_files: int = 16,
        method: str = "linear",
    ) -> int:
        """OPTIMIZE: rewrite the whole table clustered on ``cluster_by``
        (Z-order for 2+ columns via :func:`dff.layout.zvalue`, range sort
        for one) in ONE atomic snapshot commit — readers of the old
        snapshot keep their file list; rows are bit-identical, only the
        layout (and therefore the manifest min/max tightness) changes.
        After clustering, ``scan(filters=...)`` range predicates prune to
        the few files whose hyper-rectangle overlaps the query box."""
        if self.partition_spec():
            raise ValueError(
                "rewrite_clustered on a partitioned table is not supported:"
                " the partition spec already clusters writes"
            )
        from dff.layout import zvalue

        snap = self._snapshot()
        df = self.scan(spark, version=snap["version"])
        key = (
            F.col(cluster_by[0])
            if len(cluster_by) == 1
            else zvalue(df, list(cluster_by), method=method)
        )
        arranged = (
            df.withColumn("__ck", key)
            .repartitionByRange(n_files, "__ck")
            .sortWithinPartitions("__ck")
            .drop("__ck")
        )
        # n_files=None: _materialize must NOT reshuffle, or the range
        # clustering (and the stats tightness it buys) is destroyed
        seq = self._seq_of(snap) + 1
        entries = self._materialize(arranged)
        for e in entries:
            e["seq"] = seq
        manifests = [self._write_manifest(entries)] if entries else []
        return self._commit(
            {
                "operation": "optimize",
                "schema": snap["schema"],
                "manifests": manifests,
                "seq": seq,
                # the scan above applied every pending tombstone; a full
                # rewrite therefore retires them all
                "delete_manifests": self._live_delete_manifests(
                    entries, snap.get("delete_manifests", [])
                ),
                "summary": {
                    "cluster_by": list(cluster_by),
                    "new_files": len(entries),
                },
            },
            expected_parent=snap["version"],
        )

    # ----------------------------------------------- branches (WAP flow)
    # Write-Audit-Publish: ingest lands on an isolated branch, the
    # validation engine audits the branch scan, and only a green audit
    # fast-forwards main — bad data is never visible to readers.  A branch
    # is a second linear commit log under metadata/branches/<name>/
    # sharing the table's data files and manifest pool; branching is O(1)
    # (one snapshot file referencing the same manifests).

    def _require_main(self, op: str) -> None:
        if self.branch is not None:
            raise ValueError(f"{op} must run on the main table, not a branch")

    def list_branches(self) -> list[str]:
        d = os.path.join(self.manifest_dir, "branches")
        if not os.path.isdir(d):
            return []
        return sorted(
            n for n in os.listdir(d)
            if os.path.isdir(os.path.join(d, n))
        )

    def create_branch(self, name: str) -> "Table":
        """Fork the current tip into branch ``name`` and return a Table
        view of it — every Table operation works on the branch and commits
        to its own chain; main never sees branch commits until publish."""
        self._require_main("create_branch")
        if not name or not all(c.isalnum() or c in "-_" for c in name):
            raise ValueError(f"bad branch name {name!r}")
        snap = self._snapshot()
        br = Table(self.root, branch=name)
        os.makedirs(br.meta_dir, exist_ok=False)
        base = {
            "operation": "branch",
            "schema": snap["schema"],
            "manifests": list(snap["manifests"]),
            "delete_manifests": list(snap.get("delete_manifests", [])),
            # the branch chain continues main's sequence numbering so its
            # commits order correctly against pre-fork tombstones
            "seq": self._seq_of(snap),
            "summary": {"base_version": snap["version"]},
        }
        if snap.get("partition_spec"):
            base["partition_spec"] = snap["partition_spec"]
        if snap.get("partition_specs"):
            base["partition_specs"] = snap["partition_specs"]
            base["default_spec_id"] = snap.get("default_spec_id", 0)
        if snap.get("fields"):
            # the branch chain continues main's field-id story so its
            # entry stamps resolve after publish (schema changes
            # themselves stay main-only via _require_main)
            for k in ("fields", "next_field_id", "schema_id", "schemas"):
                base[k] = snap[k]
        if snap.get("check_constraints"):
            # branch writes enforce main's CHECK gate too — a WAP batch
            # must not be able to stage rows main could never accept
            base["check_constraints"] = snap["check_constraints"]
        br._commit(base, expected_parent=None)
        return br

    def branch_table(self, name: str) -> "Table":
        br = Table(self.root, branch=name)
        if br._latest_version() is None:
            raise FileNotFoundError(f"no branch {name!r} under {self.root}")
        return br

    def drop_branch(self, name: str) -> None:
        self._require_main("drop_branch")
        shutil.rmtree(os.path.join(self.manifest_dir, "branches", name))

    def publish_branch(self, name: str, max_retries: int = 5) -> int:
        """Fast-forward main to the branch tip.  If main advanced since
        the fork and the branch only ADDED files (the WAP ingest case),
        the publish rebases — main's new manifests and the branch's new
        manifests commute.  A branch that rewrote or deleted shared files
        while main also moved raises :class:`CommitConflict` (the caller
        re-forks and re-applies, as in any optimistic protocol).  MOR
        deletes count as rewrites for this rule: a rebase is refused if
        EITHER side changed the tombstone set since the fork, because
        sequence numbers minted concurrently on two chains have no
        defined order against each other."""
        self._require_main("publish_branch")
        br = self.branch_table(name)
        bsnap = br._snapshot()
        base_v = br._snapshot(0)["summary"]["base_version"]
        base = self._snapshot(base_v)
        base_manifests = set(base["manifests"])
        added = [m for m in bsnap["manifests"] if m not in base_manifests]
        removed = base_manifests - set(bsnap["manifests"])
        b_dm = list(bsnap.get("delete_manifests", []))
        base_dm = list(base.get("delete_manifests", []))
        for _ in range(max_retries):
            tip = self._snapshot()
            tip_dm = list(tip.get("delete_manifests", []))
            adopt_branch_fields = False
            if tip["version"] == base_v:
                manifests = list(bsnap["manifests"])
                schema = bsnap["schema"]
                adopt_branch_fields = True
                delete_manifests = b_dm
                # adopting the branch chain verbatim: adopt its sequence
                # high-water mark too, so future tombstones outrank every
                # file the branch added
                seq = self._seq_of(bsnap)
            elif removed or b_dm != base_dm or tip_dm != base_dm:
                # concurrent sequence numbers from two chains have no
                # defined order — a rebase is only sound when NEITHER side
                # touched row-level deletes since the fork (same rule as
                # rewrites: re-fork and re-apply)
                raise CommitConflict(
                    f"branch {name!r} cannot rebase: it rewrote files, or "
                    "MOR deletes changed on either side since the fork — "
                    "re-fork and re-apply"
                )
            else:
                # r6 (ADVICE r05): the branch validated its rows against
                # ITS OWN constraint set (fork-time copy + branch-added);
                # a constraint added on main after the fork was never
                # enforced against the branch's staged rows, and the
                # published snapshot would inherit main's constraint set
                # — smuggling unchecked rows past an active gate.  Same
                # rule as the append/merge rebase guard.
                tip_checks = set(
                    (tip.get("check_constraints") or {}).items()
                )
                br_checks = set(
                    (bsnap.get("check_constraints") or {}).items()
                )
                if not (tip_checks <= br_checks):
                    raise CommitConflict(
                        f"branch {name!r} was not validated against check "
                        "constraint(s) added on main since the fork — "
                        "re-fork and re-audit (or re-validate the branch "
                        "against the tip's constraints) before publishing"
                    )
                have = set(tip["manifests"])
                manifests = list(tip["manifests"]) + [
                    m for m in added if m not in have
                ]
                delete_manifests = tip_dm
                # both chains stamped entries past the fork point; future
                # tombstones must outrank ALL of them
                seq = max(self._seq_of(tip), self._seq_of(bsnap))
                branch_evolved = bsnap["schema"] != base["schema"]
                main_evolved = tip["schema"] != base["schema"]
                if branch_evolved and main_evolved:
                    raise CommitConflict(
                        f"branch {name!r} and main both evolved the schema"
                    )
                schema = bsnap["schema"] if branch_evolved else tip["schema"]
                adopt_branch_fields = branch_evolved
            pub = {
                "operation": "publish",
                "schema": schema,
                "manifests": manifests,
                "seq": seq,
                "delete_manifests": delete_manifests,
                "summary": {
                    "branch": name,
                    "branch_version": bsnap["version"],
                },
            }
            if adopt_branch_fields and bsnap.get("fields"):
                # the branch minted the newer schema ids (main did not
                # evolve since the fork — guarded above), so its registry
                # is the superset; adopting it keeps branch entry stamps
                # resolving on main
                for k in ("fields", "next_field_id", "schema_id", "schemas"):
                    pub[k] = bsnap[k]
            try:
                return self._commit(pub, expected_parent=tip["version"])
            except CommitConflict:
                # a racer advanced main: loop re-reads the tip and retries
                # via the rebase path (which raises itself if not rebasable)
                continue
        raise CommitConflict(f"publish lost {max_retries} commit races")

    # ------------------------------------------------------- maintenance
    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest ``keep_last`` snapshots and garbage-
        collect manifests and data files no kept snapshot references.
        Returns counts.  Readers of expired versions lose time travel —
        the standard retention trade.  Branches keep everything they
        reference alive (their whole chains — trimming a branch is
        ``drop_branch``'s job)."""
        self._require_main("expire_snapshots")
        tip = self._latest_version()
        keep_versions = set()
        v = tip
        while v is not None and len(keep_versions) < keep_last:
            if os.path.exists(self._snapshot_path(v)):
                keep_versions.add(v)
            v -= 1
            if v < 0:
                break
        # tagged snapshots are pinned: a ref means someone needs that
        # exact snapshot back (repro/audit), retention never eats it
        keep_versions.update(
            tv for tv in self.tags().values()
            if os.path.exists(self._snapshot_path(tv))
        )
        live_manifests: set[str] = set()
        live_files: set[str] = set()
        for v in keep_versions:
            snap = self._snapshot(v)
            live_manifests.update(snap["manifests"])
            live_manifests.update(snap.get("delete_manifests", []))
            if snap.get("change_manifest"):
                live_manifests.add(snap["change_manifest"])
            for e in (
                self.entries(v)
                + self.delete_entries(v)
                + self.change_entries(v)
            ):
                live_files.add(os.path.basename(e["path"]))
        for bname in self.list_branches():
            br = Table(self.root, branch=bname)
            for h in br.history():
                bs = br._snapshot(h["version"])
                live_manifests.update(bs["manifests"])
                live_manifests.update(bs.get("delete_manifests", []))
                if bs.get("change_manifest"):
                    live_manifests.add(bs["change_manifest"])
                for e in (
                    br.entries(h["version"])
                    + br.delete_entries(h["version"])
                    + br.change_entries(h["version"])
                ):
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
        self._require_main("gc_orphans")
        live: set[str] = set()
        tables = [self] + [
            Table(self.root, branch=b) for b in self.list_branches()
        ]
        for t in tables:
            tip = t._latest_version()
            for v in range((tip or 0) + 1):
                if not os.path.exists(t._snapshot_path(v)):
                    continue
                for e in (
                    t.entries(v) + t.delete_entries(v) + t.change_entries(v)
                ):
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
