"""Object-store keyed-upsert table: write-once data objects + a manifest
pointer, no renames anywhere.

This is the S3 layout SCALE.md derives from `LocalFSCommitter`'s contract
(reference deployment is Hudi-on-s3a, 01-setup-ec-vm.md:273): object
stores have no atomic rename, so the rename-based commit protocol cannot
apply. The manifest protocol replaces it:

* **stage** — every merge writes its output parquet as NEW objects under
  unique keys (`data/<txn>/part-*.parquet`); nothing is ever overwritten
  or moved. (Locally, "upload" is a write into the final key path — the
  one local rename inside `_publish_objects` stands in for S3's
  atomic-per-key PUT, not for a commit primitive.)
* **commit point** — ONE manifest object (`_manifests/<n>.json`, n
  monotonically increasing) lists the complete live file set per
  partition plus the table schema. Readers resolve the HIGHEST manifest
  and read exactly the keys it lists — never ListObjects over data — so
  a reader sees the old or the new file set, never a mix. On S3 the PUT
  is last-wins (conditional-PUT where offered); locally, write-tmp +
  rename gives the same atomicity.
* **retire** — superseded data objects stay on disk until `vacuum()`
  deletes everything unreferenced by the current manifest. A writer that
  crashes after staging but before the manifest PUT leaves only
  unreferenced keys: invisible to readers, collected by the next vacuum.

Merge semantics (key/partition/precombine, delete tombstones, idempotent
replay) are identical to `UpsertTable` — both call `latest_state`; only
the storage protocol differs. Single-writer, like the reference's one
streaming driver (01-setup-ec-vm.md:284).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from buskafkasparkstreaming_spark.cdc.upsert import (
    latest_state,
    partition_dirvalue,
)


class ManifestConflictError(RuntimeError):
    """Another writer published the manifest version this txn targeted.

    The object-store analog of a Hudi timeline / Delta log collision:
    both writers read version N and both try to PUT N+1. The PUT is
    create-exclusive, so exactly one wins; the loser gets this error and
    `merge()` re-reads the new current manifest, recomputes the merge
    against it, and retries (optimistic concurrency, Delta-style)."""


class ManifestUpsertTable:
    DATA_DIR = "data"
    MANIFEST_DIR = "_manifests"

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str] | str,
        precombine_col: str,
        partition_col: str | None = None,
        tiebreak_cols: list[str] | None = None,
        stats_cols: list[str] | None = None,
        bloom_col: str | None = None,
        bloom_m: int = 8192,
        bloom_k: int = 4,
    ) -> None:
        self.spark = spark
        self.path = path
        self.key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
        self.precombine_col = precombine_col
        self.partition_col = partition_col
        self.tiebreak_cols = tiebreak_cols or []
        #: columns whose per-object min/max zone maps are lifted from the
        #: parquet footers into the manifest at commit time (file-skipping
        #: stats, the Delta/Iceberg pattern)
        self.stats_cols = stats_cols or []
        #: when set, a per-object BLOOM FILTER over this column is built
        #: at publish and persisted in the manifest beside the zone maps
        #: — the Hudi bloom-index analog (the reference deployment is
        #: Hudi, whose default record index is exactly this:
        #: 01-setup-ec-vm.md:273): point lookups skip every object whose
        #: bloom excludes all probe values (zone maps skip RANGES; the
        #: bloom skips POINT sets a range cannot bound). Bit positions
        #: are md5-derived from the value's STRING form — deterministic
        #: and replayable in both engines (Spark conv(substr(md5(..)))
        #: and DuckDB digit math produce the same integers), which is
        #: what lets the manifest_bloom_lookup entry's oracle recompute
        #: bloom membership — false positives included — entirely in
        #: SQL. m is bits per object (8192 = 1 KiB), k the hash count;
        #: at ~budget_rows=1000 keys/object the fill is ~0.4 and the FP
        #: rate ~(0.4)^4 ≈ 2.4% — tune m upward for bigger objects.
        self.bloom_col = bloom_col
        self.bloom_m = int(bloom_m)
        self.bloom_k = int(bloom_k)

    # -- manifest resolution -------------------------------------------------
    def _manifest_dir(self) -> str:
        return os.path.join(self.path, self.MANIFEST_DIR)

    def _current_manifest(self) -> dict | None:
        d = self._manifest_dir()
        if not os.path.isdir(d):
            return None
        names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
        if not names:
            return None
        with open(os.path.join(d, names[-1]), encoding="utf-8") as fh:
            return json.load(fh)

    def exists(self) -> bool:
        return self._current_manifest() is not None

    def version(self) -> int:
        m = self._current_manifest()
        return -1 if m is None else m["version"]

    def history(self) -> list[int]:
        """Versions still readable (retained by `vacuum`), oldest first.
        Every retained manifest is fully readable: vacuum keeps the union
        of their object sets live."""
        d = self._manifest_dir()
        if not os.path.isdir(d):
            return []
        return sorted(
            int(n[: -len(".json")]) for n in os.listdir(d) if n.endswith(".json")
        )

    def _manifest_at(self, version: int) -> dict:
        p = os.path.join(self._manifest_dir(), f"{version:010d}.json")
        if not os.path.exists(p):
            raise FileNotFoundError(
                f"version {version} is not readable at {self.path}: its "
                f"manifest was vacuumed (retained: {self.history()})"
            )
        with open(p, encoding="utf-8") as fh:
            return json.load(fh)

    # -- read ----------------------------------------------------------------
    def read_version(self, version: int) -> DataFrame:
        """Time travel: read the table exactly as of `version`. Free on
        this protocol — manifests are immutable versioned snapshots and
        `vacuum(keep_manifests=K)` keeps the last K fully readable (the
        Hudi-timeline / Iceberg-snapshot analog)."""
        return self._read_manifest_df(self._manifest_at(version))

    def read(self) -> DataFrame:
        """Read exactly the objects the current manifest lists (never a
        directory listing). Partition values are re-attached from the
        manifest — partition "pruning" is trivially explicit key
        selection, the object-store equivalent of directory pruning."""
        m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        return self._read_manifest_df(m)

    def _read_objects(
        self,
        m: dict,
        vals: set | None = None,
        keep_keys: set | None = None,
    ) -> DataFrame | None:
        """THE manifest-resolved reader (every read path funnels here):
        partitions restricted to string forms in `vals` when given,
        objects restricted to `keep_keys` (zone-map survivors) when
        given. Partition values are re-attached from the manifest.
        Returns None when nothing matches."""
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(m["schema"])
        if self.partition_col is None:
            keys = [
                k
                for k in m["partitions"].get("", [])
                if keep_keys is None or k in keep_keys
            ]
            if not keys:
                return None
            files = [os.path.join(self.path, k) for k in keys]
            return self.spark.read.schema(schema).parquet(*files)
        ptype = schema[self.partition_col].dataType
        data_schema = StructType(
            [f for f in schema.fields if f.name != self.partition_col]
        )
        entries = [
            (k, val_str)
            for val_str, keys in sorted(m["partitions"].items())
            if vals is None or val_str in vals
            for k in keys
            if keep_keys is None or k in keep_keys
        ]
        if not entries:
            return None
        # ONE scan over every selected object + a broadcast key→partition
        # map (round-14 optimization): the previous form built a separate
        # file index and scan PER partition value and unioned them — ten
        # driver-side file listings and a ten-way union plan per read.
        # The partition value is re-attached by joining on the object key
        # recovered from input_file_name (the compact_clustered tagging
        # idiom); the final cast from the manifest's string form is the
        # same cast the per-branch literals performed. The join is LEFT +
        # raise_error on a NULL partition value (ADVICE r14): an inner
        # join would silently DROP every row whose key extraction missed
        # (exotic base path, future layout rename), where the old
        # per-partition union could not lose rows — now any extraction
        # drift fails the read loudly instead.
        files = [os.path.join(self.path, k) for k, _v in entries]
        keymap = self.spark.createDataFrame(
            entries, "__key string, __pv string"
        )
        tagged = (
            self.spark.read.schema(data_schema)
            .parquet(*files)
            .withColumn(
                "__key",
                F.regexp_extract(
                    F.input_file_name(),
                    "(" + re.escape(self.DATA_DIR)
                    + r"/[^/]+/[^/]+\.parquet)$",
                    1,
                ),
            )
            .join(F.broadcast(keymap), "__key", "left")
        )
        guarded = F.when(
            F.col("__pv").isNull(),
            F.raise_error(
                F.concat(
                    F.lit(
                        "manifest read lost a row: input_file_name did "
                        "not resolve to a manifest key (layout drift?) — "
                    ),
                    F.input_file_name(),
                )
            ),
        ).otherwise(F.col("__pv"))
        val = F.when(guarded == "\0null", F.lit(None)).otherwise(guarded)
        return tagged.withColumn(
            self.partition_col, val.cast(ptype)
        ).drop("__key", "__pv")

    def _empty(self, m: dict) -> DataFrame:
        from pyspark.sql.types import StructType

        return self.spark.createDataFrame([], StructType.fromJson(m["schema"]))

    def _read_manifest_df(self, m: dict) -> DataFrame:
        out = self._read_objects(m)
        return self._empty(m) if out is None else out

    def select_objects(
        self, col: str, lo, hi, m: dict | None = None
    ) -> tuple[list[str], list[str]]:
        """File skipping: split the manifest's live objects into (kept,
        skipped) for the predicate lo <= col <= hi using the per-object
        zone maps. An object without stats for `col` is always kept
        (stats are an optimization, never a correctness gate). Pass `m`
        to pin a manifest snapshot — callers that resolve the manifest
        AND select objects must use ONE snapshot for both, or a commit
        landing between the two reads silently empties the
        intersection."""
        if m is None:
            m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        stats = m.get("stats", {})
        kept, skipped = [], []
        for keys in m["partitions"].values():
            for k in keys:
                rng = stats.get(k, {}).get(col)
                if rng is not None and (rng[1] < lo or rng[0] > hi):
                    skipped.append(k)
                else:
                    kept.append(k)
        return kept, skipped

    def read_where(self, col: str, lo, hi) -> DataFrame:
        """Range read with manifest-level file skipping: objects whose
        zone map cannot contain [lo, hi] are never opened — at object-store
        scale this (not row-group pushdown) is what turns a full-table
        scan into a handful of GETs. The surviving objects still get the
        row-level filter (zone maps are file-granular)."""
        m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        # ONE manifest snapshot governs both the selection and the read —
        # re-resolving inside select_objects would race a concurrent
        # commit and silently drop the recompacted partitions
        kept, _ = self.select_objects(col, lo, hi, m=m)
        out = self._read_objects(m, keep_keys=set(kept))
        pred = F.col(col).between(lo, hi)
        return self._empty(m) if out is None else out.filter(pred)

    def _read_partitions(self, m: dict, vals: set) -> DataFrame | None:
        """Manifest-resolved read of just the partitions in `vals`."""
        return self._read_objects(m, vals=vals)

    # -- write ---------------------------------------------------------------
    @staticmethod
    def _pval(v: str | None) -> str:
        """Manifest key for a partition whose SPARK-RENDERED string form is
        `v` (None = null partition). Callers must pass the string Spark
        itself writes in the partition directory name (recovered via
        `partition_dirvalue`, or produced by `CAST(col AS STRING)` — the
        same rendering Spark's partition-path code uses). Python `str()`
        of a raw value diverges for bool (`True` vs dir `true`) and large
        doubles (`1e+20` vs dir `1.0E20`), which silently orphaned the
        existing partition on merge (ADVICE r5, low)."""
        return "\0null" if v is None else v

    def _object_info(self, path: str) -> tuple[int, dict]:
        """Everything the manifest needs for one object — num_rows,
        zone-map stats, and (when bloom_col is set) the per-object bloom
        — from ONE file open (round-14 optimization: the publish paths
        previously parsed the footer for num_rows, again for stats, and
        a third time inside the bloom's column read; a commit touches
        many small objects, so the opens dominate). The ParquetFile is a
        context manager, so no fd outlives the call (the ADVICE-r13
        discipline, kept under the single-open form)."""
        import pyarrow.parquet as pq

        with pq.ParquetFile(path) as pf:
            md = pf.metadata
            n_rows = md.num_rows
            entry: dict = {}
            if self.stats_cols:
                entry.update(self._stats_from_md(md, self.stats_cols))
            if self.bloom_col is not None:
                vals = pf.read(columns=[self.bloom_col])[
                    self.bloom_col
                ].to_pylist()
                entry["__bloom"] = self._bloom_from_values(vals)
        return n_rows, entry

    def _object_meta(self, path: str) -> tuple[int, dict]:
        """(num_rows, zone-map stats) for one object from a METADATA-ONLY
        footer read (read_metadata never touches data pages; no fd
        outlives the call). The bloom — the only piece that needs data
        pages — is computed separately (`_bloom_spark_positions`)."""
        import pyarrow.parquet as pq

        md = pq.read_metadata(path)
        entry: dict = {}
        if self.stats_cols:
            entry.update(self._stats_from_md(md, self.stats_cols))
        return md.num_rows, entry

    #: Spark-side bloom extraction is only valid for column types whose
    #: Python str() equals Spark's CAST(.. AS STRING) rendering — the
    #: md5 contract `_bloom_positions` documents. Integers and strings
    #: qualify; bool ('True' vs 'true'), floats ('1e+20' vs '1.0E20'),
    #: dates/timestamps do not and fall back to the driver-side read.
    _BLOOM_RENDER_STABLE = (
        "tinyint", "smallint", "int", "bigint", "string",
    )
    #: the same acceptance set keyed by pyarrow type name (the footer
    #: probe `_bloom_spark_positions` reads), mapped to the Spark read
    #: schema string; anything else falls back to the driver path
    _ARROW_BLOOM_TYPES = {
        "int8": "tinyint",
        "int16": "smallint",
        "int32": "int",
        "int64": "bigint",
        "string": "string",
        "large_string": "string",
    }

    def _bloom_spark_positions(
        self, paths: list[str]
    ) -> dict[str, list[int]] | None:
        """Per-object DISTINCT bloom bit positions computed in ONE
        distributed Spark pass over the staged/published objects
        (round-15 optimization, guide §5/§6: the driver previously read
        the FULL bloom column of every object and md5-hashed each value
        in Python — thread-pooled, but still the publish bottleneck and
        a real scale-killer for a 100 TB commit). The job scans only the
        bloom column, computes the k md5-slice positions row-locally in
        the JVM (`conv(substr(md5(cast(v as string)), 8j+1, 8), 16, 10)
        % m` — the exact arithmetic the oracle replays in SQL, so
        bit-identical to `_bloom_positions`), and aggregates
        `collect_set(position)` per input file — bounded by m distinct
        positions per object. Returns None when the column's type does
        not render identically in Python str() and Spark CAST AS STRING
        (caller falls back to the driver-side path)."""
        from urllib.parse import unquote, urlparse

        import pyarrow.parquet as pq

        # ONE metadata-only footer read supplies the bloom column's type
        # (round-15, guide §6: `spark.read.parquet` without a schema ran
        # a schema-INFERENCE job over every staged file before the real
        # pass — a whole extra Spark job per publish); the explicit
        # 1-column schema also guarantees the scan reads nothing but the
        # bloom column. Staged objects share one writer schema; a column
        # absent from the probed footer falls back to the driver path,
        # which is always correct.
        try:
            fschema = pq.read_schema(paths[0])
        except Exception:
            return None
        if self.bloom_col not in fschema.names:
            return None
        stype = self._ARROW_BLOOM_TYPES.get(
            str(fschema.field(self.bloom_col).type)
        )
        if stype is None:
            return None
        sdf = self.spark.read.schema(
            f"`{self.bloom_col}` {stype}"
        ).parquet(*paths)
        hx = F.md5(F.col(self.bloom_col).cast("string"))
        pos = F.array(
            *[
                F.conv(F.substring(hx, 8 * j + 1, 8), 16, 10).cast("long")
                % F.lit(self.bloom_m)
                for j in range(self.bloom_k)
            ]
        )
        rows = (
            sdf.filter(F.col(self.bloom_col).isNotNull())
            .select(
                F.input_file_name().alias("__f"),
                F.explode(pos).alias("__p"),
            )
            .groupBy("__f")
            .agg(F.collect_set("__p").alias("__ps"))
            .collect()
        )
        by_path = {
            unquote(urlparse(r["__f"]).path): [int(p) for p in r["__ps"]]
            for r in rows
        }
        # an object absent from the aggregate held no non-NULL bloom
        # values — its bloom is the all-zero bitmap, same as the driver
        # path's empty-values fold
        return {p: by_path.get(os.path.abspath(p), []) for p in paths}

    def _bloom_from_positions(self, positions) -> dict:
        import base64

        bits = bytearray(self.bloom_m // 8)
        for p in positions:
            bits[p >> 3] |= 1 << (p & 7)
        return {
            "m": self.bloom_m,
            "k": self.bloom_k,
            "b64": base64.b64encode(bytes(bits)).decode("ascii"),
        }

    def _object_info_many(self, paths: list[str]) -> dict[str, tuple[int, dict]]:
        """Everything the manifest needs for many objects: metadata-only
        footer reads (num_rows + zone maps) through a small thread pool
        (round-14: pyarrow releases the GIL; eight threads cut the
        multi-hundred-object decay-mode commits ~5x), plus — when a bloom
        column is configured — the per-object blooms from ONE distributed
        Spark pass (round-15, `_bloom_spark_positions`) instead of a
        full driver-side column read per object. Types whose string
        rendering is not Spark/Python-stable keep the driver path.
        Results are keyed by path — ordering plays no role."""
        from concurrent.futures import ThreadPoolExecutor

        if not paths:
            return {}
        positions = (
            self._bloom_spark_positions(paths)
            if self.bloom_col is not None
            else None
        )
        if self.bloom_col is not None and positions is None:
            # render-unstable bloom type: one open per object serving
            # num_rows, stats AND the bloom column (the round-14 path)
            with ThreadPoolExecutor(max_workers=min(8, len(paths))) as pool:
                return dict(zip(paths, pool.map(self._object_info, paths)))
        with ThreadPoolExecutor(max_workers=min(8, len(paths))) as pool:
            out = dict(zip(paths, pool.map(self._object_meta, paths)))
        if positions is not None:
            for p, (_n, entry) in out.items():
                entry["__bloom"] = self._bloom_from_positions(positions[p])
        return out

    @staticmethod
    def _stats_from_md(md, cols: list[str]) -> dict:
        out: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name not in cols:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    continue
                mn, mx = st.min, st.max
                if isinstance(mn, bytes):
                    try:
                        mn, mx = mn.decode(), mx.decode()
                    except UnicodeDecodeError:
                        continue
                if not isinstance(mn, (int, float, str)):
                    continue
                if name in out:
                    out[name] = [min(out[name][0], mn), max(out[name][1], mx)]
                else:
                    out[name] = [mn, mx]
        return out

    def _publish_objects(self, staging: str, txn: str) -> dict[str, list[str]]:
        """Move staged part files under data/<txn>/ with unique keys and
        return {partition_value_str: [relative keys]}. The os.rename here
        emulates S3's atomic per-key upload (finalize-on-close), not a
        commit: objects are INVISIBLE until the manifest references them."""
        out: dict[str, list[str]] = {}
        dst_dir = os.path.join(self.path, self.DATA_DIR, txn)
        os.makedirs(dst_dir, exist_ok=True)
        if self.partition_col is None:
            entries = [("", staging)]
        else:
            entries = []
            for name in os.listdir(staging):
                if name.startswith(f"{self.partition_col}="):
                    val = partition_dirvalue(name)
                    entries.append((self._pval(val), os.path.join(staging, name)))
        self._last_stats: dict[str, dict] = {}
        self._last_num_rows: dict[str, int] = {}
        renamed: dict[str, str] = {}  # key -> dst path
        for val_str, src_dir in entries:
            keys = []
            for fname in os.listdir(src_dir):
                if not fname.endswith(".parquet"):
                    continue
                key = f"{self.DATA_DIR}/{txn}/{uuid.uuid4().hex[:16]}.parquet"
                dst = os.path.join(self.path, key)
                os.rename(os.path.join(src_dir, fname), dst)
                keys.append(key)
                renamed[key] = dst
            out[val_str] = keys
        # footer num_rows lifted into the manifest at commit (SURVEY
        # round-13 candidate: the stats_cols discipline) so
        # compaction_plan never walks footers on a current-format
        # manifest — metadata-only, ONE file open per NEW object serving
        # num_rows, zone maps, and the bloom column (thread-pooled),
        # amortized over every later plan
        info = self._object_info_many(list(renamed.values()))
        for key, dst in renamed.items():
            n_rows, entry = info[dst]
            self._last_num_rows[key] = n_rows
            if entry:
                self._last_stats[key] = entry
        return out

    @staticmethod
    def _bloom_positions(value, m_bits: int, k: int) -> list[int]:
        """The k bit positions of one value: md5 of the value's STRING
        form, position j = int(hexdigest[8j:8j+8], 16) mod m. Integer
        values render identically in Python str(), Spark CAST(.. AS
        STRING), and DuckDB CAST(.. AS VARCHAR) — the cross-engine
        contract the oracle replay depends on."""
        import hashlib

        hx = hashlib.md5(str(value).encode("utf-8")).hexdigest()
        return [
            int(hx[8 * j: 8 * j + 8], 16) % m_bits for j in range(k)
        ]

    def _bloom_from_values(self, vals) -> dict:
        return self._bloom_from_positions(
            p
            for v in vals
            if v is not None
            for p in self._bloom_positions(v, self.bloom_m, self.bloom_k)
        )

    @staticmethod
    def _bloom_may_contain(bloom: dict, positions: list[int]) -> bool:
        import base64

        bits = base64.b64decode(bloom["b64"])
        return all(
            bits[p >> 3] & (1 << (p & 7)) for p in positions
        )

    def select_objects_bloom(
        self, values, m: dict | None = None
    ) -> tuple[list[str], list[str]]:
        """Point-lookup file skipping: split the manifest's live objects
        into (kept, skipped) for the predicate `bloom_col IN values`
        using the per-object bloom filters. An object without a bloom
        (pre-bloom manifest versions, or a bloom built with different
        m/k) is always kept — like zone maps, the index is an
        optimization, never a correctness gate; blooms have NO false
        negatives, so a skipped object provably holds none of the
        probe values."""
        if self.bloom_col is None:
            raise ValueError("table has no bloom_col configured")
        if m is None:
            m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        probes = [
            self._bloom_positions(v, self.bloom_m, self.bloom_k)
            for v in values
            if v is not None
        ]
        stats = m.get("stats", {})
        kept, skipped = [], []
        for keys in m["partitions"].values():
            for k in keys:
                bloom = stats.get(k, {}).get("__bloom")
                if (
                    bloom is None
                    or bloom.get("m") != self.bloom_m
                    or bloom.get("k") != self.bloom_k
                ):
                    kept.append(k)
                elif any(
                    self._bloom_may_contain(bloom, pos) for pos in probes
                ):
                    kept.append(k)
                else:
                    skipped.append(k)
        return kept, skipped

    def read_keys(self, values) -> DataFrame:
        """Point read through the bloom index: objects whose bloom
        excludes every probe value are never opened; survivors get the
        exact IN filter (blooms are file-granular and can false-
        positive, never false-negative)."""
        m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        kept, _ = self.select_objects_bloom(values, m=m)
        out = self._read_objects(m, keep_keys=set(kept))
        pred = F.col(self.bloom_col).isin(list(values))
        return self._empty(m) if out is None else out.filter(pred)

    def _carry_num_rows(self, m: dict | None, live_keys: set) -> dict:
        """num_rows map for the next manifest: previous manifest's
        entries + this txn's freshly published objects, restricted to
        live keys. Partial by design when `m` is format-1."""
        return {
            k: int(v)
            for k, v in {
                **(m.get("num_rows", {}) if m is not None else {}),
                **getattr(self, "_last_num_rows", {}),
            }.items()
            if k in live_keys
        }

    def _put_manifest(
        self,
        version: int,
        partitions: dict,
        schema_json: dict,
        stats: dict | None = None,
        num_rows: dict | None = None,
    ) -> None:
        d = self._manifest_dir()
        os.makedirs(d, exist_ok=True)
        # format 2 adds the per-object num_rows map (may be PARTIAL:
        # keys carried forward from a format-1 manifest have no entry —
        # readers fall back to the parquet footer per missing key, so
        # old- and mixed-format manifests stay fully readable)
        body = {
            "format": 2,
            "version": version,
            "partitions": partitions,
            "schema": schema_json,
            "stats": stats or {},
            "num_rows": num_rows or {},
        }
        tmp = os.path.join(d, f".{version:010d}.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(body, fh)
        final = os.path.join(d, f"{version:010d}.json")
        try:
            # PUT-if-absent: os.link fails with EEXIST if another writer
            # already published this version (S3: conditional PUT with
            # If-None-Match:*). os.rename would silently REPLACE it — a
            # lost update (VERDICT r5, missing #2).
            os.link(tmp, final)
        except FileExistsError:
            raise ManifestConflictError(
                f"manifest version {version} already published at {d}"
            )
        finally:
            os.unlink(tmp)

    def merge(
        self,
        batch: DataFrame,
        delete_col: str | None = None,
        max_retries: int = 5,
    ) -> None:
        """Same precombine merge as UpsertTable.merge, via the manifest
        protocol: stage merged objects → PUT manifest. Idempotent: replay
        of the same batch produces the same table state (a new manifest
        version with equal contents).

        Concurrent-writer safe: the manifest PUT is create-exclusive, so
        when two writers race from the same base version exactly one
        commits; the loser discards its staged objects, re-reads the
        winner's manifest, recomputes the merge against it, and retries —
        both batches' rows land (optimistic concurrency; the reference
        gets the same serialization from Hudi's timeline,
        01-setup-ec-vm.md:262-273)."""
        for attempt in range(max_retries + 1):
            try:
                return self._merge_once(batch, delete_col)
            except ManifestConflictError:
                if attempt == max_retries:
                    raise

    def _merge_once(self, batch: DataFrame, delete_col: str | None) -> None:
        data_cols = [c for c in batch.columns if not c.startswith("_")]
        required = {*self.key_cols, self.precombine_col} | (
            {self.partition_col} if self.partition_col else set()
        )
        missing = sorted(required - set(data_cols))
        if missing:
            raise ValueError(f"batch is missing required merge columns {missing}")
        delete_flag = (
            F.coalesce(F.col(delete_col), F.lit(False))
            if delete_col is not None and delete_col in batch.columns
            else F.lit(False)
        )
        incoming = batch.select(
            *data_cols,
            delete_flag.alias("__deleted"),
            F.lit(1).alias("__gen"),
        )

        m = self._current_manifest()
        touched: set[str] = set()
        if self.partition_col is not None:
            # CAST(col AS STRING) is the same rendering Spark's
            # partition-path code uses for the dir name, so these keys
            # match what _publish_objects recovers (bool -> 'true', big
            # double -> '1.0E20'); Python str() of the raw value does not.
            touched = {
                self._pval(r[0])
                for r in batch.select(
                    F.col(self.partition_col).cast("string")
                )
                .distinct()
                .collect()
            }
        if m is not None:
            if self.partition_col is not None:
                existing = self._read_partitions(m, touched)
            else:
                existing = self.read()
            if existing is not None:
                existing = existing.select(
                    *existing.columns,
                    F.lit(False).alias("__deleted"),
                    F.lit(0).alias("__gen"),
                )
                incoming = existing.unionByName(
                    incoming, allowMissingColumns=True
                )

        merged = latest_state(
            incoming,
            self.key_cols,
            self.precombine_col,
            tiebreak_cols=[*self.tiebreak_cols, "__gen"],
            delete_col="__deleted",
        ).drop("__deleted", "__gen")

        txn = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f".stage_{txn}")
        writer = merged.write.mode("overwrite")
        if self.partition_col is not None:
            writer = writer.partitionBy(self.partition_col)
        writer.parquet(staging)
        new_objs = self._publish_objects(staging, txn)
        shutil.rmtree(staging, ignore_errors=True)

        partitions = dict(m["partitions"]) if m is not None else {}
        if self.partition_col is None:
            partitions[""] = new_objs.get("", [])
        else:
            for val_str in touched:
                # fully-tombstoned partition: no staged objects -> empty list
                partitions[val_str] = new_objs.get(val_str, [])
            for val_str, keys in new_objs.items():
                partitions[val_str] = keys
        live_keys = {k for keys in partitions.values() for k in keys}
        stats = {
            k: v
            for k, v in {
                **(m.get("stats", {}) if m is not None else {}),
                **getattr(self, "_last_stats", {}),
            }.items()
            if k in live_keys
        }
        version = (m["version"] + 1) if m is not None else 0
        try:
            self._put_manifest(
                version,
                partitions,
                merged.schema.jsonValue(),
                stats,
                num_rows=self._carry_num_rows(m, live_keys),
            )
        except ManifestConflictError:
            # Lost the race: this txn's staged objects were computed
            # against a superseded base. They are invisible (no manifest
            # references them) — delete them now rather than leaving them
            # for vacuum, then let merge() retry against the winner.
            shutil.rmtree(
                os.path.join(self.path, self.DATA_DIR, txn),
                ignore_errors=True,
            )
            raise

    # -- maintenance ---------------------------------------------------------
    def compact(self, max_objects_per_partition: int = 4) -> list[str]:
        """Small-object compaction: rewrite every partition holding more
        than `max_objects_per_partition` live objects into one object —
        the maintenance tick a 30 s-ingest pipeline needs (each merge
        writes a fresh txn's objects; object-store GET/LIST overhead and
        scan task-setup grow with object count, the lakehouse decay mode).

        Pure layout: rows are untouched. The rewrite stages new objects
        under a fresh txn and publishes a new manifest version through the
        same create-exclusive PUT as merge() — so it is crash-safe (a
        crash pre-PUT leaves only unreferenced objects) AND concurrency-
        safe (a racing merge wins or loses the version like any writer;
        losing this compaction is harmless, it just retries next tick —
        here we surface the conflict instead of retrying a stale layout).
        Old objects stay until vacuum. Returns the partition keys
        compacted ([] when already compact)."""
        m = self._current_manifest()
        if m is None:
            return []
        crowded = {
            val_str
            for val_str, keys in m["partitions"].items()
            if len(keys) > max_objects_per_partition
        }
        if not crowded:
            return []
        if self.partition_col is None:
            df = self._read_manifest_df(m)
        else:
            df = self._read_objects(m, vals=crowded)
        txn = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f".stage_{txn}")
        if self.partition_col is not None:
            # hash-repartition on the partition column: each partition
            # value lands in exactly one task -> ONE output object per
            # partition, compacted in PARALLEL across partitions
            # (coalesce(1) would funnel every crowded partition through
            # a single task — a bottleneck at fleet scale)
            writer = (
                df.repartition(F.col(self.partition_col))
                .write.mode("overwrite")
                .partitionBy(self.partition_col)
            )
        else:
            writer = df.coalesce(1).write.mode("overwrite")
        writer.parquet(staging)
        new_objs = self._publish_objects(staging, txn)
        shutil.rmtree(staging, ignore_errors=True)
        partitions = dict(m["partitions"])
        for val_str in crowded:
            partitions[val_str] = new_objs.get(val_str, [])
        # safety net (the merge() idiom): if the partition-value round
        # trip through the staged dir name recovered a DIFFERENT key
        # than the manifest's, land the rewritten objects under the
        # recovered key rather than dropping them on the floor
        for val_str, keys in new_objs.items():
            partitions[val_str] = keys
        live_keys = {k for keys in partitions.values() for k in keys}
        stats = {
            k: v
            for k, v in {
                **m.get("stats", {}),
                **getattr(self, "_last_stats", {}),
            }.items()
            if k in live_keys
        }
        try:
            self._put_manifest(
                m["version"] + 1,
                partitions,
                m["schema"],
                stats,
                num_rows=self._carry_num_rows(m, live_keys),
            )
        except ManifestConflictError:
            shutil.rmtree(
                os.path.join(self.path, self.DATA_DIR, txn), ignore_errors=True
            )
            raise
        return sorted(crowded)

    def compaction_plan(self, budget_rows: int) -> DataFrame:
        """FFD compaction PLAN over the current manifest's live objects
        (SURVEY round-12 candidate: packing × lakehouse composition) —
        the quality upgrade over `compact()`'s one-object-per-partition
        blunt rewrite: given a per-output row budget, plan which small
        objects merge so every planned write stays <= budget and
        already-full objects are left untouched (dedicated singleton
        bins), via operators.packing.plan_compaction (FFD, fewest
        compacted writes for the merge work, bins never span
        partitions).

        Sizes are per-object `num_rows` read from the MANIFEST (format
        2 persists them at commit beside the zone maps — the stats_cols
        discipline, SURVEY round-13 candidate), so planning on a
        current-format manifest touches no parquet footer at all: one
        JSON read, zero object GETs. Keys a format-1 manifest carried
        without the field fall back to a per-key footer read
        (metadata-only) — old and mixed manifests plan identically,
        just slower.

        Returns (part, obj, size, bin_in_part): `groupBy(part,
        bin_in_part)` having count(*) > 1 is the executor's merge work
        list; singleton bins are no-ops.
        """
        from buskafkasparkstreaming_spark.operators.packing import (
            plan_compaction,
        )

        m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        nr = m.get("num_rows", {})

        def _rows(key: str) -> int:
            n = nr.get(key)
            if n is not None:
                return int(n)
            import pyarrow.parquet as pq

            return pq.read_metadata(os.path.join(self.path, key)).num_rows

        rows = [
            (val_str, key, _rows(key))
            for val_str, keys in sorted(m["partitions"].items())
            for key in keys
        ]
        inv = self.spark.createDataFrame(
            rows or [], "part string, obj string, n_rows long"
        )
        return plan_compaction(inv, "part", "obj", "n_rows", budget_rows)

    def compact_with_plan(self, budget_rows: int) -> dict[str, dict]:
        """EXECUTE the FFD compaction plan (SURVEY round-13 candidate:
        plan → execution): every multi-object bin from
        `compaction_plan(budget_rows)` is rewritten as ONE object;
        singleton bins — already-full objects and loners nothing fits
        with — are left physically untouched (their keys carry over,
        zero read/write amplification, the planner's whole point over
        `compact()`'s blunt one-object-per-partition rewrite).

        Pure layout: rows are untouched; `latest_state` semantics never
        enter. Plan shape: ONE Spark job reads exactly the merged bins'
        objects, tags each row with its (partition, bin) via an
        input_file_name → key broadcast join, clusters with
        repartition(part, bin) (co-location: every bin's rows in one
        task) and writes partitionBy(partition, bin-dir) so each bin
        lands as exactly one staged file. Publish + manifest PUT follow
        the merge()/compact() crash protocol: new objects are invisible
        until the create-exclusive manifest PUT; losing a version race
        raises ManifestConflictError and deletes this txn's staging
        (retry next maintenance tick).

        Returns {partition_value_str: {"before": n_objects,
        "after": n_objects}} for every partition in the manifest.
        An all-empty bin (tombstoned partitions can hold 0-row objects)
        writes no file and its keys simply retire — dropping dead
        objects is correct compaction.
        """
        from collections import defaultdict

        from pyspark.sql.types import StructType

        m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        plan_rows = self.compaction_plan(budget_rows).collect()
        bins: dict[tuple, list[str]] = defaultdict(list)
        for r in plan_rows:
            bins[(r["part"], int(r["bin_in_part"]))].append(r["obj"])
        work = {pb: objs for pb, objs in bins.items() if len(objs) > 1}
        report = {
            val_str: {"before": len(keys), "after": len(keys)}
            for val_str, keys in m["partitions"].items()
        }
        if not work:
            return report
        merged_keys = {k for objs in work.values() for k in objs}
        expected_rows = sum(
            int(r["size"]) for r in plan_rows if r["obj"] in merged_keys
        )
        keymap = self.spark.createDataFrame(
            [(k, p, b) for (p, b), objs in work.items() for k in objs],
            "__key string, __part string, __bin long",
        )
        schema = StructType.fromJson(m["schema"])
        if self.partition_col is not None:
            ptype = schema[self.partition_col].dataType
            data_schema = StructType(
                [f for f in schema.fields if f.name != self.partition_col]
            )
        else:
            data_schema = schema
        paths = [os.path.join(self.path, k) for k in sorted(merged_keys)]
        df = (
            self.spark.read.schema(data_schema)
            .parquet(*paths)
            .withColumn(
                "__key",
                # pattern derived from DATA_DIR, not hardcoded — a
                # layout rename must not silently empty the extract
                # (ADVICE r12); the staged-footer row-count assert
                # below makes any residual drift fail loudly.
                F.regexp_extract(
                    F.input_file_name(),
                    "(" + re.escape(self.DATA_DIR)
                    + r"/[^/]+/[^/]+\.parquet)$",
                    1,
                ),
            )
            .join(F.broadcast(keymap), "__key")
        )
        part_cols = ["__bindir"]
        if self.partition_col is not None:
            val = F.when(F.col("__part") == "\0null", F.lit(None)).otherwise(
                F.col("__part")
            )
            df = df.withColumn(self.partition_col, val.cast(ptype))
            part_cols = [self.partition_col, "__bindir"]
        out = (
            df.withColumn("__bindir", F.col("__bin"))
            .repartition(F.col("__part"), F.col("__bin"))
            .drop("__key", "__part", "__bin")
        )
        return self._stage_publish_binned(
            out, part_cols, m, merged_keys, expected_rows, "compact_with_plan"
        )

    def _stage_publish_binned(
        self,
        out: DataFrame,
        part_cols: list[str],
        m: dict,
        retire_keys: set,
        expected_rows: int,
        caller: str,
    ) -> dict[str, dict]:
        """Shared executor tail for the binned rewrites
        (`compact_with_plan` / `compact_clustered`): stage the
        partitionBy(part, __bindir) write, assert the staged parquet
        footers account for EXACTLY `expected_rows` (the ADVICE-r12
        loss guard — any key the tagging join dropped aborts BEFORE the
        manifest PUT with staging cleaned and sources intact), publish
        each bin file as a write-once object (atomic rename + stats +
        num_rows lift), retire `retire_keys`, and PUT the next manifest
        version under the create-exclusive crash protocol (losing a
        version race deletes this txn's objects and raises).
        Returns {partition_value_str: {"before": .., "after": ..}}."""
        txn = uuid.uuid4().hex[:12]
        staging = os.path.join(self.path, f".stage_{txn}")
        out.write.mode("overwrite").partitionBy(*part_cols).parquet(staging)

        # ONE file open per staged file (round-14 optimization): the
        # loss-guard row count, the manifest num_rows lift, the zone
        # maps, and the bloom column all come from the same open, keyed
        # by the pre-rename path (rename does not touch the contents)
        staged_paths = [
            os.path.join(root, fname)
            for root, _dirs, files in os.walk(staging)
            for fname in files
            if fname.endswith(".parquet")
        ]
        finfo = self._object_info_many(staged_paths)
        staged_rows = sum(n for n, _st in finfo.values())
        if staged_rows != expected_rows:
            shutil.rmtree(staging, ignore_errors=True)
            raise ValueError(
                f"{caller} staged "
                f"{staged_rows} rows but the rewritten objects hold "
                f"{expected_rows}: key tagging failed for some objects "
                "(layout drift?) — aborting before publish"
            )

        # publish: one nested level deeper than _publish_objects (the
        # __bindir split), same atomic-per-key rename + stats lift
        def _bin_files(dirpath: str):
            for bname in sorted(os.listdir(dirpath)):
                if not bname.startswith("__bindir="):
                    continue
                bdir = os.path.join(dirpath, bname)
                for fname in sorted(os.listdir(bdir)):
                    if fname.endswith(".parquet"):
                        yield os.path.join(bdir, fname)

        if self.partition_col is None:
            entries = [("", staging)]
        else:
            entries = [
                (
                    self._pval(partition_dirvalue(name)),
                    os.path.join(staging, name),
                )
                for name in sorted(os.listdir(staging))
                if name.startswith(f"{self.partition_col}=")
            ]
        dst_dir = os.path.join(self.path, self.DATA_DIR, txn)
        os.makedirs(dst_dir, exist_ok=True)
        self._last_stats = {}
        self._last_num_rows = {}
        new_objs: dict[str, list[str]] = {}
        for val_str, pdir in entries:
            keys = []
            for fpath in _bin_files(pdir):
                key = f"{self.DATA_DIR}/{txn}/{uuid.uuid4().hex[:16]}.parquet"
                dst = os.path.join(self.path, key)
                n_rows, entry = finfo[fpath]  # file open paid in the walk
                os.rename(fpath, dst)
                keys.append(key)
                self._last_num_rows[key] = n_rows
                if entry:
                    self._last_stats[key] = entry
            new_objs[val_str] = keys
        shutil.rmtree(staging, ignore_errors=True)

        partitions = {}
        report: dict[str, dict] = {}
        for val_str, keys in m["partitions"].items():
            kept = [k for k in keys if k not in retire_keys]
            partitions[val_str] = kept + new_objs.get(val_str, [])
            report[val_str] = {
                "before": len(keys),
                "after": len(partitions[val_str]),
            }
        live_keys = {k for keys in partitions.values() for k in keys}
        stats = {
            k: v
            for k, v in {
                **m.get("stats", {}),
                **getattr(self, "_last_stats", {}),
            }.items()
            if k in live_keys
        }
        try:
            self._put_manifest(
                m["version"] + 1,
                partitions,
                m["schema"],
                stats,
                num_rows=self._carry_num_rows(m, live_keys),
            )
        except ManifestConflictError:
            shutil.rmtree(
                os.path.join(self.path, self.DATA_DIR, txn), ignore_errors=True
            )
            raise
        return report

    def compact_clustered(
        self, cluster_col: str, budget_rows: int
    ) -> dict[str, dict]:
        """CLUSTERED full rewrite — the OPTIMIZE ... ZORDER analog
        (1-D): re-bin EVERY live row so a partition's objects are
        RANGE-DISJOINT on `cluster_col`, with DETERMINISTIC bin
        boundaries from exact distributed ranks instead of
        RangePartitioner sampling: the per-(partition, value) cell
        frame's inclusive running count rides
        operators.windows_fn.grouped_running_sum (the same
        composite-order range-exchange machinery the grouped
        statistics entries use), and bin = (run − cnt) div budget_rows
        — the bin of the value's FIRST row, so a distinct value never
        splits across bins (heavy ties inflate ONE bin rather than
        break determinism or disjointness, and the whole layout is
        recomputable in ANSI SQL — which is exactly what the
        manifest_compact_cluster entry's oracle does).

        Effects: each object's parquet footer min/max on `cluster_col`
        (lifted into the manifest when `cluster_col` is in stats_cols)
        covers a range no other object of the partition overlaps, so
        `read_where(cluster_col, lo, hi)` scans EXACTLY the bins whose
        range intersects [lo, hi] — provable file skipping, vs every
        object of an unclustered table. Rows with NULL cluster values
        sort first (Spark ASC NULLS FIRST) into the lowest bin; they
        don't enter footer min/max and fail any range predicate, so
        disjointness and skipping are unaffected.

        Pure layout: the row multiset is untouched (`latest_state`
        semantics never enter). Loss guard, publish, and the
        create-exclusive manifest PUT crash protocol are shared with
        compact_with_plan (`_stage_publish_binned`); ALL previous
        objects retire — this is the full-table clustering pass; run
        the FFD `compact_with_plan` for incremental small-file
        maintenance between clustering passes."""
        from buskafkasparkstreaming_spark.operators.windows_fn import (
            grouped_running_sum,
        )
        from pyspark.sql.types import StructType

        m = self._current_manifest()
        if m is None:
            raise FileNotFoundError(f"no manifest at {self.path}")
        all_keys = {
            k for keys in m["partitions"].values() for k in keys
        }
        if not all_keys:
            return {
                val_str: {"before": 0, "after": 0}
                for val_str in m["partitions"]
            }
        nr = m.get("num_rows", {})

        def _rows(key: str) -> int:
            n = nr.get(key)
            if n is not None:
                return int(n)
            import pyarrow.parquet as pq

            return pq.read_metadata(os.path.join(self.path, key)).num_rows

        expected_rows = sum(_rows(k) for k in all_keys)
        keymap = self.spark.createDataFrame(
            [
                (k, val_str)
                for val_str, keys in m["partitions"].items()
                for k in keys
            ],
            "__key string, __part string",
        )
        schema = StructType.fromJson(m["schema"])
        if self.partition_col is not None:
            ptype = schema[self.partition_col].dataType
            data_schema = StructType(
                [f for f in schema.fields if f.name != self.partition_col]
            )
        else:
            data_schema = schema
        paths = [os.path.join(self.path, k) for k in sorted(all_keys)]
        # localCheckpoint (round-14 optimization): the tagged scan feeds
        # the cell aggregation (which grouped_running_sum evaluates twice
        # more: RangePartitioner sample + checkpoint materialization) AND
        # the final bin-tagging join — without the pin the many-small-
        # object read runs four times per clustering pass
        df = (
            self.spark.read.schema(data_schema)
            .parquet(*paths)
            .withColumn(
                "__key",
                F.regexp_extract(
                    F.input_file_name(),
                    "(" + re.escape(self.DATA_DIR)
                    + r"/[^/]+/[^/]+\.parquet)$",
                    1,
                ),
            )
            .join(F.broadcast(keymap), "__key")
            .localCheckpoint(eager=False)
        )
        cells = df.groupBy("__part", cluster_col).agg(
            F.count(F.lit(1)).cast("long").alias("__cnt")
        ).withColumn("__run", F.col("__cnt"))
        binned = grouped_running_sum(
            cells, ["__part"], [F.col(cluster_col).asc()], ["__run"]
        ).select(
            "__part",
            cluster_col,
            (
                (F.col("__run") - F.col("__cnt"))
                / F.lit(int(budget_rows))
            ).cast("long").alias("__bin"),
        )
        # broadcast the bin map (round-14 optimization): it is the
        # per-(partition, distinct value) cell frame — domain-sized, far
        # smaller than the data — and a hash join here would add a full
        # exchange of every row on (part, value) right before the
        # (part, bin) repartition the write needs anyway; broadcasting
        # leaves exactly ONE data exchange in the rewrite job
        out = df.join(F.broadcast(binned), ["__part", cluster_col])
        part_cols = ["__bindir"]
        if self.partition_col is not None:
            val = F.when(F.col("__part") == "\0null", F.lit(None)).otherwise(
                F.col("__part")
            )
            out = out.withColumn(self.partition_col, val.cast(ptype))
            part_cols = [self.partition_col, "__bindir"]
        out = (
            out.withColumn("__bindir", F.col("__bin"))
            .repartition(F.col("__part"), F.col("__bin"))
            .sortWithinPartitions(F.col(cluster_col).asc())
            .drop("__key", "__part", "__bin")
        )
        return self._stage_publish_binned(
            out, part_cols, m, all_keys, expected_rows, "compact_clustered"
        )

    def vacuum(
        self, keep_manifests: int = 1, writer_grace_seconds: float = 0.0
    ) -> list[str]:
        """Retire manifest versions older than the newest `keep_manifests`
        and delete data objects no RETAINED manifest references. The live
        set is the UNION over every retained manifest — keeping a manifest
        but deleting objects only it references would leave it a dangling
        pointer for the in-flight readers the retention grace period
        exists for (ADVICE r5, low). Always safe for READERS (they
        resolve a manifest first and read only its keys).

        With CONCURRENT WRITERS, a writer that has published its txn
        objects but not yet PUT its manifest has objects no manifest
        references; deleting them corrupts the manifest it is about to
        commit. `writer_grace_seconds` skips unreferenced objects younger
        than the grace window — set it above the longest expected
        stage-to-commit latency when other writers may be in flight
        (the Delta/Iceberg retention-threshold rule). The default 0
        matches the single-maintenance-process deployment where vacuum
        never races a writer."""
        d = self._manifest_dir()
        if not os.path.isdir(d):
            return []
        names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
        if not names:
            return []
        keep = max(1, keep_manifests)
        retained, retired = names[-keep:], names[:-keep]
        live: set[str] = set()
        for n in retained:
            with open(os.path.join(d, n), encoding="utf-8") as fh:
                body = json.load(fh)
            live |= {k for keys in body["partitions"].values() for k in keys}
        import time as _time

        cutoff = _time.time() - writer_grace_seconds
        removed = []
        data_root = os.path.join(self.path, self.DATA_DIR)
        for txn in os.listdir(data_root) if os.path.isdir(data_root) else []:
            tdir = os.path.join(data_root, txn)
            for fname in os.listdir(tdir):
                key = f"{self.DATA_DIR}/{txn}/{fname}"
                p = os.path.join(tdir, fname)
                if key not in live and os.path.getmtime(p) <= cutoff:
                    os.remove(p)
                    removed.append(key)
            if not os.listdir(tdir):
                os.rmdir(tdir)
        for n in retired:
            os.remove(os.path.join(d, n))
        return removed
