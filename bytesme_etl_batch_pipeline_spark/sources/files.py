"""File sources and sinks (SURVEY §2.1: S1–S4, S8, S9).

Reference behavior re-expressed Spark-first:

* S1/S2 — per-file ``pd.read_csv`` / ``csv.DictReader`` loops become ONE
  distributed CSV scan (reference: ``scripts/pipeline.py:48``,
  ``scripts/transform/seperate_tables.py:20-23``).
* S3 — ``glob.glob(dir + "*.csv")`` becomes a Spark path glob; per-file lineage
  is retained via ``input_file_name()`` instead of a driver-side loop
  (reference: ``scripts/pipeline.py:38-42``).
* S8/S9 — ``df.to_csv`` / ``json.dump`` become distributed writers.

Schemas are explicit by default (`inferSchema` is the fallback, SURVEY §1.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    *,
    header: bool = True,
    permissive: bool = True,
    with_lineage: bool = False,
    corrupt_col: str | None = None,
    multi_line: bool = True,
) -> DataFrame:
    """S1/S2/S3: distributed CSV scan over a file, directory, or glob.

    ``permissive`` maps the reference's per-file try/except tolerance
    (``scripts/pipeline.py:94-111``) to row-level tolerance: a malformed row
    becomes NULL fields instead of failing the file. To QUARANTINE malformed
    rows for inspection, pass ``corrupt_col`` (requires an explicit
    ``schema``): the raw line of each bad row lands in that column and good
    rows have it NULL.

    ``with_lineage`` adds ``source_file`` + ``row_pos`` — the stable ordering
    key that keep-first dedup and surrogate-key assignment need (SURVEY §7
    hard part 2); pandas got this ordering for free, Spark must capture it.
    ``row_pos`` is the 0-based position WITHIN its file (multiLine forces one
    split per file, so in-partition order IS file order), which is stable
    across runs/parallelism — a raw ``monotonically_increasing_id`` embeds
    the partition index and is not.

    ``multi_line`` (default True, correctness-first: quoted embedded
    newlines parse as one row) makes each CSV file NON-SPLITTABLE — one
    scan task per file regardless of size. For a huge single CSV whose
    fields are known newline-free, pass ``multi_line=False`` to get
    splittable scans (``maxPartitionBytes``-sized tasks). Lineage REQUIRES
    multi-line mode: ``row_pos`` stability depends on one-split-per-file.
    """
    from pyspark.sql.types import StringType

    if with_lineage and not multi_line:
        raise ValueError(
            "with_lineage=True requires multi_line=True — row_pos is only "
            "stable when each file scans as one split"
        )
    reader = (
        spark.read.option("header", header)
        .option("multiLine", multi_line)
        .option("escape", '"')
        .option("mode", "PERMISSIVE" if permissive else "FAILFAST")
    )
    if corrupt_col is not None:
        if schema is None:
            raise ValueError("corrupt_col capture requires an explicit schema")
        # StructType.add MUTATES in place (and returns self), and
        # StructType(fields) keeps the passed LIST by reference — copy the
        # list too, or the CALLER's schema object permanently gains the
        # corrupt column (duplicated on the next call)
        schema = StructType(list(schema.fields)).add(corrupt_col, StringType())
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if with_lineage:
        from pyspark.sql import Window

        df = df.withColumn("source_file", F.input_file_name()).withColumn(
            "row_pos",
            F.row_number().over(
                Window.partitionBy("source_file").orderBy(
                    F.monotonically_increasing_id()
                )
            )
            - 1,
        )
    return df


def read_json(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """S4: JSON scan (reference reads ``{site: [urls]}`` maps via json.load)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.option("multiLine", True).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S8: CSV sink (reference: ``df.to_csv(path, index=False)`` and DictWriter
    appends). Distributed, header on, overwrite/append via ``mode``.
    Escape matches ``read_csv`` (RFC doubled-quote) so the engine's own
    output round-trips — the writer's default backslash escape would be
    misparsed by the reader for any field containing a quote."""
    df.write.mode(mode).option("header", True).option("escape", '"').csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S9: JSON sink."""
    df.write.mode(mode).json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Columnar sink — the engine's preferred landing format at scale.
    ``compression``: zstd is the 100 TB default trade (parquet's snappy
    default costs ~30-40% more storage/scan bytes for little CPU win on
    modern cores); pass None to keep the session default."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> int:
    """Small-file compaction into a SECOND location: rewrite a parquet
    directory into files of ~``target_file_mb``. Streaming sinks and
    fine-grained partition writes accumulate tiny files whose per-file
    open/footer cost dominates scans at scale; periodic compaction is
    standard hygiene. A hive-partitioned source is compacted PER LEAF
    partition directory (each leaf is a plain parquet dir), so every
    partition gets its own exact byte-based sizing — a hot partition
    splits into many right-sized files instead of one giant one — and
    the layout is reproduced at the destination. Returns the number of
    output data files. (``compact_parquet_inplace`` is the variant to
    use when no second location is wanted.) A source partition parked at
    ``<leaf>__retired`` by a crashed earlier in-place maintenance run is
    restored before enumeration (else the copy would silently omit it);
    a MIXED layout (loose data files above the leaf level) raises instead
    of silently dropping the loose files."""
    # root recovery too: a crashed in-place run can park the WHOLE source
    # at <src>__retired — without this, os.listdir(src) below would raise
    recover_retired(src_path)
    recover_retired_tree(src_path)
    total = 0
    for rel in _partition_leaf_dirs(src_path):
        src = os.path.join(src_path, rel) if rel else src_path
        dst = os.path.join(dst_path, rel) if rel else dst_path
        total += _compact_flat_dir(spark, src, dst, target_file_mb)
    return total


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite", partition_by: list[str] | None = None
) -> None:
    """ORC sink — second columnar landing format (Hive-ecosystem targets);
    same partitioned layout contract as ``write_parquet``."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — predicate pushdown and column pruning apply as with
    parquet (Spark's native vectorized ORC reader)."""
    return spark.read.orc(path)


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """XML scan (native since Spark 4): one row per ``row_tag`` element —
    the ingest shape for sitemaps (`<urlset><url>...`), RSS/Atom feeds and
    XML API dumps a crawl pipeline meets upstream of the HTML fetch.
    Schema inference samples the files; pass ``schema`` on big inputs to
    skip the extra pass (same discipline as ``read_csv``). Files split per
    file, not within one (row boundaries need the tag scan), so shard
    large dumps into many files upstream."""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str,
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    """XML sink — interchange with XML-consuming systems; one
    ``row_tag`` element per row under ``root_tag`` per output file."""
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .save(path)
    )


def read_text(
    spark: SparkSession,
    path: str,
    wholetext: bool = False,
    line_sep: str | None = None,
    with_lineage: bool = False,
) -> DataFrame:
    """Raw text scan — the corpus-ingest primitive for line-oriented dumps
    (one row per line, column ``value``) or whole-file documents
    (``wholetext=True`` — one row per file, the natural shape for a
    file-per-document crawl drop). ``with_lineage`` tags rows with their
    source file the same way ``read_csv(with_lineage=True)`` does, so a
    100 TB ingest keeps file-level provenance through every downstream
    dedup/filter stage."""
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    # NB: wholetext must go through the text() argument — the DataFrameReader
    # option of the same name is ignored by the PySpark text() entry point
    df = reader.text(path, wholetext=wholetext)
    if with_lineage:
        df = df.withColumn("source_file", F.input_file_name())
    return df


def write_text(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Text sink: exactly one string column (Spark contract) — the JSONL /
    plain-corpus emit path when paired with ``to_json``."""
    df.write.mode(mode).text(path)


def read_binary_files(
    spark: SparkSession, path: str, path_glob: str | None = None
) -> DataFrame:
    """Binary-file scan (``binaryFile`` format): one row per file with
    (path, modificationTime, length, content) — the media-ingest source
    that feeds ``operators/multimodal`` decode/featurize stages. The
    ``pathGlobFilter`` prunes at FILE LISTING time (no bytes read for
    non-matching files); content bytes stream lazily per matched file, so
    the scan parallelizes across files without loading any of them on the
    driver."""
    reader = spark.read.format("binaryFile")
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.load(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present in
    ``df``, leaving every other partition untouched — the idempotent
    incremental-batch sink (re-running one day's load never clobbers
    history, and a retry of the same batch converges to the same state).
    The per-write ``partitionOverwriteMode=dynamic`` option scopes the
    behavior to this write, so the session default (STATIC — full-table
    overwrite) stays safe for non-incremental writers."""
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_by)
        .parquet(path)
    )


def protocol_sibling(base_path: str, kind: str) -> str:
    """Path of the staging-swap protocol dir for ``base_path``: a
    DOT-PREFIXED sibling (``.<name>__staging`` / ``.<name>__retired``) in
    the same parent directory. The dot prefix is the invisibility
    guarantee (ADVICE r4, medium): Spark/Hadoop file listing skips any
    path whose name starts with ``.`` — unconditionally, even when the
    name contains ``=`` (an underscore prefix is NOT enough: partition
    discovery exempts ``_``-names containing ``=``) — so a reader
    scanning a partitioned table root during the swap window, or between
    a crash and the retry, can never pick up a protocol dir as a junk
    ``key=value__staging`` partition or read its rows twice. Python
    ``glob`` likewise skips dot-entries, which keeps these dirs out of
    leaf enumeration for free; recovery walks with ``os.walk`` (which
    does see them)."""
    trimmed = base_path.rstrip("/")
    parent, name = os.path.split(trimmed)
    return os.path.join(parent, f".{name}__{kind}")


def recover_retired(base_path: str) -> None:
    """Crash recovery shared by every staging-swap publisher: a crash
    between ``rename(base -> retired)`` and ``rename(staging -> base)``
    leaves the retired sibling holding the ONLY complete copy. Restore
    it before reading/merging — otherwise the caller would treat the
    table as a first load and the sole surviving copy would be deleted at
    publish time. Also restores the LEGACY (pre-dot-prefix)
    ``<base>__retired`` spelling: a table parked by a writer from before
    the protocol dirs went hidden would otherwise read as a first load —
    silent data loss on upgrade."""
    if os.path.exists(base_path):
        return
    for retired in (
        protocol_sibling(base_path, "retired"),
        base_path.rstrip("/") + "__retired",  # legacy spelling
    ):
        if os.path.exists(retired):
            os.rename(retired, base_path)
            return


def publish_staging_swap(base_path: str) -> None:
    """Crash-atomic publish shared by every staging-swap writer (MERGE,
    incremental rollup, in-place compaction): the COMPLETE new generation
    must already sit at ``protocol_sibling(base, "staging")``; swap it in
    via rename-aside. Ordering invariant: the previous generation (base,
    then the retired sibling) survives until the new base is in place, so
    a crash at any point leaves a complete copy that ``recover_retired``
    (or the final cleanup of the next run) converges. NOT reader-atomic:
    between the two renames the base path briefly does not exist, so a
    concurrent reader can hit a transient path-not-found — retry,
    schedule off-peak, or use a catalog-level swap (the JDBC sink
    restores availability at entry; plain directories have no catalog to
    indirect through). The protocol dirs themselves are DOT-PREFIXED
    siblings, invisible to Spark file listing (see ``protocol_sibling``),
    so a partitioned-table reader racing a per-leaf swap sees at worst
    the transient path-not-found — never duplicate rows or a junk
    partition value. Single WRITER assumed per table: two concurrent
    publishers would race on the same staging dir — serialize
    maintenance jobs externally. The dot-prefixed ``__staging`` /
    ``__retired`` sibling names are reserved."""
    import shutil

    staging = protocol_sibling(base_path, "staging")
    retired = protocol_sibling(base_path, "retired")
    if os.path.exists(retired):
        shutil.rmtree(retired)
    if os.path.exists(base_path):
        os.rename(base_path, retired)
    os.rename(staging, base_path)
    shutil.rmtree(retired, ignore_errors=True)


#: Reserved directory-name suffixes of the staging-swap publish protocol
#: (``publish_staging_swap``). A ``.<leaf>__retired`` / ``.<leaf>__staging``
#: sibling left by a crash mid-swap is PROTOCOL state, not a partition —
#: enumerating it as one would compact a retired generation in place
#: (silently renaming the partition value) or read a staging dir another
#: leaf's swap is about to consume. Protocol dirs are dot-prefixed (see
#: ``protocol_sibling``) so Spark listing and Python glob skip them; this
#: name check is the defensive second layer for explicit ``os.listdir``
#: walks, and still matches pre-dot-prefix leftovers.
_RESERVED_SUFFIXES = ("__retired", "__staging")


def _is_reserved_dir(name: str) -> bool:
    return name.endswith(_RESERVED_SUFFIXES)


def _hive_partition_keys(path: str) -> list[str]:
    """Detect hive-style partition keys (``key=value`` directory levels)
    under ``path``, outermost first. Empty list = unpartitioned table."""
    keys: list[str] = []
    cur = path
    while True:
        subs = [
            d
            for d in sorted(os.listdir(cur))
            if "=" in d
            and not _is_reserved_dir(d)
            and os.path.isdir(os.path.join(cur, d))
        ]
        if not subs:
            return keys
        keys.append(subs[0].split("=", 1)[0])
        cur = os.path.join(cur, subs[0])


def recover_retired_tree(path: str) -> None:
    """Per-LEAF crash recovery for partitioned staging-swap writers: restore
    every ``.<dir>__retired`` sibling under ``path`` whose base dir is
    missing (the mid-swap crash window of ``publish_staging_swap``, at any
    partition depth). Run BEFORE enumerating partition leaves — a leaf
    parked at its retired sibling has no base dir to enumerate, so without
    this sweep the retry would never restore (or even see) that partition.
    Walks with ``os.walk`` (NOT glob): protocol dirs are dot-prefixed
    precisely so glob and Spark listing skip them."""
    suffix = "__retired"
    if not os.path.isdir(path):
        return
    # fixpoint: a restored dir may itself contain a parked descendant that
    # this walk's snapshot could not see — re-walk until nothing moves.
    # Legacy (pre-dot-prefix) parked dirs are restored too: a crash from
    # before the protocol rename must not strand a partition on upgrade.
    moved = True
    while moved:
        moved = False
        for root, dirs, _files in os.walk(path):
            for d in list(dirs):
                if d.endswith(suffix):
                    name = d[1:] if d.startswith(".") else d
                    base = os.path.join(root, name[: -len(suffix)])
                    if not os.path.exists(base):
                        recover_retired(base)
                        moved = True
                if d.endswith(_RESERVED_SUFFIXES):
                    # protocol dir (retired OR staging, dot-prefixed or
                    # legacy): never descend — os.walk sees dot-entries, and
                    # a parked retired dir inside an abandoned half-written
                    # staging dir must not be "restored" INSIDE protocol
                    # state (ADVICE r5)
                    dirs.remove(d)


def _partition_leaf_dirs(path: str) -> list[str]:
    """Relative paths of every leaf ``key=value`` partition directory
    under ``path`` (``[""]`` for an unpartitioned table) — the unit of
    per-partition compaction: each leaf is itself a plain parquet dir.
    Reserved ``__retired``/``__staging`` siblings (crash leftovers of the
    swap protocol) are never leaves. Raises on a MIXED layout (data files
    at a non-leaf level alongside partition dirs): per-leaf rewrites would
    silently drop the loose files, and Spark cannot attach partition
    values to them either — such a table needs repair, not compaction."""
    import glob as _glob

    keys = _hive_partition_keys(path)
    if not keys:
        return [""]
    for level in range(len(keys)):
        level_pattern = os.path.join(path, *["*=*"] * level, "*")
        loose = [
            f
            for f in _glob.glob(level_pattern)
            if os.path.isfile(f)
            and not os.path.basename(f).startswith(("_", "."))
            and not any(_is_reserved_dir(p) for p in
                        os.path.relpath(f, path).split(os.sep)[:-1])
        ]
        if loose:
            raise ValueError(
                f"mixed layout under {path!r}: data file {loose[0]!r} sits at "
                f"partition level {level} (above the {keys} leaf level); "
                "per-partition compaction would silently drop it — repair the "
                "table layout first"
            )
    pattern = os.path.join(path, *["*=*"] * len(keys))
    return sorted(
        os.path.relpath(d, path)
        for d in _glob.glob(pattern)
        if os.path.isdir(d)
        and not any(
            _is_reserved_dir(p) for p in os.path.relpath(d, path).split(os.sep)
        )
    )


def _dir_data_bytes(path: str) -> int:
    import glob as _glob

    return sum(
        os.path.getsize(f)
        for f in _glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    )


def _compact_flat_dir(
    spark: SparkSession, src: str, dst: str, target_file_mb: int
) -> int:
    """Rewrite ONE plain parquet dir into ceil(bytes/target) files at
    ``dst`` (``src == dst`` → in-place via the crash-safe staging swap).
    Shared by both compaction variants so sizing and publish exist once."""
    import glob as _glob

    inplace = os.path.abspath(src) == os.path.abspath(dst)
    if inplace:
        recover_retired(src)
    n_out = max(1, -(-_dir_data_bytes(src) // (target_file_mb * 1024 * 1024)))
    out_dir = protocol_sibling(src, "staging") if inplace else dst
    spark.read.parquet(src).repartition(n_out).write.mode("overwrite").parquet(out_dir)
    if inplace:
        publish_staging_swap(src)
    return len(
        [f for f in _glob.glob(os.path.join(dst, "*.parquet")) if os.path.isfile(f)]
    )


def compact_parquet_inplace(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 128,
) -> int:
    """IN-PLACE small-file compaction with the crash-safe staging swap:
    rewrite a live parquet table into ~``target_file_mb`` files without a
    second location. The maintenance job for long-lived landing zones —
    streaming sinks and per-batch appends accumulate tiny files whose
    open/footer cost dominates 100 TB scans; compaction is pure layout,
    so a crash at any publish step loses nothing and a re-run converges
    (same rows, fresh layout). A hive-partitioned table is compacted PER
    LEAF partition directory: exact byte-based sizing per partition (a
    hot partition splits into many right-sized files), the directory
    layout — and with it partition pruning — is never rewritten, and a
    crash mid-table leaves every leaf complete (some compacted, some not
    yet — layout-only, so always correct). Recovery runs at the table
    root before leaf enumeration, so a retry from the unpartitioned
    mid-swap window (base parked at ``__retired``) restores the table it
    is about to list; per-LEAF recovery (``recover_retired_tree``) then
    restores any partition parked at ``<leaf>__retired`` by a crash
    mid-swap — without it the parked leaf has no base dir to enumerate
    and the retry would strand (or, worse, compact the ``__retired`` dir
    AS a partition, silently renaming its value).

    Durability vs concurrency: the swap is crash-ATOMIC (a complete copy
    always survives; see ``publish_staging_swap``) but NOT reader-atomic
    — between the two renames the directory briefly does not exist, so a
    concurrent reader can hit a transient path-not-found (per leaf, for
    partitioned tables). That transient miss is the ONLY reader-visible
    artifact even on partitioned tables: the staging/retired siblings are
    dot-prefixed (``protocol_sibling``), which Spark's file listing skips
    unconditionally, so a root-scanning reader during the swap window —
    or between a crash and the retry — never sees duplicated rows or a
    junk ``key=value__staging`` partition value (ADVICE r4). Schedule
    against live tables accordingly, or use the catalog-swap JDBC sink
    shape where readers must never miss.
    Returns the number of data files after compaction."""
    recover_retired(path)
    recover_retired_tree(path)
    total = 0
    for rel in _partition_leaf_dirs(path):
        leaf = os.path.join(path, rel) if rel else path
        total += _compact_flat_dir(spark, leaf, leaf, target_file_mb)
    return total


def merge_upsert_parquet(
    spark: SparkSession,
    base_path: str,
    updates: DataFrame,
    key_cols: list[str],
    version_col: str,
    delete_col: str | None = None,
    allow_schema_evolution: bool = False,
) -> int:
    """Copy-on-write MERGE INTO for a plain-parquet table: apply a change
    batch (latest ``version_col`` wins per key; rows whose ``delete_col``
    is true are removed) and publish the merged table ATOMICALLY.

    Schema contract: by default the change batch must carry exactly the
    stored columns — a batch missing one would otherwise silently DROP
    that column from the whole table, and a batch adding one would fail
    deep inside the union. Set ``allow_schema_evolution=True`` to merge
    by name instead: added columns appear with NULL for historical rows,
    and a column the batch omits is preserved (the batch's rows get NULL
    for it — "not provided", not "delete the column").

    Write protocol (the file-layer twin of
    ``jdbc.write_jdbc_exactly_once``): the merged result lands in the
    dot-prefixed ``.<base>__staging`` sibling first; only after that
    write fully succeeds does the old table move to ``.<base>__retired``
    and the staging directory take its place — readers see the old table
    or the new one, never a half-written mix, and a crash mid-publish
    leaves a recoverable staging dir that the next run overwrites. The
    dot-prefixed sibling names are reserved (``protocol_sibling``) and
    invisible to Spark file listing.

    Merge semantics are ``operators/cdc``-style latest-change-wins,
    expressed as one window over the union — a keyed shuffle, no driver
    state. Missing base (first load) bootstraps from the updates alone.
    Returns the merged row count.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as _F

    staging = protocol_sibling(base_path, "staging")
    recover_retired(base_path)
    if os.path.exists(base_path):
        base = spark.read.parquet(base_path)
        added = set(updates.columns) - set(base.columns)
        missing = set(base.columns) - set(updates.columns)
        if (added or missing) and not allow_schema_evolution:
            raise ValueError(
                f"change batch schema differs from stored table at "
                f"{base_path}: added={sorted(added)} missing={sorted(missing)}. "
                "Pass allow_schema_evolution=True to merge by name."
            )
        # base rows rank below any update at the same version: change
        # batches REPLACE, re-applying an already-applied batch is a no-op
        unioned = base.withColumn("__src", _F.lit(0)).unionByName(
            updates.withColumn("__src", _F.lit(1)),
            allowMissingColumns=True,
        )
    else:
        unioned = updates.withColumn("__src", _F.lit(1))
    w = Window.partitionBy(*key_cols).orderBy(
        _F.col(version_col).desc(), _F.col("__src").desc()
    )
    merged = (
        unioned.withColumn("__rn", _F.row_number().over(w))
        .filter(_F.col("__rn") == 1)
        .drop("__rn", "__src")
    )
    if delete_col is not None:
        merged = merged.filter(~_F.coalesce(_F.col(delete_col), _F.lit(False)))
    merged.write.mode("overwrite").parquet(staging)
    n = spark.read.parquet(staging).count()
    publish_staging_swap(base_path)
    return n
