"""File-capability layer: listing, matching, and the four verbs
(ingest / publish / move / remove) over Hadoop FileSystem.

This is the Spark-native re-expression of the reference's entire
control surface (SURVEY.md §2.1):

- listing        — R5-R8 (download_file.py:167-217, move_file.py:86-103,
                   remove_files.py:83-93, upload_file.py:174-182)
- regex/exact match — R9/R10 (download_file.py:220-229 + exact branches)
- destination projection — R11-R16 (via s3spark.naming)
- ingest (≈download, R17 download_file.py:232-246)
- publish (≈upload, R18 upload_file.py:197-216)
- move (copy+delete, R19 move_file.py:125-154)
- remove (R20 remove_files.py:96-116)

Design (SURVEY.md §3.2): the *matched-file set* is computed as a
DataFrame (distributed listing via the ``binaryFile`` source when the
prefix is huge; driver-side ``FileSystem.listFiles`` for metadata-only
listings), while the verbs themselves are Hadoop FileSystem calls —
metadata/byte operations, path-scheme agnostic, so ``file://`` in tests
and ``s3a://`` in production traverse identical code.

Deliberate divergences from reference bugs (SURVEY.md §8): full
pagination always (D1/D2 — Hadoop's RemoteIterator pages internally),
typed S3NoMatches instead of KeyError on empty prefix (D3), enumerate
only when >1 match (D4), files-only listings (D5).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from s3spark import naming
from s3spark.errors import S3FileNotFound, S3InvalidRegex, S3NoMatches

LISTING_SCHEMA = StructType(
    [
        StructField("path", StringType(), False),
        StructField("name", StringType(), False),
        StructField("size", LongType(), False),
        StructField("mtime", TimestampType(), True),
    ]
)

EXACT_MATCH = "exact_match"
REGEX_MATCH = "regex_match"


# ------------------------------------------------------------------ plumbing


_AUTH_MARKERS = (
    "access denied",
    "accessdenied",
    "status code: 403",
    "status code: 401",
    "invalidaccesskeyid",
    "signaturedoesnotmatch",
    "nocredential",
    "no aws credentials",
    "unable to load credentials",
)


def classify_fs_error(exc: Exception) -> Exception:
    """Map store-layer failures onto the reference error taxonomy:
    auth/credential failures → S3InvalidCredentials (exit 202,
    move_file.py:117-122); everything else passes through."""
    from s3spark.errors import S3InvalidCredentials

    msg = str(exc).lower()
    if any(m in msg for m in _AUTH_MARKERS):
        return S3InvalidCredentials(str(exc))
    return exc


def _jvm_fs(spark: SparkSession, url: str):
    """Hadoop FileSystem for a URL's scheme (file://, s3a://, ...).

    Checksum sidecars (.crc) are disabled: the reference moves opaque
    bytes 1:1; LocalFileSystem's checksum files would pollute listings.
    Connection/auth failures surface as S3InvalidCredentials (202).
    """
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    uri = jvm.java.net.URI.create(url)
    try:
        fs = jvm.org.apache.hadoop.fs.FileSystem.get(uri, conf)
    except Exception as e:  # Py4JJavaError carries the JVM message
        raise classify_fs_error(e) from e
    _disable_checksums(fs)
    return fs


def _disable_checksums(fs) -> None:
    """Turn off .crc sidecars on a Hadoop FileSystem handle.

    Some FileSystem impls reject the checksum setters
    (UnsupportedOperation) — that is tolerable and ignored.  But a
    filesystem that authenticates lazily may surface its credential
    failure HERE, and silence would misreport exit 202 as a generic
    downstream error: classify first, swallow only the non-auth case.
    """
    from s3spark.errors import S3InvalidCredentials

    try:
        fs.setWriteChecksum(False)
        fs.setVerifyChecksum(False)
    except Exception as e:
        classified = classify_fs_error(e)
        if isinstance(classified, S3InvalidCredentials):
            raise classified from e


def _jpath(spark: SparkSession, url: str):
    return spark._jvm.org.apache.hadoop.fs.Path(url)


# ------------------------------------------------------------------- listing


def list_paths(
    spark: SparkSession,
    url: str,
    suffix: str | None = None,
    recursive: bool = True,
) -> list[str]:
    """Driver-side list of file paths under a prefix via the Hadoop
    FileSystem — the scheme-agnostic metadata walk (file://, s3a://,
    ...) for callers that need a plain Python list (manifest diffs,
    commit-file enumeration), not a DataFrame.

    Replaces ad-hoc ``os.walk`` in query paths (round-12 ADVICE:
    a local-only walk silently returns nothing on remote scratch).
    ``suffix`` filters by file-name suffix (e.g. ``".parquet"``).
    Raises :class:`S3FileNotFound` on a missing prefix, like
    :func:`list_files`.  Driver-side by design: commit manifests are
    bounded metadata (one entry per committed file), never corpus-
    sized — huge prefixes belong on :func:`list_files_auto`.

    Local prefixes (no scheme, or ``file:``) take an os.walk fast
    path: the Hadoop RemoteIterator costs one py4j round-trip per
    entry (measured 0.62x on the manifest-diff key — ~1 s of JVM
    chatter to list ~90 files), which is pure overhead when the
    driver can stat the directory directly.  Any other scheme goes
    through the Hadoop FileSystem, so s3a:// scratch lists correctly
    instead of silently returning nothing.
    """
    import os as _os
    from urllib.parse import urlparse

    scheme = urlparse(url).scheme
    if scheme in ("", "file"):
        root = url[len("file://"):] if url.startswith("file://") else (
            url[len("file:"):] if url.startswith("file:") else url
        )
        if not _os.path.exists(root):
            raise S3FileNotFound(f"no such path: {url}")
        out_local: list[str] = []
        if recursive:
            for dirpath, _dirs, files in _os.walk(root):
                out_local.extend(
                    _os.path.join(dirpath, f)
                    for f in files
                    if suffix is None or f.endswith(suffix)
                )
        else:
            out_local.extend(
                _os.path.join(root, f)
                for f in _os.listdir(root)
                if _os.path.isfile(_os.path.join(root, f))
                and (suffix is None or f.endswith(suffix))
            )
        return out_local

    fs = _jvm_fs(spark, url)
    path = _jpath(spark, url)
    if not fs.exists(path):
        raise S3FileNotFound(f"no such path: {url}")
    out: list[str] = []
    it = fs.listFiles(path, recursive)
    while it.hasNext():
        p = it.next().getPath().toString()
        if suffix is None or p.endswith(suffix):
            out.append(p)
    return out


def list_files(spark: SparkSession, url: str, recursive: bool = True) -> DataFrame:
    """Listing DataFrame ``(path, name, size, mtime)`` for a prefix.

    Driver-side metadata walk via ``FileSystem.listFiles`` — the Hadoop
    RemoteIterator pages through S3 LIST responses internally, so >1000
    keys are handled correctly (fixes reference bugs D1/D2). Files only
    (D5). Raises :class:`S3FileNotFound` (exit 201) on a missing prefix,
    matching move_file.py:100-103.
    """
    import datetime

    fs = _jvm_fs(spark, url)
    path = _jpath(spark, url)
    if not fs.exists(path):
        raise S3FileNotFound(f"no such path: {url}")
    rows = []
    it = fs.listFiles(path, recursive)
    while it.hasNext():
        st = it.next()
        p = st.getPath().toString()
        rows.append(
            (
                p,
                naming.basename(p),
                st.getLen(),
                # tz-aware UTC: naive datetimes would be reinterpreted in
                # the driver's OS timezone by TimestampType.toInternal,
                # shifting mtime on any non-UTC driver
                datetime.datetime.fromtimestamp(
                    st.getModificationTime() / 1000.0, tz=datetime.timezone.utc
                ),
            )
        )
    return spark.createDataFrame(rows, LISTING_SCHEMA)


# Above this many entries the driver-side RemoteIterator walk is
# abandoned mid-stream and the listing re-issued as a distributed scan
# (a 100M-object prefix must never serialize through one Python loop —
# the failure mode the reference's own pagination bug foreshadowed).
DRIVER_LISTING_THRESHOLD = 10_000


def list_files_auto(
    spark: SparkSession,
    url: str,
    threshold: int = DRIVER_LISTING_THRESHOLD,
    recursive: bool = True,
) -> DataFrame:
    """Listing DataFrame with automatic driver/distributed routing.

    Walks the driver-side iterator (cheap, no job) until ``threshold``
    entries, then cuts over to :func:`list_files_distributed` so huge
    prefixes are listed by executor tasks instead of a driver loop.
    The abandoned probe work is bounded by ``threshold`` entries (~10
    S3 LIST pages at the default), independent of prefix size — the
    distributed listing pays the full cost exactly once.  ``recursive``
    mirrors :func:`list_files` and is honored on both routes.
    """
    import datetime

    fs = _jvm_fs(spark, url)
    path = _jpath(spark, url)
    if not fs.exists(path):
        raise S3FileNotFound(f"no such path: {url}")
    rows = []
    it = fs.listFiles(path, recursive)
    while it.hasNext():
        if len(rows) >= threshold:
            return list_files_distributed(spark, url, recursive=recursive)
        st = it.next()
        p = st.getPath().toString()
        rows.append(
            (
                p,
                naming.basename(p),
                st.getLen(),
                datetime.datetime.fromtimestamp(
                    st.getModificationTime() / 1000.0, tz=datetime.timezone.utc
                ),
            )
        )
    return spark.createDataFrame(rows, LISTING_SCHEMA)


def list_files_distributed(
    spark: SparkSession, url: str, recursive: bool = True
) -> DataFrame:
    """Listing DataFrame via the ``binaryFile`` source: file discovery
    uses Spark's InMemoryFileIndex (parallelized past
    ``spark.sql.sources.parallelPartitionDiscovery.threshold``) and the
    scan is executed by tasks — the 100 TB path for huge prefixes.
    Column pruning drops ``content``, so no file bytes are read.
    """
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true" if recursive else "false")
        .load(url)
        .select(
            F.col("path"),
            naming.col_basename(F.col("path")).alias("name"),
            F.col("length").alias("size"),
            F.col("modificationTime").alias("mtime"),
        )
    )


# ------------------------------------------------------------------ matching


def col_key_relative(path):
    """Store-relative text of a listing URL — what the reference's regex
    actually sees: the bucket-relative key on S3 (download_file.py:226
    matches ``folder/file`` keys, never ``s3://bucket/...``) or the
    absolute local path on upload (upload_file.py:191 globs absolute
    paths, no scheme). ``s3a://bucket/key`` → ``key``;
    ``file:/tmp/x`` → ``/tmp/x``. Keeps scheme/bucket text out of the
    match so anchored patterns (``^data/``) and bucket-name overlaps
    behave exactly like the reference."""
    # scheme://authority/rest  →  rest   (S3A, hdfs, ...)
    rel = F.regexp_replace(path, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/]*/", "")
    # scheme:/rest (no authority; Hadoop renders file:/tmp/x)  →  /rest
    return F.regexp_replace(rel, r"^[a-zA-Z][a-zA-Z0-9+.\-]*:(?=/)", "")


def match_files(
    listing: DataFrame,
    pattern: str,
    match_type: str = REGEX_MATCH,
) -> DataFrame:
    """Filter a listing like the reference matches keys (R9/R10).

    ``regex_match`` is an unanchored ``re.search`` (→ ``rlike``) over
    the store-relative key text (download_file.py:226 sees the
    bucket-relative key; upload_file.py:191 the absolute local path —
    see :func:`col_key_relative`); ``exact_match`` compares the
    full path. Raises :class:`S3InvalidRegex` (203) on a bad pattern.
    """
    if match_type == REGEX_MATCH:
        try:
            re.compile(pattern)
        except re.error as e:
            raise S3InvalidRegex(f"invalid regex {pattern!r}: {e}") from e
        return listing.filter(col_key_relative(F.col("path")).rlike(pattern))
    # exact match: Hadoop renders URIs with a scheme (file:/x, s3a://b/k);
    # accept the raw path too so callers can pass plain absolute paths
    stripped = F.regexp_replace(
        F.col("path"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*:/{0,2}", "/"
    )
    return listing.filter(
        (F.col("path") == pattern) | (stripped == F.lit(pattern))
    )


def _collect_matches(
    spark: SparkSession,
    source_url: str,
    source_folder: str,
    source_file: str,
    match_type: str,
) -> list[str]:
    """List + match + collect source paths (driver-side planning step).

    The collect() here is a metadata operation over matched *paths*
    (bounded by match count), never data rows. Listing routes through
    :func:`list_files_auto`: small prefixes stay on the driver, huge
    ones are listed by a distributed scan.
    """
    folder = naming.clean_folder_name(source_folder)
    base = f"{source_url.rstrip('/')}/{folder}" if folder else source_url.rstrip("/")
    if match_type == EXACT_MATCH:
        full = f"{base.rstrip('/')}/{source_file}"
        fs = _jvm_fs(spark, full)
        if not fs.exists(_jpath(spark, full)):
            raise S3FileNotFound(f"no such file: {full}")
        return [full]
    listing = list_files_auto(spark, base)
    matched = match_files(listing, source_file, REGEX_MATCH)
    paths = [r.path for r in matched.select("path").orderBy("path").collect()]
    if not paths:
        raise S3NoMatches(
            f"no files matching {source_file!r} under {base} "
            f"(reference exit 1, upload_file.py:241-243)"
        )
    return paths


def _plan_destinations(
    paths: list[str],
    dest_url: str,
    dest_folder: str,
    dest_file: str | None,
) -> list[tuple[str, str]]:
    """(source, destination) pairs with reference naming semantics:
    explicit name enumerated iff >1 match (D4), else source basename."""
    folder = naming.clean_folder_name(dest_folder)
    many = len(paths) > 1
    out = []
    for i, src in enumerate(sorted(paths), start=1):
        name = naming.destination_file_name(
            source_full_path=src,
            dest_file_name=dest_file,
            file_number=i if (dest_file and many) else None,
        )
        key = naming.combine_folder_and_file_name(folder, name) if folder else name
        out.append((src, f"{dest_url.rstrip('/')}/{key}"))
    return out


# -------------------------------------------------------------------- verbs


@dataclass
class VerbResult:
    """What a verb did: (source, destination) per file (dest=None for remove)."""

    files: list[tuple[str, str | None]]

    @property
    def count(self) -> int:
        return len(self.files)


def _copy(spark: SparkSession, src: str, dst: str, delete_source: bool) -> None:
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sp, dp = _jpath(spark, src), _jpath(spark, dst)
    sfs, dfs = _jvm_fs(spark, src), _jvm_fs(spark, dst)
    parent = dp.getParent()
    if parent is not None and not dfs.exists(parent):
        dfs.mkdirs(parent)  # reference makedirs, download_file.py:261-263
    ok = jvm.org.apache.hadoop.fs.FileUtil.copy(sfs, sp, dfs, dp, delete_source, True, conf)
    if not ok:
        raise S3FileNotFound(f"copy failed: {src} -> {dst}")


def ingest(
    spark: SparkSession,
    *,
    source_url: str,
    source_file: str,
    source_folder: str = "",
    match_type: str = EXACT_MATCH,
    dest_url: str,
    dest_folder: str = "",
    dest_file: str | None = None,
) -> VerbResult:
    """≈ reference download (R17): remote → local byte copy per match."""
    paths = _collect_matches(spark, source_url, source_folder, source_file, match_type)
    pairs = _plan_destinations(paths, dest_url, dest_folder, dest_file)
    for src, dst in pairs:
        _copy(spark, src, dst, delete_source=False)
    return VerbResult(files=list(pairs))


def publish(
    spark: SparkSession,
    *,
    source_url: str,
    source_file: str,
    source_folder: str = "",
    match_type: str = EXACT_MATCH,
    dest_url: str,
    dest_folder: str = "",
    dest_file: str | None = None,
) -> VerbResult:
    """≈ reference upload (R18): local → remote. Same engine path as
    ingest — Hadoop FileSystem is symmetric (multipart via fs.s3a.*)."""
    return ingest(
        spark,
        source_url=source_url,
        source_file=source_file,
        source_folder=source_folder,
        match_type=match_type,
        dest_url=dest_url,
        dest_folder=dest_folder,
        dest_file=dest_file,
    )


def move(
    spark: SparkSession,
    *,
    source_url: str,
    source_file: str,
    source_folder: str = "",
    match_type: str = EXACT_MATCH,
    dest_url: str,
    dest_folder: str = "",
    dest_file: str | None = None,
) -> VerbResult:
    """≈ reference move (R19): copy + delete per match, cross-"bucket",
    non-atomic exactly like S3 COPY+DELETE (move_file.py:125-154)."""
    paths = _collect_matches(spark, source_url, source_folder, source_file, match_type)
    pairs = _plan_destinations(paths, dest_url, dest_folder, dest_file)
    for src, dst in pairs:
        _copy(spark, src, dst, delete_source=True)
    return VerbResult(files=list(pairs))


def remove(
    spark: SparkSession,
    *,
    source_url: str,
    source_file: str,
    source_folder: str = "",
    match_type: str = EXACT_MATCH,
) -> VerbResult:
    """≈ reference remove (R20): delete per match. Exact-match remove
    verifies existence first (divergence D7 → typed 201)."""
    paths = _collect_matches(spark, source_url, source_folder, source_file, match_type)
    for p in paths:
        fs = _jvm_fs(spark, p)
        fs.delete(_jpath(spark, p), False)
    return VerbResult(files=[(p, None) for p in paths])
