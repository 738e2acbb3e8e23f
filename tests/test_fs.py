"""File-verb integration tests over file:// (SURVEY.md §5.2).

The Hadoop FileSystem abstraction makes the verbs path-scheme agnostic,
so a pytest tmp dir stands in for an S3 bucket. Fixture names exercise
the reference edge cases from FIXTURES.md: archive.tar.gz (first-dot
enumeration), nested a/b/c.txt (unanchored full-path regex), >1000
files (pagination regression D1/D2), zero-match (exit-1 semantics),
duplicate basenames in different folders.
"""

from __future__ import annotations

import os

import pytest

from s3spark import fs
from s3spark.errors import S3FileNotFound, S3InvalidRegex, S3NoMatches


@pytest.fixture()
def bucket(tmp_path):
    """A fake bucket: nested files with reference-edge-case names."""
    (tmp_path / "src").mkdir()
    (tmp_path / "src" / "archive.tar.gz").write_text("one")
    (tmp_path / "src" / "data_a.csv").write_text("a,b\n1,2")
    (tmp_path / "src" / "data_b.csv").write_text("a,b\n3,4")
    (tmp_path / "src" / "a" / "b").mkdir(parents=True)
    (tmp_path / "src" / "a" / "b" / "c.txt").write_text("nested")
    (tmp_path / "src" / "a" / "data_a.csv").write_text("dup basename")
    return tmp_path


def url(p):
    return f"file://{p}"


def test_list_files_recursive_files_only(spark, bucket):
    df = fs.list_files(spark, url(bucket / "src"))
    names = {r.name for r in df.collect()}
    assert names == {"archive.tar.gz", "data_a.csv", "data_b.csv", "c.txt"}
    # directories excluded (divergence D5); sizes are real
    sizes = {r.name: r.size for r in df.collect()}
    assert sizes["c.txt"] == len("nested")


def test_list_files_missing_prefix_raises_201(spark, bucket):
    with pytest.raises(S3FileNotFound) as ei:
        fs.list_files(spark, url(bucket / "nope"))
    assert ei.value.exit_code == 201


def test_match_regex_unanchored_full_path(spark, bucket):
    listing = fs.list_files(spark, url(bucket / "src"))
    # substring match on FULL path: 'a/b' hits the nested folder
    got = {r.name for r in fs.match_files(listing, r"a/b/").collect()}
    assert got == {"c.txt"}
    # unanchored: 'data' matches both csvs in both folders
    got = {r.path for r in fs.match_files(listing, r"data_.\.csv").collect()}
    assert len(got) == 3


def test_match_regex_is_key_relative_not_scheme(spark, bucket):
    """The regex sees store-relative text (ADVICE): anchored patterns
    work against the path, and scheme/bucket text is unmatchable —
    'file:' must not become part of the searchable key."""
    listing = fs.list_files(spark, url(bucket / "src"))
    # anchored on the absolute local path (reference upload semantics:
    # regex over glob'd absolute paths, no scheme text)
    anchored = fs.match_files(listing, rf"^{bucket}/src/data_a\.csv$")
    assert {r.name for r in anchored.collect()} == {"data_a.csv"}
    # scheme text is stripped before matching: 'file:' never matches
    assert fs.match_files(listing, r"^file:").count() == 0


def test_key_relative_strips_authority_urls(spark):
    """s3a://bucket/key → key (bucket-relative, like the reference's
    list_objects_v2 keys); an anchored ^data/ pattern must hit."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("s3a://prod-data-bucket/data/x.csv",),
            ("s3a://prod-data-bucket/other/data/y.csv",),
            ("file:/tmp/data/z.csv",),
        ],
        "path string",
    )
    rel = df.select(fs.col_key_relative(F.col("path")).alias("k"))
    assert [r.k for r in rel.collect()] == [
        "data/x.csv",
        "other/data/y.csv",
        "/tmp/data/z.csv",
    ]
    # a pattern overlapping the bucket name must not over-match
    listing = df.withColumn("name", F.lit("n")).withColumn(
        "size", F.lit(1).cast("long")
    ).withColumn("mtime", F.lit(None).cast("timestamp"))
    assert fs.match_files(listing, "prod-data").count() == 0
    assert fs.match_files(listing, r"^data/").count() == 1


def test_match_invalid_regex_raises_203(spark, bucket):
    listing = fs.list_files(spark, url(bucket / "src"))
    with pytest.raises(S3InvalidRegex) as ei:
        fs.match_files(listing, "[unclosed")
    assert ei.value.exit_code == 203


def test_ingest_exact_match(spark, bucket, tmp_path):
    out = tmp_path / "out"
    res = fs.ingest(
        spark,
        source_url=url(bucket),
        source_folder="src",
        source_file="archive.tar.gz",
        match_type=fs.EXACT_MATCH,
        dest_url=url(out),
    )
    assert res.count == 1
    assert (out / "archive.tar.gz").read_text() == "one"


def test_ingest_exact_missing_raises_201(spark, bucket, tmp_path):
    with pytest.raises(S3FileNotFound):
        fs.ingest(
            spark,
            source_url=url(bucket),
            source_folder="src",
            source_file="missing.txt",
            match_type=fs.EXACT_MATCH,
            dest_url=url(tmp_path / "out"),
        )


def test_ingest_regex_enumerates_explicit_name_only_when_multiple(
    spark, bucket, tmp_path
):
    out = tmp_path / "out"
    # two matches + explicit dest name → enumerated before first dot (D4)
    res = fs.ingest(
        spark,
        source_url=url(bucket),
        source_folder="src",
        source_file=r"data_.\.csv$",
        match_type=fs.REGEX_MATCH,
        dest_url=url(out),
        dest_file="merged.backup.csv",
    )
    assert res.count == 3
    assert sorted(os.listdir(out)) == [
        "merged_1.backup.csv",
        "merged_2.backup.csv",
        "merged_3.backup.csv",
    ]


def test_ingest_single_match_no_enumeration(spark, bucket, tmp_path):
    out = tmp_path / "out"
    fs.ingest(
        spark,
        source_url=url(bucket),
        source_folder="src",
        source_file=r"archive.*gz$",
        match_type=fs.REGEX_MATCH,
        dest_url=url(out),
        dest_file="only.tar.gz",
    )
    assert os.listdir(out) == ["only.tar.gz"]


def test_ingest_no_dest_name_keeps_basenames(spark, bucket, tmp_path):
    out = tmp_path / "out"
    fs.ingest(
        spark,
        source_url=url(bucket / "src"),
        source_file=r"\.csv$",
        match_type=fs.REGEX_MATCH,
        dest_url=url(out),
    )
    # duplicate basename data_a.csv collapses (last write wins) — same
    # as the reference, which would overwrite local file repeatedly
    assert sorted(os.listdir(out)) == ["data_a.csv", "data_b.csv"]


def test_zero_matches_raises_exit_1(spark, bucket, tmp_path):
    with pytest.raises(S3NoMatches) as ei:
        fs.ingest(
            spark,
            source_url=url(bucket),
            source_folder="src",
            source_file=r"zzz\d+",
            match_type=fs.REGEX_MATCH,
            dest_url=url(tmp_path / "out"),
        )
    assert ei.value.exit_code == 1


def test_move_copies_then_deletes_source(spark, bucket, tmp_path):
    dest = tmp_path / "bucket2"
    res = fs.move(
        spark,
        source_url=url(bucket),
        source_folder="src",
        source_file=r"data_a\.csv$",
        match_type=fs.REGEX_MATCH,
        dest_url=url(dest),
        dest_folder="moved",
    )
    assert res.count == 2  # src/data_a.csv and src/a/data_a.csv
    assert not (bucket / "src" / "data_a.csv").exists()
    assert not (bucket / "src" / "a" / "data_a.csv").exists()
    assert (dest / "moved" / "data_a.csv").exists()


def test_remove_regex(spark, bucket):
    res = fs.remove(
        spark,
        source_url=url(bucket),
        source_folder="src",
        source_file=r"\.csv$",
        match_type=fs.REGEX_MATCH,
    )
    assert res.count == 3
    assert not (bucket / "src" / "data_a.csv").exists()
    assert (bucket / "src" / "archive.tar.gz").exists()


def test_remove_exact_missing_raises_201(spark, bucket):
    with pytest.raises(S3FileNotFound):
        fs.remove(
            spark,
            source_url=url(bucket),
            source_folder="src",
            source_file="ghost.txt",
            match_type=fs.EXACT_MATCH,
        )


def test_pagination_regression_1500_files(spark, tmp_path):
    """Reference bugs D1/D2 lose keys past page 1 (1000). Our listing
    must see all 1500."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(1500):
        (d / f"f{i:04d}.dat").write_text("x")
    df = fs.list_files(spark, url(d))
    assert df.count() == 1500
    # and the distributed listing path agrees
    assert fs.list_files_distributed(spark, url(d)).count() == 1500


def test_listing_auto_routes_to_distributed_past_threshold(spark, tmp_path):
    """_collect_matches' listing switches off the driver loop for big
    prefixes: past the threshold the plan must be a distributed
    binaryFile scan, below it a driver-materialized local table."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(1500):
        (d / f"f{i:04d}.dat").write_text("x")

    small = fs.list_files_auto(spark, url(d))  # default threshold 10k
    assert "Scan ExistingRDD" in small._jdf.queryExecution().executedPlan().toString() or \
        "LocalTableScan" in small._jdf.queryExecution().executedPlan().toString()
    assert small.count() == 1500

    big = fs.list_files_auto(spark, url(d), threshold=1000)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "binaryFile" in plan
    assert big.count() == 1500


def test_checksum_setter_credential_failure_maps_to_202():
    """Round-12 VERDICT item 6: the checksum-setter tolerance branch
    (_disable_checksums) must not swallow a lazily-surfaced credential
    failure — it classifies first, and an auth-flavored error raises
    S3InvalidCredentials (exit 202) instead of vanishing."""
    from s3spark.errors import S3InvalidCredentials
    from s3spark.fs import _disable_checksums

    class LazyAuthFs:
        def setWriteChecksum(self, _v):
            raise RuntimeError(
                "AccessDenied: unable to load credentials from any provider"
            )

        def setVerifyChecksum(self, _v):  # pragma: no cover
            raise AssertionError("must fail on the first setter")

    with pytest.raises(S3InvalidCredentials):
        _disable_checksums(LazyAuthFs())

    class UnsupportedFs:
        calls = 0

        def setWriteChecksum(self, _v):
            raise RuntimeError("setWriteChecksum not supported")

        def setVerifyChecksum(self, _v):
            type(self).calls += 1

    # non-auth setter failures stay tolerated (no raise)
    _disable_checksums(UnsupportedFs())


def test_checksum_setter_exit_code_is_202():
    """The classified error carries the reference's credential exit
    code (upload_file.py taxonomy), so a CLI caller exits 202."""
    from s3spark.errors import S3InvalidCredentials

    assert S3InvalidCredentials("x").exit_code == 202


def test_list_paths_local_fast_path_and_suffix(spark, bucket):
    """Round-13: list_paths replaces ad-hoc os.walk in query paths.
    Local prefixes (bare or file:) take the os.walk fast path; the
    suffix filter and recursion semantics must match the Hadoop
    route's contract."""
    root = str(bucket / "src")
    got = set(fs.list_paths(spark, root))
    assert {os.path.basename(p) for p in got} == {
        "archive.tar.gz", "data_a.csv", "data_b.csv", "c.txt",
        "data_a.csv",
    }
    csvs = set(fs.list_paths(spark, root, suffix=".csv"))
    assert {os.path.basename(p) for p in csvs} == {"data_a.csv", "data_b.csv"}
    assert len(csvs) == 3  # dup basename in a/ is a distinct path
    flat = set(fs.list_paths(spark, root, recursive=False))
    assert {os.path.basename(p) for p in flat} == {
        "archive.tar.gz", "data_a.csv", "data_b.csv",
    }
    # file: URL resolves to the same files as the bare path
    via_url = set(fs.list_paths(spark, url(bucket / "src"), suffix=".csv"))
    assert {p.split("/src/", 1)[1] for p in via_url} == {
        p.split("/src/", 1)[1] for p in csvs
    }


def test_list_paths_missing_prefix_raises_201(spark, bucket):
    with pytest.raises(S3FileNotFound) as ei:
        fs.list_paths(spark, str(bucket / "nope"))
    assert ei.value.exit_code == 201
