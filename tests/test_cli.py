"""CLI + S3Pipeline facade tests: the reference-flag surface drives the
verbs end-to-end and failures exit with the reference codes."""

from __future__ import annotations

import pytest

from s3spark.cli import main


@pytest.fixture()
def bucket(tmp_path, spark):
    # `spark` fixture requested so the CLI's get_spark() reuses the
    # session instead of building one per invocation
    (tmp_path / "data").mkdir()
    (tmp_path / "data" / "a.csv").write_text("1")
    (tmp_path / "data" / "b.csv").write_text("2")
    (tmp_path / "data" / "notes.txt").write_text("3")
    return tmp_path


def url(p):
    return f"file://{p}"


def test_cli_download_regex(bucket, tmp_path, capsys):
    out = tmp_path / "dl"
    rc = main(
        [
            "download",
            "--bucket-name", url(bucket),
            "--source-folder-name", "data",
            "--source-file-name-match-type", "regex_match",
            "--source-file-name", r"\.csv$",
            "--destination-url", url(out),
        ]
    )
    assert rc == 0
    assert sorted(p.name for p in out.iterdir()) == ["a.csv", "b.csv"]
    printed = capsys.readouterr().out
    assert "1 of 2" in printed and "2 of 2" in printed


def test_cli_move_exact_and_remove(bucket, tmp_path, capsys):
    dest = tmp_path / "bucket2"
    rc = main(
        [
            "move",
            "--source-bucket-name", url(bucket),
            "--destination-bucket-name", url(dest),
            "--source-folder-name", "data",
            "--source-file-name-match-type", "exact_match",
            "--source-file-name", "notes.txt",
            "--destination-folder-name", "archive",
        ]
    )
    assert rc == 0
    assert (dest / "archive" / "notes.txt").exists()
    assert not (bucket / "data" / "notes.txt").exists()

    rc = main(
        [
            "remove",
            "--bucket-name", url(bucket),
            "--source-folder-name", "data",
            "--source-file-name-match-type", "regex_match",
            "--source-file-name", r"a\.csv$",
        ]
    )
    assert rc == 0
    assert not (bucket / "data" / "a.csv").exists()


def test_cli_upload_regex(bucket, tmp_path, capsys):
    remote = tmp_path / "remote-bucket"
    rc = main(
        [
            "upload",
            "--bucket-name", url(remote),
            "--source-url", url(bucket),
            "--source-folder-name", "data",
            "--source-file-name-match-type", "regex_match",
            "--source-file-name", r"\.csv$",
            "--destination-folder-name", "landing/raw",
        ]
    )
    assert rc == 0
    assert sorted(p.name for p in (remote / "landing" / "raw").iterdir()) == [
        "a.csv",
        "b.csv",
    ]


def test_cli_exit_codes_match_reference(bucket, tmp_path, capsys):
    # missing exact file → 201 (EXIT_CODE_FILE_NOT_FOUND)
    rc = main(
        [
            "download",
            "--bucket-name", url(bucket),
            "--source-file-name-match-type", "exact_match",
            "--source-file-name", "ghost.bin",
            "--destination-url", url(tmp_path / "x"),
        ]
    )
    assert rc == 201
    # invalid regex → 203
    rc = main(
        [
            "remove",
            "--bucket-name", url(bucket),
            "--source-file-name-match-type", "regex_match",
            "--source-file-name", "[bad",
        ]
    )
    assert rc == 203
    # zero matches → 1
    rc = main(
        [
            "download",
            "--bucket-name", url(bucket),
            "--source-folder-name", "data",
            "--source-file-name-match-type", "regex_match",
            "--source-file-name", r"zzz\d+$",
            "--destination-url", url(tmp_path / "x"),
        ]
    )
    assert rc == 1


def test_cli_query_runs_registered_operator(bucket, sf_dir, capsys):
    rc = main(["query", "agg_groupby", "--data-dir", sf_dir, "--limit", "3"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "l_returnflag" in out


def test_pipeline_dataset_roundtrip(spark, tmp_path, sf_dir):
    from s3spark.pipeline import S3Pipeline

    pipe = S3Pipeline(spark)
    df = pipe.read(f"file://{sf_dir}/nation.parquet")
    pipe.write(df, url(tmp_path / "nation_out"), fmt="parquet", mode="overwrite")
    back = pipe.read(url(tmp_path / "nation_out"))
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)
