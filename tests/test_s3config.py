"""--s3-config / --extra-args translation tests (reference R1/R18
knobs → S3A conf)."""

from __future__ import annotations

import pytest

from s3spark.s3config import (
    extra_args_to_hadoop,
    parse_literal_config,
    s3_config_to_hadoop,
)


def test_s3_config_maps_botocore_keys():
    conf = s3_config_to_hadoop(
        "{'region_name': 'eu-central-1', 'max_pool_connections': 50,"
        " 's3': {'addressing_style': 'path'}}"
    )
    assert conf["fs.s3a.endpoint.region"] == "eu-central-1"
    assert conf["fs.s3a.connection.maximum"] == "50"
    assert conf["fs.s3a.path.style.access"] == "true"


def test_extra_args_maps_sse_and_acl():
    conf = extra_args_to_hadoop(
        "{'ServerSideEncryption': 'aws:kms', 'SSEKMSKeyId': 'k-123',"
        " 'ACL': 'bucket-owner-full-control'}"
    )
    assert conf["fs.s3a.server-side-encryption-algorithm"] == "aws:kms"
    assert conf["fs.s3a.server-side-encryption.key"] == "k-123"
    assert conf["fs.s3a.acl.default"] == "bucket-owner-full-control"


def test_unknown_keys_pass_through_with_warning():
    with pytest.warns(UserWarning, match="not mapped"):
        conf = extra_args_to_hadoop("{'ContentType': 'text/csv'}")
    assert conf == {"fs.s3a.ext.ContentType": "text/csv"}


def test_retries_nested_dict_maps_to_retry_limit():
    # botocore Config(retries={'max_attempts': 7, 'mode': 'standard'})
    # — max_attempts counts TOTAL attempts (incl. the initial request)
    # while S3A retry.limit counts retries AFTER it, so 7 attempts maps
    # to retry.limit=6; mode (no S3A equivalent) is dropped with a
    # warning, never an inert ext key
    with pytest.warns(UserWarning, match="no S3A equivalent"):
        conf = s3_config_to_hadoop(
            "{'retries': {'max_attempts': 7, 'mode': 'standard'}}"
        )
    assert conf["fs.s3a.retry.limit"] == "6"
    assert not any("retries.mode" in k for k in conf)


def test_retries_max_attempts_one_means_no_retries():
    with pytest.warns(UserWarning, match="no S3A equivalent"):
        conf = s3_config_to_hadoop(
            "{'retries': {'max_attempts': 1, 'mode': 'standard'}}"
        )
    assert conf["fs.s3a.retry.limit"] == "0"


def test_empty_and_invalid_literals():
    assert parse_literal_config(None) == {}
    assert parse_literal_config("") == {}
    with pytest.raises(ValueError):
        parse_literal_config("[1, 2]")


def test_cli_applies_s3_config_to_live_conf(spark, tmp_path):
    from s3spark.cli import main

    (tmp_path / "f.txt").write_text("x")
    rc = main(
        [
            "download",
            "--bucket-name", f"file://{tmp_path}",
            "--source-file-name-match-type", "exact_match",
            "--source-file-name", "f.txt",
            "--destination-url", f"file://{tmp_path}/out",
            "--s3-config", "{'region_name': 'ap-south-1'}",
        ]
    )
    assert rc == 0
    assert (
        spark._jsc.hadoopConfiguration().get("fs.s3a.endpoint.region")
        == "ap-south-1"
    )
