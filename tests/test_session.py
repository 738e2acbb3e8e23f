"""Session factory tests: credential wiring (reference R2 semantics)
and the scale-posture configuration."""

from __future__ import annotations


def test_credentials_map_to_s3a_conf(spark):
    """Explicit credentials must land in Hadoop S3A config — the
    engine twin of the reference's set_environment_variables
    (download_file.py:59-71).  Uses the running session's builder
    path: getOrCreate applies configs onto the existing session."""
    from s3spark.session import get_spark

    s = get_spark(
        "cred-test",
        aws_access_key_id="AKIATEST",
        aws_secret_access_key="SECRETTEST",
        aws_default_region="eu-west-1",
        s3_endpoint="http://localhost:9000",
    )
    hconf = s._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.access.key") == "AKIATEST"
    assert hconf.get("fs.s3a.secret.key") == "SECRETTEST"
    assert hconf.get("fs.s3a.endpoint.region") == "eu-west-1"
    assert hconf.get("fs.s3a.endpoint") == "http://localhost:9000"


def test_scale_posture_conf(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert (
        spark.conf.get("spark.sql.execution.arrow.pyspark.enabled") == "true"
    )
