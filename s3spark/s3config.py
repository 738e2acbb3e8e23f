"""Translation of the reference's boto3-level knobs onto Hadoop S3A
configuration.

- ``--s3-config`` fed ``botocore.client.Config`` (download_file.py:78-81)
  — in practice a region / addressing-style / retry knob.
- ``--extra-args`` fed S3 ``ExtraArgs`` on upload (upload_file.py:231,
  parsed with ast.literal_eval) — SSE, ACL, ContentType, metadata.

Both arrive as Python-literal strings on the CLI, exactly like the
reference; parse with :func:`parse_literal_config` and map with the
table below.  Unknown keys are passed through under the
``fs.s3a.ext.`` prefix rather than dropped, so nothing is silently
ignored.
"""

from __future__ import annotations

from ast import literal_eval

# botocore Config(...) kwargs → S3A conf. botocore takes retries as a
# nested dict ({'retries': {'max_attempts': N, 'mode': ...}}), which
# _flatten renders as dotted keys — map those, not the bare 'retries'.
S3_CONFIG_MAP = {
    "region_name": "fs.s3a.endpoint.region",
    "endpoint_url": "fs.s3a.endpoint",
    "max_pool_connections": "fs.s3a.connection.maximum",
    "connect_timeout": "fs.s3a.connection.establish.timeout",
    "read_timeout": "fs.s3a.connection.timeout",
    "retries.max_attempts": "fs.s3a.retry.limit",
    "s3.addressing_style": "fs.s3a.path.style.access",
}

# botocore retry modes have no S3A equivalent (S3A always retries with
# its own exponential backoff policy) — accepted and dropped with a
# warning rather than silently landing on an inert fs.s3a.ext.* key.
_KNOWN_UNMAPPABLE = {"retries.mode", "retries.total_max_attempts"}

# S3 ExtraArgs → S3A conf
EXTRA_ARGS_MAP = {
    "ServerSideEncryption": "fs.s3a.server-side-encryption-algorithm",
    "SSEKMSKeyId": "fs.s3a.server-side-encryption.key",
    "ACL": "fs.s3a.acl.default",
    "StorageClass": "fs.s3a.create.storage.class",
}


def parse_literal_config(raw: str | None) -> dict:
    """Parse the reference's CLI literal-dict format (upload_file.py:231:
    ``literal_eval(args.extra_args if args.extra_args else '{}')``)."""
    if not raw:
        return {}
    value = literal_eval(raw)
    if not isinstance(value, dict):
        raise ValueError(f"expected a dict literal, got {type(value).__name__}")
    return value


def _flatten(d: dict, prefix: str = "") -> dict[str, object]:
    out: dict[str, object] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, f"{key}."))
        else:
            out[key] = v
    return out


def _map(flat: dict[str, object], mapping: dict[str, str]) -> dict[str, str]:
    import warnings

    conf = {}
    for k, v in flat.items():
        target = mapping.get(k)
        if target is None:
            if k in _KNOWN_UNMAPPABLE:
                warnings.warn(
                    f"s3 config key {k!r} has no S3A equivalent; ignored",
                    stacklevel=3,
                )
                continue
            # unknown key: parked under fs.s3a.ext.* (inert to S3A) and
            # warned — "passthrough" must not masquerade as support
            warnings.warn(
                f"s3 config key {k!r} is not mapped to an S3A setting; "
                f"stored as fs.s3a.ext.{k} (no effect on transfers)",
                stacklevel=3,
            )
            target = f"fs.s3a.ext.{k}"
        if k == "s3.addressing_style":
            v = "true" if v == "path" else "false"
        elif k == "retries.max_attempts":
            # botocore max_attempts counts TOTAL attempts including the
            # initial request (standard/adaptive modes); S3A retry.limit
            # counts retries AFTER the first attempt — shift by one so
            # both configs allow the same number of requests on the wire
            v = max(int(v) - 1, 0)
        conf[target] = str(v)
    return conf


def s3_config_to_hadoop(raw: str | None) -> dict[str, str]:
    """``--s3-config`` literal → S3A conf dict."""
    return _map(_flatten(parse_literal_config(raw)), S3_CONFIG_MAP)


def extra_args_to_hadoop(raw: str | None) -> dict[str, str]:
    """``--extra-args`` literal → S3A conf dict."""
    return _map(_flatten(parse_literal_config(raw)), EXTRA_ARGS_MAP)
