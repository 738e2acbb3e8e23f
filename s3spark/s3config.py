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

# botocore Config(...) kwargs → S3A conf
S3_CONFIG_MAP = {
    "region_name": "fs.s3a.endpoint.region",
    "endpoint_url": "fs.s3a.endpoint",
    "max_pool_connections": "fs.s3a.connection.maximum",
    "connect_timeout": "fs.s3a.connection.establish.timeout",
    "read_timeout": "fs.s3a.connection.timeout",
    "retries": "fs.s3a.retry.limit",
    "s3.addressing_style": "fs.s3a.path.style.access",
}

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
    conf = {}
    for k, v in flat.items():
        target = mapping.get(k)
        if target is None:
            target = f"fs.s3a.ext.{k}"
        if k == "s3.addressing_style":
            v = "true" if v == "path" else "false"
        conf[target] = str(v)
    return conf


def s3_config_to_hadoop(raw: str | None) -> dict[str, str]:
    """``--s3-config`` literal → S3A conf dict."""
    return _map(_flatten(parse_literal_config(raw)), S3_CONFIG_MAP)


def extra_args_to_hadoop(raw: str | None) -> dict[str, str]:
    """``--extra-args`` literal → S3A conf dict."""
    return _map(_flatten(parse_literal_config(raw)), EXTRA_ARGS_MAP)
