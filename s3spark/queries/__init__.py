"""Engine operator surface (SURVEY.md §2.3) — importing this package
registers every verified query into ``s3spark.registry.REGISTRY``."""

from s3spark.queries import (  # noqa: F401
    advanced,
    aggregates,
    analytics,
    bucketing,
    eventtime,
    fileops,
    filters,
    formats,
    analytics2,
    etl,
    joins,
    llm,
    multimodal,
    robustness,
    scalars,
    scalars2,
    scale_ops,
    scans,
    sets,
    sorts,
    text2,
    timeseries,
    udx,
    windows,
)
