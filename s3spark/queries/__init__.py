"""Engine operator surface (SURVEY.md §2.3) — importing this package
registers every verified query into ``s3spark.registry.REGISTRY``."""

from s3spark.queries import (  # noqa: F401
    advanced,
    aggregates,
    analytics,
    eventtime,
    fileops,
    filters,
    formats,
    joins,
    llm,
    multimodal,
    scalars,
    scans,
    sets,
    sorts,
    udx,
    windows,
)
