"""Pipelines: the flagship parse→enrich→route→count pipeline and the
declarative pipeline-spec compiler."""

from .flagship import (  # noqa: F401
    LOG_RE,
    ROUTES,
    METRICS,
    TOOL_SERVICE,
    ROLE_RESOURCE,
    build_parse_chain,
    flagship,
    run_flagship,
)
