"""Assembles the driver contract from the query registry.

Importing this module imports every operator module so that all
``@register``-ed queries land in ``plans.registry.REGISTRY``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Import for registration side-effects — each module registers its queries.
# Unconditional: a broken operator module must fail loudly here, not
# silently shrink the driver-facing catalog.
from .plans import cleaning as _cleaning  # noqa: F401
from .plans import olap as _olap  # noqa: F401
from .plans import olap_extra as _olap_extra  # noqa: F401
from .plans.registry import REGISTRY
from .operators import dedup as _dedup  # noqa: F401
from .operators import events as _events  # noqa: F401
from .operators import multimodal as _multimodal  # noqa: F401
from .operators import relational as _relational  # noqa: F401
from .operators import similarity as _similarity  # noqa: F401
from .operators import skew as _skew  # noqa: F401
from .operators import textstats as _textstats  # noqa: F401


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in sorted(REGISTRY.items())
        if spec.oracle is not None
    }


def headline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The bench.py subset."""
    return {
        name: spec.build for name, spec in sorted(REGISTRY.items()) if spec.headline
    }
