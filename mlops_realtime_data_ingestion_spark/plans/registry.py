"""Central query registry — the single source consumed by
``__spark_entry__.py`` (driver contract) and ``bench.py``."""

from __future__ import annotations

from .spec import QuerySpec


def all_specs() -> dict[str, QuerySpec]:
    # Imports are local so a syntax error in one group is debuggable
    # without killing the whole registry import path.
    from . import reference_queries

    specs: dict[str, QuerySpec] = {}
    for module in (reference_queries,):
        overlap = specs.keys() & module.SPECS.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        specs.update(module.SPECS)
    try:
        from . import relational_queries

        specs.update(relational_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import timeseries_queries

        specs.update(timeseries_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import tpch_queries

        specs.update(tpch_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import extension_queries

        specs.update(extension_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import streaming_queries

        specs.update(streaming_queries.SPECS)
    except ImportError:
        pass
    try:
        from . import training_queries

        specs.update(training_queries.SPECS)
    except ImportError:
        pass
    return specs
