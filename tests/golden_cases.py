"""Golden fixture corpus — re-exported from ``riptide_spark.sources.golden``
so the driver-visible ``extract_golden_fixtures`` query and these tests
share one loader (single source of truth for case list + snapshot parsing).
"""

from riptide_spark.sources.golden import (  # noqa: F401
    EXTRA_FIXTURES,
    FIXTURES_DIR,
    GOLDEN_CASES,
    REFERENCE_WASM,
    SNAPSHOTS_DIR,
    load_fixture,
    load_snapshot,
    reference_available,
)
