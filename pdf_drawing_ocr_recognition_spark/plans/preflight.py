"""Job preflight — the reference's env self-check done right (SURVEY.md A25).

``check_env`` in the reference (pdor/pdor_utils.py:15-74) is broken as written
(a trailing comma makes it try to ``__import__`` a list).  This is the
spark-submit analogue with the documented intent: verify the runtime pieces a
job needs BEFORE claiming cluster resources, and return a structured report
instead of printing.
"""

from __future__ import annotations

import importlib
from dataclasses import dataclass, field

REQUIRED_MODULES = ("pyspark", "pyarrow", "pandas", "numpy")
MIN_PYARROW = (4, 0, 0)


@dataclass
class PreflightReport:
    ok: bool
    checks: dict[str, str] = field(default_factory=dict)


def check_env(spark=None) -> PreflightReport:
    """Import + version + (optionally) Spark conf checks."""
    checks: dict[str, str] = {}
    ok = True
    for mod in REQUIRED_MODULES:
        try:
            m = importlib.import_module(mod)
            checks[mod] = getattr(m, "__version__", "?")
        except ImportError as e:
            checks[mod] = f"MISSING ({e})"
            ok = False
    try:
        import pyarrow

        ver = tuple(int(x) for x in pyarrow.__version__.split(".")[:3])
        if ver < MIN_PYARROW:
            checks["pyarrow_version"] = f"too old: {pyarrow.__version__}"
            ok = False
    except Exception:
        pass
    if spark is not None:
        arrow = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled", "false")
        checks["arrow_enabled"] = arrow
        if arrow != "true":
            ok = False
        checks["spark_version"] = spark.version
    return PreflightReport(ok=ok, checks=checks)
