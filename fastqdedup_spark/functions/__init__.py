"""Column-expression function library (JVM-side unless noted).

`as_column` is the ONE copy of the str-or-Column coercion every
column-accepting helper in this package needs — it was independently
re-written five times across functions/operators before being hoisted
here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def as_column(col: "str | Column") -> Column:
    return F.col(col) if isinstance(col, str) else col
