"""Arrow-vectorized scalar Pandas UDFs.

NOTE: no `from __future__ import annotations` here — pandas_udf resolves
the Series type hints at decoration time, and postponed (string)
annotations would leave `pd.Series` unresolvable in this module's
namespace.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("int")
def digit_sum(s: pd.Series) -> pd.Series:
    """Base-10 digit sum via pure numpy integer arithmetic — vectorized
    over the whole Arrow batch, no per-row python. Exact for any int64
    input (negative values are summed over their absolute digits)."""
    v = s.to_numpy(dtype="int64").copy()
    v[v < 0] = -v[v < 0]
    acc = v * 0
    while (v > 0).any():
        acc += v % 10
        v //= 10
    return pd.Series(acc, dtype="int32")
