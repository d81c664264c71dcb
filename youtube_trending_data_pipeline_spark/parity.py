"""Driver-faithful Spark-vs-DuckDB result comparison.

The external correctness gate converts BOTH engine results to pandas and
hashes sorted values with dtype sensitivity: an int64 Spark column vs a
float64 oracle column (DuckDB HUGEINT promotion through ``.df()``) is a
hash FAIL even when every value is numerically identical — exactly what
happened to ``sample_kcenter_coreset`` and ``maintenance_compaction_plan``
in round 9 (CORRECTNESS_r09.json; VERDICT r9 items 1–2).  The old local
gates could not see this: ``tests/test_oracle_parity.py`` compared via
``Counter`` of tuples where ``0.0 == 0`` (equal hash), and ``sweep.py``
stringified through the DB-API cursor (DuckDB ``fetchall`` yields exact
Python ints for HUGEINT, hiding the pandas-dtype drift entirely).

This module is the single shared implementation both local gates now use:

* :func:`norm_value` — value normalization that TAGS numeric values with
  their Python type, so ``(int, 3)`` never equals ``(float, 3.0)``;
* :func:`dtype_drift` — per-column pandas-dtype comparison over the
  numeric/bool kinds (the ones the driver's hash is sensitive to);
* :func:`compare_frames` — the full driver-shaped check: column names,
  row count, numeric dtype drift, then the order-insensitive multiset.

Datetime/object columns keep the historical string normalization (date
vs midnight-timestamp RENDERING differs between the two pandas
conversions without the driver caring), so only the numeric boundary got
stricter.
"""

from __future__ import annotations

import math
from collections import Counter

__all__ = [
    "norm_value",
    "rows_multiset",
    "dtype_drift",
    "compare_frames",
]


def norm_value(v):
    """Normalize one scalar cell for multiset comparison.

    Numeric values carry a type tag (``("i", 3)`` vs ``("f", 3.0)``) so
    int-vs-float drift fails locally the same way it fails at the
    dtype-sensitive driver (ADVICE r9 item 4).  Strings, dates and
    timestamps stay plain strings: their cross-engine pandas renderings
    legitimately differ in type name while the driver compares them
    equal.
    """
    import numpy as np
    import pandas as pd

    # container cells are unhashable in the driver's pandas sort/hash —
    # ban them here too (Spark toPandas and DuckDB .df() both deliver
    # array columns as numpy.ndarray, NOT list; the r4 incident)
    assert not isinstance(v, (list, dict, set, tuple, np.ndarray)), (
        f"unhashable container value {type(v).__name__} in oracle-checked "
        "output; flatten arrays/maps to scalar columns"
    )
    try:
        if v is None or pd.isna(v):
            # float NaN stays distinguishable from missing-object None
            # the same way on both sides (NULL numeric -> NaN in both
            # pandas conversions), so one token per kind is enough
            return ("f", "NaN") if isinstance(v, float) else None
    except (TypeError, ValueError):
        pass
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    s = str(v)
    # date vs midnight-timestamp rendering differs between the two pandas
    # conversions; strip the zero time-of-day on both sides
    if s.endswith(" 00:00:00"):
        s = s[: -len(" 00:00:00")]
    return s


def rows_multiset(pdf) -> Counter:
    """Order-insensitive multiset of normalized rows, columns sorted by
    name (the driver sorts columns before hashing)."""
    cols = sorted(pdf.columns)
    # per-column .tolist() converts numpy scalars to Python int/float
    # while keeping object cells (str/date/Decimal) intact
    col_vals = [pdf[c].tolist() for c in cols]
    return Counter(
        tuple(norm_value(col[i]) for col in col_vals)
        for i in range(len(pdf))
    )


def dtype_drift(spdf, dpdf) -> list[str]:
    """Columns whose pandas dtypes drift across the numeric KIND
    boundary (int/uint vs float vs bool).

    KIND, not width: the driver hashes pandas VALUES (int32 and int64
    renderings of the same number hash identically — every Spark
    int-typed window/rank column sits next to a DuckDB BIGINT and is
    driver-green), but a float64 rendering of an integer column does
    NOT (the HUGEINT incidents: 0.0 hashes differently from 0).  So
    int-vs-float and bool-vs-int fail here; int32-vs-int64 does not.
    Object/datetime columns are exempt: their renderings differ across
    the two pandas conversions without driver impact — but a NUMERIC
    column on one side vs object on the other fails (an all-NULL int
    column converts to object on one engine only in pathological
    cases, and the driver would see different values).
    """
    kind_group = {"i": "i", "u": "i", "f": "f", "b": "b"}
    drift = []
    for c in sorted(set(spdf.columns) & set(dpdf.columns)):
        sk = spdf[c].dtype.kind
        dk = dpdf[c].dtype.kind
        if sk not in kind_group and dk not in kind_group:
            continue
        if kind_group.get(sk) != kind_group.get(dk):
            drift.append(
                f"{c}: spark={spdf[c].dtype} oracle={dpdf[c].dtype}"
            )
    return drift


def compare_frames(spdf, dpdf) -> list[str]:
    """Run the full driver-shaped comparison; return mismatch messages
    (empty list == EXACT)."""
    problems: list[str] = []
    if sorted(spdf.columns) != sorted(dpdf.columns):
        return [
            f"column names differ: {sorted(spdf.columns)} vs "
            f"{sorted(dpdf.columns)}"
        ]
    if len(spdf) != len(dpdf):
        problems.append(f"row count {len(spdf)} != {len(dpdf)}")
    problems.extend(
        f"numeric dtype drift ({d})" for d in dtype_drift(spdf, dpdf)
    )
    if problems:
        return problems
    sm = rows_multiset(spdf)
    dm = rows_multiset(dpdf)
    if sm != dm:
        only_spark = list((sm - dm).elements())[:3]
        only_duck = list((dm - sm).elements())[:3]
        problems.append(
            f"multiset mismatch; spark-only={only_spark} "
            f"duck-only={only_duck}"
        )
    return problems
