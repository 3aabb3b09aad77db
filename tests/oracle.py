"""Local mirror of the driver's Spark-vs-DuckDB comparison: row count,
column names, and order-insensitive exact values. Stricter than a hash —
on mismatch it reports which columns/rows drifted."""

from __future__ import annotations

import datetime as _dt
import math

import pandas as pd


def _obj_canon(v):
    if v is None:
        return None
    # container cells (incl. numpy arrays from Arrow toPandas) make
    # pd.isna return an element-wise array — exclude them from the
    # scalar NA check or the `if` raises on ambiguous truth value
    if not hasattr(v, "__len__") and pd.isna(v):
        return None  # pd.NA / NaT from extension dtypes
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return f"{v.isoformat()} 00:00:00.000000"
    # arrays/lists canonicalize element-wise: str(ndarray) elides long
    # arrays (false PASS) and prints differently from list (false FAIL)
    if hasattr(v, "tolist"):
        v = v.tolist()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(str(_obj_canon(x)) for x in v) + "]"
    return str(v)


def canonical(pdf: pd.DataFrame) -> pd.DataFrame:
    import decimal

    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_bool_dtype(s):
            # string form, not the 'boolean' extension dtype — that
            # dtype rejects the sentinel fillna in the comparator
            pdf[c] = s.astype("object").map(_obj_canon)
        elif s.dtype == object:
            # numeric-as-object (DuckDB DECIMAL → decimal.Decimal, or a
            # mixed engine returning python floats): coerce to float64 so
            # it sorts/compares numerically against the other side's
            # float column instead of lexicographically as strings
            non_null = s.dropna()
            if len(non_null) and all(
                isinstance(v, (int, float, decimal.Decimal)) and not isinstance(v, bool)
                for v in non_null
            ):
                integral = all(
                    (isinstance(v, int) and not isinstance(v, bool))
                    or (isinstance(v, decimal.Decimal) and v == v.to_integral_value())
                    for v in non_null
                )
                if integral:
                    # exact path: int/Decimal columns can carry values
                    # above 2^53 that float64 silently rounds — a real
                    # mismatch would then compare equal (false PASS).
                    # Python ints are arbitrary-precision; an int64-dtype
                    # column on the other side compares equal element-wise.
                    pdf[c] = s.map(lambda v: v if v is None or pd.isna(v) else int(v))
                else:
                    # genuinely fractional (DECIMAL with scale, python
                    # floats): numeric float compare
                    pdf[c] = s.astype("float64")
            else:
                pdf[c] = s.map(_obj_canon)
    if len(pdf.columns):
        pdf = pdf.sort_values(list(pdf.columns), na_position="first", kind="mergesort")
    return pdf.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    a, b = canonical(spark_pdf), canonical(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            bad = [
                i
                for i, (x, y) in enumerate(zip(af, bf))
                if not (x == y or (math.isnan(x) and math.isnan(y)))
            ]
            assert not bad, (
                f"{name}: float drift in {c!r} at rows {bad[:5]} "
                f"spark={[af[i] for i in bad[:5]]} duck={[bf[i] for i in bad[:5]]}"
            )
        else:
            neq = av.fillna("\0NA") != bv.fillna("\0NA")
            if neq.any():
                i = int(neq.idxmax())
                raise AssertionError(
                    f"{name}: value mismatch in {c!r} row {i}: "
                    f"spark={av.iloc[i]!r} duck={bv.iloc[i]!r} "
                    f"({int(neq.sum())} rows differ)"
                )
