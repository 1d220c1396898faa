"""Comparison helpers mirroring the driver's oracle check:
row count + schema + order-insensitive exact value equality."""

from __future__ import annotations

import pandas as pd


def canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize temporal/decimal types, sort rows
    by all columns — the order-insensitive canonical form."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        s = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[c] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if len(s.dropna()) else None, bytes):
            pdf[c] = s.map(lambda b: b.hex() if isinstance(b, (bytes, bytearray)) else b)
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a = canonicalize(spark_pdf)
    b = canonicalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        a_float = pd.api.types.is_float_dtype(av)
        b_float = pd.api.types.is_float_dtype(bv)
        a_int = pd.api.types.is_integer_dtype(av)
        b_int = pd.api.types.is_integer_dtype(bv)
        # The driver hashes raw values, so an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT window-sum math
        # decaying to DOUBLE) is a REAL mismatch.  Don't paper over it
        # with a float coercion — that leniency hid an oracle-type bug
        # in round 3 (pipeline_pack_sequences).
        if (a_float and b_int) or (a_int and b_float):
            raise AssertionError(
                f"{name}: column {c!r} dtype mismatch: spark={av.dtype} "
                f"oracle={bv.dtype} (int vs float — the driver's value "
                f"hash will differ; cast the oracle SQL)"
            )
        if a_float or b_float:
            av = av.astype("float64")
            bv = bv.astype("float64")
            mism = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            try:
                mism = ~((av == bv) | (av.isna() & bv.isna()))
            except Exception:
                mism = av.astype(str) != bv.astype(str)
        if mism.any():
            idx = mism[mism].index[:5]
            raise AssertionError(
                f"{name}: column {c!r} mismatches at rows {list(idx)}:\n"
                f"spark:  {av.loc[idx].tolist()}\noracle: {bv.loc[idx].tolist()}"
            )
