"""Local mirror of the driver's Spark-vs-DuckDB comparison.

Deliberately strict — r01 showed the previous `%.6g`-smoothed,
`fetchall()`-based mirror passing queries the driver failed:

- DuckDB ``sum(INTEGER)`` returns HUGEINT which pandas renders as
  float64; Spark emits int64. ``fetchall()`` hid it (Python ints);
  the driver's pandas path hashed ``5.0`` vs ``5`` differently.
- ``%.6g`` canonicalization erased a real ±0.01 mismatch on 6-digit
  rounded sums (q7_volume_shipping).
- Array columns blow up the driver's pandas canonicalizer with
  ``TypeError: unhashable type: 'list'``; the mirror silently
  tuple-ized them.

So this mirror now fetches BOTH sides as pandas frames (Spark
``toPandas``, DuckDB ``.df()``), sorts columns by name and rows by
all columns (lists raise, as in the driver), requires matching dtype
*kinds* (int64 vs float64 is a failure), and compares values exactly
— floats bit-for-bit (NaN == NaN). Local green must predict driver
green.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _sorted_frame(df: pd.DataFrame, name: str, side: str) -> pd.DataFrame:
    cols = sorted(df.columns)
    df = df[cols]
    # Mirrors the driver: unhashable cells (lists/arrays) raise here.
    try:
        df = df.sort_values(by=cols, na_position="last", kind="mergesort")
    except TypeError as e:
        raise AssertionError(
            f"{name}: {side} result not canonicalizable "
            f"(driver would record err): {e}"
        ) from e
    return df.reset_index(drop=True)


def _kind(dtype) -> str:
    k = dtype.kind
    # Signed/unsigned int are the same family; everything else exact.
    return "i" if k in ("i", "u") else k


def _col_equal(a: pd.Series, b: pd.Series) -> np.ndarray:
    ka, kb = _kind(a.dtype), _kind(b.dtype)
    if ka == "f" and kb == "f":
        av, bv = a.to_numpy(dtype=float), b.to_numpy(dtype=float)
        return (av == bv) | (np.isnan(av) & np.isnan(bv))
    if ka == "M" and kb == "M":
        return a.astype("datetime64[us]").to_numpy() == b.astype(
            "datetime64[us]"
        ).to_numpy()
    an, bn = a.isna().to_numpy(), b.isna().to_numpy()
    eq = np.zeros(len(a), dtype=bool)
    both = ~an & ~bn
    if both.any():
        eq[both] = (
            a[both].to_numpy(dtype=object) == b[both].to_numpy(dtype=object)
        )
    eq |= an & bn
    return eq


def assert_parity(spark_df, duck_rel, name: str = "query"):
    sp = spark_df.toPandas()
    dp = duck_rel.df()
    assert sorted(sp.columns) == sorted(dp.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} "
        f"duck={sorted(dp.columns)}"
    )
    assert len(sp) == len(dp), (
        f"{name}: row count spark={len(sp)} duck={len(dp)}"
    )
    sp = _sorted_frame(sp, name, "spark")
    dp = _sorted_frame(dp, name, "duck")
    for c in sp.columns:
        ks, kd = _kind(sp[c].dtype), _kind(dp[c].dtype)
        assert ks == kd, (
            f"{name}: dtype kind mismatch on '{c}': "
            f"spark={sp[c].dtype} duck={dp[c].dtype} "
            "(driver hashes these differently)"
        )
    if len(sp) == 0:
        return
    for c in sp.columns:
        eq = _col_equal(sp[c], dp[c])
        if not eq.all():
            bad = np.flatnonzero(~eq)[:5]
            pairs = [(sp[c].iloc[i], dp[c].iloc[i]) for i in bad]
            raise AssertionError(
                f"{name}: column '{c}' mismatch on {int((~eq).sum())}/"
                f"{len(eq)} rows, first diffs (spark, duck): {pairs}"
            )
