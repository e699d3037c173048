"""Driver-contract conformance: every queries() entry vs its DuckDB oracle.

Replicates the driver's compare: row count + column names + order-
insensitive value equality (sorted row tuples, floats rounded).  Runs at
sf0.001 to stay fast; the driver runs the same at sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _canon_pdf(pdf):
    """Driver-faithful canonicalization: both sides materialized through
    pandas, columns sorted by name, every value STRINGIFIED (the driver
    hashes string renderings, so int64 99111 vs HUGEINT->float64 99111.0
    must be caught here, not papered over by Python's 99111 == 99111.0)."""
    cols = sorted(pdf.columns)
    out = []
    for row in pdf[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if isinstance(v, (float, np.floating)):
                v = "nan" if math.isnan(v) else round(float(v), 4)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_pdf = sdf.toPandas()

    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert len(spark_pdf) >= 0  # rows-only check, like the driver
        return

    res = duck.execute(oracles[name])
    duck_pdf = res.df()
    duck_cols = list(duck_pdf.columns)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    a = _canon_pdf(spark_pdf)
    b = _canon_pdf(duck_pdf)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: first diffs {[(a[i], b[i]) for i in mism]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
