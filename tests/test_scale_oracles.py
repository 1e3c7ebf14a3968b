"""Scale-oracle equivalence (r8, VERDICT r7 next-round #1): every
cost-aware second oracle formulation in catalog.scale_oracle_sql()
must produce EXACTLY the registered naive oracle's frame at sf0.01 —
values, types, row multiplicity. DuckDB-only (no Spark session): the
two formulations are both oracles; the Spark-vs-oracle comparison is
the driver's/gate's job. The scale forms mirror the engine's blocking
(co-count inverted index, star sparsification, list-comprehension
dots) so the sf≥1 gate's DuckDB side no longer times out on all-pairs
formulations."""

from __future__ import annotations

import duckdb
import pytest

# slow (r10): sf0.1 scale-oracle equivalence sweep — the same
# equivalence the sf1 gate exercises; outran the driver window.
pytestmark = __import__('pytest').mark.slow

SF = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def _frames_equal(con, naive_sql, scale_sql):
    a = con.sql(naive_sql).df()
    b = con.sql(scale_sql).df()
    cols = sorted(a.columns)
    assert cols == sorted(b.columns)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True)
    assert len(a) == len(b)
    assert a.equals(b), "scale oracle diverges from the naive oracle"


def test_every_scale_oracle_matches_naive(con):
    from mrbf_spark import catalog

    naive, scale = catalog.oracle_sql(), catalog.scale_oracle_sql()
    assert scale, "no scale oracles registered"
    for name, sql in scale.items():
        assert name in naive, f"{name} has a scale oracle but no naive one"
        _frames_equal(con, naive[name], sql)


def test_scale_oracle_set_is_the_sf1_timeout_set():
    """The set is exactly the entries whose naive twins timed out at
    sf1 (the three r7 ones, plus dedup_simhash's r9 census whose
    shared-CTE naive form is 6-20+ min in DuckDB at sf1) — new
    timeouts should extend this set deliberately, not silently."""
    from mrbf_spark import catalog

    assert set(catalog.scale_oracle_sql()) == {
        "dedup_minhash_lsh",
        "dedup_clusters",
        "embedding_dedup_suite",
        "dedup_simhash",
    }
