"""catalog.parts() (r8, VERDICT r7 next-round #8): the declared
per-entry part map must equal the parts the live frames actually emit
— regenerated here from every registered query at smoke scale, so a
part added or renamed anywhere in the catalog fails this test until
the declaration follows."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE


@pytest.mark.slow
def test_declared_parts_match_live_frames(spark):
    from mrbf_spark import catalog
    from mrbf_spark.registry import release_scoped_caches

    declared = catalog.parts()
    qs = catalog.queries()
    assert set(declared) == set(qs)  # whole catalog covered

    for name, fn in qs.items():
        df = fn(spark, SF_SMOKE)
        tag = "part" if "part" in df.columns else (
            "q" if name == "tpch_suite" and "q" in df.columns else None
        )
        if tag is None:
            # single-op entry: declared as itself
            assert declared[name] == [name], name
        else:
            live = sorted(
                r[0] for r in df.select(tag).distinct().collect()
            )
            assert sorted(declared[name]) == live, (
                f"{name}: declared {sorted(declared[name])} != live {live}"
            )
        release_scoped_caches()


def test_parts_map_is_fresh_dict(spark):
    from mrbf_spark import catalog

    a, b = catalog.parts(), catalog.parts()
    a["token_stats"].append("mutated")
    assert b["token_stats"] == ["token_stats"]  # no shared state
