"""Driver-contract registry invariants.

The correctness harness evaluates at most the first 50 queries()
entries (round 1 reported exactly the first 50 of 55, silently
dropping the KG family registered last). These tests pin the
contract shape so adding a 51st query fails CI instead of silently
vanishing from CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

DRIVER_QUERY_CAP = 50


def _registry():
    import __spark_entry__ as entry

    return entry.queries(), entry.oracle_sql()


def test_registry_fits_driver_cap():
    qs, _ = _registry()
    assert len(qs) <= DRIVER_QUERY_CAP, (
        f"{len(qs)} queries > driver cap {DRIVER_QUERY_CAP}: entries past "
        f"the cap are silently dropped from the correctness report — merge "
        f"queries sharing a scan (see queries.py PRIORITY comment)"
    )


def test_every_query_has_an_oracle():
    qs, sqls = _registry()
    missing = set(qs) - set(sqls)
    assert not missing, (
        f"queries without a DuckDB oracle (driver records a weaker "
        f"rows-only check): {sorted(missing)}"
    )
    orphaned = set(sqls) - set(qs)
    assert not orphaned, f"oracles without a query: {sorted(orphaned)}"


def test_priority_families_lead_the_iteration_order():
    from rkts_migration_spark.queries import PRIORITY

    qs, _ = _registry()
    names = list(qs)
    assert names[: len(PRIORITY)] == [p for p in PRIORITY if p in qs], (
        "KG parity families must come first so a lower driver cap still "
        "reports the queries that prove the most"
    )
