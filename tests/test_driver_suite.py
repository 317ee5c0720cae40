"""Driver registry (driver_suite.py): closure, size, spec accuracy,
and the in-repo mirror of the driver's suite-checksum compare.

The correctness driver records rows for the first 50 entries of
``__spark_entry__.queries()``; these tests pin that the curated
registry (a) fits that window, (b) covers every facet query exactly
once, (c) canonicalizes the real output schemas, and (d) produces
checksums DuckDB reproduces byte-for-byte.
"""

from __future__ import annotations

import duckdb
import pytest

from fugue_warehouses_spark import driver_suite as DS
from fugue_warehouses_spark.queries import ORACLE, QUERIES

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_driver_registry_fits_driver_window():
    q = DS.driver_queries()
    o = DS.driver_oracles()
    assert len(q) <= 50, "driver truncates at 50 entries"
    assert set(o) == set(q), "every driver entry needs an oracle"


def test_every_facet_covered_exactly_once():
    """Each registry query is a driver keep, a suite member, or a
    nondeterministic native represented by a deterministic twin —
    never none, never more than one."""
    members: list[str] = [m for ms in DS.SUITES.values() for m in ms]
    assert len(members) == len(set(members)), "facet in two suites"
    overlap = set(DS.KEEPS) & set(members)
    assert not overlap, f"keep also folded into a suite: {overlap}"
    covered = set(DS.KEEPS) | set(members) | set(DS.TWINNED)
    assert set(QUERIES) == covered, (
        f"uncovered: {sorted(set(QUERIES) - covered)}; "
        f"unknown: {sorted(covered - set(QUERIES))}"
    )
    for native, twin in DS.TWINNED.items():
        assert twin in members, f"twin {twin} not in any suite"


def test_keeps_have_full_row_oracles():
    for name in DS.KEEPS:
        assert name in ORACLE, f"driver keep {name} has no oracle"


def test_spec_matches_actual_output_schemas(spark, sf_dir):
    """SPEC drives canonicalization; a drifted column list would
    silently checksum the wrong thing. Re-derive from the live query
    schemas (analysis only — no job runs for most)."""
    kind_of = {
        "bigint": "i", "int": "i", "smallint": "i", "tinyint": "i",
        "boolean": "i", "double": "f", "float": "f", "string": "s",
    }
    members = [m for ms in DS.SUITES.values() for m in ms]
    mismatches = []
    for name in members:
        df = QUERIES[name](spark, sf_dir)
        want = tuple(
            (f.name, kind_of[f.dataType.simpleString()])
            for f in df.schema.fields
        )
        if DS.SPEC[name] != want:
            mismatches.append((name, DS.SPEC[name], want))
    assert not mismatches, mismatches[:3]


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in _TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("suite", sorted(DS.SUITES))
def test_suite_checksum_matches_oracle(spark, sf_dir, ddb, suite):
    """The driver's compare, in miniature: run the suite on Spark and
    its oracle on DuckDB, demand identical (facet, n_rows, sig) rows."""
    fn = DS.driver_queries()[suite]
    srows = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    drows = sorted(tuple(r) for r in ddb.sql(DS.driver_oracles()[suite]).fetchall())
    assert srows == drows, (
        f"{suite}: {[ (a, b) for a, b in zip(srows, drows) if a != b ][:3]}"
    )
