"""Standing gate for the DuckDB SUM->HUGEINT oracle-type class.

The driver's value hash is TYPE-sensitive: an oracle column arriving as
arrow decimal128(38,0) hash-mismatches Spark's int64 even when every
value is identical (CORRECTNESS_r03 ORACLE_REPETITION_FILTER,
CORRECTNESS_r04 q_pagerank / q_pmi_bigrams — three rounds, three
recurrences). The builder-side normalized comparison in
test_relational_probes.py is type-insensitive by design (it mirrors
value semantics), so this sweep pins the arrow OUTPUT TYPES instead:
every oracle in oracle_sql() must produce no decimal column.

DuckDB sources of decimal128: SUM(BIGINT) -> HUGEINT (propagates through
integer arithmetic), and literal decimal division. Fix at the oracle:
CAST(... AS BIGINT) on the offending output column.
"""

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entry
from goose_spark.ducklab import SF_DIR_DEFAULT as SF_DIR
from goose_spark.ducklab import duck_views


@pytest.fixture(scope="module")
def duck():
    con = duck_views(duckdb.connect(), SF_DIR)
    yield con
    con.close()


# Rendered ONCE: oracle_sql() re-reads parquet for the parameterized ANN
# oracles — per-test re-rendering added ~30 s of pure redundant work to
# every pytest run. Parametrize needs the names at collection time, so
# the render can't live in a fixture; a render failure must skip THIS
# module, not abort the whole session's collection.
try:
    OSQL = entry.oracle_sql()
except Exception as e:  # noqa: BLE001 — e.g. missing sf0.01 fixtures
    pytest.skip(f"oracle_sql() failed to render: {e!r}",
                allow_module_level=True)
ORACLES = sorted(OSQL.keys())


def _offending(field_type):
    # decimal128/decimal256 are the observed failure class; hugeint
    # itself arrives as decimal128(38,0) through the arrow bridge.
    return (pa.types.is_decimal(field_type)
            or (pa.types.is_list(field_type)
                and pa.types.is_decimal(field_type.value_type)))


@pytest.mark.parametrize("name", ORACLES)
def test_oracle_emits_no_decimal(duck, name):
    tbl = duck.execute(OSQL[name]).fetch_arrow_table()
    bad = [f"{f.name}: {f.type}" for f in tbl.schema if _offending(f.type)]
    assert not bad, (
        f"{name}: decimal-typed oracle column(s) {bad} — the driver's "
        "value hash will mismatch Spark's int64/float64 even on "
        "identical values; CAST the column in the oracle SQL.")
