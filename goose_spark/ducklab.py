"""Shared DuckDB bootstrap for the oracle gates.

Single source of truth for the fixture-table list and the view setup
used by scripts/rehearse.py, tests/test_oracle_types.py and
tests/test_relational_probes.py — previously triplicated, so adding a
new fixture table silently desynchronized the gates.
"""

from __future__ import annotations

SF_DIR_DEFAULT = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def duck_views(con, sf_dir: str = SF_DIR_DEFAULT):
    """Register every fixture parquet as a DuckDB view; returns `con`."""
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con
