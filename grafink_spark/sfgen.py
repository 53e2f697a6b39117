"""Scale-up generator: synthesize sf1 test data from sf0.1 by key-offset
replication (VERDICT r1 #10 — an sf1 bench section so operators whose
constants hide at small scale get measured).

Each fact/dim table is replicated ``factor`` times; every key column is
offset per copy by a base computed from the ACTUAL max of its key
domain across all tables sharing it (orderkey spans orders+lineitem,
custkey spans customer+orders, …), so referential integrity and
group-size distributions are preserved — the workload scales linearly
in rows, not quadratically in group sizes. Document text gets a
per-copy suffix so replicated docs are near-dups, not exact dups (the
dedup queries then see a realistic near-dup population instead of a
degenerate 10-way exact-dup one). nation/region stay single-copy
(fixed dimensions). Output is one parquet FILE per table (DuckDB COPY),
matching the layout ``load_table`` expects.
"""

from __future__ import annotations

import os

# key domains: tables+columns sharing an id space
DOMAINS: dict[str, list[tuple[str, str]]] = {
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event": [("events", "event_id")],
    "user": [("events", "user_id")],
    "doc": [("documents", "doc_id")],
    "vec": [("embeddings", "vec_id")],
}

REPLICATED = [
    "orders",
    "lineitem",
    "customer",
    "part",
    "supplier",
    "events",
    "documents",
    "embeddings",
]
SINGLE_COPY = ["nation", "region"]

MARKER = "_SFGEN_COMPLETE"


def _offset_expr(
    table: str, col: str, typ: str, bases: dict[tuple[str, str], int]
) -> str:
    base = bases.get((table, col))
    if base is not None:
        return f"{col} + i.range * {base} AS {col}"
    if table == "documents" and col == "text":
        # per-copy suffix → near-dups across copies, not exact dups
        return (
            "CASE WHEN i.range > 0 THEN text || ' #' || i.range "
            "ELSE text END AS text"
        )
    if typ.upper() == "TIMESTAMP":
        # DuckDB TIMESTAMP → parquet NTZ; the source testdata is
        # UTC-adjusted, and Spark-side code casts ts to epoch (fails on
        # NTZ) — force TIMESTAMPTZ so the parquet matches the source
        return f"{col}::TIMESTAMPTZ AS {col}"
    return col


def generate(src_dir: str, out_dir: str, factor: int = 10) -> None:
    """Write ``{out_dir}/{table}.parquet`` replicated ``factor``×."""
    import duckdb

    con = duckdb.connect()
    os.makedirs(out_dir, exist_ok=True)

    bases: dict[tuple[str, str], int] = {}
    for cols in DOMAINS.values():
        mx = 0
        for t, c in cols:
            v = con.sql(
                f"SELECT max({c}) FROM '{src_dir}/{t}.parquet'"
            ).fetchone()[0]
            mx = max(mx, int(v or 0))
        for t, c in cols:
            bases[(t, c)] = mx + 1

    for t in REPLICATED:
        cols = [
            (r[0], r[1])
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{src_dir}/{t}.parquet'"
            ).fetchall()
        ]
        select = ", ".join(_offset_expr(t, c, typ, bases) for c, typ in cols)
        con.sql(
            f"COPY (SELECT {select} FROM '{src_dir}/{t}.parquet' "
            f"CROSS JOIN range({factor}) i ORDER BY i.range) "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in SINGLE_COPY:
        con.sql(
            f"COPY (SELECT * FROM '{src_dir}/{t}.parquet') "
            f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    with open(os.path.join(out_dir, MARKER), "w") as f:
        f.write(f"src={src_dir} factor={factor}\n")


def ensure(
    src_dir: str = "/root/testdata/sf0.1",
    out_dir: str | None = None,
    factor: int = 10,
) -> str:
    """Generate once, cache on disk (marker file), return the dir."""
    if out_dir is None:
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".sf1data")
        out_dir = os.path.normpath(out_dir)
    if not os.path.exists(os.path.join(out_dir, MARKER)):
        generate(src_dir, out_dir, factor)
    return out_dir


if __name__ == "__main__":
    import sys

    print(ensure(*sys.argv[1:]))
