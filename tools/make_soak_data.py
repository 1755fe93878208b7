"""Generate an sf1-SCALE soak fixture by replicating the sf0.1 driver
fixture N times with disjoint key spaces.

Usage: python tools/make_soak_data.py [N] [SRC] [DST]
       (defaults: 10 /root/testdata/sf0.1 /tmp/soak_sf1)

Purpose: the per-round sf0.1 soak has caught scale-latent parity bugs the
sf0.01 gate cannot see (density- and domain-sensitive predicates). This
pushes one decade further for the heavy queries WITHOUT synthesizing new
query inputs: the content is the driver's own fixture, replicated with
every key column offset per replica so joins stay consistent and
cardinalities scale ~10x. Both engines read the same generated parquet,
so the oracle gate runs unchanged against the output directory.

Replication semantics to note when reading soak results: distinct counts
scale with the replica count, per-key densities (orders per customer,
tokens per doc) stay fixed, and cross-replica joins never match (keys are
disjoint by construction).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from poc_juma_etl_spark.catalog import TABLE_NAMES  # noqa: E402

# key columns to offset per replica, per table (foreign keys offset by the
# referenced table's span so referential integrity survives replication)
KEYS: dict[str, dict[str, str]] = {
    # col -> span-source table (whose max+1 is the offset unit)
    "region": {"r_regionkey": "region"},
    "nation": {"n_nationkey": "nation", "n_regionkey": "region"},
    "customer": {"c_custkey": "customer", "c_nationkey": "nation"},
    "supplier": {"s_suppkey": "supplier", "s_nationkey": "nation"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "events_user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}

SPAN_SQL = {
    "region": "SELECT MAX(r_regionkey) + 1 FROM read_parquet('{src}/region.parquet')",
    "nation": "SELECT MAX(n_nationkey) + 1 FROM read_parquet('{src}/nation.parquet')",
    "customer": "SELECT MAX(c_custkey) + 1 FROM read_parquet('{src}/customer.parquet')",
    "supplier": "SELECT MAX(s_suppkey) + 1 FROM read_parquet('{src}/supplier.parquet')",
    "part": "SELECT MAX(p_partkey) + 1 FROM read_parquet('{src}/part.parquet')",
    "orders": "SELECT MAX(o_orderkey) + 1 FROM read_parquet('{src}/orders.parquet')",
    "events": "SELECT MAX(event_id) + 1 FROM read_parquet('{src}/events.parquet')",
    "events_user": "SELECT MAX(user_id) + 1 FROM read_parquet('{src}/events.parquet')",
    "documents": "SELECT MAX(doc_id) + 1 FROM read_parquet('{src}/documents.parquet')",
    "embeddings": "SELECT MAX(vec_id) + 1 FROM read_parquet('{src}/embeddings.parquet')",
}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = Path(sys.argv[3] if len(sys.argv) > 3 else "/tmp/soak_sf1")
    dst.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    spans = {k: con.execute(q.format(src=src)).fetchone()[0] for k, q in SPAN_SQL.items()}
    print(f"spans: {spans}")
    for name in TABLE_NAMES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{name}.parquet')"
            ).fetchall()
        ]
        keyed = KEYS.get(name, {})
        parts = []
        for i in range(n):
            sel = ", ".join(
                f"{c} + {i * spans[keyed[c]]} AS {c}" if c in keyed and i else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM read_parquet('{src}/{name}.parquet')")
        union = " UNION ALL ".join(parts)
        out = dst / f"{name}.parquet"
        con.execute(f"COPY ({union}) TO '{out}' (FORMAT PARQUET)")
        cnt = con.execute(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{name}: {cnt} rows -> {out}")


if __name__ == "__main__":
    main()
