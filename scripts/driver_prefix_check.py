"""Replay the driver's grading prefix EXACTLY: take the first N queries
in __spark_entry__._ordered() order (regrade-first, then never-graded,
then stalest-first rotation — the same 50-slot prefix the driver will
grade this round), run each at sf0.01 against its DuckDB oracle, and
canonicalize with the DRIVER'S pandas sort_values canonicalizer (the
one that errs on unhashable cells — tests/oracle_harness.py stringifies
row-wise and cannot catch that class; the r10 vocab_encode_documents
err got through it).

Run:  python scripts/driver_prefix_check.py [--n=50] [--sf=/root/testdata/sf0.01]
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == float:
            df[c] = df[c].round(6)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()


def main() -> None:
    n = 50
    sf = "/root/testdata/sf0.01"
    names = None
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
        if a.startswith("--names="):  # grade a named subset instead
            names = a.split("=", 1)[1].split(",")
    import __spark_entry__ as entry
    from opensea_datapipeline_spark.session import get_spark

    spark = get_spark("driver-prefix-check", freeze_gc=True)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf}/{t}.parquet')"
        )
    results = {}
    for name in (names if names is not None else list(qs)[:n]):
        try:
            sp = qs[name](spark, sf).toPandas()
            if name not in oracles:
                results[name] = {"rows": len(sp), "oracle": None}
                print(json.dumps({name: results[name]}))
                continue
            od = con.execute(oracles[name]).df()
            results[name] = {
                "rows_match": len(sp) == len(od),
                "cols_match": sorted(sp.columns) == sorted(od.columns),
                "hash_match": canon(sp) == canon(od),
                "rows": len(sp),
            }
        except Exception as exc:  # the driver records errs the same way
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
        print(json.dumps({name: results[name]}))
    bad = {
        k: v
        for k, v in results.items()
        if v.get("err")
        or (v.get("oracle", "x") is not None and not v.get("hash_match"))
    }
    print(json.dumps({"checked": len(results), "bad": bad}))
    spark.stop()


if __name__ == "__main__":
    main()
