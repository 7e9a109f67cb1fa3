"""CLI — the Spark analogue of the reference ``tdigest`` binary
(tdigest_cli.rs:248-261: build / quantile / cdf / median subcommands).

Run locally or via ``spark-submit --py-files gr_tdigest_spark.zip``:

    python -m gr_tdigest_spark.cli build \
        --input /data/lineitem.parquet --column l_extendedprice \
        --keys l_returnflag --max-size 1000 --to-digest /out/digests

    python -m gr_tdigest_spark.cli quantile --from-digest /out/digests \
        --p 0.5,0.9,0.99
    python -m gr_tdigest_spark.cli cdf --from-digest /out/digests --x 100,200
    python -m gr_tdigest_spark.cli median --from-digest /out/digests
    python -m gr_tdigest_spark.cli merge --from-digest /a --merge-digest /b \
        --to-digest /out/merged

``--to-digest`` persists the digest table (keys + TDIG blob) as parquet
— the cluster-scale counterpart of a ``.tdig`` model file; query
subcommands print csv to stdout (header togglable, like
tdigest_cli.rs:780-866).

Input formats: parquet | csv | json | ndjson | text, auto-detected from
the extension like the reference CLI (tdigest_cli.rs:286-309).
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


def _read_input(spark: SparkSession, path: str, fmt: Optional[str]) -> DataFrame:
    if fmt is None:
        low = path.lower()
        if low.endswith(".parquet"):
            fmt = "parquet"
        elif low.endswith(".csv"):
            fmt = "csv"
        elif low.endswith((".json", ".ndjson", ".jsonl")):
            fmt = "json"
        elif low.endswith((".txt", ".text")):
            fmt = "text"
        else:
            fmt = "parquet"
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "csv":
        return spark.read.option("header", "true").option(
            "inferSchema", "true"
        ).csv(path)
    if fmt == "json":
        return spark.read.json(path)
    if fmt == "text":
        return spark.read.text(path).select(
            F.col("value").cast("double").alias("value")
        )
    raise SystemExit(f"unknown input format: {fmt}")


def _print_csv(df: DataFrame, header: bool) -> None:
    rows = df.collect()
    cols = df.columns
    if header:
        print(",".join(cols))
    for r in rows:
        print(",".join("" if v is None else str(v) for v in r))


def _load_digests(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def _key_cols(df: DataFrame) -> List[str]:
    return [c for c in df.columns if c != "tdigest"]


def main(argv: Optional[List[str]] = None) -> int:
    p = argparse.ArgumentParser(prog="gr-tdigest-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--header", action="store_true", default=False)
        sp.add_argument("--cores", type=int, default=None)

    b = sub.add_parser("build", help="build digest table from input data")
    b.add_argument("--input", required=True)
    b.add_argument("--format", default=None,
                   choices=[None, "parquet", "csv", "json", "text"])
    b.add_argument("--column", "--input-column", dest="column", required=True)
    b.add_argument("--keys", default=None,
                   help="comma-separated group-by columns (omit for global)")
    b.add_argument("--weight-column", default=None)
    b.add_argument("--max-size", type=int, default=1000)
    b.add_argument("--scale", default="k2")
    b.add_argument("--singleton-policy", dest="policy", default="use")
    b.add_argument("--pin-per-side", type=int, default=0)
    b.add_argument("--precision", default="f64", choices=["f64", "f32"])
    b.add_argument("--to-digest", required=True,
                   help="output parquet dir for the digest table")
    b.add_argument("--checkpoint-dir", default=None,
                   help="enable resumable build via this checkpoint dir")
    common(b)

    for name, hlp in [
        ("quantile", "query quantiles"), ("cdf", "query cdf"),
        ("median", "query median"), ("summary", "describe digests"),
    ]:
        s = sub.add_parser(name, help=hlp)
        s.add_argument("--from-digest", required=True)
        if name == "quantile":
            s.add_argument("--p", required=True,
                           help="comma-separated q values in [0,1]")
        if name == "cdf":
            s.add_argument("--x", required=True,
                           help="comma-separated probe values")
        common(s)

    m = sub.add_parser("merge", help="merge digest tables")
    m.add_argument("--from-digest", required=True)
    m.add_argument("--merge-digest", action="append", default=[])
    m.add_argument("--to-digest", required=True)
    common(m)

    args = p.parse_args(argv)

    from gr_tdigest_spark.plans import get_spark

    spark = get_spark(app=f"gr-tdigest-cli-{args.cmd}", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    import gr_tdigest_spark.functions as Fn

    try:
        if args.cmd == "build":
            df = _read_input(spark, args.input, args.format)
            keys = args.keys.split(",") if args.keys else None
            if args.checkpoint_dir:
                from gr_tdigest_spark.operators.agg import TDigestSpec
                from gr_tdigest_spark.sources.checkpoint import (
                    checkpointed_sketch_agg,
                )

                spec = TDigestSpec(
                    max_size=args.max_size, scale=args.scale,
                    policy=args.policy, pin_per_side=args.pin_per_side,
                    precision=args.precision,
                )
                out = checkpointed_sketch_agg(
                    df, keys, args.column, spec, args.checkpoint_dir,
                    weight_col=args.weight_column, out_col="tdigest",
                )
            else:
                from gr_tdigest_spark.operators import tdigest_agg

                out = tdigest_agg(
                    df, keys, args.column, weight_col=args.weight_column,
                    max_size=args.max_size, scale=args.scale,
                    policy=args.policy, pin_per_side=args.pin_per_side,
                    precision=args.precision,
                )
            out.write.mode("overwrite").parquet(args.to_digest)
            n = spark.read.parquet(args.to_digest).count()
            print(f"wrote {n} digest rows to {args.to_digest}",
                  file=sys.stderr)

        elif args.cmd == "quantile":
            dg = _load_digests(spark, args.from_digest)
            ks = _key_cols(dg)
            qs = [float(x) for x in args.p.split(",")]
            sel = ks + [
                Fn.tdigest_quantile("tdigest", q).alias(f"q{q}") for q in qs
            ]
            _print_csv(dg.select(*sel), args.header)

        elif args.cmd == "cdf":
            dg = _load_digests(spark, args.from_digest)
            ks = _key_cols(dg)
            xs = [float(x) for x in args.x.split(",")]
            sel = ks + [
                Fn.tdigest_cdf("tdigest", x).alias(f"cdf{x}") for x in xs
            ]
            _print_csv(dg.select(*sel), args.header)

        elif args.cmd == "median":
            dg = _load_digests(spark, args.from_digest)
            ks = _key_cols(dg)
            _print_csv(
                dg.select(*ks, Fn.tdigest_median("tdigest").alias("median")),
                args.header,
            )

        elif args.cmd == "summary":
            dg = _load_digests(spark, args.from_digest)
            ks = _key_cols(dg)
            _print_csv(
                dg.select(*ks, Fn.tdigest_summary("tdigest").alias("summary")),
                args.header,
            )

        elif args.cmd == "merge":
            tables = [_load_digests(spark, args.from_digest)] + [
                _load_digests(spark, pth) for pth in args.merge_digest
            ]
            allp = tables[0]
            for t in tables[1:]:
                allp = allp.unionByName(t)
            ks = _key_cols(allp)
            if ks:
                merged = allp.groupBy(*ks).agg(
                    Fn.merge_tdigests("tdigest").alias("tdigest")
                )
            else:
                merged = allp.agg(
                    Fn.merge_tdigests("tdigest").alias("tdigest")
                )
            merged.write.mode("overwrite").parquet(args.to_digest)
            print(f"wrote merged digests to {args.to_digest}",
                  file=sys.stderr)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
