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


def _choose_precision(df: DataFrame, column: str, flag: str) -> str:
    """``--precision auto``: f32 iff every value is finite and
    f32-representable within 1e-6 relative error (reference
    tdigest_cli.rs:660-681). One JVM-side aggregate pass — the f32
    round-trip is ``cast(float)→cast(double)``, no Python."""
    if flag != "auto":
        return flag
    v = F.col(column).cast("double")
    back = v.cast("float").cast("double")
    ok = (
        ~F.isnan(v) & (F.abs(v) != float("inf"))
        & (F.abs(back - v) <= 1e-6 * F.greatest(F.abs(v), F.lit(1.0)))
    )
    row = df.where(F.col(column).isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ok.cast("int")).alias("all_ok"),
    ).first()
    # empty input → f64, like the reference's !values.is_empty() guard
    return "f32" if (row["n"] or 0) > 0 and row["all_ok"] == 1 else "f64"


def _parse_probe_file(path: str, fmt: Optional[str],
                      column: Optional[str]) -> List[float]:
    """Driver-side probe-file ingest (probe lists are small by
    construction) — text / csv / json, auto-detected from the extension
    like the reference (tdigest_cli.rs:169-190); ``column`` selects a
    csv/json field by name or 0-based index."""
    import json as _json

    low = path.lower()
    if fmt in (None, "auto"):
        if low.endswith(".csv"):
            fmt = "csv"
        elif low.endswith((".json", ".ndjson", ".jsonl")):
            fmt = "json"
        else:
            fmt = "text"
    with open(path) as fh:
        raw = fh.read()
    if fmt == "text":
        toks = raw.replace(",", " ").split()
        return [float(t) for t in toks]
    if fmt == "csv":
        import csv as _csv

        rows = list(_csv.reader(raw.splitlines()))
        if not rows:
            return []
        header = rows[0]
        if column is None:
            idx, body = 0, rows
            # skip a non-numeric first row (header)
            try:
                float(rows[0][0])
            except ValueError:
                body = rows[1:]
        elif column.isdigit():
            idx, body = int(column), rows
            try:
                float(rows[0][idx])
            except ValueError:
                body = rows[1:]
        else:
            if column not in header:
                raise SystemExit(f"probe column {column!r} not in csv header")
            idx, body = header.index(column), rows[1:]
        return [float(r[idx]) for r in body if r]
    if fmt == "json":
        lines = [ln for ln in raw.splitlines() if ln.strip()]
        try:
            doc = _json.loads(raw)
        except ValueError:
            doc = [_json.loads(ln) for ln in lines]
        if isinstance(doc, dict):
            doc = [doc]
        out = []
        for item in doc:
            if isinstance(item, (int, float)):
                out.append(float(item))
            elif isinstance(item, dict):
                if column is None:
                    raise SystemExit(
                        "--probes-column required for json objects"
                    )
                out.append(float(item[column]))
            else:
                raise SystemExit("unsupported json probe payload")
        return out
    raise SystemExit(f"unknown probe format: {fmt}")


def _gather_probes(args) -> List[float]:
    vals: List[float] = []
    if args.x:
        vals.extend(float(t) for t in args.x.split(","))
    if getattr(args, "probes_stdin", False) and getattr(
        args, "probes_input", None
    ):
        raise SystemExit("--probes-stdin conflicts with --probes-input")
    if getattr(args, "probes_stdin", False):
        vals.extend(float(t) for t in sys.stdin.read().split())
    if getattr(args, "probes_input", None):
        vals.extend(
            _parse_probe_file(args.probes_input, args.probes_format,
                              args.probes_column)
        )
    if not vals:
        raise SystemExit("no probes given (--x / --probes-input / "
                         "--probes-stdin)")
    return vals


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
    b.add_argument("--precision", default="f64",
                   choices=["f64", "f32", "auto"],
                   help="auto = f32 iff every value is f32-representable "
                        "within 1e-6 relative error")
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
            s.add_argument("--x", default=None,
                           help="comma-separated probe values")
            s.add_argument("--probes-input", default=None, metavar="PATH",
                           help="read probes from file (text/csv/json)")
            s.add_argument("--probes-stdin", action="store_true",
                           default=False)
            s.add_argument("--probes-format", default=None,
                           choices=[None, "auto", "text", "csv", "json"])
            s.add_argument("--probes-column", default=None,
                           help="csv/json probe field, name or 0-based "
                                "index")
        common(s)

    m = sub.add_parser("merge", help="merge digest tables")
    m.add_argument("--from-digest", required=True)
    m.add_argument("--merge-digest", action="append", default=[])
    m.add_argument("--to-digest", required=True)
    common(m)

    args = p.parse_args(argv)

    from gr_tdigest_spark.plans import get_spark

    # reuse an already-active session (in-process/test drives) and
    # leave its lifecycle to the caller
    existing = SparkSession.getActiveSession()
    spark = existing or get_spark(
        app=f"gr-tdigest-cli-{args.cmd}", cores=args.cores
    )
    spark.sparkContext.setLogLevel("ERROR")

    import gr_tdigest_spark.functions as Fn

    try:
        if args.cmd == "build":
            df = _read_input(spark, args.input, args.format)
            keys = args.keys.split(",") if args.keys else None
            args.precision = _choose_precision(df, args.column,
                                               args.precision)
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
            xs = _gather_probes(args)
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
        if existing is None:
            spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
