"""CLI drives (in-process): --precision auto picks f32 for integer-ish
columns and f64 for pi-ish values (reference tdigest_cli.rs:660-681);
cdf reads probes from files (tdigest_cli.rs:169-190)."""

import json

import pandas as pd
import pytest

from gr_tdigest_spark.cli import main, _parse_probe_file
from gr_tdigest_spark.sketches import wire as td_wire


def _build(spark, tmp_path, values, precision):
    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "digests")
    spark.createDataFrame(
        pd.DataFrame({"x": values})
    ).write.mode("overwrite").parquet(src)
    rc = main([
        "build", "--input", src, "--column", "x",
        "--max-size", "100", "--precision", precision,
        "--to-digest", out,
    ])
    assert rc == 0
    blob = bytes(spark.read.parquet(out).first()["tdigest"])
    return td_wire.wire_precision(blob)


def test_precision_auto_picks_f32_for_integers(spark, tmp_path):
    assert _build(
        spark, tmp_path, [float(i) for i in range(1, 200)], "auto"
    ) == "f32"


def test_precision_auto_accepts_pi_within_tolerance(spark, tmp_path):
    """f32 relative rounding error (~6e-8) is inside the reference's
    1e-6 tolerance, so even pi-ish values pick f32 — f64 only triggers
    on f32 overflow (reference is_representable_in_f32)."""
    import math
    vals = [math.pi * 1e7 * (i + 1) for i in range(50)]
    assert _build(spark, tmp_path, vals, "auto") == "f32"


def test_precision_auto_picks_f64_beyond_f32_range(spark, tmp_path):
    vals = [1e39, 2e39, 1.0]  # overflow f32 -> inf -> not representable
    assert _build(spark, tmp_path, vals, "auto") == "f64"


def test_precision_explicit_still_wins(spark, tmp_path):
    import math
    vals = [math.pi * 1e7 * (i + 1) for i in range(50)]
    assert _build(spark, tmp_path, vals, "f64") == "f64"


def test_cdf_probes_input_file(spark, tmp_path, capsys):
    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "digests")
    spark.createDataFrame(
        pd.DataFrame({"x": [float(i) for i in range(100)]})
    ).write.mode("overwrite").parquet(src)
    assert main(["build", "--input", src, "--column", "x",
                 "--max-size", "20000", "--singleton-policy", "off",
                 "--to-digest", out]) == 0
    capsys.readouterr()
    probes = tmp_path / "probes.txt"
    probes.write_text("25\n50\n75\n")
    assert main(["cdf", "--from-digest", out,
                 "--probes-input", str(probes), "--header"]) == 0
    got = capsys.readouterr().out.strip().splitlines()
    assert got[0].startswith("cdf25")
    vals = [float(v) for v in got[1].split(",")]
    assert vals == [0.255, 0.505, 0.755]


def test_cdf_requires_some_probe(spark, tmp_path):
    src = str(tmp_path / "in.parquet")
    out = str(tmp_path / "digests")
    spark.createDataFrame(
        pd.DataFrame({"x": [1.0, 2.0]})
    ).write.mode("overwrite").parquet(src)
    main(["build", "--input", src, "--column", "x", "--to-digest", out])
    with pytest.raises(SystemExit):
        main(["cdf", "--from-digest", out])


def test_parse_probe_file_csv_named_column(tmp_path):
    f = tmp_path / "p.csv"
    f.write_text("id,probe\n1,10.5\n2,20.5\n")
    assert _parse_probe_file(str(f), None, "probe") == [10.5, 20.5]


def test_parse_probe_file_csv_index(tmp_path):
    f = tmp_path / "p.csv"
    f.write_text("a,b\n1,2\n3,4\n")
    assert _parse_probe_file(str(f), None, "1") == [2.0, 4.0]


def test_parse_probe_file_json_variants(tmp_path):
    arr = tmp_path / "p.json"
    arr.write_text(json.dumps([1.5, 2.5]))
    assert _parse_probe_file(str(arr), None, None) == [1.5, 2.5]
    nd = tmp_path / "p.ndjson"
    nd.write_text('{"x": 3.5}\n{"x": 4.5}\n')
    assert _parse_probe_file(str(nd), None, "x") == [3.5, 4.5]
