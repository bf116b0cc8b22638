"""Second-line-of-defense property tests for mirrored-formula queries
(VERDICT r11 task 5): where the DuckDB oracle replays the Spark formula
verbatim (the moment-sum window family, the iterative trainers), a shared
formula bug can hash-match through both engines — the r10
``window_stat_aggs`` n=1 episode is the proof.  These tests recompute the
same quantities with NAIVE, INDEPENDENT implementations (plain-Python
loops, float accumulation with tolerance, pure-numpy Lloyd's), so a
defect in the shared lowering cannot cancel out.

Reference parity targets: functions/window/StdDev*/Var*/Corr window
classes; the FAISS-style coarse-quantizer training loop; the BPE
merge-training loop (count pairs -> argmax -> greedy rewrite).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from questdb_spark.sources.parquet import load_table

from .conftest import SF_DIR


def test_window_stat_aggs_vs_naive_float(spark):
    """The exact-decimal moment identities must agree with a plain-float
    per-frame recomputation (numpy over the literal up-to-10-row frame) to
    within the decimal-rounding tolerance.  Frames whose variance is pure
    rounding residue (naive denom ~ 0) are skipped for corr — those edges
    are pinned exactly by the DuckDB oracle; this test targets the
    formulas on non-degenerate frames."""
    from questdb_spark.queries_core import window_stat_aggs

    got = window_stat_aggs(spark, SF_DIR).toPandas()
    li = (
        load_table(spark, SF_DIR, "lineitem")
        .filter("l_orderkey < 300")
        .select(
            "l_returnflag", "l_orderkey", "l_linenumber",
            "l_extendedprice", "l_quantity",
        )
        .toPandas()
    )
    # the query's frame ordering, replayed independently in pandas
    li = li.sort_values(
        ["l_returnflag", "l_orderkey", "l_linenumber",
         "l_extendedprice", "l_quantity"],
        kind="mergesort",
    )
    expected = {}
    for flag, grp in li.groupby("l_returnflag", sort=False):
        xs = [round(float(v), 2) for v in grp["l_extendedprice"]]
        ys = [round(float(v), 2) for v in grp["l_quantity"]]
        oks = list(zip(grp["l_orderkey"], grp["l_linenumber"]))
        for i in range(len(xs)):
            fx = np.array(xs[max(0, i - 9): i + 1])
            fy = np.array(ys[max(0, i - 9): i + 1])
            n = len(fx)
            if n == 1:
                expected.setdefault((flag, *oks[i]), []).append(
                    (0.0, None, None, None, None)
                )
                continue
            vp = float(fx.var())            # numpy population variance
            vs = float(fx.var(ddof=1))      # sample
            sd = math.sqrt(vs) if vs >= 0 else None
            cv = float(np.cov(fx, fy, ddof=1)[0, 1])
            dx, dy = fx - fx.mean(), fy - fy.mean()
            denom = float((dx @ dx) * (dy @ dy))
            corr = float((dx @ dy) / math.sqrt(denom)) if denom > 1.0 else "skip"
            expected.setdefault((flag, *oks[i]), []).append(
                (vp, vs, sd, cv, corr)
            )

    # tolerance floor: the query rounds the sxx/sxy moment sums at scale 0
    # (error <= 0.5), and the smallest divisor is n-1 = 1 — so a plain
    # atol of 1.0 covers the decimal-rounding envelope while still
    # catching any formula-level defect (values here are 1e4..1e8)
    def close(a, b, atol=1.0, rtol=1e-6):
        if isinstance(a, float) and math.isnan(a):
            a = None  # Spark NULL arrives as NaN in a float pandas column
        if b == "skip":
            return True
        if b is None or a is None:
            return a is None and b is None
        return abs(a - b) <= atol + rtol * abs(b)

    n_checked = 0
    # duplicate sort keys make frame ROWS ambiguous but frame MULTISETS
    # identical (the query extends the sort to every column entering the
    # arithmetic) — group result rows by key and match as multisets
    got_by_key: dict = {}
    for r in got.itertuples(index=False):
        got_by_key.setdefault(
            (r.l_returnflag, r.l_orderkey, r.l_linenumber), []
        ).append(r)
    assert set(got_by_key) == set(expected)
    for key, rows in got_by_key.items():
        exps = expected[key]
        assert len(rows) == len(exps), key
        used = [False] * len(exps)
        for r in rows:
            hit = None
            for j, e in enumerate(exps):
                if used[j]:
                    continue
                if (
                    close(r.var_pop_w, e[0])
                    and close(r.var_samp_w, e[1])
                    and close(r.stddev_w, e[2], atol=0.5)
                    and close(r.covar_samp_w, e[3])
                    and close(r.corr_w, e[4], atol=0.01)
                ):
                    hit = j
                    break
            assert hit is not None, (key, r, exps)
            used[hit] = True
            n_checked += 1
    assert n_checked == len(got)


def test_embedding_kmeans_vs_naive_lloyd(spark):
    """kmeans_train (distributed: Arrow argmin kernel + one groupBy per
    round + (s + cnt*OFF)//cnt - OFF floor-mean) must equal a naive pure-
    numpy Lloyd's run: same init (k lowest ids, quantized), argmin by
    literal squared-L2 with lowest-cell tie-break, update by plain Python
    floor division s // cnt.  Exact integer equality — any shuffle loss,
    tie-break, or offset-arithmetic defect in the distributed path breaks
    it here even if the CTE oracle mirrors the defect."""
    from questdb_spark.pipeline import similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    got = similarity.kmeans_train(emb, k=8, iters=2)

    pdf = emb.select("vec_id", "embedding").toPandas()
    pdf = pdf.sort_values("vec_id")
    a = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64) * 1000.0
    q = (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)
    cents = q[:8].copy()
    for _ in range(2):
        # literal ||q - c||^2, no dot-product identity — independent path
        d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # numpy argmin: first (lowest cell) tie
        nxt = cents.copy()
        for c in range(8):
            members = q[assign == c]
            if len(members):
                nxt[c] = np.array(
                    [int(s) // len(members) for s in members.sum(axis=0)]
                )
        cents = nxt
    assert [list(map(int, c)) for c in cents] == [
        [int(v) for v in c] for c in got
    ]


def test_bpe_train_vs_naive_python(spark):
    """bpe_train (per-round Spark aggregate + Catalyst greedy-fold
    rewrite) must learn the same merge table as a naive pure-Python BPE
    over the collected corpus: whitespace-lowercase tokenize, count
    adjacent pairs, argmax with lexicographic (a, b) tie-break, greedy
    left-to-right fold.  Exact equality on (rank, a, b, count)."""
    from questdb_spark.pipeline.text import bpe_train

    docs = load_table(spark, SF_DIR, "documents")
    got = bpe_train(docs, merges=3)

    texts = [r["text"] for r in docs.select("text").collect()]
    corpus = [re.split(r"\s+", t.strip().lower()) for t in texts]

    def fold(toks: list[str], a: str, b: str, merged: str) -> list[str]:
        if not toks:
            return toks
        out = [toks[0]]
        for t in toks[1:]:
            if out[-1] == a and t == b:
                out[-1] = merged
            else:
                out.append(t)
        return out

    expected = []
    for rank in range(1, 4):
        counts: dict = {}
        for toks in corpus:
            for x, y in zip(toks, toks[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        (a, b), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rank, a, b, n))
        corpus = [fold(t, a, b, a + " " + b) for t in corpus]

    assert [(r, a, b, int(n)) for r, a, b, n in got] == expected


def test_ema_vs_naive_python_fold(spark):
    """The EMA oracle replays the same recurrence as a recursive CTE
    (mirrored formula), so recompute it with a naive pure-Python fold
    (y = a*x + (1-a)*y in plain floats, no pandas ewm, no guard) and
    compare with tolerance — the relative error of reordering the same
    linear recurrence is bounded far below 1e-9 at these magnitudes."""
    from questdb_spark.functions.finance import ema as batch_ema

    ev = load_table(spark, SF_DIR, "events").select("user_id", "ts", "value")
    got = {
        (r["user_id"], r["ts"]): r["ema"]
        for r in batch_ema(ev, "ts", "value", alpha=0.2, keys=["user_id"]).collect()
    }
    pdf = ev.toPandas().sort_values(["user_id", "ts"], kind="mergesort")
    expected = {}
    for uid, grp in pdf.groupby("user_id", sort=False):
        y = None
        for t, x in zip(grp["ts"], grp["value"]):
            x = float(x)
            y = x if y is None else 0.2 * x + 0.8 * y
            expected[(uid, t)] = y
    assert len(got) == len(expected) > 0
    for k, e in expected.items():
        assert abs(got[k] - e) <= 1e-9 * max(1.0, abs(e)), (k, got[k], e)


def test_decimal256_vs_python_bigint(spark):
    """The decimal256 oracle replays the SAME limb construction in DuckDB
    HUGEINTs (mirrored formula), so recompute every exported operation
    with Python's native arbitrary-precision integers — a completely
    independent arithmetic engine.  Deterministic LCG operands (70-digit
    adds/subs/divides, 35-digit multiplies so products fit 72 digits);
    exact string equality on every row, covering add / subtract /
    multiply / divide_long / mod_long / rescale (HALF_UP) / compare /
    the widened-limb SUM aggregate / the string round-trip."""
    from questdb_spark.functions import decimal256 as d256

    # fixed LCG — no RNG, identical across runs
    xs, x = [], 12345
    for _ in range(80):
        x = (x * 6364136223846793005 + 1442695040888963407) % 10**70
        xs.append(x)
    rows = []
    for i in range(0, 80, 2):
        a, b = xs[i], xs[i + 1]
        if a < b:
            a, b = b, a
        am, bm = a % 10**35, b % 10**35
        d = 1 + (a % (10**17 - 1))
        rows.append((str(a), str(b), str(am), str(bm), d))
    df = spark.createDataFrame(
        rows, "sa string, sb string, sma string, smb string, d long"
    )
    wa, wb = d256.from_string(F.col("sa")), d256.from_string(F.col("sb"))
    got = df.select(
        "sa", "sb", "sma", "smb", "d",
        d256.to_string(d256.add(wa, wb)).alias("add_s"),
        d256.to_string(d256.subtract(wa, wb)).alias("sub_s"),
        d256.to_string(
            d256.multiply(
                d256.from_string(F.col("sma")), d256.from_string(F.col("smb"))
            )
        ).alias("mul_s"),
        d256.divide_long_str(wa, F.col("d")).alias("div_s"),
        d256.mod_long(wa, F.col("d")).alias("mod_l"),
        d256.rescale_str(wa, 5).alias("r5"),
        d256.rescale_str(wa, 23).alias("r23"),
        d256.compare(wa, wb).alias("cmp"),
        d256.to_string(wa).alias("rt"),
    ).collect()
    assert len(got) == len(rows)

    def half_up(v: int, k: int) -> int:
        return v // 10**k + (1 if (v // 10 ** (k - 1)) % 10 >= 5 else 0)

    for r in got:
        a, b = int(r["sa"]), int(r["sb"])
        am, bm, d = int(r["sma"]), int(r["smb"]), int(r["d"])
        assert r["rt"] == str(a)
        assert r["add_s"] == str(a + b), (a, b)
        assert r["sub_s"] == str(a - b), (a, b)
        assert r["mul_s"] == str(am * bm), (am, bm)
        assert r["div_s"] == str(a // d), (a, d)
        assert r["mod_l"] == a % d, (a, d)
        assert r["r5"] == str(half_up(a, 5)), a
        assert r["r23"] == str(half_up(a, 23)), a
        assert r["cmp"] == (1 if a > b else 0), (a, b)
    # widened-limb SUM: one map-side-combinable aggregate vs python sum
    total = df.select(d256.from_string(F.col("sa")).alias("w")).agg(
        *d256.sum_agg(F.col("w"))
    ).select(d256.to_string(d256.normalized()).alias("s")).collect()[0]["s"]
    assert total == str(sum(int(r0[0]) for r0 in rows))


def test_pq_adc_vs_naive_reconstruction(spark):
    """The PQ/ADC oracle replays the same LUT construction in SQL
    (mirrored formula), so recompute the whole index with naive numpy on
    DIFFERENT routes: encode by literal ||sub - codeword||^2 (the
    distributed kernel uses the -2*sub@c + ||c||^2 identity), ADC by
    RECONSTRUCTION distance ||query - concat(codewords[codes])||^2 (the
    operator sums per-subspace LUT lookups).  Exact integer equality on
    every code and on the top-10 (distance, id) list; plus an exact-
    top-10 overlap floor so the approximation itself stays sane."""
    from questdb_spark.pipeline import similarity

    emb = load_table(spark, SF_DIR, "embeddings")
    cbs = similarity.pq_codebooks(emb)
    codes_df = similarity.pq_encode(emb, cbs)

    pdf = emb.select("vec_id", "embedding").toPandas().sort_values("vec_id")
    a = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64) * 1000.0
    q = (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)
    ids = pdf["vec_id"].to_numpy().astype(np.int64)
    qvec = q[0]  # the lowest-id vector is the query

    got = similarity.pq_adc_topk(
        codes_df, [int(v) for v in qvec], cbs, k=10
    ).collect()

    cb = np.array(cbs, dtype=np.int64)  # m x K x d_sub
    m, _k, d_sub = cb.shape
    codes = np.empty((q.shape[0], m), dtype=np.int64)
    for s in range(m):
        sub = q[:, s * d_sub : (s + 1) * d_sub]
        # literal squared difference — NOT the dot-product identity
        dist = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = dist.argmin(axis=1)  # first min = lowest code
    spark_codes = {r["vec_id"]: list(r["codes"]) for r in codes_df.collect()}
    for i, vid in enumerate(ids):
        assert spark_codes[int(vid)] == [int(c) for c in codes[i]], vid

    # ADC by reconstruction: decode every row to its codeword concat
    recon = np.concatenate([cb[s][codes[:, s]] for s in range(m)], axis=1)
    dist = ((recon - qvec[None, :]) ** 2).sum(axis=1)
    naive = sorted(zip(dist.tolist(), ids.tolist()))[:10]
    assert [(int(r["adc_dist"]), int(r["vec_id"])) for r in got] == naive

    # approximation sanity: ADC top-10 overlaps the exact quantized top-10
    exact_d = ((q - qvec[None, :]) ** 2).sum(axis=1)
    exact = {i for _, i in sorted(zip(exact_d.tolist(), ids.tolist()))[:10]}
    assert len({i for _, i in naive} & exact) >= 3
