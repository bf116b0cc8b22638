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
