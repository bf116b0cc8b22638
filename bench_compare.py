#!/usr/bin/env python
"""Compare two BENCH_DETAIL_*.json artifacts, raw and CPU-probe-normalized.

Round-11 finding: the host's single-thread speed drifts 2-3x between
runs (hypervisor contention), so raw cross-round ratios conflate code
changes with environment.  Each artifact since r11 stamps a `cpu_probe`
(fixed 2M-iteration single-thread wall-ms); dividing the per-query
ratio by the probe ratio yields an environment-normalized estimate —
approximate (Spark work is multi-threaded and partly I/O), but it
separates "the code got slower" from "the box got slower" well enough
to rank movers.

Usage: python bench_compare.py OLD.json NEW.json [top_n]
Prints one JSON line: totals, geomean, probe ratio, normalized geomean,
and the top movers in both directions.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    oq, nq = old["queries"], new["queries"]
    common = [
        n for n in nq
        if n in oq and "median" in nq.get(n, {}) and "median" in oq.get(n, {})
    ]
    t_old = sum(oq[n]["median"] for n in common)
    t_new = sum(nq[n]["median"] for n in common)
    geo = math.exp(
        sum(math.log(nq[n]["median"] / oq[n]["median"]) for n in common)
        / max(len(common), 1)
    )
    probe_old = (old.get("cpu_probe") or {}).get("cpu_probe_ms")
    probe_new = (new.get("cpu_probe") or {}).get("cpu_probe_ms")
    probe_ratio = (probe_new / probe_old) if probe_old and probe_new else None
    movers = sorted(common, key=lambda n: nq[n]["median"] - oq[n]["median"])
    fmt = lambda n: {
        "q": n,
        "old": oq[n]["median"],
        "new": nq[n]["median"],
        "ratio": round(nq[n]["median"] / oq[n]["median"], 2),
    }
    print(json.dumps({
        "n_common": len(common),
        "total_old_s": round(t_old, 1),
        "total_new_s": round(t_new, 1),
        "total_ratio": round(t_new / t_old, 3),
        "geomean_ratio": round(geo, 3),
        "cpu_probe_ratio": round(probe_ratio, 3) if probe_ratio else None,
        "geomean_probe_normalized": (
            round(geo / probe_ratio, 3) if probe_ratio else None
        ),
        "improved": [fmt(n) for n in movers[:top_n]],
        "regressed": [fmt(n) for n in movers[-top_n:][::-1]],
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
