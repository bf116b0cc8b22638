"""Mini sqllogictest runner over the dialect engine.

Robustness corpus re-expressing the scenarios of the reference's
sqllogictest suite (``core/src/test/resources/sqllogictest/test/sql/``:
aggregate/group/test_group_by.test, test_group_by_alias.test,
sample_by_fill.test) in the standard sqllogictest format — every statement
runs through ``QdbEngine.sql()``, the layer VERDICT r3 flagged as the most
likely to break on adversarial input.

Directives supported: ``statement ok``, ``statement error``,
``query <types>`` with ``----`` expected blocks (tab-separated, ``NULL``
for nulls, numeric columns compared with tolerance), ``require`` (skips
block if capability unsupported).  ``SET``/``PRAGMA`` statements are
accepted as no-ops, like the reference runner does for DuckDB-isms.
"""

from __future__ import annotations

import math
import re
from pathlib import Path

import pytest

from questdb_spark.sqlfront.engine import QdbEngine

CORPUS = sorted((Path(__file__).parent / "sqllogic").glob("*.test"))


def _parse_slt(text: str):
    """Yield (kind, sql, expected_rows_or_None, lineno)."""
    lines = text.splitlines()
    i, n = 0, len(lines)
    while i < n:
        line = lines[i].strip()
        if not line or line.startswith("#"):
            i += 1
            continue
        lineno = i + 1
        if line.startswith("require"):
            i += 1
            continue  # all our corpus requirements are built in
        if line.startswith("statement"):
            kind = "ok" if line.split()[1] == "ok" else "error"
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            if i < n and lines[i].strip() == "----":
                i += 1  # statement error may carry an (ignored) message block
                while i < n and lines[i].strip():
                    i += 1
            yield kind, "\n".join(sql_lines), None, lineno
        elif line.startswith("query"):
            i += 1
            sql_lines = []
            while i < n and lines[i].strip() != "----":
                sql_lines.append(lines[i])
                i += 1
            i += 1  # skip ----
            expected = []
            while i < n and lines[i].strip():
                expected.append(lines[i].rstrip("\n"))
                i += 1
            yield "query", "\n".join(sql_lines), expected, lineno
        else:
            raise ValueError(f"bad sqllogictest line {lineno}: {line!r}")


def _fmt(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return str(v)


def _tokens_equal(got: str, exp: str) -> bool:
    if got == exp:
        return True
    try:
        g, e = float(got), float(exp)
    except ValueError:
        return False
    if math.isnan(g) and math.isnan(e):
        return True
    return abs(g - e) <= 1e-6 * max(1.0, abs(e))


def _rows_equal(got: list[list[str]], exp: list[str]) -> bool:
    if len(got) != len(exp):
        return False
    for grow, erow in zip(got, exp):
        if "\t" in erow:
            etoks = erow.split("\t")
        elif len(grow) == 1:
            etoks = [erow]  # single column may contain spaces (timestamps)
        else:
            etoks = erow.split()
        if len(grow) != len(etoks):
            return False
        if not all(_tokens_equal(g, e) for g, e in zip(grow, etoks)):
            return False
    return True


@pytest.mark.parametrize("path", CORPUS, ids=lambda p: p.stem)
def test_sqllogic_corpus(spark, path, tmp_path):
    # volume 'vol1' registered so IN VOLUME corpus cases resolve
    vol = tmp_path / "vol1"
    vol.mkdir()
    eng = QdbEngine(spark, volumes={"vol1": str(vol)})
    for kind, sql, expected, lineno in _parse_slt(path.read_text()):
        head = sql.strip().split()[0].upper() if sql.strip() else ""
        if head in ("SET", "PRAGMA"):
            continue  # runner-level knobs, accepted as no-ops
        if kind == "error":
            with pytest.raises(Exception):
                eng.sql(sql).collect()
            continue
        try:
            rows = eng.sql(sql).collect()
        except Exception as exc:  # pragma: no cover - diagnostic path
            pytest.fail(f"{path.name}:{lineno}: {sql!r} raised {exc}")
        if kind == "query":
            got = [[_fmt(v) for v in row] for row in rows]
            assert _rows_equal(got, expected), (
                f"{path.name}:{lineno}: result mismatch for {sql!r}\n"
                f"  got:      {got}\n  expected: {[e.split() for e in expected]}"
            )
