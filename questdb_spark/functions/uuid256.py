"""UUID / LONG256 / BINARY function surface.

Reference: QuestDB's UUID type (``ColumnType.java`` UUID,
``griffin/engine/functions/rnd/RndUuidFunctionFactory.java``), LONG256
(``ColumnType.java`` LONG256, ``Long256Impl.java`` — a 256-bit value with
hex-literal syntax ``0x...`` supporting storage, equality and ordering),
and BINARY (``ColumnType.java`` BINARY with hex import/export).

Spark mapping: UUIDs and LONG256 values are fixed-width lowercase hex
strings — string equality/ordering on the normalized form IS numeric
equality/ordering (same width, same base), so Catalyst's native string
comparisons, joins and sorts apply with zero custom types. Binary uses
Spark's BinaryType with hex/unhex bridges. All derivations are md5-based
so they're deterministic and engine-portable (no JVM RNG).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX = "0123456789abcdef"


def uuid_v4_from(col: Column) -> Column:
    """Deterministic RFC-4122-shaped v4 UUID derived from md5(col):
    xxxxxxxx-xxxx-4xxx-Nxxx-xxxxxxxxxxxx with version nibble '4' and
    variant nibble in {8,9,a,b} (chosen by source nibble 17 mod 4).
    QuestDB's rnd_uuid4() draws randomly; a data-derived UUID is its
    reproducible analogue (same shape, deterministic for oracles)."""
    m = F.md5(col.cast("string"))
    nib17 = F.substring(m, 17, 1)
    variant = F.element_at(
        F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")),
        (F.instr(F.lit(_HEX), nib17) - 1) % 4 + 1,
    )
    return F.concat_ws(
        "-",
        F.substring(m, 1, 8),
        F.substring(m, 9, 4),
        F.concat(F.lit("4"), F.substring(m, 14, 3)),
        F.concat(variant, F.substring(m, 18, 3)),
        F.substring(m, 21, 12),
    )


def long256_from(col: Column) -> Column:
    """256-bit value derived from col: 64 hex chars = md5(col) || md5(col
    || ':1') — the reproducible analogue of rnd_long256()."""
    s = col.cast("string")
    return F.concat(F.md5(s), F.md5(F.concat(s, F.lit(":1"))))


def long256_normalize(col: Column) -> Column:
    """Parse a LONG256 literal ('0x1A2b...', any length ≤ 64 digits) to the
    canonical comparable form: lowercase, no prefix, left-padded to 64.
    String ordering on this form == numeric ordering (fixed width)."""
    stripped = F.lower(F.regexp_replace(col, "^0[xX]", ""))
    return F.lpad(stripped, 64, "0")


def long256_to_literal(col: Column) -> Column:
    """Canonical form → QuestDB-style literal: '0x' + digits without
    leading zeros (zero value → '0x0')."""
    trimmed = F.regexp_replace(col, "^0+", "")
    return F.concat(
        F.lit("0x"), F.when(trimmed == "", F.lit("0")).otherwise(trimmed)
    )


def bin_from_hex(col: Column) -> Column:
    """Hex string → BinaryType (QuestDB BINARY import)."""
    return F.unhex(col)


def bin_to_hex(col: Column) -> Column:
    """BinaryType → lowercase hex (QuestDB BINARY export)."""
    return F.lower(F.hex(col))
