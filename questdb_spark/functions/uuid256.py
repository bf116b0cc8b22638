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


def long256_add(a: Column, b: Column) -> Column:
    """Exact 256-bit addition mod 2^256 on canonical 64-hex forms
    (``AddLong256FunctionFactory.java`` — the one arithmetic op the
    reference defines on LONG256). Eight 32-bit limbs with a carry
    ripple; every limb total < 2^33 stays exact in long arithmetic."""
    limbs = []
    carry = F.lit(0).cast("long")
    for i in range(7, -1, -1):  # limb 7 = least-significant 8 hex chars
        la = F.conv(F.substring(a, 8 * i + 1, 8), 16, 10).cast("long")
        lb = F.conv(F.substring(b, 8 * i + 1, 8), 16, 10).cast("long")
        tot = la + lb + carry
        limb = tot % F.lit(4294967296)
        carry = F.floor(tot / F.lit(4294967296)).cast("long")
        limbs.insert(0, F.lower(F.lpad(F.hex(limb), 8, "0")))
    return F.concat(*limbs)  # overflow carry out of limb 0 drops (mod 2^256)


def long256_to_long(col: Column) -> Column:
    """LONG256 → BIGINT: the low 64 bits reinterpreted as signed
    (``CastLong256ToLongFunctionFactory`` semantics)."""
    v = F.conv(F.substring(col, 49, 16), 16, 10).cast("decimal(20,0)")
    two63 = F.lit("9223372036854775808").cast("decimal(20,0)")
    two64 = F.lit("18446744073709551616").cast("decimal(21,0)")
    return F.when(v >= two63, v - two64).otherwise(v).cast("long")


def long256_from_long(col: Column) -> Column:
    """BIGINT → LONG256 canonical form (zero-extended; negative values
    wrap as two's complement like the reference's raw-bits cast)."""
    return F.lpad(F.lower(F.hex(col)), 64, "0")


def long256_to_boolean(col: Column) -> Column:
    """LONG256 → BOOLEAN: true iff non-zero
    (``CastLong256ToBooleanFunctionFactory``)."""
    return F.regexp_replace(col, "0", "") != ""


def bin_from_hex(col: Column) -> Column:
    """Hex string → BinaryType (QuestDB BINARY import)."""
    return F.unhex(col)


def bin_to_hex(col: Column) -> Column:
    """BinaryType → lowercase hex (QuestDB BINARY export)."""
    return F.lower(F.hex(col))
