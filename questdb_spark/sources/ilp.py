"""InfluxDB Line Protocol (ILP) parsing — QuestDB's primary ingest format.

Reference: ``cutlass/line/tcp/LineTcpParser.java:45`` (measurement,
tag set → SYMBOL columns, field set, optional nanosecond timestamp),
auto-creating tables/columns with inferred types
(``cutlass/line/tcp/DefaultColumnTypes.java``).

Spark-first: parsing is pure column expressions (regexp + str_to_map) so
an ILP firehose can be parsed inside a streaming micro-batch at full
parallelism — no Python in the row path. Covers the standard unescaped
form ``measurement[,tag=v...] field=v[,field=v...] [ts_nanos]``; fields
typed per ILP rules (``1.5`` float, ``42i`` int, ``"s"`` string,
``t``/``f`` bool).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LINE_RE = r"^([^,\s]+)(?:,([^ ]*))? ([^ ]*)(?: (\d+))?$"
_LINE_RE_SQL = _LINE_RE.replace("\\", "\\\\")  # for embedding in F.expr strings


def parse_ilp(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse ILP text lines into (measurement, tags map, raw fields map,
    typed field maps, event ts). Malformed lines get measurement NULL
    (callers can route them to a dead-letter sink)."""
    line = F.col(line_col)
    measurement = F.regexp_extract(line, _LINE_RE, 1)
    tags_raw = F.regexp_extract(line, _LINE_RE, 2)
    fields_raw = F.regexp_extract(line, _LINE_RE, 3)
    ts_raw = F.regexp_extract(line, _LINE_RE, 4)

    tags = F.when(tags_raw != "", F.str_to_map(tags_raw, F.lit(","), F.lit("=")))
    fields = F.str_to_map(fields_raw, F.lit(","), F.lit("="))

    return df.select(
        F.when(measurement != "", measurement).alias("measurement"),
        tags.alias("tags"),
        fields.alias("fields_raw"),
        _typed_fields(fields, "double").alias("fields_double"),
        _typed_fields(fields, "long").alias("fields_long"),
        _typed_fields(fields, "string").alias("fields_string"),
        _typed_fields(fields, "boolean").alias("fields_bool"),
        F.timestamp_micros(
            F.expr(
                f"try_cast(regexp_extract({line_col}, '{_LINE_RE_SQL}', 4) AS BIGINT) div 1000"
            )
        ).alias("ts"),
    )


def _typed_fields(fields: Column, kind: str) -> Column:
    """Split the raw field map by ILP value syntax into typed maps."""
    entries = F.map_entries(fields)
    if kind == "long":
        sel = F.filter(entries, lambda e: e["value"].rlike("^-?[0-9]+i$"))
        conv = F.transform(
            sel,
            lambda e: F.struct(
                e["key"].alias("key"),
                F.regexp_replace(e["value"], "i$", "").cast("long").alias("value"),
            ),
        )
    elif kind == "double":
        sel = F.filter(
            entries, lambda e: e["value"].rlike(r"^-?[0-9]*\.?[0-9]+(e-?[0-9]+)?$")
        )
        conv = F.transform(
            sel,
            lambda e: F.struct(e["key"].alias("key"), e["value"].cast("double").alias("value")),
        )
    elif kind == "boolean":
        sel = F.filter(entries, lambda e: e["value"].isin("t", "T", "f", "F", "true", "false"))
        conv = F.transform(
            sel,
            lambda e: F.struct(
                e["key"].alias("key"), e["value"].isin("t", "T", "true").alias("value")
            ),
        )
    else:  # string: "quoted"
        sel = F.filter(entries, lambda e: e["value"].rlike('^".*"$'))
        conv = F.transform(
            sel,
            lambda e: F.struct(
                e["key"].alias("key"),
                F.regexp_replace(e["value"], '^"|"$', "").alias("value"),
            ),
        )
    return F.map_from_entries(conv)


def infer_layout(rows: DataFrame) -> dict[str, list[str]]:
    """Column layout of a measurement's parsed rows (the ILP auto-create
    pass, ``LineTcpParser`` + ``DefaultColumnTypes``): distinct tag keys
    and per-type field keys.  One aggregate over the (static) frame."""
    sample = rows.select(
        F.map_keys(F.col("tags")).alias("tk"),
        F.map_keys(F.col("fields_double")).alias("fd"),
        F.map_keys(F.col("fields_long")).alias("fl"),
        F.map_keys(F.col("fields_string")).alias("fs"),
        F.map_keys(F.col("fields_bool")).alias("fb"),
    ).agg(
        F.array_distinct(F.flatten(F.collect_list("tk"))).alias("tk"),
        F.array_distinct(F.flatten(F.collect_list("fd"))).alias("fd"),
        F.array_distinct(F.flatten(F.collect_list("fl"))).alias("fl"),
        F.array_distinct(F.flatten(F.collect_list("fs"))).alias("fs"),
        F.array_distinct(F.flatten(F.collect_list("fb"))).alias("fb"),
    ).first()
    return {
        "tags": sorted(sample["tk"] or []),
        "double": sorted(sample["fd"] or []),
        "long": sorted(sample["fl"] or []),
        "string": sorted(sample["fs"] or []),
        "bool": sorted(sample["fb"] or []),
    }


def project_layout(rows: DataFrame, layout: dict[str, list[str]]) -> DataFrame:
    """Flatten parsed ILP rows to the given column layout (works on
    static AND streaming frames — pure column expressions)."""
    cols: list[Column] = []
    for t in layout["tags"]:
        cols.append(F.col("tags").getItem(t).alias(t))
    for kind, key in (("fields_double", "double"), ("fields_long", "long"),
                      ("fields_string", "string"), ("fields_bool", "bool")):
        for c in layout[key]:
            cols.append(F.col(kind).getItem(c).alias(c))
    return rows.select(*cols, F.col("ts"))


def ilp_to_table(parsed: DataFrame, measurement: str, ts_default_col: str | None = None) -> DataFrame:
    """Project one measurement's rows to a flat table: tag columns + typed
    field columns (schema inferred from the first micro-batch — the
    ILP auto-create behavior)."""
    rows = parsed.filter(F.col("measurement") == measurement)
    return project_layout(rows, infer_layout(rows))
