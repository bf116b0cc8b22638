"""QuestDB-dialect SQL engine: lowers parsed queries onto the operator
library, everything else delegated to Spark SQL / Catalyst.

Usage:

    eng = QdbEngine(spark)
    eng.register("events", events_df, designated_ts="ts")
    eng.sql("SELECT ts, event_type, avg(value) FROM events SAMPLE BY 1h")

Lifecyle mirror of the reference (SURVEY §3): parse (our clause parser ≈
``SqlParser``), rewrite (interval strings, negative limit ≈
``SqlOptimiser``), lower to DataFrame operators (≈ ``SqlCodeGenerator``
emitting RecordCursorFactories) — then Catalyst optimizes and executes.
"""

from __future__ import annotations

import os
import re
from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join, lt_join, splice_join
from ..operators.intervals import parse_interval_ranges
from ..operators.latest import latest_on
from ..operators.sample_by import sample_by
from ..operators.window_join import markout_agg, window_join
from .parser import (
    QdbQuery,
    SelectItem,
    depth0_spans,
    expand_declare,
    mask_literals,
    parse,
    split_top_level,
    strip_comments,
)

_AGG_FNS = (
    "sum|avg|count|min|max|first|last|stddev|stddev_samp|stddev_pop|variance|"
    "var_samp|var_pop|corr|covar_pop|covar_samp|count_distinct|approx_count_distinct|"
    "collect_list|collect_set|max_by|min_by|percentile|percentile_approx|median|"
    "mode|any_value|bool_and|bool_or|every|some|skewness|kurtosis|"
    "regr_slope|regr_intercept|regr_r2|regr_avgx|regr_avgy|regr_count|"
    "regr_sxx|regr_syy|regr_sxy|bit_and|bit_or|bit_xor|listagg|string_agg|"
    "sum_distinct|count_if|histogram_numeric|approx_percentile"
)
_AGG_RE = re.compile(rf"\b({_AGG_FNS})\s*\(", re.IGNORECASE)

_IN_INTERVAL_RE = re.compile(
    r"(\w+(?:\.\w+)?)\s+(NOT\s+)?IN\s+('[^']+')", re.IGNORECASE
)
_IN_INTERVAL_LIST_RE = re.compile(
    r"(\w+(?:\.\w+)?)\s+(NOT\s+)?IN\s*(\(\s*'[^']*'(?:\s*,\s*'[^']*')*\s*\))",
    re.IGNORECASE,
)
_EQ_INTERVAL_RE = re.compile(
    r"(\w+(?:\.\w+)?)\s*(!=|<>|=)\s*('[^']+')"
)
_NEQ_NULL_RE = re.compile(r"(?:!=|<>)\s*null\b", re.IGNORECASE)
_EQ_NULL_RE = re.compile(r"(?<![<>!=])=\s*null\b", re.IGNORECASE)

# Words inside a PIVOT aggregate's text that can never be column operands:
# expression keywords and cast-target type names (``SUM(Pop)::varchar``,
# ``CAST(x AS DOUBLE)``, ``CASE WHEN .. END`` — pivot_expressions.test).
_PIVOT_NON_COLUMN_WORDS = frozenset(
    """case when then else end and or not null is in between like as
    distinct true false cast try_cast interval filter where over
    int integer bigint smallint tinyint float double real decimal numeric
    string varchar char boolean bool date timestamp binary long short byte
    """.split()
)


# Cross-instance statement-plan cache for PRISTINE engines (see
# QdbEngine._pristine_sig): sig -> {statement text: lowered DataFrame},
# plus a strong ref to every registered frame in the sig so id()s in a
# live signature can never be reused by the allocator.  Bounded FIFO.
_GLOBAL_PLAN_CACHE: dict = {}
_GLOBAL_PLAN_REFS: dict = {}
_GLOBAL_PLAN_ORDER: list = []
_GLOBAL_PLAN_MAX = 512
_GLOBAL_PLAN_LOCK = __import__("threading").Lock()


def _global_plan_get(sig, query):
    with _GLOBAL_PLAN_LOCK:
        return _GLOBAL_PLAN_CACHE.get((sig, query))


def _global_plan_put(sig, query, df, tables) -> None:
    with _GLOBAL_PLAN_LOCK:
        k = (sig, query)
        if k in _GLOBAL_PLAN_CACHE:
            return
        _GLOBAL_PLAN_CACHE[k] = df
        _GLOBAL_PLAN_REFS.setdefault(sig, tuple(tables.values()))
        _GLOBAL_PLAN_ORDER.append(k)
        while len(_GLOBAL_PLAN_ORDER) > _GLOBAL_PLAN_MAX:
            old = _GLOBAL_PLAN_ORDER.pop(0)
            _GLOBAL_PLAN_CACHE.pop(old, None)
            if not any(key[0] == old[0] for key in _GLOBAL_PLAN_CACHE):
                _GLOBAL_PLAN_REFS.pop(old[0], None)


def _top_level_over(masked_expr: str) -> bool:
    """True when an ``OVER`` token sits at paren depth 0 of the (literal-
    masked) expression — i.e. the outermost construct is a window function
    (``sum(41) over()``), as opposed to one nested inside an aggregate
    (``sum(sum(41) over())``, which the reference accepts)."""
    depth = 0
    for m in re.finditer(r"\(|\)|\bover\b", masked_expr, re.IGNORECASE):
        t = m.group(0)
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif depth == 0:
            return True
    return False


def _has_agg(expr: str) -> bool:
    """True when the expression contains an aggregate CALL — matched on the
    literal-masked text, so ``'the sum(x) label'`` never counts
    (VERDICT r3 finding 1: token-boundary hardening)."""
    return bool(_AGG_RE.search(mask_literals(expr)))


def _is_agg_item(expr: str) -> bool:
    """Aggregate select item for grouping purposes: contains an aggregate
    call and is NOT a window expression (``sum(x) OVER (...)`` projects
    per-row, it doesn't group)."""
    masked = mask_literals(expr)
    return bool(_AGG_RE.search(masked)) and not re.search(
        r"\bover\s*\(", masked, re.IGNORECASE
    )


class QdbEngine:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str | None = None,
        volumes: dict[str, str] | None = None,
    ):
        """``warehouse``: directory where DDL-created tables live as
        partitioned parquet (``TimeTable``); defaults to a fresh temp dir
        (the reference's ``db/`` root, ``CairoConfiguration.getDbRoot``).
        ``volumes``: secondary storage volumes, alias → directory — the
        targets of ``CREATE TABLE ... IN VOLUME '<alias>'``
        (``CairoConfiguration.getVolumeDefinitions``, the cairo.volumes
        server setting)."""
        import tempfile

        self.spark = spark
        self.tables: dict[str, DataFrame] = {}
        self.designated_ts: dict[str, str] = {}
        self.tiebreak: dict[str, str] = {}
        self.warehouse = warehouse or tempfile.mkdtemp(prefix="qdb_warehouse_")
        # DDL-managed tables (CREATE TABLE …): name → TimeTable, plus the
        # declared schema (Spark DDL string) for empty tables and a per-table
        # WAL sequence for dedup resolution.
        self.ddl_tables: dict = {}
        self.ddl_schemas: dict = {}
        # declared QuestDB type text per column (SHOW CREATE TABLE prints
        # the dialect's types, not the storage mapping)
        self.ddl_qdb_types: dict[str, dict[str, str]] = {}
        self.ddl_seq: dict[str, int] = {}
        # IN VOLUME storage: registered volumes (alias → dir) and the
        # alias each table was created in (SHOW CREATE TABLE round-trip)
        self.volumes: dict[str, str] = dict(volumes or {})
        self.ddl_volumes: dict[str, str] = {}
        # materialized / live views (sqlfront/matview_ddl.py): name → def
        self.matviews: dict = {}
        # plain (non-materialized) views: name → definition SQL, re-lowered
        # on every read (CompileViewModel.java)
        self.views: dict[str, str] = {}
        # session query registry (griffin/QueryRegistry.java): one entry
        # per top-level sql() call, drives query_activity() and
        # CANCEL QUERY.  Spark jobs of query N run under job group
        # "qdb-query-N", so cancel maps to cancelJobGroup — best-effort,
        # like the reference's cooperative circuit breaker.
        self.query_log: list[dict] = []
        self._query_seq = 0
        self._sub_seq = 0  # expression-position dialect subquery views
        self._sub_views: list[str] = []  # statement-scoped, dropped on exit
        self._sql_depth = 0
        # COPY import/export log (the reference's sys.text_import_log /
        # copy_export_log backing COPY '<id>' CANCEL): one entry per COPY
        # statement, keyed by the hex id the reference hands back.
        self.copy_log: list[dict] = []
        self._copy_seq = 0
        # DDL tables / plain views whose temp-view registration is stale
        # (mutated since last re-register) — flushed lazily on the next
        # statement that references them (r9 lifecycle trim: the eager
        # re-register cost a mergeSchema scan + analysis per statement)
        self._dirty_views: set[str] = set()
        # table_writer_metrics() counters (TableWriterMetricsRecordCursor
        # Factory KEYS).  Counted where the engine already knows the
        # numbers without extra jobs: commits/rollbacks are statement
        # events; committed_rows counts statically-sized commits (VALUES
        # tuple lists, replayed WAL txns) — INSERT SELECT contributes a
        # commit but no row count (counting would re-run the SELECT, see
        # _insert's status-row note); physically_written_rows adds the
        # same rows (merge-path partition rewrites are not re-counted —
        # reported value is a lower bound, documented)
        self.writer_metrics: dict[str, int] = {
            "total_commits": 0,
            "o3commits": 0,
            "rollbacks": 0,
            "committed_rows": 0,
            "physically_written_rows": 0,
        }
        # statement-plan cache (r14 opt, guide §4 driver-side cost): the
        # Python parse + lowering of a SELECT statement costs 0.1-1.5 s of
        # py4j Column construction; the result is a pure logical plan,
        # deterministic given (statement text, catalog state).  Keyed on
        # (post-binding text, catalog epoch); the epoch bumps on EVERY
        # register() and EVERY DDL/DML statement, so any plan built before
        # a mutation can never be served after it.  Statements whose
        # lowering reads ENGINE state rather than the catalog
        # (introspection table functions, wall-clock date macros, CANCEL)
        # are never cached — see _plan_cache_key.  This is the statement
        # cache every SQL engine ships (the reference compiles once per
        # text too); results are never cached — every action still
        # executes the plan from parquet.
        import os as _os
        import threading

        self._plan_cache: dict = {}
        self._plan_cache_order: list = []
        self._plan_cache_lock = threading.Lock()
        self._catalog_epoch = 0
        self._plan_cache_on = (
            _os.environ.get("SPARK_GRAFT_STMT_CACHE", "1") != "0"
        )
        # While the engine is PRISTINE (registered DataFrames only — no
        # DDL/DML has ever run), its whole catalog state is the
        # registration signature, so lowered plans are shareable across
        # engine INSTANCES with the identical signature (each query call
        # builds a fresh engine; load_table memoizes table frames, making
        # the signature stable).  The signature keys on the registered
        # DataFrame OBJECTS (id + a strong ref held by the cache so ids
        # can never be reused) plus designated-ts/tiebreak; the first
        # DDL/DML flips the engine to its private epoch-keyed cache.
        self._pristine = True

    _PLAN_CACHE_MAX = 256
    # lowerings that read mutable ENGINE state (not the catalog) or the
    # wall clock: never cached.  Broad on purpose — each is introspection
    # or a date macro, sub-ms to lower, never a hot path.
    _PLAN_NOCACHE_RE = re.compile(
        r"\b(query_activity|table_writer_metrics|memory_metrics|"
        r"reader_pool|writer_pool|export_files|import_files|"
        r"tables|all_tables|wal_tables|views|materialized_views|"
        r"live_views|table_columns|table_partitions|wal_transactions|"
        r"table_storage|functions|keywords|flush_query_cache|"
        r"today|yesterday|tomorrow|systimestamp|sysdate|now)\s*\(",
        re.IGNORECASE,
    )

    def _plan_cache_key(self, query: str) -> tuple | None:
        """Cache key for a pure-plan statement, or None when the statement
        must always re-lower (DDL/DML — which also bumps the epoch —
        CANCEL, state-reading lowerings)."""
        if not self._plan_cache_on:
            return None
        from . import ddl

        if ddl.statement_kind(query) is not None:
            with self._plan_cache_lock:
                self._catalog_epoch += 1
                self._pristine = False
            return None
        masked = mask_literals(query)
        if re.match(r"^\s*(cancel|declare)\b", masked, re.IGNORECASE):
            # CANCEL has side effects; DECLARE bodies expand to new text —
            # let the expanded statement hit the cache on re-entry instead
            return None
        if self._PLAN_NOCACHE_RE.search(masked):
            return None
        # a view read re-lowers its body by contract, and a TIMER/PERIOD
        # matview read REFRESHES when due — wall-clock-driven state the
        # epoch cannot see.  Any statement referencing a view or matview
        # name always re-lowers.
        names = set(self.matviews) | set(self.views)
        if names and re.search(
            r"\b(" + "|".join(re.escape(n) for n in names) + r")\b",
            masked,
            re.IGNORECASE,
        ):
            return None
        return (query, self._catalog_epoch)

    def _pristine_sig(self) -> tuple | None:
        """Cross-instance cache signature, or None once any DDL/DML ran.
        Pristine-state catalogs consist ONLY of the registration dict, so
        (spark, sorted (name, frame identity, ts, tiebreak)) captures the
        entire lowering input; the global cache holds a strong ref to each
        frame so an id() can never be reused by a dead object."""
        if not self._pristine or self.ddl_tables or self.views or self.matviews:
            return None
        return (
            id(self.spark),
            tuple(
                sorted(
                    (n, id(df), self.designated_ts.get(n), self.tiebreak.get(n))
                    for n, df in self.tables.items()
                )
            ),
        )

    def ddl_read(self, name: str, dedup: bool = True) -> DataFrame:
        """Read a DDL-created table at its LOGICAL schema (dedup applied,
        bookkeeping columns dropped). Empty tables read as 0 rows with the
        declared schema — a CREATEd-but-unwritten table is queryable, like
        the reference's empty native table."""
        if name not in self.ddl_tables:
            raise ValueError(f"no such table: {name}")
        t = self.ddl_tables[name]
        from .ddl import _has_files

        if not _has_files(t):
            schema = self.ddl_schemas.get(name)
            if schema is None:
                raise ValueError(f"table {name} is empty with unknown schema")
            # replay the ops journal so empty-table ALTERs are visible
            return t._logical(self.spark.createDataFrame([], schema))
        df = t.read(dedup=dedup)
        from ..table import PARTITION_COL

        return df.drop(*[c for c in (PARTITION_COL, t.seq_col) if c in df.columns])

    def register(
        self,
        name: str,
        df: DataFrame,
        designated_ts: str | None = None,
        tiebreak: str | None = None,
    ) -> None:
        """``tiebreak``: column making LATEST ON deterministic when several
        rows share a timestamp within a key (QuestDB resolves by physical
        row order — ``LatestByAllIndexedRecordCursorFactory``; a batch
        engine needs an explicit total order)."""
        self.tables[name] = df
        if designated_ts:
            self.designated_ts[name] = designated_ts
        if tiebreak:
            self.tiebreak[name] = tiebreak
        df.createOrReplaceTempView(name)
        with self._plan_cache_lock:
            self._catalog_epoch += 1  # plans built before this bind are stale

    # ------------------------------------------------------------------
    def flush_views(self, *names: str) -> None:
        """Re-register every stale temp view now (or only ``names``).

        Dirty-marked views are normally flushed lazily when the next
        ``eng.sql`` statement references them; a DIRECT ``spark.sql()``
        read bypasses that hook and can see the stale pinned plan (or a
        deleted-file listing after UPDATE/REFRESH rewrote partitions).
        Call this before handing the session to plain-ANSI readers."""
        if names:
            self._flush_dirty_views(" ".join(names))
        elif self._dirty_views:
            self._flush_dirty_views(" ".join(self._dirty_views))

    # ------------------------------------------------------------------
    def sql(self, query: str, args: dict | list | tuple | None = None) -> DataFrame:
        """Execute a QuestDB-dialect query or DDL/DML statement.

        ``args``: bind variables (``griffin/engine/functions/bind/``) —
        a dict binds named ``:name`` markers, a list/tuple binds PG-style
        positional ``$1 $2 ...`` markers (``IndexedParameterLinkFunction``).
        Values are rendered to SQL literals outside string literals; the
        resulting plan is what server-side binding would constant-fold to,
        on the ANSI and dialect paths alike."""
        from . import ddl

        query = strip_comments(query)
        if args is not None:
            query, named = _positional_to_named(query, args)
            query = _bind_named_literals(query, named)
        if self._sql_depth == 0:
            # register top-level statements only — internal re-entry (view
            # bodies, set-op operands) is the same user query.  Plans are
            # lazy, so "active" means "jobs may still run under this
            # query's job group"; a query completes when the session moves
            # on to the next statement.  Introspection statements (CANCEL,
            # query_activity reads) must NOT advance the session — their
            # whole point is to observe/kill the in-flight query.
            introspective = bool(
                re.match(r"^\s*cancel\b", query, re.IGNORECASE)
            ) or bool(re.search(r"\bquery_activity\s*\(", query, re.IGNORECASE))
            if not introspective:
                for e in self.query_log:
                    if e["state"] == "active":
                        e["state"] = "completed"
            self._query_seq += 1
            self.query_log.append(
                {"query_id": self._query_seq, "query": query.strip(), "state": "active"}
            )
            self.spark.sparkContext.setJobGroup(
                f"qdb-query-{self._query_seq}", query.strip()[:200], True
            )
        self._sql_depth += 1
        try:
            key = self._plan_cache_key(query)
            sig = self._pristine_sig() if key is not None else None
            if key is not None:
                hit = (
                    _global_plan_get(sig, query)
                    if sig is not None
                    else self._plan_cache.get(key)
                )
                if hit is not None:
                    return hit
            out = self._sql_inner(query)
            # re-check pristineness: the lowering itself may have executed
            # nested statements (view bodies) — only cache globally if the
            # engine is STILL pristine under the same signature
            if key is not None:
                if sig is not None and self._pristine_sig() == sig:
                    _global_plan_put(sig, query, out, self.tables)
                elif sig is None:
                    with self._plan_cache_lock:
                        if key not in self._plan_cache:
                            self._plan_cache[key] = out
                            self._plan_cache_order.append(key)
                            while (
                                len(self._plan_cache_order)
                                > self._PLAN_CACHE_MAX
                            ):
                                old = self._plan_cache_order.pop(0)
                                self._plan_cache.pop(old, None)
            return out
        finally:
            self._sql_depth -= 1
            if self._sql_depth == 0 and self._sub_views:
                # expression-position dialect subquery views are
                # statement-scoped: the lowered plan is analyzed by the
                # time _sql_inner returns, so the catalog entries can go
                # (r8 advice: leaving them leaked one temp view per
                # subquery occurrence in long-lived sessions)
                for v in self._sub_views:
                    try:
                        self.spark.catalog.dropTempView(v)
                    except Exception:
                        pass
                self._sub_views.clear()

    def _flush_dirty_views(self, text: str) -> None:
        """Re-register stale temp views REFERENCED by this statement
        (mutating DDL marks instead of re-registering — see
        ddl._refresh_view). Base tables flush before plain views so a
        view recompile sees current data."""
        if not self._dirty_views:
            return
        hit = [
            n
            for n in list(self._dirty_views)
            if re.search(rf"\b{re.escape(n)}\b", text, re.IGNORECASE)
        ]
        # a failed recompile KEEPS the dirty mark (r10 advice: discarding
        # it pinned a stale temp view permanently with no signal) — the
        # next statement that references the name retries, and the warning
        # makes the stale window visible
        import warnings

        for n in hit:
            if n in self.ddl_tables:
                try:
                    self.ddl_read(n).createOrReplaceTempView(n)
                    self._dirty_views.discard(n)
                except Exception as e:
                    warnings.warn(
                        f"temp view refresh failed for table {n!r} "
                        f"(still marked stale, will retry): {e}"
                    )
        for n in hit:
            if n in self.views and n in self._dirty_views:
                # discard BEFORE the recompile (self.sql re-enters this
                # flush) and re-add on failure so the retry signal survives
                self._dirty_views.discard(n)
                try:
                    self.sql(self.views[n]).createOrReplaceTempView(n)
                except Exception as e:
                    self._dirty_views.add(n)
                    warnings.warn(
                        f"temp view refresh failed for view {n!r} "
                        f"(still marked stale, will retry): {e}"
                    )

    def _sql_inner(self, query: str) -> DataFrame:
        from . import ddl

        if ddl.statement_kind(query) is not None:
            # DDL/DML handlers read base storage directly or re-enter
            # eng.sql for their query bodies (where the flush below and
            # the _table hook cover resolution) — no statement-level flush
            return ddl.execute(self, query)
        self._flush_dirty_views(mask_literals(query))
        declared = expand_declare(query)
        # top-level WITH over dialect bodies: bind each CTE as a scoped
        # table, then lower the main query (SqlParser.java parseWith).
        # Pure-ANSI WITH (no dialect clause, SELECT main query) stays on
        # Spark's native CTE path.
        if re.match(r"\s*WITH\b", mask_literals(declared), re.IGNORECASE):
            handled = self._maybe_lower_with_ctes(declared)
            if handled is not None:
                return handled
        # QuestDB's optional-SELECT grammar: a statement (or subquery /
        # set-op operand) may start at the table expression
        rewritten = self._rewrite_day_functions(self._wrap_bare_query(declared))
        rewritten = self._rewrite_in_interval_fn(rewritten)
        rewritten = self._rewrite_intervals(rewritten)
        # QuestDB's bare `count()` ≡ `count(*)` (CountConstGroupByFunction)
        rewritten = _sub_outside_literals(
            rewritten, re.compile(r"\bcount\s*\(\s*\)", re.IGNORECASE), "count(*)"
        )
        # timestamp BETWEEN normalizes bound order
        # (BetweenTimestampFunctionFactory: Math.min(from,to) <= v <=
        # Math.max — '2024-01-16' AND '2024-01-14' is the same range);
        # applied to ISO-literal bounds, where order is decidable at
        # rewrite time (ISO prefixes compare lexicographically)
        rewritten = _normalize_between_literals(rewritten)
        # QuestDB null comparisons: `x = null` / `x != null` ARE null tests
        # (WhereClauseParser + EqDoubleFunctionFactory null branches; the
        # reference's own tests filter with `where lo != null`) — ANSI
        # three-valued logic would make both always-false
        rewritten = _sub_outside_literals(rewritten, _NEQ_NULL_RE, " IS NOT NULL")
        rewritten = _sub_outside_literals(rewritten, _EQ_NULL_RE, " IS NULL")
        # QuestDB VARCHAR is unsized UTF-8 (ColumnType.java:57); Spark's
        # parser demands VARCHAR(n) in cast position — lower to STRING
        # (``x::varchar``, ``CAST(x AS VARCHAR)``; pivot_expressions.test)
        rewritten = _sub_outside_literals(
            rewritten, re.compile(r"\bvarchar\b(?!\s*\()", re.IGNORECASE), "string"
        )
        # SYMBOL in cast position (CastStrToSymbol/SymbolFunctionFactory):
        # symbols are dictionary-encoded strings here
        rewritten = _sub_outside_literals(
            rewritten,
            re.compile(r"\b(AS\s+)symbol\b|::\s*symbol\b", re.IGNORECASE),
            None,
            lambda m: (m.group(1) + "string") if m.group(1) else "::string",
        )
        # QuestDB regex-match operators ~ / !~ / GLOB → RLIKE forms
        rewritten = _rewrite_match_operators(rewritten)
        # typed json_extract(x, p)::T and the JSON UNNEST source
        rewritten = _rewrite_geohash_casts(rewritten)
        rewritten = _rewrite_json_extract_typed(rewritten)
        rewritten = _rewrite_json_unnest(rewritten)
        # QuestDB ARRAY[...] literals (cairo/arr ArrayTypeDriver; the
        # reference's array constructor syntax) → Spark array(...)
        rewritten = _rewrite_array_literals(rewritten)
        # 1-based expr[i] dereference (reference array-access semantics)
        rewritten = _rewrite_subscripts(rewritten)
        # ema/vwema/ksum/nsum in OVER position (window recurrences)
        rewritten = _rewrite_window_ema(rewritten)
        # frame EXCLUDE clauses → the reference's frame-shrink lowering
        rewritten = _rewrite_frame_exclude(rewritten)
        # time-unit RANGE frame bounds in OVER(...) → Spark INTERVAL bounds
        rewritten = _rewrite_range_frame_units(rewritten)
        rewritten = _expand_fn_macros(rewritten)
        # implicit GROUP BY: plain columns next to aggregates become keys
        rewritten = self._implicit_group_by(rewritten)
        # long_sequence(n) table function (LongSequenceFunctionFactory):
        # Spark's native range() — distributed index generation, no driver
        # materialization. Only the integer-literal form; QuestDB itself
        # rejects non-integer arguments.
        # (the seeded 3-arg form long_sequence(n, seed1, seed2) fixes the
        # reference's rnd_* stream; rnd_* here is deterministic by row
        # index already, so the seeds parse and drop)
        rewritten = _sub_outside_literals(
            rewritten,
            re.compile(
                r"\blong_sequence\s*\(\s*(\d+)\s*(?:,\s*-?\d+\s*,\s*-?\d+\s*)?\)",
                re.IGNORECASE,
            ),
            None,
            lambda m: f"(SELECT id AS x FROM range(1, {int(m.group(1)) + 1}))",
        )
        rewritten = self._rewrite_catalog_fns(rewritten)
        rewritten = self._rewrite_pipeline_fns(rewritten)
        rewritten = self._rewrite_read_parquet(rewritten)
        # expression-position subqueries with dialect clauses (IN / EXISTS
        # / scalar positions) can't ride through F.expr or spark.sql
        rewritten = self._extract_dialect_subqueries(rewritten)
        # QuestDB statement form `(subquery) [where ...] [order by ...]`
        # (AsOfJoinTest: `(select ...) where lo != null`) — wrap as a
        # SELECT so both parser paths accept it; set operations keep the
        # parenthesized operand untouched
        st = rewritten.strip()
        if st.startswith("("):
            masked_st = mask_literals(st)
            end = self._pivot_close(masked_st, 0, st)
            tail = st[end + 1 :].strip()
            if tail and not re.match(
                r"^(union|intersect|except|pivot)\b", tail, re.IGNORECASE
            ):
                rewritten = f"SELECT * FROM {st[: end + 1]} {tail}"
        top_pivot = self._rewrite_top_pivot(rewritten)
        if top_pivot is not None:
            rewritten = top_pivot
        masked = mask_literals(rewritten)
        for nm, dd in self.matviews.items():
            if (dd.live or dd.refresh_type == "timer") and re.search(
                rf"\b{re.escape(nm)}\b", masked
            ):
                from .matview_ddl import read_with_live_refresh

                read_with_live_refresh(self, nm)
        if not self._needs_dialect(rewritten):
            # a designated-ts marker after a parquet source is dialect
            # decoration with no ANSI meaning — drop it for Spark's parser
            rewritten = re.sub(
                r"(parquet\.`[^`]+`)\s+timestamp\s*\(\s*\w+\s*\)",
                r"\1",
                rewritten,
                flags=re.IGNORECASE,
            )
            return self.spark.sql(rewritten)
        parts, ops = self._split_setops(rewritten)
        if ops:
            # set operations over dialect queries: lower each side, fold
            # left-to-right (each operand may itself be a dialect query —
            # before this split the clause parser silently swallowed the
            # UNION tail)
            def run(part: str) -> DataFrame:
                p = part.strip()
                if p.startswith("(") and p.endswith(")"):
                    p = p[1:-1]
                return self.sql(p)

            df = run(parts[0])
            for op, part in zip(ops, parts[1:]):
                rhs = run(part)
                if op == "UNION ALL":
                    df = df.union(rhs)
                elif op == "UNION":
                    df = df.union(rhs).distinct()
                elif op == "INTERSECT":
                    df = df.intersect(rhs)
                elif op == "INTERSECT ALL":
                    df = df.intersectAll(rhs)
                elif op == "EXCEPT":
                    df = df.subtract(rhs)
                else:  # EXCEPT ALL
                    df = df.exceptAll(rhs)
            return df
        q = parse(rewritten)
        return self._lower(q)

    def explain(self, query: str, mode: str = "formatted") -> str:
        """EXPLAIN (QuestDB ExplainPlanFactory): the Spark physical plan
        for a dialect query."""
        from ..plans.explain import plan_text

        return plan_text(self.sql(query), mode)

    # ------------------------------------------------------------------
    def _needs_dialect(self, s: str) -> bool:
        # keyword sniff over the literal-masked text: a string literal
        # containing 'SAMPLE BY' or 'LIMIT -5' must not trigger the
        # dialect path (VERDICT r3 finding 1)
        return bool(
            re.search(
                r"\b(SAMPLE\s+BY|LATEST\s+(?:ON|BY)|ASOF\s+JOIN|LT\s+JOIN|SPLICE\s+JOIN|"
                r"WINDOW\s+JOIN|HORIZON\s+JOIN|LIMIT\s+-\d+|"
                r"LIMIT\s+-?\d+\s*,\s*-?\d+)\b",
                mask_literals(s),
                re.IGNORECASE,
            )
        )

    def _split_setops(self, s: str) -> tuple[list[str], list[str]]:
        """Split a statement at paren-depth-0 set-operation keywords (each
        followed by a SELECT); returns (operand texts, operators).  The
        SELECT-follows check runs against the FULL string — a keyword at
        the edge of a depth-0 span (right before a parenthesized operand)
        must still match."""
        parts, ops, last = [], [], 0
        for lo, hi in depth0_spans(s):
            for m in self._BARE_SETOP_RE.finditer(s, lo, hi):
                if not re.match(
                    r"\s*\(?\s*SELECT\b", s[m.end() :], re.IGNORECASE
                ):
                    continue
                parts.append(s[last : m.start()].strip())
                ops.append(re.sub(r"\s+", " ", m.group(1).upper()))
                last = m.end()
        parts.append(s[last:].strip())
        return parts, ops

    # ------------------------------------------------------------------
    # QuestDB's optional-SELECT grammar (SqlParser.java parseDml: when the
    # statement does not open with SELECT/'(' the parser drops straight
    # into the table expression — `trades;`, `trades WHERE x > 0`,
    # `trades LATEST ON ts PARTITION BY sym` are all complete queries,
    # and the same shorthand is legal inside parenthesized subqueries and
    # set-operation operands).
    _BARE_SETOP_RE = re.compile(
        r"\b(UNION\s+ALL|UNION|INTERSECT\s+ALL|INTERSECT|EXCEPT\s+ALL|EXCEPT)\b",
        re.IGNORECASE,
    )
    # clause keywords that can legally follow the table name of a bare
    # query — inside parens a lone identifier stays ambiguous with a
    # column reference, so the shorthand is only recognized when one of
    # these (or end-of-text in FROM/JOIN position) follows
    _BARE_TAIL_RE = re.compile(
        r"(?:WHERE|ORDER|LATEST|SAMPLE|LIMIT|TIMESTAMP|UNION|INTERSECT|"
        r"EXCEPT|ASOF|LT|SPLICE|WINDOW|HORIZON|JOIN|LEFT|RIGHT|INNER|"
        r"CROSS|FULL|GROUP)\b",
        re.IGNORECASE,
    )
    # table functions valid in statement position (`long_sequence(10)` is
    # a complete QuestDB query); names resolved by later rewrite passes
    _BARE_TABLE_FN_RE = re.compile(
        r"(?:read_parquet|long_sequence|generate_series|tables|"
        r"table_columns|table_partitions|wal_transactions|query_activity|"
        r"functions|keywords|views|materialized_views|live_views|"
        r"memory_metrics|table_writer_metrics|reader_pool|writer_pool|"
        r"export_files|import_files|"
        r"dedup_pairs|minhash_candidates|top_terms|bm25_topk|"
        r"classify_nb)\s*\(",
        re.IGNORECASE,
    )

    def _known_table_names(self) -> set[str]:
        names = set(self.tables) | set(self.ddl_tables) | set(self.views)
        names |= set(self.matviews)
        return {n.lower() for n in names}

    def _bare_wrap_one(
        self, text: str, mtext: str, top: bool, lone_ok: bool = True
    ) -> str | None:
        """``SELECT * FROM``-wrap one statement / subquery / set-op operand
        if it starts at a table expression; None = not the shorthand.

        ``lone_ok``: whether a LONE identifier qualifies — only true in
        table positions (statement/top, FROM/JOIN/IN operand, set-op
        operand). The reference resolves identifiers to tables only in
        table positions (SqlParser.java parseDml); a lone identifier in a
        call argument list (``max(ts)`` with a table also named ``ts``)
        is a column reference, never a bare query."""
        m = re.match(r'\s*("?[A-Za-z_][\w$]*"?)\s*', mtext)
        if m is None:
            return None
        tok = m.group(1).strip('"')
        rest = mtext[m.end() :].lstrip()
        if rest[:1] == ".":
            return None
        if rest[:1] == "(":
            if top and self._BARE_TABLE_FN_RE.match(mtext.lstrip()):
                return "SELECT * FROM " + text.strip()
            return None
        if tok.lower() not in self._known_table_names():
            return None
        if re.match(r"PIVOT\b", rest, re.IGNORECASE):
            # bare `table PIVOT (...)` has its own statement-position
            # rewrite with the reference's full error surface
            return None
        if top or (not rest and lone_ok) or (rest and self._BARE_TAIL_RE.match(rest)):
            return "SELECT * FROM " + text.strip()
        return None

    def _wrap_bare_query(self, s: str) -> str:
        masked = mask_literals(s)
        inserts: list[int] = []  # positions where "SELECT * FROM " goes

        def scan(lo: int, hi: int, top: bool, lone_ok: bool = True) -> None:
            # split this region at its depth-0 set-op keywords, try the
            # shorthand on each operand, then recurse into paren groups
            cuts = []
            for slo, shi in depth0_spans(masked[lo:hi]):
                for m in self._BARE_SETOP_RE.finditer(masked, lo + slo, lo + shi):
                    cuts.append((m.start(), m.end()))
            starts = [lo] + [en for _, en in cuts]
            ends = [st for st, _ in cuts] + [hi]
            for idx, (plo, phi) in enumerate(zip(starts, ends)):
                # a set-op operand (idx > 0) is always a table position
                ok = lone_ok if idx == 0 else True
                if self._bare_wrap_one(s[plo:phi], masked[plo:phi], top, ok):
                    inserts.append(plo + (len(s[plo:phi]) - len(s[plo:phi].lstrip())))
            depth = 0
            oopen = -1
            for i in range(lo, hi):
                ch = masked[i]
                if ch == "(":
                    depth += 1
                    if depth == 1:
                        oopen = i
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and oopen >= 0:
                        # FROM/JOIN position allows the lone-identifier and
                        # alias forms, like the statement position does.
                        # A group directly preceded by any OTHER plain
                        # identifier is a call argument list — a lone
                        # identifier there is a column, not a bare query
                        # (`max(ts)` with a table named `ts`).
                        # (IN is NOT lone-allowed: `x IN (c)` is a value
                        # list even when c names a table)
                        prev = re.search(r"(\w+)\s*$", masked[lo:oopen])
                        pword = prev.group(1).upper() if prev else ""
                        ptop = pword in ("FROM", "JOIN")
                        plone = ptop or pword in (
                            "",
                            "UNION",
                            "ALL",
                            "INTERSECT",
                            "EXCEPT",
                        )
                        scan(oopen + 1, i, ptop, plone)
                        oopen = -1

        scan(0, len(s), True)
        if not inserts:
            return s
        out: list[str] = []
        last = 0
        for pos in sorted(inserts):
            out.append(s[last:pos])
            out.append("SELECT * FROM ")
            last = pos
        out.append(s[last:])
        return "".join(out)

    # ------------------------------------------------------------------
    # QuestDB's implicit GROUP BY (GroupByUtils.java assembleGroupByFunctions
    # via SqlOptimiser.rewriteSelectClause: when a select list mixes
    # aggregate and non-aggregate columns without a GROUP BY clause, every
    # non-aggregate column becomes a group key — `SELECT sym, avg(price)
    # FROM trades` is the dialect's idiomatic aggregation form).
    # WINDOW/HORIZON/MARKOUT JOIN aggregate per master row, not per group
    # — their mixed select lists are the operator's own semantics
    _GB_SKIP_RE = re.compile(
        r"\b(GROUP\s+BY|SAMPLE\s+BY|LATEST\s+ON|WINDOW\s+JOIN|"
        r"HORIZON\s+JOIN|MARKOUT)\b",
        re.IGNORECASE,
    )
    _GB_INSERT_BEFORE_RE = re.compile(
        r"\b(HAVING|ORDER\s+BY|LIMIT)\b", re.IGNORECASE
    )
    _GB_ALIAS_STOP = frozenset(
        "and or not in like ilike between is null true false case when then "
        "else end escape from where over rows range groups preceding "
        "following exclude".split()
    )

    @staticmethod
    def _gb_key_expr(item: str) -> str:
        """Group-key text for a non-aggregate select item: its alias when
        one is present (Spark resolves GROUP BY aliases), else the
        expression itself."""
        it = item.strip()
        m = re.search(r'\s+AS\s+("?[A-Za-z_]\w*"?)\s*$', it, re.IGNORECASE)
        if m:
            return m.group(1).strip('"')
        m = re.match(r'^(.*\S)\s+("?[A-Za-z_]\w*"?)$', it, re.DOTALL)
        if m:
            alias = m.group(2).strip('"')
            prev = re.search(r"([\w)\]'\"]+)\s*$", m.group(1))
            if (
                prev is not None
                and alias.lower() not in QdbEngine._GB_ALIAS_STOP
                and prev.group(1).lower() not in QdbEngine._GB_ALIAS_STOP
                and not re.search(r"[-+*/%,<>=|&^~!]$", m.group(1))
            ):
                return alias
        return it

    def _implicit_group_by(self, s: str) -> str:
        """Insert the inferred GROUP BY into every select block (at any
        nesting depth) that mixes top-level aggregate and plain columns
        without one.  Blocks with SAMPLE BY / LATEST ON keep their own
        key-inference lowering; window expressions (OVER), DISTINCT, and
        star projections disable inference for their block, exactly the
        cases where the reference requires explicit grouping too.  A
        mis-detected key can only surface as Spark's not-in-group-by
        analysis error, never a silently regrouped result — the inserted
        clause must still cover every plain select item."""
        masked = mask_literals(s)
        edits: list[tuple[int, str]] = []

        def d0(lo: int, hi: int, regex: re.Pattern) -> re.Match | None:
            for slo, shi in depth0_spans(masked[lo:hi]):
                m = regex.search(masked, lo + slo, lo + shi)
                if m:
                    return m
            return None

        def block(lo: int, hi: int) -> None:
            sm = d0(lo, hi, re.compile(r"\bSELECT\b", re.IGNORECASE))
            if sm is None:
                return
            fm = d0(sm.end(), hi, re.compile(r"\bFROM\b", re.IGNORECASE))
            if fm is None:
                return
            if d0(sm.end(), hi, self._GB_SKIP_RE) is not None:
                return
            items = split_top_level(s[sm.end() : fm.start()])
            if not items or re.match(r"\s*DISTINCT\b", items[0], re.IGNORECASE):
                return
            keys: list[str] = []
            n_agg = 0
            for item in items:
                st = item.strip()
                if st == "*" or st.endswith(".*") or not st:
                    return
                # classify with scalar subqueries blanked: an aggregate
                # inside `(SELECT count(*) ...)` runs per row and does not
                # make the ITEM an aggregate, but one nested in a scalar
                # call (`coalesce(sum(x), 0)`) does
                mitem = _mask_subqueries(mask_literals(item))
                if re.search(r"\bOVER\b", mitem, re.IGNORECASE):
                    return
                if _AGG_RE.search(mitem):
                    n_agg += 1
                else:
                    keys.append(self._gb_key_expr(item))
            if n_agg == 0 or not keys:
                return
            im = d0(fm.end(), hi, self._GB_INSERT_BEFORE_RE)
            pos = im.start() if im else hi
            edits.append((pos, f" GROUP BY {', '.join(keys)} "))

        def scan(lo: int, hi: int) -> None:
            cutpts = [lo]
            for slo, shi in depth0_spans(masked[lo:hi]):
                for m in self._BARE_SETOP_RE.finditer(masked, lo + slo, lo + shi):
                    cutpts.extend((m.start(), m.end()))
            cutpts.append(hi)
            for blo, bhi in zip(cutpts[0::2], cutpts[1::2]):
                block(blo, bhi)
            depth = 0
            oopen = -1
            for i in range(lo, hi):
                ch = masked[i]
                if ch == "(":
                    depth += 1
                    if depth == 1:
                        oopen = i
                elif ch == ")":
                    depth -= 1
                    if depth == 0 and oopen >= 0:
                        scan(oopen + 1, i)
                        oopen = -1

        scan(0, len(s))
        if not edits:
            return s
        out: list[str] = []
        last = 0
        for pos, text in sorted(edits):
            out.append(s[last:pos])
            out.append(text)
            last = pos
        out.append(s[last:])
        return "".join(out)

    # positions where a (SELECT ...) group is NOT an expression subquery:
    # table sources (the dialect lowerer recurses into those natively) and
    # set-op operands (split and recursed by _split_setops)
    _NON_EXPR_SUBQ_WORDS = frozenset(
        ["FROM", "JOIN", "UNION", "ALL", "INTERSECT", "EXCEPT"]
    )

    def _extract_dialect_subqueries(self, s: str) -> str:
        """Lower each expression-position subquery that carries a dialect
        clause (``WHERE id IN (SELECT ... LATEST ON ...)``) and swap in a
        reference to its registered view — Spark's expression parser only
        sees ANSI text.  Correlated dialect subqueries stay unsupported
        (the recursive lowering has no outer scope), matching the
        reference's own restriction that LATEST ON/SAMPLE BY subqueries
        are self-contained."""
        masked = mask_literals(s)
        edits: list[tuple[int, int, str]] = []
        pos = 0
        while True:
            m = re.search(r"\(\s*SELECT\b", masked[pos:], re.IGNORECASE)
            if m is None:
                break
            o = pos + m.start()
            c = _balanced_close(masked, o)
            if c < 0:
                break
            before = masked[:o].strip()
            prev = re.search(r"(\w+)\s*$", before)
            posword = prev.group(1).upper() if prev else ""
            content = s[o + 1 : c]
            if (
                before
                and posword not in self._NON_EXPR_SUBQ_WORDS
                and self._needs_dialect(content)
            ):
                self._sub_seq += 1
                name = f"__qdb_sub_{self._sub_seq}"
                try:
                    sub = self.sql(content)
                except Exception as e:
                    # an unresolved column inside the self-contained
                    # lowering is an outer-scope reference — surface the
                    # actual restriction instead of the inner resolver text
                    if "UNRESOLVED_COLUMN" in str(e) or "cannot be resolved" in str(e):
                        raise ValueError(
                            "correlated dialect subquery unsupported: "
                            "LATEST ON / SAMPLE BY subqueries are "
                            "self-contained (reference restriction); "
                            f"inner error: {e}"
                        ) from e
                    raise
                sub.createOrReplaceTempView(name)
                self._sub_views.append(name)
                edits.append((o, c, f"(SELECT * FROM {name})"))
                pos = c + 1
            else:
                pos = o + 1  # scan inside for nested expression subqueries
        if not edits:
            return s
        out: list[str] = []
        last = 0
        for o, c, repl in edits:
            out.append(s[last:o])
            out.append(repl)
            last = c + 1
        out.append(s[last:])
        return "".join(out)

    # ------------------------------------------------------------------
    def rewrite_predicate(self, text: str, table: str | None = None) -> str:
        """Dialect predicate rewrites for clause texts evaluated through
        ``F.expr`` OUTSIDE the SELECT pipeline (UPDATE ... WHERE):
        interval strings and equality intrinsics, day functions,
        BETWEEN normalization, null comparisons, match operators.
        ``table``: the statement's target table — scopes the
        ``ts = '<interval>'`` equality intrinsic to that table's
        designated timestamp (there is no FROM text to resolve from)."""
        if table is None:
            # bare predicate text with no table context: the global
            # designated-ts name set is the only resolvable guard
            ts_cols = set(self.designated_ts.values())
        else:
            ts_cols = set()
            for key in (table, table.lower()):
                ts = self.designated_ts.get(key)
                if ts:
                    ts_cols.add(ts)
        t = self._rewrite_day_functions(text)
        t = self._rewrite_in_interval_fn(t)
        t = self._rewrite_intervals(t, ts_cols=ts_cols)
        t = _normalize_between_literals(t)
        t = _sub_outside_literals(t, _NEQ_NULL_RE, " IS NOT NULL")
        t = _sub_outside_literals(t, _EQ_NULL_RE, " IS NULL")
        return _rewrite_match_operators(t)

    # ------------------------------------------------------------------
    def _infer_cte_ts(self, body: str, df: DataFrame) -> str | None:
        """Designated-timestamp propagation through a WITH binding: if the
        CTE body's first FROM source has a designated timestamp that
        survives into the output schema, the binding keeps it (the
        reference propagates timestamp metadata through WITH —
        ``QueryModel`` carries it; SAMPLE BY / ORDER BY ts outputs stay
        designated)."""
        m = re.search(r"\bFROM\s+([A-Za-z_][\w$]*)", mask_literals(body), re.IGNORECASE)
        if m is None:
            return None
        ts = self.designated_ts.get(m.group(1)) or self.designated_ts.get(
            m.group(1).lower()
        )
        if ts and ts in df.columns:
            return ts
        return None

    def _parse_with_prefix(self, stmt: str) -> tuple[list[tuple[str, str]], str]:
        """Split ``WITH n AS (...) [, m AS (...)] <main>`` into bindings and
        the main query text."""
        masked = mask_literals(stmt)
        pos = re.match(r"\s*WITH\s+", masked, re.IGNORECASE).end()
        ctes: list[tuple[str, str]] = []
        while True:
            hm = re.match(
                r'("?[A-Za-z_][\w$]*"?)\s+AS\s*\(', masked[pos:], re.IGNORECASE
            )
            if hm is None:
                raise ValueError(
                    f"malformed WITH clause near: {stmt[pos : pos + 40]!r}"
                )
            name = hm.group(1).strip('"')
            oopen = pos + hm.end() - 1
            oclose = _balanced_close(masked, oopen)
            if oclose < 0:
                raise ValueError("unbalanced parenthesis in WITH clause")
            ctes.append((name, stmt[oopen + 1 : oclose]))
            nxt = re.match(r"\s*,\s*", masked[oclose + 1 :])
            if nxt:
                pos = oclose + 1 + nxt.end()
            else:
                pos = oclose + 1
                break
        main = stmt[pos:].strip()
        if not main:
            raise ValueError("WITH clause without a query body")
        return ctes, main

    def _maybe_lower_with_ctes(self, stmt: str) -> DataFrame | None:
        """Decide whether this WITH needs the dialect CTE path: yes when
        the statement carries a dialect clause, or the main query uses the
        optional-SELECT shorthand (``WITH q AS (...) q``).  Pure-ANSI WITH
        returns None — Spark's native CTE handling is the fast path and
        also covers forms this parser doesn't (column-alias CTE lists)."""
        dialect = self._needs_dialect(stmt)
        try:
            ctes, main = self._parse_with_prefix(stmt)
        except ValueError:
            if dialect:
                raise
            return None
        if not dialect and re.match(
            r"SELECT\b|\(", main.lstrip(), re.IGNORECASE
        ):
            return None
        return self._lower_with_ctes(ctes, main)

    def _lower_with_ctes(
        self, ctes: list[tuple[str, str]], main: str
    ) -> DataFrame:
        """Top-level WITH over dialect queries (SqlParser.java parseWith;
        ``WITH x AS (...) [, y AS (...)] <query>``): evaluate each binding
        in order (later bodies may reference earlier names), register it
        as a statement-scoped table, lower the main query, then restore
        whatever the names shadowed.  Bindings resolve in every table
        position — FROM, ANSI joins, ASOF/LT/SPLICE/WINDOW JOIN slaves,
        set-op operands, even the bare-table main-query shorthand."""
        saved: dict[str, tuple] = {}
        bound: list[str] = []
        try:
            for name, body in ctes:
                df = self.sql(body)
                if name not in saved:
                    saved[name] = (
                        self.tables.get(name),
                        self.designated_ts.get(name),
                        self.tiebreak.get(name),
                        name in self.tables,
                    )
                    bound.append(name)
                ts = self._infer_cte_ts(body, df)
                self.tables[name] = df
                if ts:
                    self.designated_ts[name] = ts
                else:
                    self.designated_ts.pop(name, None)
                self.tiebreak.pop(name, None)
                df.createOrReplaceTempView(name)
            return self.sql(main)
        finally:
            for name in bound:
                old_df, old_ts, old_tb, existed = saved[name]
                if existed:
                    self.tables[name] = old_df
                    old_df.createOrReplaceTempView(name)
                else:
                    self.tables.pop(name, None)
                    if name in self.ddl_tables:
                        # DDL tables keep their temp view in sync through
                        # _refresh_view, not self.tables — restore it
                        self.ddl_read(name).createOrReplaceTempView(name)
                    else:
                        self.spark.catalog.dropTempView(name)
                if old_ts is not None:
                    self.designated_ts[name] = old_ts
                else:
                    self.designated_ts.pop(name, None)
                if old_tb is not None:
                    self.tiebreak[name] = old_tb
                else:
                    self.tiebreak.pop(name, None)

    _DAY_FN_RE = re.compile(
        r"\b(today|yesterday|tomorrow)\s*\(\s*('[^']*')?\s*\)", re.IGNORECASE
    )
    _IN_INTERVAL_FN_RE = re.compile(
        r"(\w+(?:\.\w+)?)\s+(NOT\s+)?IN\s+interval\s*\(", re.IGNORECASE
    )

    def _rewrite_day_functions(self, s: str) -> str:
        """``today()`` / ``yesterday()`` / ``tomorrow()`` (+ timezone arg;
        Today/Tomorrow/YesterdayFunctionFactory return the day's interval)
        → the day's interval STRING literal, evaluated at statement time —
        ``ts IN today()`` then flows through the ordinary interval-string
        rewrite into a pruned range scan."""
        from datetime import datetime, timedelta, timezone

        def repl(m) -> str:
            # matches run over the literal-MASKED text: the tz literal is
            # blanked, so read it back from the original via its span
            tz = s[m.start(2) + 1 : m.end(2) - 1] if m.group(2) else None
            if tz and tz.upper() not in ("UTC", "GMT", "Z"):
                from zoneinfo import ZoneInfo

                now = datetime.now(ZoneInfo(tz))
            else:
                now = datetime.now(timezone.utc)
            shift = {"today": 0, "yesterday": -1, "tomorrow": 1}[m.group(1).lower()]
            return f"'{(now + timedelta(days=shift)).date().isoformat()}'"

        return _sub_outside_literals(s, self._DAY_FN_RE, None, repl_fn=repl)

    def _rewrite_in_interval_fn(self, s: str) -> str:
        """``ts IN interval(lo, hi)`` (IntervalFunctionFactory + the IN(Δ)
        overload: INCLUSIVE micro bounds) → a BETWEEN range predicate."""
        masked = mask_literals(s)
        out: list[str] = []
        last = 0
        for m in self._IN_INTERVAL_FN_RE.finditer(masked):
            if m.start() < last:
                continue
            depth, close = 0, -1
            for k in range(m.end() - 1, len(masked)):
                if masked[k] == "(":
                    depth += 1
                elif masked[k] == ")":
                    depth -= 1
                    if depth == 0:
                        close = k
                        break
            if close < 0:
                raise ValueError(f"unbalanced interval() in {s!r}")
            args = split_top_level(s[m.end() : close], ",")
            if len(args) != 2:
                raise ValueError("interval() takes (lo, hi)")
            col, neg = m.group(1), bool(m.group(2))
            body = (
                f"({col} BETWEEN CAST({args[0]} AS TIMESTAMP)"
                f" AND CAST({args[1]} AS TIMESTAMP))"
            )
            out.append(s[last : m.start()])
            out.append(f"(NOT {body})" if neg else body)
            last = close + 1
        out.append(s[last:])
        return "".join(out)

    def _stmt_ts_columns(self, masked: str) -> set[str]:
        """Designated-timestamp column names of the tables actually
        referenced (FROM/JOIN positions) in this statement — NOT the
        global designated-ts name set.  The reference guards the
        ``ts = '<interval>'`` intrinsic with isTimestamp(column) on the
        actual column (WhereClauseParser analyzeEquals); a string column
        that merely shares a name with some OTHER table's designated ts
        must not be rewritten.  A column that resolves to a
        NON-timestamp dtype in every referenced registered table is
        excluded even if it name-matches."""
        refs: set[str] = set()
        pending = [masked]
        seen_bodies: set[str] = set()
        while pending:
            text = pending.pop()
            for m in re.finditer(
                r'\b(?:FROM|JOIN)\s+("?[A-Za-z_][\w$]*"?)', text, re.IGNORECASE
            ):
                t = m.group(1).strip('"')
                if t in refs:
                    continue
                refs.add(t)
                refs.add(t.lower())
                # follow view/matview definitions one level: a view over a
                # time table carries its base table's designated ts
                body = self.views.get(t) or self.views.get(t.lower())
                if body is None:
                    mv = self.matviews.get(t) or self.matviews.get(t.lower())
                    body = getattr(mv, "inner_sql", None) if mv is not None else None
                if body and body not in seen_bodies:
                    seen_bodies.add(body)
                    pending.append(mask_literals(body))
        names = {
            ts for t, ts in self.designated_ts.items() if t in refs or t.lower() in refs
        }
        if not names:
            return names
        # dtype veto: if the name resolves in referenced registered tables
        # and NONE of those columns is a timestamp, it's a plain column
        kept: set[str] = set()
        for name in names:
            dtypes = []
            for t in refs:
                df = self.tables.get(t)
                if df is None:
                    continue
                for c, dt in df.dtypes:
                    if c == name:
                        dtypes.append(dt)
            if dtypes and not any(dt.startswith("timestamp") for dt in dtypes):
                continue
            kept.add(name)
        return kept

    def _rewrite_intervals(self, s: str, ts_cols: set[str] | None = None) -> str:
        """`ts IN '2024-01'` / `ts IN ('2024-01', '2024-03')` /
        `ts NOT IN '...'` → half-open ranges (WhereClauseParser equivalent;
        the LIST form is the union of the intervals, InTest.java). Strings
        that do not ALL parse as intervals (plain IN lists over string
        columns) pass through untouched.  Matching runs over the
        literal-masked text so a `... IN '...'` sequence INSIDE a string
        literal is never rewritten; interval text is read back from the
        original string."""
        masked = mask_literals(s)
        out: list[str] = []
        last = 0
        # equality against an interval string is the same intrinsic
        # (WhereClauseParser analyzeEquals → model.intersectTimestamp:
        # `ts = '2024-01-15'` selects the whole day, != the complement) —
        # applied only to designated-timestamp columns OF THE TABLES THIS
        # STATEMENT REFERENCES, like the reference's isTimestamp(a) guard
        # (r8 advice: a global name set mis-rewrote string columns that
        # shared a name with some other table's designated ts)
        ts_names = self._stmt_ts_columns(masked) if ts_cols is None else ts_cols
        eq_matches = (
            [
                (m, m.group(2) in ("!=", "<>"))
                for m in _EQ_INTERVAL_RE.finditer(masked)
                if m.group(1).split(".")[-1] in ts_names
            ]
            if ts_names
            else []
        )
        matches = sorted(
            [
                *((m, bool(m.group(2))) for m in _IN_INTERVAL_RE.finditer(masked)),
                *(
                    (m, bool(m.group(2)))
                    for m in _IN_INTERVAL_LIST_RE.finditer(masked)
                ),
                *eq_matches,
            ],
            key=lambda t: t[0].start(),
        )
        for m, neg in matches:
            if m.start() < last:
                continue
            col = m.group(1)
            if col.upper() in ("NOT", "AND", "OR"):
                continue
            span = s[m.start(3) : m.end(3)]  # literal(s), unmasked
            bodies = re.findall(r"'([^']*)'", span)
            try:
                ranges = [
                    r for body in bodies for r in parse_interval_ranges(body)
                ]
            except ValueError:
                continue  # not interval strings: leave for plain IN
            terms = [
                f"({col} >= TIMESTAMP '{lo.isoformat(sep=' ')}'"
                f" AND {col} < TIMESTAMP '{hi.isoformat(sep=' ')}')"
                for lo, hi in ranges
            ]
            body = "(" + " OR ".join(terms) + ")"
            out.append(s[last : m.start()])
            out.append(f"(NOT {body})" if neg else body)
            last = m.end()
        out.append(s[last:])
        return "".join(out)

    _READ_PARQUET_RE = re.compile(
        r"\b(?:read_parquet|parquet_scan)\s*\(\s*('[^']+')\s*\)", re.IGNORECASE
    )

    @staticmethod
    def _validate_parquet_magic(path: str, cap: int = 1000) -> None:
        """Front/tail PAR1 magic check (broken_parquet.test: the reference
        rejects missing front magic, bare markers, and empty files; Spark's
        reader validates only the footer, so a head-corrupted file would
        silently serve metadata-only queries).  8-byte read per file,
        driver-side, capped at ``cap`` files — read_parquet is a file
        table function, not the partitioned-table scan path."""
        import os as _os

        if not _os.path.exists(path):
            return  # remote / nonexistent: Spark's own resolution errors
        files = (
            [path]
            if _os.path.isfile(path)
            else [
                _os.path.join(r, f)
                for r, ds, fs in _os.walk(path)
                for f in fs
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            ][:cap]
        )
        for f in files:
            size = _os.path.getsize(f)
            if size < 12:
                raise ValueError(f"invalid parquet file (too small): {f}")
            with open(f, "rb") as fh:
                head = fh.read(4)
                fh.seek(-4, 2)
                tail = fh.read(4)
            if head != b"PAR1" or tail != b"PAR1":
                raise ValueError(f"not a parquet file (magic mismatch): {f}")

    def _rewrite_read_parquet(self, s: str) -> str:
        """``read_parquet('p')`` / ``parquet_scan('p')`` table functions
        (``ReadParquetFunctionFactory.java:50``) → Spark's native
        ``parquet.`p``` source, which both the ANSI path (spark.sql) and the
        dialect path (spark.table) resolve.  Matched over the literal-masked
        text; the path is read back from the original."""
        masked = mask_literals(s)
        out: list[str] = []
        last = 0
        for m in self._READ_PARQUET_RE.finditer(masked):
            path = s[m.start(1) + 1 : m.end(1) - 1]
            # file_location.test: relative paths are refused — on a cluster
            # they resolve against whatever cwd each executor happens to
            # have, so they are both a correctness and a sandbox hazard
            if not path.startswith("/"):
                raise ValueError(
                    f"failed to read parquet file: {path}: relative path is not allowed"
                )
            self._validate_parquet_magic(path)
            # files may carry nanosecond timestamps (events.parquet):
            # mirror sources/parquet.load_table's session setting
            self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            out.append(s[last : m.start()])
            out.append(f"parquet.`{path}`")
            last = m.end()
        out.append(s[last:])
        rewritten = "".join(out)
        # anything left looking like read_parquet(...) had a non-literal
        # argument (NULL, a number, an expression) — reject it here with
        # the reference's error shape instead of a confusing Spark
        # resolution failure (file_location.test: parquet_scan(null))
        leftover = re.search(
            r"\b(?:read_parquet|parquet_scan)\s*\(", mask_literals(rewritten), re.IGNORECASE
        )
        if leftover:
            raise ValueError(
                "failed to read parquet file: read_parquet() requires a "
                "single path string literal"
            )
        return rewritten

    _PIPELINE_FN_RE = re.compile(
        # over the literal-MASKED text (quoted content blanked; name read
        # back from the original via its span), numeric args stay visible;
        # an optional SECOND string literal carries the query terms
        # (bm25_topk) or the positive class (classify_nb)
        r"\b(dedup_pairs|minhash_candidates|top_terms|bm25_topk|"
        r"classify_nb)"
        r"\s*\(\s*('[^']*')\s*(?:,\s*('[^']*')\s*)?"
        r"((?:,\s*[\d.]+\s*)*)\)",
        re.IGNORECASE,
    )

    def _rewrite_pipeline_fns(self, s: str) -> str:
        """LLM-pipeline operators as SQL table functions in FROM position
        (r10 — the dialect twin of the Python pipeline API, same shape as
        the catalogue functions): ``dedup_pairs('t'[, threshold])`` →
        n-gram Jaccard near-dup pairs, ``minhash_candidates('t')`` →
        MinHash-LSH banded candidate pairs, ``top_terms('t'[, k])`` →
        tf-df keyword extraction.  The named table must expose the
        documents convention (doc_id, text).  Each call materializes as a
        temp view substituted into the statement — the lowering is the
        exact production operator, so plan shape (bucketed joins, two
        aggs + window) is identical to the Python route."""
        from ..pipeline import dedup as _dedup
        from ..pipeline import text as _text

        masked = mask_literals(s)
        out: list[str] = []
        last = 0
        n_seen = 0
        for m in self._PIPELINE_FN_RE.finditer(masked):
            fn = m.group(1).lower()
            tname = s[m.start(2) : m.end(2)].strip("'")
            sarg = (
                s[m.start(3) : m.end(3)].strip("'")
                if m.group(3) is not None
                else None
            )
            args = [a.strip() for a in (m.group(4) or "").split(",") if a.strip()]
            base = self._table(tname, None)
            need_cols = ("doc_id", "text", "lang") if fn == "classify_nb" else ("doc_id", "text")
            for need in need_cols:
                if need not in base.columns:
                    raise ValueError(
                        f"{fn}() requires a documents-shaped table with "
                        f"{'/'.join(need_cols)} columns; "
                        f"{tname!r} lacks {need!r}"
                    )
            if fn == "dedup_pairs":
                thr = float(args[0]) if args else 0.5
                df = _dedup.ngram_jaccard_pairs(base, "doc_id", threshold=thr)
            elif fn == "minhash_candidates":
                df = _dedup.minhash_lsh_candidates(
                    base, "doc_id", n_hashes=16, band_size=4
                )
            elif fn == "bm25_topk":
                # bm25_topk('t', 'term term ...'[, k]) -> (doc_id, score):
                # the Okapi ranking as a relation — terms sorted/deduped so
                # the fixed summation order is caller-independent
                from .. import queries_pipeline as _qp

                if not sarg:
                    raise ValueError(
                        "bm25_topk() requires a query-terms string literal"
                    )
                terms = tuple(sorted(set(sarg.lower().split())))
                k = int(float(args[0])) if args else 20
                from pyspark.sql import functions as _F

                df = (
                    _qp._bm25_scored(base, terms=terms)
                    .select("doc_id", "score")
                    .filter(_F.col("score") > 0)
                    .orderBy(_F.col("score").desc(), "doc_id")
                    .limit(k)
                )
            elif fn == "classify_nb":
                # classify_nb('t', 'poslang') -> the trained NB model
                # relation (feature, n_pos, n_neg, weight)
                from pyspark.sql import functions as _F

                from ..pipeline import classify as _classify

                pos = sarg if sarg else "en"
                df = _classify.nb_train(
                    base,
                    None,
                    label_expr=_F.when(_F.col("lang") == pos, _F.lit(1))
                    .otherwise(_F.lit(-1)),
                ).select(
                    "feature",
                    "n_pos",
                    "n_neg",
                    _F.col("weight").cast("double").alias("weight"),
                )
            else:  # top_terms
                k = int(float(args[0])) if args else 3
                df = _text.top_terms(base, "doc_id", k=k)
            n_seen += 1
            view = f"__qdb_pipe_{fn}_{n_seen}"
            df.createOrReplaceTempView(view)
            self._sub_views.append(view)  # statement-scoped: dropped on exit
            out.append(s[last : m.start()])
            out.append(view)
            last = m.end()
        if not out:
            return s
        out.append(s[last:])
        return "".join(out)

    _CATALOG_FN_RE = re.compile(
        # matched over the literal-MASKED text: quoted content is blanked,
        # so the table-name group matches the quotes and is read back from
        # the original via its span
        r"\b(tables|all_tables|wal_tables|query_activity|functions|keywords"
        r"|views|materialized_views|live_views|memory_metrics"
        r"|table_writer_metrics|reader_pool|writer_pool|table_storage"
        r"|export_files|import_files)\s*\(\s*\)"
        r"|\b(table_columns|table_partitions|wait_wal_table|touch"
        r"|hydrate_table_metadata|wal_transactions)\s*\(\s*('[^']*')\s*\)"
        r"|\b(wait_wal_table)\s*\(\s*('[^']*')\s*,\s*(\d+)\s*\)",
        re.IGNORECASE,
    )

    @staticmethod
    def _inline_values(rows: list[tuple], schema: str) -> str:
        """Render metadata rows as an inline ``VALUES`` subquery instead of
        a ``createDataFrame`` temp view (r11 lifecycle-perf fix): a python
        ``createDataFrame`` costs ~0.4s PER VIEW (schema inference + an RDD
        job at execution), which dominated every multi-table-function
        lifecycle query — the catalogue listings are literal driver-side
        metadata, so a pure local VALUES relation is the right plan (no
        job, constant-folded, and the optimizer sees real row counts)."""
        _SQL_T = {
            "string": "STRING", "long": "BIGINT", "int": "INT",
            "boolean": "BOOLEAN", "timestamp": "TIMESTAMP",
            "double": "DOUBLE",
        }
        cols = []
        for part in schema.split(","):
            name, typ = part.strip().rsplit(" ", 1)
            cols.append((name, _SQL_T[typ.lower()]))

        def lit(v, typ: str) -> str:
            if v is None:
                return f"CAST(NULL AS {typ})"
            if typ == "STRING":
                # Spark literals treat backslash as an escape char — double
                # it first (query_activity rows carry regex-laden SQL text)
                return (
                    "'"
                    + str(v).replace("\\", "\\\\").replace("'", "''")
                    + "'"
                )
            if typ == "BOOLEAN":
                return "true" if v else "false"
            if typ == "TIMESTAMP":
                return f"TIMESTAMP '{v}'"
            if typ == "BIGINT":
                return f"CAST({int(v)} AS BIGINT)"
            if typ == "INT":
                return f"CAST({int(v)} AS INT)"
            return repr(v)
        names = ", ".join(n for n, _ in cols)
        if not rows:
            empties = ", ".join(f"CAST(NULL AS {t}) AS {n}" for n, t in cols)
            return f"(SELECT {empties} FROM (SELECT 1) WHERE 1 = 0)"
        body = ", ".join(
            "(" + ", ".join(lit(v, t) for v, (_, t) in zip(r, cols)) + ")"
            for r in rows
        )
        return f"(SELECT * FROM VALUES {body} AS t({names}))"

    def _rewrite_catalog_fns(self, s: str) -> str:
        """Catalogue table functions in FROM position (``tables()``,
        ``table_columns('t')``, ``table_partitions('t')`` —
        griffin/engine/functions/catalogue/): materialize the metadata as
        an inline VALUES relation at statement time and substitute it.
        Metadata is engine-dict-scale, so building the literal text per
        statement is free and always current."""
        masked = mask_literals(s)
        out: list[str] = []
        last = 0
        for m in self._CATALOG_FN_RE.finditer(masked):
            if m.group(4):
                # wait_wal_table('t', seqTxn) — functions/table/
                # WaitWalTableSeqTxnFunctionFactory.java ("wait_wal_table(sL)")
                # + WaitWalFunction.java:76: boolean, true once the applied
                # writer txn reaches seqTxn.  WAL apply is synchronous here,
                # so "caught up" is decidable immediately: applied = the
                # highest issued txn not parked by SUSPEND WAL.  A wait that
                # could never complete in this single-session engine (txn
                # parked by suspend, or never issued) raises — the honest
                # degenerate of the reference's bounded wait, which also
                # throws on timeout/cancel rather than hanging.
                tname = s[m.start(5) + 1 : m.end(5) - 1]
                if tname not in self.ddl_tables:
                    raise ValueError(f"no such table: {tname}")
                t = self.ddl_tables[tname]
                pend = set(t._wal_state()["pending"])
                top = self.ddl_seq.get(tname, 0)
                applied = max(
                    (x for x in range(1, top + 1) if x not in pend), default=0
                )
                seq = int(m.group(6))
                if applied < seq:
                    raise ValueError(
                        f"wait_wal_table timed out: {tname} applied txn "
                        f"{applied} < {seq} (suspended or not yet issued)"
                    )
                view = "true"
            elif m.group(1) and m.group(1).lower() == "table_storage":
                # functions/table/TableStorageFunctionFactory.java +
                # engine/table/TableStorageRecordCursorFactory.java:243-248:
                # one row per table — (tableName, walEnabled, partitionBy,
                # partitionCount, rowCount, diskSize).  rowCount comes from
                # parquet FOOTER metadata (pyarrow, driver-side — no Spark
                # job; the reference reads it from txReader the same way),
                # diskSize = Files.getDirSize analogue, partitionCount = the
                # partition directories (1 for PartitionBy NONE).
                import pyarrow.parquet as _pq

                rows = []
                for n, t in sorted(self.ddl_tables.items()):
                    dsize, rcount, parts, root_pq = 0, 0, set(), False
                    for root, dirs, fns in os.walk(t.path):
                        dirs[:] = [d for d in dirs if not d.startswith(".")]
                        for fname in fns:
                            fp = os.path.join(root, fname)
                            try:
                                dsize += os.path.getsize(fp)
                            except OSError:
                                continue
                            if fname.endswith(".parquet"):
                                rel = os.path.relpath(root, t.path)
                                if "=" in rel:
                                    parts.add(rel)
                                else:
                                    root_pq = True
                                try:
                                    rcount += _pq.ParquetFile(
                                        fp
                                    ).metadata.num_rows
                                except Exception:
                                    pass
                    rows.append(
                        (n, True, t.partition_by.upper(),
                         len(parts) if parts else (1 if root_pq else 0),
                         rcount, dsize)
                    )
                for n in sorted(self.tables):
                    rcount, dsize = 0, 0
                    for fp in self.tables[n].inputFiles():
                        p = fp.removeprefix("file:")
                        try:
                            dsize += os.path.getsize(p)
                            rcount += _pq.ParquetFile(p).metadata.num_rows
                        except Exception:
                            continue
                    rows.append((n, False, "NONE", 1, rcount, dsize))
                schema = (
                    "tableName string, walEnabled boolean, partitionBy "
                    "string, partitionCount long, rowCount long, diskSize long"
                )
                view = self._inline_values(rows, schema)
            elif m.group(1) and m.group(1).lower() == "query_activity":
                # griffin/QueryRegistry.java + functions/activity/: the
                # session's query log (timestamps omitted — the reference
                # emits wall-clock columns; a deterministic registry is
                # what makes this oracle-checkable)
                schema = "query_id long, query string, state string"
                rows = [
                    (e["query_id"], e["query"], e["state"]) for e in self.query_log
                ]
                view = "__qdb_query_activity"
                view = self._inline_values(rows, schema)
            elif m.group(1) and m.group(1).lower() in (
                "views", "materialized_views", "live_views",
            ):
                # ViewsFunctionFactory / MaterializedViewsFunctionFactory /
                # LiveViewsFunctionFactory (catalogue/, cairo/lv/): list the
                # engine's plain / materialized / live view registries
                kind = m.group(1).lower()
                if kind == "views":
                    rows = [(n, body) for n, body in sorted(self.views.items())]
                else:
                    want_live = kind == "live_views"
                    rows = [
                        (n, d.base, d.shape)
                        for n, d in sorted(self.matviews.items())
                        if d.live == want_live
                    ]
                schema = (
                    "view_name string, definition string"
                    if kind == "views"
                    else "view_name string, base_table string, refresh_shape string"
                )
                view = f"__qdb_{kind}"
                view = self._inline_values(rows, schema)
            elif m.group(1) and m.group(1).lower() in (
                "export_files", "import_files",
            ):
                # catalogue/{Export,Import}FilesFunctionFactory: list the
                # files under the COPY export/import roots.  This engine's
                # root is its own copy log (every COPY records its target),
                # so the listing walks the logged paths.  modifiedTime is
                # wall-clock by nature — pytest-verified, not oracle-hashed.
                kind = "export" if m.group(1).lower().startswith("export") else "import"
                rows = []
                for e in self.copy_log:
                    if e.get("kind") != kind:
                        continue
                    tgt = e.get("target", "")
                    # imports log the TARGET TABLE name — list the storage
                    # files the import created
                    if kind == "import" and tgt in self.ddl_tables:
                        tgt = self.ddl_tables[tgt].path
                    paths = []
                    if os.path.isdir(tgt):
                        for root, _dirs, fns in os.walk(tgt):
                            # skip Spark bookkeeping (_SUCCESS, .crc): the
                            # listing is the export artifacts, not sidecars
                            paths += [
                                os.path.join(root, f)
                                for f in fns
                                if not f.startswith((".", "_"))
                            ]
                    elif os.path.isfile(tgt):
                        paths = [tgt]
                    for p in sorted(paths):
                        try:
                            st = os.stat(p)
                        except OSError:
                            continue
                        sz = int(st.st_size)
                        human = (
                            f"{sz} B" if sz < 1024
                            else f"{sz / 1024:.1f} KiB" if sz < 1024 ** 2
                            else f"{sz / 1024 ** 2:.1f} MiB"
                        )
                        rows.append(
                            (p, sz, human,
                             datetime.fromtimestamp(st.st_mtime, tz=timezone.utc)
                             .replace(tzinfo=None))
                        )
                schema = ("path string, diskSize long, diskSizeHuman string, "
                          "modifiedTime timestamp")
                view = f"__qdb_{kind}_files"
                view = self._inline_values(rows, schema)
            elif m.group(1) and m.group(1).lower() in (
                "memory_metrics", "table_writer_metrics",
                "reader_pool", "writer_pool",
            ):
                # functions/table/{MemoryMetrics,TableWriterMetrics,
                # ReaderPool,WriterPool}FunctionFactory — engine
                # introspection.  writer metrics come from the statement
                # counters (see __init__); pool listings map this engine's
                # writer state: thread ids are 0 (one logical writer per
                # table under Spark's scheduler), last_access is NULL (no
                # wall clock — keeps the functions oracle-checkable)
                kind = m.group(1).lower()
                if kind == "table_writer_metrics":
                    order = ["total_commits", "o3commits", "rollbacks",
                             "committed_rows", "physically_written_rows"]
                    rows = [(n, self.writer_metrics[n]) for n in order]
                    schema = "name string, value long"
                elif kind == "memory_metrics":
                    import resource

                    rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
                    rows = [
                        ("driver_rss", int(rss_kb) * 1024),
                        ("tagged_total", int(rss_kb) * 1024),
                    ]
                    schema = "memory_tag string, bytes long"
                elif kind == "writer_pool":
                    rows = [
                        (n, 0, None,
                         "suspended" if t._wal_state()["suspended"] else None)
                        for n, t in sorted(self.ddl_tables.items())
                    ]
                    schema = ("table_name string, owner_thread_id long, "
                              "last_access_timestamp timestamp, "
                              "ownership_reason string")
                else:  # reader_pool
                    rows = [
                        (n, 0, None, self.ddl_seq.get(n, 0))
                        for n in sorted(self.ddl_tables)
                    ]
                    schema = ("table_name string, owner_thread_id long, "
                              "last_access_timestamp timestamp, "
                              "current_txn long")
                view = f"__qdb_{kind}"
                view = self._inline_values(rows, schema)
            elif m.group(1) and m.group(1).lower() in ("functions", "keywords"):
                # FunctionListFunctionFactory / PgGetKeywordsFunctionFactory
                # analogues: the dialect's OWN callable surface — macro
                # names plus the rnd_* family (Spark built-ins pass through
                # and are not enumerated here)
                kind = m.group(1).lower()
                if kind == "functions":
                    rows = sorted(
                        [(n, "macro") for n in _FN_MACROS]
                        + [(n, "generator") for n in _RND_MACROS]
                    )
                    schema = "name string, kind string"
                else:
                    kws = ("sample latest asof splice window horizon pivot "
                           "declare dedup upsert wal suspend resume rebase "
                           "squash detach attach convert ttl vacuum "
                           "checkpoint").split()
                    rows = [(k,) for k in sorted(kws)]
                    schema = "keyword string"
                view = f"__qdb_{kind}"
                view = self._inline_values(rows, schema)
            elif m.group(1):  # tables()/all_tables()/wal_tables()
                # param columns mirror TablesFunctionFactory (reference
                # defaults: maxUncommittedRows 500k, o3MaxLag 10 min);
                # `suspended` reflects the WAL suspend/resume lifecycle
                rows = [
                    (
                        n, t.ts_col, t.partition_by, ",".join(t.dedup_keys), True,
                        bool(t._wal_state()["suspended"]),
                        int(t.params.get("maxUncommittedRows", 500_000)),
                        str(t.params.get("o3MaxLag", "600000000")),
                    )
                    for n, t in sorted(self.ddl_tables.items())
                ] + [
                    (n, self.designated_ts.get(n, ""), "", "", False, False,
                     500_000, "600000000")
                    for n in sorted(self.tables)
                ]
                schema = (
                    "table_name string, designated_ts string, "
                    "partition_by string, dedup_keys string, wal_enabled boolean, "
                    "suspended boolean, max_uncommitted_rows long, o3_max_lag string"
                )
                view = "__qdb_tables"
                view = self._inline_values(rows, schema)
            else:  # table_columns / table_partitions
                fn_name = m.group(2).lower()
                # table name read from the ORIGINAL text (mask blanks it)
                tname = s[m.start(3) + 1 : m.end(3) - 1]
                from ..sources import catalog

                view = f"__qdb_{fn_name}_{tname}"
                if fn_name == "wal_transactions":
                    # WalTransactionsFunctionFactory analogue: txn log from
                    # the eager-apply model — every seq issued so far is
                    # 'applied' unless parked by SUSPEND WAL ('pending')
                    if tname not in self.ddl_tables:
                        raise ValueError(f"no such table: {tname}")
                    t = self.ddl_tables[tname]
                    pend = set(t._wal_state()["pending"])
                    top = self.ddl_seq.get(tname, 0)
                    rows = [
                        (txn, "pending" if txn in pend else "applied")
                        for txn in range(1, top + 1)
                    ]
                    schema = "txn long, state string"
                    view = self._inline_values(rows, schema)
                elif fn_name == "wait_wal_table":
                    # WAL application is synchronous in this engine; the
                    # wait degenerates to an existence check
                    if tname not in self.ddl_tables and tname not in self.tables:
                        raise ValueError(f"no such table: {tname}")
                    view = "'ok'"
                elif fn_name == "touch":
                    # functions/table/TouchTableFunctionFactory: pre-fault
                    # table pages into cache.  Spark analogue: one count
                    # job warms parquet footers, the file-status cache and
                    # the OS page cache; report what was touched.
                    if tname in self.ddl_tables:
                        src = self.ddl_read(tname)
                    elif tname in self.tables:
                        src = self.tables[tname]
                    else:
                        raise ValueError(f"no such table: {tname}")
                    n_files = len(src.inputFiles())
                    n_rows = src.count()
                    view = (
                        f"(SELECT {n_files} AS touched_files, "
                        f"CAST({n_rows} AS BIGINT) AS touched_rows)"
                    )
                elif fn_name == "hydrate_table_metadata":
                    # functions/table/HydrateTableMetadataFunctionFactory:
                    # force a metadata re-read — Spark's refreshTable drops
                    # the cached file listing / schema for the view
                    if tname in self.ddl_tables or tname in self.tables:
                        try:
                            self.spark.catalog.refreshTable(tname)
                        except Exception:
                            pass  # not a catalog-registered view yet
                        view = "'ok'"
                    else:
                        raise ValueError(f"no such table: {tname}")
                elif fn_name == "table_columns":
                    if tname in self.ddl_tables:
                        self.ddl_read(tname).createOrReplaceTempView(tname)
                    view = self._inline_values(
                        catalog.table_columns_rows(self.spark, tname),
                        catalog.TABLE_COLUMNS_SCHEMA,
                    )
                else:
                    if tname not in self.ddl_tables:
                        raise ValueError(f"no such table: {tname}")
                    view = self._inline_values(
                        catalog.table_partitions_rows(
                            self.ddl_tables[tname].path
                        ),
                        catalog.TABLE_PARTITIONS_SCHEMA,
                    )
            out.append(s[last : m.start()])
            out.append(view)
            last = m.end()
        out.append(s[last:])
        return "".join(out)

    _TOP_PIVOT_RE = re.compile(r"^(\w+)\s+PIVOT\s*\(", re.IGNORECASE)
    _PIVOT_BODY_RE = re.compile(
        r"^(.+?)\s+FOR\s+((?:\w+\s+IN\s*\([^)]*\)\s*)+)(?:GROUP\s+BY\s+(.+))?$",
        re.IGNORECASE | re.DOTALL,
    )
    _PIVOT_AXIS_RE = re.compile(r"(\w+)\s+IN\s*\(([^)]*)\)", re.IGNORECASE)

    def _rewrite_top_pivot(self, s: str) -> str | None:
        """Pivot forms Spark's parser lacks (SqlParser.java:4260,
        sqllogictest pivot/*.test), lowered onto Spark's SELECT-PIVOT:

        - top-level ``<table> PIVOT (agg FOR col IN (...) [GROUP BY cols])
          [ORDER BY ...]`` — the whole statement;
        - FROM-position ``... FROM <table> PIVOT (... GROUP BY ...) ...``
          when the body carries a GROUP BY (without one, Spark's native
          pivot already handles the text).

        Spark groups implicitly by every non-pivot projected column, so the
        inner projection is exactly: GROUP BY columns + a copy of the pivot
        column + the aggregate's column operands."""
        s = s.strip().rstrip(";")
        masked = mask_literals(s)
        m = self._TOP_PIVOT_RE.match(s)
        if m is not None:
            start = s.index("(", m.end() - 1)
            end = self._pivot_close(masked, start, s)
            body, tail = s[start + 1 : end], s[end + 1 :].strip()
            return self._lower_pivot_body(m.group(1), body, tail)
        # subquery source: ``(SELECT ...) PIVOT (...)`` (test_optional_pivots)
        if masked.startswith("("):
            sub_end = self._pivot_close(masked, 0, s)
            mp = re.match(r"\s*PIVOT\s*\(", masked[sub_end + 1 :], re.IGNORECASE)
            if mp is not None:
                start = sub_end + 1 + mp.end() - 1
                end = self._pivot_close(masked, start, s)
                body, tail = s[start + 1 : end], s[end + 1 :].strip()
                return self._lower_pivot_body(s[: sub_end + 1], body, tail)
        # FROM-position form with an in-body GROUP BY
        out: list[str] = []
        last = 0
        changed = False
        for mf in re.finditer(
            r"\bFROM\s+(\w+)\s+PIVOT\s*\(", masked, re.IGNORECASE
        ):
            if mf.start() < last:
                continue
            start = s.index("(", mf.end() - 1)
            end = self._pivot_close(masked, start, s)
            body = s[start + 1 : end]
            mb_body = mask_literals(body)
            if not re.search(r"\bGROUP\s+BY\b", mb_body, re.IGNORECASE) and not re.search(
                r"\bIN\s*\(\s*SELECT\b", mb_body, re.IGNORECASE
            ):
                continue  # Spark-native pivot form handles the text
            out.append(s[last : mf.start()])
            out.append(f"FROM ({self._lower_pivot_body(mf.group(1), body, '')})")
            last = end + 1
            changed = True
        if not changed:
            return None
        out.append(s[last:])
        return "".join(out)

    def _pivot_axis_vals(self, vals: list[str]) -> list[str]:
        """Dynamic pivot cells: ``FOR c IN (SELECT DISTINCT ...)``
        (pivot_subquery.test) — the cell set must be known at plan time, so
        the subquery is evaluated eagerly.  This is a justified
        metadata-scale collect: one row per output COLUMN (dozens), the
        same economics as IVF centroids."""
        if len(vals) == 1 and re.match(r"^\s*SELECT\b", vals[0], re.IGNORECASE):
            rows = self.sql(vals[0]).collect()
            out = []
            for r in rows:
                v = r[0]
                out.append(
                    "'" + str(v).replace("'", "''") + "'"
                    if isinstance(v, str)
                    else str(v)
                )
            if not out:
                raise ValueError("dynamic PIVOT IN subquery produced no values")
            return out
        return vals

    @staticmethod
    def _pivot_close(masked: str, start: int, s: str) -> int:
        depth = 0
        for i in range(start, len(masked)):
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
                if depth == 0:
                    return i
        raise ValueError(f"unbalanced PIVOT parens: {s!r}")

    def _lower_pivot_body(self, table: str, body: str, tail: str) -> str:
        mb = self._PIVOT_BODY_RE.match(body.strip())
        if not mb:
            raise ValueError(f"cannot parse PIVOT body: {body!r}")
        agg, axes_text, group = (
            mb.group(1).strip(),
            mb.group(2),
            (mb.group(3) or "").strip(),
        )
        axes = [
            (m2.group(1), self._pivot_axis_vals(split_top_level(m2.group(2), ",")))
            for m2 in self._PIVOT_AXIS_RE.finditer(axes_text)
        ]
        gcols = [c.strip() for c in group.split(",") if c.strip()] if group else []
        axis_names = [a[0].lower() for a in axes]
        # multiple aggregates with optional aliases (pivot_bigquery.test:
        # ``SUM(sales) total_sales, COUNT(*) num_records FOR ...``) — split
        # at top level, peel each item's alias (bare or AS form, only after
        # a closing paren so ``SUM(a) + b`` stays an expression)
        agg_parts: list[tuple[str, str | None]] = []
        for item in split_top_level(agg, ","):
            ma = re.match(r"^(.+)\s+AS\s+([A-Za-z_]\w*)$", item, re.IGNORECASE) or \
                re.match(r"^(.+\))\s+([A-Za-z_]\w*)$", item, re.DOTALL)
            if ma and ma.group(2).lower() not in _PIVOT_NON_COLUMN_WORDS:
                agg_parts.append((ma.group(1).strip(), ma.group(2)))
            else:
                agg_parts.append((item.strip(), None))
        # reference error surface (pivot_errors.test): a bare window
        # function or a non-aggregate expression cannot be pivoted
        for expr0, _ in agg_parts:
            magg = mask_literals(expr0)
            if _top_level_over(magg):
                raise ValueError(
                    "Window function is not allowed in context of aggregation. "
                    "Use sub-query."
                )
            if not _AGG_RE.search(magg):
                raise ValueError(f"expected aggregate function [col={expr0}]")
        # aggregate operand columns: bare identifiers inside the call that
        # aren't the pivot/group columns (SUM(1) has none).  Expression
        # aggregates (pivot_expressions.test: COALESCE(SUM(x),0),
        # SUM(x)+COUNT(1), SUM(x)::varchar) mean the text contains function
        # names and cast-target types too — an identifier followed by ``(``
        # is a call, not a column, and SQL keywords/type names never are.
        operands: list[str] = []
        for expr0, _ in agg_parts:
            if "(" not in expr0:
                continue
            inner = expr0[expr0.index("(") + 1 : expr0.rindex(")")]
            masked_inner = mask_literals(inner)
            for m2 in re.finditer(
                r"(?:\b[A-Za-z_]\w*\s*\.\s*)?\b([A-Za-z_]\w*)\b\s*(\()?", masked_inner
            ):
                if m2.group(2):  # function call, e.g. abs( / coalesce(
                    continue
                w = m2.group(1)
                lw = w.lower()
                if lw in _PIVOT_NON_COLUMN_WORDS:
                    continue
                if lw in axis_names or lw in (g.lower() for g in gcols):
                    continue
                if w not in operands:
                    operands.append(w)
        agg = ", ".join(
            f"{e} AS {a}" if a else e for e, a in agg_parts
        )
        # the qualifier is gone from the projection, so strip it in the
        # aggregate text too
        agg = re.sub(r"\b[A-Za-z_]\w*\s*\.\s*([A-Za-z_]\w*)\b", r"\1", agg)
        for _, vals in axes:
            seen_vals: set[str] = set()
            for v in vals:
                # cell aliases don't affect the VALUE identity
                base = re.split(r"\s+AS\s+", v, flags=re.IGNORECASE)[0].strip()
                if base.lower() in seen_vals:
                    raise ValueError(f"duplicate value in PIVOT IN list: {base}")
                seen_vals.add(base.lower())
        def split_alias(v: str) -> tuple[str, str | None]:
            # IN-cell alias forms: ``1 AS q1`` and the quoted
            # ``'US' AS 'false'`` (pivot_in_boolean.test) — Spark only
            # accepts identifier aliases, so quoted/keyword aliases are
            # re-emitted backticked
            mv = re.match(
                r"^(.+?)\s+AS\s+('([^']*)'|\"([^\"]*)\"|[A-Za-z_]\w*)\s*$",
                v.strip(),
                re.IGNORECASE | re.DOTALL,
            )
            if not mv:
                return v.strip(), None
            alias = mv.group(3) or mv.group(4) or mv.group(2)
            return mv.group(1).strip(), alias

        if len(axes) == 1:
            pivcol, vals = axes[0]
            proj = [*gcols, f"{pivcol} AS __pivot", *operands]
            parts = []
            for v in vals:
                base, alias = split_alias(v)
                parts.append(f"{base} AS `{alias}`" if alias else base)
            in_list = ", ".join(parts)
        else:
            # multi-axis pivot (test_multi_pivot.test): one composite key,
            # IN cells = first-axis-major cross product — matches the
            # reference's output column order; per-value aliases
            # (pivot_databricks.test ``1 as q1``) name the cell
            key = " , '_', ".join(f"CAST({a[0]} AS STRING)" for a in axes)
            proj = [*gcols, f"concat({key}) AS __pivot", *operands]
            from itertools import product

            cells = []
            for combo in product(*[a[1] for a in axes]):
                pairs = [split_alias(v) for v in combo]
                val = "'" + "_".join(b.strip().strip("'\"") for b, _ in pairs) + "'"
                if any(a for _, a in pairs):
                    name = "_".join(
                        (a if a else b.strip().strip("'\"")) for b, a in pairs
                    )
                    cells.append(f"{val} AS `{name}`")
                else:
                    cells.append(val)
            in_list = ", ".join(cells)
        agg_rw = agg
        for a, _ in axes:
            agg_rw = re.sub(rf"\b{re.escape(a)}\b", "__pivot", agg_rw, flags=re.IGNORECASE)
        return (
            f"SELECT * FROM (SELECT {', '.join(proj)} FROM {table}) "
            f"PIVOT ({agg_rw} FOR __pivot IN ({in_list})) {tail}"
        )

    # ------------------------------------------------------------------
    def _rewrite_join_qualifiers(self, q: QdbQuery, mcols: list, ts_col: str) -> None:
        """After an ASOF/LT/SPLICE join is flattened, translate
        ``<master_alias>.<col>`` / ``<slave_alias>.<col>`` references in the
        query's remaining clauses onto the join's output names: master
        columns keep their names, the slave timestamp becomes ``slave_ts``
        (``master_ts``/``slave_ts`` for SPLICE), shared keys stay bare, and
        colliding slave payload columns carry the ``_slave`` suffix
        (operators/asof.py naming)."""
        ma = (q.table_alias or q.table).lower()
        sa = (q.join.alias or q.join.table).lower()
        if ma == sa:
            return  # no distinct qualifiers to translate
        keys = {k.lower() for k in q.join.keys}
        taken = {c.lower() for c in mcols}
        splice = q.join.kind == "splice"

        def mapped(qual: str, col: str) -> str | None:
            lq, lc = qual.lower(), col.lower()
            if lq == ma:
                return "master_ts" if splice and lc == ts_col.lower() else col
            if lq == sa:
                if lc == ts_col.lower():
                    return "slave_ts"
                if lc in keys:
                    return col
                return f"{col}_slave" if lc in taken else col
            return None

        def sub(text: str | None) -> str | None:
            if not text:
                return text
            masked = mask_literals(text)
            out: list[str] = []
            last = 0
            for m in re.finditer(r"\b(\w+)\s*\.\s*(\w+)\b", masked):
                new = mapped(m.group(1), m.group(2))
                if new is None:
                    continue
                out.append(text[last : m.start()])
                out.append(new)
                last = m.end()
            out.append(text[last:])
            return "".join(out)

        q.where = sub(q.where)
        q.having = sub(q.having)
        for i in q.select_items:
            i.expr = sub(i.expr)
        q.group_by = [sub(g) for g in q.group_by or []]
        q.order_by = sub(q.order_by)

    # ------------------------------------------------------------------
    def _table(self, name: str, alias: str | None) -> DataFrame:
        """Resolve a FROM/JOIN source: a registered table, a plain view, a
        temp view, or a parenthesized subquery (recursively lowered —
        dialect clauses inside subqueries work, ``SqlParser.java``
        parseSubQuery equivalent)."""
        if name.startswith("("):
            df = self.sql(name[1:-1])
        elif name in self.views:
            df = self.sql(self.views[name])
        elif name in self.tables:
            if name in self.matviews:  # LIVE views refresh on read
                from .matview_ddl import read_with_live_refresh

                read_with_live_refresh(self, name)
            df = self.tables[name]
        else:
            if name in self._dirty_views:  # stale DDL-table temp view
                self._flush_dirty_views(name)
            df = self.spark.table(name)  # temp views / catalog tables
        return df.alias(alias) if alias else df

    def _lower(self, q: QdbQuery) -> DataFrame:
        df = self._table(q.table, q.table_alias)
        ts_col = q.from_ts_col or self.designated_ts.get(q.table)
        if ts_col is None and q.table.startswith("parquet."):
            # designated-ts detection for third-party parquet files
            # (sqllogictest parquet/designated_ts_detection.test): prefer a
            # column literally named "ts", else the first timestamp-typed
            # column in schema order — so SAMPLE BY works on a bare
            # read_parquet() source without a timestamp() decoration
            tscands = [
                f.name for f in df.schema.fields
                if f.dataType.typeName().startswith("timestamp")
            ]
            ts_col = "ts" if "ts" in tscands else (tscands[0] if tscands else None)
        if ts_col is None:
            ts_col = "ts"

        for j in q.sql_joins:  # plain ANSI joins, in textual order
            other = self._table(j.table, j.alias)
            if j.how == "cross":
                df = df.crossJoin(other)
            else:
                df = df.join(other, on=F.expr(j.on) if j.on else None, how=j.how)

        if q.join is not None:
            other = self._table(q.join.table, q.join.alias)
            fn = {"asof": asof_join, "lt": lt_join, "splice": splice_join}[q.join.kind]
            mcols = list(df.columns)
            if q.join.kind == "splice":
                df = fn(df, other, ts_col, keys=q.join.keys)
            else:
                df = fn(df, other, ts_col, keys=q.join.keys, tolerance=q.join.tolerance)
            # `tab a asof join tab b on (tag)` projections say `a.seq` /
            # `b.seq` (AsOfJoinTest fixtures); the flattened join output
            # names them `seq` / `seq_slave` — rewrite the qualifiers
            self._rewrite_join_qualifiers(q, mcols, ts_col)

        if q.where:
            df = df.filter(F.expr(q.where))

        if q.latest_on is not None:
            lts, keys = q.latest_on
            if lts is None:  # legacy LATEST BY: the designated timestamp
                lts = ts_col
            # PARTITION BY may name a select ALIAS of an expression
            # (LatestByTest.testLatestByAllFilteredReentrant: `select
            # a+b*c x ... latest on ts partition by x`) — materialize it
            alias_map = {i.alias: i.expr for i in q.select_items if i.alias}
            if q.table_alias:
                # PARTITION BY may qualify keys with the table alias
                keys = [
                    k[len(q.table_alias) + 1 :]
                    if k.startswith(q.table_alias + ".")
                    else k
                    for k in keys
                ]
            for k in keys:
                if k not in df.columns and k in alias_map:
                    df = df.withColumn(k, F.expr(alias_map[k]))
            df = latest_on(df, lts, keys, tiebreak=self.tiebreak.get(q.table))
            if q.table_alias:
                df = df.alias(q.table_alias)

        if q.window_join is not None:
            return self._finish(self._lower_window_join(df, q, ts_col), q, ts_col)
        if q.horizon_join is not None:
            return self._finish(self._lower_horizon_join(df, q, ts_col), q, ts_col)

        if q.sample_by is not None:
            df = self._lower_sample_by(df, q, ts_col)
        else:
            df = self._project(df, q)
            if q.distinct:
                df = df.distinct()

        if q.having:
            # HAVING runs over the aggregated frame; aggregate expressions
            # that textually match a select item are rewritten to that
            # item's output alias (`HAVING count(*) > 10` works whether or
            # not the item was aliased)
            having = q.having
            # longest expression first: replacing `sum(v)` before `sum(v2)`
            # would corrupt the longer match
            for i in sorted(
                (i for i in q.select_items if i.alias),
                key=lambda i: -len(i.expr.strip()),
            ):
                having = _replace_expr_outside_literals(
                    having, i.expr.strip(), i.alias
                )
            df = df.filter(F.expr(having))

        return self._finish(df, q, ts_col)

    def _finish(self, df: DataFrame, q: QdbQuery, ts_col: str) -> DataFrame:
        order_items = (
            [_order_spec(o) for o in split_top_level(q.order_by)]
            if q.order_by
            else []
        )
        if order_items:
            df = df.orderBy(
                *[F.expr(e).desc() if d else F.expr(e).asc() for e, d in order_items]
            )
        if q.limit is not None:
            lo, hi = q.limit

            def flip_tail(take_n: int, skip_n: int = 0) -> DataFrame:
                # tail rows via a REVERSED top-k pass, then restore the
                # order (both sorts stay TakeOrderedAndProject — nothing
                # materializes fully)
                if order_items:
                    rev = [
                        F.expr(e).asc() if d else F.expr(e).desc()
                        for e, d in order_items
                    ]
                    fwd = [
                        F.expr(e).desc() if d else F.expr(e).asc()
                        for e, d in order_items
                    ]
                else:
                    oc = ts_col if ts_col in df.columns else df.columns[0]
                    rev, fwd = [F.col(oc).desc()], [F.col(oc).asc()]
                t = df.orderBy(*rev)
                if skip_n:
                    t = t.offset(skip_n)
                return t.limit(take_n).orderBy(*fwd)

            if hi is not None:
                # LIMIT lo, hi row range; negative bounds count from the
                # END of the result set (LimitRecordCursorFactory.java:43)
                if lo >= 0 and hi >= 0:
                    df = df.limit(0) if hi <= lo else df.offset(lo).limit(hi - lo)
                elif lo < 0 and hi < 0:
                    # both from the end: rows [n+lo, n+hi) = positions
                    # [-hi, -lo) of the reversed order — no count needed
                    df = df.limit(0) if hi <= lo else flip_tail(hi - lo, -hi)
                else:
                    # mixed signs resolve against the total row count,
                    # like the reference's materialized cursor size
                    n = df.count()
                    rlo = max(0, lo if lo >= 0 else n + lo)
                    rhi = max(0, hi if hi >= 0 else n + hi)
                    df = (
                        df.limit(0)
                        if rhi <= rlo
                        else df.offset(rlo).limit(rhi - rlo)
                    )
            elif lo < 0:
                df = flip_tail(-lo)
            else:
                df = df.limit(lo)
        return df

    # -- WINDOW JOIN / HORIZON JOIN lowering ---------------------------------
    def _lower_window_join(self, df: DataFrame, q: QdbQuery, ts_col: str) -> DataFrame:
        """``WINDOW JOIN slave [ON (keys)] RANGE BETWEEN x PRECEDING AND y
        FOLLOWING`` (``SqlParser.java:4754``): aggregate select items run over
        the slave rows in each master row's window; the rest are per-master
        passthrough columns."""
        spec = q.window_join
        slave_ts = self.designated_ts.get(spec.table, "ts")
        slave = self._table(spec.table, None)
        if slave_ts != ts_col:
            slave = slave.withColumnRenamed(slave_ts, ts_col)
        m_alias = q.table_alias or q.table
        s_alias = spec.alias or spec.table

        def strip_m(e: str) -> str:
            return re.sub(rf"\b{re.escape(m_alias)}\.", "", e)

        def to_s(e: str) -> str:
            return re.sub(rf"\b{re.escape(s_alias)}\.", "s.", strip_m(e))

        if spec.jfilter:
            # slave-side join filter (``ON (keys) AND p.price < 300``,
            # WindowJoinTest testFastJoinWithJoinFilter): pre-filters the
            # slave, so both the window aggregate AND the prevailing probe
            # see only matching rows — the reference's "join filter"
            # semantics. Master-column references fail analysis here, like
            # the reference's error contract (master predicates are WHERE).
            bare = re.sub(
                rf"\b{re.escape(s_alias)}\.", "", strip_m(spec.jfilter)
            )
            slave = slave.filter(F.expr(bare))

        agg_items = [i for i in q.select_items if _has_agg(i.expr)]
        pass_items = [i for i in q.select_items if not _has_agg(i.expr)]
        mcols = [strip_m(i.expr).strip() for i in pass_items]
        for extra in (ts_col, *spec.keys):
            if extra not in mcols:
                mcols.append(extra)
        # dynamic bounds (testDynamicWindowBoundColumnNotInSelect): master
        # columns referenced only inside a bound expression still ride the
        # master projection; slave-side references stay unresolved and fail
        # analysis like the reference's "slave column in bound" error
        lo_b, hi_b = spec.lo, spec.hi
        for b in (lo_b, hi_b):
            if b.startswith("dyn:"):
                for ident in re.findall(r"\b[A-Za-z_]\w*\b", strip_m(b[4:])):
                    if ident in df.columns and ident not in mcols:
                        mcols.append(ident)
        lo_b = "dyn:" + strip_m(lo_b[4:]) if lo_b.startswith("dyn:") else lo_b
        hi_b = "dyn:" + strip_m(hi_b[4:]) if hi_b.startswith("dyn:") else hi_b
        for c in mcols:
            if not re.fullmatch(r"\w+", c):
                raise ValueError(
                    f"WINDOW JOIN master select items must be plain columns: {c!r}"
                )
        master = df.select(*mcols)
        aggs = {i.out_name: F.expr(to_s(i.expr)) for i in agg_items}
        out = window_join(
            master, slave, ts_col, spec.keys, lo_b, hi_b, aggs,
            master_id=mcols[0],
            include_prevailing=spec.include_prevailing,
        )
        names = [
            (i.alias or strip_m(i.expr).strip()) if i in pass_items else i.out_name
            for i in q.select_items
        ]
        sel = [
            F.col(strip_m(i.expr).strip()).alias(n) if i in pass_items else F.col(n)
            for i, n in zip(q.select_items, names)
        ]
        return out.select(*sel)

    def _lower_horizon_join(self, df: DataFrame, q: QdbQuery, ts_col: str) -> DataFrame:
        """``HORIZON JOIN slave [ON (keys)] RANGE FROM f TO t STEP s AS h`` +
        ``GROUP BY h.offset`` — the markout aggregate form
        (``MarkoutHorizonRecordCursorFactory.java:95``). ``h.offset`` is the
        horizon offset in microseconds."""
        spec = q.horizon_join
        slave_ts = self.designated_ts.get(spec.table, "ts")
        slave = self._table(spec.table, None)
        if slave_ts != ts_col:
            slave = slave.withColumnRenamed(slave_ts, ts_col)
        m_alias = q.table_alias or q.table
        s_alias = spec.alias or spec.table

        def xlate(e: str) -> str:
            e = re.sub(rf"\b{re.escape(spec.range_alias)}\.offset\b", "offset", e)
            e = re.sub(rf"\b{re.escape(s_alias)}\.{re.escape(ts_col)}\b", "slave_ts", e)
            e = re.sub(rf"\b{re.escape(s_alias)}\.", "", e)
            return re.sub(rf"\b{re.escape(m_alias)}\.", "", e)

        agg_items = [i for i in q.select_items if _has_agg(i.expr)]
        aggs = {i.out_name: F.expr(xlate(i.expr)) for i in agg_items}
        extra_keys = [
            xlate(g).strip() for g in q.group_by if xlate(g).strip() != "offset"
        ]
        out = markout_agg(
            df, slave, ts_col, spec.keys, spec.frm, spec.to, spec.step, aggs,
            extra_keys=extra_keys, offset_col="offset",
            offsets_sql=spec.offsets,
        )
        sel = []
        for i in q.select_items:
            if i in agg_items:
                sel.append(F.col(i.out_name))
            else:
                name = i.alias or xlate(i.expr).strip()
                sel.append(F.expr(xlate(i.expr)).alias(name))
        return out.select(*sel)

    def _project(self, df: DataFrame, q: QdbQuery) -> DataFrame:
        items = q.select_items
        # QuestDB groups IMPLICITLY: `SELECT a, sum(b) FROM t` aggregates
        # with a as the key, no GROUP BY clause required
        # (SqlOptimiser implicit group-by model)
        if q.group_by or any(_is_agg_item(i.expr) for i in items):
            aggs = [i for i in items if _is_agg_item(i.expr)]
            keys = [i for i in items if not _is_agg_item(i.expr)]
            return (
                df.groupBy(*[F.expr(k.expr).alias(k.out_name) for k in keys])
                .agg(*[_item_col(a) for a in aggs])
            )
        if len(items) == 1 and items[0].expr == "*":
            return df
        return df.select(*[_item_col(i) for i in items])

    def _lower_sample_by(self, df: DataFrame, q: QdbQuery, ts_col: str) -> DataFrame:
        sb = q.sample_by
        aggs: dict[str, Column] = {}
        keys: list[str] = []
        bucket_name = "ts_bucket"
        for item in q.select_items:
            if _has_agg(item.expr):
                aggs[item.out_name] = F.expr(item.expr)
            elif item.expr.strip() == ts_col:
                bucket_name = item.alias or ts_col
            else:
                kexpr = item.expr.strip()
                kname = item.alias or kexpr
                if kname != kexpr or not re.fullmatch(r"[A-Za-z_]\w*", kexpr):
                    # expression key (`user_id % 3 grp`): materialize it so
                    # the grouped spine carries a plain column
                    df = df.withColumn(kname, F.expr(kexpr))
                keys.append(kname)
        if not aggs:
            # SampleByTest: the reference rejects aggregate-free SAMPLE BY
            raise ValueError(
                "at least one aggregation function must be present in "
                "'select' clause"
            )
        fill = sb.fill
        fill_values: dict | None = None
        if fill is not None and "," in fill:
            # per-column fill list, positional over the aggregate columns
            # (SampleByFillTest: FILL(PREV, 0, NULL); count mismatch is an
            # error, never silent null-padding)
            parts = [p.strip().lower() for p in fill.split(",")]
            if len(parts) != len(aggs):
                raise ValueError(
                    f"not enough fill values: {len(parts)} for {len(aggs)} aggregates"
                )
            fill_values = {}
            fill_modes: dict[str, str] = {}
            for name, p in zip(aggs, parts):
                if p in ("null", "prev", "linear"):
                    fill_modes[name] = p
                elif p == "none":
                    raise ValueError("FILL(NONE) cannot appear in a fill list")
                else:
                    try:
                        fill_values[name] = float(p)
                    except ValueError:
                        raise ValueError(f"unsupported FILL: {p!r}") from None
                    fill_modes[name] = "value"
            fill = fill_modes
        elif fill is not None and fill not in ("none", "null", "prev", "linear"):
            try:
                const = float(fill)
            except ValueError:
                raise ValueError(f"unsupported FILL: {fill!r}")
            fill_values = {name: const for name in aggs}
            fill = "value"
        from ..operators.sample_by import parse_offset

        out = sample_by(
            df,
            ts_col,
            sb.interval,
            aggs,
            keys=keys,
            fill=fill,
            fill_values=fill_values,
            from_ts=sb.from_ts,
            to_ts=sb.to_ts,
            offset_us=parse_offset(sb.offset) if sb.offset else 0,
            tz=sb.tz,
            bucket_name=bucket_name,
            align=sb.align,
        )
        if not q.order_by:
            # QuestDB SAMPLE BY streams in designated-ts order
            # (SampleByFillNoneRecordCursorFactory); a batch engine must sort
            # explicitly — Catalyst folds this into the fill paths' own sort
            out = out.orderBy(bucket_name, *keys)
        return out


def _positional_to_named(s: str, args: dict | list | tuple) -> tuple[str, dict]:
    """``$1 $2 ...`` markers (PG extended protocol,
    ``griffin/engine/functions/bind/IndexedParameterLinkFunction``) →
    named ``:__pN`` markers + the matching args dict.  Dict args pass
    through unchanged.  Matched outside string literals."""
    if isinstance(args, dict):
        return s, dict(args)
    masked = mask_literals(s)
    out: list[str] = []
    last = 0
    for m in re.finditer(r"\$(\d+)", masked):
        n = int(m.group(1))
        if not 1 <= n <= len(args):
            raise ValueError(f"positional bind ${n} out of range (have {len(args)})")
        out.append(s[last : m.start()])
        out.append(f":__p{n}")
        last = m.end()
    out.append(s[last:])
    return "".join(out), {f"__p{i + 1}": v for i, v in enumerate(args)}


def _bind_named_literals(s: str, named: dict) -> str:
    """Render ``:name`` markers as SQL literals (dialect-path binding)."""

    def lit(v) -> str:
        import datetime as _dt

        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "TRUE" if v else "FALSE"
        if isinstance(v, (int, float)):
            return repr(v)
        if isinstance(v, _dt.datetime):
            return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
        return "'" + str(v).replace("'", "''") + "'"

    masked = mask_literals(s)
    out: list[str] = []
    last = 0
    for m in re.finditer(r":(\w+)", masked):
        name = m.group(1)
        if name not in named:
            raise ValueError(f"unbound variable :{name}")
        out.append(s[last : m.start()])
        out.append(lit(named[name]))
        last = m.end()
    out.append(s[last:])
    return "".join(out)


# -- QuestDB function macros ------------------------------------------------
# Aggregates/scalars the reference ships that Spark SQL lacks by name,
# expanded textually into equivalent Spark expressions so a QuestDB user's
# SQL runs verbatim (griffin FunctionFactory parity at the SQL surface):
#   ksum/nsum        KahanSum/NeumaierSum — exact decimal sum (stronger)
#   geomean          GeometricMeanGroupByFunction: exp(avg(ln x))
#   weighted_stddev_rel/freq   AbstractWeightedStdDevGroupByFunction:
#       reliability (Σw − Σw²/Σw) vs frequency (Σw − 1) denominators,
#       null x rows excluded from every moment
#   string_distinct_agg        StringDistinctAggGroupByFunction
#   haversine_dist_deg         HaversineDistDegree (scalar pair form)
# Division guards use nullif: Spark 4 runs ANSI mode, where a bare /0 is
# an error, while the reference returns NULL.


def _wstd(v: str, w: str, denom: str) -> str:
    sw = f"sum(CASE WHEN ({v}) IS NOT NULL THEN CAST(({w}) AS DOUBLE) END)"
    swx = f"sum(CASE WHEN ({v}) IS NOT NULL THEN CAST(({w}) AS DOUBLE) * ({v}) END)"
    swxx = (
        f"sum(CASE WHEN ({v}) IS NOT NULL THEN CAST(({w}) AS DOUBLE) * ({v}) * ({v}) END)"
    )
    sw2 = (
        f"sum(CASE WHEN ({v}) IS NOT NULL THEN CAST(({w}) AS DOUBLE) * ({w}) END)"
    )
    d = {"rel": f"({sw} - {sw2} / {sw})", "freq": f"({sw} - 1)"}[denom]
    return f"sqrt(({swxx} - {swx} * {swx} / {sw}) / nullif({d}, 0.0))"


# QuestDB single-char period units (Micros.getPeriodBetween:764)
_TS_UNITS = {
    "u": "MICROSECOND", "T": "MILLISECOND", "s": "SECOND", "m": "MINUTE",
    "h": "HOUR", "d": "DAY", "w": "WEEK", "M": "MONTH", "y": "YEAR",
}
_UNIT_US = {
    "u": 1, "T": 1_000, "s": 1_000_000, "m": 60_000_000,
    "h": 3_600_000_000, "d": 86_400_000_000, "w": 604_800_000_000,
}


def _unit_arg(a: str) -> str:
    u = a.strip().strip("'\"")
    if u not in _TS_UNITS:
        raise ValueError(f"unknown period unit: {u!r}")
    return u


def _dateadd(a: list[str]) -> str:
    """dateadd('d', n, ts) (TimestampAddFunctionFactory)."""
    return f"timestampadd({_TS_UNITS[_unit_arg(a[0])]}, {a[1]}, {a[2]})"


def _datediff(a: list[str]) -> str:
    """datediff('d', a, b) — ABSOLUTE full-period count
    (TimestampDiffFunctionFactory → Micros.getPeriodBetween: Math.abs)."""
    return f"abs(timestampdiff({_TS_UNITS[_unit_arg(a[0])]}, {a[1]}, {a[2]}))"


def _ts_floor_expr(spec: str, ts: str) -> str:
    # micros are 'U' in the reference's period grammar; 'u' accepted too
    m = re.match(r"^(\d*)\s*([uUTsmhdwMy])$", spec)
    if not m:
        raise ValueError(f"bad timestamp_floor unit: {spec!r}")
    n, u = int(m.group(1) or 1), m.group(2).replace("U", "u")
    if u in ("M", "y"):
        if n != 1:
            raise ValueError("stride calendar floor: use SAMPLE BY")
        return f"date_trunc('{_TS_UNITS[u]}', {ts})"
    period = n * _UNIT_US[u]
    if n == 1 and u in ("s", "m", "h", "d"):
        return f"date_trunc('{_TS_UNITS[u]}', {ts})"
    # epoch-grid floor (weeks anchor on the epoch Thursday, like SAMPLE BY)
    return f"timestamp_micros(unix_micros({ts}) - unix_micros({ts}) % {period})"


def _ts_floor(a: list[str]) -> str:
    """timestamp_floor('5m', ts) (TimestampFloorFunctionFactory — stride
    forms floor on the epoch grid, like SAMPLE BY buckets)."""
    return _ts_floor_expr(a[0].strip().strip("'\""), a[1])


def _ts_ceil(a: list[str]) -> str:
    """timestamp_ceil: floor, then +1 period unless already on the grid."""
    spec = a[0].strip().strip("'\"")
    ts = a[1]
    fl = _ts_floor_expr(spec, ts)
    m = re.match(r"^(\d*)\s*([uUTsmhdwMy])$", spec)
    n, u = int(m.group(1) or 1), m.group(2).replace("U", "u")
    bumped = f"timestampadd({_TS_UNITS[u]}, {n}, {fl})"
    return f"CASE WHEN {fl} = ({ts}) THEN ({ts}) ELSE {bumped} END"


def _arr_finite_sql(a: str) -> str:
    """Finite-elements filter over an ARRAY<DOUBLE> expression (QuestDB
    treats NaN as the array null; aggregations skip it).  The NaN probe
    goes through try_cast so the same macro stays a no-op filter on
    non-numeric arrays (e.g. array_sort over map_keys of a string map)
    instead of raising CAST_INVALID_INPUT."""
    return (
        f"filter({a}, x -> x IS NOT NULL "
        f"AND isnan(try_cast(x AS double)) IS NOT TRUE)"
    )


def _arr_agg_sql(a: str, kind: str) -> str:
    fin = _arr_finite_sql(a)
    total = f"aggregate({fin}, cast(0 as double), (acc, x) -> acc + x)"
    if kind == "sum":
        return total
    if kind == "avg":
        return f"CASE WHEN size({fin}) > 0 THEN {total} / size({fin}) END"
    return f"array_{kind}({fin})"  # min / max over the finite run


def _arr_stddev_sql(a: str, samp: bool) -> str:
    """array_stddev[_samp|_pop] (DoubleArrayStdDev*FunctionFactory):
    two-moment formula over finite elements, NULL below the min count."""
    fin = _arr_finite_sql(a)
    n = f"cast(size({fin}) as double)"
    s = f"aggregate({fin}, cast(0 as double), (acc, x) -> acc + x)"
    sq = f"aggregate({fin}, cast(0 as double), (acc, x) -> acc + x * x)"
    if samp:
        return (
            f"CASE WHEN {n} >= 2 THEN "
            f"sqrt(({sq} - {s} * {s} / {n}) / ({n} - 1)) END"
        )
    return f"CASE WHEN {n} >= 1 THEN sqrt(({sq} - {s} * {s} / {n}) / {n}) END"


def _arr_sort_sql(a: list[str]) -> str:
    """array_sort(arr[, desc[, nulls_first]]) (DoubleArraySort /
    ...Desc / ...Full): finite run sorted, NaNs re-appended (or prepended
    with nulls_first).  The flag arguments must be boolean literals
    (signature D[]tt — constants in the reference too)."""
    flags = [x.strip().lower() for x in a[1:]]
    if not all(f in ("true", "false") for f in flags):
        raise ValueError("array_sort flags must be boolean literals")
    desc = len(flags) > 0 and flags[0] == "true"
    nulls_first = len(flags) > 1 and flags[1] == "true"
    s = f"array_sort({_arr_finite_sql(a[0])})"
    if desc:
        s = f"reverse({s})"
    nans = f"filter({a[0]}, x -> x IS NULL OR isnan(try_cast(x AS double)) IS TRUE)"
    return f"concat({nans}, {s})" if nulls_first else f"concat({s}, {nans})"


def _arr_dim_length_sql(a: str, dim: str) -> str:
    """dim_length(arr, dim) — 1-based literal dim over nested arrays."""
    d = int(dim.strip())
    if d < 1:
        raise ValueError("dim_length dim must be >= 1")
    expr = a
    for _ in range(d - 1):
        expr = f"element_at({expr}, 1)"
    return f"size({expr})"


def _arr_shift_sql(a: list[str]) -> str:
    """shift(arr, distance[, default]) (DoubleArrayShift[DefaultNaN]):
    literal integer distance; default fills the vacated run (NaN without
    a third argument)."""
    k = int(a[1].strip())
    d = a[2] if len(a) > 2 else "cast('NaN' as double)"
    arr = a[0]
    if k == 0:
        return arr
    m = abs(k)
    pad = f"array_repeat(cast({d} as double), {m})"
    if k > 0:
        kept = f"slice({arr}, 1, greatest(size({arr}) - {m}, 0))"
        return f"slice(concat({pad}, {kept}), 1, size({arr}))"
    kept = f"slice({arr}, {m} + 1, greatest(size({arr}) - {m}, 0))"
    return f"slice(concat({kept}, {pad}), 1, size({arr}))"


def _size_pretty_sql(x: str) -> str:
    """size_pretty(bytes) → '1.5 GiB' (SizePrettyFunctionFactory: scale =
    1024^(msb/10), one decimal, B has no 'iB' suffix)."""
    z = f"CAST(floor(log2(greatest(CAST(({x}) AS BIGINT), 1)) / 10) AS INT)"
    val = f"round(CAST(({x}) AS DOUBLE) / power(2, ({z}) * 10), 1)"
    unit = (
        f"element_at(array('B','KiB','MiB','GiB','TiB','PiB','EiB','ZiB'), ({z}) + 1)"
    )
    return f"concat(CAST({val} AS STRING), ' ', {unit})"


def _bar_sql(a: list[str]) -> str:
    """bar(value, min, max, width) → '███▋' (BarFunctionFactory: full
    blocks + one fractional eighth-block; NULL on NaN/invalid bounds)."""
    v, mn, mx, w = (a + ["10"])[:4]
    filled = (
        f"((greatest(({mn}), least(({mx}), ({v}))) - ({mn})) / (({mx}) - ({mn}))"
        f" * ({w}))"
    )
    whole = f"CAST(floor({filled}) AS INT)"
    frac8 = f"CAST(floor(({filled} - floor({filled})) * 8) AS INT)"
    return (
        f"CASE WHEN ({v}) IS NULL OR isnan(CAST(({v}) AS DOUBLE)) "
        f"OR ({mn}) IS NULL OR ({mx}) IS NULL OR ({w}) <= 0 OR ({mn}) >= ({mx}) "
        f"THEN NULL ELSE concat(repeat('█', {whole}), "
        f"CASE WHEN {whole} < ({w}) AND {frac8} > 0 "
        f"THEN substring('▏▎▍▌▋▊▉█', {frac8}, 1) ELSE '' END) END"
    )


def _compensated_sum(a: list[str]) -> str:
    x = a[0]
    exact = f"CAST(try_sum(try_cast(({x}) AS DECIMAL(38,12))) AS DOUBLE)"
    plain = f"CAST(sum({x}) AS DOUBLE)"
    return (
        f"COALESCE(CASE WHEN max(abs(CAST(({x}) AS DOUBLE))) < 1e25 "
        f"THEN {exact} ELSE {plain} END, {plain})"
    )


_FN_MACROS: dict = {
    "dateadd": _dateadd,
    "datediff": _datediff,
    "timestamp_floor": _ts_floor,
    "timestamp_ceil": _ts_ceil,
    "to_timezone": lambda a: f"from_utc_timestamp({a[0]}, {a[1]})",
    "to_utc": lambda a: f"to_utc_timestamp({a[0]}, {a[1]})",
    "systimestamp": lambda a: "current_timestamp()",
    "sysdate": lambda a: "current_timestamp()",
    # row-indexed timestamp generator (TimestampSequenceFunctionFactory):
    # deterministic over long_sequence's x column — row i gets
    # start + (i-1)*step_us, the reference's fixture idiom
    "timestamp_sequence": lambda a: (
        f"timestamp_micros(unix_micros(CAST({a[0]} AS TIMESTAMP))"
        f" + (x - 1) * CAST({a[1]} AS BIGINT))"
    ),
    # Kahan/Neumaier compensated sums (KSumDoubleGroupByFunction /
    # NSumDoubleGroupByFunction): lowered to exact fixed-point summation —
    # DECIMAL(38,12) holds 1e-12 increments drift-free up to ±1e25, which
    # covers the compensation's purpose (tiny-increment fidelity) without a
    # custom UDAF. Outside that domain (an element ≥1e25, or the total
    # overflowing 38 digits → try_sum null) the expression falls back to
    # plain double summation.
    "ksum": _compensated_sum,
    "nsum": _compensated_sum,
    "geomean": lambda a: f"exp(avg(ln({a[0]})))",
    # ApproxMedianDouble/LongGroupByFunctionFactory: t-digest median =
    # approx_percentile at q=0.5 (optional precision arg accepted/ignored —
    # Spark's accuracy knob has different units)
    "approx_median": lambda a: f"approx_percentile({a[0]}, 0.5)",
    "weighted_stddev_rel": lambda a: _wstd(a[0], a[1], "rel"),
    "weighted_stddev_freq": lambda a: _wstd(a[0], a[1], "freq"),
    "string_distinct_agg": lambda a: (
        f"array_join(array_sort(collect_set({a[0]})), {a[1] if len(a) > 1 else chr(39) + ',' + chr(39)})"
    ),
    # bare 2-arg json_extract (JsonExtractVarcharFunctionFactory) — the
    # typed ::T form is rewritten earlier by _rewrite_json_extract_typed
    "json_extract": lambda a: f"get_json_object({a[0]}, {a[1]})",
    # array/ family (griffin/engine/functions/array/, 49 factories) as SQL
    # macros over Spark ARRAY<DOUBLE> higher-order functions. QuestDB DOUBLE
    # arrays use NaN as null — every aggregation skips non-finite elements
    # (AbstractDoubleArrayElemFunction), hence the filter() prelude.
    "array_sum": lambda a: _arr_agg_sql(a[0], "sum"),
    "array_avg": lambda a: _arr_agg_sql(a[0], "avg"),
    "array_min": lambda a: _arr_agg_sql(a[0], "min"),
    "array_max": lambda a: _arr_agg_sql(a[0], "max"),
    "array_count": lambda a: f"size({_arr_finite_sql(a[0])})",
    "array_stddev": lambda a: _arr_stddev_sql(a[0], samp=True),
    "array_stddev_samp": lambda a: _arr_stddev_sql(a[0], samp=True),
    "array_stddev_pop": lambda a: _arr_stddev_sql(a[0], samp=False),
    "array_sort": lambda a: _arr_sort_sql(a),
    "array_reverse": lambda a: f"reverse({a[0]})",
    "array_position": lambda a: f"nullif(array_position({a[0]}, {a[1]}), 0)",
    "array_cum_sum": lambda a: (
        f"transform(sequence(1, size({a[0]})), i -> "
        f"aggregate(slice({a[0]}, 1, i), cast(0 as double), (acc, x) -> acc + x))"
    ),
    "insertion_point": lambda a: (
        f"(size(filter({a[0]}, x -> x "
        + ("<=" if len(a) > 2 and a[2].strip().lower() == "true" else "<")
        + f" {a[1]})) + 1)"
    ),
    "dot_product": lambda a: (
        f"aggregate(zip_with({a[0]}, {a[1]}, (x, y) -> x * y), "
        "cast(0 as double), (acc, v) -> acc + v)"
    ),
    # flatten() deliberately NOT a macro: Spark's native flatten matches
    # the reference's, and an identity expansion would re-consume its span
    # every fixpoint pass, shadowing macro calls nested in its argument
    "dim_length": lambda a: _arr_dim_length_sql(a[0], a[1]),
    "shift": lambda a: _arr_shift_sql(a),
    # str/ long tail (SizePrettyFunctionFactory, QuoteIdentFunctionFactory,
    # BarFunctionFactory, ToLowercase/ToUppercase aliases)
    "size_pretty": lambda a: _size_pretty_sql(a[0]),
    "quote_ident": lambda a: (
        f"CASE WHEN ({a[0]}) RLIKE '^[a-zA-Z_][a-zA-Z0-9_$]*$' THEN ({a[0]}) "
        f"ELSE concat('\"', replace(({a[0]}), '\"', '\"\"'), '\"') END"
    ),
    "bar": lambda a: _bar_sql(a),
    "to_lowercase": lambda a: f"lower({a[0]})",
    "to_uppercase": lambda a: f"upper({a[0]})",
    "haversine_dist_deg": lambda a: (
        f"2 * 6371.0 * asin(sqrt(pow(sin(radians(({a[2]}) - ({a[0]})) / 2), 2)"
        f" + cos(radians({a[0]})) * cos(radians({a[2]}))"
        f" * pow(sin(radians(({a[3]}) - ({a[1]})) / 2), 2)))"
    ),
    # geo/ predicates + distance (GeoDistanceMetersFunctionFactory:
    # equirectangular, 111320 m/deg, midpoint-latitude cos;
    # WithinBox/WithinRadius/GeoWithinRadiusLatLon: inclusive bounds,
    # NaN/inverted-box → false)
    "geo_distance_meters": lambda a: (
        f"sqrt(pow((({a[3]}) - ({a[1]})) * 111320.0"
        f" * cos(radians((({a[0]}) + ({a[2]})) * 0.5)), 2)"
        f" + pow((({a[2]}) - ({a[0]})) * 111320.0, 2))"
    ),
    "within_box": lambda a: (
        f"(({a[2]}) <= ({a[4]}) AND ({a[3]}) <= ({a[5]})"
        f" AND ({a[0]}) BETWEEN ({a[2]}) AND ({a[4]})"
        f" AND ({a[1]}) BETWEEN ({a[3]}) AND ({a[5]}))"
    ),
    "within_radius": lambda a: (
        f"(pow(({a[0]}) - ({a[2]}), 2) + pow(({a[1]}) - ({a[3]}), 2)"
        f" <= pow({a[4]}, 2))"
    ),
    "geo_within_radius_latlon": lambda a: (
        f"(pow((({a[1]}) - ({a[3]})) * 111320.0 * cos(radians({a[2]})), 2)"
        f" + pow((({a[0]}) - ({a[2]})) * 111320.0, 2) <= pow({a[4]}, 2))"
    ),
    # within(geohash, prefix...) (bool/WithinGeohashFunctionFactory):
    # geohashes here are base32 strings (functions/geohash.py), so the
    # prefix-containment test is startswith over any of the prefixes
    "within": lambda a: (
        "(" + " OR ".join(f"startswith({a[0]}, {p})" for p in a[1:]) + ")"
        if len(a) >= 2
        else (_ for _ in ()).throw(ValueError("within(geohash, prefix...)"))
    ),
    # make_geohash(lon, lat, bits) (geohash/GeoHashFromCoordinates):
    # bits must be a multiple of 5 here (string geohash granularity)
    "make_geohash": lambda a: _make_geohash_sql(a),
    # date/ helpers (IsLeapYearFunctionFactory, DaysPerMonthFunctionFactory)
    "is_leap_year": lambda a: (
        f"(year({a[0]}) % 4 = 0 AND (year({a[0]}) % 100 != 0"
        f" OR year({a[0]}) % 400 = 0))"
    ),
    "days_in_month": lambda a: f"day(last_day({a[0]}))",
    # encoding/hash (Base64FunctionFactory base64(Ui) — second arg caps the
    # encoded byte count; Sha1/Sha256/Md5 bin families).  These expand to
    # calls of the SAME Spark built-in name, so the expansion raises (=
    # leave untouched) once the arg is already the canonical CAST form —
    # otherwise the fixpoint loop would re-wrap the cast each pass.
    "base64": lambda a: (
        f"base64({_bin_arg(a[0])})"
        if len(a) < 2
        else f"base64(substring({_bin_arg(a[0])}, 1, {a[1]}))"
    ),
    "base64_decode": lambda a: f"unbase64({a[0]})",
    "sha1": lambda a: f"sha1({_bin_arg(a[0])})",
    "sha256": lambda a: f"sha2({_bin_arg(a[0])}, 256)",
    # interval type surface (IntervalFunctionFactory interval(NN),
    # IntervalStart/IntervalEnd Δ accessors): lowered to a 2-field struct;
    # the (lo, hi) bounds are INCLUSIVE micros, and the string-literal form
    # accepts the same interval grammar as `ts IN '...'`
    "interval": lambda a: _interval_struct(a),
    "interval_start": lambda a: _interval_bound(a[0], "lo"),
    "interval_end": lambda a: _interval_bound(a[0], "hi"),
    # finance scalar trio (FinanceUtils.mid/spread,
    # WeightedMidPriceFunctionFactory wmid(bidSize, bid, ask, askSize))
    "mid": lambda a: f"((({a[0]}) + ({a[1]})) / 2.0)",
    "spread": lambda a: f"(({a[1]}) - ({a[0]}))",
    "wmid": lambda a: (
        f"(({a[2]}) * (({a[0]}) / (({a[0]}) + ({a[3]})))"
        f" + ({a[1]}) * (1 - (({a[0]}) / (({a[0]}) + ({a[3]})))))"
    ),
    # date/ helpers batch 2 (DayOfWeek Mon=1 / SundayFirst Sun=1,
    # IsEndOfMonth, MillisOfSecond millis(N), MicrosOfMills micros(N))
    "day_of_week": lambda a: f"(((dayofweek({a[0]}) + 5) % 7) + 1)",
    "day_of_week_sunday_first": lambda a: f"dayofweek({a[0]})",
    "is_end_of_month": lambda a: f"(day({a[0]}) = day(last_day({a[0]})))",
    # floor-mod (pmod), not Spark's sign-following %: the reference's
    # Micros.getMillisOfSecond/getMicrosOfMilli return 0-999 for pre-1970
    # timestamps too (e.g. 1969-12-31 23:59:59.999999 → millis 999,
    # micros 999); floor division likewise for the millis digit pair
    "millis": lambda a: (
        f"CAST(pmod((unix_micros({a[0]}) - pmod(unix_micros({a[0]}), 1000))"
        f" DIV 1000, 1000) AS INT)"
    ),
    "micros": lambda a: f"CAST(pmod(unix_micros({a[0]}), 1000) AS INT)",
    # nanos(N) is defined over TIMESTAMP_NANO values — here the int64
    # nano shadow column (functions/nanos.py); a micro TIMESTAMP arg
    # fails type-checking rather than silently returning 0
    "nanos": lambda a: f"CAST(pmod(({a[0]}), 1000) AS INT)",
    # position(str, substr) (PositionFunctionFactory — 1-based, 0 = absent;
    # Spark's locate takes (substr, str))
    "position": lambda a: f"locate({a[1]}, {a[0]})",
    # to_uuid(lo, hi) / to_long256(l0..l3): canonical lowercase-hex forms
    # (LongsToUuid/LongsToLong256FunctionFactory; uuid256.py conventions)
    "to_uuid": lambda a: _to_uuid_sql(a),
    "to_long256": lambda a: _to_long256_sql(a),
}


def _hex16(x: str) -> str:
    return f"lpad(lower(hex({x})), 16, '0')"


def _to_uuid_sql(a: list[str]) -> str:
    if len(a) != 2:
        raise ValueError("to_uuid(lo, hi)")
    h = f"concat({_hex16(a[1])}, {_hex16(a[0])})"
    return (
        f"concat_ws('-', substring({h}, 1, 8), substring({h}, 9, 4), "
        f"substring({h}, 13, 4), substring({h}, 17, 4), substring({h}, 21, 12))"
    )


def _to_long256_sql(a: list[str]) -> str:
    if len(a) != 4:
        raise ValueError("to_long256(l0, l1, l2, l3)")
    return "concat(" + ", ".join(_hex16(x) for x in reversed(a)) + ")"


def _make_geohash_sql(a: list[str]) -> str:
    """SQL-text twin of functions/geohash.geohash_encode (same classic
    bit-interleave, unrolled at expansion time)."""
    from ..functions.geohash import _B32

    if len(a) != 3:
        raise ValueError("make_geohash(lon, lat, bits)")
    bits = int(a[2])
    if bits % 5 or not 0 < bits <= 60:
        raise ValueError("bits must be a multiple of 5 in 5..60")
    lonn = f"((({a[0]}) + 180.0) / 360.0)"
    latn = f"((({a[1]}) + 90.0) / 180.0)"
    bit_exprs: list[str] = []
    lon_k = lat_k = 0
    for i in range(bits):
        if i % 2 == 0:
            lon_k += 1
            bit_exprs.append(f"(CAST(floor({lonn} * {2 ** lon_k}) AS BIGINT) % 2)")
        else:
            lat_k += 1
            bit_exprs.append(f"(CAST(floor({latn} * {2 ** lat_k}) AS BIGINT) % 2)")
    chars = []
    for c in range(bits // 5):
        group = bit_exprs[c * 5 : (c + 1) * 5]
        val = " + ".join(f"{b} * {2 ** (4 - j)}" for j, b in enumerate(group))
        chars.append(f"substring('{_B32}', CAST({val} AS INT) + 1, 1)")
    return "concat(" + ", ".join(chars) + ")"


def _interval_struct(a: list[str]) -> str:
    if len(a) != 2:
        raise ValueError("interval() takes (lo, hi)")  # leave INTERVAL literals alone
    return (
        f"named_struct('lo', CAST({a[0]} AS TIMESTAMP), "
        f"'hi', CAST({a[1]} AS TIMESTAMP))"
    )


def _interval_bound(arg: str, field: str) -> str:
    from datetime import timedelta

    from ..operators.intervals import parse_interval_ranges

    s = arg.strip()
    if s.startswith("'") and s.endswith("'"):
        ranges = parse_interval_ranges(s[1:-1])
        lo, hi = ranges[0][0], ranges[-1][1]
        # parse yields half-open [lo, hi); the reference's interval end is
        # the last included microsecond
        val = lo if field == "lo" else hi - timedelta(microseconds=1)
        return f"TIMESTAMP '{val.isoformat(sep=' ')}'"
    return f"({arg}).{field}"


def _bin_arg(arg: str) -> str:
    s = arg.strip()
    if s.upper().startswith("CAST(") and s.upper().rstrip(")").endswith("AS BINARY"):
        raise ValueError("already expanded")
    return f"CAST({arg} AS BINARY)"

# rnd_* generators callable from SQL over long_sequence's x column
# (functions/rnd/): deterministic mixes of the row index — the documented
# divergence from the reference's RNG (sources/generators.py), which makes
# fixture SQL reproducible AND oracle-checkable. Each call site gets its
# own tag so two rnd_double() in one statement draw independently.


def _rnd_sql(tag: int) -> str:
    from ..sources.generators import mix_sql

    # stride x by a distinct odd constant per call site: a purely additive
    # tag keeps two draws linearly related (their difference is constant,
    # so small-modulus projections correlate); a per-site multiplier walks
    # the hash space at a different stride
    return mix_sql(f"(x * {2 * tag + 1})", 0, tag)


def _rnd_nullify(expr: str, rate: str, tag: int) -> str:
    r = int(rate)
    if r <= 0:
        return expr
    return f"CASE WHEN ({_rnd_sql(tag + 1)}) % {r} = 0 THEN NULL ELSE {expr} END"


_RND_MACROS: dict = {
    "rnd_double": lambda a, t: (
        f"({_rnd_sql(t)}) % 1000000 / 1000000.0"
        if not a or not a[0].strip()
        else _rnd_nullify(f"({_rnd_sql(t)}) % 1000000 / 1000000.0", a[0], t)
    ),
    "rnd_boolean": lambda a, t: f"({_rnd_sql(t)}) % 2 = 0",
    "rnd_int": lambda a, t: _rnd_nullify(
        f"CAST(({_rnd_sql(t)}) % ({int(a[1]) - int(a[0]) + 1}) + ({int(a[0])}) AS INT)",
        a[2] if len(a) > 2 else "0",
        t,
    ),
    "rnd_long": lambda a, t: _rnd_nullify(
        f"CAST(({_rnd_sql(t)}) % ({int(a[1]) - int(a[0]) + 1}) + ({int(a[0])}) AS BIGINT)",
        a[2] if len(a) > 2 else "0",
        t,
    ),
    "rnd_symbol": lambda a, t: (
        f"element_at(array({', '.join(a)}), "
        f"CAST(({_rnd_sql(t)}) % {len(a)} + 1 AS INT))"
    ),
    # --- SQL-callable completion of the rnd_* factory inventory
    # (functions/rnd/, 47 factories): the same deterministic-mix formulas
    # as sources/generators.py, so fixture SQL stays oracle-checkable ---
    "rnd_char": lambda a, t: f"char(({_rnd_sql(t)}) % 26 + 65)",
    "rnd_byte": lambda a, t: (
        f"CAST(({_rnd_sql(t)}) % 128 AS TINYINT)"
        if not a or not a[0].strip()
        else f"CAST(({_rnd_sql(t)}) % ({int(a[1]) - int(a[0]) + 1}) + ({int(a[0])}) AS TINYINT)"
    ),
    "rnd_short": lambda a, t: (
        f"CAST(({_rnd_sql(t)}) % 32768 AS SMALLINT)"
        if not a or not a[0].strip()
        else f"CAST(({_rnd_sql(t)}) % ({int(a[1]) - int(a[0]) + 1}) + ({int(a[0])}) AS SMALLINT)"
    ),
    "rnd_float": lambda a, t: f"CAST(({_rnd_sql(t)}) % 1000000 / 1000000.0 AS FLOAT)",
    "rnd_str": lambda a, t: _rnd_str_sql(a, t),
    "rnd_varchar": lambda a, t: _rnd_str_sql(a, t + 17),
    "rnd_uuid4": lambda a, t: (
        "concat_ws('-', substring(__h,1,8), substring(__h,9,4), "
        "concat('4', substring(__h,14,3)), concat('8', substring(__h,18,3)), "
        "substring(__h,21,12))".replace(
            "__h", f"md5(CAST(({_rnd_sql(t)}) AS STRING))"
        )
    ),
    "rnd_ipv4": lambda a, t: (
        f"concat_ws('.', CAST(({_rnd_sql(t)}) % 256 AS STRING), "
        f"CAST(CAST(floor(({_rnd_sql(t)}) / 256) AS BIGINT) % 256 AS STRING), "
        f"CAST(CAST(floor(({_rnd_sql(t)}) / 65536) AS BIGINT) % 256 AS STRING), "
        f"CAST(CAST(floor(({_rnd_sql(t)}) / 16777216) AS BIGINT) % 128 + 1 AS STRING))"
    ),
    "rnd_geohash": lambda a, t: _rnd_geohash_sql(a, t),
    "rnd_bin": lambda a, t: _rnd_bin_sql(a, t),
    "rnd_long256": lambda a, t: (
        f"concat('0x', md5(CAST(({_rnd_sql(t)}) AS STRING)), "
        f"md5(CAST(({_rnd_sql(t + 1)}) AS STRING)))"
    ),
    "rnd_log": lambda a, t: (
        f"-({float(a[0]) if a and a[0].strip() else 1.0}) * "
        f"ln((({_rnd_sql(t)}) % 1000000 + 1) / 1000000.0)"
    ),
    "rnd_date": lambda a, t: (
        f"date_add(CAST({a[0]} AS DATE), CAST(({_rnd_sql(t)}) % "
        f"(datediff(CAST({a[1]} AS DATE), CAST({a[0]} AS DATE)) + 1) AS INT))"
    ),
    "rnd_timestamp": lambda a, t: (
        f"timestamp_micros(unix_micros(CAST({a[0]} AS TIMESTAMP)) + "
        f"(({_rnd_sql(t)}) % CAST((unix_micros(CAST({a[1]} AS TIMESTAMP)) - "
        f"unix_micros(CAST({a[0]} AS TIMESTAMP))) / 1000000 AS BIGINT)) * 1000000)"
    ),
    # timestamp_shuffle(lo, hi) (TimestampShuffleFunctionFactory): uniform
    # micro draw in [lo, hi) — same deterministic row-index mix as rnd_*
    "timestamp_shuffle": lambda a, t: (
        f"timestamp_micros(unix_micros(CAST({a[0]} AS TIMESTAMP)) + "
        f"({_rnd_sql(t)}) % (unix_micros(CAST({a[1]} AS TIMESTAMP)) - "
        f"unix_micros(CAST({a[0]} AS TIMESTAMP))))"
    ),
}

# round-8 function-surface completion (see macros_ext module docstring):
# every remaining SQL name the reference's FunctionFactory inventory
# registers that had no dialect spelling yet
from .macros_ext import EXT_FN_MACROS as _EXT_FN  # noqa: E402
from .macros_ext import EXT_RND_MACROS as _EXT_RND  # noqa: E402

_FN_MACROS.update(_EXT_FN)
_FN_MACROS["weighted_stddev"] = lambda a: _wstd(a[0], a[1], "rel")
_RND_MACROS.update(_EXT_RND)


def _rnd_str_sql(a: list[str], t: int) -> str:
    lo = int(a[0]) if a and a[0].strip() else 4
    hi = int(a[1]) if len(a) > 1 else lo + 4
    ln = f"CAST(({_rnd_sql(t)}) % ({hi - lo + 1}) + {lo} AS INT)"
    s = f"substring(md5(CAST(({_rnd_sql(t + 1)}) AS STRING)), 1, {ln})"
    rate = int(a[2]) if len(a) > 2 and a[2].strip() else 0
    if rate > 0:
        return f"CASE WHEN ({_rnd_sql(t + 2)}) % {rate} = 0 THEN NULL ELSE {s} END"
    return s


def _rnd_geohash_sql(a: list[str], t: int) -> str:
    bits = int(a[0]) if a and a[0].strip() else 30
    if not 1 <= bits <= 60:
        raise ValueError("rnd_geohash bits must be 1..60 (GEOLONG max)")
    chars = max(1, bits // 5)
    parts = [
        f"substring('0123456789bcdefghjkmnpqrstuvwxyz', "
        f"CAST(({_rnd_sql(t + i)}) % 32 + 1 AS INT), 1)"
        for i in range(chars)
    ]
    return f"concat({', '.join(parts)})"


def _rnd_bin_sql(a: list[str], t: int) -> str:
    lo = int(a[0]) if a and a[0].strip() else 16
    hi = int(a[1]) if len(a) > 1 else lo
    ln = f"CAST(({_rnd_sql(t)}) % ({hi - lo + 1}) + {lo} AS INT)"
    reps = (hi * 2 + 31) // 32 + 1
    return (
        f"unhex(substring(repeat(md5(CAST(({_rnd_sql(t + 1)}) AS STRING)), "
        f"{reps}), 1, ({ln}) * 2))"
    )

_FN_MACRO_RE = re.compile(
    r"\b(" + "|".join([*_FN_MACROS, *_RND_MACROS]) + r")\s*\(", re.IGNORECASE
)


_ARRAY_LIT_RE = re.compile(r"\barray\s*\[", re.IGNORECASE)


def _rewrite_array_literals(s: str) -> str:
    """``ARRAY[a, b, ...]`` constructor syntax (the reference's array
    literal form, SqlParser/cairo/arr) → Spark ``array(a, b, ...)``.
    Bracket matching runs on the literal-masked text; nested constructors
    resolve across loop iterations (the inner ``ARRAY[`` is found again
    on the rescan)."""
    for _ in range(64):
        masked = mask_literals(s)
        m = _ARRAY_LIT_RE.search(masked)
        if not m:
            return s
        depth = 0
        close = -1
        for k in range(m.end() - 1, len(masked)):
            if masked[k] == "[":
                depth += 1
            elif masked[k] == "]":
                depth -= 1
                if depth == 0:
                    close = k
                    break
        if close < 0:
            raise ValueError(f"unbalanced ARRAY[ literal in {s!r}")
        s = s[: m.start()] + "array(" + s[m.end() : close] + ")" + s[close + 1 :]
    return s


_WINDOW_EMA_RE = re.compile(r"\b(ema|vwema|ksum|nsum)\s*\(", re.IGNORECASE)


def _ema_alpha(kind: str, param: str) -> str:
    """Resolve the (kind, param) pair of the reference's window EMA
    (EmaDoubleWindowFunctionFactory: MODE_ALPHA / MODE_PERIOD — alpha =
    2/(period+1); MODE_TIME_WEIGHTED needs per-row timestamps and stays
    on the column API)."""
    k = kind.strip().strip("'\"").lower()
    p = float(param)
    if not p > 0:
        raise ValueError("parameter value must be a positive number")
    if k == "alpha":
        if p > 1:
            raise ValueError("alpha must be between 0 (exclusive) and 1 (inclusive)")
        return repr(p)
    if k == "period":
        return repr(2.0 / (p + 1.0))
    raise ValueError(
        "time-weighted EMA ('s'/'m'/... kinds) is not expressible as a "
        "prefix fold; use the column API (functions.finance.ema)"
    )


def _ema_fold(vals: str, alpha: str) -> str:
    """Running EMA over a collected ordered prefix (y = a*x + (1-a)*y_prev,
    first finite value seeds; NaN observations carry the previous value —
    EmaDoubleWindowFunctionFactory.java:343)."""
    return (
        f"aggregate({vals}, CAST(NULL AS DOUBLE), (acc, v) -> "
        f"CASE WHEN v IS NULL OR isnan(v) THEN acc "
        f"WHEN acc IS NULL OR isnan(acc) THEN v "
        f"ELSE {alpha} * v + (1 - {alpha}) * acc END)"
    )


def _rewrite_window_ema(s: str) -> str:
    """QuestDB-only WINDOW functions in OVER position — ``ema``/``vwema``
    (recurrences: prefix-fold over ``collect_list(...) OVER``; the
    reference pins the default frame, so the emitted frame is
    ROWS UNBOUNDED PRECEDING .. CURRENT ROW) and ``ksum``/``nsum``
    (compensated running sums → exact DECIMAL(38,12) window sums, the
    same lowering as their aggregate forms).  Runs BEFORE macro
    expansion: the aggregate-context ksum macro text is not a window
    function.  The fold is O(prefix) per row — bounded partitions; the
    Arrow column API (functions/finance.ema) is the unbounded-scale
    route."""
    for _ in range(16):
        masked = mask_literals(s)
        changed = False
        for m in _WINDOW_EMA_RE.finditer(masked):
            close = _balanced_close(masked, m.end() - 1)
            if close < 0:
                continue
            mo = re.match(r"\s+OVER\s*\(", masked[close + 1 :], re.IGNORECASE)
            if mo is None:
                continue
            oopen = close + 1 + mo.end() - 1
            oclose = _balanced_close(masked, oopen)
            if oclose < 0:
                continue
            name = m.group(1).lower()
            args = split_top_level(s[m.end() : close], ",")
            over = s[oopen + 1 : oclose].strip()
            if re.search(r"\bROWS\b|\bRANGE\b|\bGROUPS\b", over, re.IGNORECASE):
                raise ValueError(
                    f"{name}() does not support framing; remove ROWS/RANGE clause"
                )
            frame = f"{over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
            if name in ("ksum", "nsum"):
                expr = (
                    f"CAST(sum(CAST({args[0]} AS DECIMAL(38,12))) "
                    f"OVER ({over}) AS DOUBLE)"
                )
            elif name == "ema":
                if len(args) == 2:
                    alpha = _ema_alpha("'alpha'", args[1])
                elif len(args) == 3:
                    alpha = _ema_alpha(args[1], args[2])
                else:
                    raise ValueError("ema(value, kind, param) OVER (...)")
                vals = f"collect_list(CAST({args[0]} AS DOUBLE)) OVER ({frame})"
                expr = _ema_fold(vals, alpha)
            else:  # vwema(value, kind, param, weight) — ema(v*w)/ema(w)
                if len(args) != 4:
                    raise ValueError("vwema(value, kind, param, weight) OVER (...)")
                alpha = _ema_alpha(args[1], args[2])
                num = f"collect_list(CAST(({args[0]}) * ({args[3]}) AS DOUBLE)) OVER ({frame})"
                den = f"collect_list(CAST({args[3]} AS DOUBLE)) OVER ({frame})"
                expr = f"({_ema_fold(num, alpha)} / {_ema_fold(den, alpha)})"
            s = s[: m.start()] + "(" + expr + ")" + s[oclose + 1 :]
            changed = True
            break
        if not changed:
            return s
    return s


_RANGE_UNIT_SPARK = {
    "nanosecond": None,  # sub-micro: folded to MICROSECOND below
    "microsecond": "MICROSECOND",
    "millisecond": "MILLISECOND",
    "second": "SECOND",
    "minute": "MINUTE",
    "hour": "HOUR",
    "day": "DAY",
}

_RANGE_BOUND_RE = re.compile(
    r"(?<![\w.'])(?:'(\d+)'|(\d+))"
    r"(?:\s+(nanoseconds?|microseconds?|milliseconds?|seconds?|minutes?"
    r"|hours?|days?))?"
    r"\s+(PRECEDING|FOLLOWING)\b",
    re.IGNORECASE,
)


def _window_spans(masked: str) -> list[tuple[int, int]]:
    """Parenthesized spans of every window specification: ``OVER (...)``
    clauses plus named-window definitions of the SQL-standard WINDOW
    clause (``WINDOW w AS (...), v AS (...)`` — the form
    ``WindowExcludeCurrentRowTest.java`` drives EXCLUDE through).
    WINDOW JOIN never matches: its keyword is followed by JOIN, not
    ``<ident> AS (``."""
    spans: set[tuple[int, int]] = set()
    for m in re.finditer(r"\bOVER\s*\(", masked, re.IGNORECASE):
        o = m.end() - 1
        c = _balanced_close(masked, o)
        if c > 0:
            spans.add((o, c))
    for m in re.finditer(r"\bWINDOW\s+\w+\s+AS\s*\(", masked, re.IGNORECASE):
        pos = m.end() - 1
        while True:
            c = _balanced_close(masked, pos)
            if c < 0:
                break
            spans.add((pos, c))
            nxt = re.match(r"\s*,\s*\w+\s+AS\s*\(", masked[c + 1 :], re.IGNORECASE)
            if not nxt:
                break
            pos = c + nxt.end()
    return sorted(spans)


def _edit_window_spans(s: str, edit) -> str:
    """Apply ``edit(body, masked_body) -> str | None`` to the interior of
    each window-spec span of ``s``; None or an identical body leaves the
    span unchanged."""
    masked = mask_literals(s)
    out: list[str] = []
    last = 0
    changed = False
    for o, c in _window_spans(masked):
        if o < last:
            continue
        new_body = edit(s[o + 1 : c], masked[o + 1 : c])
        if new_body is None or new_body == s[o + 1 : c]:
            continue
        changed = True
        out.append(s[last : o + 1])
        out.append(new_body)
        last = c
    if not changed:
        return s
    out.append(s[last:])
    return "".join(out)


def _unit_bound_to_interval(bm: re.Match) -> str:
    qv, bv, unit, kind = bm.groups()
    if unit is None:
        if qv is None:
            return bm.group(0)  # bare numeric range — Spark native
        n, u = int(qv), "MICROSECOND"
    else:
        u = _RANGE_UNIT_SPARK[unit.lower().rstrip("s")]
        n = int(qv if qv is not None else bv)
        if u is None:
            if n % 1000:
                raise ValueError(
                    "nanosecond RANGE bounds must be whole "
                    "microseconds on TIMESTAMP columns"
                )
            n, u = n // 1000, "MICROSECOND"
    return f"INTERVAL '{n}' {u} {kind.upper()}"


def _rewrite_range_frame_units(s: str) -> str:
    """QuestDB time-unit RANGE frame bounds in window specifications
    (``SqlParser.parseTimeUnit``/``ExpressionParser`` accept
    nanosecond..day after the bound expression; unitless QUOTED bounds
    over the designated timestamp are in the timestamp's native
    resolution, i.e. microseconds — ``WindowFunctionTest.java``
    ``RANGE BETWEEN '7' PRECEDING``, ``150 MICROSECOND PRECEDING``,
    ``'1' HOUR PRECEDING`` forms).  Spark wants calendar-interval
    literals for range frames over a timestamp ordering, so
    ``<v> <unit> PRECEDING`` → ``INTERVAL '<v>' <UNIT> PRECEDING``.
    Nanoseconds fold to microseconds when divisible by 1000 (our
    TIMESTAMP is micro-resolution like the reference's classic type);
    otherwise they are rejected.  Bare unquoted numbers WITHOUT a unit
    are left alone — that is Spark's numeric range frame over a numeric
    ordering, which both engines share.  Applies to OVER(...) spans and
    named WINDOW definitions; WINDOW JOIN's RANGE clause has its own
    parser."""

    def edit(body: str, mbody: str) -> str | None:
        rm = re.search(r"\bRANGE\b", mbody, re.IGNORECASE)
        if rm is None:
            return None
        # frame region: RANGE .. (EXCLUDE | end); EXCLUDE options carry
        # no numeric bounds, but don't touch them anyway
        em = re.search(r"\bEXCLUDE\b", mbody[rm.end() :], re.IGNORECASE)
        rend = rm.end() + (em.start() if em else len(mbody) - rm.end())
        frame = body[rm.end() : rend]
        new_frame = _RANGE_BOUND_RE.sub(_unit_bound_to_interval, frame)
        new_frame = _unify_interval_bounds(new_frame)
        if new_frame == frame:
            return None
        return body[: rm.end()] + new_frame + body[rend:]

    return _edit_window_spans(s, edit)


_INTERVAL_BOUND_RE = re.compile(
    r"INTERVAL\s+'(\d+)'\s+(MICROSECOND|MILLISECOND|SECOND|MINUTE|HOUR|DAY)",
    re.IGNORECASE,
)
_UNIT_MICROS = {
    "MICROSECOND": 1,
    "MILLISECOND": 1_000,
    "SECOND": 1_000_000,
    "MINUTE": 60_000_000,
    "HOUR": 3_600_000_000,
    "DAY": 86_400_000_000,
}


def _unify_interval_bounds(frame: str) -> str:
    """Spark types each day-time interval literal by its unit field and
    rejects RANGE frames whose two bounds differ
    (DATATYPE_MISMATCH.SPECIFIED_WINDOW_FRAME_DIFF_TYPES: ``INTERVAL
    HOUR <> INTERVAL SECOND``).  QuestDB has no such restriction —
    ``'2' HOUR PRECEDING AND '30' MINUTE PRECEDING`` is legal, and the
    EXCLUDE lowering mixes a user unit with the microsecond tick.  When
    a frame carries two interval bounds of different units, express
    both as fractional SECOND literals (exact integer arithmetic; no
    precision loss below the day scale)."""
    bounds = list(_INTERVAL_BOUND_RE.finditer(frame))
    if len(bounds) < 2 or len({m.group(2).upper() for m in bounds}) == 1:
        return frame

    def to_seconds(m: re.Match) -> str:
        micros = int(m.group(1)) * _UNIT_MICROS[m.group(2).upper()]
        secs, rem = divmod(micros, 1_000_000)
        text = f"{secs}.{rem:06d}" if rem else str(secs)
        return f"INTERVAL '{text}' SECOND"

    return _INTERVAL_BOUND_RE.sub(to_seconds, frame)


_EXCLUDE_RE = re.compile(
    r"\s+EXCLUDE\s+(CURRENT\s+ROW|NO\s+OTHERS|GROUP|TIES)\s*$",
    re.IGNORECASE,
)
_FRAME_KIND_RE = re.compile(r"\b(ROWS|RANGE|GROUPS)\b", re.IGNORECASE)
# frame-bound shapes that imply a TIME ordering (QuestDB RANGE frames are
# only legal over the designated timestamp): UNBOUNDED, INTERVAL literals,
# quoted numbers, number+unit
_TIME_BOUND_RE = re.compile(
    r"UNBOUNDED|INTERVAL|'\d|\d\s*(?:nano|micro|milli|second|minute|hour|day)",
    re.IGNORECASE,
)
_SHORTHAND_BOUND_RE = re.compile(
    r"\s*(UNBOUNDED|'[^']*'(?:\s+\w+)?|\d+(?:\s+\w+)?"
    r"|INTERVAL\s+'[^']*'\s+\w+)\s+PRECEDING\s*$",
    re.IGNORECASE,
)


def _exclude_tick(kind: str, start: str) -> str:
    if kind != "RANGE":
        return "1 PRECEDING"
    # RANGE: one native-resolution tick (microsecond) on the designated-
    # timestamp ordering — the only ordering the reference allows for
    # RANGE frames; bare numeric bounds are the Spark numeric-range
    # extension and tick by 1.
    if _TIME_BOUND_RE.search(start):
        return "1 microsecond PRECEDING"
    return "1 PRECEDING"


def _shrink_frame_end(body: str, mbody: str) -> str:
    """Rewrite the frame of a window-spec body so the current row (and,
    for RANGE, its timestamp peers) falls out — the reference's own
    EXCLUDE CURRENT ROW lowering."""
    fm = _FRAME_KIND_RE.search(mbody)
    if fm is None:
        raise ValueError("EXCLUDE requires an explicit window frame")
    kind = fm.group(1).upper()
    rest, mrest = body[fm.end() :], mbody[fm.end() :]
    bm = re.match(r"\s*BETWEEN\b", mrest, re.IGNORECASE)
    if bm:
        am = re.search(r"\bAND\b", mrest, re.IGNORECASE)
        if am is None:
            raise ValueError("malformed window frame: BETWEEN without AND")
        start, mstart = rest[bm.end() : am.start()], mrest[bm.end() : am.start()]
        mend = mrest[am.end() :]
        if re.search(r"\bCURRENT\s+ROW\b", mend, re.IGNORECASE):
            if re.search(
                r"\bCURRENT\s+ROW\b|\bFOLLOWING\b", mstart, re.IGNORECASE
            ):
                raise ValueError(
                    "EXCLUDE CURRENT ROW leaves an empty frame "
                    f"({kind} BETWEEN{start.rstrip()} AND CURRENT ROW)"
                )
            return (
                body[: fm.end()]
                + rest[: am.end()]
                + " "
                + _exclude_tick(kind, start)
            )
        if re.search(r"\bUNBOUNDED\s+FOLLOWING\b", mend, re.IGNORECASE):
            raise ValueError(
                "EXCLUDE CURRENT ROW not supported with UNBOUNDED "
                "FOLLOWING frame boundary"
            )
        if re.search(r"\bFOLLOWING\b", mend, re.IGNORECASE):
            raise ValueError(
                "EXCLUDE CURRENT ROW not supported with FOLLOWING "
                "frame boundary"
            )
        return body  # frame ends at .. PRECEDING — EXCLUDE is a no-op
    if re.search(r"\bCURRENT\s+ROW\s*$", mrest, re.IGNORECASE):
        raise ValueError(
            f"EXCLUDE CURRENT ROW leaves an empty frame ({kind} CURRENT ROW)"
        )
    # shorthand: <kind> <start> PRECEDING  (end = CURRENT ROW implicitly)
    sm = _SHORTHAND_BOUND_RE.match(rest)
    if sm is None:
        return body
    start = sm.group(1)
    return (
        body[: fm.end()]
        + " BETWEEN "
        + rest[sm.start(1) :].rstrip()
        + " AND "
        + _exclude_tick(kind, start)
    )


def _rewrite_frame_exclude(s: str) -> str:
    """Frame EXCLUDE clauses (``WindowExpression.java:47-55``; the
    runtime supports only NO OTHERS and CURRENT ROW —
    ``WindowFunctionTest.testFrameFunctionRejectsExclusionModesOtherThanDefault``).
    Spark has no EXCLUDE, and the reference itself lowers EXCLUDE
    CURRENT ROW by SHRINKING the frame end
    (``WindowExcludeCurrentRowTest.java`` plan assertions:
    ``ROWS .. AND CURRENT ROW`` → ``.. AND 1 PRECEDING``;
    ``RANGE .. AND CURRENT ROW`` → ``.. AND 1 PRECEDING`` in native
    timestamp resolution — so for RANGE the current row's PEERS leave
    the frame too).  Mirror that lowering exactly:

    - ``EXCLUDE NO OTHERS`` — the no-op default: stripped;
    - ``EXCLUDE CURRENT ROW`` with a frame ending at CURRENT ROW
      (BETWEEN or shorthand form) — the end becomes ``1 PRECEDING``
      (ROWS/GROUPS) or one microsecond tick (time RANGE; lowered to an
      INTERVAL bound by :func:`_rewrite_range_frame_units`, which runs
      next in the pipeline);
    - a frame already ending at ``.. PRECEDING`` — the current row is
      not in it: stripped (``rows_plain == rows_excluded`` in the
      reference test);
    - ``EXCLUDE GROUP`` / ``TIES`` and FOLLOWING frame ends — rejected
      with the reference's error messages; a frame that would become
      empty (``CURRENT ROW AND CURRENT ROW``) is rejected too, since
      Spark cannot represent an empty frame."""

    def edit(body: str, mbody: str) -> str | None:
        em = _EXCLUDE_RE.search(mbody)
        if em is None:
            return None
        mode = " ".join(em.group(1).upper().split())
        if mode in ("GROUP", "TIES"):
            raise ValueError(
                "only EXCLUDE NO OTHERS and EXCLUDE CURRENT ROW "
                "exclusion modes are supported"
            )
        stripped = body[: em.start()] + body[em.end() :]
        mstripped = mbody[: em.start()] + mbody[em.end() :]
        if mode == "NO OTHERS":
            return stripped
        return _shrink_frame_end(stripped, mstripped)

    return _edit_window_spans(s, edit)


def _balanced_close(masked: str, open_pos: int) -> int:
    depth = 0
    for k in range(open_pos, len(masked)):
        if masked[k] == "(":
            depth += 1
        elif masked[k] == ")":
            depth -= 1
            if depth == 0:
                return k
    return -1


_GEOHASH_B32 = "0123456789b-hjkmnp-z"  # regex class form of the alphabet
_CAST_GEOHASH_RE = re.compile(r"\bCAST\s*\(", re.IGNORECASE)
_GEOHASH_TYPE_TAIL_RE = re.compile(
    r"\bAS\s+GEOHASH\s*\(\s*(\d+)\s*([bc])\s*\)\s*$", re.IGNORECASE
)
_SUFFIX_GEOHASH_RE = re.compile(
    r"::\s*geohash\s*\(\s*(\d+)\s*([bc])\s*\)", re.IGNORECASE
)


def _geohash_cast_sql(expr: str, n: int, unit: str) -> str:
    """``cast(s AS geohash(Nc|Nb))`` (CastStrToGeoHashFunctionFactory):
    truncate to the target precision, NULL for strings shorter than it or
    with non-base32 characters.  Bit precisions that are multiples of 5
    lower to their char equivalent; mid-character bit truncation needs
    the GEOLONG bit value — use the column API
    (functions.geohash.geohash_to_bits) for those."""
    if unit.lower() == "b":
        if n % 5:
            raise ValueError(
                "geohash bit precisions that are not multiples of 5 are "
                "only available through the column API "
                "(questdb_spark.functions.geohash.geohash_to_bits)"
            )
        n //= 5
    if not 1 <= n <= 12:
        raise ValueError(f"geohash precision out of range: {n}")
    g = f"lower(substring({expr}, 1, {n}))"
    return f"(CASE WHEN {g} RLIKE '^[{_GEOHASH_B32}]{{{n}}}$' THEN {g} END)"


def _rewrite_geohash_casts(s: str) -> str:
    """``CAST(x AS GEOHASH(Nc))`` and ``x::geohash(Nc)`` in expression
    position — Spark has no GEOHASH type, so the cast lowers to the
    validated-truncation expression over the string representation."""
    masked = mask_literals(s)
    edits: list[tuple[int, int, str]] = []
    for m in _CAST_GEOHASH_RE.finditer(masked):
        o = m.end() - 1
        c = _balanced_close(masked, o)
        if c < 0:
            continue
        inner, minner = s[o + 1 : c], masked[o + 1 : c]
        tm = _GEOHASH_TYPE_TAIL_RE.search(minner)
        # the AS keyword must sit at the cast's own paren depth (the
        # GEOHASH(..) parens themselves open depth 1, so only check AS)
        if tm is None or not any(
            lo <= tm.start() < hi for lo, hi in depth0_spans(minner)
        ):
            continue
        expr = inner[: tm.start()].strip()
        edits.append(
            (m.start(), c, _geohash_cast_sql(expr, int(tm.group(1)), tm.group(2)))
        )
    if not edits:
        out_s = s
    else:
        parts: list[str] = []
        last = 0
        for o, c, repl in sorted(edits):
            if o < last:
                continue
            parts.append(s[last:o])
            parts.append(repl)
            last = c + 1
        parts.append(s[last:])
        out_s = "".join(parts)
    # suffix form: expr::geohash(Nc) — the suffix binds to the preceding
    # primary (identifier / call / paren group / literal)
    masked = mask_literals(out_s)
    while True:
        sm = _SUFFIX_GEOHASH_RE.search(masked)
        if sm is None:
            return out_s
        end = sm.start()
        i = end - 1
        while i >= 0 and masked[i].isspace():
            i -= 1
        if i >= 0 and masked[i] in ")'\"":
            close_ch = masked[i]
            if close_ch == ")":
                depth = 0
                j = i
                while j >= 0:
                    if masked[j] == ")":
                        depth += 1
                    elif masked[j] == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    j -= 1
                # include a function name directly before the parens
                k = j - 1
                while k >= 0 and (masked[k].isalnum() or masked[k] in "_."):
                    k -= 1
                start = k + 1
            else:
                j = out_s.rfind(close_ch, 0, i)
                start = j if j >= 0 else i
        else:
            k = i
            while k >= 0 and (masked[k].isalnum() or masked[k] in "_."):
                k -= 1
            start = k + 1
        expr = out_s[start : end].strip()
        repl = _geohash_cast_sql(expr, int(sm.group(1)), sm.group(2))
        out_s = out_s[:start] + repl + out_s[sm.end() :]
        masked = mask_literals(out_s)


_BETWEEN_LIT_RE = re.compile(
    r"\bBETWEEN\s*('[^']*')\s*AND\s*('[^']*')", re.IGNORECASE
)
_ISO_TS_RE = re.compile(r"^'\d{4}-\d{2}(-\d{2}([T ][\d:.]+Z?)?)?'$")


def _normalize_between_literals(s: str) -> str:
    """``x BETWEEN '2024-01-16' AND '2024-01-14'`` → bounds swapped into
    ascending order (timestamp BETWEEN is symmetric in the reference —
    ``BetweenTimestampFunctionFactory`` takes min/max of the operands).
    Only ISO date/timestamp literal bounds are normalized: those compare
    lexicographically, and non-literal bounds can't be ordered at
    rewrite time."""
    masked = mask_literals(s)
    out: list[str] = []
    last = 0
    for m in _BETWEEN_LIT_RE.finditer(masked):
        lo, hi = s[m.start(1) : m.end(1)], s[m.start(2) : m.end(2)]
        if not (_ISO_TS_RE.match(lo) and _ISO_TS_RE.match(hi)) or lo <= hi:
            continue
        out.append(s[last : m.start()])
        out.append(f"BETWEEN {hi} AND {lo}")
        last = m.end()
    if not out:
        return s
    out.append(s[last:])
    return "".join(out)


def _mask_subqueries(masked: str) -> str:
    """Blank every parenthesized ``(SELECT ...)`` span (keyword sniffing
    over a subquery's body must not see its internals)."""
    while True:
        m = re.search(r"\(\s*SELECT\b", masked, re.IGNORECASE)
        if m is None:
            return masked
        c = _balanced_close(masked, m.start())
        if c < 0:
            return masked
        masked = masked[: m.start()] + " " * (c + 1 - m.start()) + masked[c + 1 :]


_SUBSCRIPT_RE = re.compile(r"((?:[A-Za-z_]\w*\.)*[A-Za-z_]\w*|\))\s*\[")
_SUBSCRIPT_KEYWORD_SKIP = frozenset({"array"})


def _rewrite_subscripts(s: str) -> str:
    """QuestDB array/map dereference ``expr[i]`` is 1-BASED
    (array/DoubleArrayAccessFunctionFactory.java:149 — index 1 selects the
    first element); Spark's native subscript is 0-based, so lower to
    ``element_at(expr, i)`` (1-based for arrays, key-based for maps —
    both matching the reference).  Conservative: empty brackets (type
    declarations like ``DOUBLE[]``) and ``lo:hi`` slice forms are left
    untouched."""
    for _ in range(64):
        masked = mask_literals(s)
        changed = False
        for m in _SUBSCRIPT_RE.finditer(masked):
            if m.group(1).lower() in _SUBSCRIPT_KEYWORD_SKIP:
                continue
            open_b = m.end() - 1
            depth = 0
            close = -1
            for k in range(open_b, len(masked)):
                if masked[k] in "([":
                    depth += 1
                elif masked[k] in ")]":
                    depth -= 1
                    if depth == 0:
                        close = k
                        break
            if close < 0 or masked[k] != "]":
                continue
            inner_masked = masked[open_b + 1 : close]
            if not inner_masked.strip() or ":" in inner_masked:
                continue  # type declaration / slice form
            if m.group(1) == ")":
                # walk back to the matching '(' to take the whole
                # parenthesized expression as the dereference target
                depth = 0
                start = -1
                for k in range(m.end(1) - 1, -1, -1):
                    if masked[k] in ")]":
                        depth += 1
                    elif masked[k] in "([":
                        depth -= 1
                        if depth == 0:
                            start = k
                            break
                if start < 0:
                    continue
                # a '(' preceded by an identifier is a function call —
                # include the callee name in the dereference target
                while start > 0 and (masked[start - 1].isalnum()
                                     or masked[start - 1] in "_."):
                    start -= 1
            else:
                start = m.start(1)
            target = s[start : m.end(1)]
            index = s[open_b + 1 : close]
            s = (
                s[:start]
                + f"element_at({target}, {index})"
                + s[close + 1 :]
            )
            changed = True
            break  # re-mask and rescan
        if not changed:
            return s
    return s


def _expand_fn_macros(s: str) -> str:
    """Expand QuestDB-only function calls into Spark SQL expressions.
    Matching runs over the literal-masked text (paren scanning is safe
    there — literal contents are blanked); args come from the original.
    Iterates to a fixpoint so nested macro calls expand too."""
    rnd_tag = 100  # per-call-site tag for rnd_* draws, unique per statement
    for _ in range(5):
        masked = mask_literals(s)
        out: list[str] = []
        last = 0
        changed = False
        for m in _FN_MACRO_RE.finditer(masked):
            if m.start() < last:
                continue  # inside an already-expanded span
            depth = 0
            close = -1
            for k in range(m.end() - 1, len(masked)):
                if masked[k] == "(":
                    depth += 1
                elif masked[k] == ")":
                    depth -= 1
                    if depth == 0:
                        close = k
                        break
            if close < 0:
                raise ValueError(f"unbalanced call to {m.group(1)} in {s!r}")
            args = split_top_level(s[m.end() : close], ",")
            name = m.group(1).lower()
            try:
                if name in _RND_MACROS:
                    expanded = _RND_MACROS[name](args, rnd_tag)
                    # stride 16: multi-draw macros (rnd_geohash uses up to
                    # 12 tags, rnd_str 3) must never collide with the next
                    # call site's draws
                    rnd_tag += 16
                else:
                    expanded = _FN_MACROS[name](args)
            except (ValueError, IndexError, KeyError):
                # not the QuestDB form (e.g. Spark's own 2-arg datediff):
                # leave the call text untouched for Spark to resolve
                continue
            out.append(s[last : m.start()])
            out.append("(" + expanded + ")")
            last = close + 1
            changed = True
        out.append(s[last:])
        s = "".join(out)
        if not changed:
            break
    # sentinel used by expansions that must call a Spark built-in a macro
    # SHADOWS (typeof): restored only after the fixpoint so the emitted
    # call can't re-match its own macro
    return s.replace("__qdb_typeof__(", "typeof(")


# QuestDB column-type names → Spark cast targets (json_extract ::type and
# UNNEST COLUMNS declarations; ColumnType.java tags)
_QDB_TYPE_MAP = {
    "int": "int", "long": "bigint", "short": "smallint", "byte": "tinyint",
    "double": "double", "float": "float", "boolean": "boolean",
    "varchar": "string", "string": "string", "symbol": "string",
    "timestamp": "timestamp", "date": "date", "ipv4": "string",
}


def _paren_close(masked: str, open_idx: int) -> int:
    depth = 0
    for k in range(open_idx, len(masked)):
        if masked[k] == "(":
            depth += 1
        elif masked[k] == ")":
            depth -= 1
            if depth == 0:
                return k
    return -1


def _json_typed_cast(extracted: str, qdb_type: str) -> str:
    """QuestDB typed JSON extraction cast semantics
    (JsonExtractTypedFunctionFactory: unparseable → null; fractional JSON
    numbers truncate into integer targets): direct parse first, fallback
    through double for the integer family."""
    t = _QDB_TYPE_MAP.get(qdb_type.lower(), qdb_type.lower())
    if t in ("int", "bigint", "smallint", "tinyint"):
        return (
            f"coalesce(try_cast({extracted} AS {t}), "
            f"try_cast(try_cast({extracted} AS double) AS {t}))"
        )
    return f"try_cast({extracted} AS {t})"


def _rewrite_json_extract_typed(s: str) -> str:
    """``json_extract(json, path)::type`` (SqlParser rewrite into
    JsonExtractTypedFunctionFactory) → null-on-invalid Spark cast of
    get_json_object.  The bare 2-arg form is handled by the
    ``json_extract`` macro in ``_FN_MACROS``."""
    for _ in range(32):
        masked = mask_literals(s)
        m = re.search(r"\bjson_extract\s*\(", masked, re.IGNORECASE)
        if not m:
            break
        open_idx = m.end() - 1
        close = _paren_close(masked, open_idx)
        if close < 0:
            break
        suffix = re.match(r"\s*::\s*(\w+)", masked[close + 1 :])
        args = split_top_level(s[open_idx + 1 : close], ",")
        if len(args) != 2:
            break
        extracted = f"get_json_object({args[0].strip()}, {args[1].strip()})"
        if suffix:
            repl = _json_typed_cast(extracted, suffix.group(1))
            end = close + 1 + suffix.end()
        else:
            repl = extracted
            end = close + 1
        s = s[: m.start()] + repl + s[end:]
    return s


_UNNEST_RE = re.compile(r",\s*UNNEST\s*\(", re.IGNORECASE)


def _rewrite_json_unnest(s: str) -> str:
    """JSON UNNEST source (griffin/engine/join/JsonUnnestSource.java,
    JsonUnnestTest: ``FROM t, UNNEST(t.payload COLUMNS(a INT, b DOUBLE)) u``)
    → LATERAL VIEW explode over ``from_json(payload, 'array<string>')``.

    from_json with an array<string> schema yields exactly the per-element
    views the reference's scan-forward parser produces: scalar elements as
    their text, object elements as their JSON text, null elements as null,
    invalid payload as null (→ explode drops the row, like the reference's
    empty cursor).  Scalar-vs-object detection is per element (reference:
    scan-forward over the data): with a single declared column, an element
    that starts with '{' extracts the named field, anything else casts the
    element itself; multiple declared columns always extract fields."""
    for _ in range(8):
        masked = mask_literals(s)
        m = _UNNEST_RE.search(masked)
        if not m:
            break
        open_idx = masked.index("(", m.start())
        close = _paren_close(masked, open_idx)
        if close < 0:
            break
        inner = s[open_idx + 1 : close]
        am = re.match(r"\s*(?:AS\s+)?(\w+)", s[close + 1 :], re.IGNORECASE)
        if not am:
            break
        alias = am.group(1)
        tail_start = close + 1 + am.end()
        im = re.search(r"\bCOLUMNS\s*\(", mask_literals(inner), re.IGNORECASE)
        if not im:
            break
        expr = inner[: im.start()].strip()
        cols_close = _paren_close(mask_literals(inner), im.end() - 1)
        col_specs = []
        for spec in split_top_level(inner[im.end() : cols_close], ","):
            name, typ = spec.strip().rsplit(None, 1)
            col_specs.append((name.strip(), typ.strip()))
        elem = f"{alias}__elem"
        lateral = (
            f" LATERAL VIEW explode(from_json({expr}, 'array<string>')) "
            f"{alias}__lv AS {elem} "
        )
        s2 = s[: m.start()] + lateral + s[tail_start:]
        for name, typ in col_specs:
            if len(col_specs) > 1:
                src = f"get_json_object({elem}, '$.{name}')"
            else:
                src = (
                    f"CASE WHEN ltrim({elem}) LIKE '{{%' "
                    f"THEN get_json_object({elem}, '$.{name}') ELSE {elem} END"
                )
            s2 = _sub_outside_literals(
                s2,
                re.compile(rf"\b{re.escape(alias)}\.{re.escape(name)}\b", re.IGNORECASE),
                _json_typed_cast(src, typ),
            )
        s = s2
    return s


def _glob_to_regex(pat: str) -> str:
    """SQLite-style GLOB pattern → anchored Java regex
    (``griffin/engine/functions/regex/GlobStrFunctionFactory`` semantics:
    case-sensitive full-string match; ``*`` any run, ``?`` one char,
    ``[...]`` / ``[!...]`` character classes)."""
    out: list[str] = ["^"]
    i, n = 0, len(pat)
    while i < n:
        c = pat[i]
        if c == "*":
            out.append(".*")
        elif c == "?":
            out.append(".")
        elif c == "[":
            j = i + 1
            neg = ""
            if j < n and pat[j] in "!^":
                neg = "^"
                j += 1
            # a ']' first in the class is a literal member (SQLite rule)
            k = pat.find("]", j + 1 if j < n and pat[j] == "]" else j)
            if k == -1:
                out.append(re.escape(c))
            else:
                out.append("[" + neg + pat[j:k].replace("\\", "\\\\") + "]")
                i = k
        else:
            out.append(re.escape(c))
        i += 1
    out.append("$")
    return "".join(out)


def _rewrite_match_operators(s: str) -> str:
    """QuestDB string-match operators → Spark predicates:
    ``expr ~ 'pat'`` → ``expr RLIKE 'pat'`` (MatchStrFunctionFactory —
    Java ``Matcher.find`` substring semantics, identical to RLIKE),
    ``expr !~ 'pat'`` → ``expr NOT RLIKE 'pat'`` (NotMatchStrFunctionFactory),
    ``expr GLOB 'pat'`` → anchored RLIKE with glob→regex translation.
    All matching runs over the literal-masked text; the GLOB pattern body
    is read from the original text and re-emitted with SQL-literal
    backslash doubling (Spark string literals process escapes)."""
    # GLOB first: it synthesizes a new regex literal that the ~ pass must
    # not touch (it won't — ~ matching is mask-based), and requires the
    # original literal span.
    masked = mask_literals(s)
    out: list[str] = []
    last = 0
    for m in re.finditer(r"\bglob\s*'", masked, re.IGNORECASE):
        qstart = m.end() - 1
        qend = masked.find("'", qstart + 1)
        if qend == -1:
            continue
        regex = _glob_to_regex(s[qstart + 1 : qend])
        lit = regex.replace("\\", "\\\\").replace("'", "''")
        out.append(s[last : m.start()])
        out.append(f"RLIKE '{lit}'")
        last = qend + 1
    out.append(s[last:])
    s = "".join(out)
    # ~ / !~ with a string-literal RHS (the pattern must be constant in
    # QuestDB too); the '(?=\') lookahead keeps prefix bitwise-NOT forms
    # like ~x untouched.
    return _sub_outside_literals(
        s,
        re.compile(r"(!~|~)\s*(?=')"),
        None,
        lambda m: " NOT RLIKE " if m.group(1) == "!~" else " RLIKE ",
    )


def _sub_outside_literals(
    s: str, pat: re.Pattern, repl: str | None, repl_fn=None
) -> str:
    """Regex-replace over the literal-masked text, applied to the original.
    ``repl_fn(match)`` takes precedence over the static ``repl``."""
    masked = mask_literals(s)
    out: list[str] = []
    last = 0
    for m in pat.finditer(masked):
        out.append(s[last : m.start()])
        out.append(repl_fn(m) if repl_fn is not None else repl)
        last = m.end()
    out.append(s[last:])
    return "".join(out)


def _replace_expr_outside_literals(s: str, expr: str, alias: str) -> str:
    """Replace occurrences of ``expr`` in ``s`` with ``alias`` — but only at
    word boundaries and never inside string literals (VERDICT r3 finding 1:
    the textual HAVING rewrite corrupted partial/literal matches)."""
    masked = mask_literals(s)
    pat = re.compile(re.escape(expr), re.IGNORECASE)
    out: list[str] = []
    last = 0
    for m in pat.finditer(masked):
        pre = masked[m.start() - 1] if m.start() > 0 else " "
        post = masked[m.end()] if m.end() < len(masked) else " "
        if (expr[0].isalnum() or expr[0] == "_") and (pre.isalnum() or pre == "_"):
            continue
        if (expr[-1].isalnum() or expr[-1] == "_") and (post.isalnum() or post == "_"):
            continue
        out.append(s[last : m.start()])
        out.append(alias)
        last = m.end()
    out.append(s[last:])
    return "".join(out)


def _item_col(i: SelectItem) -> Column:
    c = F.expr(i.expr)
    return c.alias(i.alias) if i.alias else c


def _order_spec(spec: str) -> tuple[str, bool]:
    """ORDER BY item → (expression text, is_desc)."""
    spec = spec.strip()
    if re.search(r"\bDESC$", spec, re.IGNORECASE):
        return re.sub(r"\s+DESC$", "", spec, flags=re.IGNORECASE), True
    return re.sub(r"\s+ASC$", "", spec, flags=re.IGNORECASE), False
