"""QuestDB-dialect SQL front-end: clause-level parser + DataFrame lowering
+ DDL/DML statement surface (SURVEY §3)."""

from .engine import QdbEngine

__all__ = ["QdbEngine"]
