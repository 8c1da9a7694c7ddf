"""Table → primary-key registry and engine configuration.

Reference: ``config/tables_keys.json.example`` — ``{"table": "id",
"composite": ["order_id", "item_id"], "keyless": null}``; loaded from an
env var or object store (lambda/handler.py:710-729).  A ``null`` key
means the table is skipped by CDC (lambda/handler.py:786-789,
CHANGELOG.md:6-19).  Default key when a table is absent: ``id``
(lambda/handler.py:722-726).

Also ports the new-table PK auto-configuration heuristic
(schema_evolution_tracker.py:137-158): prefer a primary index; else a
column named ``id``/``uuid``/``<table>_id``/``pk_id``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

DEFAULT_KEY = "id"
_SKIP = object()


@dataclass
class TableKeys:
    """Registry mapping table name -> list of PK columns (or None = skip)."""
    keys: dict[str, list[str] | None] = field(default_factory=dict)
    default_key: str | None = DEFAULT_KEY

    @classmethod
    def from_json(cls, text: str, default_key: str | None = DEFAULT_KEY) -> "TableKeys":
        raw = json.loads(text)
        keys: dict[str, list[str] | None] = {}
        for table, k in raw.items():
            if k is None:
                keys[table] = None
            elif isinstance(k, str):
                # comma-split composite support, reference lambda/handler.py:718-721
                keys[table] = [c.strip() for c in k.split(",") if c.strip()]
            else:
                keys[table] = list(k)
        return cls(keys=keys, default_key=default_key)

    @classmethod
    def from_env(cls, var: str = "TABLE_KEYS", path_var: str = "TABLE_KEYS_PATH") -> "TableKeys":
        if os.environ.get(var):
            return cls.from_json(os.environ[var])
        path = os.environ.get(path_var)
        if path and os.path.exists(path):
            with open(path) as f:
                return cls.from_json(f.read())
        return cls()

    def resolve(self, table: str) -> list[str] | None:
        """PK columns for ``table``; None means 'skip this table'."""
        if table in self.keys:
            return self.keys[table]
        return [self.default_key] if self.default_key else None

    def should_skip(self, table: str) -> bool:
        return self.resolve(table) is None


def infer_primary_key(table: str, columns: list[str]) -> list[str] | None:
    """Name-heuristic PK inference for newly-appearing tables
    (schema_evolution_tracker.py:137-158)."""
    for cand in ("id", "uuid", f"{table}_id", "pk_id"):
        if cand in columns:
            return [cand]
    return None
