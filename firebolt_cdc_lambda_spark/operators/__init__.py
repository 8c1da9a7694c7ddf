from .ordering import CDC_META_COLS, dedup_ordering, op_priority
from .dedup import deduplicate, needs_dedup
from .merge import merge_cdc, KeyedTable, MergeKeyError

__all__ = [
    "CDC_META_COLS",
    "dedup_ordering",
    "op_priority",
    "deduplicate",
    "needs_dedup",
    "merge_cdc",
    "KeyedTable",
    "MergeKeyError",
]
