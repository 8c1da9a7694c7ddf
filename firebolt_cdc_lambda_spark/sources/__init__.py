from .ingest import parse_cdc_path, is_full_load_file, read_cdc_files, with_ingestion_seq
from .ledger import FileLedger

__all__ = [
    "parse_cdc_path",
    "is_full_load_file",
    "read_cdc_files",
    "with_ingestion_seq",
    "FileLedger",
]
