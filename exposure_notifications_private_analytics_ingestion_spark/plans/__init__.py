from .ingestion import IngestionOptions, process_turns, build_headers, run_ingestion  # noqa: F401
from .deletion import expired_turns, run_deletion  # noqa: F401
