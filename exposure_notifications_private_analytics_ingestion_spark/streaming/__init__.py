from .cdc_sink import start_cdc_upsert_stream  # noqa: F401
from .cep_stream import pattern_match_stream, start_pattern_stream  # noqa: F401
from .hh_stream import start_heavy_hitters_stream  # noqa: F401
from .ingest_stream import StreamOptions, start_stream_ingestion  # noqa: F401
from .joins import time_bounded_stream_join  # noqa: F401
from .metrics import MetricsListener  # noqa: F401
from .sketch_stream import start_profile_stream, windowed_profile  # noqa: F401
