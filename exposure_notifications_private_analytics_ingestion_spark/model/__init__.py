from .schema import (  # noqa: F401
    LATEST_SCHEMA_VERSION,
    MIN_SCHEMA_VERSION,
    NUMBER_OF_SERVERS,
    PRIME,
    TURNS_SCHEMA,
    TURNS_WITH_PAYLOAD_SCHEMA,
    PACKETS_SCHEMA,
    HEADERS_SCHEMA,
    INVALID_REASONS,
)
from .validate import validate_turns, with_rpit  # noqa: F401
