from .avro_packets import read_packet_containers  # noqa: F401
from .evolution import (  # noqa: F401
    SchemaEvolutionError,
    conform,
    conformed_stream_schema,
    read_turns_evolved,
)
from .quarantine import (  # noqa: F401
    corrupt_file_inventory,
    quarantine_corrupt_files,
    read_resilient,
)
from .transcripts import (  # noqa: F401
    generate_turns,
    generate_turns_with_payload,
    invalid_fixture_rows,
    write_turns_table,
)
