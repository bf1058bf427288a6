from .hashing import uuid5_udf, hex_to_long  # noqa: F401
