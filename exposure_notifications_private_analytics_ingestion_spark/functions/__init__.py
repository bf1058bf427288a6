from .hashing import uuid5_udf, uuid5_col, hex_to_long  # noqa: F401
