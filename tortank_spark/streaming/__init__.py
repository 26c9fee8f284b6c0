from .ingest import (  # noqa: F401
    stream_exact_dedup, stream_extract, stream_ntriples_directory,
)
