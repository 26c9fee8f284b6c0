from .ingest import stream_extract, stream_ntriples_directory  # noqa: F401
