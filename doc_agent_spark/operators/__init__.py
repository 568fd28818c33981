from . import dedup, extractor, search, similarity  # noqa: F401
