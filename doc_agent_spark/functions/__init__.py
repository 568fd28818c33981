from . import assembly, hashing, mime, salvage, textfns, vectors  # noqa: F401
