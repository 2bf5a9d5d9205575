from .io import read_documents, write_table  # noqa: F401
