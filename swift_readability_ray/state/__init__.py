from .lineage import LineageLog  # noqa: F401
