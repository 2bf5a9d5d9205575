from .extract import ReadabilityExtractor  # noqa: F401
