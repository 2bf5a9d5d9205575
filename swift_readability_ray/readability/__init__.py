from .core import Extractor, ExtractOptions, extract, extract_document  # noqa: F401
from .readerable import is_probably_readerable  # noqa: F401
