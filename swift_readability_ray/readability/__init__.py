from .core import Extractor, ExtractOptions, extract, extract_document  # noqa: F401
from .readerable import (  # noqa: F401
    is_probably_readerable,
    is_probably_readerable_html,
)
