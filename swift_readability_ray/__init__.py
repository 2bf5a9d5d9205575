"""swift_readability_ray — Ray-Data-native main-content extraction engine.

A from-scratch reimplementation (NOT a port) of the extraction capabilities of
lake-of-fire/swift-readability (itself a port of Mozilla Readability.js
v0.6.0), re-expressed as Ray Data pipelines over Arrow batches of interleaved
text+media span documents. See SURVEY.md for the blueprint.
"""

from .readability import (  # noqa: F401
    ExtractOptions,
    Extractor,
    extract,
    extract_document,
    is_probably_readerable,
    is_probably_readerable_html,
)

__version__ = "0.1.0"
