"""Text-analysis map_batches stages over the documents table.

Each stage is a pure pyarrow-batch transform adding derived columns; the
regex/stopword tables are module-level (compiled once per worker process).
Token counts use ASCII-pinned regexes so the DuckDB oracle computes the
same values (see __ray_entry__.py oracle_sql()).
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import text_stats as T


def add_token_counts(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    ws = pa.array([T.ws_token_count(t or "") for t in texts], pa.int64())
    bpe = pa.array([T.bpe_token_count(t or "") for t in texts], pa.int64())
    return batch.append_column("ws_tokens", ws).append_column("bpe_tokens", bpe)


def add_quality(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    q = pa.array([T.quality_score(t or "") for t in texts], pa.float64())
    return batch.append_column("quality", q)


def add_lang_id(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    langs = pa.array([T.lang_id(t or "") for t in texts], pa.string())
    return batch.append_column("lang_pred", langs)


def add_fingerprints(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    md5 = pa.array([T.md5_fingerprint(t or "") for t in texts], pa.string())
    roll = pa.array([T.rolling_fingerprint(t or "") for t in texts], pa.int64())
    return batch.append_column("md5", md5).append_column("rolling_fp", roll)


def add_simhash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    # two's-complement int64 keeps all 64 bits (recover with & ((1<<64)-1));
    # masking bit 63 would corrupt downstream hamming distances
    def to_i64(h: int) -> int:
        return h - (1 << 64) if h >= (1 << 63) else h

    texts = batch.column(text_col).to_pylist()
    hashes = pa.array([to_i64(T.simhash64(t or "")) for t in texts], pa.int64())
    return batch.append_column("simhash", hashes)
