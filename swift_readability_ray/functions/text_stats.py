"""Vectorized text-analysis kernels for training-data pipelines.

Language-ID (stopword/charset heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting (md5 + rolling
hash).  All operate on lists/arrays of strings and are designed to run
inside ``map_batches`` without per-row Python in the outer loop where a
vectorized kernel exists; regex-based counts use the C regex engine per row.

Token semantics are pinned to ASCII word classes so the DuckDB (RE2) oracle
SQL in __ray_entry__.py computes identical values.
"""

from __future__ import annotations

import functools
import hashlib
import re
import zlib

import numpy as np

# pinned to RE2's \s class ([\t\n\f\r ]) so DuckDB oracles tokenize
# identically: Python unicode \s would additionally split on \v, NBSP,
# U+2028 etc. and silently diverge from the SQL mirrors on such text
_WS_SPLIT = re.compile(r"[ \t\n\r\f]+")
# BPE-ish: ASCII word runs or single non-word non-space symbols (RE2-compatible)
_BPE_TOKEN = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
_PUNCT = re.compile(r"[^\w\s]", re.A)

# tiny per-language stopword profiles (public common words)
_STOPWORDS = {
    "en": {"the", "a", "and", "of", "to", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "no", "por"},
    "fr": {"le", "la", "de", "et", "un", "est", "que", "pour", "dans", "ce"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "ein"},
}


def ws_token_count(text: str) -> int:
    """Whitespace token count; 0 for blank (matches SQL oracle CASE)."""
    t = text.strip()
    if not t:
        return 0
    return len(_WS_SPLIT.split(t))


def bpe_token_count(text: str) -> int:
    """BPE-ish regex token count (ASCII word runs + symbols)."""
    return len(_BPE_TOKEN.findall(text))


def quality_score(text: str) -> float:
    """Composite quality in [0,1]: length, punctuation and stopword ratios.

    Deterministic heuristic (SURVEY-mandated quality scoring op): favors
    medium-length prose with some punctuation and common-word coverage.
    """
    n = len(text)
    if n == 0:
        return 0.0
    tokens = _WS_SPLIT.split(text.strip()) if text.strip() else []
    n_tok = len(tokens)
    if n_tok == 0:
        return 0.0
    punct_ratio = len(_PUNCT.findall(text)) / n
    lower = [t.lower() for t in tokens]
    stop_all = set().union(*_STOPWORDS.values())
    stop_ratio = sum(1 for t in lower if t in stop_all) / n_tok
    mean_len = sum(len(t) for t in tokens) / n_tok
    length_term = min(n / 500.0, 1.0)
    word_term = 1.0 if 2.5 <= mean_len <= 9.0 else 0.5
    punct_term = 1.0 - min(punct_ratio * 5.0, 1.0)
    stop_term = min(stop_ratio * 4.0, 1.0)
    x = 0.3 * length_term + 0.2 * word_term + 0.2 * punct_term + 0.3 * stop_term
    # floor(x*1e6 + 0.5): half-up in both Python and the DuckDB oracle SQL
    # (Python round() is banker's, DuckDB round() is half-away — either
    # alone would diverge on exact ties)
    import math

    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def lang_id(text: str) -> str:
    """N-gram/stopword language heuristic → ISO code or "und"."""
    tokens = [t.lower() for t in _WS_SPLIT.split(text.strip()) if t]
    if not tokens:
        return "und"
    # charset shortcut for CJK / Cyrillic / Arabic
    sample = text[:400]
    if any("一" <= c <= "鿿" for c in sample):
        return "zh"
    if any("Ѐ" <= c <= "ӿ" for c in sample):
        return "ru"
    if any("؀" <= c <= "ۿ" for c in sample):
        return "ar"
    best, best_hits = "und", 0
    for lang, words in _STOPWORDS.items():
        hits = sum(1 for t in tokens if t in words)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits > 0 else "und"


def md5_fingerprint(text: str) -> str:
    return hashlib.md5(text.encode("utf-8")).hexdigest()


def rolling_fingerprint(text: str, window: int = 8, base: int = 1_000_003) -> int:
    """Rabin-Karp-style rolling hash over whitespace tokens → int64.

    XORs the hash of every ``window``-token window so local edits only
    perturb nearby windows (document fingerprinting for near-dup triage).
    """
    tokens = _WS_SPLIT.split(text.strip()) if text.strip() else []
    if not tokens:
        return 0
    hashes = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in tokens), dtype=np.uint64, count=len(tokens)
    )
    if len(hashes) <= window:
        acc = np.uint64(0)
        for h in hashes:
            acc = acc * np.uint64(base) + h
        return int(acc & np.uint64(0x7FFFFFFFFFFFFFFF))
    powers = np.power(np.uint64(base), np.arange(window, dtype=np.uint64))
    acc = np.uint64(0)
    for start in range(len(hashes) - window + 1):
        w = np.uint64((hashes[start : start + window] * powers).sum())
        acc ^= w
    return int(acc & np.uint64(0x7FFFFFFFFFFFFFFF))


def word_shingles(text: str, k: int = 3) -> set[int]:
    """Hashed word k-shingles (crc32) — MinHash/Jaccard feature set."""
    tokens = [t.lower() for t in _WS_SPLIT.split(text.strip()) if t]
    if len(tokens) < k:
        return {zlib.crc32(" ".join(tokens).encode("utf-8"))} if tokens else set()
    return {
        zlib.crc32(" ".join(tokens[i : i + k]).encode("utf-8"))
        for i in range(len(tokens) - k + 1)
    }


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa, sb = word_shingles(text_a, k), word_shingles(text_b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------- MinHash

_MERSENNE = (1 << 61) - 1


def minhash_params(num_perm: int = 64, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: set[int], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """num_perm-wide MinHash signature (universal hashing mod Mersenne 61)."""
    if not shingles:
        return np.full(len(a), np.uint64(_MERSENNE), dtype=np.uint64)
    x = np.fromiter(shingles, dtype=np.uint64, count=len(shingles))
    # (a * x + b) mod p, vectorized over (perm, shingle)
    prod = (np.outer(a, x) + b[:, None]) % np.uint64(_MERSENNE)
    return prod.min(axis=1)


def band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """LSH band bucket keys: hash of each band's signature rows."""
    rows = len(sig) // bands
    keys = []
    for band in range(bands):
        chunk = sig[band * rows : (band + 1) * rows]
        keys.append(zlib.crc32(chunk.tobytes()) ^ (band << 28))
    return keys


# ---------------------------------------------------------------- SimHash


@functools.lru_cache(maxsize=1_000_000)
def _token_hash64(token: str) -> int:
    """First 8 md5 bytes of a token as uint64 — per-process cached: corpus
    vocabulary repeats heavily across documents, so the cache turns one md5
    per token OCCURRENCE into one per distinct token per worker (bounded at
    1M entries ≈ 80 MB, evicting LRU beyond that)."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:16], 16)


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens weighted by frequency.

    Token hash = first 8 bytes of md5 — chosen so the DuckDB oracle can
    compute bit-identical signatures (``substr(md5(tok), 1, 16)`` as
    uint64); with 4 bands the pigeonhole guarantee makes the banded pair
    search EXACT for hamming ≤ 3, so an all-pairs SQL mirror is sound.
    """
    tokens = [t.lower() for t in _WS_SPLIT.split(text.strip()) if t]
    if not tokens:
        return 0
    uniq, counts = np.unique(np.array(tokens), return_counts=True)
    hashes = np.fromiter(
        (_token_hash64(t) for t in uniq), dtype=np.uint64, count=len(uniq)
    )
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
    weights = counts[:, None]
    v = (np.where(bits == 1, 1, -1) * weights).sum(axis=0)
    return int((np.packbits((v > 0)[::-1]).view(">u8")[0]))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(h: int, bands: int = 4) -> list[int]:
    """Split the 64-bit simhash into ``bands`` chunks (pigeonhole: any pair
    with hamming ≤ bands-1 shares at least one chunk)."""
    width = 64 // bands
    mask = (1 << width) - 1
    return [((h >> (i * width)) & mask) | (i << 48) for i in range(bands)]


# ----------------------------------------------------------- PII scrubbing

# ASCII-pinned, RE2-compatible patterns so the DuckDB oracle computes
# identical counts/redactions (same discipline as the token regexes above)
PII_EMAIL = re.compile(r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}")
PII_IPV4 = re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b")


def pii_scrub(text: str) -> tuple[str, int, int]:
    """Redact emails and IPv4 literals; returns (clean, n_emails, n_ips).

    The canonical pre-training privacy pass: deterministic regex redaction
    with per-doc counts so the pipeline can report aggregate leakage.
    """
    n_emails = len(PII_EMAIL.findall(text))
    clean = PII_EMAIL.sub("<EMAIL>", text)
    n_ips = len(PII_IPV4.findall(clean))
    clean = PII_IPV4.sub("<IP>", clean)
    return clean, n_emails, n_ips
