"""Text-analysis operators for large-scale training-data pipelines.

All operators are vectorized batch fns (or actor classes for stages with
compiled state) meant for ``map_batches(..., batch_format="pyarrow")``
over a ``documents``-shaped table ``(doc_id, text, lang, source,
n_chars)``. Heuristics are deterministic — no models, no network.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_WS_TOKEN = r"\S+"


def token_count_column(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Whitespace token count per row (count of ``\\S+`` runs) — vectorized
    via pyarrow's re2 kernel. Matches DuckDB
    ``length(regexp_extract_all(text, '\\S+'))``."""
    return pc.cast(pc.count_substring_regex(pc.fill_null(text, ""), _WS_TOKEN), pa.int64())


def add_token_count(batch: pa.Table, text_col: str = "text", out: str = "n_tokens") -> pa.Table:
    return batch.append_column(out, token_count_column(batch.column(text_col)))


def quality_metrics(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document quality signals (length / whitespace / digit / upper
    ratios) — the cheap pre-filter of every web-scale corpus pipeline.
    All ratios are over character count; rounded to 6 dp for stable
    cross-engine comparison."""
    text = pc.fill_null(batch.column(text_col), "")
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    denom = pc.cast(pc.max_element_wise(n_chars, 1), pa.float64())
    n_spaces = pc.cast(pc.count_substring_regex(text, r"\s"), pa.float64())
    n_digits = pc.cast(pc.count_substring_regex(text, r"[0-9]"), pa.float64())
    n_upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.float64())
    n_tokens = token_count_column(text)
    from etl_ray.functions.rounding import round_half_away

    def r6(arr):
        return pa.array(round_half_away(arr.to_numpy(zero_copy_only=False), 6))

    out = batch.append_column("n_chars_calc", n_chars)
    out = out.append_column("n_tokens", n_tokens)
    out = out.append_column("space_ratio", r6(pc.divide(n_spaces, denom).combine_chunks()))
    out = out.append_column("digit_ratio", r6(pc.divide(n_digits, denom).combine_chunks()))
    out = out.append_column("upper_ratio", r6(pc.divide(n_upper, denom).combine_chunks()))
    return out


# --- language identification (n-gram heuristic, stateful actor) -------------

#: Tiny per-language stopword profiles — deterministic heuristic, not a model.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "por"},
}


class LangIdStage:
    """Actor-pool language-ID stage: compiles patterns ONCE per actor in
    ``__init__`` (the stateful-stage discipline, SURVEY.md §7.3), scores
    each doc's lowercase token set against stopword profiles per batch.

    Use: ``ds.map_batches(LangIdStage, batch_format="pandas",
    concurrency=N, batch_size=B)``.
    """

    def __init__(self):
        self.word = re.compile(r"[a-z']+")
        self.profiles = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def predict_one(self, text: str) -> str:
        toks = self.word.findall((text or "").lower())
        if not toks:
            return "und"
        best, best_score = "und", 0
        for lang, stops in self.profiles.items():
            score = sum(1 for t in toks if t in stops)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # vectorized scoring: one tokenize pass, then per-lang isin +
        # grouped sum (C kernels) — no per-row Python scoring loop.
        # idxmax over the insertion-ordered columns reproduces
        # predict_one's 'first strictly-greater lang wins' tie-break.
        batch = batch.copy()
        toks = batch["text"].fillna("").str.lower().str.findall(self.word)
        ex = toks.explode().dropna()
        scores = pd.DataFrame(
            {
                lang: ex.isin(stops).groupby(level=0).sum()
                for lang, stops in self.profiles.items()
            }
        ).reindex(batch.index, fill_value=0)
        if scores.empty:
            batch["pred_lang"] = np.array([], dtype=object)
            return batch
        best = scores.idxmax(axis=1).to_numpy(dtype=object)
        batch["pred_lang"] = np.where(scores.max(axis=1).to_numpy() > 0, best, "und")
        return batch


# --- document fingerprinting (rolling hash) ---------------------------------

_B = np.uint64(1000003)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprint(text: str) -> int:
    """64-bit polynomial rolling hash of the whole document (deterministic
    content fingerprint; cheap near-exact dedup key). Codepoint-based —
    see fingerprint_batch."""
    h = np.uint64(1469598103934665603)
    data = np.frombuffer((text or "").encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    # Horner evaluation, vectorized in log(n) squaring-free chunks would be
    # overkill; per-doc this reduces to a tight numpy loop over chunks.
    with np.errstate(over="ignore"):  # uint64 wraparound is the point
        for chunk in np.array_split(data, max(1, len(data) // 4096)):
            for b in chunk:  # numpy scalar loop, C-boxed; docs are bounded
                h = ((h * _B) + b) & _MASK
    return int(h)


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Vectorized variant: one polynomial hash per row computed with numpy
    over the codepoint buffer (no per-character Python loop).

    Defined over unicode CODEPOINTS (utf-32 decode), not utf-8 bytes, so
    the DuckDB oracle can reproduce it exactly with
    ``unicode(x) FOR x IN split(text, '')`` + a UHUGEINT Horner fold."""
    texts = batch.column(text_col).to_pandas()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        data = np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        # Horner via cumulative powers: h = sum(b_i * B^(n-1-i)) + B^n
        n = len(data)
        if n == 0:
            out[i] = np.uint64(1469598103934665603)
            continue
        powers = np.empty(n, dtype=np.uint64)
        powers[0] = np.uint64(1)
        if n > 1:
            np.multiply.accumulate(np.full(n - 1, _B, dtype=np.uint64), out=powers[1:])
        with np.errstate(over="ignore"):  # uint64 wraparound intended
            acc = np.uint64(np.sum(data * powers[::-1], dtype=np.uint64))
            lead = np.uint64(1469598103934665603)
            bn = powers[-1] * _B  # lead * B^n
            out[i] = (lead * bn + acc) & _MASK
    return batch.append_column("fingerprint", pa.array(out.astype(np.int64)))


# --- PII redaction (vectorized regex scrub) ----------------------------------

#: RE2-safe patterns shared verbatim with the DuckDB oracle (both engines
#: compile RE2 — identical match semantics by construction).
EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"
LONGNUM_RE = r"[0-9]{6,}"


def redact_pii(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scrub email-shaped and long-digit-run substrings — the PII pass of
    a web-scale training-data pipeline. Vectorized end to end: pyarrow's
    re2 kernels (`count_substring_regex`, `replace_substring_regex`), no
    Python row loop. Emits per-doc match counts and the redacted length
    so downstream quality filters can gate on redaction density.

    Reference analog: the sentinel-value scrub of clean_data.py (M1/M12
    class) applied to text; order matters — emails first so their digit
    runs are not double-counted as long numbers.
    """
    text = pc.fill_null(batch.column(text_col), "")
    n_emails = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
    red = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    n_longnums = pc.cast(pc.count_substring_regex(red, LONGNUM_RE), pa.int64())
    red = pc.replace_substring_regex(red, LONGNUM_RE, "<NUM>")
    out = batch.append_column("n_emails", n_emails)
    out = out.append_column("n_longnums", n_longnums)
    out = out.append_column("red_len", pc.cast(pc.utf8_length(red), pa.int64()))
    return out
