"""Text-analysis stages for a training-data pipeline: token counting,
quality scoring, language ID, document fingerprinting.

All are actor-pool ``map_batches`` stages (regexes / tables compiled
once per actor in ``__init__``), vectorized with pandas string kernels
where possible.
"""

from __future__ import annotations


import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from openmldb_ray.context import pool_concurrency

_STOP_EN = {
    "the", "and", "of", "a", "to", "in", "is", "it", "that", "for", "on",
    "with", "as", "was", "at", "by", "an", "be", "this", "are", "or",
}
_STOP_DE = {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"}
_STOP_FR = {"le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que"}
_STOP_ES = {"el", "la", "los", "las", "y", "es", "un", "una", "no", "por"}


def _ws_mask(b: np.ndarray) -> np.ndarray:
    """Whitespace mask over a flat UTF-8 byte buffer, matching Python
    ``str.split`` semantics: ASCII \\s plus \\x1c-\\x1f, plus the
    multi-byte whitespace codepoints — lead AND continuation bytes
    marked. (0xC2/0xE1/0xE2/0xE3 are lead-only values in valid
    UTF-8.)"""
    wsish = (b == 32) | ((b >= 9) & (b <= 13)) | ((b >= 28) & (b <= 31))
    n = len(b)
    idx = np.flatnonzero(b == 0xC2)
    idx = idx[idx + 1 < n]
    sel = idx[(b[idx + 1] == 0x85) | (b[idx + 1] == 0xA0)]
    wsish[sel] = True
    wsish[sel + 1] = True
    for lead, check in (
            (0xE1, lambda b1, b2: (b1 == 0x9A) & (b2 == 0x80)),
            (0xE2, lambda b1, b2:
                ((b1 == 0x80) & (((b2 >= 0x80) & (b2 <= 0x8A))
                                 | (b2 == 0xA8) | (b2 == 0xA9)
                                 | (b2 == 0xAF)))
                | ((b1 == 0x81) & (b2 == 0x9F))),
            (0xE3, lambda b1, b2: (b1 == 0x80) & (b2 == 0x80))):
        idx = np.flatnonzero(b == lead)
        idx = idx[idx + 2 < n]
        sel = idx[check(b[idx + 1], b[idx + 2])]
        wsish[sel] = True
        wsish[sel + 1] = True
        wsish[sel + 2] = True
    return wsish


def _string_buffers(col):
    """(flat_bytes, per-row offsets, arrow array) for a string column
    — zero-copy views of the Arrow buffers, nulls as empty strings."""
    import pyarrow.compute as pc
    if not isinstance(col, (pa.Array, pa.ChunkedArray)):
        col = pa.array(col, pa.string())
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    odt = np.int64 if col.type == pa.large_string() else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=odt,
                         count=len(col) + 1, offset=col.offset
                         * np.dtype(odt).itemsize).astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    base = offs[0]
    return data[base:offs[-1]], offs - base, col


class TokenCount:
    """whitespace token count + a BPE-ish sub-word estimate
    (words + extra splits at case/digit/punct boundaries).

    The sub-word count is the number of matches of
    ``[A-Z][a-z]+|[a-z]+|[A-Z]+(?![a-z])|\\d+|[^\\sA-Za-z0-9]`` —
    computed WITHOUT running the regex: a match count equals a
    token-START count, and every start is a character-class transition
    (new digit run, new upper run, upper->lower camel split, lower not
    preceded by a letter, any punct char). The kernel runs over the
    raw UTF-8 byte buffer of the Arrow string column — zero-copy, no
    decode: ASCII classes are byte compares, continuation bytes are
    skipped, multi-byte chars classify as punct except the 17
    multi-byte whitespace codepoints, matched by lead-byte pattern.
    The same pass yields the whitespace word count. Equality with the
    regex / str.split is pytest-verified (tests/test_text_ops.py)."""

    ARROW_OK = True

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def _counts_from_bytes(b: np.ndarray, offs: np.ndarray):
        """(n_words, n_bpe_tokens) per row from the flat UTF-8 buffer
        ``b`` and per-row byte offsets ``offs`` (len = rows + 1)."""
        nrows = len(offs) - 1
        if len(b) == 0:
            z = np.zeros(nrows, dtype=np.int64)
            return z, z.copy()
        isU = (b >= 65) & (b <= 90)
        isl = (b >= 97) & (b <= 122)
        isd = (b >= 48) & (b <= 57)
        wsish = _ws_mask(b)
        cont = (b >= 0x80) & (b < 0xC0)
        n = len(b)
        char_start = ~cont
        starts = np.zeros(n, dtype=bool)
        starts[offs[:-1][offs[:-1] < n]] = True

        def prev(m):
            p = np.empty_like(m)
            p[0] = False
            p[1:] = m[:-1]
            p[starts] = False
            return p

        nxt_l = np.empty_like(isl)
        nxt_l[-1] = False
        nxt_l[:-1] = isl[1:]
        si = np.flatnonzero(starts)
        si = si[si > 0]
        nxt_l[si - 1] = False          # row ends have no next char
        prevU, prevl, prevd = prev(isU), prev(isl), prev(isd)
        isp = char_start & ~(isU | isl | isd | wsish)
        token_start = (isp
                       | (isd & ~prevd)
                       | (isU & ~prevU)
                       | (isU & prevU & nxt_l)
                       | (isl & ~prevU & ~prevl))
        word_start = char_start & ~wsish & (prev(wsish) | starts)
        # dtype=int64 matters: numpy's bool cumsum without it is ~11x
        # slower (per-element cast path)
        cs_t = np.empty(n + 1, dtype=np.int64)
        cs_t[0] = 0
        np.cumsum(token_start, dtype=np.int64, out=cs_t[1:])
        cs_w = np.empty(n + 1, dtype=np.int64)
        cs_w[0] = 0
        np.cumsum(word_start, dtype=np.int64, out=cs_w[1:])
        return (cs_w[offs[1:]] - cs_w[offs[:-1]],
                cs_t[offs[1:]] - cs_t[offs[:-1]])

    def _counts(self, col) -> tuple[np.ndarray, np.ndarray]:
        """Accepts an Arrow (chunked) string array or a list of str."""
        b, offs, _ = _string_buffers(col)
        return self._counts_from_bytes(b, offs)

    def __call__(self, batch):
        if isinstance(batch, pa.Table):
            nw, nb = self._counts(batch[self.text_col])
            return (batch.append_column("n_words", pa.array(nw))
                    .append_column("n_bpe_tokens", pa.array(nb)))
        nw, nb = self._counts(batch[self.text_col].tolist())
        batch["n_words"] = nw
        batch["n_bpe_tokens"] = nb
        return batch


class QualityScore:
    """Heuristic document quality: length, mean word length,
    punctuation / digit / uppercase ratios, stopword ratio. The exact
    formulas are chosen to be reproducible in ANSI SQL for the oracle."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        n_chars = s.str.len().astype("int64")
        words = s.str.split()
        n_words = words.str.len().astype("int64")
        nw = n_words.replace(0, 1)
        batch["n_chars"] = n_chars
        batch["n_words"] = n_words
        batch["avg_word_len"] = (n_chars - (n_words - 1).clip(lower=0)) / nw
        nc = n_chars.replace(0, 1)
        batch["digit_ratio"] = s.str.count(r"\d") / nc
        batch["upper_ratio"] = s.str.count(r"[A-Z]") / nc
        batch["punct_ratio"] = s.str.count(r"[.,;:!?]") / nc
        batch["stop_ratio"] = _stopword_counts(s, _STOP_EN) / nw
        return batch


def _stopword_counts(s: pd.Series, table: set[str]) -> np.ndarray:
    """Whitespace-token stopword count per text, vectorized: one
    C-backed regex count over the lowercased text instead of a Python
    loop per word. Tokens are whitespace-delimited (a token with
    trailing punctuation does not match — same as ``w.lower() in
    table``)."""
    pat = r"(?:(?<=\s)|^)(?:" + "|".join(sorted(table)) + r")(?=\s|$)"
    return s.str.lower().str.count(pat).to_numpy()


class LangId:
    """Tiny stopword-vote language ID over {en,de,fr,es}; 'und'
    (undetermined) when no stopwords hit. A deterministic heuristic —
    a stand-in with the exact Ray plumbing a fasttext-style model stage
    would have (model load + regex compile once per actor); the vote is
    vectorized (one regex count per language per batch, argmax)."""

    LANGS = ("en", "de", "fr", "es")
    EXPENSIVE_INIT = True   # the model-load stand-in: actor pool

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.tables = [_STOP_EN, _STOP_DE, _STOP_FR, _STOP_ES]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        s = batch[self.text_col].fillna("")
        counts = np.stack([_stopword_counts(s, t) for t in self.tables])
        best = counts.argmax(axis=0)  # first max wins = priority order
        pred = np.array(self.LANGS, dtype=object)[best]
        pred[counts.max(axis=0) == 0] = "und"
        batch[self.out_col] = pred
        return batch


class Fingerprint:
    """64-bit rolling-hash document fingerprint (polynomial fold of the
    per-word FNV hashes, ``functions.hashing.doc_fingerprints``) —
    stable across runs/processes/nodes; the key for exact dedup.
    Batch-vectorized (one Arrow split + numpy segment reduction per
    batch, no per-char Python). Accepts Arrow or pandas batches."""

    ARROW_OK = True

    def __init__(self, text_col: str = "text", out_col: str = "fingerprint"):
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch):
        from openmldb_ray.functions.hashing import doc_fingerprints
        if isinstance(batch, pa.Table):
            fp = doc_fingerprints(batch[self.text_col])
            return batch.append_column(self.out_col, pa.array(fp))
        fp = doc_fingerprints(batch[self.text_col].tolist())
        batch[self.out_col] = fp
        return batch


class RepetitionScore:
    """Duplicate word-bigram fraction — the Gopher/RefinedWeb intra-
    document repetition quality rule: heavily repetitive documents
    (boilerplate, keyword stuffing, templated spam) show a high
    ``dup_bigram_ratio = 1 - distinct_bigrams / bigrams``.

    Fully vectorized over the batch: one Arrow whitespace split + flat
    FNV word hashes (functions.hashing), adjacent-pair bigram hashes
    masked at document boundaries, then a single lexsort counts
    distinct bigrams per document (no per-document Python). 64-bit
    bigram hashes stand in for the exact strings (collision odds at
    corpus scale ~2^-30 per batch; the DuckDB oracle compares exact
    values and agrees)."""

    ARROW_OK = True

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def _scores(self, texts):
        from openmldb_ray.functions.hashing import word_hashes_batch
        wh, doc_off = word_hashes_batch(texts)
        ndocs = len(doc_off) - 1
        counts = (doc_off[1:] - doc_off[:-1]).astype(np.int64)
        n_bi = np.maximum(counts - 1, 0)
        distinct = np.zeros(ndocs, dtype=np.int64)
        if len(wh) > 1:
            doc_of_word = np.repeat(np.arange(ndocs), counts)
            same_doc = doc_of_word[:-1] == doc_of_word[1:]
            with np.errstate(over="ignore"):
                bh = wh[:-1] * np.uint64(0x100000001B3) ^ wh[1:]
            bh = bh[same_doc]
            bdoc = doc_of_word[:-1][same_doc]
            if len(bh):
                order = np.lexsort((bh, bdoc))
                sb, sd = bh[order], bdoc[order]
                first = np.concatenate(
                    ([True], (sd[1:] != sd[:-1]) | (sb[1:] != sb[:-1])))
                distinct = np.bincount(sd[first], minlength=ndocs)
        ratio = np.where(n_bi > 0, 1.0 - distinct / np.maximum(n_bi, 1),
                         0.0)
        return n_bi, distinct.astype(np.int64), np.round(ratio, 6)

    def __call__(self, batch):
        if isinstance(batch, pa.Table):
            n_bi, distinct, ratio = self._scores(batch[self.text_col])
            batch = batch.append_column("n_bigrams", pa.array(n_bi))
            batch = batch.append_column("n_distinct_bigrams",
                                        pa.array(distinct))
            return batch.append_column("dup_bigram_ratio",
                                       pa.array(ratio))
        n_bi, distinct, ratio = self._scores(
            batch[self.text_col].tolist())
        batch["n_bigrams"] = n_bi
        batch["n_distinct_bigrams"] = distinct
        batch["dup_bigram_ratio"] = ratio
        return batch


class PiiRedact:
    """PII masking over the text column: email / SSN-shaped / IPv4 /
    phone-shaped spans replaced with typed placeholder tokens, plus a
    per-document ``pii_count``. Patterns are RE2-compatible (no
    lookarounds) and run through Arrow's C++ regex kernels
    (``replace_substring_regex`` / ``count_substring_regex``) —
    zero-copy batches, no Python per row, zero shuffle. The same
    patterns run verbatim in DuckDB ``regexp_replace`` (also RE2), the
    pytest cross-check.

    Patterns apply IN ORDER (email first so its local part can't be
    half-eaten by the numeric rules); counts are taken before any
    replacement, per pattern on the original text."""

    ARROW_OK = True
    # (name, pattern, replacement) — applied top to bottom
    PATTERNS = (
        ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
         "<EMAIL>"),
        ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
        ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
        ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    )

    def __init__(self, text_col: str = "text", out_col: str | None = None,
                 tag_only: bool = False):
        self.text_col = text_col
        self.out_col = out_col or text_col
        self.tag_only = tag_only

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = pc.fill_null(batch[self.text_col], "")
        total = np.zeros(batch.num_rows, dtype=np.int64)
        out = col
        for _, pat, repl in self.PATTERNS:
            total += pc.count_substring_regex(col, pattern=pat) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            if not self.tag_only:
                out = pc.replace_substring_regex(out, pattern=pat,
                                                 replacement=repl)
        if not self.tag_only:
            if self.out_col in batch.column_names:
                batch = batch.set_column(
                    batch.column_names.index(self.out_col),
                    self.out_col, out)
            else:
                batch = batch.append_column(self.out_col, out)
        return batch.append_column("pii_count", pa.array(total))


class GopherRules:
    """The Gopher corpus quality rules (Rae et al. 2021, §A1.1):
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (``#`` / ``...``), bullet-line and ellipsis-line fractions,
    fraction of words containing an alphabetic character, and the
    required-stop-word rule (>= 2 of the 8 listed words). Emits one
    boolean per rule plus the conjunction ``gopher_pass``; with
    ``drop_failing=True`` drops failing documents instead.

    Vectorized: word / char / alpha-word counts come from one pass
    over the raw UTF-8 byte buffer (``_byte_stats`` — the regex
    equivalents measured 10x the whole stage); the line/symbol/stop
    rules are Arrow C++ RE2 kernels. No per-document Python; accepts
    Arrow (zero-copy) or pandas batches."""

    REQUIRED_STOPS = ("the", "be", "to", "of", "and", "that", "have",
                      "with")

    def __init__(self, text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_avg_word_len: float = 3.0,
                 max_avg_word_len: float = 10.0,
                 max_symbol_ratio: float = 0.1,
                 max_bullet_frac: float = 0.9,
                 max_ellipsis_frac: float = 0.3,
                 min_alpha_frac: float = 0.8,
                 min_stop_hits: int = 2,
                 drop_failing: bool = False):
        self.text_col = text_col
        self.min_words, self.max_words = min_words, max_words
        self.min_awl, self.max_awl = min_avg_word_len, max_avg_word_len
        self.max_symbol_ratio = max_symbol_ratio
        self.max_bullet_frac = max_bullet_frac
        self.max_ellipsis_frac = max_ellipsis_frac
        self.min_alpha_frac = min_alpha_frac
        self.min_stop_hits = min_stop_hits
        self.drop_failing = drop_failing

    ARROW_OK = True

    @staticmethod
    def _byte_stats(col):
        """(n_words, n_nonspace_chars, n_alpha_words) per row in one
        pass over the flat UTF-8 buffer — the two rules that are slow
        as regex counts (word splitting, \\S counting) come from byte
        classes instead; multi-byte chars count once (lead byte)."""
        b, offs, _ = _string_buffers(col)
        nrows = len(offs) - 1
        if len(b) == 0:
            z = np.zeros(nrows, dtype=np.int64)
            return z, z.copy(), z.copy()
        wsish = _ws_mask(b)
        cont = (b >= 0x80) & (b < 0xC0)
        nonspace_char = ~cont & ~wsish
        prev_ws = np.empty(len(b), dtype=bool)
        prev_ws[0] = True
        prev_ws[1:] = wsish[:-1]
        row_start = offs[:-1][offs[:-1] < len(b)]
        prev_ws[row_start] = True
        word_start = nonspace_char & prev_ws
        # per-row word / nonspace-char counts via cumsum at offsets
        cs_w = np.empty(len(b) + 1, dtype=np.int64)
        cs_w[0] = 0
        np.cumsum(word_start, dtype=np.int64, out=cs_w[1:])
        cs_c = np.empty(len(b) + 1, dtype=np.int64)
        cs_c[0] = 0
        np.cumsum(nonspace_char, dtype=np.int64, out=cs_c[1:])
        n_words = cs_w[offs[1:]] - cs_w[offs[:-1]]
        n_chars = cs_c[offs[1:]] - cs_c[offs[:-1]]
        # words containing >= 1 ASCII alpha byte: scatter alpha bytes
        # onto their word id, then count flagged words per row
        isalpha = ((b >= 65) & (b <= 90)) | ((b >= 97) & (b <= 122))
        total_words = int(cs_w[-1])
        alpha_word = np.zeros(total_words, dtype=bool)
        wid = cs_w[1:][isalpha] - 1     # word id of each alpha byte
        alpha_word[wid] = True
        cs_a = np.concatenate(([0], np.cumsum(alpha_word,
                                              dtype=np.int64)))
        w_at = cs_w[offs]               # words before each row bound
        n_alpha = cs_a[w_at[1:]] - cs_a[w_at[:-1]]
        return n_words, n_chars, n_alpha

    def __call__(self, batch):
        import pyarrow.compute as pc
        is_pd = isinstance(batch, pd.DataFrame)
        tbl = pa.Table.from_pandas(batch, preserve_index=False) \
            if is_pd else batch
        col = pc.fill_null(tbl[self.text_col], "")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_words, nonspace, n_alpha = self._byte_stats(col)
        nw = np.maximum(n_words, 1)

        def cnt(kernel, **kw):
            return kernel(col, **kw).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
        symbols = cnt(pc.count_substring, pattern="#") \
            + cnt(pc.count_substring, pattern="...")
        n_lines = cnt(pc.count_substring, pattern="\n") + 1
        bullet_lines = cnt(pc.count_substring_regex,
                           pattern=r"(?:^|\n)[ \t]*[•\-\*] ")
        ellipsis_lines = cnt(pc.count_substring_regex,
                             pattern=r"\.\.\.[ \t]*(\n|$)")
        low = pc.utf8_lower(col)
        stop_hits = np.zeros(len(col), dtype=np.int64)
        for w in self.REQUIRED_STOPS:
            stop_hits += pc.match_substring_regex(
                low, pattern=rf"\b{w}\b").to_numpy(
                zero_copy_only=False).astype(np.int64)
        r_words = (n_words >= self.min_words) & \
            (n_words <= self.max_words)
        avg_wl = nonspace / nw
        r_awl = (avg_wl >= self.min_awl) & (avg_wl <= self.max_awl)
        r_symbol = symbols / nw <= self.max_symbol_ratio
        r_bullet = bullet_lines / n_lines <= self.max_bullet_frac
        r_ellipsis = ellipsis_lines / n_lines <= self.max_ellipsis_frac
        r_alpha = 1.0 - (n_words - n_alpha) / nw >= self.min_alpha_frac
        r_stops = stop_hits >= self.min_stop_hits
        ok = (r_words & r_awl & r_symbol & r_bullet & r_ellipsis
              & r_alpha & r_stops)
        if self.drop_failing:
            out = tbl.filter(pa.array(ok))
            return out.to_pandas() if is_pd else out
        for name, arr in (
                ("rule_word_count", r_words),
                ("rule_avg_word_len", r_awl),
                ("rule_symbol_ratio", r_symbol),
                ("rule_bullet_lines", r_bullet),
                ("rule_ellipsis_lines", r_ellipsis),
                ("rule_alpha_words", r_alpha),
                ("rule_stop_words", r_stops),
                ("gopher_pass", ok)):
            tbl = tbl.append_column(name, pa.array(arr))
        return tbl.to_pandas() if is_pd else tbl


def with_text_features(ds: ray.data.Dataset, stages, batch_size: int = 4096,
                       concurrency: int | None = None) -> ray.data.Dataset:
    """Chain text stages. Stages that declare ``ARROW_OK`` take
    zero-copy Arrow batches; the rest need pandas ``.str`` kernels and
    get the (one) conversion. Stages declaring ``EXPENSIVE_INIT``
    (model loads — LangId is the stand-in) run as actor pools so setup
    amortizes; trivial-init stages run as task pools (instances), which
    pipeline better and skip pool spin-up."""
    for cls in stages:
        fmt = "pyarrow" if getattr(cls, "ARROW_OK", False) else "pandas"
        if getattr(cls, "EXPENSIVE_INIT", False):
            ds = ds.map_batches(cls, batch_format=fmt,
                                batch_size=batch_size,
                                concurrency=concurrency
                                or pool_concurrency())
        else:
            ds = ds.map_batches(cls(), batch_format=fmt,
                                batch_size=batch_size,
                                concurrency=concurrency)
    return ds
