"""Text-analysis stages for large-scale training-data pipelines.

Vectorized ``map_batches`` transforms over a ``documents``-shaped table
(``doc_id``, ``text``, …): language ID, quality scoring, token counting,
document fingerprinting. These extend the reference's keyword/lang machinery
(``pkg/crawler/keywords.go``, ``web.go:3370-3401``) to the corpus-processing
operators a 100 TB training-data pipeline needs.

All functions are pandas-vectorized (string kernels) or numpy; per-row
Python only where an algorithm is inherently per-document (simhash over
token sets) — and then over small token arrays, inside the batch.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

from ..keywords import STOP_WORDS
from ..langid import detect_lang

_WORD_RE = re.compile(r"[A-Za-z0-9#@']+")
# BPE-ish token estimate: words + punctuation clusters, long words count ~1
# token per 4 chars (public rule of thumb for BPE vocabularies)
_PUNCT_RE = re.compile(r"[^\w\s]")


def token_count_stage(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate."""
    s = batch[text_col].fillna("")
    batch["ws_tokens"] = s.str.split().str.len().fillna(0).astype("int64")
    words = s.str.findall(_WORD_RE)
    batch["word_tokens"] = words.str.len().fillna(0).astype("int64")
    batch["bpe_est_tokens"] = (
        words.map(lambda ws: sum(max(1, (len(w) + 3) // 4) for w in ws))
        + s.str.count(_PUNCT_RE)
    ).astype("int64")
    return batch


def quality_stage(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Length / punctuation / stop-word-ratio quality signals + a composite
    score in [0, 1] (heuristic, deterministic)."""
    s = batch[text_col].fillna("")
    n_chars = s.str.len().astype("int64")
    words = s.str.lower().str.findall(_WORD_RE)
    n_words = words.str.len().fillna(0).astype("int64")
    stop = STOP_WORDS["en"]
    stop_hits = words.map(lambda ws: sum(1 for w in ws if w in stop))
    batch["n_chars"] = n_chars
    batch["n_words"] = n_words
    batch["punct_ratio"] = (
        s.str.count(_PUNCT_RE) / n_chars.clip(lower=1)
    ).round(6)
    batch["stopword_ratio"] = (stop_hits / n_words.clip(lower=1)).round(6)
    batch["mean_word_len"] = (
        words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
    ).round(6)
    length_ok = ((n_words >= 10) & (n_words <= 100_000)).astype(float)
    stop_ok = 1.0 - (batch["stopword_ratio"] - 0.4).abs().clip(upper=1.0)
    punct_ok = 1.0 - batch["punct_ratio"].clip(upper=1.0)
    batch["quality_score"] = ((length_ok + stop_ok + punct_ok) / 3.0).round(6)
    return batch


class LangIdStage:
    """Actor-pool language ID (state: marker tables built once)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = [detect_lang(t or "") for t in batch[self.text_col]]
        return batch


def fingerprint_stage(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact identity) + a 64-bit rolling Karp-Rabin-style hash."""
    s = batch[text_col].fillna("")
    norm = s.str.lower().str.split().str.join(" ")
    batch["fingerprint_md5"] = [
        hashlib.md5(t.encode("utf-8")).hexdigest() for t in norm
    ]
    batch["fingerprint_rolling"] = pd.Series(
        rolling_fingerprints(norm.tolist()), index=batch.index, dtype="int64"
    )
    return batch


_ROLL_B = 1000000007
_ROLL_M = (1 << 61) - 1  # Mersenne: (x << 31) mod M is a 61-bit rotation


def rolling_fingerprints(texts: list[str], window: int = 4096) -> np.ndarray:
    """Vectorized Karp-Rabin rolling hash h = (h*B + ord) mod (2^61-1) per
    doc, bit-identical to the scalar loop. One numpy step per character
    POSITION (over all docs at once) with overflow-free Mersenne mulmod:
    split h into 30/31-bit halves, rotate the high product by 31 within 61
    bits, fold."""
    n = len(texts)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    clipped = [t[:window] for t in texts]
    lens = np.fromiter((len(t) for t in clipped), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.zeros(n, dtype=np.int64)
    # sort docs by length DESC so the active set at each position is a
    # contiguous prefix (cheap slices, no fancy indexing)
    order = np.argsort(-lens, kind="stable")
    sorted_lens = lens[order]
    mat = np.zeros((n, maxlen), dtype=np.uint64)
    for row, i in enumerate(order):
        t = clipped[i]
        if t:
            mat[row, : len(t)] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            ).astype(np.uint64)
    M = np.uint64(_ROLL_M)
    B = np.uint64(_ROLL_B)
    LO30 = np.uint64((1 << 30) - 1)
    LO31 = np.uint64((1 << 31) - 1)
    h = np.zeros(n, dtype=np.uint64)
    # number of docs still active at position p = count(len > p); lens are
    # sorted desc, so it's a prefix length found by binary search
    for p in range(maxlen):
        k = int(np.searchsorted(-sorted_lens, -(p + 1), side="right"))
        if k == 0:
            break
        ha = h[:k]
        c = mat[:k, p]
        hi = ha >> np.uint64(31)            # < 2^30
        lo = ha & LO31                      # < 2^31
        t1 = hi * B                         # < 2^61
        t1 = (t1 & M) + (t1 >> np.uint64(61))
        t1 = np.where(t1 >= M, t1 - M, t1)
        t1r = ((t1 & LO30) << np.uint64(31)) | (t1 >> np.uint64(30))  # rotl31
        acc = t1r + lo * B + c              # < 2^63
        acc = (acc & M) + (acc >> np.uint64(61))
        acc = np.where(acc >= M, acc - M, acc)
        h[:k] = acc
    out = np.zeros(n, dtype=np.uint64)
    out[order] = h
    return out.astype(np.int64)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token md5 hashes (Charikar 2002). Scalar
    reference implementation — the batch path is ``simhash_batch``."""
    if not tokens:
        return 0
    v = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in tokens:
        h = np.uint64(
            int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        )
        bits = (h >> shifts) & np.uint64(1)
        v += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


# per-worker token-hash memo (tokens repeat heavily across documents); size
# capped so a pathological vocabulary cannot grow the worker heap unbounded
_TOKEN_HASH_MEMO: dict[str, int] = {}
_TOKEN_HASH_MEMO_CAP = 1_000_000
_BIT_SHIFTS = np.arange(64, dtype=np.uint64)
_BIT_POWS = np.uint64(1) << _BIT_SHIFTS


def simhash_batch(texts) -> np.ndarray:
    """Vectorized SimHash for a batch of texts → (N,) int64.

    One md5 per UNIQUE token in the batch (memoized per worker), then the
    ±1 bit accumulation runs as two numpy ops (gather + segmented reduce)
    instead of a Python loop per token. Bit-identical to ``simhash64`` on
    every document."""
    tok_lists = [(t or "").lower().split() for t in texts]
    n = len(tok_lists)
    lens = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    out = np.zeros(n, dtype=np.uint64)
    if total == 0:
        return out.astype(np.int64)
    flat = np.empty(total, dtype=object)
    pos = 0
    for tl in tok_lists:
        flat[pos : pos + len(tl)] = tl
        pos += len(tl)
    uniq, inv = np.unique(flat, return_inverse=True)
    hs = np.empty(len(uniq), dtype=np.uint64)
    memo = _TOKEN_HASH_MEMO
    for i, u in enumerate(uniq):
        v = memo.get(u)
        if v is None:
            v = int.from_bytes(hashlib.md5(u.encode("utf-8")).digest()[:8], "big")
            if len(memo) < _TOKEN_HASH_MEMO_CAP:
                memo[u] = v
        hs[i] = v
    contrib = (((hs[:, None] >> _BIT_SHIFTS[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1)
    per_tok = contrib[inv]  # (total, 64), ±1 per occurrence
    nonzero = lens > 0
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))[nonzero]
    v = np.add.reduceat(per_tok, offsets, axis=0)  # (n_nonzero, 64)
    out[nonzero] = ((v > 0).astype(np.uint64) * _BIT_POWS[None, :]).sum(axis=1)
    return out.astype(np.int64)


def line_dedup_stage(
    batch: pd.DataFrame, text_col: str = "text", line_words: int = 6
) -> pd.DataFrame:
    """Intra-document repetition removal (the within-doc half of corpus
    dedup): chunk the text into fixed-width ``line_words``-word lines, keep
    the FIRST occurrence of each repeated line, report the repetition
    ratio and an md5 of the deduped text. Splits on single spaces (not
    whitespace runs) so the SQL twin's ``string_split(text, ' ')`` sees
    identical tokens. Inherently per-document (order-preserving first-win),
    but each doc's work is O(lines) over small arrays inside the batch."""
    n_lines_l, n_dist_l, hashes = [], [], []
    for x in batch[text_col].fillna(""):
        words = x.split(" ") if x else []
        lines = [
            " ".join(words[i : i + line_words])
            for i in range(0, len(words), line_words)
        ]
        seen: dict[str, None] = {}
        for ln in lines:
            if ln not in seen:
                seen[ln] = None
        n_lines_l.append(len(lines))
        n_dist_l.append(len(seen))
        hashes.append(hashlib.md5("\n".join(seen).encode()).hexdigest())
    batch["n_lines"] = pd.array(n_lines_l, dtype="int64")
    batch["n_distinct_lines"] = pd.array(n_dist_l, dtype="int64")
    batch["dup_line_ratio"] = (
        (batch["n_lines"] - batch["n_distinct_lines"])
        / batch["n_lines"].clip(lower=1)
    ).round(6)
    batch["dedup_md5"] = hashes
    return batch


def simhash_stage(batch: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    batch["simhash"] = simhash_batch(batch[text_col].tolist())
    return batch


# Gopher-rule quality filter (public heuristics: Rae et al. 2021, §A1.1).
# Kept separate from quality_stage (the reference-shaped score): these are
# the corpus-admission RULES a pre-training pipeline applies.
GOPHER_STOP = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter_stage(
    batch: pd.DataFrame, text_col: str = "text"
) -> pd.DataFrame:
    """Per-doc Gopher admission signals + 0/1 rule flags + overall pass.
    Vectorized pandas string kernels; tokenizer = lowercase whitespace
    split (identical to the SQL twin)."""
    s = batch[text_col].fillna("")
    words = s.str.lower().str.split()
    n_words = words.str.len().fillna(0).astype("int64")
    wl_sum = words.map(lambda ws: sum(len(w) for w in ws))
    mean_wl = (wl_sum / n_words.clip(lower=1)).round(6)
    hash_cnt = s.str.count("#")
    ell_cnt = s.str.count(r"\.\.\.")
    sym_ratio = ((hash_cnt + ell_cnt) / n_words.clip(lower=1)).round(6)
    # ASCII [a-z] only (text is lowercased) — matches the SQL twin's
    # regexp; Unicode isalpha() would admit CJK scripts the rule excludes
    alpha = words.map(
        lambda ws: sum(1 for w in ws if any("a" <= c <= "z" for c in w))
    )
    alpha_frac = (alpha / n_words.clip(lower=1)).round(6)
    stop_hits = words.map(
        lambda ws: sum(1 for st in GOPHER_STOP if st in ws)
    ).astype("int64")

    out = pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(),
        "n_words": n_words,
        "mean_word_len": mean_wl,
        "symbol_ratio": sym_ratio,
        "alpha_word_frac": alpha_frac,
        "stop_hits": stop_hits,
    })
    out["rule_len"] = ((n_words >= 50) & (n_words <= 100_000)).astype("int64")
    out["rule_wl"] = ((mean_wl >= 3) & (mean_wl <= 10)).astype("int64")
    out["rule_sym"] = (sym_ratio < 0.1).astype("int64")
    out["rule_alpha"] = (alpha_frac > 0.8).astype("int64")
    out["rule_stop"] = (stop_hits >= 2).astype("int64")
    out["gopher_pass"] = (
        out[["rule_len", "rule_wl", "rule_sym", "rule_alpha", "rule_stop"]]
        .min(axis=1).astype("int64")
    )
    return out


def chunk_stage(
    batch: pd.DataFrame, chunk: int = 32, stride: int = 24,
    text_col: str = "text",
) -> pd.DataFrame:
    """Token-window chunking (embedding/RAG-style): one row per window of
    ``chunk`` whitespace tokens at ``stride`` spacing, starts while
    start < n_words (the trailing window may be short). md5 of the joined
    window verifies content without carrying the text."""
    ids, starts, ntoks, md5s = [], [], [], []
    for did, t in zip(batch["doc_id"].tolist(), batch[text_col].fillna("")):
        ws = [w for w in t.lower().split() if w]
        n = len(ws)
        # chunk count = 1 + ceil(max(n - chunk, 0) / stride): the first
        # window that reaches the end is the last (no redundant tail)
        st = 0
        while True:
            piece = ws[st : st + chunk]
            ids.append(did)
            starts.append(st)
            ntoks.append(len(piece))
            md5s.append(hashlib.md5(" ".join(piece).encode()).hexdigest())
            if st + chunk >= n:
                break
            st += stride
    return pd.DataFrame({
        "doc_id": pd.array(ids, dtype="int64"),
        "start_tok": pd.array(starts, dtype="int64"),
        "n_toks": pd.array(ntoks, dtype="int64"),
        "chunk_md5": md5s,
    })


def repetition_stats_stage(df: pd.DataFrame, dup_n: int = 5) -> pd.DataFrame:
    """Gopher repetition signals (Rae et al. 2021 §A1.1, public method):
    per doc, the occurrence count + coverage of the most-repeated word
    2-gram and 3-gram (ties → lexicographically smallest gram) and the
    number of token positions covered by any duplicated ``dup_n``-gram
    window. Integer/string outputs only, so the DuckDB twin reproduces
    them bit-for-bit. Streams — one map, nothing shuffles."""
    import collections

    ids, ntoks, chars = [], [], []
    top = {2: ([], []), 3: ([], [])}
    dupcov = []
    for doc_id, text in zip(df["doc_id"], df["text"]):
        toks = (str(text) if text is not None and text == text else "") \
            .lower().split()
        n = len(toks)
        ids.append(doc_id)
        ntoks.append(n)
        chars.append(len(" ".join(toks)))
        for g in (2, 3):
            grams, occs = top[g]
            if n < g:
                grams.append("")
                occs.append(0)
                continue
            cnt = collections.Counter(
                " ".join(toks[i : i + g]) for i in range(n - g + 1)
            )
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            grams.append(best[0])
            occs.append(best[1])
        if n < dup_n:
            dupcov.append(0)
            continue
        cnt5 = collections.Counter(
            " ".join(toks[i : i + dup_n]) for i in range(n - dup_n + 1)
        )
        covered = np.zeros(n, dtype=bool)
        for i in range(n - dup_n + 1):
            if cnt5[" ".join(toks[i : i + dup_n])] > 1:
                covered[i : i + dup_n] = True
        dupcov.append(int(covered.sum()))
    return pd.DataFrame({
        "doc_id": pd.array(ids, dtype="int64"),
        "n_toks": pd.array(ntoks, dtype="int64"),
        "total_chars": pd.array(chars, dtype="int64"),
        "top2": top[2][0],
        "top2_occ": pd.array(top[2][1], dtype="int64"),
        "top3": top[3][0],
        "top3_occ": pd.array(top[3][1], dtype="int64"),
        "dup5_tokens": pd.array(dupcov, dtype="int64"),
    })
