"""Vectorized (Arrow/numpy) implementations of the functions/hashing
integer math — bit-identical to the SQL spellings, ~10-50x faster.

Why a pandas UDF here when the guidance says built-ins first:
higher-order-function lambdas (aggregate/transform) evaluate
*interpreted* in Spark — they sit outside whole-stage codegen. The
polynomial fold over every character is exactly the worst case:
measured 44 s for 5000 docs on one core vs ~2 s vectorized. The
math is pure int64 arithmetic (products < 2^63), so numpy computes
the same values the SQL fold computes, bit for bit — asserted in
tests/test_extensions.py against the expression spelling.

The fold-to-dot identity: (((c0*31 + c1)*31 + c2)...) mod p
= sum(c_i * 31^(L-1-i)) mod p, with each term < 128 * p < 2^37 and
row sums < L * 2^37 — safe in int64 without intermediate mods for
L < 2^25.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import pandas as pd

from . import hashing as H

_MAX_POW = 4096  # longest token/text we hash exactly; beyond this, chunked

_POW31 = np.empty(_MAX_POW, dtype=np.int64)
_POW31[0] = 1
for _i in range(1, _MAX_POW):
    _POW31[_i] = (_POW31[_i - 1] * 31) % H.P

_POW37 = np.empty(_MAX_POW, dtype=np.int64)
_POW37[0] = 1
for _i in range(1, _MAX_POW):
    _POW37[_i] = (_POW37[_i - 1] * 37) % H.P2

_POW41 = np.empty(_MAX_POW, dtype=np.int64)
_POW41[0] = 1
for _i in range(1, _MAX_POW):
    _POW41[_i] = (_POW41[_i - 1] * 41) % H.P3

_A = np.array(H.MINHASH_A, dtype=np.int64)
_B = np.array(H.MINHASH_B, dtype=np.int64)


def str_hash(s: str) -> int:
    """Polynomial fold of a string (== H.spark_str_hash /
    H.duck_str_hash). Byte-level codes — identical to SQL ascii() for
    ASCII corpora (documented contract; the testdata is ASCII)."""
    if not s:
        return 0
    codes = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8).astype(np.int64)
    n = len(codes)
    if n <= _MAX_POW:
        # terms < 128 * p < 2^37; sum < 4096 * 2^37 < 2^63 — one mod
        return int((codes * _POW31[n - 1 :: -1]).sum() % H.P)
    h = 0
    for c in codes.tolist():  # rare long-text fallback
        h = (h * 31 + c) % H.P
    return h


_token_hash = lru_cache(maxsize=1 << 18)(str_hash)


def token_hashes(text: str) -> np.ndarray:
    """Hashes of whitespace tokens of lower(trim(text)).

    Token-level hashing is memoized (bounded LRU, worker-process
    scope): token frequency is Zipfian, so the vast majority of folds
    are repeats — measured 20x on the test corpus. Only TOKEN calls
    go through the cache (whole-text fingerprints would fill it with
    document-sized keys)."""
    toks = text.lower().strip().split()
    out = np.empty(len(toks), dtype=np.int64)
    for i, t in enumerate(toks):
        out[i] = _token_hash(t)
    return out


def shingle_hashes(h: np.ndarray, n: int = 2) -> np.ndarray:
    """Word n-gram chain hashes (== H.*_shingle_hashes)."""
    if len(h) < n:
        return np.empty(0, dtype=np.int64)
    acc = h[: len(h) - n + 1].copy()
    for j in range(1, n):
        acc = (acc * 31 + h[j : len(h) - n + 1 + j]) % H.P
    return acc


def str_hash2(s: str) -> int:
    """Second independent fold (base 37 mod P2 — see H.P2) for wide
    fingerprints; same dot-product identity, same bounds (terms
    < 128 * P2 < 2^37)."""
    if not s:
        return 0
    codes = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8).astype(np.int64)
    n = len(codes)
    if n <= _MAX_POW:
        return int((codes * _POW37[n - 1 :: -1]).sum() % H.P2)
    h = 0
    for c in codes.tolist():
        h = (h * 37 + c) % H.P2
    return h


_token_hash2 = lru_cache(maxsize=1 << 18)(str_hash2)


def token_hashes2(text: str) -> np.ndarray:
    toks = text.lower().strip().split()
    out = np.empty(len(toks), dtype=np.int64)
    for i, t in enumerate(toks):
        out[i] = _token_hash2(t)
    return out


def shingle_hashes2(h2: np.ndarray, n: int = 2) -> np.ndarray:
    """Second-fold n-gram chain (base 37 mod P2)."""
    if len(h2) < n:
        return np.empty(0, dtype=np.int64)
    acc = h2[: len(h2) - n + 1].copy()
    for j in range(1, n):
        acc = (acc * 37 + h2[j : len(h2) - n + 1 + j]) % H.P2
    return acc


def shingle_hashes_wide(h: np.ndarray, h2: np.ndarray, n: int = 2) -> np.ndarray:
    """Packed 60-bit fingerprints (== H.*_shingle_hashes_wide):
    fold31 * 2^30 + fold37, both factors < 2^30 so the product + sum
    is exact int64."""
    return shingle_hashes(h, n) * H.WIDE_SHIFT + shingle_hashes2(h2, n)


def str_hash3(s: str) -> int:
    """Third independent fold (base 41 mod P3 — see H.P3), the second
    half of the 90-bit chain key (same bounds: terms < 128*P3 < 2^37)."""
    if not s:
        return 0
    codes = np.frombuffer(s.encode("utf-8", "surrogatepass"), dtype=np.uint8).astype(np.int64)
    n = len(codes)
    if n <= _MAX_POW:
        return int((codes * _POW41[n - 1 :: -1]).sum() % H.P3)
    h = 0
    for c in codes.tolist():
        h = (h * 41 + c) % H.P3
    return h


_token_hash3 = lru_cache(maxsize=1 << 18)(str_hash3)


def token_hashes3(text: str) -> np.ndarray:
    toks = text.lower().strip().split()
    out = np.empty(len(toks), dtype=np.int64)
    for i, t in enumerate(toks):
        out[i] = _token_hash3(t)
    return out


def shingle_hashes3(h3: np.ndarray, n: int = 2) -> np.ndarray:
    """Third-fold n-gram chain (base 41 mod P3)."""
    if len(h3) < n:
        return np.empty(0, dtype=np.int64)
    acc = h3[: len(h3) - n + 1].copy()
    for j in range(1, n):
        acc = (acc * 41 + h3[j : len(h3) - n + 1 + j]) % H.P3
    return acc


def minhash_sigs(sh: np.ndarray) -> np.ndarray:
    """k=16 signature (== H.*_minhash_sigs)."""
    prods = (sh[None, :] * _A[:, None] + _B[:, None]) % H.P
    return prods.min(axis=1)


def band_keys(sig: np.ndarray) -> np.ndarray:
    r = H.K_SIG // H.N_BANDS
    out = np.empty(H.N_BANDS, dtype=np.int64)
    for b in range(H.N_BANDS):
        acc = np.int64(sig[b * r])
        for j in range(1, r):
            acc = (acc * 31 + sig[b * r + j]) % H.P
        out[b] = acc
    return out


def simhash(sh: np.ndarray, bits: int = 48) -> int:
    """48-bit simhash over shingle hashes (== operators.dedup
    formulation: vote on bit (i%30) of (th*(1+2i) + 97i) mod p)."""
    if len(sh) == 0:
        return 0
    i = np.arange(bits, dtype=np.int64)
    perm = (sh[:, None] * (1 + 2 * i)[None, :] + (97 * i)[None, :]) % H.P
    votes = ((perm >> (i % 30)[None, :]) & 1) * 2 - 1
    v = votes.sum(axis=0)
    return int(((v >= 0).astype(np.int64) << i).sum())


# ---------- pandas-UDF column transforms ----------

def token_hash_series(texts: pd.Series) -> pd.Series:
    """Per-row array of token hashes (== H.*_token_hashes order —
    NOT deduplicated; chunking needs positional token order)."""
    return texts.map(lambda t: token_hashes(t or ""))


def shingle_series(texts: pd.Series, n: int = 2) -> pd.Series:
    return texts.map(
        lambda t: np.unique(shingle_hashes(token_hashes(t or ""), n))
    )


def sig_band_series(sh_series: pd.Series) -> pd.Series:
    return sh_series.map(lambda sh: band_keys(minhash_sigs(np.asarray(sh, dtype=np.int64))))


def simhash_series(texts: pd.Series, n: int = 2, bits: int = 48) -> pd.Series:
    return texts.map(lambda t: simhash(shingle_hashes(token_hashes(t or ""), n), bits))


def fingerprint_series(texts: pd.Series) -> pd.Series:
    import re

    return texts.map(lambda t: str_hash(re.sub(r"\s+", " ", (t or "").lower().strip())))


def hyperplane_keys_series(
    embs: pd.Series, n_planes: int, n_tables: int
) -> pd.Series:
    """Per-row array of ``n_tables`` hyperplane bucket keys (table t =
    sign pattern of planes [t*n_planes, (t+1)*n_planes)) — the Arrow
    fast path for H.spark_hyperplane_bucket_table, bit-identical to
    the fold spelling (asserted in tests/test_round9_plans.py): the
    per-plane dot accumulates float64 terms in ascending-dim order
    (vectorized ACROSS rows, sequential across dims — the same
    operation sequence per element as the SQL fold), and the plane
    weights are the same baked (A(j)*i + B(j)) % P integers divided
    in float64. Requires a fixed embedding dim per batch (the
    embeddings-table contract)."""
    X = np.stack([np.asarray(v, dtype=np.float64) for v in embs])
    n, dim = X.shape
    out = np.zeros((n, n_tables), dtype=np.int32)
    for t in range(n_tables):
        bucket = np.zeros(n, dtype=np.int32)
        for j in range(n_planes):
            a, b = H.plane_ab(t * n_planes + j)
            acc = np.zeros(n, dtype=np.float64)
            for i in range(1, dim + 1):
                w = ((a * i + b) % H.P) / H.P - 0.5
                acc = acc + X[:, i - 1] * w
            bucket = bucket | ((acc >= 0.0).astype(np.int32) << j)
        out[:, t] = bucket
    return pd.Series(list(out))


# ---------- whole-batch-vectorized chunking/shingling ----------

def _pow_table(base: int, mod: int, n: int) -> np.ndarray:
    """base^k mod `mod` for k in [0, n) — extends the module tables
    when a batch carries a document longer than _MAX_POW tokens."""
    out = np.empty(n, dtype=np.int64)
    out[0] = 1
    for i in range(1, n):
        out[i] = (out[i - 1] * base) % mod
    return out


def shingle_position_rows(
    ids: pd.Series, texts: pd.Series, n: int, wide: bool = False
) -> pd.DataFrame:
    """Per-POSITION shingle rows (id, n_tokens, p, fp[, fp3]) for a
    batch of documents — the Arrow fast path of operators.curation
    ._shingle_positions, bit-identical to both existing spellings
    (same 1-based position p, same n-gram chain folds, same
    fp = fold31 * 2^30 + fold37 packing for ``wide``; asserted equal
    in tests/test_round12_plans.py).

    Vectorized across the WHOLE batch like cdc_chunk_rows, not per
    doc: all token hashes concatenate into one array; the valid
    n-gram start positions of every document become one index vector;
    each chain fold is n-1 elementwise multiply-adds over that vector
    (identical operation sequence per element as shingle_hashes, so
    identical int64 values — acc < p < 2^30, acc*31 + h < 2^36, exact).
    No per-doc Python in the fold or the explode: the frame comes out
    already position-exploded, so the Spark plan skips the
    posexplode + arrays_zip the per-doc path needs.

    Docs with fewer than n tokens emit no rows (the posexplode of an
    empty shingle array); empty batches return an empty frame with
    the right dtypes. p and n_tokens are int32 to match the
    posexplode/size spelling's column types exactly."""
    h_all: list[np.ndarray] = []
    h2_all: list[np.ndarray] = []
    h3_all: list[np.ndarray] = []
    keep_ids: list = []
    sizes: list[int] = []
    for doc_id, text in zip(ids, texts):
        if text is None:
            continue
        h = token_hashes(text)
        if len(h) < n:
            continue
        h_all.append(h)
        if wide:
            h2_all.append(token_hashes2(text))
            h3_all.append(token_hashes3(text))
        keep_ids.append(doc_id)
        sizes.append(len(h))
    cols = ["id", "n_tokens", "p", "fp"] + (["fp3"] if wide else [])
    if not sizes:
        empty = {
            "id": pd.Series([], dtype=ids.dtype),
            "n_tokens": pd.Series([], dtype=np.int32),
            "p": pd.Series([], dtype=np.int32),
            "fp": pd.Series([], dtype=np.int64),
        }
        if wide:
            empty["fp3"] = pd.Series([], dtype=np.int64)
        return pd.DataFrame(empty)
    hc = np.concatenate(h_all)
    sz = np.asarray(sizes, dtype=np.int64)
    doc_starts = np.zeros(len(sz), dtype=np.int64)
    np.cumsum(sz[:-1], out=doc_starts[1:])
    m = sz - n + 1  # valid n-gram starts per doc (all >= 1 here)
    tot = int(m.sum())
    # 0-based position of each output row inside its document
    first_row = np.zeros(len(m), dtype=np.int64)
    np.cumsum(m[:-1], out=first_row[1:])
    p0 = np.arange(tot, dtype=np.int64) - np.repeat(first_row, m)
    starts = np.repeat(doc_starts, m) + p0

    # Fold over the FULL concatenated array with contiguous slices,
    # then select the in-doc starts with ONE gather per fold. The
    # slice spelling keeps every pass sequential-memory (a gather per
    # fold step — hc[starts + j] — measured 1.45x SLOWER on the
    # chains row at 100x). Positions whose n-gram crosses a document
    # boundary compute a meaningless fold, but `starts` never selects
    # them, and each selected fold sees exactly its own document's n
    # hashes — the identical multiply-add sequence as shingle_hashes,
    # so identical int64 values.
    def chain_fold(arr: np.ndarray, base: int, mod: int) -> np.ndarray:
        L = len(arr) - n + 1
        acc = arr[:L].copy()
        for j in range(1, n):
            acc = (acc * base + arr[j : L + j]) % mod
        return acc[starts]

    out = {
        "id": pd.Series(keep_ids, dtype=ids.dtype)
        .repeat(m)
        .reset_index(drop=True),
        "n_tokens": np.repeat(sz, m).astype(np.int32),
        "p": (p0 + 1).astype(np.int32),
    }
    acc = chain_fold(hc, 31, H.P)
    if wide:
        acc2 = chain_fold(np.concatenate(h2_all), 37, H.P2)
        out["fp"] = acc * H.WIDE_SHIFT + acc2
        out["fp3"] = chain_fold(np.concatenate(h3_all), 41, H.P3)
    else:
        out["fp"] = acc
    return pd.DataFrame(out)[cols]


def cdc_chunk_rows(
    ids: pd.Series, texts: pd.Series, divisor: int
) -> pd.DataFrame:
    """Per-CHUNK rows (id, n_tokens, fp, fp3, clen) for a batch of
    documents — the Arrow fast path of operators.curation
    .cdc_chunk_dedup's chunking projection, bit-identical to the SQL
    spelling (same cut rule: a boundary falls after 1-based token i,
    i < n_tokens, when h[i] % divisor == 0; same three folds; same
    fp = fold31 * 2^30 + fold37 packing; asserted equal in
    tests/test_round11_plans.py).

    Vectorized across the WHOLE batch, not per doc: all token hashes
    concatenate into one array; chunk starts are one boolean mask
    (doc starts union post-boundary positions); each fold is one
    pow-weighted elementwise product + one np.add.reduceat over the
    chunk starts. Per-term products are < 2^30 * 2^30 impossible —
    terms are (h * pow) % mod < 2^30 each, so a reduceat sum over a
    chunk of L tokens is < L * 2^30, exact in int64 for L < 2^33.
    Docs with zero tokens are dropped (the SQL path's size >= 1
    filter); empty batches return an empty frame with the right
    dtypes."""
    h_all: list[np.ndarray] = []
    h2_all: list[np.ndarray] = []
    h3_all: list[np.ndarray] = []
    keep_ids: list = []
    sizes: list[int] = []
    for doc_id, text in zip(ids, texts):
        if text is None:
            continue
        h = token_hashes(text)
        if len(h) == 0:
            continue
        h_all.append(h)
        h2_all.append(token_hashes2(text))
        h3_all.append(token_hashes3(text))
        keep_ids.append(doc_id)
        sizes.append(len(h))
    if not sizes:
        return pd.DataFrame(
            {
                "id": pd.Series([], dtype=ids.dtype),
                "n_tokens": pd.Series([], dtype=np.int64),
                "fp": pd.Series([], dtype=np.int64),
                "fp3": pd.Series([], dtype=np.int64),
                "clen": pd.Series([], dtype=np.int64),
            }
        )
    hc = np.concatenate(h_all)
    h2c = np.concatenate(h2_all)
    h3c = np.concatenate(h3_all)
    n = len(hc)
    sz = np.asarray(sizes, dtype=np.int64)
    doc_starts = np.zeros(len(sz), dtype=np.int64)
    np.cumsum(sz[:-1], out=doc_starts[1:])
    doc_last = doc_starts + sz - 1
    # chunk-start mask: every doc start, plus the position AFTER any
    # non-final token whose hash is divisible by `divisor`
    is_start = np.zeros(n, dtype=bool)
    is_start[doc_starts] = True
    cut_after = (hc % divisor == 0)
    cut_after[doc_last] = False  # a cut after the last token is a no-op
    is_start[np.flatnonzero(cut_after) + 1] = True
    starts = np.flatnonzero(is_start)
    ends = np.empty(len(starts), dtype=np.int64)
    ends[:-1] = starts[1:] - 1
    ends[-1] = n - 1
    # exponent of each position inside its chunk: en(chunk) - pos
    pos = np.arange(n, dtype=np.int64)
    en_of_pos = np.repeat(ends, ends - starts + 1)
    e = en_of_pos - pos
    max_e = int(e.max()) + 1
    if max_e <= _MAX_POW:
        p31, p37, p41 = _POW31, _POW37, _POW41
    else:
        p31 = _pow_table(31, H.P, max_e)
        p37 = _pow_table(37, H.P2, max_e)
        p41 = _pow_table(41, H.P3, max_e)
    f1 = np.add.reduceat((hc * p31[e]) % H.P, starts) % H.P
    f2 = np.add.reduceat((h2c * p37[e]) % H.P2, starts) % H.P2
    f3 = np.add.reduceat((h3c * p41[e]) % H.P3, starts) % H.P3
    chunks_per_doc = np.add.reduceat(is_start.astype(np.int64), doc_starts)
    return pd.DataFrame(
        {
            "id": pd.Series(keep_ids, dtype=ids.dtype).repeat(
                chunks_per_doc
            ).reset_index(drop=True),
            "n_tokens": np.repeat(sz, chunks_per_doc),
            "fp": f1 * H.WIDE_SHIFT + f2,
            "fp3": f3,
            "clen": ends - starts + 1,
        }
    )
