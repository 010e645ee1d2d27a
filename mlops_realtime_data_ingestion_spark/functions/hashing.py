"""Engine-independent deterministic hashing for fuzzy dedup /
fingerprinting.

Spark's builtin hash functions (murmur3 ``hash``, ``xxhash64``) have
no DuckDB equivalent, so every hashed operator here is built from a
31-base polynomial fold mod p = 1e9+7 — pure BIGINT arithmetic that
any engine computes bit-identically. Each primitive has a Spark SQL
spelling and a DuckDB spelling generated from the same template, so
oracle queries replicate the exact computation.

Verified equivalences (see tests/test_extensions.py):
  fold('the') = 114801 in both engines.

Scale note: all of this stays inside whole-stage codegen on the Spark
side (higher-order functions over arrays, no Python). A production
deployment could swap the fold for ``xxhash64`` for speed — the
polynomial fold is the cross-engine-verifiable spelling of the same
plan shape.
"""

from __future__ import annotations

P = 1_000_000_007  # fold modulus
K_SIG = 16         # minhash signature length
N_BANDS = 4        # LSH bands (r = 4 rows/band)
# fixed odd multipliers/offsets for the k permutations (public
# random-looking constants; any fixed values < P work)
MINHASH_A = [
    1007563541, 849284693, 1137522359, 670114721, 541529747, 910989333,
    1251739111, 777777773, 433494437, 982451653, 141650963, 715225741,
    993319271, 257885161, 618258799, 370248451,
]
MINHASH_B = [
    15485863, 32452843, 49979687, 67867967, 86028121, 104395301,
    122949823, 141650939, 160481183, 179424673, 198491317, 217645177,
    236887691, 256203161, 275604541, 295075147,
]
# normalize a*x+b into [0,P): a reduced mod P first so a*h < 9.2e18
MINHASH_A = [a % P for a in MINHASH_A]
MINHASH_B = [b % P for b in MINHASH_B]


# ---------- tokens ----------

def spark_tokens(col: str) -> str:
    return f"filter(split(lower(trim({col})), '\\\\s+'), x -> x != '')"


def duck_tokens(col: str) -> str:
    return f"list_filter(string_split_regex(lower(trim({col})), '\\s+'), x -> x != '')"


# ---------- char-fold hash of a string expression ----------

def spark_str_hash(s: str) -> str:
    codes = f"transform(sequence(1, length({s})), i -> cast(ascii(substr({s}, i, 1)) as bigint))"
    return f"aggregate({codes}, 0L, (acc, c) -> (acc * 31 + c) % {P})"


def duck_str_hash(s: str) -> str:
    codes = f"list_transform(range(1, length({s}) + 1), i -> CAST(ascii(substring({s}, i, 1)) AS BIGINT))"
    return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), (acc, c) -> (acc * 31 + c) % {P})"


# ---------- token-hash arrays ----------

def spark_token_hashes(col: str) -> str:
    return f"transform({spark_tokens(col)}, t -> {spark_str_hash('t')})"


def duck_token_hashes(col: str) -> str:
    return f"list_transform({duck_tokens(col)}, t -> {duck_str_hash('t')})"


# ---------- second independent fold (wide fingerprints) ----------
# A single 30-bit fold space saturates at large corpora: with ~5e7
# shingle positions (the 100x checkpoint) the birthday bound yields
# ~6e5 colliding pairs, and operators whose OUTPUT is built from
# fingerprint equality (exact substring chaining) fabricate matches
# from every collision. Two independent folds packed into one BIGINT
# give a ~2^60 space (expected collisions < 1e-3 at 5e7 positions):
#   fp_wide = fold31_modP(x) * 2^30 + fold37_modP2(x)
# Both factors are < 2^30 (P, P2 < 2^30), so the packed value is
# < 2^60 — exact in BIGINT arithmetic in any engine.

P2 = 998_244_353   # second fold modulus (also < 2^30)
WIDE_SHIFT = 1 << 30


def spark_str_hash2(s: str) -> str:
    codes = f"transform(sequence(1, length({s})), i -> cast(ascii(substr({s}, i, 1)) as bigint))"
    return f"aggregate({codes}, 0L, (acc, c) -> (acc * 37 + c) % {P2})"


def duck_str_hash2(s: str) -> str:
    codes = f"list_transform(range(1, length({s}) + 1), i -> CAST(ascii(substring({s}, i, 1)) AS BIGINT))"
    return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), (acc, c) -> (acc * 37 + c) % {P2})"


def spark_token_hashes2(col: str) -> str:
    return f"transform({spark_tokens(col)}, t -> {spark_str_hash2('t')})"


def duck_token_hashes2(col: str) -> str:
    return f"list_transform({duck_tokens(col)}, t -> {duck_str_hash2('t')})"


# ---------- word n-gram shingle hashes from a token-hash array ----------

def _chain(terms: list[str]) -> str:
    """((t0*31 + t1) % P * 31 + t2) % P ..."""
    expr = terms[0]
    for t in terms[1:]:
        expr = f"(({expr}) * 31 + {t}) % {P}"
    return expr


def spark_shingle_hashes(h_arr: str, n: int) -> str:
    """Guarded: Spark sequence(1, 0) yields a DESCENDING sequence, so
    short docs must short-circuit to an empty array."""
    terms = [f"element_at(h, i + {j})" for j in range(n)]
    return (
        f"case when size({h_arr}) < {n} then array() "
        f"else transform(sequence(1, size({h_arr}) - {n - 1}), i -> {_chain(terms)}) end"
    )


def duck_shingle_hashes(h_arr: str, n: int) -> str:
    terms = [f"h[i + {j}]" for j in range(n)]
    return (
        f"list_transform(range(1, greatest(len({h_arr}) - {n - 2}, 1)), i -> {_chain(terms)})"
    )


def _chain2(terms: list[str]) -> str:
    """((t0*37 + t1) % P2 * 37 + t2) % P2 ..."""
    expr = terms[0]
    for t in terms[1:]:
        expr = f"(({expr}) * 37 + {t}) % {P2}"
    return expr


def spark_shingle_hashes_wide(h1: str, h2: str, n: int) -> str:
    """Packed two-fold shingle fingerprints: chain the base-31 hashes
    and the base-37 hashes independently, pack as hi * 2^30 + lo.
    Lambdas reference the two token-hash arrays as plain columns
    ``h`` and ``h2`` (caller materializes both)."""
    t1 = [f"element_at({h1}, i + {j})" for j in range(n)]
    t2 = [f"element_at({h2}, i + {j})" for j in range(n)]
    return (
        f"case when size({h1}) < {n} then array() "
        f"else transform(sequence(1, size({h1}) - {n - 1}),"
        f" i -> ({_chain(t1)}) * {WIDE_SHIFT} + ({_chain2(t2)})) end"
    )


def duck_shingle_hashes_wide(h1: str, h2: str, n: int) -> str:
    t1 = [f"{h1}[i + {j}]" for j in range(n)]
    t2 = [f"{h2}[i + {j}]" for j in range(n)]
    return (
        f"list_transform(range(1, greatest(len({h1}) - {n - 2}, 1)),"
        f" i -> ({_chain(t1)}) * {WIDE_SHIFT} + ({_chain2(t2)}))"
    )


# ---------- third independent fold (90-bit fingerprints) ----------
# The 60-bit packed space is collision-free to ~1e9 shingle positions
# (expected colliding pairs N^2/2^61 < 0.5); the true-100 TB operating
# point is ~1e12 positions, where 60 bits fabricates ~4e5 collisions
# — and the CHAINING operators turn each one into a fake exact match
# (SCALE.md, round 5: measured with the 30-bit space, fixed to 60).
# A third fold (base 41 mod P3) carried as a SECOND BIGINT column
# lifts the space to ~2^90: expected collisions at 1e12 positions
# ~N^2/2^91 ~ 4e-4. The pair (fp, fp3) is the chain key; values of fp
# are unchanged, so widening cannot move any sf-scale oracle result
# except by removing collisions that small fixtures don't have.

P3 = 999_999_937   # third fold modulus (< 2^30)


def spark_str_hash3(s: str) -> str:
    codes = f"transform(sequence(1, length({s})), i -> cast(ascii(substr({s}, i, 1)) as bigint))"
    return f"aggregate({codes}, 0L, (acc, c) -> (acc * 41 + c) % {P3})"


def duck_str_hash3(s: str) -> str:
    codes = f"list_transform(range(1, length({s}) + 1), i -> CAST(ascii(substring({s}, i, 1)) AS BIGINT))"
    return f"list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), (acc, c) -> (acc * 41 + c) % {P3})"


def spark_token_hashes3(col: str) -> str:
    return f"transform({spark_tokens(col)}, t -> {spark_str_hash3('t')})"


def duck_token_hashes3(col: str) -> str:
    return f"list_transform({duck_tokens(col)}, t -> {duck_str_hash3('t')})"


def _chain3(terms: list[str]) -> str:
    """((t0*41 + t1) % P3 * 41 + t2) % P3 ..."""
    expr = terms[0]
    for t in terms[1:]:
        expr = f"(({expr}) * 41 + {t}) % {P3}"
    return expr


def spark_shingle_hashes3(h3: str, n: int) -> str:
    """Third-fold 30-bit shingle array — carried alongside the packed
    60-bit ``*_wide`` array as the second half of a 90-bit chain key."""
    t3 = [f"element_at({h3}, i + {j})" for j in range(n)]
    return (
        f"case when size({h3}) < {n} then array() "
        f"else transform(sequence(1, size({h3}) - {n - 1}), i -> {_chain3(t3)}) end"
    )


def duck_shingle_hashes3(h3: str, n: int) -> str:
    t3 = [f"{h3}[i + {j}]" for j in range(n)]
    return (
        f"list_transform(range(1, greatest(len({h3}) - {n - 2}, 1)), i -> {_chain3(t3)})"
    )


# NOTE: both spellings reference the token-hash array as a plain
# column named `h` inside the lambda — callers materialize the token
# hashes as a column aliased `h` first (keeps the generated SQL
# readable and evaluates the token fold once).


# ---------- minhash signature / LSH band keys from shingle hashes ----------

def _perm(j: int, x: str) -> str:
    return f"({MINHASH_A[j]} * {x} + {MINHASH_B[j]}) % {P}"


def spark_minhash_sigs(s_arr: str) -> str:
    sigs = ", ".join(f"array_min(transform({s_arr}, x -> {_perm(j, 'x')}))" for j in range(K_SIG))
    return f"array({sigs})"


def duck_minhash_sigs(s_arr: str) -> str:
    sigs = ", ".join(f"list_min(list_transform({s_arr}, x -> {_perm(j, 'x')}))" for j in range(K_SIG))
    return f"[{sigs}]"


# ---------- random-hyperplane LSH bucket of a float vector ----------
# Plane j's weight at (1-based) dim i is a pseudo-random double in
# [-0.5, 0.5) derived from the same public constants:
#   w(j, i) = ((A(j) * i + B(j)) % P) / P - 0.5
# The bucket is the n-bit sign pattern of the plane dot products,
# computed as a SEQUENTIAL ascending fold in both engines so the
# doubles (and therefore the signs and the bucket) are bit-identical.


def plane_ab(j: int) -> tuple[int, int]:
    """Plane j's (A, B) constants. j < 16 reads the published arrays
    (unchanged — every existing bucket/JL expression keeps its
    values); j >= 16 extends them deterministically, cycling the
    arrays with a public odd multiplier / prime offset per wrap:
      A(j) = (A[j%16] * (2*(j//16) + 1)) % P
      B(j) = (B[j%16] + 7919 * (j//16)) % P
    Pure integer arithmetic on public constants, evaluated at
    expression-BUILD time — the baked literals are what Spark, DuckDB
    and the Arrow path all consume, so the engines cannot diverge."""
    k, t = j % len(MINHASH_A), j // len(MINHASH_A)
    if t == 0:
        return MINHASH_A[k], MINHASH_B[k]
    return (MINHASH_A[k] * (2 * t + 1)) % P, (MINHASH_B[k] + 7919 * t) % P


def _spark_plane_dot(vec: str, j: int) -> str:
    a, b = plane_ab(j)
    w = (
        f"(cast((cast({a} as bigint) * i + {b}) % {P} as double)"
        f" / cast({P} as double) - 0.5d)"
    )
    return (
        f"aggregate(sequence(1, size({vec})), cast(0.0 as double),"
        f" (acc, i) -> acc + cast(element_at({vec}, i) as double) * {w})"
    )


def _duck_plane_dot(vec: str, j: int) -> str:
    a, b = plane_ab(j)
    w = (
        f"(CAST((CAST({a} AS BIGINT) * i + {b}) % {P} AS DOUBLE)"
        f" / CAST({P} AS DOUBLE) - 0.5)"
    )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
        f" list_transform(range(1, len({vec}) + 1),"
        f" i -> CAST({vec}[i] AS DOUBLE) * {w})), (acc, v) -> acc + v)"
    )


def spark_hyperplane_bucket(vec: str, n_planes: int) -> str:
    bits = [
        f"(case when {_spark_plane_dot(vec, j)} >= 0.0d then {1 << j} else 0 end)"
        for j in range(n_planes)
    ]
    return f"cast({' + '.join(bits)} as int)"


def duck_hyperplane_bucket(vec: str, n_planes: int) -> str:
    bits = [
        f"(CASE WHEN {_duck_plane_dot(vec, j)} >= 0.0 THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    ]
    return f"CAST({' + '.join(bits)} AS INTEGER)"


# Multi-table variants: table t's bucket reads planes
# [t*n_planes, (t+1)*n_planes) — n_tables INDEPENDENT plane sets for
# OR-amplified LSH (a pair is a candidate if ANY table's buckets
# match). Table 0 equals the single-table bucket above.


def spark_hyperplane_bucket_table(vec: str, n_planes: int, table: int) -> str:
    bits = [
        f"(case when {_spark_plane_dot(vec, table * n_planes + j)} >= 0.0d"
        f" then {1 << j} else 0 end)"
        for j in range(n_planes)
    ]
    return f"cast({' + '.join(bits)} as int)"


def duck_hyperplane_bucket_table(vec: str, n_planes: int, table: int) -> str:
    bits = [
        f"(CASE WHEN {_duck_plane_dot(vec, table * n_planes + j)} >= 0.0"
        f" THEN {1 << j} ELSE 0 END)"
        for j in range(n_planes)
    ]
    return f"CAST({' + '.join(bits)} AS INTEGER)"


def spark_band_keys(sig_arr: str) -> str:
    r = K_SIG // N_BANDS
    bands = []
    for b in range(N_BANDS):
        terms = [f"element_at({sig_arr}, {b * r + j + 1})" for j in range(r)]
        bands.append(_chain(terms))
    return f"array({', '.join(bands)})"


def duck_band_keys(sig_arr: str) -> str:
    r = K_SIG // N_BANDS
    bands = []
    for b in range(N_BANDS):
        terms = [f"{sig_arr}[{b * r + j + 1}]" for j in range(r)]
        bands.append(_chain(terms))
    return f"[{', '.join(bands)}]"
