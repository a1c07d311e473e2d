"""DuckDB oracle SQL generators.

Every Spark SQL expression builder in clann_spark.functions has a
DuckDB-dialect twin here with a bit-identity contract (verified in
tests/test_hashing.py). The driver's correctness gate runs these
against the same parquet tables and hash-compares results, so names,
types and values must match the Spark side exactly.

DuckDB 1.0 notes (verified in this sandbox):
  - list comprehensions `[f(x) for x in l]` and `range(a, b)` as a
    scalar list function;
  - 1-based string indexing `s[i]` and inclusive list slicing `l[a:b]`;
  - no strtol/conv: hex is parsed manually (duck_h60);
  - list_sum of BIGINT widens to HUGEINT -> cast back explicitly.
"""

from __future__ import annotations

from clann_spark.config import MINHASH_PRIME, SIMHASH_BITS, DedupConfig

# ---------------------------------------------------------------------------


def duck_h60(s_expr: str) -> str:
    """First 60 bits of md5 as BIGINT (parity: Spark conv/substring)."""
    return (
        f"list_sum([(strpos('0123456789abcdef', (md5({s_expr}))[i]) - 1)::BIGINT "
        f"* (1::BIGINT << (4 * (15 - i))) for i in range(1, 16)])::BIGINT"
    )


def duck_words(text_col: str) -> str:
    # explicit ASCII whitespace class — parity with text.WS_SQL_CLASS
    # (RE2 \s and Java \s disagree on \x0B and Unicode spaces)
    return (
        f"list_filter(string_split_regex(lower({text_col}), "
        f"'[ \\t\\n\\x0B\\f\\r]+'), w -> w <> '')"
    )


def duck_shingles(text_col: str, k: int) -> str:
    return duck_shingles_from_words(duck_words(text_col), k)


def duck_shingles_from_words(words_expr: str, k: int) -> str:
    """Shingles from an already-computed words column (CTE-friendly —
    inlining duck_words here would re-tokenize per shingle).

    coalesce: DuckDB array_to_string([]) is NULL where Spark concat_ws
    yields ''."""
    w = words_expr
    return (
        f"list_distinct([coalesce(array_to_string(({w})[i : i + {k - 1}], ' '), '') "
        f"for i in range(1, greatest(1, len({w}) - {k} + 1) + 1)])"
    )


def duck_shingle_hashes(shingles_expr: str, prime: int = MINHASH_PRIME) -> str:
    return f"list_distinct([{duck_h60('s')} % {prime} for s in {shingles_expr}])"


def duck_minhash(hashes_expr: str, cfg: DedupConfig) -> str:
    """array of 31-bit hashes -> signature list (num_perm BIGINTs)."""
    p = cfg.prime
    perms = ", ".join(f"[{a}::BIGINT, {b}::BIGINT]" for a, b in cfg.perms)
    return (
        f"[list_min([(q[1] * h + q[2]) % {p} for h in {hashes_expr}])::BIGINT "
        f"for q in [{perms}]]"
    )


def duck_bands(sig_expr: str, cfg: DedupConfig) -> str:
    """signature list -> band-hash list (one 60-bit BIGINT per band)."""
    r = cfg.rows_per_band
    key = (
        f"j::VARCHAR || '-' || "
        f"array_to_string(({sig_expr})[(j * {r} + 1):(j * {r} + {r})], '-')"
    )
    return f"[{duck_h60(key)} for j in range(0, {cfg.bands})]"


def duck_word_hashes(text_col: str) -> str:
    w = duck_words(text_col)
    return f"list_distinct([{duck_h60('w')} for w in list_distinct({w})])"


def duck_simhash(word_hashes_expr: str, bits: int = SIMHASH_BITS) -> str:
    hs = word_hashes_expr
    return (
        f"CASE WHEN len({hs}) = 0 THEN 0::BIGINT ELSE "
        f"list_sum([CASE WHEN 2 * len(list_filter({hs}, h -> (h >> j) & 1 = 1)) "
        f">= len({hs}) THEN (1::BIGINT << j) ELSE 0::BIGINT END "
        f"for j in range(0, {bits})])::BIGINT END"
    )


def duck_jaccard(a_expr: str, b_expr: str) -> str:
    """Exact Jaccard on two hash-set lists, as DOUBLE."""
    return (
        f"(len(list_intersect({a_expr}, {b_expr}))::DOUBLE / "
        f"len(list_distinct(list_concat({a_expr}, {b_expr}))))"
    )


def duck_cosdist(x: str, y: str) -> str:
    """Cosine distance 1 - x.y/(|x||y|) between two DOUBLE[] lists.

    Same dot-then-divide shape as the Spark fold expression; outputs are
    compared after round(, 6-9) so engine-level summation-order noise
    (<=1e-12 on 64-dim unit-scale vectors) cannot surface."""
    return (
        f"(1 - list_sum(list_transform(range(1, len({x}) + 1), i -> {x}[i] * {y}[i])) / "
        f"(sqrt(list_sum(list_transform({x}, v -> v * v))) * "
        f"sqrt(list_sum(list_transform({y}, v -> v * v)))))"
    )


def duck_gonzalez_ctes(k: int) -> str:
    """Unrolled greedy k-center (Gonzalez, gmm.rs:21-63 semantics) as a
    CTE chain over a preceding CTE ``pts(vec_id, v DOUBLE[])``:

      c0 = lowest vec_id (the Spark query samples in id order, so its
           row 0 is the same point);
      c_i = the point with max distance to its nearest chosen center,
            ties to the lowest vec_id (np.argmax takes the first max);
      centers(cid, v) = the k chosen centers in selection order.

    Requires the clause to be appended after 'pts' inside WITH.

    Every d_i is MATERIALIZED: each is referenced twice (by c_{i+1} and
    d_{i+1}), and DuckDB's default CTE inlining would re-evaluate the
    whole chain per reference — 2^k blowup (measured: 162 s -> 0.4 s on
    500 vectors at k=8). centers likewise, for multi-consumer oracles."""
    parts = [
        "c0 AS (SELECT v FROM pts ORDER BY vec_id LIMIT 1)",
        f"d0 AS MATERIALIZED (SELECT p.vec_id, p.v, {duck_cosdist('p.v', 'c.v')} AS d FROM pts p, c0 c)",
    ]
    for i in range(1, k):
        parts.append(
            f"c{i} AS (SELECT vec_id, v FROM d{i - 1} ORDER BY d DESC, vec_id ASC LIMIT 1)"
        )
        if i < k - 1:
            parts.append(
                f"d{i} AS MATERIALIZED (SELECT p.vec_id, p.v, least(p.d, {duck_cosdist('p.v', 'c.v')}) AS d "
                f"FROM d{i - 1} p, c{i} c)"
            )
    union = " UNION ALL ".join(
        ["SELECT 0 AS cid, v FROM c0"]
        + [f"SELECT {i} AS cid, v FROM c{i}" for i in range(1, k)]
    )
    parts.append(f"centers AS MATERIALIZED ({union})")
    return ", ".join(parts)
