r"""DuckDB oracle SQL builders for the dedup / textstats pipelines.

Each builder returns ANSI-ish DuckDB SQL that replays the corresponding
Ray pipeline exactly — same md5-derived token hashes, same mod-2^32
polynomial folds, same (a*g+b) mod 2^31-1 minhash family (coefficients
inlined from the identical seeded RNG), same LSH banding, verification
thresholds and min-label connected components (via recursive CTE).  The
driver runs these side-by-side with ``queries()`` at sf0.01; hash-equal
output is the correctness gate for pipelines that round 1 left
``no_oracle`` (VERDICT.md "Next round" #6).

All arithmetic stays within signed 64-bit: token hashes < 2^32, fold
accumulators < 2^32, minhash values < 2^31, products < 2^62.

Known, deliberate divergences from the Ray pipelines (ADVICE r2):

- **Bucket cap**: the Python near-dup pipelines cap LSH buckets wider
  than ``bucket_cap`` (default 256) to an anchor star
  (``ops/dedup.py``), while these SQL ``cand`` CTEs generate *all*
  in-bucket pairs.  On corpora with a mega-bucket the two legitimately
  diverge; the driver's sf0.01 test data stays far below the cap, which
  is why the cross-check is valid there.  Restrict oracle comparisons
  to corpora whose widest bucket is below the cap.
- **ASCII vs Unicode regex**: DuckDB's RE2 ``\s``/``\w``/``[A-Z]`` are
  ASCII-only while Python's ``str.split()``/``re``/``isupper()`` are
  Unicode-aware.  The oracles are exact on ASCII corpora (the driver's
  synthetic tables) and may diverge on non-ASCII text.
"""

from __future__ import annotations

from .ops.dedup import (
    BAND_C1,
    BAND_C2,
    FOLD_P,
    MASK32,
    P31,
    hyperplanes,
    minhash_family,
)

M32 = MASK32 + 1  # 2^32

def tok_pos(source: str = "documents") -> str:
    """Whitespace tokenization with 1-based positions (matches
    str.split()) over any (doc_id, text) relation."""
    return rf"""
raw AS (
  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') arr FROM {source}
),
tokpos AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS p
  FROM raw
),
tok AS (
  SELECT doc_id, term,
         row_number() OVER (PARTITION BY doc_id ORDER BY p) AS pos
  FROM tokpos WHERE term <> ''
)
"""


# backwards-compatible constant form
TOK_POS = tok_pos("documents")

# 32-bit md5-derived token hash (dedup.md5_hash32)
TH32 = """
th AS (
  SELECT doc_id, pos,
         ('0x' || substring(md5(term), 1, 8))::BIGINT AS h
  FROM tok
)
"""


def _cc_sql(edges_cte: str, node_src: str, id_col: str) -> str:
    """Recursive min-label connected components over ``edges_cte`` rows
    (ida, idb); survivors = ids of ``node_src`` that are not non-root
    members of any component."""
    return f"""
bi AS (
  SELECT ida AS u, idb AS v FROM {edges_cte}
  UNION ALL
  SELECT idb, ida FROM {edges_cte}
),
reach(u, v) AS (
  SELECT u, v FROM bi
  UNION
  SELECT r.u, b.v FROM reach r JOIN bi b ON r.v = b.u
),
roots AS (
  SELECT u AS node, least(u, min(v)) AS root FROM reach GROUP BY u
),
drops AS (SELECT node FROM roots WHERE node != root)
SELECT {id_col} FROM {node_src}
WHERE {id_col} NOT IN (SELECT node FROM drops)
ORDER BY {id_col}
"""


def minhash_dedup_sql(
    num_hashes: int = 128,
    num_bands: int = 32,
    threshold: float = 0.8,
    shingle_k: int = 3,
    seed: int = 1234,
    verify: str = "estimate",
    source: str = "documents",
    prelude: str = "",
) -> str:
    """``verify="estimate"`` replays minhash_lsh_dedup (matching-signature
    fraction); ``verify="exact"`` replays ngram_jaccard_dedup (distinct
    gram-set intersection-over-union on the same candidates).  ``source``
    is the (doc_id, text) relation to dedup; ``prelude`` injects extra
    CTEs before it (used by curated_corpus_sql to define the filtered
    subset)."""
    a, b = minhash_family(num_hashes, seed)
    fam_rows = ", ".join(
        f"({i}, {int(a[i])}, {int(b[i])})" for i in range(num_hashes)
    )
    r = num_hashes // num_bands
    assert shingle_k == 3, "oracle written for word 3-grams"
    return f"""
WITH RECURSIVE
{prelude}{tok_pos(source)},
{TH32},
hl AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs, count(*) AS n
  FROM th GROUP BY doc_id
),
g3 AS (
  SELECT x.doc_id,
         ((((x.h * {FOLD_P} + y.h) % {M32}) * {FOLD_P} + z.h) % {M32}) AS g
  FROM th x
  JOIN th y ON y.doc_id = x.doc_id AND y.pos = x.pos + 1
  JOIN th z ON z.doc_id = x.doc_id AND z.pos = x.pos + 2
),
grams AS (
  SELECT doc_id, g FROM g3
  UNION ALL
  SELECT d.doc_id,
         CASE WHEN coalesce(hl.n, 0) = 0 THEN 0
              ELSE list_reduce(hl.hs,
                               (x, y) -> (x * {FOLD_P} + y) % {M32})
         END AS g
  FROM {source} d LEFT JOIN hl USING (doc_id)
  WHERE coalesce(hl.n, 0) < {shingle_k}
),
fam(i, fa, fb) AS (VALUES {fam_rows}),
sig AS (
  SELECT doc_id, i, min((fa * (g % {P31}) + fb) % {P31}) AS m
  FROM grams CROSS JOIN fam GROUP BY doc_id, i
),
bandlists AS (
  SELECT doc_id, (i // {r})::BIGINT AS b, list(m ORDER BY i) AS lm
  FROM sig GROUP BY doc_id, i // {r}
),
bkey AS (
  SELECT doc_id, b,
         list_reduce(list_prepend(b + 1, lm),
                     (x, y) -> (x * {BAND_C1} + y) % {M32}) AS k1,
         list_reduce(list_prepend(b + 1, lm),
                     (x, y) -> (x * {BAND_C2} + y) % {M32}) AS k2
  FROM bandlists
),
cand AS (
  SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
  FROM bkey x JOIN bkey y
    ON x.b = y.b AND x.k1 = y.k1 AND x.k2 = y.k2 AND x.doc_id < y.doc_id
),
{_minhash_edges_sql(verify, threshold)},
{_cc_sql("edges", source, "doc_id")}
"""


def curated_corpus_sql(
    min_quality: float = 0.3,
    languages: tuple[str, ...] = ("en",),
    threshold: float = 0.8,
) -> str:
    """Replay of ops.curate.curate_corpus: quality gate -> language gate
    -> exact dedup -> MinHash near-dup dedup, as one composed query (the
    gates as CTEs, the dedups as the existing oracle blocks applied to
    the filtered subset)."""
    from .ops.textstats import _LANG_PROFILES

    stop_lit = ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES["en"]))
    profile_rows = ", ".join(
        f"('{lg}', '{w}')"
        for lg in sorted(_LANG_PROFILES)
        for w in sorted(_LANG_PROFILES[lg])
    )
    lang_lit = ", ".join(f"'{lg}'" for lg in languages)
    prelude = rf"""
q0 AS (
  SELECT doc_id, text, length(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS arr
  FROM documents
),
qsig AS (
  SELECT doc_id, text,
         least(greatest(len(arr) / 50.0, 0), 1) * 0.3
         + least(greatest(((CASE WHEN len(arr) = 0 THEN 0.0
              ELSE list_sum(list_transform(arr, x -> length(x))) * 1.0
                   / len(arr) END) - 1.0) / 9.0, 0), 1) * 0.2
         + (1.0 - least(greatest(len(regexp_extract_all(text, '[^\w\s]'))
              * 1.0 / greatest(1, n_chars) * 4.0, 0), 1)) * 0.2
         + least(greatest((CASE WHEN len(arr) = 0 THEN 0.0
              ELSE len(list_filter(arr, x -> list_contains([{stop_lit}],
                                                           lower(x)))) * 1.0
                   / len(arr) END) * 4.0, 0), 1) * 0.2
         + (1.0 - least(greatest(len(regexp_extract_all(text, '[A-Z]'))
              * 1.0 / greatest(1, n_chars) * 5.0, 0), 1)) * 0.1 AS score
  FROM q0
),
prof(lang, word) AS (VALUES {profile_rows}),
lwords AS (
  SELECT doc_id, unnest(list_transform(arr, x -> lower(x))) AS w FROM q0
),
lcnt AS (
  SELECT t.doc_id, p.lang,
         coalesce(sum(CASE WHEN pw.word IS NOT NULL THEN 1 ELSE 0 END), 0)
             AS hits
  FROM (SELECT DISTINCT doc_id FROM q0) t
  CROSS JOIN (SELECT DISTINCT lang FROM prof) p
  LEFT JOIN lwords wd ON wd.doc_id = t.doc_id
  LEFT JOIN prof pw ON pw.lang = p.lang AND pw.word = wd.w
  GROUP BY t.doc_id, p.lang
),
lbest AS (
  SELECT doc_id, lang, ratio,
         row_number() OVER (
           PARTITION BY doc_id ORDER BY ratio DESC, lang DESC) AS rk
  FROM (SELECT c.doc_id, c.lang,
               CASE WHEN len(q.arr) = 0 THEN 0.0
                    ELSE c.hits * 1.0 / len(q.arr) END AS ratio
        FROM lcnt c JOIN q0 q USING (doc_id))
),
lcjk AS (
  SELECT doc_id,
         length(text) - length(regexp_replace(text,
             '[\x{{3040}}-\x{{30FF}}]', '', 'g')) AS kana,
         length(text) - length(regexp_replace(text,
             '[\x{{AC00}}-\x{{D7A3}}\x{{1100}}-\x{{11FF}}\x{{3130}}-\x{{318F}}]',
             '', 'g')) AS hangul,
         length(text) - length(regexp_replace(text,
             '[\x{{4E00}}-\x{{9FFF}}]', '', 'g')) AS han,
         greatest(1, length(text)) AS nc
  FROM q0
),
ldet AS (
  SELECT b.doc_id,
         CASE WHEN c.kana * 1.0 / c.nc >= 0.05 THEN 'ja'
              WHEN c.hangul * 1.0 / c.nc >= 0.05 THEN 'ko'
              WHEN c.han * 1.0 / c.nc >= 0.05 THEN 'zh'
              WHEN ratio = 0.0 THEN 'und' ELSE lang END AS detected
  FROM lbest b JOIN lcjk c USING (doc_id) WHERE rk = 1
),
gated AS (
  SELECT q.doc_id, q.text FROM qsig q JOIN ldet l USING (doc_id)
  WHERE q.score >= {min_quality} AND l.detected IN ({lang_lit})
),
exmin AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY text),
filtered AS (SELECT g.doc_id, g.text FROM gated g JOIN exmin USING (doc_id)),
"""
    return minhash_dedup_sql(threshold=threshold, source="filtered",
                             prelude=prelude)


def _minhash_edges_sql(verify: str, threshold: float) -> str:
    if verify == "estimate":
        return f"""
edges AS (
  SELECT c.ida, c.idb
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.ida
  JOIN sig sb ON sb.doc_id = c.idb AND sb.i = sa.i
  GROUP BY c.ida, c.idb
  HAVING avg(CASE WHEN sa.m = sb.m THEN 1.0 ELSE 0.0 END) >= {threshold}
)"""
    assert verify == "exact"
    return f"""
gd AS (SELECT DISTINCT doc_id, g FROM grams),
gn AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY doc_id),
inter AS (
  SELECT c.ida, c.idb, count(*) AS i
  FROM cand c
  JOIN gd x ON x.doc_id = c.ida
  JOIN gd y ON y.doc_id = c.idb AND y.g = x.g
  GROUP BY c.ida, c.idb
),
edges AS (
  SELECT c.ida, c.idb
  FROM cand c
  JOIN gn na ON na.doc_id = c.ida
  JOIN gn nb ON nb.doc_id = c.idb
  LEFT JOIN inter i ON i.ida = c.ida AND i.idb = c.idb
  WHERE coalesce(i.i, 0) * 1.0
        / (na.n + nb.n - coalesce(i.i, 0)) >= {threshold}
)"""


def simhash_dedup_sql(max_hamming: int = 3) -> str:
    return f"""
WITH RECURSIVE
{TOK_POS},
tf64 AS (
  SELECT doc_id,
         ('0x' || substring(md5(term), 1, 16))::UBIGINT AS h,
         count(*) AS tf
  FROM tok GROUP BY doc_id, term
),
bits AS (
  SELECT doc_id, i.range AS i,
         sum(CASE WHEN (h >> i.range::BIGINT) & 1 = 1 THEN tf ELSE -tf END)
             AS vote
  FROM tf64 CROSS JOIN range(0, 64) i
  GROUP BY doc_id, i.range
),
fpbands AS (
  SELECT doc_id, (i // 16)::BIGINT AS b,
         sum(CASE WHEN vote > 0 THEN (1::BIGINT << (i % 16)::INT)
             ELSE 0 END)::BIGINT AS bv
  FROM bits GROUP BY doc_id, i // 16
),
allbands AS (
  SELECT d.doc_id, r.range::BIGINT AS b, coalesce(f.bv, 0) AS bv
  FROM documents d CROSS JOIN range(0, 4) r
  LEFT JOIN fpbands f ON f.doc_id = d.doc_id AND f.b = r.range
),
cand AS (
  SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
  FROM allbands x JOIN allbands y
    ON x.b = y.b AND x.bv = y.bv AND x.doc_id < y.doc_id
),
fp4 AS (
  SELECT doc_id, list(bv ORDER BY b) AS l FROM allbands GROUP BY doc_id
),
edges AS (
  SELECT c.ida, c.idb
  FROM cand c
  JOIN fp4 fa ON fa.doc_id = c.ida
  JOIN fp4 fb ON fb.doc_id = c.idb
  WHERE bit_count(xor(fa.l[1]::UBIGINT, fb.l[1]::UBIGINT))
      + bit_count(xor(fa.l[2]::UBIGINT, fb.l[2]::UBIGINT))
      + bit_count(xor(fa.l[3]::UBIGINT, fb.l[3]::UBIGINT))
      + bit_count(xor(fa.l[4]::UBIGINT, fb.l[4]::UBIGINT)) <= {max_hamming}
),
{_cc_sql("edges", "documents", "doc_id")}
"""


def embedding_dedup_sql(
    dim: int,
    threshold: float = 0.97,
    num_planes: int = 16,
    num_bands: int = 4,
    seed: int = 99,
) -> str:
    planes = hyperplanes(dim, num_planes, seed)
    ppb = num_planes // num_bands

    def plane_lit(p: int) -> str:
        return "[" + ", ".join(repr(float(x)) for x in planes[:, p]) + "]"

    bit_cols = ",\n         ".join(
        f"CASE WHEN list_dot_product(emb, {plane_lit(p)}) > 0 "
        f"THEN 1 ELSE 0 END AS b{p}"
        for p in range(num_planes)
    )
    band_rows = []
    for b in range(num_bands):
        expr = " + ".join(
            f"{1 << j} * b{b * ppb + j}" for j in range(ppb)
        )
        band_rows.append(
            f"SELECT vec_id, {b * (1 << ppb)} + {expr} AS k FROM bits"
        )
    bands_union = "\n  UNION ALL\n  ".join(band_rows)
    return f"""
WITH RECURSIVE
emb AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
bits AS (
  SELECT vec_id,
         {bit_cols}
  FROM emb
),
kb AS (
  {bands_union}
),
cand AS (
  SELECT DISTINCT x.vec_id AS ida, y.vec_id AS idb
  FROM kb x JOIN kb y ON x.k = y.k AND x.vec_id < y.vec_id
),
edges AS (
  SELECT c.ida, c.idb
  FROM cand c
  JOIN emb a ON a.vec_id = c.ida
  JOIN emb b ON b.vec_id = c.idb
  WHERE list_cosine_similarity(a.emb, b.emb) >= {threshold}
),
{_cc_sql("edges", "embeddings", "vec_id")}
"""


def fingerprints_rolling_sql(window: int = 8) -> str:
    return f"""
WITH
{TOK_POS},
{TH32},
hl AS (
  SELECT doc_id, list(h ORDER BY pos) AS hs, count(*) AS n
  FROM th GROUP BY doc_id
),
fp AS (
  SELECT doc_id,
         CASE WHEN n < {window}
              THEN list_reduce(hs, (x, y) -> (x * {FOLD_P} + y) % {M32})
              ELSE list_min(
                [list_reduce(list_slice(hs, p, p + {window} - 1),
                             (x, y) -> (x * {FOLD_P} + y) % {M32})
                 for p in generate_series(1, n - {window} + 1)])
         END AS fp
  FROM hl
)
SELECT d.doc_id, md5(d.text) AS content_md5,
       coalesce(f.fp, 0)::BIGINT AS rolling_fingerprint
FROM documents d
LEFT JOIN fp f USING (doc_id)
ORDER BY d.doc_id
"""


def quality_full_sql() -> str:
    from .ops.textstats import _LANG_PROFILES

    stop_lit = ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES["en"]))
    return rf"""
WITH toks AS (
  SELECT doc_id, text, length(text) AS n_chars,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS arr
  FROM documents
),
base AS (
  SELECT doc_id, n_chars, len(arr) AS n_tokens,
         CASE WHEN len(arr) = 0 THEN 0.0
              ELSE list_sum(list_transform(arr, x -> length(x))) * 1.0
                   / len(arr) END AS mean_token_len,
         len(regexp_extract_all(text, '[^\w\s]')) * 1.0
             / greatest(1, n_chars) AS punct_ratio,
         CASE WHEN len(arr) = 0 THEN 0.0
              ELSE len(list_filter(arr, x -> list_contains([{stop_lit}],
                                                           lower(x)))) * 1.0
                   / len(arr) END AS stopword_ratio,
         len(regexp_extract_all(text, '[A-Z]')) * 1.0
             / greatest(1, n_chars) AS upper_ratio
  FROM toks
)
SELECT doc_id, n_chars, n_tokens,
       round(mean_token_len, 6) AS mean_token_len,
       round(punct_ratio, 6) AS punct_ratio,
       round(stopword_ratio, 6) AS stopword_ratio,
       round(upper_ratio, 6) AS upper_ratio,
       round(
         least(greatest(n_tokens / 50.0, 0), 1) * 0.3
         + least(greatest((mean_token_len - 1.0) / 9.0, 0), 1) * 0.2
         + (1.0 - least(greatest(punct_ratio * 4.0, 0), 1)) * 0.2
         + least(greatest(stopword_ratio * 4.0, 0), 1) * 0.2
         + (1.0 - least(greatest(upper_ratio * 5.0, 0), 1)) * 0.1, 6
       ) AS quality_score
FROM base ORDER BY doc_id
"""


def detect_language_sql() -> str:
    from .ops.textstats import _LANG_PROFILES

    rows = []
    for lg in sorted(_LANG_PROFILES):
        for w in sorted(_LANG_PROFILES[lg]):
            rows.append(f"('{lg}', '{w}')")
    profile_rows = ", ".join(rows)
    # CJK codepoint-range counts: same ranges and 0.05 threshold as
    # textstats._cjk_counts / _CJK_THRESHOLD (RE2 \x{...} classes count
    # the identical codepoints the numpy range masks count)
    return rf"""
WITH profiles(lang, word) AS (VALUES {profile_rows}),
cjk AS (
  SELECT doc_id,
         length(text) - length(regexp_replace(text,
             '[\x{{3040}}-\x{{30FF}}]', '', 'g')) AS kana,
         length(text) - length(regexp_replace(text,
             '[\x{{AC00}}-\x{{D7A3}}\x{{1100}}-\x{{11FF}}\x{{3130}}-\x{{318F}}]',
             '', 'g')) AS hangul,
         length(text) - length(regexp_replace(text,
             '[\x{{4E00}}-\x{{9FFF}}]', '', 'g')) AS han,
         greatest(1, length(text)) AS n_chars
  FROM documents
),
toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\s+'),
                     x -> x <> '') AS arr
  FROM documents
),
words AS (
  SELECT doc_id, unnest(arr) AS w FROM toks
),
counts AS (
  SELECT t.doc_id, p.lang,
         coalesce(sum(CASE WHEN pw.word IS NOT NULL THEN 1 ELSE 0 END), 0)
             AS hits
  FROM (SELECT DISTINCT doc_id FROM toks) t
  CROSS JOIN (SELECT DISTINCT lang FROM profiles) p
  LEFT JOIN words wd ON wd.doc_id = t.doc_id
  LEFT JOIN profiles pw ON pw.lang = p.lang AND pw.word = wd.w
  GROUP BY t.doc_id, p.lang
),
nword AS (SELECT doc_id, len(arr) AS n FROM toks),
ratios AS (
  SELECT c.doc_id, c.lang,
         CASE WHEN n.n = 0 THEN 0.0 ELSE c.hits * 1.0 / n.n END AS ratio,
         row_number() OVER (
           PARTITION BY c.doc_id ORDER BY
             CASE WHEN n.n = 0 THEN 0.0 ELSE c.hits * 1.0 / n.n END DESC,
             c.lang DESC
         ) AS rk
  FROM counts c JOIN nword n USING (doc_id)
)
SELECT r.doc_id,
       CASE WHEN c.kana * 1.0 / c.n_chars >= 0.05 THEN 'ja'
            WHEN c.hangul * 1.0 / c.n_chars >= 0.05 THEN 'ko'
            WHEN c.han * 1.0 / c.n_chars >= 0.05 THEN 'zh'
            WHEN ratio = 0.0 THEN 'und' ELSE lang END AS detected_lang,
       round(CASE WHEN c.kana * 1.0 / c.n_chars >= 0.05
                      THEN (c.kana + c.han) * 1.0 / c.n_chars
                  WHEN c.hangul * 1.0 / c.n_chars >= 0.05
                      THEN c.hangul * 1.0 / c.n_chars
                  WHEN c.han * 1.0 / c.n_chars >= 0.05
                      THEN c.han * 1.0 / c.n_chars
                  WHEN ratio = 0.0 THEN 0.0 ELSE ratio END, 6)
           AS lang_confidence
FROM ratios r JOIN cjk c ON c.doc_id = r.doc_id
WHERE rk = 1 ORDER BY r.doc_id
"""
