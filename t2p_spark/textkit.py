"""Training-data text operators over the ``documents`` table.

Each operator ships as a *twin*: an idiomatic Spark implementation (native
Column expressions only — JVM-side, whole-stage-codegen, no Python UDFs)
plus a DuckDB SQL oracle with bit-identical semantics. Parity is engineered,
not hoped for:

  - all content hashing is md5 (identical in both engines),
  - hex->int via CONV/CAST produces the same unsigned 32-bit values,
  - folds are sequential in both engines (Spark AGGREGATE, DuckDB
    list_reduce), integer arithmetic throughout,
  - float ratios are computed from exact integers and rounded at the end.

Scale notes: every operator is a scan + narrow transform or a single
shuffle (groupBy/join on an explicit key). LSH candidate generation uses
explode+equi-join (shuffle on band hash), never OR-joins (nested loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


# --- twin expression builders (s=Spark SQL, d=DuckDB SQL) -------------------

def _tokens(col: str, engine: str) -> str:
    if engine == "s":
        return f"filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')"
    return f"list_filter(string_split_regex(lower({col}), '[^a-z0-9]+'), x -> x != '')"


def _shingles(tokens: str, n: int, engine: str) -> str:
    """word n-grams joined by spaces; empty when fewer than n tokens.

    Guarded with CASE: Spark's sequence(1, 0) yields a *descending* [1, 0],
    so the unguarded form would fabricate shingles on short docs.
    """
    if engine == "s":
        # Spark bracket-indexing on arrays is 0-based
        parts = ", ".join(f"t[i + {k} - 1]" for k in range(n))
        body = (f"transform(sequence(1, size({tokens}) - {n - 1}), "
                f"i -> concat_ws(' ', {parts}))").replace("t[", f"{tokens}[")
        return (f"CASE WHEN size({tokens}) >= {n} THEN {body} "
                f"ELSE CAST(array() AS ARRAY<STRING>) END")
    parts = ", ".join(f"t[i + {k}]" for k in range(n))
    body = (f"list_transform(generate_series(1, len({tokens}) - {n - 1}), "
            f"i -> concat_ws(' ', {parts}))").replace("t[", f"{tokens}[")
    return (f"CASE WHEN len({tokens}) >= {n} THEN {body} "
            f"ELSE CAST([] AS VARCHAR[]) END")


def _hash32(expr: str, engine: str) -> str:
    """Unsigned 32-bit integer from the md5 prefix — identical both engines."""
    if engine == "s":
        return f"CAST(CONV(SUBSTRING(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def _xform(lst: str, lam: str, engine: str) -> str:
    return (f"transform({lst}, {lam})" if engine == "s"
            else f"list_transform({lst}, {lam})")


def _amin(lst: str, engine: str) -> str:
    return f"array_min({lst})" if engine == "s" else f"list_min({lst})"


def _asize(lst: str, engine: str) -> str:
    return f"size({lst})" if engine == "s" else f"len({lst})"


def _adistinct(lst: str, engine: str) -> str:
    return f"array_distinct({lst})" if engine == "s" else f"list_distinct({lst})"


N_MINHASH = 8  # 4 bands x 2 rows
SIMHASH_BITS = 16


def _minhash_select(engine: str) -> str:
    """SELECT doc_id, sig_0..sig_7 FROM documents WHERE >=3 tokens."""
    toks = _tokens("text", engine)
    sh = _shingles("toks", 3, engine)
    sigs = ", ".join(
        _amin(_xform("sh", f"x -> md5(concat('{j}:', x))", engine), engine)
        + f" AS sig_{j}"
        for j in range(N_MINHASH)
    )
    return f"""
        SELECT doc_id, {sigs}
        FROM (
          SELECT doc_id, {sh} AS sh
          FROM (SELECT doc_id, {toks} AS toks FROM documents) tokd
          WHERE {_asize('toks', engine)} >= 3
        ) shd
    """


def _simhash_expr(hashes: str, engine: str) -> str:
    bits = []
    for i in range(SIMHASH_BITS):
        if engine == "s":
            vote = (f"aggregate({hashes}, 0L, (acc, h) -> acc + "
                    f"IF((shiftright(h, {i}) & 1) = 1, 1, -1))")
        else:
            vote = ("CAST(list_sum(list_transform(" + hashes +
                    f", h -> CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END)) AS BIGINT)")
        bits.append(f"(CASE WHEN {vote} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(bits) + ")"


# --- operator catalog -------------------------------------------------------

def spark_sql_queries() -> dict:
    """name -> Spark SQL string over the registered temp views."""
    q = {}

    # exact dedup groups (hash-groupBy; one shuffle on the 128-bit key)
    q["dedup_exact"] = """
        SELECT md5(text) AS text_md5,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
        FROM documents
        GROUP BY md5(text)
    """

    # minhash signatures (scan + narrow transform, zero shuffles)
    q["minhash_signatures"] = _minhash_select("s")

    # LSH candidate pairs: explode 4 bands -> equi-join on (band, key).
    # Spark-first: a shuffle on the band hash, NOT an OR-join nested loop.
    q["dedup_minhash_lsh"] = f"""
        WITH sigs AS ({_minhash_select('s')}),
        bands AS (
          SELECT doc_id, band, key FROM (
            SELECT doc_id,
                   posexplode(array(
                     concat(sig_0, sig_1), concat(sig_2, sig_3),
                     concat(sig_4, sig_5), concat(sig_6, sig_7)
                   )) AS (band, key)
            FROM sigs
          )
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    """

    # simhash clusters
    hashes_s = _xform(_tokens("text", "s"), f"t -> {_hash32('t', 's')}", "s")
    q["simhash_clusters"] = f"""
        SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
        FROM (SELECT doc_id, {_simhash_expr(hashes_s, 's')} AS simhash
              FROM documents)
        GROUP BY simhash
    """

    # n-gram Jaccard pairs: explode distinct 4-gram shingles, equi-join,
    # exact |A∩B| / |A∪B| from integer counts.
    toks_s = _tokens("text", "s")
    sh4_s = _adistinct(_shingles("toks", 4, "s"), "s")
    q["ngram_jaccard_pairs"] = f"""
        WITH docsh AS (
          SELECT doc_id, sh FROM (
            SELECT doc_id, {sh4_s} AS sh
            FROM (SELECT doc_id, {toks_s} AS toks FROM documents) t
          ) WHERE size(sh) > 0
        ),
        tok AS (SELECT doc_id, explode(sh) AS shingle FROM docsh),
        sizes AS (SELECT doc_id, size(sh) AS n FROM docsh),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common
          FROM tok a JOIN tok b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(n_common AS DOUBLE) /
                     (sa.n + sb.n - n_common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.2
    """

    # language-ID heuristic (fixed EN stopword set; deterministic ratios)
    stop = "('the','a','an','and','of','to','in','is','it','on')"
    q["lang_id"] = f"""
        SELECT doc_id,
               CASE WHEN n_tok = 0 THEN 'empty'
                    WHEN stop_cnt * 10 >= n_tok THEN 'en_like'
                    WHEN avg_len_x100 > 650 THEN 'long_token'
                    ELSE 'other' END AS lang_pred,
               CAST(n_tok AS BIGINT) AS n_tokens,
               ROUND(CASE WHEN n_tok = 0 THEN 0.0
                          ELSE CAST(stop_cnt AS DOUBLE) / n_tok END, 6)
                 AS stopword_ratio
        FROM (
          SELECT doc_id,
                 size(toks) AS n_tok,
                 size(filter(toks, t -> t IN {stop})) AS stop_cnt,
                 CASE WHEN size(toks) = 0 THEN 0
                      ELSE CAST(FLOOR(aggregate(toks, 0L,
                             (acc, t) -> acc + length(t)) * 100.0
                           / size(toks)) AS BIGINT) END AS avg_len_x100
          FROM (SELECT doc_id, {toks_s} AS toks FROM documents) t
        )
    """

    # quality scoring: punctuation/diversity/length features -> score
    q["quality_score"] = f"""
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CAST(n_distinct AS BIGINT) AS n_distinct_tokens,
               CAST(n_punct AS BIGINT) AS n_punct,
               ROUND(CASE WHEN n_tok = 0 THEN 0.0 ELSE
                 (CAST(n_distinct AS DOUBLE) / n_tok) *
                 (CASE WHEN n_tok >= 20 THEN 1.0 ELSE n_tok / 20.0 END) *
                 (1.0 - CAST(n_punct AS DOUBLE) /
                        (CAST(n_chars AS DOUBLE) + 1.0))
               END, 6) AS quality
        FROM (
          SELECT doc_id, n_chars,
                 size(toks) AS n_tok,
                 size(array_distinct(toks)) AS n_distinct,
                 length(regexp_replace(text, '[a-z0-9 ]', '')) AS n_punct
          FROM (SELECT doc_id, n_chars, text, {toks_s} AS toks
                FROM documents) t
        )
    """

    # corpus token statistics per source (explode + two-level agg)
    q["token_stats"] = f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(MAX(n_tok) AS BIGINT) AS max_tokens,
               CAST(SUM(n_distinct) AS BIGINT) AS sum_distinct_tokens
        FROM (
          SELECT doc_id, source, size(toks) AS n_tok,
                 size(array_distinct(toks)) AS n_distinct
          FROM (SELECT doc_id, source, {toks_s} AS toks FROM documents) t
        )
        GROUP BY source
    """

    # rolling polynomial fingerprint (order-sensitive left fold, mod prime)
    q["doc_fingerprint"] = f"""
        SELECT doc_id,
               aggregate({_xform(toks_s, f't -> {_hash32("t", "s")}', 's')},
                         0L,
                         (acc, h) -> pmod(acc * 31 + h, 2147483647))
                 AS fingerprint
        FROM documents
    """

    return q


def duckdb_oracle_queries() -> dict:
    """name -> DuckDB SQL with identical semantics (the correctness twin)."""
    q = {}
    q["dedup_exact"] = """
        SELECT md5(text) AS text_md5,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
        FROM documents
        GROUP BY md5(text)
    """
    q["minhash_signatures"] = _minhash_select("d")
    # small-data oracle may use the OR-join form — same result set
    q["dedup_minhash_lsh"] = f"""
        WITH sigs AS ({_minhash_select('d')})
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE (a.sig_0 = b.sig_0 AND a.sig_1 = b.sig_1)
           OR (a.sig_2 = b.sig_2 AND a.sig_3 = b.sig_3)
           OR (a.sig_4 = b.sig_4 AND a.sig_5 = b.sig_5)
           OR (a.sig_6 = b.sig_6 AND a.sig_7 = b.sig_7)
    """
    hashes_d = _xform(_tokens("text", "d"), f"t -> {_hash32('t', 'd')}", "d")
    q["simhash_clusters"] = f"""
        SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS rep_doc_id
        FROM (SELECT doc_id, {_simhash_expr(hashes_d, 'd')} AS simhash
              FROM documents) t
        GROUP BY simhash
    """
    toks_d = _tokens("text", "d")
    sh4_d = _adistinct(_shingles("toks", 4, "d"), "d")
    q["ngram_jaccard_pairs"] = f"""
        WITH docsh AS (
          SELECT doc_id, sh FROM (
            SELECT doc_id, {sh4_d} AS sh
            FROM (SELECT doc_id, {toks_d} AS toks FROM documents) t
          ) s WHERE len(sh) > 0
        ),
        tok AS (SELECT doc_id, unnest(sh) AS shingle FROM docsh),
        sizes AS (SELECT doc_id, len(sh) AS n FROM docsh),
        common AS (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common
          FROM tok a JOIN tok b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id
        )
        SELECT doc_a, doc_b,
               ROUND(CAST(n_common AS DOUBLE) /
                     (sa.n + sb.n - n_common), 6) AS jaccard
        FROM common
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.2
    """
    stop = "('the','a','an','and','of','to','in','is','it','on')"
    q["lang_id"] = f"""
        SELECT doc_id,
               CASE WHEN n_tok = 0 THEN 'empty'
                    WHEN stop_cnt * 10 >= n_tok THEN 'en_like'
                    WHEN avg_len_x100 > 650 THEN 'long_token'
                    ELSE 'other' END AS lang_pred,
               CAST(n_tok AS BIGINT) AS n_tokens,
               ROUND(CASE WHEN n_tok = 0 THEN 0.0
                          ELSE CAST(stop_cnt AS DOUBLE) / n_tok END, 6)
                 AS stopword_ratio
        FROM (
          SELECT doc_id,
                 len(toks) AS n_tok,
                 len(list_filter(toks, t -> t IN {stop})) AS stop_cnt,
                 CASE WHEN len(toks) = 0 THEN 0
                      ELSE CAST(FLOOR(CAST(list_sum(list_transform(toks,
                             t -> length(t))) AS DOUBLE) * 100.0
                           / len(toks)) AS BIGINT)
                      END AS avg_len_x100
          FROM (SELECT doc_id, {toks_d} AS toks FROM documents) t
        ) f
    """
    q["quality_score"] = f"""
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CAST(n_distinct AS BIGINT) AS n_distinct_tokens,
               CAST(n_punct AS BIGINT) AS n_punct,
               ROUND(CASE WHEN n_tok = 0 THEN 0.0 ELSE
                 (CAST(n_distinct AS DOUBLE) / n_tok) *
                 (CASE WHEN n_tok >= 20 THEN 1.0 ELSE n_tok / 20.0 END) *
                 (1.0 - CAST(n_punct AS DOUBLE) /
                        (CAST(n_chars AS DOUBLE) + 1.0))
               END, 6) AS quality
        FROM (
          SELECT doc_id, n_chars,
                 len(toks) AS n_tok,
                 len(list_distinct(toks)) AS n_distinct,
                 length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS n_punct
          FROM (SELECT doc_id, n_chars, text, {toks_d} AS toks
                FROM documents) t
        ) f
    """
    q["token_stats"] = f"""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               CAST(MAX(n_tok) AS BIGINT) AS max_tokens,
               CAST(SUM(n_distinct) AS BIGINT) AS sum_distinct_tokens
        FROM (
          SELECT doc_id, source, len(toks) AS n_tok,
                 len(list_distinct(toks)) AS n_distinct
          FROM (SELECT doc_id, source, {toks_d} AS toks FROM documents) t
        ) f
        GROUP BY source
    """
    q["doc_fingerprint"] = f"""
        SELECT doc_id,
               CAST(list_reduce(
                 list_prepend(0, {_xform(toks_d, f't -> {_hash32("t", "d")}', 'd')}),
                 (acc, h) -> (acc * 31 + h) % 2147483647
               ) AS BIGINT) AS fingerprint
        FROM documents
    """
    return q


def run_textkit(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from t2p_spark.relational import register_views

    register_views(spark, sf_dir)
    return spark.sql(spark_sql_queries()[name])
