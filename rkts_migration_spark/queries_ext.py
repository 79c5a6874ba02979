"""Extended operator-family queries (SURVEY.md §2.8 scalar functions,
§4.2 iterative CC, similarity scale path, multimodal plumbing) — each
paired with a DuckDB oracle where SQL can express it.

Cross-engine determinism: location strings are CONSTRUCTED from integer
columns so the oracle can emit the expected parse directly (the parser
must invert the construction); LSH planes are integer-formula-derived
(no float literals, no RNG); cosine goes through integer quantization
like q_cosine_topk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.locations import folio_side_to_pagenum, make_parse_location_udf
from .functions.text import add_shad
from .queries import _t, register

# =====================================================================
# F9 location grammar: construct -> parse must invert the construction
# =====================================================================

_LOC_SECTIONS = ("rgyud", "mdo sde", "gzugs")
_LOC_BLETTERS = ("ka", "kha", "ga", "nga")
# 5th letter is deliberately NOT in ALLOWED_VOL_LETTERS -> error channel
_LOC_ELETTERS = ("ca", "cha", "ja", "nya", "xx")


def _pick(col, options):
    expr = F.lit(options[-1])
    for i in range(len(options) - 2, -1, -1):
        expr = F.when(col % len(options) == i, F.lit(options[i])).otherwise(expr)
    return expr


def _sql_pick(col: str, options) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{opt}'" for i, opt in enumerate(options[:-1])
    )
    return f"CASE {col} % {len(options)} {whens} ELSE '{options[-1]}' END"


@register("q_location_parse", f"""
WITH f AS (
  SELECT o_orderkey,
         {_sql_pick("o_orderkey", _LOC_SECTIONS)} AS section,
         {_sql_pick("o_orderkey", _LOC_BLETTERS)} AS bvolname,
         {_sql_pick("o_orderkey", _LOC_ELETTERS)} AS evolname,
         CAST(o_orderkey % 300 + 1 AS INT) AS bpagenum,
         CASE o_orderkey % 2 WHEN 0 THEN 'a' ELSE 'b' END AS bpageside,
         CAST(o_orderkey % 7 + 1 AS INT) AS blinenum,
         CAST(o_orderkey % 300 + o_orderkey % 50 + 2 AS INT) AS epagenum,
         CASE o_orderkey % 2 WHEN 0 THEN 'b' ELSE 'a' END AS epageside,
         CAST(o_orderkey % 6 + 1 AS INT) AS elinenum,
         CAST(o_orderkey % 90 + 1 AS INT) AS bvolnum,
         CAST(o_orderkey % 90 + o_orderkey % 4 + 1 AS INT) AS evolnum
  FROM orders)
SELECT section, bvolname, evolname, bpagenum, bpageside, blinenum,
       epagenum, epageside, elinenum, bvolnum, evolnum,
       evolname <> 'xx' AS valid,
       CASE WHEN evolname = 'xx'
            THEN 'invalid_volume_letter: ' || chr(39) || 'xx' || chr(39)
            END AS error,
       CAST(2 * (bpagenum - 1) + 2
            + CASE WHEN bpageside = 'b' THEN 1 ELSE 0 END AS INT) AS b_imgnum
FROM f
""")
def q_location_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 grammar (utils.php:564-746 analog): location strings are
    built from orders columns, then the pandas-UDF parser must recover
    every field; the 'xx' volume letter exercises the F10 whitelist
    error channel. The oracle emits the constructed fields directly —
    parse must invert construction exactly. b_imgnum chains F11
    (utils.php:390-403 folio arithmetic, first_folio_page fixed at 2;
    per-volume overrides broadcast-join in the real flow) onto the
    parsed begin folio."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    loc_str = F.format_string(
        "%s, %s %d%s%d-%s %d%s%d (vol. %d-%d)",
        _pick(k, _LOC_SECTIONS),
        _pick(k, _LOC_BLETTERS),
        (k % 300 + 1).cast("int"),
        F.when(k % 2 == 0, "a").otherwise("b"),
        (k % 7 + 1).cast("int"),
        _pick(k, _LOC_ELETTERS),
        (k % 300 + k % 50 + 2).cast("int"),
        F.when(k % 2 == 0, "b").otherwise("a"),
        (k % 6 + 1).cast("int"),
        (k % 90 + 1).cast("int"),
        (k % 90 + k % 4 + 1).cast("int"),
    )
    parse = make_parse_location_udf("full")
    return o.select(parse(loc_str).alias("loc")).select(
        "loc.*",
        folio_side_to_pagenum(
            F.col("loc.bpagenum"), F.col("loc.bpageside"), F.lit(2)
        ).alias("b_imgnum"),
    )


# =====================================================================
# F9/F10 location-grammar tail: the reference's own REPL cases
# (utils.php:748-752) + pattern_vol / pagerange ?-strip /
# pattern_loc_simple corner cases, as a fixed literal corpus. The
# oracle VALUES are HAND-written expectations (independent of the
# parser), so this is a golden test the driver re-checks each round.
# =====================================================================

_LOC_CASES = [
    (1, "full", "'dul ba, ka 1b1-nga 302a5 (vol. 1-4)"),
    (2, "full", "gzugs, wam 245a4-247a7 (vol. 102)"),   # 'wam' not in whitelist
    (3, "full", "rgyud, ja 39b7 (vol. 83)"),
    (4, "bampo", "ga 107a7-116a5"),
    (5, "bampo", "ga 107a7"),
    (6, "full", "mdo, ka 12a3?-?"),                     # open end range
    (7, "pagerange", "12a3?-?"),                        # '?' end -> stripped
    (8, "pagerange", "1b-302a5"),                       # no line numbers
    (9, "vol", "'dul ba, ka"),
    (10, "vol", "chos mngon pa"),                       # section only
    (11, "vol", "mdo sde, xx"),                         # F10 whitelist error
    (12, "simple", "417-421"),
    (13, "simple_range", "3.417?, - 4.421"),
    (14, "simple_range", "3.417?,- 4.421"),             # optional space
    (15, "full", "zzz"),                                # no match -> error row
    (16, "bampo", "107b"),                              # bare folio, no letter
]

@register("q_location_cases", """
SELECT * FROM (VALUES
 (1, 'full', '''dul ba', 'ka', 'nga', 1, 'b', 1, 302, 'a', 5, 1, 4, true, NULL),
 (2, 'full', 'gzugs', 'wam', NULL, 245, 'a', 4, 247, 'a', 7, 102, NULL, false,
  'invalid_volume_letter: ''wam'''),
 (3, 'full', 'rgyud', 'ja', NULL, 39, 'b', 7, NULL, NULL, NULL, 83, NULL,
  true, NULL),
 (4, 'bampo', NULL, 'ga', NULL, 107, 'a', 7, 116, 'a', 5, NULL, NULL,
  true, NULL),
 (5, 'bampo', NULL, 'ga', NULL, 107, 'a', 7, NULL, NULL, NULL, NULL, NULL,
  true, NULL),
 (6, 'full', 'mdo', 'ka', NULL, 12, 'a', 3, NULL, NULL, NULL, NULL, NULL,
  true, NULL),
 (7, 'pagerange', NULL, NULL, NULL, 12, 'a', 3, NULL, NULL, NULL, NULL, NULL,
  true, NULL),
 (8, 'pagerange', NULL, NULL, NULL, 1, 'b', NULL, 302, 'a', 5, NULL, NULL,
  true, NULL),
 (9, 'vol', '''dul ba', 'ka', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
  NULL, NULL, true, NULL),
 (10, 'vol', 'chos mngon pa', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
  NULL, NULL, true, NULL),
 (11, 'vol', 'mdo sde', 'xx', NULL, NULL, NULL, NULL, NULL, NULL, NULL,
  NULL, NULL, false, 'invalid_volume_letter: ''xx'''),
 (12, 'simple', NULL, NULL, NULL, 417, NULL, NULL, 421, NULL, NULL, NULL,
  NULL, true, NULL),
 (13, 'simple_range', NULL, NULL, NULL, 417, NULL, NULL, 421, NULL, NULL,
  3, 4, true, NULL),
 (14, 'simple_range', NULL, NULL, NULL, 417, NULL, NULL, 421, NULL, NULL,
  3, 4, true, NULL),
 (15, 'full', NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL,
  NULL, false, 'invalid_loc: ''zzz'''),
 (16, 'bampo', NULL, NULL, NULL, 107, 'b', NULL, NULL, NULL, NULL, NULL,
  NULL, true, NULL)
) t(case_id, grammar, section, bvolname, evolname, bpagenum, bpageside,
    blinenum, epagenum, epageside, elinenum, bvolnum, evolnum, valid, error)
""")
def q_location_cases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grammar-tail golden corpus: every reference location grammar
    (full / bampo / simple / pattern_vol / pagerange-with-?-strip /
    pattern_loc_simple) over the reference's own embedded REPL cases
    plus the corner cases of utils.php:611-616,691-723. Expectations
    in the oracle are hand-written VALUES, independent of the parser."""
    from .functions.locations import parse_location_any

    df = spark.createDataFrame(_LOC_CASES, "case_id int, grammar string, s string")
    return df.select(
        "case_id", "grammar",
        parse_location_any(F.col("grammar"), F.col("s")).alias("loc"),
    ).select("case_id", "grammar", "loc.*")


# =====================================================================
# F7 add_shad: EWTS shad rules, pandas UDF vs SQL CASE mirror
# =====================================================================

@register("q_add_shad", """
WITH w AS (
  SELECT DISTINCT regexp_extract(p_name, '([a-z]+)$', 1) AS word FROM part),
c AS (
  SELECT word, length(word) AS n,
         CASE WHEN substr(word, length(word), 1) IN ('a','i','e','o')
              THEN substr(word, length(word) - 1, 1)
              ELSE substr(word, length(word), 1) END AS lst,
         substr(word, length(word) - 2, 1) AS c3,
         substr(word, length(word) - 3, 1) AS c4
  FROM w)
SELECT word,
       CASE WHEN n < 2 THEN word
            WHEN n > 2 AND lst = 'g' AND c3 = 'n' THEN word || ' /'
            WHEN lst IN ('g', 'k') THEN word
            WHEN n = 3 AND lst = 'h' AND c3 = 's' THEN word
            WHEN n > 3 AND lst = 'h' AND c3 = 's' AND c4 <> 't' THEN word
            ELSE word || '/' END AS shadded
FROM c
""")
def q_add_shad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 (utils.php:777-793 parity): shad-appending over the distinct
    final words of part names ('ring' hits the n+g rule, vowel-finals
    hit the look-back-one rule)."""
    p = _t(spark, sf_dir, "part")
    words = p.select(
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("word")
    ).distinct()
    return words.select("word", add_shad(F.col("word")).alias("shadded"))


# =====================================================================
# F3/F4/F12/F18 reference string functions, one query
# =====================================================================

@register("q_ref_strfns", """
WITH src AS (
  SELECT p_partkey AS k,
         'EIDD' || CAST(p_partkey AS VARCHAR) ||
           CASE p_partkey % 5 WHEN 0 THEN '' WHEN 1 THEN '(1)'
                WHEN 2 THEN '.2,3' WHEN 3 THEN '?x' ELSE ')' END AS ci_raw,
         CASE p_partkey % 5 WHEN 0 THEN '00' WHEN 2 THEN '0' ELSE '' END ||
           CAST(p_partkey % 700 AS VARCHAR) ||
           CASE p_partkey % 3 WHEN 0 THEN '' WHEN 1 THEN 'a' ELSE 'bc' END
           AS ci_url_in,
         CASE WHEN p_partkey % 97 = 0 THEN 'MW1BL6'
              ELSE 'MW' || CAST(p_partkey AS VARCHAR) END AS eid,
         CASE p_partkey % 4 WHEN 0 THEN '1. intro' WHEN 1 THEN '1234. x'
              WHEN 2 THEN 'chapter. none' ELSE 'no dot' END AS chap
  FROM part)
SELECT k,
       translate(substr(ci_raw, 4), '(.,?)', '---_') AS ci_rdf,
       (CASE WHEN length(regexp_replace(regexp_extract(ci_url_in, '^([0-9]*)', 1),
                                        '^0+', '')) >= 4
             THEN regexp_replace(regexp_extract(ci_url_in, '^([0-9]*)', 1),
                                 '^0+', '')
             ELSE lpad(regexp_replace(regexp_extract(ci_url_in, '^([0-9]*)', 1),
                                      '^0+', ''), 4, '0') END)
         || upper(substr(ci_url_in,
                         length(regexp_extract(ci_url_in, '^([0-9]*)', 1)) + 1))
         AS ci_url,
       CASE WHEN eid = 'MW1BL6' THEN 'W1ER156' ELSE substr(eid, 2) END AS wlname,
       CASE WHEN strpos(chap, '. ') BETWEEN 1 AND 5
            THEN substr(chap, strpos(chap, '. ') + 2) ELSE chap END AS chap_clean
FROM src
""")
def q_ref_strfns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 rdf_ci_to_url, F4 catalogue_index_xml_to_rdf (EID strip +
    translate), F12 eid_to_wlname, F18 chapter-ordinal cleanup — all
    pure column expressions, exercised over constructed part-key ids."""
    from .functions.ids import eid_to_wlname_col, rdf_ci_to_url_col
    from .functions.text import catalogue_index_to_rdf_col, chapter_title_clean_col

    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey")
    ci_raw = F.concat(
        F.lit("EIDD"), k.cast("string"),
        F.when(k % 5 == 0, "").when(k % 5 == 1, "(1)")
        .when(k % 5 == 2, ".2,3").when(k % 5 == 3, "?x").otherwise(")"),
    )
    ci_url_in = F.concat(
        F.when(k % 5 == 0, "00").when(k % 5 == 2, "0").otherwise(""),
        (k % 700).cast("string"),
        F.when(k % 3 == 0, "").when(k % 3 == 1, "a").otherwise("bc"),
    )
    eid = F.when(k % 97 == 0, "MW1BL6").otherwise(
        F.concat(F.lit("MW"), k.cast("string"))
    )
    chap = (
        F.when(k % 4 == 0, "1. intro").when(k % 4 == 1, "1234. x")
        .when(k % 4 == 2, "chapter. none").otherwise("no dot")
    )
    return p.select(
        k.alias("k"),
        catalogue_index_to_rdf_col(ci_raw, eid_len=3).alias("ci_rdf"),
        rdf_ci_to_url_col(ci_url_in).alias("ci_url"),
        eid_to_wlname_col(eid).alias("wlname"),
        chapter_title_clean_col(chap).alias("chap_clean"),
    )


# =====================================================================
# F16/W8 pagination comparator + monotonicity audit
# =====================================================================

_PG_RX = "^(x|[0-9]+)(''*)([ab])"  # '' = escaped quote inside the SQL literal


@register("q_folio_order", f"""
WITH src AS (
  SELECT o_custkey, o_orderkey,
         (CASE WHEN o_orderkey % 13 = 0 THEN 'x'
               ELSE CAST((o_orderkey * 7) % 40 + 1 AS VARCHAR) END)
         || (CASE WHEN o_orderkey % 3 = 0 THEN chr(39) ELSE '' END)
         || (CASE o_orderkey % 2 WHEN 0 THEN 'a' ELSE 'b' END)
         || (CASE WHEN o_orderkey % 11 = 0 THEN '?' ELSE '' END) AS pg
  FROM orders),
lagged AS (
  SELECT o_custkey, o_orderkey, pg,
         LAG(pg) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev
  FROM src),
parsed AS (
  SELECT *,
         regexp_extract(prev, '{_PG_RX}', 1) AS f1,
         length(regexp_extract(prev, '{_PG_RX}', 2)) AS t1,
         regexp_extract(prev, '{_PG_RX}', 3) AS s1,
         regexp_extract(pg, '{_PG_RX}', 1) AS f2,
         length(regexp_extract(pg, '{_PG_RX}', 2)) AS t2,
         regexp_extract(pg, '{_PG_RX}', 3) AS s2
  FROM lagged)
SELECT o_custkey, o_orderkey, pg, prev,
       CASE WHEN prev IS NULL THEN FALSE
            WHEN prev = pg THEN TRUE
            WHEN f1 = '' OR f1 = 'x' OR f2 = '' OR f2 = 'x' THEN TRUE
            WHEN CAST(f1 AS INT) > CAST(f2 AS INT) THEN TRUE
            WHEN CAST(f1 AS INT) < CAST(f2 AS INT) THEN FALSE
            WHEN t1 > t2 THEN TRUE
            WHEN t1 < t2 THEN FALSE
            WHEN s1 > s2 THEN TRUE
            WHEN s1 < s2 THEN FALSE
            ELSE TRUE END AS out_of_order
FROM parsed
""")
def q_folio_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F16 comparepg (folio num, dupl ticks, a/b side; 'x'/unparsable
    compare equal) driving the W8 monotonicity audit
    (migrate-bvm.py:58-76,252-257): warn when comparepg(prev, cur) >
    -1, i.e. the folio sequence fails to strictly increase."""
    from .functions.text import comparepg_col

    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    pg = F.concat(
        F.when(k % 13 == 0, F.lit("x")).otherwise(
            ((k * 7) % 40 + 1).cast("string")),
        F.when(k % 3 == 0, F.lit("'")).otherwise(F.lit("")),
        F.when(k % 2 == 0, F.lit("a")).otherwise(F.lit("b")),
        F.when(k % 11 == 0, F.lit("?")).otherwise(F.lit("")),
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    lagged = o.select("o_custkey", "o_orderkey", pg.alias("pg")).withColumn(
        "prev", F.lag("pg").over(w)
    )
    cmp_ = comparepg_col(F.col("prev"), F.col("pg"))
    return lagged.withColumn(
        "out_of_order",
        F.when(F.col("prev").isNull(), F.lit(False)).otherwise(cmp_ > -1),
    )


# =====================================================================
# Part-tree materialized paths (J8/W4 subitem recursion analog)
# =====================================================================

@register("q_tree_paths", """
WITH RECURSIVE t AS (
  SELECT p_partkey + 1 AS id,
         CASE WHEN p_partkey + 1 = 1 THEN NULL
              ELSE (p_partkey + 1) // 2 END AS parent
  FROM part),
paths(id, path) AS (
  SELECT id, 'n' || CAST(id AS VARCHAR) FROM t WHERE parent IS NULL
  UNION ALL
  SELECT t.id, paths.path || '.' || 'n' || CAST(t.id AS VARCHAR)
  FROM t JOIN paths ON t.parent = paths.id)
SELECT id, path FROM paths
""")
def q_tree_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized root->node label paths over a binary part tree
    (node k's parent is k//2) via the level-synchronous iterative join
    (operators/tree.py) — the distributed form of the reference's
    recursive subitem walk, checked against DuckDB's recursive CTE."""
    from .operators.tree import tree_paths

    p = _t(spark, sf_dir, "part")
    k = F.col("p_partkey") + 1
    nodes = p.select(
        k.cast("long").alias("id"),
        F.when(k == 1, None).otherwise(F.floor(k / 2)).cast("long").alias("parent"),
        F.concat(F.lit("n"), k.cast("string")).alias("label"),
    )
    return tree_paths(nodes)


# =====================================================================
# §4.2 iterative connected components vs recursive-CTE oracle
# =====================================================================

@register("q_connected_components", """
WITH RECURSIVE e AS (
  SELECT printf('C%06d', c_custkey) AS a, printf('N%03d', c_nationkey) AS b
  FROM customer),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
reach(node, lab) AS (
  SELECT a AS node, a AS lab FROM sym
  UNION
  SELECT sym.a, reach.lab FROM sym JOIN reach ON sym.b = reach.node)
SELECT node, MIN(lab) AS component FROM reach GROUP BY node
""")
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed min-label-propagation loop (operators/cc.py, the
    canonicalization fixpoint SURVEY.md §4.2) on a customer--nation
    bipartite graph, checked against DuckDB's recursive-CTE transitive
    closure. Representative = lexicographic min (labels are padded)."""
    from .operators.cc import connected_components

    c = _t(spark, sf_dir, "customer")
    edges = c.select(
        F.format_string("C%06d", "c_custkey").alias("src"),
        F.format_string("N%03d", "c_nationkey").alias("dst"),
    )
    return connected_components(edges)


# =====================================================================
# Similarity scale path: LSH-bucketed ANN with integer-formula planes
# =====================================================================

_N_PLANES = 4


def _sql_plane_dot(p: int) -> str:
    return (
        "list_sum(list_transform(range(1, len(bv) + 1), "
        f"i -> bv[i] * ((({p} * 31 + (i - 1) * 17) % 19) - 9)))"
    )


_SQL_BUCKET = " + ".join(
    f"(CASE WHEN {_sql_plane_dot(p)} >= 0 THEN {1 << p} ELSE 0 END)"
    for p in range(_N_PLANES)
)

@register("q_ann_lsh", f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS bv
  FROM embeddings),
sig AS (SELECT vec_id, bv, {_SQL_BUCKET} AS bucket FROM base),
cand AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q.bv) + 1),
                  i -> q.bv[i] * b.bv[i])) AS dot,
         list_sum(list_transform(q.bv, x -> x * x)) AS qn,
         list_sum(list_transform(b.bv, x -> x * x)) AS bn
  FROM sig q JOIN sig b ON q.bucket = b.bucket AND q.vec_id <> b.vec_id
  WHERE q.vec_id < 5)
SELECT query_id, neighbor_id,
       CAST(ROUND(CAST(dot AS DECIMAL(38,6))
            / CAST(SQRT(CAST(qn AS DOUBLE) * CAST(bn AS DOUBLE)) AS DECIMAL(38,6)),
            4) AS DOUBLE) AS cosine
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY CAST(dot AS DOUBLE) / SQRT(CAST(qn AS DOUBLE) * CAST(bn AS DOUBLE)) DESC,
                      neighbor_id) AS rn
  FROM cand) t
WHERE rn <= 3
""")
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors: random-hyperplane LSH buckets the
    base ONCE (planes from an integer formula — deterministic in both
    engines, sign decisions exact), candidates come from an equi-join
    on the bucket id instead of a cross join. The shuffle moves
    per-bucket groups — the 100 TB-safe shape (q_cosine_topk is the
    exact baseline this approximates)."""
    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("bv"),
    )

    def plane_dot(p: int):
        prod = F.transform(
            "bv", lambda x, i: x * (((F.lit(p * 31) + i * 17) % 19) - 9)
        )
        return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, x: acc + x)

    bucket = None
    for p in range(_N_PLANES):
        term = F.when(plane_dot(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    sig = base.withColumn("bucket", bucket)

    q = sig.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("bv").alias("qv"), "bucket"
    )
    cand = (
        q.join(sig, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("qv", "bv", lambda a, b: a * b),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("dot"),
            F.aggregate(
                F.transform("qv", lambda x: x * x),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("qn"),
            F.aggregate(
                F.transform("bv", lambda x: x * x),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("bn"),
        )
    )
    cos_d = F.col("dot").cast("double") / F.sqrt(
        F.col("qn").cast("double") * F.col("bn").cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(cos_d.desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "query_id", "neighbor_id",
            F.round(
                F.col("dot").cast("decimal(38,6)")
                / F.sqrt(F.col("qn").cast("double") * F.col("bn").cast("double"))
                .cast("decimal(38,6)"),
                4,
            ).cast("double").alias("cosine"),
        )
    )


# =====================================================================
# A3 section volume list: ordered, consecutive-duplicate-collapsed
# =====================================================================

@register("q_section_volumes", """
WITH v AS (
  SELECT o_custkey, o_orderkey,
         'V' || CAST(o_orderkey % 3 AS VARCHAR) AS vol
  FROM orders),
chg AS (
  SELECT o_custkey, o_orderkey, vol,
         LAG(vol) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pv
  FROM v)
SELECT o_custkey,
       string_agg(vol, '/' ORDER BY o_orderkey) AS vols
FROM chg WHERE pv IS NULL OR pv <> vol
GROUP BY o_custkey
""")
def q_section_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (utils.php:669-681, exportvolumemap.php:29-45 analog): the
    ordered list of distinct-consecutive volume names per section —
    lag-change filter, then an order-independent sort_array(struct)
    aggregation (no reliance on collect_list physical order). Ordered
    by the globally-unique o_orderkey so the lag is total-order-stable
    in both engines."""
    o = _t(spark, sf_dir, "orders")
    vol = F.concat(F.lit("V"), (F.col("o_orderkey") % 3).cast("string"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chg = o.select(
        "o_custkey", "o_orderkey", vol.alias("vol")
    ).withColumn("pv", F.lag("vol").over(w))
    kept = chg.filter(F.col("pv").isNull() | (F.col("pv") != F.col("vol")))
    return (
        kept.groupBy("o_custkey")
        .agg(
            F.concat_ws(
                "/",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("o_orderkey", "vol"))
                    ),
                    lambda s: s["vol"],
                ),
            ).alias("vols")
        )
    )


# =====================================================================
# A6 duplicate detection within an ordered partition
# =====================================================================

@register("q_dup_detect", """
SELECT l_orderkey, l_linenumber, pg,
       COUNT(*) OVER (PARTITION BY l_orderkey, pg) > 1 AS is_dup
FROM (SELECT l_orderkey, l_linenumber,
             CAST(l_partkey % 100 AS INT) AS pg
      FROM lineitem)
""")
def q_dup_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 (migrate-bvm.py:243-260 analog): flag pagination values seen
    more than once within their volume partition — count window, no
    self-join."""
    li = _t(spark, sf_dir, "lineitem")
    pg = (F.col("l_partkey") % 100).cast("int")
    w = Window.partitionBy("l_orderkey", "pg")
    return li.select(
        "l_orderkey", "l_linenumber", pg.alias("pg")
    ).withColumn("is_dup", F.count(F.lit(1)).over(w) > 1)


# =====================================================================
# J10 folio->imgnum map join with fallback chain (1a -> 1b -> last img)
# =====================================================================

@register("q_folio_map_join", """
WITH fm AS (
  SELECT folio, side, CAST(folio * 2 + CASE WHEN side = 'b' THEN 1 ELSE 0 END
                           AS INT) AS imgnum
  FROM (SELECT DISTINCT CAST(p_partkey % 50 + 1 AS INT) AS folio FROM part)
  CROSS JOIN (SELECT 'a' AS side UNION ALL SELECT 'b')
  WHERE NOT (side = 'a' AND folio % 3 = 0)
    AND NOT (side = 'b' AND folio % 5 = 0)),
req AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_orderkey % 50 + 1 AS INT) AS folio,
         CASE l_linenumber % 2 WHEN 0 THEN 'a' ELSE 'b' END AS side
  FROM lineitem)
SELECT r.l_orderkey, r.l_linenumber, r.folio, r.side,
       CAST(COALESCE(m1.imgnum, m2.imgnum,
                     (SELECT MAX(imgnum) FROM fm)) AS INT) AS imgnum
FROM req r
LEFT JOIN fm m1 ON m1.folio = r.folio AND m1.side = r.side
LEFT JOIN fm m2 ON m2.folio = r.folio AND m2.side = 'b' AND r.side = 'a'
""")
def q_folio_map_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 (utils.php:351-389): look the folio up in the per-volume
    map; an 'a' side missing from the map retries the 'b' side
    (utils.php:379-383); still missing -> last image number
    (utils.php:384-387). Three broadcast joins + one coalesce chain —
    zero shuffles on the big side."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem")
    folios = part.select(
        (F.col("p_partkey") % 50 + 1).cast("int").alias("folio")
    ).distinct()
    sides = spark.createDataFrame([("a",), ("b",)], "side string")
    fm = (
        folios.crossJoin(sides)
        .filter(
            ~((F.col("side") == "a") & (F.col("folio") % 3 == 0))
            & ~((F.col("side") == "b") & (F.col("folio") % 5 == 0))
        )
        .select(
            "folio", "side",
            (F.col("folio") * 2 + F.when(F.col("side") == "b", 1).otherwise(0))
            .cast("int").alias("imgnum"),
        )
    )
    req = li.select(
        "l_orderkey", "l_linenumber",
        (F.col("l_orderkey") % 50 + 1).cast("int").alias("folio"),
        F.when(F.col("l_linenumber") % 2 == 0, "a").otherwise("b").alias("side"),
    )
    m1 = fm.select(
        F.col("folio").alias("f1"), F.col("side").alias("s1"),
        F.col("imgnum").alias("img1"))
    m2 = fm.filter(F.col("side") == "b").select(
        F.col("folio").alias("f2"), F.col("imgnum").alias("img2"))
    last_img = fm.agg(F.max("imgnum").alias("img_last"))
    return (
        req.join(F.broadcast(m1),
                 (F.col("folio") == F.col("f1")) & (F.col("side") == F.col("s1")),
                 "left")
        .join(F.broadcast(m2),
              (F.col("folio") == F.col("f2")) & (F.col("side") == F.lit("a")),
              "left")
        .crossJoin(F.broadcast(last_img))
        .select(
            "l_orderkey", "l_linenumber", "folio", "side",
            F.coalesce("img1", "img2", "img_last").cast("int").alias("imgnum"),
        )
    )


# =====================================================================
# Distinct-count + profiling + shingle-Jaccard (training-data ops)
# =====================================================================

@register("q_count_distinct", """
SELECT n_name,
       COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       STRING_AGG(DISTINCT c_mktsegment, '/' ORDER BY c_mktsegment) AS segments
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counting per group through a two-hop broadcast
    dimension join (count_distinct expands to a two-phase aggregate —
    partial distinct map-side, exact at scale unlike approx sketches),
    plus the '/'-joined ordered distinct-value list per key
    (extractList.php:25-41 string pivot) — both distinct aggregates
    ride the same n_name shuffle, so folding them into one query costs
    no extra exchange over count-distinct alone."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.array_join(F.sort_array(F.collect_set("c_mktsegment")), "/")
            .alias("segments"),
        )
    )


@register("q_profile", """
SELECT 'text' AS col, COUNT(*) AS n,
       CAST(COALESCE(SUM(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_empty,
       CAST(MIN(length(text)) AS INT) AS min_len,
       CAST(MAX(length(text)) AS INT) AS max_len,
       CAST(COALESCE(SUM(length(text)), 0) AS BIGINT) AS total_chars
FROM documents
UNION ALL
SELECT 'lang', COUNT(*),
       CAST(COALESCE(SUM(CASE WHEN lang IS NULL OR lang = '' THEN 1 ELSE 0 END),
                     0) AS BIGINT),
       CAST(MIN(length(lang)) AS INT), CAST(MAX(length(lang)) AS INT),
       CAST(COALESCE(SUM(length(lang)), 0) AS BIGINT)
FROM documents
""")
def q_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (nulls/empties, length stats) — the data-
    quality pre-pass of a training pipeline, one scan per column
    family via unioned aggregates.

    Cross-engine gotcha (the round-1 red cell): DuckDB's SUM over
    integers yields HUGEINT (int128), which survives the local tuple
    checker but becomes float64/object through the driver's pandas
    conversion and hash-mismatches Spark's int64. Every aggregate is
    therefore pinned to a concrete BIGINT/INT on BOTH engines, and
    nullable sums are COALESCEd to 0 on both sides."""
    d = _t(spark, sf_dir, "documents")

    def prof(col: str):
        c = F.col(col)
        return d.agg(
            F.lit(col).alias("col"),
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.when(c.isNull() | (c == ""), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_empty"),
            F.min(F.length(c)).cast("int").alias("min_len"),
            F.max(F.length(c)).cast("int").alias("max_len"),
            F.coalesce(F.sum(F.length(c)), F.lit(0))
            .cast("long").alias("total_chars"),
        )

    return prof("text").unionByName(prof("lang"))


# =====================================================================
# ROLLUP / grouping sets (beyond-parity aggregation coverage)
# =====================================================================

@register("q_rollup", """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS INT) AS g_status,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP totals at (flag, status), (flag), () levels with
    GROUPING() markers — Catalyst expands to one Expand + HashAggregate
    (no repeated scans); decimal sums keep both engines exact."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "g_flag", "g_status",
                "sum_qty", "n")
    )


# =====================================================================
# Production-preset dedup signatures: MinHash k=128 in 16 bands of 8
# over 5-word shingles + 64-bit SimHash (PRESETS["production"]) — the
# at-scale constants, oracle-pinned so the parameterization is proven,
# not just parameterizable. (The k=4 demo constants stay in
# q_minhash_signature / q_simhash.)
# =====================================================================

_PROD_K, _PROD_BANDS, _PROD_N = 128, 16, 5
_PROD_RPB = _PROD_K // _PROD_BANDS


def _dedup_prod_sql() -> str:
    hs = ",\n         ".join(
        f"MIN(md5(sh || '#{i}')) AS h{i}" for i in range(_PROD_K))
    bcols = ",\n       ".join(
        "md5(" + " || '|' || ".join(
            f"h{i}" for i in range(b * _PROD_RPB, (b + 1) * _PROD_RPB))
        + f") AS b{b}"
        for b in range(_PROD_BANDS))

    def sim_half(offset: int) -> str:
        terms = [
            f"CAST(SUM(CASE WHEN SUBSTR(sha256(w), {offset + i + 1}, 1) >= '8'"
            f" THEN 1 ELSE 0 END) * 2 > COUNT(*) AS BIGINT) * {1 << (31 - i)}"
            for i in range(32)
        ]
        return " + ".join(terms)

    return f"""
WITH d AS (SELECT doc_id, text FROM documents WHERE length(text) > 0),
tok AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM d),
sh AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id,
           unnest(CASE WHEN len(toks) < {_PROD_N} THEN [text]
                  ELSE list_transform(range(1, len(toks) - {_PROD_N - 2}),
                       i -> array_to_string(list_slice(toks, i, i + {_PROD_N - 1}), ' '))
                  END) AS sh
    FROM tok) u),
sig AS (
  SELECT doc_id,
         {hs}
  FROM sh GROUP BY doc_id),
buckets AS (
  SELECT doc_id,
       {bcols}
  FROM sig),
words AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM d),
sim AS (
  SELECT doc_id,
         {sim_half(0)} AS simhash_hi,
         {sim_half(32)} AS simhash_lo
  FROM words GROUP BY doc_id)
SELECT buckets.*, sim.simhash_hi, sim.simhash_lo
FROM buckets JOIN sim USING (doc_id)
"""


@register("q_dedup_prod", _dedup_prod_sql())
def q_dedup_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production dedup constants end-to-end: 16 band-bucket keys from
    a k=128 MinHash over 5-word shingles (operators/dedup.
    minhash_band_buckets — band joins group on ONE narrow column each)
    + the 64-bit SimHash packed as two exact 32-bit halves
    (simhash64). Engine-mirrored bit-for-bit via the md5/sha256 hash
    families; the xxhash64 fast path is pytest-gated (same plan, JVM
    intrinsic hashes)."""
    from .operators.dedup import PRESETS, minhash_band_buckets, simhash64

    p = PRESETS["production"]
    d = _t(spark, sf_dir, "documents")
    buckets = minhash_band_buckets(
        d, "text", "doc_id",
        k=p["k"], bands=p["bands"], shingle_n=p["shingle_n"])
    sim = simhash64(d, "text", "doc_id")
    return buckets.join(sim, "doc_id")


# =====================================================================
# Embedding-cosine near-duplicate detection (dedup family scale path)
# =====================================================================

@register("q_embedding_neardup", f"""
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(ROUND(x * 1000) AS BIGINT)) AS bv
  FROM embeddings),
sig AS (SELECT vec_id, bv, {_SQL_BUCKET} AS bucket FROM base),
cand AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         list_sum(list_transform(range(1, len(a.bv) + 1),
                  i -> a.bv[i] * b.bv[i])) AS dot,
         list_sum(list_transform(a.bv, x -> x * x)) AS qn,
         list_sum(list_transform(b.bv, x -> x * x)) AS bn
  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
SELECT doc_a, doc_b
FROM cand
WHERE CAST(dot AS DOUBLE) / SQRT(CAST(qn AS DOUBLE) * CAST(bn AS DOUBLE)) >= 0.35
""")
def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (dedup menu): LSH buckets bound
    the candidate set (same integer-formula planes as q_ann_lsh), then
    a cosine threshold keeps near-duplicates — the bucket equi-join is
    the 100 TB shape (no O(n^2) cross join)."""
    e = _t(spark, sf_dir, "embeddings")
    base = e.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x * 1000).cast("long")).alias("bv"),
    )

    def plane_dot(p: int, col: str = "bv"):
        prod = F.transform(
            col, lambda x, i: x * (((F.lit(p * 31) + i * 17) % 19) - 9)
        )
        return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, x: acc + x)

    bucket = None
    for p in range(_N_PLANES):
        term = F.when(plane_dot(p) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    sig = base.withColumn("bucket", bucket)
    a = sig.select(
        F.col("vec_id").alias("doc_a"), F.col("bv").alias("av"), "bucket")
    b = sig.select(
        F.col("vec_id").alias("doc_b"), F.col("bv").alias("bv2"), "bucket")
    cand = (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.aggregate(
                F.zip_with("av", "bv2", lambda x, y: x * y),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("dot"),
            F.aggregate(
                F.transform("av", lambda x: x * x),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("qn"),
            F.aggregate(
                F.transform("bv2", lambda x: x * x),
                F.lit(0).cast("long"), lambda acc, x: acc + x,
            ).alias("bn"),
        )
    )
    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("qn").cast("double") * F.col("bn").cast("double"))
    return cand.filter(cos >= 0.35).select("doc_a", "doc_b")


# =====================================================================
# Multimodal plumbing (binary payloads, mapInPandas) — rows-only
# =====================================================================

@register("q_media_features", """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS kind,
       CAST(octet_length(encode(COALESCE(text, ''))) AS INT) AS n_bytes,
       substr(sha256(COALESCE(text, '')), 1, 16) AS sha
FROM documents
""")
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media -> per-item features via the Arrow-batched
    mapInPandas path (operators/multimodal.py). Payloads are the
    documents' UTF-8 bytes so the SQL-expressible columns (byte count,
    sha256 prefix) have a genuine DuckDB oracle — DuckDB's sha256 over
    VARCHAR hashes the same UTF-8 bytes hashlib sees. The `feature`
    vector (codec stub / optional Pillow decode) stays rows-only and
    is gated by pytest instead (tests/test_extended_operators.py)."""
    from .operators.multimodal import MEDIA_SCHEMA, extract_media_features

    d = _t(spark, sf_dir, "documents")
    media = d.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video").alias("kind"),
        F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8").alias("payload"),
        F.lit(None).cast(MEDIA_SCHEMA["meta"].dataType).alias("meta"),
    )
    feats = extract_media_features(media, dim=8)
    return feats.select("media_id", "kind", "n_bytes", "sha")
