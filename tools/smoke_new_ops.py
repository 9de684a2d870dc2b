"""Ad-hoc smoke + oracle replay for the round-2 extension operators
(pagerank, triangle_counts, duplicate_clusters, bm25, percentiles)."""
import duckdb
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from networkframe_spark import NetworkFrame
from networkframe_spark.functions.dedup import duplicate_clusters, ngram_jaccard_duplicates
from networkframe_spark.functions.search import bm25_top_docs
from networkframe_spark.functions.stats import group_percentiles
from networkframe_spark.sources import read_events, read_table, tpch_graph

con = duckdb.connect()
for t in ("documents", "events", "customer", "supplier", "orders", "lineitem"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def cmp(name, sdf, sql, sort_cols):
    got = sdf.toPandas().sort_values(sort_cols).reset_index(drop=True)
    want = con.execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        print(f"{name}: MATCH ({len(got)} rows)")
    except AssertionError as exc:
        print(f"{name}: MISMATCH\n{exc}")
        print("spark:", got.head(8).to_dict("records"))
        print("duck :", want.head(8).to_dict("records"))


# --- pagerank on the tpch graph, 5 iterations ---------------------------
nf = tpch_graph(spark, SF)
pr = nf.pagerank(damping=0.85, n_iter=5)
base_n = len(nf)
prelude = """
WITH nodes AS (
  SELECT c_custkey AS id FROM customer
  UNION ALL SELECT -s_suppkey - 1 FROM supplier
),
edges AS (
  SELECT o_custkey AS source, -l_suppkey - 1 AS target
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
deg AS (SELECT source, count(*) AS w_out FROM edges GROUP BY source),
pr0 AS (SELECT id, 1.0 / (SELECT count(*) FROM nodes) AS pr FROM nodes)
"""
iters = ""
for i in range(1, 6):
    iters += f""",
c{i} AS (
  SELECT e.target AS id,
         SUM(floor(p.pr / d.w_out * 1e18)::BIGINT) AS s
  FROM edges e
  JOIN pr{i-1} p ON e.source = p.id
  JOIN deg d ON e.source = d.source
  GROUP BY e.target
),
pr{i} AS (
  SELECT n.id,
         round((1 - 0.85) / (SELECT count(*) FROM nodes)
               + 0.85 * (coalesce(c{i}.s, 0) / 1e18), 12) AS pr
  FROM nodes n LEFT JOIN c{i} ON n.id = c{i}.id
)"""
pr_sql = prelude + iters + "\nSELECT id, round(pr, 6) AS pagerank FROM pr5"
cmp("pagerank", pr, pr_sql, ["id"])

# --- triangle counts on the doc-clique graph ----------------------------
docs = read_table(spark, SF, "documents")
ids = docs.select(F.col("doc_id").alias("id"))
pairs = (
    ids.alias("a")
    .join(ids.alias("b"), F.expr("a.id % 7 = b.id % 7 AND a.id < b.id"))
    .filter("a.id < 45 AND b.id < 45")
    .select(F.col("a.id").alias("source"), F.col("b.id").alias("target"))
)
tri = NetworkFrame(ids, pairs).triangle_counts()
tri_sql = """
WITH e AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM documents a JOIN documents b
    ON a.doc_id % 7 = b.doc_id % 7 AND a.doc_id < b.doc_id
  WHERE a.doc_id < 45 AND b.doc_id < 45
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1
  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
corners AS (
  SELECT a AS id FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
),
cnt AS (SELECT id, count(*) AS triangles FROM corners GROUP BY id)
SELECT d.doc_id AS id, coalesce(cnt.triangles, 0) AS triangles
FROM documents d LEFT JOIN cnt ON d.doc_id = cnt.id
"""
cmp("triangle_counts", tri, tri_sql, ["id"])

# --- duplicate clusters over jaccard pairs ------------------------------
dup_pairs = ngram_jaccard_duplicates(docs, n=3, threshold=0.5)
clusters = duplicate_clusters(docs, dup_pairs)
clusters_sql = """
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
idx AS (
  SELECT doc_id, t,
         unnest(generate_series(1, greatest(len(t) - 2, 1))) AS i
  FROM toks
),
sh AS (
  SELECT DISTINCT doc_id AS id, array_to_string(t[i:i+2], ' ') AS sh
  FROM idx
  WHERE array_to_string(t[i:i+2], ' ') <> ''
),
sizes AS (SELECT id, count(*) AS n_sh FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
  GROUP BY a.id, b.id
),
pairs AS (
  SELECT s.id_a, s.id_b FROM shared s
  JOIN sizes sa ON s.id_a = sa.id
  JOIN sizes sb ON s.id_b = sb.id
  WHERE s.shared::DOUBLE / (sa.n_sh + sb.n_sh - s.shared) >= 0.5
),
sym AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.id, sym.b FROM reach JOIN sym ON sym.a = reach.r
)
SELECT id AS doc_id, min(r) AS cluster_id, (min(r) <> id) AS is_duplicate
FROM reach GROUP BY id
"""
cmp("duplicate_clusters", clusters, clusters_sql, ["doc_id"])

# --- bm25 ----------------------------------------------------------------
bm = bm25_top_docs(docs, ["spark", "hash", "vector"], k=10)
bm_sql = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
),
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
tot AS (SELECT SUM(dl)::DOUBLE / count(*) AS avgdl, count(*) AS n FROM lens),
tf AS (
  SELECT doc_id, w AS term, count(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS w FROM toks)
  WHERE w IN ('spark', 'hash', 'vector')
  GROUP BY doc_id, w
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
per_term AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (tot.n::DOUBLE - dfreq.df + 0.5) / (dfreq.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (0.25 + 0.75 * lens.dl / tot.avgdl)), 6)
         AS DECIMAL(38,12)) AS ts
  FROM tf
  JOIN dfreq ON tf.term = dfreq.term
  JOIN lens ON tf.doc_id = lens.doc_id
  CROSS JOIN tot
),
scored AS (
  SELECT doc_id, round(CAST(SUM(ts) AS DOUBLE), 6) AS score
  FROM per_term GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT doc_id, score, rank FROM ranked WHERE rank <= 10
"""
cmp("bm25", bm, bm_sql, ["rank"])

# --- percentiles ---------------------------------------------------------
events = read_events(spark, SF)
pct = group_percentiles(events, "value", "event_type", ps=(0.25, 0.5, 0.9))
pct_sql = """
SELECT event_type,
       round(quantile_cont(value::DOUBLE, 0.25), 6) AS p25,
       round(quantile_cont(value::DOUBLE, 0.5), 6) AS p50,
       round(quantile_cont(value::DOUBLE, 0.9), 6) AS p90,
       count(*) AS n_rows
FROM events GROUP BY event_type
"""
cmp("percentiles", pct, pct_sql, ["event_type"])

spark.stop()
