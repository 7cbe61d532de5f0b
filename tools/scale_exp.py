"""Scale experiment: stage 10x the sf0.1 data (20k vectors, 50k docs,
with exact replicas) in /tmp and run the heavy operators.

Observed on local[32] (2026-08-13, late r2 — hashed shingle join keys,
host-load dependent +-30%):
  gemm all-pairs top-k 20k x 20k (4e8 sims): 30.9s  (~1s at 2k x 2k ->
      100x work in ~30x time; BLAS + fixed costs amortize)
  brute-force knn single probe over 20k:      1.2s
  exact dedup 50k docs:                       2.9s  (4992 replica groups found)
  minhash LSH 50k docs:                      10.5s  (250,600 pairs — the
      replicas multiply near-dup pairs quadratically; candidate
      generation still bucket-local; was 15.8s before the 60-bit
      sha-prefix join keys)
  simhash dense 50k docs:                     3.3s  (1,031,400 pairs; was
      27.9s before the JVM bit_count(xor) broadcast join + hoisted-sha
      fingerprint fold — ~9x from the r2 rewrites)

Run: python tools/scale_exp.py
"""

import time, sys, tempfile
sys.path.insert(0,'/root/repo')
from pyspark.sql import functions as F
from wagtail_vector_index_spark.session import build_session

spark = build_session("scale-exp", master="local[32]", shuffle_partitions=64,
                      **{"spark.driver.memory": "24g", "spark.ui.enabled": "false",
                         "spark.sql.files.maxPartitionBytes": "8m"})
spark.sparkContext.setLogLevel("ERROR")

tmp = tempfile.mkdtemp(prefix="scale_")
emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
reps = [emb.select((F.col("vec_id") + F.lit(i*2000)).alias("vec_id"),
                   "embedding", "label") for i in range(10)]
big_emb = reps[0]
for r in reps[1:]: big_emb = big_emb.unionByName(r)
big_emb.repartition(32).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
dreps = [docs.select((F.col("doc_id") + F.lit(i*5000)).alias("doc_id"),
                     "text","lang","source","n_chars") for i in range(10)]
big_docs = dreps[0]
for r in dreps[1:]: big_docs = big_docs.unionByName(r)
big_docs.repartition(32).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
print("SCALE staged: 20k vectors, 50k docs", flush=True)

from wagtail_vector_index_spark.operators.knn import gemm_topk_join, topk_similar
from wagtail_vector_index_spark.operators.dedup import minhash_lsh_pairs, simhash_pairs_dense, exact_duplicates

e = spark.read.parquet(f"{tmp}/embeddings.parquet")
index = e.select("vec_id", F.col("embedding").cast("array<double>").alias("vector"))
probes = index.select(F.col("vec_id").alias("probe_id"), F.col("vector").alias("probe_vec"))
t0=time.time()
n = gemm_topk_join(probes, index, index_id="vec_id", index_vec="vector", limit=10).count()
print(f"SCALE gemm all-pairs topk 20k x 20k: {time.time()-t0:.1f}s ({n} rows)", flush=True)

probe = e.where(F.col("vec_id")==0).first()["embedding"]
t0=time.time()
topk_similar(index, list(probe), vector_col="vector", id_col="vec_id", limit=10).collect()
print(f"SCALE brute knn over 20k: {time.time()-t0:.1f}s", flush=True)

d = spark.read.parquet(f"{tmp}/documents.parquet")
t0=time.time()
n = exact_duplicates(d).where(F.col("n_docs") > 1).count()
print(f"SCALE exact dedup 50k docs: {time.time()-t0:.1f}s ({n} dup groups)", flush=True)

t0=time.time()
n = minhash_lsh_pairs(d, threshold=0.5).count()
print(f"SCALE minhash LSH 50k docs: {time.time()-t0:.1f}s ({n} pairs)", flush=True)

t0=time.time()
n = simhash_pairs_dense(d, max_hamming=2).count()
print(f"SCALE simhash dense 50k docs: {time.time()-t0:.1f}s ({n} pairs)", flush=True)
