#!/usr/bin/env python
"""Round-3 curation surface, end to end: profile → PII redaction →
LM-quality scoring → per-source quota → importance sampling →
deterministic shuffle → int8-quantized embedding shards.

Every stage is a declarative Spark plan (codegen'd filters and
projections, broadcast vocab join, range-repartition shuffle) — the
shapes that hold at 100 TB.

Run:  python examples/curation_round3.py [sf_dir]
(default sf_dir: /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("PYTHONPATH", REPO)

from pyspark.sql import functions as F  # noqa: E402

from xpysom_dask_spark import make_session  # noqa: E402
from xpysom_dask_spark.operators import (  # noqa: E402
    embeddings as emb_ops,
    profile,
    sampling,
)
from xpysom_dask_spark.operators import text as T  # noqa: E402
from xpysom_dask_spark.sources import readers, writers  # noqa: E402


def main(sf_dir="/root/testdata/sf0.001"):
    spark = make_session("curation-round3-example", master="local[4]",
                         shuffle_partitions=8,
                         extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    docs = readers.load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"== corpus: {n0} documents from {sf_dir}")

    # 1. profile the corpus table (one multi-distinct aggregate)
    profile.profile_columns(docs, ["doc_id", "n_chars"]).show()

    # 2. PII redaction + counts (codegen'd regex chain)
    red = docs.select(
        "doc_id", "source",
        *T.pii_counts("text"),
        T.redact_pii("text").alias("text"))
    hits = red.agg(F.sum("n_email") + F.sum("n_ipv4")
                   + F.sum("n_phone")).first()[0]
    print(f"== PII spans redacted: {hits}")

    # 3. unigram-LM quality score; drop the worst decile
    scored = T.unigram_logprob_score(red, "text", "doc_id")
    cut = scored.agg(
        F.percentile_approx("avg_logp", F.lit(0.1), F.lit(1000))).first()[0]
    keep_ids = scored.where(F.col("avg_logp") >= cut).select(
        F.col("id").alias("doc_id"))
    kept = red.join(keep_ids, "doc_id")
    print(f"== LM-quality gate (avg_logp >= {cut:.3f}): "
          f"{kept.count()}/{n0} kept")

    # 4. per-source quota + length-weighted importance sample
    capped = sampling.cap_per_group(
        kept.withColumn("n_chars", F.length("text")),
        "doc_id", "source", max_rows=50)
    mixed = sampling.importance_sample(
        capped, "doc_id", "n_chars", fraction=0.8)
    print(f"== after quota+importance sampling: {mixed.count()}")

    # 5. deterministic global shuffle → ORC training shards
    shuffled = sampling.deterministic_shuffle(mixed, "doc_id", seed=1,
                                              num_partitions=4)
    out = tempfile.mkdtemp(prefix="curated_shards_")
    writers.write_orc(shuffled.select("doc_id", "source", "text"), out)
    print(f"== wrote shuffled ORC shards to {out}: "
          f"{readers.load_orc(spark, out).count()} rows")

    # 6. int8-quantize the embedding column for the retained docs
    emb = readers.load_table(spark, sf_dir, "embeddings")
    q = emb_ops.quantization_error(emb_ops.quantize_int8(emb))
    q.agg(F.max("max_abs_err").alias("max_reconstruction_err"),
          F.avg("scale").alias("avg_scale")).show()

    print("done.")


if __name__ == "__main__":
    main(*sys.argv[1:2])
