"""End-to-end training-data pipeline over the synthetic document corpus.

Run from the repo root:  python examples/corpus_pipeline.py [sf_dir]

The full pre-training data flow: quality/language signals -> exact dedup
-> near-dup components -> survivor selection -> benchmark decontamination
-> PII scrub -> exact mixture draw -> token-shard layout -> chunking ->
partitioned parquet layout. Every step is a declarative DataFrame op from
`mindb_spark.operators`; chain them and Catalyst plans the whole thing.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mindb_spark.operators.dedup import (
    dedup_exact_survivors,
    near_dup_components,
    survivors_from_components,
)
from mindb_spark.operators.sampling import assign_token_shards, stratified_sample_exact
from mindb_spark.operators.textops import language_columns, quality_columns, scrub_pii
from mindb_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("corpus-pipeline", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    print(f"input docs: {docs.count()}")

    # 1. exact dedup, then transitive near-dup grouping and survivor pick
    exact = dedup_exact_survivors(docs)
    comps = near_dup_components(exact, 0.5, max_shingle_freq=100)
    survivors = survivors_from_components(exact, comps)
    print(f"after exact dedup: {exact.count()}; after near-dup: {survivors.count()}")

    # 2. fused per-row signals + quality/language gate
    lang, qual = language_columns("text"), quality_columns("text")
    kept = survivors.select(
        "doc_id", "text", "source",
        lang["detected_lang"].alias("lang2"),
        qual["quality_score"].alias("q"),
        qual["n_tokens"].alias("n_tokens"),
    ).where(F.col("q") >= 0.3)
    print(f"after quality gate: {kept.count()}")

    # 2b. benchmark decontamination: drop docs overlapping the held-out set
    from mindb_spark.operators.corpus import ngram_contamination

    bench = docs.where(F.col("doc_id") % 41 == 0)
    contam = ngram_contamination(kept, bench, k=4)
    kept = kept.join(
        contam.where(F.col("contamination_rate") < 0.5).select("doc_id"),
        "doc_id", "left_semi",
    )
    print(f"after decontamination: {kept.count()}")

    # 2c. corpus-unigram LM gate (CCNet-style pseudo-perplexity): drop the
    # rare-token tail (OCR noise, gibberish) — bottom 2% by avg logprob
    from mindb_spark.operators.corpus import unigram_logprob

    lp = unigram_logprob(kept)
    cut = lp.approxQuantile("avg_logprob", [0.02], 0.001)[0]
    kept = kept.join(
        lp.where(F.col("avg_logprob") >= cut).select("doc_id"), "doc_id", "left_semi"
    )
    print(f"after LM-quality gate (cut {cut:.3f}): {kept.count()}")

    # 3. PII scrub (emails / IPs / phones)
    clean = scrub_pii(kept, text_col="text").join(
        kept.select("doc_id", "lang2", "n_tokens"), "doc_id"
    )
    print("scrub counts:", clean.agg(
        F.sum("n_emails").alias("emails"), F.sum("n_ips").alias("ips"),
        F.sum("n_phones").alias("phones")).first())

    # 4. exact mixture draw per language
    mix = stratified_sample_exact(clean, "lang2", {"en": 200, "de": 100}, seed=11)
    print("mixture:", {r["lang2"]: r["n"] for r in
                       mix.groupBy("lang2").agg(F.count("*").alias("n")).collect()})

    # 5. deterministic global training-order shuffle, then token-shard
    # layout for sequence packing over the shuffled order
    from mindb_spark.operators.sampling import global_shuffle

    order = global_shuffle(mix.select("doc_id"), seed=13)
    shards = assign_token_shards(
        mix.select("doc_id", "n_tokens").join(order, "doc_id"),
        budget=4096, id_col="pos", tokens_col="n_tokens",
    )
    print("shards:", shards.agg(F.max("shard_id").alias("last_shard"),
                                F.sum("n_tokens").alias("total_tokens")).first())

    # 6. chunk the curated docs and write the final layout (partitioned by
    # language, id-sorted inside files for row-group pruning)
    import tempfile

    from mindb_spark.operators.corpus import chunk_documents
    from mindb_spark.sources import write_table

    chunks = chunk_documents(
        mix.select("doc_id", F.col("clean_text").alias("text")),
        chunk_size=512, overlap=64,
    ).join(mix.select("doc_id", "lang2"), "doc_id")
    out = tempfile.mkdtemp(prefix="corpus_out_") + "/chunks"
    write_table(chunks, out, partition_by=["lang2"], sort_by=["doc_id", "chunk_no"])
    # count the WRITTEN files — re-counting `chunks` would re-run the
    # whole curation pipeline a second time
    n_written = spark.read.parquet(out).count()
    print(f"wrote {n_written} chunks to {out}")


if __name__ == "__main__":
    main()
