"""Time the round's added registry queries at sf0.1 in one warm local[8]
session (the BASELINE.md added-operator-timings method): cold-plan wall
time per driver-contract callable, rows counted to force execution."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "unigram_seed_scores",
    "unigram_viterbi_segments",
    "unigram_em_scores",
    "unigram_fertility",
    "unigram_encode_docs",
    "nb_lang_model",
    "nb_lang_confusion",
    "pq_rerank_topk",
    "tablelog_sort_rewrite_scan",
    "tablelog_zorder_box_scan",
    "tablelog_bloom_point_scan",
    "tablelog_routed_conv_lookup",
    "l_diversity_audit",
    "domain_mixture_reweight",
]


def main() -> None:
    from blogparser_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    qs = entry.queries()
    for name in QUERIES:
        t0 = time.time()
        n = len(qs[name](spark, sf_dir).collect())
        print(f"TIMED {name} rows={n} sec={time.time() - t0:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
