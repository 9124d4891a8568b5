#!/bin/bash
# sf0.1 oracle sweep: every gate whose DuckDB twin is tractable at 10x
# the driver's checking scale. The deselected node ids are the
# documented all-pairs / iterative-CTE oracles that are quadratic in
# DuckDB at sf0.1 (the Spark sides are scale-tested via scale_smoke.py
# instead); substring_dedup_apply and corpus_build_v4 are additionally
# covered at sf0.1 through their *_sampled twins (deterministic ~10%
# md5 slice), and (r12) the ANN family — knn_brute_force, kmeans_train,
# ivf_knn_trained, pq_adc_knn, ann_recall_report — plus
# lsh_tuning_report, dedup_fuzzy_jaccard, near_dup_pairs_ngram /
# _containment / _winnowing / _embedding and mmr_rerank through their
# *_sliced twins (first-500-vec_id / first-600-base-doc slices; seed-
# and query-set-safe at every sf), all of which run IN this sweep —
# as do (r12) bpe_train_merges / bpe_segment_stats /
# bpe_fertility_by_lang (_sliced) and substring_dedup_spans
# (_sampled). EVERY deselected gate below now has a sampled/sliced
# twin running in this sweep except semdedup_prune/autok (covered by
# semdedup_prune_sampled, whose oracle re-derives the slice-pinned
# auto-k). semdedup_prune_autok is
# deselected because its oracle pins k=8 (= the auto-k derivation
# at sf0.01's 500 vectors); at sf0.1 auto-k derives k=32 by design —
# its sf0.1 coverage is semdedup_prune_sampled (slice-pinned auto-k,
# oracle derives the same k as a scalar subquery), which runs here.
set -u
Q=tests/test_queries_oracle.py::test_query_matches_oracle
DESELECT=(
  near_dup_pairs_ngram
  near_dup_pairs_embedding
  near_dup_pairs_containment
  near_dup_pairs_winnowing
  dedup_fuzzy_jaccard
  lsh_tuning_report
  bpe_train_merges
  bpe_segment_stats
  bpe_fertility_by_lang
  kmeans_train
  ivf_knn_trained
  pq_adc_knn
  mmr_rerank
  substring_dedup_spans
  substring_dedup_apply
  corpus_build_v4
  semdedup_prune
  semdedup_prune_autok
  knn_brute_force
  ann_recall_report
)
args=()
for name in "${DESELECT[@]}"; do
  args+=(--deselect "${Q}[${name}]")
done
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 \
  python -m pytest tests/test_queries_oracle.py -q "${args[@]}" "$@"
