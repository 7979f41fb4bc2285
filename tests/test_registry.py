"""Registry-contract guards (driver gate = FIRST 50 entries; rotation
schedule documented in __spark_entry__.queries). These tests fail fast on
the two registration mistakes that would silently weaken the gate: a query
slipping into the ungated tail outside the documented rotation groups, and
a query registered without a value oracle."""

import __spark_entry__ as E

GROUP_A = {
    "rel_event_type_freqs", "rel_min_freq_gate", "rel_pricing_summary",
    "rel_top_orders_per_priority", "rel_stratified_hash_split",
    "rel_token_array_dedup_sort", "rel_symmetric_pair_dedup",
    "rel_seeded_sample_rollup", "rel_region_order_rollup",
    "rel_events_within_hour_pairs", "rel_event_transitions",
    "rel_sessionization",
    "dd_exact_dup_stats", "dd_ngram_jaccard_pairs",
    "dd_minhash_signatures", "dd_simhash_values",
    "ts_token_quantiles",  # joined r8 (group resize for ts_decontamination)
}
GROUP_B = {
    "tr_span_inventory", "tr_siamese_pairs", "tr_max_seq_len",
    "tr_ner_trainset", "tr_siamese_tensors", "tr_kg_negatives",
    "mm_media_features", "mm_frame_sample",
    "sim_ann_bruteforce_topk", "sim_lsh_buckets", "sim_ann_lsh_topk",
    "sim_ann_ivf_topk",
    "dd_minhash_lsh_candidates", "dd_simhash_near_pairs",
    "dd_embedding_neardup_pairs", "dd_dedup_clusters",
    "sim_ann_ivf_kmeans_topk",  # joined r8 (group resize)
}


# Round-9 swap (documented at __spark_entry__.queries): the r9 optimization
# diff changed nine group-B implementations (dedup.py aggregation rework +
# the similarity scan parallelism floor), so those stay in-window per the
# changed-query rule and nine kg_* queries untouched by the diff (green r8
# driver rows — the freshest evidence) ride the tail in their place.
R9_SWAPPED_IN = {
    "dd_minhash_lsh_candidates", "dd_simhash_near_pairs",
    "dd_embedding_neardup_pairs", "dd_dedup_clusters",
    "sim_ann_bruteforce_topk", "sim_lsh_buckets", "sim_ann_lsh_topk",
    "sim_ann_ivf_topk", "sim_ann_ivf_kmeans_topk",
}
R9_SWAPPED_OUT = {
    "kg_verb_predicates", "kg_entity_lifespans", "kg_type_freqs",
    "kg_embedding_components", "kg_mention_eval", "kg_mention_eval_macro",
    "kg_mention_eval_token", "kg_entity_degrees", "kg_conv_summaries",
}
TAIL_R9 = (GROUP_B - R9_SWAPPED_IN) | R9_SWAPPED_OUT


def test_rotation_groups_are_well_formed():
    assert len(GROUP_A) == 17 and len(GROUP_B) == 17
    assert not (GROUP_A & GROUP_B)
    assert R9_SWAPPED_IN <= GROUP_B
    assert len(TAIL_R9) == 17


def test_tail_is_exactly_one_rotation_group():
    names = list(E.queries())
    assert len(names) == len(set(names))
    tail = set(names[50:])
    # the ungated tail must be exactly one documented rotation group (or a
    # documented per-round swap of it) — anything else means a query
    # silently lost its driver-gate coverage
    assert tail in (GROUP_A, GROUP_B, TAIL_R9), sorted(tail ^ TAIL_R9)


def test_every_query_has_a_value_oracle():
    # engine-internal ops without SQL get the weaker rows-only check; today
    # every registered query carries a full value oracle — keep it that way
    # (or consciously amend this test with the exemption list)
    missing = set(E.queries()) - set(E.oracle_sql())
    assert not missing, sorted(missing)


def test_oracle_sql_has_no_orphans():
    orphans = set(E.oracle_sql()) - set(E.queries())
    assert not orphans, sorted(orphans)
