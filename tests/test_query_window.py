"""The driver's correctness gate checks exactly the FIRST 50 entries of
queries() (insertion order). These invariants keep every distinct operator
family inside that window and fully oracle-backed."""

import sys

sys.path.insert(0, "/root/repo")


def test_gated_window_holds_all_operator_families():
    import __spark_entry__ as m
    q, o = m.queries(), m.oracle_sql()
    names = list(q)
    first50 = names[:50]
    # every gated slot is oracle-backed (no rows-only query wastes a slot)
    assert all(n in o for n in first50), [n for n in first50 if n not in o]
    # one representative per family: no operator name appears only at 51+
    # unless its family representative is gated earlier
    families = {n.rsplit("_", 1)[0] for n in first50}
    assert "profile_lineitem" in first50 and "topk_documents" in first50
    for must in ("simhash_near_pairs_documents",
                 "ngram_jaccard_pairs_documents",
                 "embedding_neardup_pairs", "ann_ivf_topk",
                 "text_stats_documents", "hash_split_documents",
                 "multimodal_meta_documents", "sessionize_events",
                 "dedup_corpus_documents", "windowed_topk_events",
                 # round-3 promotions (VERDICT r2 item #7)
                 "pii_scan_documents", "repetition_stats_documents",
                 "chunk_documents", "psi_drift_documents"):
        assert must in first50, must
    assert len(families) >= 40          # 50 slots, near-zero repeats
    # oracle keys all resolve to queries
    assert not [k for k in o if k not in q]
