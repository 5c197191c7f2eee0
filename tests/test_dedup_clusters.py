"""near_dup_clusters (operators/dedup.py): transitive component
resolution + canonical keep-list from a pair set."""

from lucenenet_spark.operators.dedup import near_dup_clusters


def test_chain_and_clique_components(spark):
    # chain 1-2-3-4 (diameter 3: needs multiple propagation rounds),
    # clique 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        ["doc_a", "doc_b"])
    got = {r.doc_id: (r.cluster_id, r.keep)
           for r in near_dup_clusters(pairs).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False), 4: (1, False),
        10: (10, True), 11: (10, False), 12: (10, False),
        20: (20, True), 21: (20, False),
    }


def test_keep_list_drops_exactly_duplicates(spark):
    pairs = spark.createDataFrame([(5, 7), (7, 9)], ["doc_a", "doc_b"])
    out = near_dup_clusters(pairs)
    keep = {r.doc_id for r in out.where("keep").collect()}
    drop = {r.doc_id for r in out.where("NOT keep").collect()}
    assert keep == {5} and drop == {7, 9}
