"""Adversarial pins for record linkage (queries/linkage.py): every
verification rule must be able to reject a blocked candidate, and the
blocking must still surface lev<=1 name variants. Oracle parity for the
registered query is covered by tests/test_deferred_parity.py."""

from big_data_crypto_sentiment_spark.queries.linkage import link_records


def _dirty(spark, rows):
    return spark.createDataFrame(
        rows, "dirty_id long, d_name string, d_nationkey int, d_acctbal double")


def _master(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double")


def test_links_deletion_substitution_and_exact(spark):
    master = _master(spark, [(1, "alice smith", 5, 100.0),
                             (2, "bob jones", 7, 50.0)])
    dirty = _dirty(spark, [
        (101, "alice smth", 5, 101.0),   # 1-char deletion -> link to 1
        (102, "bob jines", 7, 50.0),     # 1-char substitution -> link to 2
        (103, "alice smith", 5, 100.0),  # exact -> link to 1
    ])
    got = {(r.dirty_id, r.c_custkey, r.lev)
           for r in link_records(dirty, master).collect()}
    assert got == {(101, 1, 1), (102, 2, 1), (103, 1, 0)}


def test_each_field_rule_rejects(spark):
    master = _master(spark, [(1, "alice smith", 5, 100.0)])
    dirty = _dirty(spark, [
        (201, "alice smth", 9, 100.0),    # nation mismatch
        (202, "alice smth", 5, 110.0),    # balance outside tolerance
        (203, "alxce smxth", 5, 100.0),   # lev 2: blocked maybe, verified out
    ])
    assert link_records(dirty, master).count() == 0


def test_ambiguous_candidate_links_all_passing_masters(spark):
    # rule-form linkage emits every passing pair — disambiguation is a
    # downstream policy (document the contract rather than hide it)
    master = _master(spark, [(1, "ann lee", 5, 10.0),
                             (2, "anne lee", 5, 10.0)])
    dirty = _dirty(spark, [(301, "anne lee", 5, 10.0)])
    got = {(r.c_custkey, r.lev)
           for r in link_records(dirty, master).collect()}
    assert got == {(1, 1), (2, 0)}
