"""Crypto-shredding (operators/crypto_shred.py): roundtrip, forgotten
users decrypt to NULL while their ciphertext bytes persist unchanged,
and the whole path stays JVM-side (no Python UDF in the plan)."""

from pyspark.sql import functions as F

from big_data_crypto_sentiment_spark.operators.crypto_shred import (
    decrypt_payload,
    derive_fixture_keys,
    encrypt_payload,
    generate_keys,
    shred_users,
)


def _facts(spark):
    return spark.createDataFrame(
        [(1, 10, "alpha"), (2, 10, "beta"), (3, 20, "gamma"),
         (4, 30, None)],
        "event_id long, user_id long, props string")


def test_roundtrip_and_shred(spark):
    facts = _facts(spark)
    keys = derive_fixture_keys(facts)
    enc = encrypt_payload(facts, keys)
    # ciphertext is binary and differs from plaintext
    cts = {r.event_id: r.props for r in enc.collect()}
    assert isinstance(cts[1], (bytes, bytearray)) and cts[1] != b"alpha"
    assert cts[4] is None  # NULL payload stays NULL

    # full roundtrip before shredding
    dec = {r.event_id: r.props for r in decrypt_payload(enc, keys).collect()}
    assert dec == {1: "alpha", 2: "beta", 3: "gamma", 4: None}

    # forget user 10: key deleted, facts untouched
    forget = spark.createDataFrame([(10,)], "user_id long")
    keys2 = shred_users(keys, forget)
    assert keys2.count() == keys.count() - 1
    dec2 = {r.event_id: r.props
            for r in decrypt_payload(enc, keys2).collect()}
    assert dec2 == {1: None, 2: None, 3: "gamma", 4: None}
    # the stored ciphertext itself did not change (no rewrite happened)
    cts_after = {r.event_id: r.props for r in enc.collect()}
    assert cts_after == cts


def test_same_user_same_plaintext_distinct_users_distinct_keys(spark):
    facts = _facts(spark)
    keys = derive_fixture_keys(facts)
    two = spark.createDataFrame(
        [(1, 10, "same"), (2, 20, "same")],
        "event_id long, user_id long, props string")
    cts = {r.event_id: bytes(r.props)
           for r in encrypt_payload(two, keys).collect()}
    assert cts[1] != cts[2]  # per-user keys -> different ciphertext


def test_plan_stays_jvm_side(spark):
    facts = _facts(spark)
    keys = derive_fixture_keys(facts)
    plan = decrypt_payload(encrypt_payload(facts, keys), keys) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_generate_keys_random_roundtrip_and_shred(spark):
    """Production key path: CSPRNG keys are 16 bytes, unique per user,
    NOT re-derivable (differ from the fixture derivation), and support
    the same roundtrip + shred semantics once materialized."""
    facts = _facts(spark)
    # materialize: generate_keys is nondeterministic by design
    keys = spark.createDataFrame(generate_keys(facts).collect(),
                                 "user_id long, enc_key binary")
    rows = {r.user_id: bytes(r.enc_key) for r in keys.collect()}
    assert set(rows) == {10, 20, 30}
    assert all(len(k) == 16 for k in rows.values())
    assert len(set(rows.values())) == 3
    fixture = {r.user_id: bytes(r.enc_key)
               for r in derive_fixture_keys(facts).collect()}
    assert all(rows[u] != fixture[u] for u in rows)
    enc = encrypt_payload(facts, keys)
    keys2 = shred_users(keys, spark.createDataFrame([(10,)],
                                                    "user_id long"))
    dec = {r.event_id: r.props
           for r in decrypt_payload(enc, keys2).collect()}
    assert dec == {1: None, 2: None, 3: "gamma", 4: None}


def test_gcm_mode_roundtrip_shred_and_random_iv(spark):
    """The shipped production mode (r12 verdict #6): GCM roundtrips,
    forgotten users decrypt to NULL, ciphertext is nondeterministic
    (random IV per row — two encrypts of the same plaintext differ),
    and a 16-byte key still yields IV(12) + ct + tag(16) framing."""
    from big_data_crypto_sentiment_spark.operators.crypto_shred import (
        PROD_MODE,
    )
    facts = _facts(spark)
    keys = derive_fixture_keys(facts)
    enc = encrypt_payload(facts, keys, mode=PROD_MODE)
    rows = {r.event_id: r.props for r in enc.collect()}
    assert rows[4] is None
    # IV(12) + ciphertext(len(pt)) + tag(16)
    assert len(bytes(rows[1])) == 12 + len(b"alpha") + 16
    # nondeterministic by design: a second evaluation mints fresh IVs
    rows2 = {r.event_id: r.props
             for r in encrypt_payload(facts, keys,
                                      mode=PROD_MODE).collect()}
    assert bytes(rows[1]) != bytes(rows2[1])

    # decrypt must use a MATERIALIZED ciphertext (re-evaluating the
    # nondeterministic encrypt plan would change the bytes mid-query)
    mat = spark.createDataFrame(
        [(k, {1: 10, 2: 10, 3: 20, 4: 30}[k],
          bytes(v) if v is not None else None)
         for k, v in rows.items()],
        "event_id long, user_id long, props binary")
    dec = {r.event_id: r.props
           for r in decrypt_payload(mat, keys, mode=PROD_MODE).collect()}
    assert dec == {1: "alpha", 2: "beta", 3: "gamma", 4: None}

    forget = spark.createDataFrame([(10,)], "user_id long")
    dec2 = {r.event_id: r.props
            for r in decrypt_payload(mat, shred_users(keys, forget),
                                     mode=PROD_MODE).collect()}
    assert dec2 == {1: None, 2: None, 3: "gamma", 4: None}


def test_gcm_tampered_ciphertext_fails_loudly(spark):
    """GCM authenticates: flipping one ciphertext byte makes decrypt
    raise instead of returning garbage (the tamper-evidence ECB cannot
    give)."""
    import pytest

    facts = _facts(spark)
    keys = derive_fixture_keys(facts)
    from big_data_crypto_sentiment_spark.operators.crypto_shred import (
        PROD_MODE,
    )
    ct = bytes({r.event_id: r.props for r in encrypt_payload(
        facts, keys, mode=PROD_MODE).collect()}[1])
    bad = ct[:-1] + bytes([ct[-1] ^ 0x01])
    mat = spark.createDataFrame([(1, 10, bad)],
                                "event_id long, user_id long, props binary")
    with pytest.raises(Exception, match="(?i)aes|tag|invalid|crypto"):
        decrypt_payload(mat, keys, mode=PROD_MODE).collect()
