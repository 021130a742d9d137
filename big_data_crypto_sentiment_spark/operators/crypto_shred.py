"""Crypto-shredding — the GDPR right-to-be-forgotten pattern for
immutable data lakes: encrypt every user's payload columns under a
PER-USER key; forgetting a user is then a single key-table delete, with
no rewrite of petabytes of immutable fact files (the tombstone
anti-join in relational.py:q_retention_after_deletes filters reads;
this makes the underlying bytes themselves unrecoverable).

Spark-first: encryption/decryption are the built-in JVM expressions
`aes_encrypt`/`aes_decrypt` (codegen'd, Arrow-free, no Python UDF —
the house rule), applied after a broadcast join against the key table.
Decryption of a forgotten user LEFT-joins no key and yields NULL — the
reader sees absence, never ciphertext garbage or an exception.

Key discipline: TWO key paths ship. `generate_keys` is the production
path — a CSPRNG (`secrets.token_bytes`) per-user random key minted in
an Arrow-batched pandas UDF (distributed, never collected to the
driver); only with random keys does deleting a key row actually make
the bytes unrecoverable. `derive_fixture_keys` is the TEST-ONLY
deterministic path (md5 of a salted user id) so ciphertexts are
reproducible across engines/processes — anyone with the source can
re-derive those keys, so it provides ZERO forgetting guarantee and
must never leave a test.

Modes: `MODE` ('ECB') is the deterministic TEST default — values fit
one AES block and ciphertexts are comparable across engines/processes.
`PROD_MODE` ('GCM') is the shipped production path (pass
`mode=PROD_MODE` or set it as the default in a deployment):
authenticated encryption with a random 12-byte IV per row, prepended
to the ciphertext by Spark's aes_encrypt and parsed back by
aes_decrypt — nondeterministic ciphertext by design, tamper-evident
on decrypt. Both modes are roundtrip- and shred-tested
(tests/test_crypto_shred.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

MODE = "ECB"        # deterministic test default (see module docstring)
PROD_MODE = "GCM"   # authenticated, random-IV production mode
KEY_SALT = "spark-shred-v1/"


def _random_key_udf():
    # built lazily: pandas_udf registration needs an active session
    @pandas_udf("binary")
    def _random_key(ids: pd.Series) -> pd.Series:
        import secrets
        return pd.Series([secrets.token_bytes(16)
                          for _ in range(len(ids))])
    return _random_key


def generate_keys(users: DataFrame, key: str = "user_id") -> DataFrame:
    """(key, enc_key): the PRODUCTION key table — a fresh 128-bit
    CSPRNG key per user, minted executor-side (Arrow batches, no
    driver collect, no derivable structure). Persist the result to the
    ACID key store before first use: the expression is nondeterministic,
    so re-evaluating the plan would mint different keys."""
    return (users.select(F.col(key)).distinct()
                 .withColumn("enc_key", _random_key_udf()(F.col(key))))


def derive_fixture_keys(users: DataFrame, key: str = "user_id") -> DataFrame:
    """(key, enc_key): TEST-ONLY deterministic key table (md5 of a
    source-visible salt + user id). Reproducible by anyone with this
    file, so shredding these keys forgets NOTHING — use generate_keys
    in any real deployment."""
    return (users.select(F.col(key)).distinct()
                 .select(key,
                         F.unhex(F.md5(F.concat(F.lit(KEY_SALT),
                                                F.col(key).cast("string"))))
                          .alias("enc_key")))


def encrypt_payload(df: DataFrame, keys: DataFrame,
                    key: str = "user_id",
                    payload: str = "props",
                    mode: str = MODE) -> DataFrame:
    """Replace `payload` with its per-user AES ciphertext (binary).
    Rows with no key table entry (or NULL payload) keep NULL — at scale
    the key table broadcasts (one small row per user). mode=PROD_MODE
    (GCM) gives authenticated encryption with a fresh random IV per
    row (Spark prepends it to the ciphertext)."""
    enc = F.expr(f"aes_encrypt(CAST({payload} AS BINARY), enc_key, "
                 f"'{mode}')")
    return (df.join(F.broadcast(keys), key, "left")
              .withColumn(payload,
                          F.when(F.col("enc_key").isNotNull()
                                 & F.col(payload).isNotNull(), enc))
              .drop("enc_key"))


def decrypt_payload(df: DataFrame, keys: DataFrame,
                    key: str = "user_id",
                    payload: str = "props",
                    mode: str = MODE) -> DataFrame:
    """Recover plaintext where a key still exists; forgotten users
    (no key row) decrypt to NULL. mode must match the encrypt-side
    mode; GCM additionally authenticates (tampered ciphertext raises
    instead of yielding garbage)."""
    dec = F.expr(f"CAST(aes_decrypt({payload}, enc_key, '{mode}') "
                 f"AS STRING)")
    return (df.join(F.broadcast(keys), key, "left")
              .withColumn(payload,
                          F.when(F.col("enc_key").isNotNull()
                                 & F.col(payload).isNotNull(), dec))
              .drop("enc_key"))


def shred_users(keys: DataFrame, forget: DataFrame,
                key: str = "user_id") -> DataFrame:
    """Forget users: drop their key rows (broadcast anti join). The
    fact files never change; their ciphertext is now undecryptable."""
    return keys.join(F.broadcast(forget.select(key).distinct()),
                     key, "left_anti")
