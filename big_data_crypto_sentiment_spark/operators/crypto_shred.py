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

Key discipline: the fixture derives keys deterministically (md5 of a
salted user id → 16-byte AES-128 key) so tests are reproducible; a
production deployment generates random keys into the key table (a
small, ACID store — the only mutable state in the system) and rotates
the salt per tenant. GCM mode would add a random IV per row (Spark
supports it) at the cost of nondeterministic ciphertext; the fixture
uses ECB only so ciphertexts are comparable in tests — switch
`MODE` to 'GCM' in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MODE = "ECB"  # deterministic for tests; use 'GCM' in production
KEY_SALT = "spark-shred-v1/"


def derive_keys(users: DataFrame, key: str = "user_id") -> DataFrame:
    """(key, enc_key): the per-user key table. Fixture derivation is
    md5-based (deterministic); production swaps in random keys."""
    return (users.select(F.col(key)).distinct()
                 .select(key,
                         F.unhex(F.md5(F.concat(F.lit(KEY_SALT),
                                                F.col(key).cast("string"))))
                          .alias("enc_key")))


def encrypt_payload(df: DataFrame, keys: DataFrame,
                    key: str = "user_id",
                    payload: str = "props") -> DataFrame:
    """Replace `payload` with its per-user AES ciphertext (binary).
    Rows with no key table entry (or NULL payload) keep NULL — at scale
    the key table broadcasts (one small row per user)."""
    enc = F.expr(f"aes_encrypt(CAST({payload} AS BINARY), enc_key, "
                 f"'{MODE}')")
    return (df.join(F.broadcast(keys), key, "left")
              .withColumn(payload,
                          F.when(F.col("enc_key").isNotNull()
                                 & F.col(payload).isNotNull(), enc))
              .drop("enc_key"))


def decrypt_payload(df: DataFrame, keys: DataFrame,
                    key: str = "user_id",
                    payload: str = "props") -> DataFrame:
    """Recover plaintext where a key still exists; forgotten users
    (no key row) decrypt to NULL."""
    dec = F.expr(f"CAST(aes_decrypt({payload}, enc_key, '{MODE}') "
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
