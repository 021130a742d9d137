"""Property pins for the r9 operators: invariants that hold for ANY
input, beyond the planted-example tests."""

from hypothesis import given, settings
from hypothesis import strategies as st

from big_data_crypto_sentiment_spark.operators.multimodal import (
    fake_decode,
)


# --- resize target math (pure function of the dims; mirror of the
#     operator's integer branch, asserted against its contract) ---
def _target(w: int, h: int, max_dim: int = 224):
    m = max(w, h)
    if m > max_dim:
        return max(1, w * max_dim // m), max(1, h * max_dim // m), True
    return w, h, False


@settings(max_examples=300, deadline=None)
@given(st.integers(1, 100_000), st.integers(1, 100_000))
def test_resize_math_invariants(w, h):
    tw, th, resized = _target(w, h)
    assert 1 <= tw <= max(w, 224) and 1 <= th <= max(h, 224)
    assert max(tw, th) <= max(224, min(w, h))  # never exceeds the cap…
    assert max(tw, th) <= 224 or not resized   # …when it actually resized
    # aspect ordering preserved; no upscaling ever
    assert (tw >= th) == (w >= h) or tw == th
    assert tw <= w and th <= h


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=64))
def test_fake_decode_bounds_and_determinism(payload):
    w, h = fake_decode(payload)
    assert 16 <= w <= 255 and 16 <= h <= 255
    assert (w, h) == fake_decode(payload)


def test_resize_operator_matches_the_math_contract(spark):
    # the distributed operator agrees with the pure-function contract
    # on hash-derived dims for a spread of payloads
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        resize_images,
    )
    from big_data_crypto_sentiment_spark.schemas import MEDIA_SCHEMA
    rows = [(i, "image", bytes([i % 251]) * (i % 97 + 1), None,
             None, None, None) for i in range(200)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    for r in resize_images(df).collect():
        tw, th, resized = _target(r.src_width, r.src_height)
        assert (r.width, r.height, r.resized) == (tw, th, resized)


def test_langid_is_input_order_invariant(spark, tmp_path):
    # shuffling the corpus (and its partitioning) must not change a
    # single verdict: counts, ranks, and tie-breaks are all order-free
    from big_data_crypto_sentiment_spark.queries.text import (
        q_text_langid_ngram,
    )
    words = ["alpha", "badge", "cable", "zesty", "xenon", "vexed"]
    rows = [(i, " ".join(words[(i + j) % 6] for j in range(25)),
             "aa" if i % 2 else "zz", "s", 0) for i in range(40)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, "
              "source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    base = {r.doc_id: (r.pred_lang, r.oop_distance)
            for r in q_text_langid_ngram(spark, str(tmp_path)).collect()}
    df.orderBy("text").repartition(7).write.mode("overwrite") \
      .parquet(str(tmp_path / "documents.parquet"))
    again = {r.doc_id: (r.pred_lang, r.oop_distance)
             for r in q_text_langid_ngram(spark, str(tmp_path)).collect()}
    assert base == again
