"""Vocabulary building + token encoding: the dataloader-side bridge
from cleaned text to packed training sequences."""



def test_build_vocabulary_feeds_encoder(spark):
    """build_vocabulary -> encode_documents round trip: ranks are dense,
    ordered by count (ties on token), and the encoder's n_tokens equals
    the document token count with zero OOV when the vocab covers all."""
    from bitfilters_spark.operators.text import build_vocabulary, encode_documents

    df = spark.createDataFrame(
        [(1, "b a a c"), (2, "a b b")], "doc_id long, text string"
    )
    vocab = build_vocabulary(df, "text", top_k=10, id_col="doc_id")
    rows = {r["token"]: (r["n"], r["df"], r["rank"]) for r in vocab.collect()}
    # a and b tie at n=3 — the token tie-break makes ranks deterministic
    assert rows == {"a": (3, 2, 1), "b": (3, 2, 2), "c": (1, 1, 3)}
    enc = {r["doc_id"]: r for r in encode_documents(df, "doc_id", "text", vocab).collect()}
    assert enc[1]["token_ids"] == [2, 1, 1, 3] and enc[1]["n_oov"] == 0
    assert enc[2]["token_ids"] == [1, 2, 2] and enc[2]["n_tokens"] == 3
    # top_k cut: vocabulary bounded, cut tokens encode as OOV
    small = build_vocabulary(df, "text", top_k=2)
    assert small.count() == 2
    enc1 = encode_documents(df, "doc_id", "text", small).where("doc_id = 1").collect()[0]
    assert enc1["token_ids"] == [2, 1, 1, 0] and enc1["n_oov"] == 1
