

def test_pmi_pairs_counts_and_value(spark):
    from math import log
    from spork_spark.operators import pmi_pairs
    # 4 docs; "red" and "wine" co-occur in 2, each appears in 2/3 docs;
    # "the" appears in ALL docs -> pruned by the max_df ceiling
    docs = [(1, "the red wine"), (2, "the red wine list"),
            (3, "the red book"), (4, "the blue wine glass")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {(r.tok_a, r.tok_b): r for r in
           pmi_pairs(df, min_df=2, max_df_frac=0.8,
                     min_pair=2).collect()}
    assert ("red", "wine") in out
    r = out[("red", "wine")]
    assert (r.n_pair, r.df_a, r.df_b) == (2, 3, 3)
    assert abs(r.pmi - round(log(2 * 4 / (3 * 3)), 6)) < 1e-9
    assert not any("the" in k for k in out)      # hub token pruned
    assert all(a < b for a, b in out)            # canonical order


def test_pmi_pairs_counts_token_once_per_doc(spark):
    from spork_spark.operators import pmi_pairs
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "a b")], "doc_id bigint, text string")
    rows = pmi_pairs(df, min_df=1, max_df_frac=1.0, min_pair=1).collect()
    assert len(rows) == 1 and rows[0].n_pair == 2   # docs, not tokens
