

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


def test_bigram_lm_score_exact_tiny(spark):
    """Hand-computed add-one bigram probabilities on a 2-doc corpus."""
    from spork_spark.operators import bigram_lm_score
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x")],   # doc 3: no bigram
        "doc_id bigint, text string")
    # training stream = docs with >= 2 tokens (doc 3 contributes no
    # bigram and no vocab): bigrams (a,b)x3, (b,a)x1; c1: a->3, b->1;
    # V = {a,b} = 2.
    # p(b|a) = (3+1)/(3+2) -> 800000 ; p(a|b) = (1+1)/(1+2) -> 666666
    out = {r.doc_id: r for r in bigram_lm_score(df).collect()}
    assert set(out) == {1, 2}                     # doc 3 unscored
    assert out[1].n_bigrams == 3
    assert out[1].sum_p_e6 == 800000 * 2 + 666666
    assert out[1].avg_p_e6 == (800000 * 2 + 666666) // 3
    assert out[2].n_bigrams == 1 and out[2].avg_p_e6 == 800000


def test_bigram_lm_score_flags_shuffled_text(spark):
    """A doc made of corpus words in atypical order scores below the
    docs that follow the corpus's transition statistics."""
    from spork_spark.operators import bigram_lm_score
    fluent = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, fluent) for i in range(5)] + [(99, "mat the on cat rug")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r.avg_p_e6 for r in bigram_lm_score(df).collect()}
    assert out[99] < out[0]


def test_boilerplate_density_marks_shared_windows(spark):
    from spork_spark.operators import boilerplate_density
    chrome = "copyright acme corp all rights reserved contact us today"
    rows = [(1, chrome + " alpha beta gamma delta"),
            (2, chrome + " epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine ten"),
            (4, "shorty")]                       # < 8 tokens: no window
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in
           boilerplate_density(df, n=8).collect()}
    assert 4 not in out
    assert out[3].dup_grams == 0 and out[3].dup_ppm == 0
    # docs 1 and 2 share the 9-token chrome prefix -> its two 8-gram
    # windows are duplicated; each doc has 6 windows (13 tokens)
    assert out[1].n_grams == 6 and out[1].dup_grams == 2
    assert out[1].dup_ppm == 2 * 1000000 // 6
    assert out[2].dup_grams == 2
