-- macro + flatten + tokenize (EvalFunc family)
DEFINE topwords(rel, k) RETURNS result {
    toks = FOREACH $rel GENERATE FLATTEN(TOKENIZE(text));
    g = GROUP toks BY token;
    cnt = FOREACH g GENERATE group AS word, COUNT(toks) AS n;
    srt = ORDER cnt BY n DESC, word;
    $result = LIMIT srt $k;
};
docs = LOAD '$sf/documents.parquet';
out = topwords(docs, 5);
