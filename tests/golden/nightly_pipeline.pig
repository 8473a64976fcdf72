-- nightly.conf-shape pipeline (reference harness model:
-- pig:test/e2e/pig/tests/nightly.conf): ONE script exercising
-- %default params + a parameterized macro + SPLIT/OTHERWISE +
-- multi-STORE + STREAM THROUGH an external command + nested FOREACH
-- with inner DISTINCT/ORDER/LIMIT + join + final ORDER.
%default CUT 150000.0;
%default TOPK 3;

DEFINE seg_stats(rel, label) RETURNS out {
    g = GROUP $rel BY o_orderpriority;
    $out = FOREACH g GENERATE group AS prio, '$label' AS seg,
                              COUNT($rel) AS n,
                              FLOOR(SUM($rel.o_totalprice)) AS tot;
};

o = LOAD '$sf/orders.parquet';
SPLIT o INTO big IF o_totalprice >= $CUT, small OTHERWISE;
rmf /tmp/golden_nightly_big;
rmf /tmp/golden_nightly_small;
STORE big INTO '/tmp/golden_nightly_big';
STORE small INTO '/tmp/golden_nightly_small';

sb = seg_stats(big, big);
ss = seg_stats(small, small);
u = UNION sb, ss;

-- pipe through an external command (PigStreaming tab codec): awk adds
-- a deterministic derived column n*2
DEFINE doubler `awk -F'\t' '{OFS="\t"; print $1, $2, $3, $4, $3 * 2}'`;
st = STREAM u THROUGH doubler AS (prio:chararray, seg:chararray,
                                  n:long, tot:double, n2:long);

-- nested FOREACH over the streamed rows: per segment, distinct prios,
-- top-K rows by total
gseg = GROUP st BY seg;
agg = FOREACH gseg {
    dp = DISTINCT st.prio;
    srt = ORDER st BY tot DESC, prio;
    top = LIMIT srt $TOPK;
    GENERATE group AS seg, COUNT(dp) AS n_prio,
             FLOOR(SUM(top.tot)) AS top_tot, MAX(st.n2) AS max_n2;
};

-- join the aggregate back against a filtered side of the union
hot = FILTER u BY n > 100;
j = JOIN agg BY seg, hot BY seg;
prj = FOREACH j GENERATE agg::seg AS seg, hot::prio AS prio,
                         agg::n_prio AS n_prio, agg::top_tot AS top_tot,
                         agg::max_n2 AS max_n2, hot::n AS n_hot;
out = ORDER prj BY seg, prio;
