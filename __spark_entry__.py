"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001. ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2; ``oracle_sql()``
gives the DuckDB-equivalent SQL the driver diffs against at sf0.01.

Implementation notes:
- Every query is built through the engine's Relation builder
  (spork_spark.plans.relation) — the same surface the Pig Latin front-end
  lowers onto — so the driver exercises the engine, not raw pyspark.
- Double-typed aggregates are rounded to 2 decimals ON BOTH SIDES: Spark
  and DuckDB may sum floats in different orders, and the driver's
  value-hash comparison needs bit-stable values. Rounding leaves a
  residual hazard: a sum can land exactly on a floor(x*100+0.5) boundary
  with engine-dependent last ulps (an sf0.1 sweep caught `nested_cross`
  doing so). Where that bites, the fix is to make the sum EXACT on both
  engines: fold in DECIMAL, entering via the double's shortest decimal
  repr on both sides (Spark's native double→decimal cast semantics;
  DuckDB mirrors it with CAST(CAST(x AS VARCHAR) AS DECIMAL)).
- Oracle SQL mirrors Pig semantics where they diverge from ANSI defaults
  (truncating integer division via trunc(), Pig ROUND = floor(x+0.5), …).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spork_spark import Engine, col, fn, lit, flatten, bincond, configure_session
from spork_spark.plans import expressions as E

SF_SMOKE = "/root/testdata/sf0.001"

_TMP_SEQ = __import__("itertools").count()


def _tmp_path(prefix: str, sf: str) -> str:
    """Unique-per-invocation scratch dir for STORE→LOAD roundtrip queries.

    A fixed path reused across invocations in one long-lived session trips
    Spark's cached file listing: the second run overwrites the directory
    with differently-named part files while the reader still holds the
    first run's listing (FAILED_READ_FILE.FILE_NOT_EXIST — found by
    tools/soak.py's run-everything-twice harness). Real jobs write a fresh
    output dir per run; model that."""
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(),
        f"{prefix}_{abs(hash(sf)) % 10**8}_{next(_TMP_SEQ)}")


def _eng(spark: SparkSession) -> Engine:
    configure_session(spark)
    return Engine(spark)


def _t(eng: Engine, sf_dir: str, name: str):
    return eng.load(f"{sf_dir}/{name}.parquet", alias=name)


def _r2(e):
    """Stabilize doubles for the driver's value hash: floor(x*100+0.5)/100,
    the same arithmetic on both engines (no rounding-mode ambiguity —
    Spark bround is HALF_EVEN, DuckDB round is half-away-from-zero)."""
    return fn("FLOOR", e * lit(100.0) + lit(0.5)) / lit(100.0)


def _iso_sort(df: DataFrame, *cols: str) -> DataFrame:
    """ORDER BY with a sampling-isolation exchange below it. A global
    sort shuffles with RangePartitioning, whose bounds come from a
    separate SAMPLING JOB that re-executes everything since the child's
    last exchange — for the pair-mining queries that final segment is
    the whole broadcast-join verification stage, so the plain orderBy
    pays it twice (guide §1/§2.4: find and remove duplicated work;
    measured +4.6 s on dedup_minhash, +6.8 s on setsim_pairs at sf0.1).
    Hash-repartitioning on the leading sort key first (partition count =
    spark.sql.shuffle.partitions — conf-derived, not hard-coded) makes
    the resampled segment a bare shuffle read. Output rows and their
    total order are identical to df.orderBy(*cols)."""
    return df.repartition(F.col(cols[0])).orderBy(*cols)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H-Q1-style aggregation (FILTER → GROUP → FOREACH with
    algebraic aggregates → ORDER), fused to a single groupBy().agg()."""
    return q_agg_q1(spark, SF_SMOKE)


# ---------------------------------------------------------------------------
# core relational operators (SURVEY.md §2.1)
# ---------------------------------------------------------------------------

def q_agg_q1(spark, sf):
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    bag = col("lineitem")
    return (li.filter(col("l_shipdate") <= lit("1998-09-02"))
              .group_by(col("l_returnflag"), col("l_linestatus"))
              .foreach(
                  col("group").get("l_returnflag").alias("l_returnflag"),
                  col("group").get("l_linestatus").alias("l_linestatus"),
                  _r2(fn("SUM", bag.get("l_quantity"))).alias("sum_qty"),
                  _r2(fn("SUM", bag.get("l_extendedprice"))).alias("sum_base_price"),
                  _r2(fn("AVG", bag.get("l_quantity"))).alias("avg_qty"),
                  _r2(fn("AVG", bag.get("l_discount"))).alias("avg_disc"),
                  fn("COUNT_STAR").alias("count_order"))
              .order_by(col("l_returnflag"), col("l_linestatus"))).df()


def q_join_3way(spark, sf):
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    orders = _t(eng, sf, "orders")
    li = _t(eng, sf, "lineitem")
    nation = _t(eng, sf, "nation")
    j = (cust.join([col("c_custkey")], orders, [col("o_custkey")])
             .join([col("o_orderkey")], li, [col("l_orderkey")])
             .join([col("c_nationkey")], nation, [col("n_nationkey")],
                   strategy="replicated"))
    g = j.group_by(col("n_name"))
    return (g.foreach(col("group").alias("n_name"),
                      _r2(fn("SUM", col(j.alias).get("l_extendedprice"))).alias("revenue"),
                      fn("COUNT_STAR").alias("n_items"))
             .order_by(col("n_name"))).df()


def q_pigmix_distinct_agg(spark, sf):
    """PigMix L4/L15 shape (pig:test/perf/pigmix/): several distinct-count
    aggregates per group. The Pig idiom is nested FOREACH { DISTINCT bag;
    GENERATE COUNT }; the scalable compilation is fused count_distinct —
    Catalyst expands multi-distinct into the expand+partial-agg plan, no
    bag materialization."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    g = li.group_by(col("l_returnflag"))
    return (g.foreach(col("group").alias("l_returnflag"),
                      fn("COUNT_DISTINCT", col("lineitem").get("l_partkey"))
                      .alias("n_parts"),
                      fn("COUNT_DISTINCT", col("lineitem").get("l_suppkey"))
                      .alias("n_supps"),
                      fn("COUNT_STAR").alias("n_rows"))
             .order_by(col("l_returnflag"))).df()


def q_udaf_custom(spark, sf):
    """Custom aggregate surface (SURVEY.md §2.10 Algebraic/Accumulator →
    register_udaf grouped-agg pandas UDF): per-flag trimmed mean of
    quantity (drop one min + one max) MIXED with builtin aggregates —
    exercises the split-aggregation compilation (grouped-agg pandas UDFs
    cannot share a Spark Aggregate with JVM aggregates)."""
    eng = _eng(spark)

    def trimmed_mean(s):
        s = s.dropna()            # aggregates skip nulls (Pig/SQL contract)
        n = len(s)
        if n <= 2:
            return float(s.mean())
        return float((s.sum() - s.min() - s.max()) / (n - 2))

    eng.register_udaf("TRIMMED_MEAN", trimmed_mean, "double")
    li = _t(eng, sf, "lineitem")
    g = li.group_by(col("l_returnflag"))
    return (g.foreach(col("group").alias("l_returnflag"),
                      _r2(fn("TRIMMED_MEAN", col("lineitem").get("l_quantity")))
                      .alias("trimmed_qty"),
                      fn("COUNT_STAR").alias("n_rows"))
             .order_by(col("l_returnflag"))).df()


def q_pigmix_wide_group(spark, sf):
    """PigMix L17 shape: wide (4-part, mixed-type, computed) group key."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    g = li.group_by(col("l_returnflag"), col("l_linestatus"),
                    col("l_linenumber"), fn("GETYEAR", col("l_shipdate")))
    return (g.foreach(col("group").get("l_returnflag").alias("l_returnflag"),
                      col("group").get("l_linestatus").alias("l_linestatus"),
                      col("group").get("l_linenumber").alias("l_linenumber"),
                      col("group").get("group_3").alias("ship_year"),
                      _r2(fn("SUM", col("lineitem").get("l_quantity")))
                      .alias("sum_qty"),
                      fn("COUNT_STAR").alias("n"))
             .order_by(col("l_returnflag"), col("l_linestatus"),
                       col("l_linenumber"), col("ship_year"))).df()


def q_pigmix_map_access(spark, sf):
    """PigMix L1 shape (pig:test/perf/pigmix/ L1 'explode map'): map built
    under load, `#` key lookup used in both FILTER and FOREACH, then a
    group-aggregate over the looked-up value. All native Column ops
    (create_map / getItem / get_json_object) — no Python."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        e = LOAD '{sf}/events.parquet';
        m = FOREACH e GENERATE user_id,
                TOMAP('type', event_type,
                      'k', GET_JSON_OBJECT(props, '$.k')) AS info;
        f = FILTER m BY info#'type' == 'click';
        p = FOREACH f GENERATE user_id, (int)(info#'k') AS k;
        g = FOREACH (GROUP p BY user_id)
            GENERATE group AS user_id, SUM(p.k) AS sum_k, COUNT(p) AS n;
        out = ORDER g BY user_id;
    """)
    return rels["out"].df()


def q_pigmix_fanout_join(spark, sf):
    """PigMix L2 shape: fact × small-dim fan-out join USING 'replicated'
    (POFRJoin → BroadcastHashJoin), grouped on the dim key."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        li = LOAD '{sf}/lineitem.parquet';
        s = LOAD '{sf}/supplier.parquet';
        j = JOIN li BY l_suppkey, s BY s_suppkey USING 'replicated';
        g = FOREACH (GROUP j BY s_nationkey)
            GENERATE group AS s_nationkey, COUNT_STAR(j) AS n_items,
                     FLOOR(SUM(j.l_quantity) * 100.0 + 0.5) / 100.0 AS qty;
        out = ORDER g BY s_nationkey;
    """)
    return rels["out"].df()


def q_pigmix_anti_cogroup(spark, sf):
    """PigMix L5 shape: the COGROUP + IsEmpty anti-join idiom, written
    exactly as the Pig script would be — lineitems whose part never
    crosses the price threshold."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        li = LOAD '{sf}/lineitem.parquet';
        p = LOAD '{sf}/part.parquet';
        pricey = FILTER p BY p_retailprice > 1800.0;
        cg = COGROUP li BY l_partkey, pricey BY p_partkey;
        anti = FILTER cg BY IsEmpty(pricey);
        out = FOREACH anti GENERATE group AS l_partkey,
                                    COUNT_STAR(li) AS n_items;
        srt = ORDER out BY l_partkey;
    """)
    return rels["srt"].df()


def q_pigmix_nested_split(spark, sf):
    """PigMix L7 shape (nested split): one pass over the group bag feeding
    two inner FILTER legs plus the unfiltered total — compiles to
    conditional aggregates, not bag materialization."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        e = LOAD '{sf}/events.parquet';
        g = GROUP e BY event_type;
        r = FOREACH g {{ hi = FILTER e BY value > 40.0;
                         lo = FILTER e BY value < 10.0;
                         GENERATE group AS event_type,
                                  COUNT_STAR(hi) AS n_hi,
                                  COUNT_STAR(lo) AS n_lo,
                                  COUNT_STAR(e) AS n; }};
        out = ORDER r BY event_type;
    """)
    return rels["out"].df()


def q_pigmix_total_sort(spark, sf):
    """PigMix L9/L10 shape: full total-order sort (no LIMIT), mixed
    directions and mixed key types — exercises range-partitioned sort
    (sampling + rangepartitioning exchange), the scalable global sort."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        e = LOAD '{sf}/events.parquet';
        p = FOREACH e GENERATE event_type, value, user_id;
        out = ORDER p BY event_type ASC, value DESC, user_id ASC;
    """)
    return rels["out"].df()


def q_pigmix_nested_sort(spark, sf):
    """PigMix L16 shape: nested FOREACH with inner ORDER + LIMIT (top-3
    per supplier) aggregated from the trimmed bag. Per-key bags are
    bounded by the LIMIT before the SUM."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        li = LOAD '{sf}/lineitem.parquet';
        g = GROUP li BY l_suppkey;
        r = FOREACH g {{ srt = ORDER li BY l_extendedprice DESC;
                         top = LIMIT srt 3;
                         GENERATE group AS l_suppkey,
                                  COUNT_STAR(top) AS n_top,
                                  FLOOR(SUM(top.l_extendedprice) * 100.0 + 0.5)
                                      / 100.0 AS top3_total; }};
        out = ORDER r BY l_suppkey;
    """)
    return rels["out"].df()


def q_pigmix_multistore(spark, sf):
    """PigMix L12 shape: SPLIT + multiple STOREs in one script (multi-sink
    DAG with a shared, persisted parent), outputs read back and
    reassembled with route tags to prove both sinks."""
    import os
    import tempfile

    from spork_spark.parser import run_script
    from spork_spark.sources import read
    eng = _eng(spark)
    base = _tmp_path("spork_multistore", sf)
    for leg in ("hi", "lo"):
        import shutil
        shutil.rmtree(f"{base}_{leg}", ignore_errors=True)
    run_script(eng, f"""
        e = LOAD '{sf}/events.parquet';
        p = FOREACH e GENERATE event_id, event_type, value;
        SPLIT p INTO hi IF value >= 25.0, lo OTHERWISE;
        STORE hi INTO '{base}_hi';
        STORE lo INTO '{base}_lo';
    """)
    hi = read(spark, f"{base}_hi").withColumn("route", F.lit("hi"))
    lo = read(spark, f"{base}_lo").withColumn("route", F.lit("lo"))
    return hi.unionByName(lo).orderBy("event_id")


def q_union_distinct(spark, sf):
    """PigMix L11 shape: UNION of two projections, then DISTINCT."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    a = orders.filter(col("o_orderstatus") == "F") \
              .foreach(col("o_custkey").alias("k"))
    b = orders.filter(col("o_totalprice") > lit(150000.0)) \
              .foreach(col("o_custkey").alias("k"))
    return a.union(b).distinct().order_by(col("k")).df()


def q_filter_expr(spark, sf):
    """FILTER with compound predicate (matches anchored, IN, arithmetic) +
    FOREACH expression language (bincond, CASE-ish)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    return (orders
            .filter(col("o_orderpriority").matches("[13]-.*") &
                    col("o_orderstatus").isin("F", "P") &
                    (col("o_totalprice") > lit(1000.0)))
            .foreach(col("o_orderkey").alias("o_orderkey"),
                     _r2(col("o_totalprice") * lit(0.9)).alias("discounted"),
                     bincond(col("o_totalprice") > 200000.0,
                             lit("big"), lit("small")).alias("bucket"))
            .order_by(col("o_orderkey"))).df()


def q_orderby_limit(spark, sf):
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    return (li.foreach(col("l_orderkey").alias("l_orderkey"),
                       col("l_linenumber").alias("l_linenumber"),
                       col("l_extendedprice").alias("l_extendedprice"))
              .order_by((col("l_extendedprice"), False),
                        col("l_orderkey"), col("l_linenumber"))
              .limit(100)).df()


def q_distinct(spark, sf):
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    return (li.foreach(col("l_orderkey").alias("l_orderkey"),
                       col("l_partkey").alias("l_partkey"))
              .distinct()).df()


def q_union_all(spark, sf):
    """UNION keeps duplicates (bag union, no dedup)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    a = orders.filter(col("o_orderstatus") == "F") \
              .foreach(col("o_orderkey").alias("k"),
                       col("o_orderstatus").alias("st"))
    b = orders.filter(col("o_totalprice") > 100000.0) \
              .foreach(col("o_orderkey").alias("k"),
                       col("o_orderstatus").alias("st"))
    return a.union(b).df()


def q_union_onschema(spark, sf):
    """UNION ONSCHEMA: merge by column name, null-pad missing columns."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    a = orders.filter(col("o_orderstatus") == "F") \
              .foreach(col("o_orderkey").alias("k"),
                       col("o_totalprice").alias("price"))
    b = orders.filter(col("o_orderstatus") == "P") \
              .foreach(col("o_orderkey").alias("k"),
                       col("o_orderpriority").alias("prio"))
    return a.union(b, onschema=True).df()


def q_split(spark, sf):
    """SPLIT INTO high IF …, low IF …, OTHERWISE — reassembled with a route
    tag so one result proves all outputs (parent persisted once)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    high, low, rest = orders.split(col("o_totalprice") > 150000.0,
                                   col("o_totalprice") < 50000.0,
                                   otherwise=True)
    tag = lambda r, t: r.foreach(col("o_orderkey").alias("k"),
                                 lit(t).alias("route"))
    return tag(high, "high").union(tag(low, "low"), tag(rest, "mid")).df()


def q_cross(spark, sf):
    eng = _eng(spark)
    region = _t(eng, sf, "region")
    nation = _t(eng, sf, "nation")
    return (region.cross(nation)
            .foreach(col("r_name").alias("r_name"),
                     col("n_name").alias("n_name"))
            .order_by(col("r_name"), col("n_name"))).df()


def q_cogroup(spark, sf):
    """COGROUP customer BY c_nationkey, supplier BY s_nationkey →
    (group, bag_c, bag_s); project bag sizes. Absent groups → empty bags."""
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    supp = _t(eng, sf, "supplier")
    cg = cust.cogroup([col("c_nationkey")], (supp, [col("s_nationkey")]))
    return (cg.foreach(col("group").alias("nationkey"),
                       fn("SIZE", col("customer")).alias("n_cust"),
                       fn("SIZE", col("supplier")).alias("n_supp"))
              .order_by(col("nationkey"))).df()


def q_join_left(spark, sf):
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    orders = _t(eng, sf, "orders")
    j = cust.join([col("c_custkey")], orders, [col("o_custkey")], how="left")
    g = j.group_by(col("c_custkey"))
    return (g.foreach(col("group").alias("c_custkey"),
                      fn("COUNT", col(j.alias).get("o_orderkey")).alias("n_orders"))
             .order_by(col("c_custkey"))).df()


def q_join_semi(spark, sf):
    """Pig idiom COGROUP+FILTER NOT IsEmpty → first-class left_semi."""
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    orders = _t(eng, sf, "orders")
    big = orders.filter(col("o_totalprice") > 200000.0)
    return (cust.join([col("c_custkey")], big, [col("o_custkey")], how="semi")
                .foreach(col("c_custkey").alias("c_custkey"),
                         col("c_name").alias("c_name"))
                .order_by(col("c_custkey"))).df()


def q_join_anti(spark, sf):
    """Customers with no big order — Pig COGROUP+IsEmpty idiom, first-class."""
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    orders = _t(eng, sf, "orders")
    big = orders.filter(col("o_totalprice") > 300000.0)
    return (cust.join([col("c_custkey")], big, [col("o_custkey")], how="anti")
                .foreach(col("c_custkey").alias("c_custkey"))
                .order_by(col("c_custkey"))).df()


def q_join_replicated(spark, sf):
    """JOIN USING 'replicated' → broadcast hash join (POFRJoin)."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    part = _t(eng, sf, "part")
    j = li.join([col("l_partkey")], part, [col("p_partkey")],
                strategy="replicated")
    g = j.group_by(col("p_brand"))
    return (g.foreach(col("group").alias("p_brand"),
                      _r2(fn("SUM", col(j.alias).get("l_extendedprice"))).alias("value"),
                      fn("COUNT_STAR").alias("cnt"))
             .order_by(col("p_brand"))).df()


def q_group_all(spark, sf):
    """GROUP ALL → single global aggregate row."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    bag = col("lineitem")
    return (li.group_all()
              .foreach(fn("COUNT_STAR").alias("n_rows"),
                       _r2(fn("SUM", bag.get("l_quantity"))).alias("total_qty"),
                       _r2(fn("MIN", bag.get("l_extendedprice"))).alias("min_price"),
                       _r2(fn("MAX", bag.get("l_extendedprice"))).alias("max_price"))).df()


def q_rank_window(spark, sf):
    """RANK BY (windowed form): top-3 orders per customer by totalprice."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    w = E.WindowFunc("rank", [], [col("o_custkey")],
                     [(col("o_totalprice"), False)])
    ranked = orders.foreach(col("o_custkey").alias("o_custkey"),
                            col("o_orderkey").alias("o_orderkey"),
                            col("o_totalprice").alias("o_totalprice"),
                            E.Aliased(w, "rnk"))
    return (ranked.filter(col("rnk") <= 3)
                  .foreach(col("o_custkey").alias("o_custkey"),
                           col("o_orderkey").alias("o_orderkey"),
                           col("o_totalprice").alias("o_totalprice"),
                           col("rnk").cast("int").alias("rnk"))
                  .order_by(col("o_custkey"), col("rnk"), col("o_orderkey"))).df()


def q_cube(spark, sf):
    """CUBE rel BY CUBE(a,b) → grouping-sets aggregation, null-filled dims."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    return (li.cube(col("l_returnflag"), col("l_linestatus"))
              .foreach(col("group").get("l_returnflag").alias("l_returnflag"),
                       col("group").get("l_linestatus").alias("l_linestatus"),
                       _r2(fn("SUM", col("lineitem").get("l_quantity"))).alias("sum_qty"),
                       fn("COUNT_STAR").alias("cnt"))
              .order_by(col("l_returnflag"), col("l_linestatus"))).df()


def q_rollup(spark, sf):
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    withyear = orders.foreach(fn("GETYEAR", col("o_orderdate")).alias("yr"),
                              col("o_orderstatus").alias("o_orderstatus"),
                              col("o_totalprice").alias("o_totalprice"))
    return (withyear.rollup(col("yr"), col("o_orderstatus"))
            .foreach(col("group").get("yr").alias("yr"),
                     col("group").get("o_orderstatus").alias("o_orderstatus"),
                     _r2(fn("SUM", col(withyear.alias).get("o_totalprice"))).alias("total"),
                     fn("COUNT_STAR").alias("cnt"))
            .order_by(col("yr"), col("o_orderstatus"))).df()


def q_flatten_wordcount(spark, sf):
    """FOREACH … GENERATE FLATTEN(TOKENIZE(text)) → GROUP → COUNT: the
    canonical Pig wordcount over the documents table."""
    eng = _eng(spark)
    docs = _t(eng, sf, "documents")
    toks = docs.foreach(flatten(fn("TOKENIZE", col("text"))))
    g = toks.group_by(col("token"))
    return (g.foreach(col("group").alias("token"),
                      fn("COUNT_STAR").alias("cnt"))
             .order_by((col("cnt"), False), col("token"))
             .limit(100)).df()


def q_flatten_join(spark, sf):
    """FLATTEN-then-JOIN through the parser: tokens of o_orderpriority
    exploded, then joined to customer on o_custkey. The compiler's
    PushDownForEachFlatten rewrite (compiler/plan.py _try_defer_flatten)
    runs the join BEFORE the explode — the shuffle moves un-amplified
    order rows with the token array as one column — while the result is
    identical to the eager explode the oracle computes."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        o = LOAD '{sf}/orders.parquet';
        c = LOAD '{sf}/customer.parquet';
        fe = FOREACH o GENERATE o_custkey, o_orderkey,
                                FLATTEN(TOKENIZE(o_orderpriority)) AS tok;
        j = JOIN fe BY o_custkey, c BY c_custkey;
        g = GROUP j BY (c_mktsegment, tok);
        agg = FOREACH g GENERATE FLATTEN(group) AS (seg, tok),
                                 COUNT_STAR(j) AS cnt;
        srt = ORDER agg BY seg, tok;
    """)
    return rels["srt"].df()


# ---------------------------------------------------------------------------
# builtin function coverage (SURVEY.md §2.4–2.5)
# ---------------------------------------------------------------------------

def q_string_funcs(spark, sf):
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    name = col("c_name")
    return (cust.foreach(
        col("c_custkey").alias("c_custkey"),
        fn("UPPER", name).alias("up"),
        fn("LOWER", name).alias("lo"),
        fn("SUBSTRING", name, 0, 8).alias("sub"),       # 0-based stop-exclusive
        fn("INDEXOF", name, "_").alias("idx"),          # 0-based, -1 missing
        fn("CONCAT", name, lit("|"), col("c_mktsegment")).alias("cat"),
        fn("REPLACE", name, "[0-9]+", "#").alias("repl"),
        fn("STARTSWITH", name, lit("CUSTOMER")).alias("sw"),
        fn("SIZE", name).alias("len"),
        fn("UCFIRST", fn("LOWER", name)).alias("ucf"))
        .order_by(col("c_custkey"))).df()


def q_math_funcs(spark, sf):
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    return (li.filter(col("l_linenumber") == 1)
              .foreach(col("l_orderkey").alias("l_orderkey"),
                       fn("ROUND", col("l_extendedprice")).alias("rnd"),
                       fn("FLOOR", col("l_extendedprice")).alias("flr"),
                       fn("CEIL", col("l_extendedprice")).alias("cl"),
                       _r2(fn("SQRT", col("l_quantity"))).alias("sq"),
                       fn("ABS", lit(0.0) - col("l_discount")).alias("ab"),
                       _r2(fn("LOG", col("l_extendedprice"))).alias("lg"))
              .order_by(col("l_orderkey"))).df()


def q_datetime_funcs(spark, sf):
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    d = col("o_orderdate")
    return (orders.foreach(
        col("o_orderkey").alias("o_orderkey"),
        fn("GETYEAR", d).alias("yr"),
        fn("GETMONTH", d).alias("mo"),
        fn("GETDAY", d).alias("dy"),
        fn("DAYSBETWEEN", d, fn("TODATE", lit("1995-01-01"))).alias("days_since"))
        .order_by(col("o_orderkey"))).df()


def q_int_division(spark, sf):
    """Pig int/int = Java integer division (truncate toward zero)."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    return (li.foreach(col("l_orderkey").alias("l_orderkey"),
                       col("l_linenumber").alias("l_linenumber"),
                       (col("l_linenumber") / lit(2)).alias("half"),
                       (col("l_orderkey") % lit(7)).alias("m7"))
              .order_by(col("l_orderkey"), col("l_linenumber"))).df()


def q_events_session(spark, sf):
    """events by user × hour bucket: count + sum(value), top 50."""
    eng = _eng(spark)
    ev = _t(eng, sf, "events")
    bucketed = ev.foreach(col("user_id").alias("user_id"),
                          fn("GETHOUR", col("ts")).alias("hr"),
                          col("value").alias("value"))
    g = bucketed.group_by(col("user_id"), col("hr"))
    return (g.foreach(col("group").get("user_id").alias("user_id"),
                      col("group").get("hr").alias("hr"),
                      fn("COUNT_STAR").alias("cnt"),
                      _r2(fn("SUM", col(bucketed.alias).get("value"))).alias("total"))
             .order_by((col("cnt"), False), col("user_id"), col("hr"))
             .limit(50)).df()


def q_events_json(spark, sf):
    """JSON scalar extension over events.props (get_json_object)."""
    eng = _eng(spark)
    ev = _t(eng, sf, "events")
    parsed = ev.foreach(col("event_type").alias("event_type"),
                        fn("GET_JSON_OBJECT", col("props"), "$.k")
                        .cast("int").alias("k"))
    g = parsed.group_by(col("event_type"))
    return (g.foreach(col("group").alias("event_type"),
                      fn("SUM", col(parsed.alias).get("k")).alias("sum_k"),
                      fn("COUNT", col(parsed.alias).get("k")).alias("n_k"))
             .order_by(col("event_type"))).df()


def q_percentiles(spark, sf):
    """Exact percentile / median / stddev per group (analytic aggregates
    beyond the reference; percentile_cont interpolation both engines)."""
    from spork_spark.operators.dedup import _spread
    eng = _eng(spark)
    # _spread the narrow projection: exact PERCENTILE buffers every
    # value in its partial aggregate, so a single-row-group scan runs
    # the whole buffering pass on one core; identity at real scale.
    li = eng.from_df(
        _spread(_t(eng, sf, "lineitem").df()
                .select("l_returnflag", "l_extendedprice", "l_quantity")),
        alias="lineitem")
    bag = col("lineitem")
    return (li.group_by(col("l_returnflag"))
              .foreach(col("group").alias("l_returnflag"),
                       _r2(fn("PERCENTILE", bag.get("l_extendedprice"), 0.5))
                       .alias("p50"),
                       _r2(fn("PERCENTILE", bag.get("l_extendedprice"), 0.95))
                       .alias("p95"),
                       _r2(fn("STDEV", bag.get("l_quantity"))).alias("sd_qty"))
              .order_by(col("l_returnflag"))).df()


def q_window_lag(spark, sf):
    """Window-function surface (SURVEY.md §2.6 extension): per-customer
    order timeline with lag/lead/ntile."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    lag_w = E.WindowFunc("lag", [col("o_totalprice")], [col("o_custkey")],
                         [(col("o_orderdate"), True), (col("o_orderkey"), True)])
    ntile_w = E.WindowFunc("ntile", [E.Lit(4)], [col("o_custkey")],
                           [(col("o_orderdate"), True), (col("o_orderkey"), True)])
    return (orders.foreach(col("o_custkey").alias("o_custkey"),
                           col("o_orderkey").alias("o_orderkey"),
                           E.Aliased(lag_w, "prev_price"),
                           E.Aliased(ntile_w, "quartile"))
                  .order_by(col("o_custkey"), col("o_orderkey"))).df()


def q_cube_mixed(spark, sf):
    """Mixed grouping clauses: CUBE rel BY CUBE(a), ROLLUP(b) → the cross
    product of per-clause grouping sets, compiled to one
    DataFrame.groupingSets pass (SURVEY.md §2.1 #25; the reference expands
    via CubeDimensions × RollupDimensions)."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        li = LOAD '{sf}/lineitem.parquet';
        c = CUBE li BY CUBE(l_returnflag), ROLLUP(l_linestatus);
        p = FOREACH c GENERATE group.l_returnflag AS l_returnflag,
                               group.l_linestatus AS l_linestatus,
                               COUNT(li) AS cnt;
        srt = ORDER p BY l_returnflag, l_linestatus, cnt;
    """)
    return rels["srt"].df()


def q_sample_deterministic(spark, sf):
    """Reproducible corpus split (extension, SURVEY.md §2.11): route each
    document to train/eval by an md5-prefix of its key — deterministic,
    rerunnable, cluster-order-independent (unlike SAMPLE/rand), and
    oracle-exact since md5 is engine-portable. The standard trick for
    stable train/test splits over a 100 TB corpus: no shuffle, no state,
    pure map-side predicate."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        d = LOAD '{sf}/documents.parquet';
        t = FOREACH d GENERATE lang, SUBSTRING(MD5(doc_id), 0, 2) AS h;
        s = FOREACH t GENERATE lang, (h < '1a' ? 'eval' : 'train') AS part;
        g = FOREACH (GROUP s BY (lang, part))
            GENERATE group.lang AS lang, group.part AS part, COUNT(s) AS n;
        o = ORDER g BY lang, part;
    """)
    return rels["o"].df()


def q_range_proj(spark, sf):
    """Project-range + multi-field projection (Pig 0.9 syntax): positional
    column ranges expand at compile time, so pruning still reaches the
    parquet scan (ReadSchema carries only the 4 selected columns)."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        li = LOAD '{sf}/lineitem.parquet';
        p = FOREACH li GENERATE l_orderkey .. l_suppkey, l_quantity;
        o = ORDER p BY l_orderkey, l_partkey, l_suppkey, l_quantity;
    """)
    return rels["o"].df()


def q_pig_script(spark, sf):
    """Full front-end path: Pig Latin text → parse → lower → compile.
    Same result contract as a hand-built plan (oracle: plain SQL)."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        li = LOAD '{sf}/lineitem.parquet';
        flt = FILTER li BY l_quantity < 25.0 AND l_returnflag matches '[AR]';
        g = GROUP flt BY (l_returnflag, l_linestatus);
        agg = FOREACH g GENERATE group.l_returnflag AS l_returnflag,
                                 group.l_linestatus AS l_linestatus,
                                 COUNT(flt) AS cnt,
                                 SUM(flt.l_quantity) AS qty;
        srt = ORDER agg BY l_returnflag, l_linestatus;
    """)
    return rels["srt"].df()


def q_nested_foreach(spark, sf):
    """Nested FOREACH (SURVEY.md §2.3): per customer, count of big orders
    (inner FILTER) + sum of top-2 order prices (inner ORDER + LIMIT) —
    compiled to bag higher-order functions on a materialized bag."""
    from spork_spark import lam
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    g = orders.group_by(col("o_custkey"))
    top2 = fn("LIMIT_BAG",
              fn("SORT_BAG", col("orders"), "o_totalprice", False), 2)
    return (g.foreach(
                col("group").alias("custkey"),
                fn("COUNT",
                   fn("FILTER_BAG", col("orders"),
                      lam(lambda t: t.get("o_totalprice") > 150000.0)))
                .alias("n_big"),
                _r2(fn("SUM", top2.get("o_totalprice"))).alias("top2_total"))
              .order_by(col("custkey"))).df()


def q_nested_cross(spark, sf):
    """Inner CROSS + inner FOREACH (SURVEY.md §2.3, Pig 0.13+): per order
    priority, cartesian of the very-expensive and very-cheap order bags,
    then a per-pair projection and aggregates over the crossed bag. All
    compiled to nested transform/flatten array expressions — one shuffle
    (the GROUP), no UDF, no extra join."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        o = LOAD '{sf}/orders.parquet';
        g = GROUP o BY o_orderpriority;
        x = FOREACH g {{ hv0 = FOREACH o GENERATE o_totalprice AS hv;
                         hi = FILTER hv0 BY hv > 400000.0;
                         lv0 = FOREACH o GENERATE o_totalprice AS lv;
                         lo = FILTER lv0 BY lv < 2000.0;
                         c = CROSS hi, lo;
                         d = FOREACH c GENERATE (bigdecimal)(hv - lv) AS spread;
                         GENERATE group AS pri, COUNT_STAR(c) AS n_pairs,
                                  SUM(d.spread) AS spread_total; }};
        srt = ORDER x BY pri;
    """)
    # Sum in DECIMAL, not double: exact order-independent addition on
    # both engines (an sf0.1 sweep caught a double-sum landing exactly on
    # a floor(x*100+0.5) boundary with engine-dependent last ulps). The
    # identical exact sum then converts to double and rounds identically.
    from pyspark.sql import functions as F
    df = rels["srt"].df()
    return df.withColumn(
        "spread_total",
        F.floor(F.col("spread_total").cast("double") * 100.0 + 0.5) / 100.0)


def q_scalar_of_relation(spark, sf):
    """Scalar-of-relation (SURVEY.md §2.2): orders above the global average
    price — the 1-row aggregate crosses back onto the relation."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    avg1 = (orders.group_all()
            .foreach(fn("AVG", col("orders").get("o_totalprice"))
                     .alias("avg_price")))
    return (orders.cross(avg1)
            .filter(col("o_totalprice") > col("avg_price"))
            .foreach(col("o_orderkey").alias("o_orderkey"),
                     col("o_totalprice").alias("o_totalprice"))
            .order_by(col("o_orderkey"))).df()


# ---------------------------------------------------------------------------
# extension operators (SURVEY.md §2.11 — dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf):
    """Exact dedup on text with deterministic min-doc_id survivor."""
    from spork_spark.operators import exact_dedup
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    out = exact_dedup(docs, ["text"], keep="min", tiebreak="doc_id")
    return out.select("doc_id", "n_chars").orderBy("doc_id")


def q_dedup_minhash(spark, sf):
    """MinHash+LSH near-dup pairs over documents, hash_fn='md5' so the
    j-th permutation (min of md5(j || ':' || shingle) as a hex string) is
    byte-identical in DuckDB — the full pipeline, INCLUDING which candidate
    pairs the banding surfaces, is exact-oracle-checked. Production default
    is hash_fn='xxhash64' (same plan shape, faster scalar hash)."""
    from spork_spark.operators import minhash_lsh_pairs
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return _iso_sort(
        minhash_lsh_pairs(docs, "doc_id", "text", shingle_n=5,
                          num_hashes=64, bands=16, threshold=0.6,
                          hash_fn="md5"),
        "id_a", "id_b")


def q_connected_components(spark, sf):
    """Distributed connected components (min-label propagation + pointer
    jumping, O(log diameter) rounds of two key-shuffles — operators/
    graph.py): deterministic edge set over documents (short chains via
    doc_id%10<4 successor edges, long-range merges via doc_id→2*doc_id
    doubling edges). Oracle: DuckDB recursive-CTE transitive closure with
    MIN per node — exact component labels."""
    from spork_spark.operators import connected_components
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df().select("doc_id")
    e1 = docs.filter(F.col("doc_id") % 10 < 4) \
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") + 1).alias("dst"))
    e2 = docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") > 0)) \
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") * 2).alias("dst"))
    return connected_components(e1.union(e2)).orderBy("node")


def q_triangles(spark, sf):
    """Global triangle count by degree-ordered orientation (operators/
    graph.py triangle_count — Suri & Vassilvitskii WWW'11): the
    orientation bounds wedge fan-out by O(sqrt(m)), fixing the hub-node
    last-reducer blowup. Deterministic edge set over documents: a path
    d→d+1 plus chords d→d+2 on even d (one triangle per even d) plus
    doubling edges d→2d. Oracle: direct a<b<c triple join — triangle
    counts are orientation-independent, so the simplest exact SQL
    checks the clever plan."""
    from spork_spark.operators.graph import triangle_count
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df().select("doc_id")
    e1 = docs.select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") + 1).alias("dst"))
    e2 = docs.filter(F.col("doc_id") % 2 == 0) \
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") + 2).alias("dst"))
    e3 = docs.filter(F.col("doc_id") > 0) \
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") * 2).alias("dst"))
    return triangle_count(e1.union(e2).union(e3))


def q_pagerank(spark, sf):
    """Fixed-iteration PageRank in EXACT integer arithmetic (operators/
    graph.py pagerank): 3 rounds, damping 85/100, integer mass units —
    every update is integer div/mul, so the unrolled SQL oracle
    reproduces ranks bit-for-bit (no float fold-order dependence, the
    reason iterative graph algorithms usually get only rows-only
    checks). Same deterministic edge set as `triangles`. Per round: one
    src-key join + one dst-key groupBy + a 1-row dangling broadcast."""
    from spork_spark.operators.graph import pagerank
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df().select("doc_id")
    e1 = docs.select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") + 1).alias("dst"))
    e2 = docs.filter(F.col("doc_id") % 2 == 0) \
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") + 2).alias("dst"))
    e3 = docs.filter(F.col("doc_id") > 0) \
             .select(F.col("doc_id").alias("src"),
                     (F.col("doc_id") * 2).alias("dst"))
    return pagerank(e1.union(e2).union(e3), n_iter=3) \
        .orderBy("node")


def q_dedup_near_full(spark, sf):
    """END-TO-END near-dedup: LSH pairs (md5 mode, same parameters as
    dedup_minhash) → connected components → keep min doc_id per duplicate
    cluster. Unlike pair-level output, this closes transitivity (A≈B≈C
    drops both B and C). Oracle replays the identical LSH SQL plus a
    recursive-CTE component step."""
    from spork_spark.operators import near_dedup
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return near_dedup(docs, "doc_id", "text", shingle_n=5, num_hashes=64,
                      bands=16, threshold=0.6, hash_fn="md5") \
        .select("doc_id").orderBy("doc_id")


def q_dedup_incremental(spark, sf):
    """Incremental near-dedup of an ingest batch against a STORED LSH
    index (operators/dedup.py minhash_banding + lsh_pairs_incremental):
    docs with doc_id % 5 == 0 arrive as the new batch; banding rows are
    computed for THEM only and candidate-joined against the historical
    index — old-old pairs never form, and exact-jaccard verification
    re-shingles only candidate-touched docs (semi-join pruned). Same
    md5-mode parameters as dedup_minhash, so the oracle replays the
    full-corpus LSH SQL filtered to pairs touching a new id — which is
    exactly what the incremental path must reproduce."""
    from spork_spark.operators import lsh_pairs_incremental, minhash_banding
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = minhash_banding(old, "doc_id", "text", shingle_n=5,
                          num_hashes=64, bands=16, hash_fn="md5")
    return _iso_sort(
        lsh_pairs_incremental(idx, old, new, "doc_id", "text",
                              shingle_n=5, num_hashes=64, bands=16,
                              threshold=0.6, hash_fn="md5"),
        "id_a", "id_b")


def q_shortest_paths(spark, sf):
    """Multi-source bounded BFS (operators/graph.py bfs_distances) over
    the synthetic doc graph (chain + doubling edges, the cc fixture):
    hop distance from the doc_id % 100 == 0 seed set, max 4 hops.
    Level-synchronous frontier expansion — per-round work is
    frontier-out-degree, visited nodes never re-expand; the oracle is
    the recursive-CTE walk with MIN(dist) per node."""
    from spork_spark.operators import bfs_distances
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    chain = (docs.filter(F.col("doc_id") % 10 < 4)
                 .select(F.col("doc_id").alias("src"),
                         (F.col("doc_id") + 1).alias("dst")))
    doubling = docs.select(F.col("doc_id").alias("src"),
                           (F.col("doc_id") * 2).alias("dst"))
    edges = chain.unionByName(doubling)
    sources = docs.filter(F.col("doc_id") % 100 == 0) \
                  .select(F.col("doc_id").alias("node"))
    return bfs_distances(edges, sources, max_hops=4).orderBy("node")


def q_label_spreading(spark, sf):
    """Semi-supervised label spreading (operators/graph.py
    label_propagation): the %100 seed docs carry their lang label; two
    rounds of frontier majority votes (fixed-once-labeled, ties to the
    smallest label) classify the docs within 2 hops on the synthetic
    doc graph. The oracle unrolls both rounds in SQL — deterministic
    because a label, once assigned, is final."""
    from spork_spark.operators import label_propagation
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    chain = (docs.filter(F.col("doc_id") % 10 < 4)
                 .select(F.col("doc_id").alias("src"),
                         (F.col("doc_id") + 1).alias("dst")))
    doubling = docs.select(F.col("doc_id").alias("src"),
                           (F.col("doc_id") * 2).alias("dst"))
    edges = chain.unionByName(doubling)
    seeds = (docs.filter((F.col("doc_id") % 100 == 0)
                         & F.col("lang").isNotNull())
                 .select(F.col("doc_id").alias("node"),
                         F.col("lang").alias("label")))
    return label_propagation(edges, seeds, n_iter=2).orderBy("node")


def q_weighted_paths(spark, sf):
    """Bounded Bellman-Ford (operators/graph.py weighted_distances)
    over the doc graph with weight (src+dst)%7+1: min weighted distance
    from the %100 seed set within 4 hops. Delta-frontier relaxation
    with a MIN-merge per round (the weighted sibling of shortest_paths,
    where a later hop can improve an earlier node); oracle = the
    recursive-CTE walk with MIN(dist)."""
    from spork_spark.operators import weighted_distances
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    chain = (docs.filter(F.col("doc_id") % 10 < 4)
                 .select(F.col("doc_id").alias("src"),
                         (F.col("doc_id") + 1).alias("dst")))
    doubling = docs.select(F.col("doc_id").alias("src"),
                           (F.col("doc_id") * 2).alias("dst"))
    edges = (chain.unionByName(doubling)
                  .withColumn("weight",
                              F.pmod(F.col("src") + F.col("dst"),
                                     F.lit(7)) + 1))
    sources = docs.filter(F.col("doc_id") % 100 == 0) \
                  .select(F.col("doc_id").alias("node"))
    return weighted_distances(edges, sources, max_hops=4) \
        .orderBy("node")


def q_dedup_index_roundtrip(spark, sf):
    """The stored-index contract end-to-end: the LSH banding index is
    STOREd to parquet and reLOADed before the incremental candidate
    join — exactly how a daily-refresh pipeline persists near-dup state
    between batches (minhash_banding docstring). Output must equal
    dedup_incremental's (same oracle SQL), proving the index carries
    through a parquet roundtrip with no recompute."""
    from spork_spark.operators import lsh_pairs_incremental, minhash_banding
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx_path = _tmp_path("lsh_index", sf)
    minhash_banding(old, "doc_id", "text", shingle_n=5, num_hashes=64,
                    bands=16, hash_fn="md5") \
        .write.mode("overwrite").parquet(idx_path)
    idx = spark.read.parquet(idx_path)
    return _iso_sort(
        lsh_pairs_incremental(idx, old, new, "doc_id", "text",
                              shingle_n=5, num_hashes=64, bands=16,
                              threshold=0.6, hash_fn="md5"),
        "id_a", "id_b")


def q_dedup_incremental_clusters(spark, sf):
    """The WHOLE incremental near-dedup story, end to end: historical
    labeling (LSH pairs → CC over old docs only) + a new ingest batch →
    lsh_pairs_incremental (batch-cost candidate pairs against the
    stored index) → cc_incremental (fold the new pairs into the old
    labeling WITHOUT re-traversing history). Output must equal the
    full-recompute clusters over the entire corpus — the oracle replays
    full-corpus LSH SQL + a recursive-CTE CC — which is exactly the
    invariant that lets a 100 TB pipeline absorb daily batches at
    delta cost."""
    from spork_spark.operators import (cc_incremental,
                                       connected_components,
                                       lsh_pairs_incremental,
                                       minhash_banding, minhash_lsh_pairs)
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    old_pairs = minhash_lsh_pairs(old, "doc_id", "text", shingle_n=5,
                                  num_hashes=64, bands=16, threshold=0.6,
                                  hash_fn="md5")
    labels = connected_components(
        old_pairs.select(F.col("id_a").alias("src"),
                         F.col("id_b").alias("dst")))
    idx = minhash_banding(old, "doc_id", "text", shingle_n=5,
                          num_hashes=64, bands=16, hash_fn="md5")
    inc = lsh_pairs_incremental(idx, old, new, "doc_id", "text",
                                shingle_n=5, num_hashes=64, bands=16,
                                threshold=0.6, hash_fn="md5")
    return cc_incremental(labels, inc, src="id_a", dst="id_b") \
        .orderBy("node")


def q_dedup_spans(spark, sf):
    """ExactSubstr-style duplicate-span detection (Lee et al. 2021) via
    content-defined anchoring (winnowing family): anchor positions are
    chosen by the text itself (first md5 nibble of the 8-gram at p =
    '0', P=1/16), so two docs sharing a verbatim >=50-char region pick
    the same anchors inside it — no suffix array, no stride phase
    problem. One span-hash shuffle counts distinct docs per span; per
    doc we report sampled spans, duplicated spans, and an exact integer
    keep test (dup share <= 20%). operators/dedup.py duplicate_spans.
    Oracle replays the identical anchor rule and span hashes in SQL."""
    from spork_spark.operators.dedup import duplicate_spans
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return _iso_sort(
        duplicate_spans(docs, "doc_id", "text", span_len=50,
                        anchor_gram=8, threshold_pct=20), "doc_id")


def q_setsim_pairs(spark, sf):
    """EXACT Jaccard >= 0.6 pairs via prefix filtering (operators/
    dedup.py set_similarity_pairs — AllPairs/PPJoin): rare-first global
    token order, per-set prefix exposure, length filter, exact verify
    in integer ppm arithmetic. Completes the spectrum next to
    minhash_lsh_pairs (approximate) and ngram_jaccard_pairs (blocked
    quadratic). The oracle is the algorithm-independent quadratic
    join — exactness means the clever plan must reproduce it verbatim
    (quadratic-oracle path, documented like ngram_jaccard's).
    12-gram shingles keep tokens selective on this low-entropy corpus
    (5-grams have median df ~291 at sf0.1 — prefix buckets blow up;
    12-grams have median df 7)."""
    from spork_spark.operators.dedup import set_similarity_pairs
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return _iso_sort(
        set_similarity_pairs(docs, "doc_id", "text", shingle_n=12,
                             threshold=0.6), "id_a", "id_b")


def q_dedup_simhash(spark, sf):
    """64-bit SimHash signatures, hash_fn='md5' (bits = md5 hex nibbles,
    signature = 16-hex-char string) so every signature bit is reproducible
    in DuckDB — exact oracle. Production default is hash_fn='xxhash64'
    (long signature, same majority-vote semantics)."""
    from spork_spark.operators import simhash
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return simhash(docs, "doc_id", "text", hash_fn="md5").orderBy("doc_id")


def q_ngram_jaccard(spark, sf):
    """Exact 3-gram Jaccard near-dup pairs, blocked by (lang, source) —
    blocking keys bound the quadratic self-join (SCALE.md); the
    sub-quadratic path at corpus scale is minhash LSH."""
    from spork_spark.operators import ngram_jaccard_pairs
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return _iso_sort(
        ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.35,
                            block_col=["lang", "source"]),
        "id_a", "id_b")


def q_quantize_embeddings(spark, sf):
    """Symmetric int8 scalar quantization of the embeddings table (the
    4× storage reduction for 100 TB embedding columns): per-vector scale
    max|v|/127, half-up rounding, clamp to ±127 — all Column HOFs. The
    oracle replays the identical double arithmetic on the same float32
    inputs, so codes and scales hash-match exactly. The driver-facing
    projection serializes q_vec to a canonical CSV string (the driver's
    pandas canonicalizer cannot sort list-typed cells — r8 lesson); the
    operator itself still returns the typed array."""
    from spork_spark.operators import quantize_embeddings
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    # Sort-first (see q_text_signals): the quantize + CSV-serialize
    # kernels run once post-exchange at full parallelism instead of
    # twice in the scan's single task.
    return (quantize_embeddings(emb.orderBy("vec_id"))
            .select("vec_id",
                    F.array_join(F.transform("q_vec",
                                             lambda x: x.cast("string")),
                                 ",").alias("q_vec"),
                    "q_scale"))


def q_similarity_bruteforce(spark, sf):
    """Exact cosine top-5 for the first 3 vectors against the corpus."""
    from spork_spark.operators import brute_force_topk
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    queries_df = emb.filter(F.col("vec_id") < 3)
    return brute_force_topk(emb, queries_df, k=5, score_round=4) \
        .orderBy("query_id", "rank")


def q_similarity_lsh(spark, sf):
    """SRP-LSH approximate top-5. Exact-oracle-checked: the hyperplanes are
    seed-deterministic and embedded in the oracle SQL as literals, and
    dot/norm/rounding orders match bit-for-bit (see _lsh_oracle_sql)."""
    from spork_spark.operators import lsh_topk
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    queries_df = emb.filter(F.col("vec_id") < 3)
    return lsh_topk(emb, queries_df, k=5, dim=64, n_planes=10, bands=4) \
        .orderBy("query_id", "rank")


def q_text_quality(spark, sf):
    """Per-document quality features (token/char-class ratios)."""
    from spork_spark.operators import quality_score
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return quality_score(docs).select(
        "doc_id", "n_tokens", "alpha_ratio", "digit_ratio",
        "stopword_ratio").orderBy("doc_id")


def q_gopher_filter(spark, sf):
    """Gopher quality rules (word count, mean word length, alpha-word
    ratio, stopword floor) as pure Column expressions; keep flag + first
    failing rule per doc. Thresholds tuned to the fixture's word-salad
    documents so both branches are exercised."""
    from spork_spark.operators import gopher_filter
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    # Sort-first: same rows/order (unique key, narrow projection); the
    # ORDER-BY-on-top variant pays the range-bounds sampling pass twice
    # and runs the rule kernel in the scan's single task (see
    # q_text_signals; OPTIMIZATION_r10.md).
    return (gopher_filter(docs.orderBy("doc_id"), min_words=40,
                          max_words=120,
                          min_avg_word_len=3.0, max_avg_word_len=10.0,
                          min_alpha_word_ratio=0.8, min_stopwords=1)
            .select("doc_id", "keep", "drop_reason"))


def q_resample_mixture(spark, sf):
    """Deterministic mixture resampling (training-data mixing weights):
    'en' docs weighted 2.75 (two full copies + a stable md5-bucket 75%
    getting a third), everything else 1.25. Rerunnable, no rand();
    map-side explode. Oracle replays the bucket arithmetic with
    generate-range fan-out."""
    from spork_spark.operators import resample_mixture
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (resample_mixture(docs, "lang", {"en": 2.75},
                             key_col="doc_id", default_weight=1.25)
            .select("doc_id", "lang", "copy_idx")
            .orderBy("doc_id", "copy_idx"))


def q_scrub_pii(spark, sf):
    """PII scrubbing (email/IPv4/phone/SSN-shaped → typed placeholders)
    with a per-doc replacement count for audit sampling. PII is injected
    deterministically into the fixture text; the oracle replays the same
    regex chain in the same order (RE2 and Java agree on these
    patterns)."""
    from spork_spark.operators import scrub_pii
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    # Sort-first (see q_text_signals): the regex-chain kernel runs once
    # post-exchange at full parallelism instead of twice in the scan's
    # single task (the PII injection below the sort is a cheap concat).
    built = docs.orderBy("doc_id").select(
        "doc_id",
        F.concat(F.col("text"),
                 F.lit(" contact u"), F.col("doc_id"), F.lit("@ex.org"),
                 F.lit(" from 10.1.2.3"),
                 F.when(F.col("doc_id") % 5 == 0,
                        F.lit(" id 123-45-6789")).otherwise(F.lit("")))
         .alias("text"))
    return scrub_pii(built).select("doc_id", "text", "pii_count")


def q_dedup_lines(spark, sf):
    """Corpus-level repeated-line removal (CCNet/RefinedWeb boilerplate
    stage): synthetic multi-line docs — a banner line prepended to every
    doc (occurs 500×, removed), a footer on every 10th (occurs 50×,
    removed), the original text as the middle line (removed only for the
    fixture's exact-duplicate texts). Oracle derives the expected
    remainder from the per-text duplicate count."""
    from spork_spark.operators import dedup_lines
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    built = docs.select(
        "doc_id",
        F.concat(F.lit("BOILER\n"), F.col("text"),
                 F.when(F.col("doc_id") % 10 == 0, F.lit("\nFOOTER"))
                  .otherwise(F.lit(""))).alias("text"))
    return (dedup_lines(built, "doc_id", "text", max_occurrences=1)
            .select("doc_id", "text").orderBy("doc_id"))


def q_lang_id(spark, sf):
    """Stopword-vote language ID; oracle replicates the argmax +
    lexicographic tiebreak with DuckDB struct sorting."""
    from spork_spark.operators import detect_language
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    # Sort-first: same rows/order (unique key, narrow projection) — see
    # q_text_signals for the sampling/parallelism rationale.
    return detect_language(docs.orderBy("doc_id")) \
        .select("doc_id", "lang", "lang_pred")


def q_fingerprint(spark, sf):
    """Content fingerprints — md5 digests match any engine."""
    from spork_spark.operators import fingerprint
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return fingerprint(docs, "doc_id").select("doc_id", "content_fp") \
                                      .orderBy("doc_id")


def q_tfidf(spark, sf):
    from spork_spark.operators import tf_idf
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (tf_idf(docs, "doc_id", min_df=5)
            .orderBy("doc_id", "token").limit(1000))


def q_bm25(spark, sf):
    """Okapi BM25 retrieval scores (operators/text.py bm25_scores) for a
    fixed query over the documents table. dl/avgdl enters as the exact
    integer ratio dl*N/total_dl (no aggregation-order ulps); scores round
    to 6 decimals on both engines."""
    from spork_spark.operators import bm25_scores
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (bm25_scores(docs, ["data", "model", "training"])
            .orderBy("doc_id"))


def q_sketch_distinct(spark, sf):
    """Sketch surface (HLL approx_count_distinct) with an EXACT oracle:
    output the exact per-type distinct-user count plus a boolean that the
    sketch landed within 5% relative error. The sketch runs at rsd=0.01,
    putting the 5% bound at ~5 sigma — and HLL is deterministic for a
    given dataset, so the boolean is stable (verified TRUE at sf0.001
    through sf1); the oracle asserts the exact count and literal TRUE."""
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    from pyspark.sql import functions as F
    # Dedup the (event_type, user_id) PAIRS first, then sketch. Mixing
    # countDistinct with the sketch in one agg makes Spark key the first
    # aggregate by the PAIR and thread the partial HLL through it — every
    # pre-shuffle row carries the rsd=0.01 sketch's 1639 register words
    # (~13 KB/row through the exchange; plan dump plans/r10). Deduping
    # first ships two narrow columns with map-side partial dedup, and the
    # results are provably unchanged: n_exact = count of distinct pairs
    # per type (countDistinct ignores nulls, hence the filter), and HLL
    # over the support set is register-identical to HLL over the multiset
    # (insertion is a register max — duplicate-idempotent), so n_approx
    # and the boolean are bit-equal. (Earlier note, still true: _spread
    # HURTS here — 1.8 -> 2.6 s — more partial sketches is more merge.)
    pairs = (ev.where(F.col("user_id").isNotNull())
               .select("event_type", "user_id").distinct())
    g = (pairs.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n_exact"),
                   F.approx_count_distinct("user_id", rsd=0.01)
                    .alias("n_approx")))
    return (g.select("event_type", "n_exact",
                     (F.abs(F.col("n_approx") - F.col("n_exact"))
                      <= 0.05 * F.col("n_exact") + 1).alias("within_5pct"))
             .orderBy("event_type"))


def q_trending(spark, sf):
    """Trending items — top-2 event types per day by event count (the
    time-bucket × top-k-per-group composition every analytics pipeline
    runs). The per-day limit runs as WindowGroupLimit BELOW the rank
    shuffle (the per_source_cap plan shape); deterministic event_type
    tiebreak."""
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    day = (ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
             .agg(F.count(F.lit(1)).alias("cnt")))
    w = Window.partitionBy("day").orderBy(F.desc("cnt"), F.asc("event_type"))
    return (day.withColumn("rk", F.row_number().over(w).cast("long"))
               .filter(F.col("rk") <= 2)
               .orderBy("day", "rk"))


def q_sketch_quantiles(spark, sf):
    """Quantile-sketch surface (percentile_approx, the GK/KLL-family
    sketch) with an EXACT oracle, same pattern as sketch_distinct: exact
    interpolated quartiles of value per event_type, plus booleans that
    the sketch quantiles land within 1% of the exact ones (accuracy
    10000 ⇒ rank error ≤ 0.01%; deterministic per dataset, verified at
    sf0.001–sf1). Oracle: exact quartiles + literal TRUEs."""
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    from pyspark.sql import functions as F
    # ONE exact buffer and ONE sketch, queried at all three quantiles
    # (array percentages), instead of three independent buffers + three
    # independent sketches: exact percentile sorts its value buffer once
    # and interpolates three points from the same sorted run (bit-equal
    # to the scalar calls), and a KLL/GK sketch over identical input at
    # identical accuracy has identical state, so its three answers equal
    # the three scalar sketches'. Halves the agg's value buffering and
    # drops two of the three finalize sorts (guide §1.2 per-task work).
    g = (ev.groupBy("event_type")
           .agg(F.expr("percentile(value, array(0.25, 0.5, 0.75))")
                 .alias("__ex"),
                F.percentile_approx("value", [0.25, 0.5, 0.75], 10000)
                 .alias("__ap")))
    e = [F.col("__ex")[i] for i in range(3)]
    a = [F.col("__ap")[i] for i in range(3)]
    tol = [F.greatest(F.abs(x) * 0.01, F.lit(0.5)) for x in e]
    return (g.select("event_type",
                     *[F.round(x, 6).alias(f"q{i}")
                       for i, x in enumerate(e, 1)],
                     *[(F.abs(y - x) <= t).alias(f"ok{i}")
                       for i, (y, x, t) in enumerate(zip(a, e, tol), 1)])
             .orderBy("event_type"))


def q_time_rollup(spark, sf):
    """Hypertable-style multi-grain time-bucket rollup (operators/
    rollup.py): hour + day aggregates from ONE raw shuffle — the day grain
    re-aggregates the hourly result (TimescaleDB continuous-aggregate
    cascade), with the sum carried in decimal(38,2) so the cascaded and
    direct paths are bit-identical. test_rollup.py pins the single-scan
    plan shape."""
    from spork_spark.operators import time_rollup
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return (time_rollup(ev, ts_col="ts", dims=("event_type",),
                        value_col="value", grains=("hour", "day"))
            # driver-facing projection: decimal(38,2) -> double (exact
            # here: sums of 2-decimal values, |N| << 2^53). The two
            # engines' pandas pipelines normalize decimals differently
            # (Decimal('179.60') vs float 179.6) — the same
            # type-divergence class as the r3 HUGEINT lesson.
            .withColumn("sum_value", F.col("sum_value").cast("double"))
            .orderBy("grain", "bucket", "event_type"))


def q_inverted_index(spark, sf):
    """Postings-list construction (operators/text.py inverted_index):
    (token, doc_id, tf, corpus doc_freq), min_df-pruned. Map-side-combined
    tf shuffle, then a token-keyed exchange of the aggregated tf rows."""
    from spork_spark.operators import inverted_index
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (inverted_index(docs, min_df=3)
            .orderBy("token", "doc_id").limit(2000))


# ---------------------------------------------------------------------------
# event-time windows in batch (SURVEY.md §2.8 extension)
# ---------------------------------------------------------------------------

def q_events_tumbling(spark, sf):
    """Tumbling 6-hour windows over events (epoch-aligned buckets)."""
    eng = _eng(spark)
    ev = _t(eng, sf, "events")
    bucketed = ev.foreach(
        col("event_type").alias("event_type"),
        ((fn("TOUNIXTIME", col("ts")) / lit(21600)) * lit(21600))
        .alias("bucket_start"),
        col("value").alias("value"))
    g = bucketed.group_by(col("event_type"), col("bucket_start"))
    return (g.foreach(col("group").get("event_type").alias("event_type"),
                      col("group").get("bucket_start").alias("bucket_start"),
                      fn("COUNT_STAR").alias("cnt"),
                      _r2(fn("SUM", col(bucketed.alias).get("value"))).alias("total"))
             .order_by(col("event_type"), col("bucket_start"))).df()


def q_events_session_window(spark, sf):
    """Session windows (30-min inactivity gap) per user, in batch — the
    Structured-Streaming session_window operator applied to a bounded
    input. Oracle: classic islands-and-gaps SQL."""
    from pyspark.sql import functions as SF
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    sess = (ev.groupBy(
                SF.session_window(SF.col("ts"), "30 minutes").alias("w"),
                SF.col("user_id"))
              .agg(SF.count("*").alias("n_events"),
                   SF.round(SF.sum("value"), 2).alias("total")))
    return (sess.select(
                "user_id",
                SF.unix_timestamp(SF.col("w.start").cast("timestamp"))
                  .alias("session_start"),
                "n_events", "total")
                .orderBy("user_id", "session_start"))


def q_events_interval_join(spark, sf):
    """Stream-stream interval join semantics in batch (the enrichment
    pattern: purchases matched to same-user clicks within the preceding
    5 minutes). The identical interval_join definition runs on two
    watermarked readStreams — the time bound is what lets streaming
    expire join state; here the bounded input makes it oracle-checkable
    as a SQL range join."""
    from spork_spark.streaming import interval_join
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("user_id", F.col("ts").alias("p_ts"))
    clicks = ev.filter(F.col("event_type") == "click") \
               .select(F.col("user_id").alias("c_user"),
                       F.col("ts").alias("c_ts"))
    j = interval_join(purchases, clicks.withColumnRenamed("c_user",
                                                          "user_id"),
                      "user_id", "p_ts", "c_ts",
                      lower="interval 5 minutes",
                      upper="interval 0 seconds")
    return (j.groupBy(F.col("l.user_id").alias("user_id"))
             .agg(F.count("*").alias("n_pairs"))
             .orderBy("user_id"))


# ---------------------------------------------------------------------------
# remaining relational surface: TOP, RANK BY, SAMPLE, ASSERT, STREAM
# ---------------------------------------------------------------------------

def q_top_n(spark, sf):
    """TOP(n, fieldIdx, bag) builtin (pig TOP.java): per customer, sum of
    the top-3 order prices. The sum over the top-n set is tie-invariant,
    so the oracle's row_number formulation matches even when the boundary
    value ties."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    g = orders.group_by(col("o_custkey"))
    top3 = fn("TOP", lit(3), lit(3), col("orders"))   # field 3 = o_totalprice
    return (g.foreach(col("group").alias("custkey"),
                      _r2(fn("SUM", top3.get("o_totalprice")))
                      .alias("top3_total"))
             .order_by(col("custkey"))).df()


def q_rank_by(spark, sf):
    """RANK rel BY unique key — the scalable two-pass distinct-key
    prefix-sum path (POCounter/PORank design), no 1-partition window."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    return (orders.rank(col("o_orderkey"))
                  .foreach(col("rank").alias("rank"),
                           col("o_orderkey").alias("o_orderkey"))
                  .order_by(col("o_orderkey"))).df()


def q_rank_dense(spark, sf):
    """RANK rel BY low-cardinality key DESC DENSE — ties share a dense
    rank; deterministic for any tie-breaking, hence oracle-safe."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    return (orders.rank((col("o_orderstatus"), False), dense=True)
                  .foreach(col("rank").alias("rank"),
                           col("o_orderkey").alias("o_orderkey"),
                           col("o_orderstatus").alias("o_orderstatus"))
                  .order_by(col("o_orderkey"))).df()


def q_sample(spark, sf):
    """SAMPLE rel p — Bernoulli sample, seeded for run-to-run stability
    (engine-specific RNG → rows-only check, as RANDOM() in the reference)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    return (orders.sample(0.1, seed=7)
                  .foreach(col("o_orderkey").alias("o_orderkey"))
                  .order_by(col("o_orderkey"))).df()


def q_assert_op(spark, sf):
    """ASSERT rel BY cond — passes for all rows, relation flows through
    unchanged (violation raises; see tests for the failing path)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    return (orders.assert_(col("o_totalprice") > lit(0.0),
                           "totalprice must be positive")
                  .foreach(col("o_orderkey").alias("o_orderkey"),
                           _r2(col("o_totalprice")).alias("o_totalprice"))
                  .order_by(col("o_orderkey"))).df()


def q_stream_through(spark, sf):
    """STREAM rel THROUGH 'tr a-z A-Z' — tab-delimited pipe through an
    external executable (POStream/PigStreaming), schema re-applied on the
    way back."""
    eng = _eng(spark)
    nation = _t(eng, sf, "nation")
    proj = nation.foreach(col("n_nationkey").alias("n_nationkey"),
                          col("n_name").alias("n_name"))
    return (proj.stream_through("tr a-z A-Z",
                                schema="n_nationkey BIGINT, n_name STRING")
                .order_by(col("n_nationkey"))).df()


# ---------------------------------------------------------------------------
# training-data pipeline extensions, part 2
# ---------------------------------------------------------------------------

def q_token_count(spark, sf):
    """Token counting: whitespace tokens + BPE-ish sub-word estimate
    (word pieces of ≤4 chars + punctuation marks), all native regex/HOF
    expressions."""
    from spork_spark.operators import bpe_ish_token_count, token_count
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return docs.select("doc_id",
                       token_count("text").alias("n_tokens"),
                       bpe_ish_token_count("text").alias("n_bpe")) \
               .orderBy("doc_id")


def q_dedup_embedding(spark, sf):
    """Embedding-cosine near-dup pairs, exact all-pairs mode (the
    oracle-checkable path; the SRP-LSH mode is the 100 TB path, verified
    against this one in tests)."""
    from spork_spark.operators import embedding_dedup_pairs
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    return _iso_sort(
        embedding_dedup_pairs(emb, threshold=0.45, method="exact"),
        "id_a", "id_b")


def q_similarity_ivf(spark, sf):
    """IVF approximate top-5: coarse-quantize the corpus into cells, probe
    the 3 nearest cells per query. Exact-oracle-checked: the quantizer is
    training-free/deterministic and fold orders match (_ivf_oracle_sql);
    nprobe=n_centroids equivalence to brute force is pinned in tests."""
    from spork_spark.operators import ivf_topk
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    queries_df = emb.filter(F.col("vec_id") < 3)
    return ivf_topk(emb, queries_df, k=5, n_centroids=8, nprobe=3,
                    score_round=4).orderBy("query_id", "rank")


def q_similarity_ivf_trained(spark, sf):
    """IVF with a k-means-TRAINED coarse quantizer, graded by exact
    recall@5 against the brute-force path (round-4 verdict item 2).
    Output: per-query (n_hits, recall, meets_bound) with the fixed
    bound recall >= 0.6. The oracle replays the ENTIRE pipeline in SQL
    — Lloyd training unrolled in integer arithmetic (the kmeans oracle
    recurrence), integer cell ranking, nprobe=2 probe, double cosine
    rank — plus the brute-force top-5, so recall is exact-checked, not
    asserted. Plan: broadcast codebook + cell equi-join (ivf_topk
    shape), training = kmeans_train's bounded k-row collects."""
    from spork_spark.operators import brute_force_topk, ivf_topk_trained
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    qd = emb.filter(F.col("vec_id") < 3)
    ivf = ivf_topk_trained(emb, qd, k=5, n_centroids=4, nprobe=2,
                           n_iter=2, score_round=4)
    br = brute_force_topk(emb, qd, k=5, score_round=4)
    hits = (ivf.join(br.select("query_id", "vec_id"),
                     on=["query_id", "vec_id"])
               .groupBy("query_id").agg(F.count(F.lit(1)).alias("__n")))
    n = F.coalesce(F.col("__n"), F.lit(0))
    return (qd.select(F.col("vec_id").alias("query_id"))
              .join(hits, on="query_id", how="left")
              .select(F.col("query_id"),
                      n.cast("int").alias("n_hits"),
                      F.round(n / F.lit(5.0), 4).alias("recall"),
                      (n >= F.lit(3)).alias("meets_bound"))
              .orderBy("query_id"))


def _doc_payloads(docs):
    """Synthesize binary payloads from documents: every 3rd doc gets a PNG
    magic header; the rest are raw UTF-8 bytes."""
    body = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.unhex(F.lit("89504E47")), body))
         .otherwise(body).alias("payload"))


def q_multimodal_meta(spark, sf):
    """Multimodal metadata: magic-byte format sniff + byte length as a
    typed struct next to the blob — pure JVM expressions, oracle-checked."""
    from spork_spark.operators import attach_binary_meta
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    out = attach_binary_meta(_doc_payloads(docs), "payload")
    return out.select("doc_id",
                      F.col("meta.format").alias("format"),
                      F.col("meta.n_bytes").alias("n_bytes")) \
              .orderBy("doc_id")


def q_multimodal_decode(spark, sf):
    """Arrow-batched mapInPandas decode of binary payloads → (id, width,
    height, format, n_bytes), EXACT-oracle: payloads carry genuine
    headers for all four header-parsed container formats, synthesized in
    pure SQL expressions by doc_id % 4 — PNG (IHDR big-endian dims),
    GIF (logical screen descriptor little-endian), BMP
    (BITMAPINFOHEADER little-endian), PNM (ASCII header). The engine's
    real header parsers (operators/multimodal.py parse_image_dims) read
    the dims back; the oracle recomputes width/height/format/n_bytes
    from the same doc arithmetic, so a hash match proves each branch of
    the multi-format decoder. Dims stay <256 so little-endian low bytes
    suffice (hi bytes are 00)."""
    from spork_spark.operators import decode_images
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    # w in 1..31, h in 1..7 — small, positive, format-independent
    payloads = docs.select(
        F.col("doc_id").alias("item_id"),
        F.expr("""
          CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN concat(unhex('89504E470D0A1A0A'),  -- PNG magic
                               unhex('0000000D49484452'),  -- len + 'IHDR'
                               unhex(lpad(hex(length(text) % 31 + 1), 8, '0')),
                               unhex(lpad(hex(doc_id % 7 + 1), 8, '0')))
            WHEN 1 THEN concat(unhex('474946383961'),      -- 'GIF89a', LE dims
                               unhex(lpad(hex(length(text) % 31 + 1), 2, '0')),
                               unhex('00'),
                               unhex(lpad(hex(doc_id % 7 + 1), 2, '0')),
                               unhex('00'))
            WHEN 2 THEN concat(unhex('424D'),              -- 'BM'; dims LE
                               unhex(repeat('00', 16)),    --   at offset 18
                               unhex(lpad(hex(length(text) % 31 + 1), 2, '0')),
                               unhex('000000'),
                               unhex(lpad(hex(doc_id % 7 + 1), 2, '0')),
                               unhex('000000'))
            ELSE encode(concat('P5\n', length(text) % 31 + 1, ' ',
                               doc_id % 7 + 1, '\n255\n'), 'UTF-8')
          END
        """).alias("payload"))
    return decode_images(payloads, "payload", "item_id").orderBy("item_id")


def q_multimodal_decode_pnm(spark, sf):
    """REAL image decode, exact-oracle: build genuine binary PGM (P5)
    images in pure SQL expressions (header + md5-derived ASCII raster
    sized (len(text)%31+1) × (doc_id%7+1)), then run the engine's actual
    PNM codec — header parse via decode_images, full numpy raster decode
    via decode_pixel_stats — through Arrow-batched mapInPandas. The oracle
    recomputes width/height/n_bytes/n_pixels from the same arithmetic, so
    a hash match proves the decoder read back exactly what SQL wrote."""
    from spork_spark.operators import decode_images, decode_pixel_stats
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    need = "CAST((length(text) % 31 + 1) * (doc_id % 7 + 1) AS INT)"
    payloads = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.expr(
            f"concat('P5\\n', length(text) % 31 + 1, ' ', doc_id % 7 + 1, "
            f"'\\n255\\n', substring(rpad(md5(text), {need}, md5(text)), "
            f"1, {need}))"), "UTF-8").alias("payload"))
    dims = decode_images(payloads, "payload", "item_id")
    px = decode_pixel_stats(payloads, "payload", "item_id") \
        .select("item_id", "n_pixels")
    return (dims.join(px, on="item_id")
                .select("item_id", "width", "height", "format",
                        "n_bytes", "n_pixels")
                .orderBy("item_id"))


def q_multimodal_phash(spark, sf):
    """Perceptual average-hash, exact-oracle: the SQL-built PGM fixtures
    (multimodal_decode_pnm arithmetic) through the REAL decode →
    integer-grayscale → 8×8 nearest-neighbor sample → mean-threshold →
    64-bit hash pipeline (operators/multimodal.py ahash_images). Every
    step is integer arithmetic, so the oracle recomputes the identical
    hash halves from md5-raster indexing in pure SQL — the image-side
    near-dedup signature, proven bit-exact."""
    from spork_spark.operators import ahash_images
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    need = "CAST((length(text) % 31 + 1) * (doc_id % 7 + 1) AS INT)"
    payloads = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.expr(
            f"concat('P5\\n', length(text) % 31 + 1, ' ', doc_id % 7 + 1, "
            f"'\\n255\\n', substring(rpad(md5(text), {need}, md5(text)), "
            f"1, {need}))"), "UTF-8").alias("payload"))
    return (ahash_images(payloads)
            .select("item_id", "width", "height", "hash_hi", "hash_lo")
            .orderBy("item_id"))


def q_multimodal_near_dedup(spark, sf):
    """END-TO-END image near-dedup (round-4 verdict item 3): the
    SQL-built PGM fixtures through REAL decode -> aHash (bit-exact
    integer pipeline) -> banded Hamming<=3 pairs (pigeonhole-exact, not
    all-pairs) -> connected components -> keep the min-id survivor per
    cluster. The image twin of dedup_near_full: pair-level dedup alone
    is wrong for clusters (A~B, B~C must drop both B and C). Oracle
    replays the hash from md5-raster arithmetic, takes ALL-pairs
    Hamming<=3 (algorithm-independent: banded recall must equal it),
    and closes components with a recursive CTE. Returns surviving
    item_ids."""
    from spork_spark.operators.graph import connected_components
    from spork_spark.operators.multimodal import ahash_images, ahash_pairs
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    need = "CAST((length(text) % 31 + 1) * (doc_id % 7 + 1) AS INT)"
    payloads = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.expr(
            f"concat('P5\\n', length(text) % 31 + 1, ' ', doc_id % 7 + 1, "
            f"'\\n255\\n', substring(rpad(md5(text), {need}, md5(text)), "
            f"1, {need}))"), "UTF-8").alias("payload"))
    pairs = ahash_pairs(ahash_images(payloads), max_hamming=3)
    comp = connected_components(pairs, "id_a", "id_b")
    losers = comp.filter(F.col("node") != F.col("comp")) \
                 .select(F.col("node").alias("item_id"))
    return (payloads.select("item_id")
            .join(losers, on="item_id", how="left_anti")
            .orderBy("item_id"))


def q_multimodal_resize(spark, sf):
    """REAL image resize, exact-oracle: SQL-built PGM payloads (the
    multimodal_decode_pnm fixtures) → full numpy decode → nearest-
    neighbor ÷2 downsample → re-encode as binary PNM → re-decode through
    the header parser AND the raster decoder. The oracle recomputes the
    output dims (ceil(w/2) × ceil(h/2)) and the EXACT sampled-pixel sum
    from the md5-raster arithmetic — a hash match proves decode, stride
    sampling, re-encode, and re-decode all round-trip."""
    from spork_spark.operators import (decode_images, decode_pixel_stats,
                                       resize_images)
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    need = "CAST((length(text) % 31 + 1) * (doc_id % 7 + 1) AS INT)"
    payloads = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.expr(
            f"concat('P5\\n', length(text) % 31 + 1, ' ', doc_id % 7 + 1, "
            f"'\\n255\\n', substring(rpad(md5(text), {need}, md5(text)), "
            f"1, {need}))"), "UTF-8").alias("payload"))
    small = resize_images(payloads, "payload", "item_id", factor=2) \
        .select("item_id", "payload")
    dims = decode_images(small, "payload", "item_id") \
        .select("item_id", "width", "height")
    px = decode_pixel_stats(small, "payload", "item_id") \
        .select("item_id", "n_pixels",
                F.floor(F.col("mean_px") * F.col("n_pixels") + F.lit(0.5))
                 .cast("long").alias("px_sum"))
    return dims.join(px, on="item_id").orderBy("item_id")


def q_multimodal_audio(spark, sf):
    """REAL audio decode, exact-oracle: synthesize valid 16-bit PCM WAV
    files (stdlib wave writer) with per-doc sample rate and frame count,
    decode them with the engine's WAV codec (stdlib wave reader + numpy
    RMS) via mapInPandas. Writer and reader share no code; the oracle
    recomputes rate/frames/duration from doc_id arithmetic."""
    import pandas as pd
    from pyspark.sql import types as T

    from spork_spark.operators import decode_audio
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df().select("doc_id")

    def build(batches):
        import io
        import wave
        for pdf in batches:
            payloads = []
            for i in pdf["doc_id"]:
                rate = 8000 + int(i) % 3 * 4000
                frames = (int(i) % 5 + 1) * 100
                buf = io.BytesIO()
                with wave.open(buf, "wb") as f:
                    f.setnchannels(1)
                    f.setsampwidth(2)
                    f.setframerate(rate)
                    f.writeframes(b"\x00\x00" * frames)
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"item_id": pdf["doc_id"].astype("int64"),
                                "payload": payloads})
    wavs = docs.mapInPandas(
        build, T.StructType([T.StructField("item_id", T.LongType()),
                             T.StructField("payload", T.BinaryType())]))
    return decode_audio(wavs, "payload", "item_id").orderBy("item_id")


def q_bloom_join(spark, sf):
    """BuildBloom/Bloom idiom: bloom-prune lineitem against the suppliers
    of one nation, then exact semi join — result equals a plain semi join
    (the oracle), the bloom only cuts the shuffled volume."""
    from spork_spark.operators import bloom_pruned_semi_join
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem").df()
    supp = _t(eng, sf, "supplier").df().filter(F.col("s_nationkey") == 3)
    out = bloom_pruned_semi_join(li, supp, "l_suppkey", "s_suppkey")
    return (out.groupBy("l_suppkey")
               .agg(F.count("*").alias("n_items"))
               .orderBy("l_suppkey"))


def q_map_funcs(spark, sf):
    """Map type surface: TOMAP construction, m#'key' lookup, SIZE(map)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    m = fn("TOMAP", lit("status"), col("o_orderstatus"),
           lit("prio"), col("o_orderpriority"))
    return (orders.foreach(col("o_orderkey").alias("o_orderkey"),
                           m.lookup("status").alias("status"),
                           m.lookup("prio").alias("prio"),
                           fn("SIZE", m).alias("map_size"))
                  .order_by(col("o_orderkey"))).df()


def q_diff_bags(spark, sf):
    """Bag DIFF/SUBTRACT builtins: per customer, orderkey bags for two
    predicates; counts survive any bag ordering (orderkeys are unique, so
    the set-algebra oracle is exact)."""
    from spork_spark import lam
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    g = orders.group_by(col("o_custkey"))
    big = fn("FILTER_BAG", col("orders"),
             lam(lambda t: t.get("o_totalprice") > 100000.0))
    fstat = fn("FILTER_BAG", col("orders"),
               lam(lambda t: t.get("o_orderstatus") == lit("F")))
    big_keys = big.get("o_orderkey")
    f_keys = fstat.get("o_orderkey")
    return (g.foreach(col("group").alias("custkey"),
                      fn("SIZE", fn("SUBTRACT", big_keys, f_keys))
                      .alias("n_big_not_f"),
                      fn("SIZE", fn("DIFF", big_keys, f_keys))
                      .alias("n_sym_diff"))
             .order_by(col("custkey"))).df()


def q_udf_python(spark, sf):
    """REGISTER'd Python UDF (EvalFunc surface, SURVEY.md §2.10): scalar
    row-at-a-time function over nation names — deterministic, so the
    oracle is plain SQL."""
    eng = _eng(spark)
    eng.register_udf("REV_UP", lambda s: s[::-1].upper() if s else None,
                     returns="string")
    nation = eng.load(f"{sf}/nation.parquet", alias="nation")
    return (nation.foreach(col("n_nationkey").alias("n_nationkey"),
                           fn("REV_UP", col("n_name")).alias("rev_name"))
                  .order_by(col("n_nationkey"))).df()


def q_events_sliding(spark, sf):
    """Sliding windows in batch (6-hour window, 3-hour slide): every event
    lands in 2 windows — Spark's window() duplication, oracled as the
    union of two shifted tumbling bucketings."""
    ev = _eng(spark)
    ev = _t(ev, sf, "events").df()
    win = (ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"),
                      F.col("event_type"))
             .agg(F.count("*").alias("cnt")))
    return (win.select(F.col("event_type"),
                       F.unix_timestamp(F.col("w.start").cast("timestamp"))
                        .alias("win_start"),
                       "cnt")
               .orderBy("event_type", "win_start"))


def q_join_merge(spark, sf):
    """JOIN USING 'merge' → sort-merge join hint (POMergeJoin; semantics
    identical to inner join, SURVEY.md §2.1 #13)."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    orders = _t(eng, sf, "orders")
    j = li.join([col("l_orderkey")], orders, [col("o_orderkey")],
                strategy="merge")
    g = j.group_by(col("o_orderpriority"))
    return (g.foreach(col("group").alias("o_orderpriority"),
                      fn("SUM", col(j.alias).get("l_quantity")).alias("sum_qty"),
                      fn("COUNT_STAR").alias("cnt"))
             .order_by(col("o_orderpriority"))).df()


def q_join_merge_sparse(spark, sf):
    """JOIN USING 'merge-sparse' (POMergeCogroup sparse path): the sorted
    right side is read via its sparse index so only blocks whose keys
    occur on the few-keyed left are touched. Spark-first compilation:
    broadcast-semi-prune the right input on the left's distinct keys
    below the SMJ's exchange+sort, then sort-merge the pruned remainder
    (compiler/plan.py `merge_sparse`). Semantics identical to inner
    join — which is what the oracle checks."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    part = _t(eng, sf, "part")
    sparse = part.filter(col("p_retailprice") > lit(995.0))
    j = sparse.join([col("p_partkey")], li, [col("l_partkey")],
                    strategy="merge_sparse")
    g = j.group_by(col("p_partkey"))
    return (g.foreach(col("group").alias("p_partkey"),
                      fn("SUM", col(j.alias).get("l_quantity"))
                      .alias("sum_qty"),
                      fn("COUNT_STAR").alias("cnt"))
             .order_by(col("p_partkey"))).df()


def q_join_skewed(spark, sf):
    """JOIN USING 'skewed' → AQE skew-join handles hot keys at runtime
    (replaces SkewedPartitioner/PoissonSampleLoader, SURVEY.md §2.1 #12);
    semantics identical to inner join."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    orders = _t(eng, sf, "orders")
    j = li.join([col("l_orderkey")], orders, [col("o_orderkey")],
                strategy="skewed")
    g = j.group_by(col("o_orderstatus"))
    return (g.foreach(col("group").alias("o_orderstatus"),
                      fn("COUNT_STAR").alias("cnt"))
             .order_by(col("o_orderstatus"))).df()


def q_pluck(spark, sf):
    """PluckTuple(prefix): prefix-based column projection
    (pig:src/org/apache/pig/builtin/PluckTuple.java)."""
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    return cust.pluck("c_n").order_by(col("c_name")).df()


def q_pigstorage_roundtrip(spark, sf):
    """PigStorage (tab-delimited text) STORE + LOAD round trip: write the
    nation table as TSV, read it back with an AS-schema, return it — the
    oracle reads the same rows straight from parquet, so the equality
    check proves the text codec preserves values (SURVEY.md §2.7)."""
    import os
    import tempfile

    from spork_spark.sources import read, write
    eng = _eng(spark)
    nation = _t(eng, sf, "nation").df().select(
        "n_nationkey", "n_name", "n_regionkey")
    path = _tmp_path("spork_pigstorage", sf)
    write(nation, path, fmt="pigstorage")
    out = read(spark, path, fmt="pigstorage",
               schema="n_nationkey INT, n_name STRING, n_regionkey INT")
    return out.orderBy("n_nationkey")


def q_corpus_pipeline(spark, sf):
    """End-to-end training-data pipeline over `documents`: length filter →
    deterministic exact dedup (keep min doc_id per text) → per-(lang,
    source) corpus stats with whitespace token counts. Every stage is a
    native DataFrame op (filter pushdown → hash-agg dedup → fused
    aggregation), the composition a 100 TB curation job runs."""
    from spork_spark.operators import exact_dedup
    from spork_spark.operators.text import token_count
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    filtered = docs.filter(F.length("text") >= 50)
    deduped = exact_dedup(filtered, ["text"], keep="min", tiebreak="doc_id")
    return (deduped.groupBy("lang", "source")
                   .agg(F.count("*").alias("n_docs"),
                        F.sum(token_count("text")).alias("total_tokens"),
                        F.sum(F.length("text")).alias("total_chars"))
                   .orderBy("lang", "source"))


def q_multimodal_frames(spark, sf):
    """Video-style frame sampling (1→N mapInPandas fan-out): per-item frame
    counts from the deterministic fake kernel — the oracle recomputes
    ceil(max(bytes//4096,1)/every_n) from the payload length."""
    from spork_spark.operators import sample_frames
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    frames = sample_frames(_doc_payloads(docs), "payload", "doc_id",
                           every_n=2)
    return (frames.groupBy(F.col("item_id"))
                  .agg(F.count("*").alias("n_frames"))
                  .orderBy("item_id"))


def q_multimodal_features(spark, sf):
    """Multimodal feature extraction, EXACT-oracle: payloads are built
    64-byte-periodic (md5(text)||md5(doc_id), repeated doc_id%3+1 times),
    so the kernel's window-mean over dim=64 reproduces the first period's
    byte values exactly (identical rows → exact float32 mean). The query
    runs the REAL extract_features kernel (mapInPandas, Arrow-batched),
    then inverts the /255 normalization (round(x*255) — float32 error
    ~1e-7 relative, far below the 0.5 rounding margin) back to exact
    integers the oracle recomputes with ascii() arithmetic. A hash match
    proves the kernel's windowing, normalization, and batch plumbing."""
    from spork_spark.operators import extract_features
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    payloads = docs.select(
        F.col("doc_id").alias("item_id"),
        F.expr("encode(repeat(md5(text) || md5(CAST(doc_id AS STRING)), "
               "CAST(doc_id % 3 + 1 AS INT)), 'UTF-8')").alias("payload"))
    feats = extract_features(payloads, "payload", "item_id", dim=64)
    return feats.select(
        "item_id",
        F.size("embedding").alias("n_dims"),
        F.expr("array_join(transform(embedding, "
               "x -> CAST(CAST(round(x * 255) AS INT) AS STRING)), ',')")
         .alias("emb_bytes")).orderBy("item_id")


def _r6(e):
    """Six-decimal stabilization (same floor arithmetic as _r2) for
    correlation-scale values where 2 decimals would erase the signal."""
    return fn("FLOOR", e * lit(1000000.0) + lit(0.5)) / lit(1000000.0)


def q_regex_funcs(spark, sf):
    """REGEX_EXTRACT / REGEX_EXTRACT_ALL (full-match anchored, null on
    no-match — PORegexp matcher.matches semantics) and STRSPLIT. The
    REGEX_EXTRACT_ALL tuple and STRSPLIT tuple are still constructed by
    the engine; the driver-facing projection dereferences the struct
    fields and CSV-joins the split array to scalar columns (the driver's
    canonicalizer cannot hash struct/list cells — r8 lesson)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    pr = col("o_orderpriority")
    ag = fn("REGEX_EXTRACT_ALL", pr, "([0-9])-(.*)")
    out = (orders.foreach(
        col("o_orderkey").alias("o_orderkey"),
        fn("REGEX_EXTRACT", pr, "([0-9])-(.*)", 1).alias("pri_num"),
        fn("REGEX_EXTRACT", pr, "([0-9])-(.*)", 2).alias("pri_word"),
        fn("REGEX_EXTRACT", pr, "URGENT-(.*)", 1).alias("no_match"),
        ag.get("group_1").alias("ag_1"),
        ag.get("group_2").alias("ag_2"),
        fn("STRSPLIT", pr, "-").alias("parts"))
        .order_by(col("o_orderkey"))).df()
    return out.withColumn("parts", F.array_join("parts", "|"))


def q_string_funcs2(spark, sf):
    """Second string-builtin sweep: LAST_INDEX_OF (0-based), LCFIRST,
    ENDSWITH, EqualsIgnoreCase, SPRINTF, ROUND_TO (HALF_EVEN), TRIM
    family."""
    eng = _eng(spark)
    cust = _t(eng, sf, "customer")
    name = col("c_name")
    padded = fn("CONCAT", lit("  "), name, lit("  "))
    return (cust.foreach(
        col("c_custkey").alias("c_custkey"),
        fn("LAST_INDEX_OF", name, "0").alias("last0"),
        fn("LCFIRST", name).alias("lcf"),
        fn("ENDSWITH", name, lit("5")).alias("ew5"),
        fn("EQUALSIGNORECASE", col("c_mktsegment"), lit("building"))
        .alias("is_bldg"),
        fn("SPRINTF", "%05d:%s", col("c_custkey"), col("c_mktsegment"))
        .alias("tag"),
        fn("ROUND_TO", col("c_acctbal"), 0).alias("bal0"),
        fn("TRIM", padded).alias("tr"),
        fn("LTRIM", padded).alias("ltr"),
        fn("RTRIM", padded).alias("rtr"))
        .order_by(col("c_custkey"))).df()


def q_datetime_funcs2(spark, sf):
    """Second datetime sweep: AddDuration/SubtractDuration (ISO-8601
    durations → make_interval), the Between family (Joda truncate-toward-
    zero), GETWEEK/GETWEEKYEAR, ToUnixTime/ToMilliSeconds, ToString(fmt)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    d = col("o_orderdate")
    epoch0 = fn("TODATE", lit("1995-06-15"))
    return (orders.foreach(
        col("o_orderkey").alias("o_orderkey"),
        fn("ADDDURATION", d, "P1DT2H").alias("plus_1d2h"),
        fn("SUBTRACTDURATION", d, "P2M").alias("minus_2m"),
        fn("MONTHSBETWEEN", d, epoch0).alias("mb"),
        fn("YEARSBETWEEN", d, epoch0).alias("yb"),
        fn("WEEKSBETWEEN", d, epoch0).alias("wb"),
        fn("GETWEEK", d).alias("wk"),
        fn("GETWEEKYEAR", d).alias("wky"),
        fn("TOUNIXTIME", d).alias("ut"),
        fn("TOMILLISECONDS", d).alias("ms"),
        fn("TOSTRING", d, "yyyy/MM/dd").alias("fmt"))
        .order_by(col("o_orderkey"))).df()


def q_bag_string(spark, sf):
    """BagToString over a deterministically sorted bag + TOTUPLE struct
    construction (pig BagToString.java / TOTUPLE.java)."""
    eng = _eng(spark)
    nation = _t(eng, sf, "nation")
    g = nation.group_by(col("n_regionkey"))
    sorted_names = fn("SORT_BAG", col("nation"), "n_name", True) \
        .get("n_name")
    return (g.foreach(col("group").alias("n_regionkey"),
                      fn("BAGTOSTRING", sorted_names, ",").alias("names"),
                      fn("SIZE", col("nation")).alias("n"))
             .order_by(col("n_regionkey"))).df()


def q_tuple_construct(spark, sf):
    """TOTUPLE → struct column; field access back out of it (POProject
    dereference on a constructed tuple). Both fields of the constructed
    tuple are dereferenced back to scalar columns for the driver-facing
    projection (scalar harness contract) — the round trip through the
    struct is what's under test."""
    eng = _eng(spark)
    region = _t(eng, sf, "region")
    t = fn("TOTUPLE", col("r_regionkey"), col("r_name"))
    return (region.foreach(col("r_regionkey").alias("r_regionkey"),
                           t.get("r_regionkey").alias("pair_key"),
                           t.get("r_name").alias("pair_name"),
                           t.get("r_name").alias("name_again"))
                  .order_by(col("r_regionkey"))).df()


def q_macro_params_script(spark, sf):
    """Parser front-end: %default parameter substitution + DEFINE…RETURNS
    macro expansion (QueryParserDriver#expandMacro / PreprocessorContext
    models, SURVEY.md §2.1 #29–30)."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        %default MINQTY 30.0;
        DEFINE big_by_flag(rel, qty) RETURNS agg {{
            flt = FILTER $rel BY l_quantity >= $qty;
            g = GROUP flt BY l_returnflag;
            $agg = FOREACH g GENERATE group AS l_returnflag,
                                      COUNT(flt) AS cnt,
                                      SUM(flt.l_quantity) AS qty;
        }};
        li = LOAD '{sf}/lineitem.parquet';
        out = big_by_flag(li, $MINQTY);
        srt = ORDER out BY l_returnflag;
    """)
    return rels["srt"].df()


def q_json_roundtrip(spark, sf):
    """JsonStorage STORE + JsonLoader LOAD round trip (SURVEY.md §2.7):
    write nation as JSON-per-line, read back with an explicit schema;
    oracle reads the same rows from parquet — proves the JSON codec."""
    import os
    import tempfile

    from spork_spark.sources import read, write
    eng = _eng(spark)
    nation = _t(eng, sf, "nation").df().select(
        "n_nationkey", "n_name", "n_regionkey")
    path = _tmp_path("spork_json", sf)
    write(nation, path, fmt="jsonstorage")
    out = read(spark, path, fmt="jsonloader",
               schema="n_nationkey BIGINT, n_name STRING, n_regionkey BIGINT")
    return out.orderBy("n_nationkey")


def q_orc_roundtrip(spark, sf):
    """OrcStorage round trip (pig OrcStorage.java, SURVEY.md §2.7)."""
    import os
    import tempfile

    from spork_spark.sources import read, write
    eng = _eng(spark)
    supp = _t(eng, sf, "supplier").df().select(
        "s_suppkey", "s_name", "s_nationkey")
    path = _tmp_path("spork_orc", sf)
    write(supp, path, fmt="orcstorage")
    out = read(spark, path, fmt="orcstorage")
    return out.orderBy("s_suppkey")


def q_text_loader(spark, sf):
    """TextLoader: one line = one chararray (pig TextLoader.java). Write
    names out as raw text, read back, re-derive the key by parsing — the
    codec-free text path."""
    import os
    import tempfile

    from spork_spark.sources import read, write
    eng = _eng(spark)
    nation = _t(eng, sf, "nation").df()
    lines = nation.select(
        F.concat_ws("|", F.col("n_nationkey"), F.col("n_name"))
        .alias("value"))
    path = _tmp_path("spork_text", sf)
    write(lines, path, fmt="textloader")
    out = read(spark, path, fmt="textloader")
    return (out.select(
        F.split(F.col("value"), r"\|").getItem(0).cast("long")
         .alias("n_nationkey"),
        F.split(F.col("value"), r"\|").getItem(1).alias("n_name"))
        .orderBy("n_nationkey"))


def q_stats_agg(spark, sf):
    """COR / COV / VAR aggregates (pig COR.java/COV.java; VAR from
    piggybank — SURVEY.md §2.4)."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    q = col("lineitem").get("l_quantity")
    p = col("lineitem").get("l_extendedprice")
    return (li.group_by(col("l_returnflag"))
              .foreach(col("group").alias("l_returnflag"),
                       _r6(fn("COR", q, p)).alias("cor_qp"),
                       _r2(fn("COV", q, p)).alias("cov_qp"),
                       _r2(fn("VAR", q)).alias("var_q"))
              .order_by(col("l_returnflag"))).df()


def q_skew_salted(spark, sf):
    """Manual salted skew join (operators/skew.py — the deterministic
    fallback behind AQE skew-join, SURVEY.md §2.1 #12): result is
    bitwise-identical to the plain join, only shuffle distribution
    changes — the oracle is the plain join."""
    from spork_spark.operators.skew import salted_join
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem").df().select("l_orderkey", "l_quantity")
    orders = _t(eng, sf, "orders").df().select("o_orderkey",
                                               "o_orderpriority")
    j = salted_join(li, orders, ["l_orderkey"], ["o_orderkey"], salt=8)
    return (j.groupBy("o_orderpriority")
             .agg(F.count("*").alias("cnt"),
                  F.floor(F.sum("l_quantity") * 100.0 + 0.5).cast("double")
                  .alias("qty_x100"))
             .orderBy("o_orderpriority"))


def q_heavy_hitters(spark, sf):
    """Exact frequent-items via candidate-then-verify (operators/skew.py
    heavy_hitters): per-partition Misra-Gries candidates (mapInPandas,
    bounded memory, no shuffle) then exact counting of candidates only —
    at scale the long tail of rare keys never enters an exchange. Values
    of l_returnflag||l_linestatus above 10% of rows (integer-ppm
    threshold test, no float boundary). Key = floor(l_quantity/10):
    buckets 0-4 each hold ~18-20% of rows and pass; bucket 5 (quantity
    exactly 50) holds ~2% and is correctly excluded — the threshold
    discriminates, with ~8pp margin at every sf. Oracle: plain GROUP BY
    ... HAVING with the same integer arithmetic."""
    from spork_spark.operators.skew import heavy_hitters
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem").df()
    d = li.select(F.floor(F.col("l_quantity") / 10).cast("long")
                   .alias("qty_bucket"))
    return heavy_hitters(d, "qty_bucket", min_frac=0.10) \
        .orderBy("qty_bucket")


def q_funnel(spark, sf):
    """Ordered conversion funnel view→click→purchase over events
    (operators/behavior.py funnel): step k counts users whose first
    step-k event is strictly after their step-(k-1) completion. One
    filtered aggregation per step; per-user state is one row. Oracle:
    the same chained MIN/JOIN algebra in SQL."""
    from spork_spark.operators.behavior import funnel
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return funnel(ev, "user_id", "ts", "event_type",
                  ["view", "click", "purchase"]).orderBy("step_idx")


def q_scd2(spark, sf):
    """SCD2 history from a change log (operators/behavior.py
    scd2_from_log): each user's event_type runs become
    [valid_from, valid_to) intervals — change detection via lag(),
    interval close via lead(), one key shuffle, deterministic tie
    order. Oracle: identical window algebra with IS DISTINCT FROM."""
    from spork_spark.operators.behavior import scd2_from_log
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df().select("user_id", "ts", "event_type")
    return scd2_from_log(ev, "user_id", "ts", ["event_type"]) \
        .orderBy("user_id", "valid_from", "event_type")


def q_pivot_events(spark, sf):
    """PIVOT long→wide (operators/reshape.py pivot_table): daily counts
    per event type as columns. Explicit value list — no distinct-values
    pre-pass, deterministic schema; one shuffle on the row key. Null
    cells filled 0 to a dense matrix. Oracle: CASE-based conditional
    aggregation."""
    from spork_spark.operators.reshape import pivot_table
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df() \
        .select(F.to_date("ts").alias("day"), "event_type")
    return pivot_table(ev, ["day"], "event_type",
                       ["click", "error", "purchase", "signup", "view"],
                       agg="count", fill=0).orderBy("day")


def q_unpivot_events(spark, sf):
    """UNPIVOT wide→long (reshape.py unpivot): melt the pivoted daily
    matrix back to (day, event_type, cnt) — map-side explosion, no
    shuffle beyond the pivot's own; null cells (no fill) drop so the
    long table is exactly the observed combinations. Oracle: plain
    GROUP BY day, type."""
    from spork_spark.operators.reshape import pivot_table, unpivot
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df() \
        .select(F.to_date("ts").alias("day"), "event_type")
    wide = pivot_table(ev, ["day"], "event_type",
                       ["click", "error", "purchase", "signup", "view"],
                       agg="count")
    return (unpivot(wide, ["day"],
                    ["click", "error", "purchase", "signup", "view"],
                    "event_type", "cnt")
            .select("day", "event_type", F.col("cnt").cast("long")
                    .alias("cnt"))
            .orderBy("day", "event_type"))


def q_cohort(spark, sf):
    """Cohort retention matrix (operators/behavior.py cohort_retention):
    first-activity-date cohorts × day offset → active users. The log
    collapses to distinct (user, day) before anything else, so the
    pipeline is sized by active-days, not events. Oracle: identical
    set algebra with date_diff."""
    from spork_spark.operators.behavior import cohort_retention
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return cohort_retention(ev, "user_id", "ts") \
        .orderBy("cohort", "day_offset")


def q_fuzzy_pairs(spark, sf):
    """Edit-distance-1 pair mining via FastSS deletion-neighborhood
    blocking (operators/dedup.py edit_distance_pairs): customer names
    differing in a single character pair up through a variant equi-join
    (alphabet-bounded buckets) and an exact levenshtein verify — no
    all-pairs comparison. Oracle replays the same deletion variants and
    levenshtein filter in SQL."""
    from spork_spark.operators.dedup import edit_distance_pairs
    eng = _eng(spark)
    cust = _t(eng, sf, "customer").df().select("c_custkey", "c_name")
    return _iso_sort(edit_distance_pairs(cust, "c_custkey", "c_name"),
                     "id_a", "id_b")


def q_zorder(spark, sf):
    """Z-order (Morton) clustering key (operators/layout.py): interleave
    8 bits each of min-max-scaled l_suppkey and l_partkey — the layout
    key Delta/Iceberg-style OPTIMIZE ZORDER uses so that row-group
    min/max stats prune scans on EITHER column. Pure integer Column
    arithmetic; the 1-row stats subquery stays in the plan as a
    broadcast. Oracle replays the identical scaling + bit interleave in
    SQL."""
    from spork_spark.operators.layout import zorder_key
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem").df().select("l_suppkey", "l_partkey")
    return (zorder_key(li, ["l_suppkey", "l_partkey"], bits=8,
                       out_col="zkey")
            .orderBy("zkey", "l_suppkey", "l_partkey"))


def q_outliers(spark, sf):
    """Per-group z-score outliers in EXACT integer arithmetic
    (operators/curation.py group_outliers): events whose value deviates
    more than 3 population-sigmas from their event_type mean. The test
    (n*v - S)^2 > z^2 * (n*Q - S^2) is all-integer over cent-quantized
    values (decimal(38,0) squares), so the flag set is deterministic
    and SQL-exact. Plan: one map-combined stats groupBy + broadcast
    join back + narrow filter — no window, one shuffle of group stats
    only."""
    from spork_spark.operators import group_outliers
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return (group_outliers(ev, "event_type", "value", z_num=3, z_den=1)
            .select("event_id", "event_type", "value")
            .orderBy("event_id"))


def q_weighted_sample(spark, sf):
    """Deterministic Efraimidis-Spirakis weighted sampling
    (operators/curation.py weighted_sample): pick 50 documents with
    probability proportional to length(text). md5-seeded uniforms and
    round-before-rank keys make the draw exact-oracle-reproducible;
    the plan is a narrow map + TakeOrderedAndProject (no corpus
    shuffle)."""
    from spork_spark.operators import weighted_sample
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (weighted_sample(docs.withColumn(
                "weight", F.length("text").cast("double")),
                "weight", k=50, id_col="doc_id", seed=42)
            .select("doc_id", "weight", "sample_key")
            .orderBy(F.col("sample_key").desc(), "doc_id"))


def q_profile_events(spark, sf):
    """Column-level data profile of events (operators/curation.py
    profile_columns): row/null/exact-distinct counts, numeric and
    string/timestamp min/max, mean string length — ONE aggregate pass
    (Catalyst Expand plan for the multi-distinct), one row per column.
    The Deequ-style quality gate an ingest runs before training."""
    from spork_spark.operators import profile_columns
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return profile_columns(ev).orderBy("column")


def q_sessionize(spark, sf):
    """Gap-based sessionization (operators/behavior.py sessionize): a
    new session opens after a >30 min silence per user; ONE keyed
    window computes break flags and their running sum (single exchange,
    single sort — both window passes share partitioning). Output: one
    row per session with bounds/size — integer-microsecond gap
    arithmetic, so the SQL oracle reproduces session ids exactly."""
    from spork_spark.operators import sessionize
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    s = sessionize(ev, "user_id", "ts", gap_seconds=1800,
                   tiebreak_col="event_id")
    return (s.groupBy("user_id", "session_seq")
             .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                  F.min("ts").alias("start_ts"),
                  F.max("ts").alias("end_ts"))
             .withColumn(
                 "duration_s",
                 ((F.expr("unix_micros(cast(end_ts as timestamp))")
                   - F.expr("unix_micros(cast(start_ts as timestamp))"))
                  / F.lit(1_000_000.0)).alias("duration_s"))
             .orderBy("user_id", "session_seq"))


def q_rollup_incremental(spark, sf):
    """Continuous-aggregate refresh (operators/rollup.py rollup_merge):
    rollup the pre-cutoff events, rollup the late tail separately, and
    MERGE the two rollups — raw history is never rescanned. cnt/sum
    re-SUM (sum in exact decimal(38,2)), min/max re-MIN/MAX, so the
    merged result is bit-identical to the direct full rollup, which is
    exactly what the oracle computes. Shape: two raw shuffles (one per
    disjoint slice — same total volume as one) + one rollup-row-sized
    merge groupBy."""
    from spork_spark.operators import rollup_merge, time_rollup
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    cutoff = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    snap = time_rollup(ev.filter(F.col("ts") < cutoff), ts_col="ts",
                       dims=("event_type",), value_col="value",
                       grains=("hour", "day"))
    delta = time_rollup(ev.filter(F.col("ts") >= cutoff), ts_col="ts",
                        dims=("event_type",), value_col="value",
                        grains=("hour", "day"))
    return (rollup_merge(snap, delta)
            # same driver-facing decimal->double projection as
            # q_time_rollup (exact; see the note there)
            .withColumn("sum_value", F.col("sum_value").cast("double"))
            .orderBy("grain", "bucket", "event_type"))


def q_pmi(spark, sf):
    """Within-document co-occurrence PMI (operators/text.py pmi_pairs
    — Church & Hanks 1990): document-frequency based, vocabulary
    bounded by min_df=5 (noise floor) and max_df=50% of docs (the
    hub-token ceiling that keeps the per-doc pair join sub-quadratic
    AND drops the zero-signal stopwords; 0.9 here — the synthetic corpus
    has a ~31-token vocabulary where nearly every token tops 50% df, so
    the production-default 0.5 ceiling would empty it). ln rounded to 6 digits for
    engine portability; all counts exact integers."""
    from spork_spark.operators import pmi_pairs
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (pmi_pairs(docs, min_df=5, max_df_frac=0.9, min_pair=3)
            .orderBy("tok_a", "tok_b"))


def q_winsorize(spark, sf):
    """Per-group percentile clipping (operators/curation.py winsorize):
    event values clipped to their event_type's [p5, p95]; quantiles by
    exact linear interpolation (Spark percentile == DuckDB
    quantile_cont, parity already pinned by `percentiles`), rounded to
    6 digits BEFORE clipping so the boundary constant is engine-
    portable; interior values pass through bit-unchanged. Plan: stats
    groupBy + broadcast join back + narrow map — corpus never
    shuffles."""
    from spork_spark.operators import winsorize
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return (winsorize(ev, "event_type", "value", p_lo=0.05, p_hi=0.95)
            .select("event_id", "event_type", "value", "value_w")
            .orderBy("event_id"))


def q_asof_nearest(spark, sf):
    """pandas-merge_asof 'nearest' direction (operators/asof.py):
    each click attached to the user's temporally CLOSEST purchase
    (ties to the backward match — pandas semantics). Composed from the
    backward and forward union+window passes — two keyed windows, no
    inequality join anywhere. The right side is deduped per (user, ts)
    first for a deterministic winner. Oracle: fenced quadratic
    min-|Δ| per left row (algorithm-independent)."""
    from spork_spark.operators import asof_join
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    clicks = (ev.filter(F.col("event_type") == "click")
                .select("event_id", "user_id", "ts"))
    purch = (ev.filter(F.col("event_type") == "purchase")
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("p_value")))
    out = asof_join(clicks, purch, on="ts", by="user_id",
                    direction="nearest")
    return (out.select("event_id", "user_id", "ts",
                       F.col("p_value_asof").alias("p_value"),
                       F.col("ts_asof").alias("p_ts"))
               .orderBy("event_id"))


def q_transitions(spark, sf):
    """First-order Markov transition matrix over per-user event-type
    sequences (operators/behavior.py transition_matrix): ONE keyed
    window (lag) + one map-combined pair groupBy + broadcast row
    totals; probabilities as exact integer ppm (cnt*1e6 div total)."""
    from spork_spark.operators import transition_matrix
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return (transition_matrix(ev, "user_id", "ts", "event_type",
                              tiebreak_col="event_id")
            .orderBy("from_state", "to_state"))


def q_dq(spark, sf):
    """Declarative data-quality suite (operators/dq.py dq_validate —
    the dbt-tests/Deequ shape): five rules over events — all row-wise
    rules fold into ONE shared aggregate pass (plan-tested), unique is
    one groupBy, the FK check one broadcast anti-join against
    customer. Output: (rule, kind, n_violations), exact counts."""
    from spork_spark.operators import dq_validate
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    cust = _t(eng, sf, "customer").df()
    rules = [
        {"kind": "not_null", "col": "event_id"},
        {"kind": "in_range", "col": "value", "lo": 0, "hi": 100},
        {"kind": "matches", "col": "event_type",
         "pattern": "[a-z_0-9]+"},
        {"kind": "unique", "cols": ["event_id"]},
        {"kind": "foreign_key", "col": "user_id", "ref": cust,
         "ref_col": "c_custkey"},
    ]
    return dq_validate(ev, rules).orderBy("rule")


def q_dq_embeddings(spark, sf):
    """Vector-column data-quality suite (operators/dq.py dq_validate
    with the `vector` rule kind): dimensionality + NaN/null-element
    well-formedness of the embedding column folds into the SAME shared
    aggregate pass as the scalar rules — k rules still cost one scan.
    Exact counts; the oracle replays each predicate in SQL."""
    from spork_spark.operators import dq_validate
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    rules = [
        {"kind": "vector", "col": "embedding", "dim": 64},
        {"kind": "not_null", "col": "embedding"},
        {"kind": "in_range", "col": "label", "lo": 0, "hi": 9},
        {"kind": "unique", "cols": ["vec_id"]},
    ]
    return dq_validate(emb, rules).orderBy("rule")


def q_cc_incremental(spark, sf):
    """Incremental connected components (operators/graph.py
    cc_incremental): label the chain edges first, then fold the
    doubling edges in WITHOUT re-traversing the old graph — CC runs on
    the contracted graph only, the old labeling is touched by two key
    shuffles. The oracle is the full-recompute recursive CTE over the
    UNION, so green means incremental == from-scratch exactly — the
    contract that lets a 100 TB near-dedup pipeline absorb new pair
    batches at delta cost."""
    from spork_spark.operators import cc_incremental, connected_components
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df().select("doc_id")
    old = docs.filter(F.col("doc_id") % 10 < 4) \
              .select(F.col("doc_id").alias("src"),
                      (F.col("doc_id") + 1).alias("dst"))
    new = docs.filter((F.col("doc_id") % 7 == 0) & (F.col("doc_id") > 0)) \
              .select(F.col("doc_id").alias("src"),
                      (F.col("doc_id") * 2).alias("dst"))
    return (cc_incremental(connected_components(old), new)
            .orderBy("node"))


def q_sorted_neighborhood(spark, sf):
    """Sorted-neighborhood record-linkage blocking (operators/dedup.py
    sorted_neighborhood_pairs — Hernandez & Stolfo SIGMOD'95): docs
    within 2 positions of each other in (n_chars, doc_id) order.
    Global positions via the POCounter two-pass design (range
    partition + per-partition row_number + broadcast prefix offsets),
    neighbors via a position equi-join — no 1-partition window
    anywhere."""
    from spork_spark.operators import sorted_neighborhood_pairs
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (sorted_neighborhood_pairs(docs, "doc_id", "n_chars",
                                      window=3)
            .orderBy("id_a", "id_b"))


def q_chi2(spark, sf):
    """Chi-squared association between documents.lang and
    documents.source (operators/stats.py chi2_contingency): per-cell
    contributions in EXACT integer arithmetic — (O-E)^2/E multiplied
    out to (N*n_ab - n_a*n_b)^2 * 1e6 div (N*n_a*n_b), every term an
    integer, zero cells of the margin cross product included. Plan: two
    margin groupBys + one cell groupBy + a category-sized cross join —
    the corpus shuffles as counts only."""
    from spork_spark.operators import chi2_contingency
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (chi2_contingency(docs, "lang", "source")
            .orderBy("lang", "source"))


def q_histogram(spark, sf):
    """Fixed-range equi-width histogram of events.value per event_type
    (operators/stats.py histogram): cent-quantized integer bucketing
    ([0,100) in 20 buckets, out-of-range clamped to the edges), ONE
    map-side-combined groupBy — bucket-count-sized output."""
    from spork_spark.operators import histogram
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return (histogram(ev, "event_type", "value",
                      lo=0, hi=100, n_buckets=20)
            .orderBy("event_type", "bucket"))


def q_hard_negatives(spark, sf):
    """Contrastive hard-negative mining (operators/similarity.py
    hard_negatives): top-5 nearest different-label vectors per anchor
    (anchors = vec_id % 50 == 0). Anchors broadcast; the corpus never
    shuffles except the per-anchor top-k ranking; scores round before
    ranking so rank boundaries replay. The oracle pays the quadratic
    scoring the engine's anchor-batch shape avoids at scale."""
    from spork_spark.operators import hard_negatives
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    anchors = emb.filter(F.col("vec_id") % 50 == 0)
    return hard_negatives(emb, anchors=anchors, k=5) \
        .orderBy("anchor_id", "rank")


def q_normalize_text(spark, sf):
    """Canonical text normalization (operators/text.py normalize_text):
    Unicode NFC via an Arrow-batched pandas UDF (same Unicode standard
    DuckDB's nfc_normalize implements), then native lowercase +
    whitespace collapse + trim. Pure row-wise map, fuses into the
    scan."""
    from spork_spark.operators import normalize_text
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return normalize_text(docs).select("doc_id", "text_norm") \
        .orderBy("doc_id")


def q_ohlc(spark, sf):
    """Daily OHLC candlestick bars per event_type
    (operators/timeseries.py ohlc): open/close via struct-ordered
    MIN/MAX over the TOTAL order (ts, event_id) — deterministic under
    simultaneous observations, where bare min_by would pick an
    arbitrary survivor — so the whole bar is ONE map-side-combined
    groupBy, no window. Exact cents."""
    from spork_spark.operators import ohlc
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return ohlc(ev, "event_type", "ts", "value", "event_id") \
        .orderBy("event_type", "day")


def q_twap(spark, sf):
    """Time-weighted average value per event_type
    (operators/timeseries.py twap — the TimescaleDB time_weight/LOCF
    convention): each observation holds until the next, the last holds
    nothing; cents x micro-second durations accumulate in decimal(38,0)
    and the span ratio lands as an exact twap_e6 long. ONE keyed lead
    window + ONE map-side-combined groupBy."""
    from spork_spark.operators import twap
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return twap(ev, "event_type", "ts", "value").orderBy("event_type")


def q_rolling_sum(spark, sf):
    """Trailing 7-day rolling cent-sum per event_type
    (operators/timeseries.py rolling_sum): one map-side-combined daily
    groupBy, then ONE keyed window with an integer RANGE frame over the
    epoch-day number — calendar holes shorten the window arithmetically
    instead of requiring densification. Exact longs end-to-end."""
    from spork_spark.operators import rolling_sum
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return rolling_sum(ev, "event_type", "ts", "value", days=7) \
        .orderBy("event_type", "day")


def q_ewma(spark, sf):
    """Per-key EWMA of the daily cent series as an EXACT integer
    recurrence (operators/timeseries.py ewma): alpha is the rational
    3/10 and state lives in micro-cents, s_t = (3·x_t·1e6 + 7·s_{t-1})
    div 10 — one truncating integer division per step, so the oracle's
    recursive CTE replays the identical longs (a float recurrence would
    hinge on literal parsing and libm). Per-key sequential state is
    intrinsic (sessionize class); cross-key parallelism scales."""
    from spork_spark.operators import ewma
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return ewma(ev, "event_type", "ts", "value").orderBy("event_type",
                                                         "day")


def q_pareto(spark, sf):
    """Pareto frontier (skyline) of part on (p_size max, p_retailprice
    min) — operators/curation.py pareto_frontier, the distributed
    block-nested-loop skyline (Börzsönyi SIGMOD'01): per-partition
    local frontiers via a pandas kernel, then one re-run over the
    gathered (tiny) local frontiers. The oracle pays the quadratic
    NOT EXISTS replay; the engine never forms a pair."""
    from spork_spark.operators import pareto_frontier
    eng = _eng(spark)
    part = _t(eng, sf, "part").df()
    return pareto_frontier(part, {"p_size": "max",
                                  "p_retailprice": "min"}) \
        .orderBy("p_partkey")


def q_benford(spark, sf):
    """Benford first-digit audit of l_extendedprice
    (operators/dq.py benford_digits): digit from the decimal's STRING
    form (no log10 edge cases), ONE map-side-combined groupBy, exact
    integer ppm shares against the precomputed Benford constants;
    absent digits still report n=0."""
    from spork_spark.operators import benford_digits
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem").df()
    return benford_digits(li, "l_extendedprice").orderBy("digit")


def q_consistent_sample(spark, sf):
    """Join-preserving deterministic sampling (operators/splits.py
    consistent_sample): orders and customer sampled INDEPENDENTLY by
    the same customer-key hash still join with full referential
    integrity — sample(A) ⋈ sample(B) == sample(A ⋈ B), the 100 TB
    debug-extract contract (independent row samples keep ~rate² of
    pairs). Map-only predicate, fuses into the scan."""
    from spork_spark.operators import consistent_sample
    eng = _eng(spark)
    orders = _t(eng, sf, "orders").df()
    cust = _t(eng, sf, "customer").df()
    so = consistent_sample(orders, "o_custkey", 10)
    sc = consistent_sample(cust, "c_custkey", 10)
    j = so.join(sc, so["o_custkey"] == sc["c_custkey"])
    return (j.groupBy("c_mktsegment")
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.countDistinct("c_custkey").alias("n_customers"))
             .orderBy("c_mktsegment"))


def q_jl_sketch(spark, sf):
    """Johnson-Lindenstrauss sketch with EXACT ±1 Rademacher planes
    (operators/linalg.py rademacher_projection): plane entries come
    from md5-hex-digit parity (Achlioptas 2001 — ±1 satisfies JL, and
    unlike Gaussian planes the sketch is exact integers the oracle
    replays digit-for-digit). Pure Column HOFs over k·dim inline sign
    literals — no Python, no shuffle, fuses into the scan; any worker
    regenerates the matrix from the seed. Driver-facing projection
    serializes the integer sketch to a canonical CSV string (scalar
    harness contract, r8 lesson); the operator keeps the typed array."""
    from spork_spark.operators import rademacher_projection
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    return (rademacher_projection(emb, out_dim=16, seed=42)
            .select("vec_id",
                    F.array_join(F.transform("sketch",
                                             lambda x: x.cast("string")),
                                 ",").alias("sketch"))
            .orderBy("vec_id"))


def q_embedding_covariance(spark, sf):
    """Exact-integer covariance of the embedding corpus
    (operators/linalg.py embedding_covariance): a mapInPandas kernel
    accumulates ONE 64x64 int64 Gram matrix per partition (numpy Q^T Q
    per Arrow batch, on e3-quantized components) and ships
    dim(dim+1)/2-row partials — the corpus never crosses the wire as
    vectors; a map-side-combined groupBy folds partials in
    decimal(38,0). Every statistic is an exact integer the oracle's
    explode+self-join replay reproduces digit-for-digit (the oracle
    pays the quadratic unnest; the engine does not)."""
    from spork_spark.operators import embedding_covariance
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    return embedding_covariance(emb, "embedding", dim=64) \
        .orderBy("i", "j")


def q_covisitation(spark, sf):
    """Session-based co-visitation: sessionize ∘ item_cooccurrence —
    baskets are (user, session) and items the event types visited in
    that session, the co-visitation matrix behind session-based
    recommenders. Shows two operators composing cleanly: sessionize's
    single keyed window feeds the basket key; the co-occurrence
    machinery (support floor, basket ceiling, exact lift/cos²) runs
    unchanged. The oracle is the sessionize SQL piped into the
    item_cooccurrence SQL."""
    from spork_spark.operators import item_cooccurrence, sessionize
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    sess = sessionize(ev, "user_id", "ts", gap_seconds=1800,
                      tiebreak_col="event_id")
    baskets = sess.withColumn(
        "basket", F.concat_ws("#", F.col("user_id").cast("string"),
                              F.col("session_seq").cast("string")))
    return item_cooccurrence(baskets, "basket", "event_type",
                             min_support=5, min_pair=5) \
        .orderBy("item_a", "item_b")


def q_theil_sen(spark, sf):
    """Theil–Sen robust trend per event_type (operators/timeseries.py
    theil_sen): median of all pairwise slopes of the DAILY series —
    each pair slope an exact sign-split e6 integer, the median an exact
    interpolated double. The daily pre-aggregation is the quadratic
    fence (span-days² pairs per group, never raw rows); group_ols is
    the unfenced least-squares path."""
    from spork_spark.operators import theil_sen
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return theil_sen(ev, "event_type", "ts", "value") \
        .orderBy("event_type")


def q_boilerplate(spark, sf):
    """Boilerplate/template density per document (operators/text.py
    boilerplate_density — the RefinedWeb-family signal): share of a
    doc's distinct 8-gram windows that recur in OTHER documents, exact
    integer ppm. Recurrence is counted through the gram-frequency table
    (one explode + two map-side-combined groupBys + one vocabulary-
    sized equi-join) — never doc-pairs, the same reason dedup_lines
    scales."""
    from spork_spark.operators import boilerplate_density
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return boilerplate_density(docs, n=8).orderBy("doc_id")


def q_timeseries_report(spark, sf):
    """The composed telemetry dashboard row: per event_type, OLS trend
    (group_ols) ⋈ robust location/scale (group_mad) ⋈ time-weighted
    average (twap) — three independent aggregation pipelines joined on
    the group key (each exact, so the composition is exact; the oracle
    is the join of the three oracles). The shape that matters at
    100 TB: three passes stay three map-side-combined aggregations over
    the same scan lineage, joined at group-count size."""
    from spork_spark.operators import group_mad, group_ols, twap
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    ols = group_ols(ev, "event_type", "ts", "value") \
        .select("event_type", "slope_e6", "r2_e6")
    mad = group_mad(ev, "event_type", "value") \
        .select("event_type", "n", "median_cents", "mad_cents")
    tw = twap(ev, "event_type", "ts", "value") \
        .select("event_type", "twap_e6")
    return (ols.join(mad, on="event_type").join(tw, on="event_type")
               .select("event_type", "n", "slope_e6", "r2_e6",
                       "median_cents", "mad_cents", "twap_e6")
               .orderBy("event_type"))


def q_keywords(spark, sf):
    """Keyword extraction: top-3 tf-idf terms per document — the
    tf_idf operator composed with a per-doc WindowGroupLimit top-k
    (rank on the ROUNDED score with a token tiebreak, so rank
    boundaries replay in any engine). The partial group-limit prunes
    below the shuffle, the trending/per_source_cap plan shape."""
    from pyspark.sql.window import Window
    from spork_spark.operators import tf_idf
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    scored = tf_idf(docs, "doc_id", min_df=5)
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(),
                                             F.col("token"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= 3)
                  .select("doc_id", "token", "tfidf",
                          F.col("rank").cast("int").alias("rank"))
                  .orderBy("doc_id", "rank"))


def q_conversion_times(spark, sf):
    """Time-to-convert distribution signup→purchase
    (operators/behavior.py conversion_times): first signup to first
    purchase at-or-after it per user, via conditional MIN aggregates —
    no window, no stream-to-stream join; integer-microsecond delays
    whose interpolated percentiles are exact. Counts starters vs
    converters; never-converters stay out of the percentiles."""
    from spork_spark.operators import conversion_times
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return conversion_times(ev, "user_id", "ts", "event_type",
                            "signup", "purchase")


def q_anomaly_days(spark, sf):
    """Robust daily anomaly flags: days whose cent-sum deviates more
    than 2.5×MAD from the per-type median of daily sums — group_mad
    applied at the DAILY grain (medians of integer cents stay exact
    binary doubles and 2.5 is dyadic, so the threshold compares
    identically in both engines). The robust counterpart of z-score
    day flagging: one wild day cannot drag its own threshold."""
    from spork_spark.operators import group_mad
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    day = F.date_trunc("day", F.col("ts")).cast("date")
    cents = F.floor(F.col("value").cast("double") * 100 + 0.5) \
             .cast("long")
    daily = (ev.where(F.col("ts").isNotNull()
                      & F.col("value").isNotNull())
               .groupBy(F.col("event_type"), day.alias("day"))
               .agg(F.sum(cents).alias("day_cents")))
    # group_mad over the daily grain: value_col in whole cents, so
    # scale=1 keeps the quantization identity
    stats = group_mad(daily, "event_type", "day_cents", scale=1) \
        .select("event_type", "median_cents", "mad_cents")
    return (daily.join(F.broadcast(stats), on="event_type")
                 .where(F.abs(F.col("day_cents")
                              - F.col("median_cents"))
                        > 2.5 * F.col("mad_cents"))
                 .select("event_type", "day", "day_cents",
                         "median_cents", "mad_cents")
                 .orderBy("event_type", "day"))


def q_rfm(spark, sf):
    """RFM customer segmentation (operators/behavior.py rfm_segments):
    per-user recency/frequency/monetary with quintile scores assigned
    by the VALUE-DETERMINISTIC bin rule (equal metrics always score
    equally — ntile would split ties arbitrarily). One per-user
    aggregation; each score map is a metric-cardinality table joined
    back broadcast. Exact integers; the oracle replicates all three
    score maps."""
    from spork_spark.operators import rfm_segments
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return rfm_segments(ev, n_bins=5).orderBy("user_id")


def q_abc_suppliers(spark, sf):
    """ABC/Pareto-class triage of suppliers by lineitem revenue
    (operators/stats.py abc_classes): one map-side-combined groupBy,
    an exclusive-prefix cumulative window over KEY-cardinality rows
    (deterministic (total desc, key) order), and pure-integer threshold
    comparisons — no division anywhere."""
    from spork_spark.operators import abc_classes
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem").df()
    return abc_classes(li, "l_suppkey", "l_extendedprice") \
        .orderBy("l_suppkey")


def q_growth(spark, sf):
    """Daily growth accounting over events
    (operators/behavior.py growth_accounting): actives, first-ever-seen
    news, returning, and cumulative uniques — exact integers; the
    cumulative fold runs over DAY-cardinality rows (bounded at any data
    scale), everything else is map-side-combined groupBys."""
    from spork_spark.operators import growth_accounting
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return growth_accounting(ev).orderBy("day")


def q_group_gini(spark, sf):
    """Gini concentration of event value per event_type
    (operators/stats.py group_gini): exact integer formula over the
    group's sorted cent values — ONE keyed window for the exact ranks
    + ONE map-side-combined aggregation; rank ties on equal values
    cancel out of Σ i·y, so the result is deterministic."""
    from spork_spark.operators import group_gini
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return group_gini(ev, "event_type", "value").orderBy("event_type")


def q_group_mad(spark, sf):
    """Robust location/scale per event_type (operators/stats.py
    group_mad): median and median-absolute-deviation of cent values —
    exact WITHOUT rounding because interpolated medians of integers
    are exact binary doubles (halves/quarters). Two aggregation passes
    with a broadcast median join — medians are holistic."""
    from spork_spark.operators import group_mad
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return group_mad(ev, "event_type", "value").orderBy("event_type")


def q_group_mode(spark, sf):
    """Deterministic MODE per group (operators/stats.py group_mode):
    most common lang per source over documents — two map-side-combined
    groupBys, ties resolved to the SMALLEST value (never an arbitrary
    survivor). This exercises the orderable-type fallback branch; the
    long fast path (bitwise-not argmax in one struct MAX) is pinned by
    unit test."""
    from spork_spark.operators import group_mode
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return group_mode(docs, "source", "lang").orderBy("source")


def q_item_cooccurrence(spark, sf):
    """Market-basket association rules (operators/basket.py
    item_cooccurrence): parts co-purchased within an order, with exact
    integer support/lift/cosine². The per-basket self-equi-join is
    bounded by the max_basket ceiling and the min_support floor (the
    pmi_pairs contract, itemized); supports join back broadcast; the
    basket count is a 1-row broadcast."""
    from spork_spark.operators import item_cooccurrence
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem").df()
    return item_cooccurrence(li, "l_orderkey", "l_partkey",
                             min_support=5, min_pair=2) \
        .orderBy("item_a", "item_b")


def q_equifreq_bins(spark, sf):
    """Equal-frequency feature bins over events.value as a FUNCTION OF
    VALUE (operators/stats.py equifreq_bins): distinct cent-quantized
    values bin by cumulative count, (rows_below * n) div total — same
    value always lands in the same bin (train/serve-consistent, unlike
    ntile's arbitrary tie splitting). One map-side-combined groupBy over
    the data; the cumulative window runs over DISTINCT values only
    (value-cardinality sized, not data sized)."""
    from spork_spark.operators import equifreq_bins
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return equifreq_bins(ev, "value", n_bins=10).orderBy("bin")


def q_bigram_lm(spark, sf):
    """Corpus-self-trained add-one bigram LM fluency score per document
    (operators/text.py bigram_lm_score — the KenLM-style quality-filter
    shape): ONE explode pass builds the bigram stream (arrays_zip of
    two slices, no self-join), two map-side-combined groupBys train the
    model, and scoring re-joins the stream to the vocabulary-sized
    model tables. Probabilities are exact integers
    (c12+1)*1e6 div (c1+V), so the oracle replays every digit."""
    from spork_spark.operators import bigram_lm_score
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return bigram_lm_score(docs).orderBy("doc_id")


def q_gap_fill(spark, sf):
    """Dense daily purchase-volume series per user cohort with LOCF gap
    filling (operators/timeseries.py gap_fill): purchases keyed by
    pmod(user_id, 50) are cent-summed per (cohort, day); each cohort's
    min..max day spine is generated distributed (sequence + explode,
    never a driver loop) and holes carry the last observation forward
    under a keyed window. Exact long cents, so the oracle replays it
    digit-for-digit with generate_series + IGNORE NULLS last_value."""
    from spork_spark.operators import gap_fill
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    d = (ev.filter(F.col("event_type") == "purchase")
           .withColumn("k", F.pmod(F.col("user_id"), F.lit(50))))
    return gap_fill(d, "k", "ts", "value").orderBy("k", "day")


def q_group_ols(spark, sf):
    """Per-event-type OLS trend of value vs days-since-first-observation
    (operators/timeseries.py group_ols): textbook normal equations as
    ratios of exact decimal(38,0) sums over cent-quantized values, with
    sign-split scaled integer division — slope/intercept/r² land as
    exact *_e6 longs the oracle reproduces bit-for-bit. One broadcast
    first-day join + ONE map-side-combined aggregation; output is
    group-count sized."""
    from spork_spark.operators import group_ols
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    return group_ols(ev, "event_type", "ts", "value") \
        .orderBy("event_type")


def q_merge_upsert(spark, sf):
    """MERGE-style upsert (operators/upsert.py): refresh the orders
    snapshot with a deterministic change batch — keys %7 (and not %13)
    updated twice with versions 1 and 2 (version resolution must apply
    only v2 = price*3), keys %13 deleted, keys %31 re-inserted under
    key+100000000. The snapshot side sees ONE broadcast anti-join and
    never shuffles (plan pinned in test_upsert.py). Oracle replays the
    same change batch in SQL set algebra."""
    from spork_spark.operators.upsert import merge_upsert
    eng = _eng(spark)
    base = _t(eng, sf, "orders").df() \
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    k = F.col("o_orderkey")
    u1 = base.where((k % 7 == 0) & (k % 13 != 0)).select(
        k.alias("o_orderkey"), F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.lit(1).alias("v"), F.lit(False).alias("is_delete"))
    u2 = base.where((k % 7 == 0) & (k % 13 != 0)).select(
        k.alias("o_orderkey"), F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 3).alias("o_totalprice"),
        F.lit(2).alias("v"), F.lit(False).alias("is_delete"))
    dels = base.where(k % 13 == 0).select(
        k.alias("o_orderkey"), F.lit("X").alias("o_orderstatus"),
        F.lit(0.0).alias("o_totalprice"),
        F.lit(1).alias("v"), F.lit(True).alias("is_delete"))
    ins = base.where(k % 31 == 0).select(
        (k + 100000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"), F.col("o_totalprice"),
        F.lit(1).alias("v"), F.lit(False).alias("is_delete"))
    upd = u1.unionByName(u2).unionByName(dels).unionByName(ins)
    return merge_upsert(base, upd, ["o_orderkey"], version_col="v",
                        delete_col="is_delete").orderBy("o_orderkey")


def q_partitioned_pruning(spark, sf):
    """Partitioned STORE + partition-pruned LOAD (LoadMetadata
    getPartitionKeys / PartitionFilterOptimizer, SURVEY.md §2.7+§4.1):
    write orders partitioned by o_orderstatus, read back filtered — the
    'F' filter prunes to one directory (PartitionFilters in the scan;
    pinned in tests)."""
    import os
    import tempfile

    from spork_spark.sources import read, write
    eng = _eng(spark)
    orders = _t(eng, sf, "orders").df().select(
        "o_orderkey", "o_totalprice", "o_orderdate", "o_orderstatus")
    path = _tmp_path("spork_part", sf)
    write(orders, path, fmt="parquet", partition_by=["o_orderstatus"])
    out = read(spark, path, fmt="parquet")
    return (out.filter(F.col("o_orderstatus") == "F")
               .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
               .agg(F.count("*").alias("cnt"))
               .orderBy("yr"))


def q_strsplittobag(spark, sf):
    """STRSPLITTOBAG + FLATTEN: split to a bag of 1-field tuples, explode
    to rows (the TOKENIZE-family row-fanout path)."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    toks = orders.foreach(
        flatten(fn("STRSPLITTOBAG", col("o_orderpriority"), "-")))
    g = toks.group_by(col("token"))
    return (g.foreach(col("group").alias("token"),
                      fn("COUNT_STAR").alias("cnt"))
             .order_by(col("token"))).df()


def q_unique_id(spark, sf):
    """UniqueID() — partition-id + per-partition counter (pig
    UniqueID.java). Engine-specific values → rows-only check; uniqueness
    and count are pinned in tests."""
    eng = _eng(spark)
    nation = _t(eng, sf, "nation")
    return (nation.foreach(col("n_nationkey").alias("n_nationkey"),
                           fn("UNIQUEID").alias("uid"))
                  .order_by(col("n_nationkey"))).df()


def q_decontaminate(spark, sf):
    """Benchmark decontamination (test-set overlap guard): flag corpus
    documents sharing any 4-word n-gram with a held-out 'benchmark' slice
    (doc_id % 50 == 0), report per-(lang, contaminated) counts. The
    broadcast-semi-join-on-ngram design is the standard 100 TB
    decontamination pass (operators/text.py decontaminate)."""
    from spork_spark.operators import decontaminate
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    flagged = decontaminate(corpus, bench, n=4, mode="flag")
    return (flagged.groupBy("lang", "contaminated")
                   .agg(F.count("*").alias("n_docs"))
                   .orderBy("lang", "contaminated"))


def q_chunk_documents(spark, sf):
    """Fixed-length sequence chunking (training prep): 32-token chunks per
    document, boundary-preserving; verify chunk counts + per-chunk token
    accounting. Map-side fan-out, no shuffle (operators/text.py)."""
    from spork_spark.operators import chunk_documents
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    ch = chunk_documents(docs, seq_len=32)
    return (ch.select("doc_id", "chunk_idx", "n_tokens",
                      F.length("chunk_text").alias("n_chars"))
              .orderBy("doc_id", "chunk_idx"))


def q_text_signals(spark, sf):
    """Corpus-quality signals beyond ratios: repeated-2-gram share
    (boilerplate/spam) and character Shannon entropy (gibberish) — both
    pure HOF expressions; the entropy fold is order-pinned (sorted
    distinct chars) so DuckDB reproduces it bit-for-bit."""
    from spork_spark.operators import char_entropy, repetition_ratio
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    r4 = lambda c: F.floor(c * 10000.0 + 0.5) / 10000.0
    # Sort FIRST, project after (same rows, same order — doc_id is
    # unique and the projection is narrow): an ORDER BY *above* an
    # expensive shuffle-free projection makes RangePartitioner's
    # bounds-sampling job execute the whole projection a second time,
    # and serializes the kernel into however few tasks the scan has
    # (single-row-group parquet = ONE task). Sorting the narrow input
    # first samples only the scan and runs the kernel post-exchange at
    # full parallelism. Measured at sf0.1: 47.3 s -> 3.4 s (guide §1.4
    # / §2.4; OPTIMIZATION_r10.md).
    return (docs.orderBy("doc_id")
                .select(
                "doc_id",
                r4(repetition_ratio("text", n=2)).alias("rep2"),
                r4(char_entropy("text")).alias("entropy")))


def q_asof_join(spark, sf):
    """As-of join (operators/asof.py — union+window single-shuffle design):
    each purchase event picks up the most recent at-or-before view event's
    value per user. Oracle: DuckDB's native ASOF LEFT JOIN."""
    from spork_spark.operators import asof_join
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    purchases = ev.filter(F.col("event_type") == "purchase") \
                  .select("event_id", "user_id", "ts")
    views = (ev.filter(F.col("event_type") == "view")
               .groupBy("user_id", "ts")
               .agg(F.max("value").alias("view_value")))
    out = asof_join(purchases, views, on="ts", by="user_id")
    return (out.select(
                "event_id", "user_id",
                F.unix_timestamp(F.col("ts").cast("timestamp")).alias("ts"),
                (F.floor(F.col("view_value_asof") * 100.0 + 0.5) / 100.0)
                .alias("view_value"))
               .orderBy("event_id"))


def q_range_join(spark, sf):
    """Range (interval-containment) join via bin-equi-join compilation
    (operators/asof.py range_join): orders priced into 25k-wide bands
    derived from nation keys; per-band count + sum. Oracle: plain BETWEEN
    join (which DuckDB executes natively as an IE join; Spark would plan a
    nested loop — the binning rewrite is the scale path)."""
    from spork_spark.operators import range_join
    eng = _eng(spark)
    orders = _t(eng, sf, "orders").df().select("o_orderkey", "o_totalprice")
    bands = _t(eng, sf, "nation").df().select(
        F.col("n_nationkey").alias("band"),
        (F.col("n_nationkey") * 25000.0).alias("lo"),
        (F.col("n_nationkey") * 25000.0 + 24999.99).alias("hi"))
    j = range_join(orders, bands, "o_totalprice", "lo", "hi",
                   bin_width=10000.0)
    return (j.groupBy("band")
             .agg(F.count("*").alias("n_orders"),
                  (F.floor(F.sum("o_totalprice") * 100.0 + 0.5) / 100.0)
                  .alias("total"))
             .orderBy("band"))


def q_pack_sequences(spark, sf):
    """Cross-document sequence packing (concat-and-chunk, documents cross
    sequence boundaries): 64-token sequences over 4 deterministic streams
    (doc_id % 4 here so the oracle can mirror routing; production default
    is xxhash64). Declarative two-shuffle plan — window running offsets +
    segment explode + (stream, seq) regroup (operators/text.py)."""
    from spork_spark.operators import pack_sequences
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df() \
        .withColumn("st", (F.col("doc_id") % 4).cast("int"))
    out = pack_sequences(docs, seq_len=64, stream_col="st")
    return (out.select("stream", "seq_idx", "n_tokens",
                       F.length("seq_text").alias("n_chars"))
               .orderBy("stream", "seq_idx"))


def q_group_apply(spark, sf):
    """apply_per_group (groupBy().applyInPandas — the Arrow-batched escape
    hatch for inner plans HOFs can't express, SURVEY.md §2.3 fallback):
    per-flag quantity-weighted average price. Deterministic arithmetic →
    exact oracle."""
    eng = _eng(spark)
    # Project the three columns wavg reads BEFORE the group-apply (guide
    # §4.1: applyInPandas ships every selected column of every row across
    # the groupBy exchange AND the Arrow boundary; the bare table would
    # ship all 16 lineitem columns for a function that touches 3).
    li = _t(eng, sf, "lineitem").foreach(
        col("l_returnflag").alias("l_returnflag"),
        col("l_extendedprice").alias("l_extendedprice"),
        col("l_quantity").alias("l_quantity"))

    def wavg(key, pdf):
        import pandas as pd
        num = float((pdf["l_extendedprice"] * pdf["l_quantity"]).sum())
        den = float(pdf["l_quantity"].sum())
        import math
        val = math.floor(num / den * 100.0 + 0.5) / 100.0
        return pd.DataFrame({"l_returnflag": [key[0]], "wavg": [val]})

    return (li.apply_per_group([col("l_returnflag")], wavg,
                               "l_returnflag string, wavg double")
              .order_by(col("l_returnflag"))).df()


def q_window_ranks(spark, sf):
    """Ranking-window breadth (SURVEY.md §2.6): percent_rank, cume_dist,
    row_number per customer over the order timeline — the remaining SQL
    ranking family beyond rank/dense_rank/ntile. Deterministic total
    order via the unique orderkey tiebreak."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    ob = [(col("o_orderdate"), True), (col("o_orderkey"), True)]
    pr = E.WindowFunc("percent_rank", [], [col("o_custkey")], ob)
    cd = E.WindowFunc("cume_dist", [], [col("o_custkey")], ob)
    rn = E.WindowFunc("row_number", [], [col("o_custkey")], ob)
    from pyspark.sql import functions as F
    df = (orders.foreach(col("o_custkey").alias("o_custkey"),
                         col("o_orderkey").alias("o_orderkey"),
                         E.Aliased(pr, "pr"), E.Aliased(cd, "cd"),
                         E.Aliased(rn, "rn"))
                .order_by(col("o_custkey"), col("o_orderkey"))).df()
    return df.select("o_custkey", "o_orderkey",
                     F.round("pr", 6).alias("pr"),
                     F.round("cd", 6).alias("cd"),
                     F.col("rn").cast("long").alias("rn"))


def q_window_frames(spark, sf):
    """Window frames (SURVEY.md §2.6 extension surface): per-customer
    running total (unbounded preceding) and 3-row moving average over the
    order timeline."""
    eng = _eng(spark)
    orders = _t(eng, sf, "orders")
    ob = [(col("o_orderdate"), True), (col("o_orderkey"), True)]
    run = E.WindowFunc("sum", [col("o_totalprice")], [col("o_custkey")],
                       ob, frame=("rows", None, 0))
    mov = E.WindowFunc("avg", [col("o_totalprice")], [col("o_custkey")],
                       ob, frame=("rows", -2, 0))
    return (orders.foreach(col("o_custkey").alias("o_custkey"),
                           col("o_orderkey").alias("o_orderkey"),
                           _r2(run).alias("running"),
                           _r2(mov).alias("moving3"))
                  .order_by(col("o_custkey"), col("o_orderkey"))).df()


def q_cube_grouping(spark, sf):
    """CUBE with GROUPING_ID: distinguishes grouping-set null-fill from
    real null dimension values (extension over CubeDimensions)."""
    eng = _eng(spark)
    li = _t(eng, sf, "lineitem")
    return (li.cube(col("l_returnflag"), col("l_linestatus"))
              .foreach(col("group").get("l_returnflag").alias("l_returnflag"),
                       col("group").get("l_linestatus").alias("l_linestatus"),
                       fn("GROUPING_ID").cast("int").alias("gid"),
                       fn("COUNT_STAR").alias("cnt"))
              .order_by(col("gid"), col("l_returnflag"),
                        col("l_linestatus"))).df()


def q_bucketed_join(spark, sf):
    """Bucketed STORE + co-located merge join (POMergeJoin's pre-sorted
    inputs, SURVEY.md §2.1 #13 scale path): both sides written bucketed+
    sorted on the key, re-read from the catalog, joined with zero
    exchanges (elision pinned in tests). External table locations under
    tmp; oracle = the plain join."""
    import os
    import tempfile

    eng = _eng(spark)
    base = _tmp_path("spork_buck", sf)
    cust = _t(eng, sf, "customer").df().select("c_custkey", "c_nationkey")
    orders = _t(eng, sf, "orders").df().select("o_custkey", "o_totalprice")
    for name, df, key in [("spork_bc", cust, "c_custkey"),
                          ("spork_bo", orders, "o_custkey")]:
        (df.write.format("parquet").mode("overwrite")
           .option("path", os.path.join(base, name))
           .bucketBy(8, key).sortBy(key).saveAsTable(name))
    bc = spark.table("spork_bc")
    bo = spark.table("spork_bo")
    j = bc.join(bo, bc.c_custkey == bo.o_custkey)
    return (j.groupBy("c_nationkey")
             .agg(F.count("*").alias("n_orders"),
                  (F.floor(F.sum("o_totalprice") * 100.0 + 0.5) / 100.0)
                  .alias("total"))
             .orderBy("c_nationkey"))


def q_events_json_struct(spark, sf):
    """Typed JSON parsing (from_json → struct, the JsonLoader-with-schema
    surface applied to a column): parse events.props into a struct and
    aggregate on its fields."""
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df()
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k int").alias("p"))
    return (parsed.groupBy("event_type",
                           (F.col("p.k") % 10).alias("kmod"))
                  .agg(F.count("*").alias("n"),
                       F.sum("p.k").alias("sum_k"))
                  .orderBy("event_type", "kmod"))


def q_stratified_sample(spark, sf):
    """Deterministic stratified downsampling: keep 75% of English docs,
    25% of the rest, by md5-prefix threshold per stratum — rerunnable at
    any scale, exact oracle (operators/text.py stratified_sample)."""
    from spork_spark.operators import stratified_sample
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    kept = stratified_sample(docs, "lang", {"en": 0.75},
                             key_col="doc_id", default_rate=0.25)
    return (kept.groupBy("lang").agg(F.count("*").alias("n_docs"))
                .orderBy("lang"))


def q_partition_by_custom(spark, sf):
    """GROUP … PARTITION BY <class> (SURVEY.md §2.1 clause table): a
    REGISTERED Python placement function (Engine.register_partitioner, the
    Hadoop Partitioner.getPartition contract) decides which partition each
    group lands in via rdd.partitionBy — the one documented RDD escape.
    Results are placement-invariant, so the oracle is the plain GROUP BY;
    tests/test_partitioner.py pins that spark_partition_id() == fn(key)%n."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    eng.register_partitioner("com.example.ModPartitioner",
                             lambda k: int(k) % 7)
    rels = run_script(eng, f"""
        o = LOAD '{sf}/orders.parquet';
        g = GROUP o BY o_custkey PARTITION BY com.example.ModPartitioner
            PARALLEL 8;
        agg = FOREACH g GENERATE group AS custkey, COUNT_STAR(o) AS n,
                                 MAX(o.o_totalprice) AS max_price;
        srt = ORDER agg BY custkey;
    """)
    return rels["srt"].df()


def q_collected_group(spark, sf):
    """GROUP … USING 'collected' (map-side group when the loader
    guarantees collocation — perf-only variant, SURVEY.md §2.1 clause
    table): identical semantics to plain GROUP, through the parser."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        li = LOAD '{sf}/lineitem.parquet';
        g = GROUP li BY l_linenumber USING 'collected';
        agg = FOREACH g GENERATE group AS l_linenumber,
                                 COUNT(li) AS cnt,
                                 SUM(li.l_quantity) AS qty;
        srt = ORDER agg BY l_linenumber;
    """)
    return rels["srt"].df()


def q_schema_merge(spark, sf):
    """Schema evolution across files (the 100 TB reality: a column added
    mid-corpus): two parquet drops with different columns read as one
    relation via mergeSchema — missing columns null-fill (Pig's
    mismatched-UNION semantics applied at the storage layer)."""
    import os
    import tempfile

    from spork_spark.sources import read, write
    eng = _eng(spark)
    nation = _t(eng, sf, "nation").df()
    base = _tmp_path("spork_merge", sf)
    old = nation.filter(F.col("n_nationkey") < 12) \
                .select("n_nationkey", "n_name")
    new = nation.filter(F.col("n_nationkey") >= 12) \
                .select("n_nationkey", "n_name", "n_regionkey")
    write(old, os.path.join(base, "part=a"), fmt="parquet")
    write(new, os.path.join(base, "part=b"), fmt="parquet")
    merged = read(spark, base, fmt="parquet",
                  options={"mergeSchema": "true", "recursiveFileLookup": "false"})
    return (merged.select("n_nationkey", "n_name", "n_regionkey")
                  .orderBy("n_nationkey"))


def q_cogroup_3way(spark, sf):
    """N-ary COGROUP (3 inputs): nation/customer/supplier grouped by
    nation key — per-group bag sizes, absent groups empty (not null),
    through the parser."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        n = LOAD '{sf}/nation.parquet';
        c = LOAD '{sf}/customer.parquet';
        s = LOAD '{sf}/supplier.parquet';
        cg = COGROUP n BY n_nationkey, c BY c_nationkey, s BY s_nationkey;
        f = FOREACH cg GENERATE group AS nationkey, SIZE(n) AS n_n,
                                SIZE(c) AS n_c, SIZE(s) AS n_s;
        srt = ORDER f BY nationkey;
    """)
    return rels["srt"].df()


def q_join_right(spark, sf):
    """RIGHT OUTER join through the parser (SURVEY.md §2.1 #10):
    big orders RIGHT OUTER customer — every customer survives."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        o = LOAD '{sf}/orders.parquet';
        c = LOAD '{sf}/customer.parquet';
        big = FILTER o BY o_totalprice > 250000.0;
        j = JOIN big BY o_custkey RIGHT OUTER, c BY c_custkey;
        g = GROUP j BY c_custkey;
        f = FOREACH g GENERATE group AS c_custkey,
                                COUNT(j.o_orderkey) AS n_big;
        srt = ORDER f BY c_custkey;
    """)
    return rels["srt"].df()


def q_join_full(spark, sf):
    """FULL OUTER join through the parser: two disjoint-ish order slices
    joined on custkey — both unmatched sides null-fill."""
    from spork_spark.parser import run_script
    eng = _eng(spark)
    rels = run_script(eng, f"""
        o = LOAD '{sf}/orders.parquet';
        a0 = FILTER o BY o_totalprice > 400000.0;
        b0 = FILTER o BY o_totalprice < 1500.0;
        a = FOREACH a0 GENERATE o_custkey AS ak, o_orderkey AS aid;
        b = FOREACH b0 GENERATE o_custkey AS bk, o_orderkey AS bid;
        j = JOIN a BY ak FULL OUTER, b BY bk;
        f = FOREACH j GENERATE ak, aid, bk, bid;
        srt = ORDER f BY aid, bid;
    """)
    return rels["srt"].df()


# ---------------------------------------------------------------------------
# corpus-curation extensions, round 4 (operators/curation.py)
# ---------------------------------------------------------------------------

def q_per_source_cap(spark, sf):
    """Per-domain document cap (Common-Crawl-pipeline guard): keep ≤5 docs
    per source, preferring longest then smallest id. WindowGroupLimit
    pushes the cap below the shuffle (plan pinned in test_curation.py)."""
    from spork_spark.operators import per_source_cap
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (per_source_cap(docs, cap=5, priority_col="n_chars")
            .select("doc_id", "source", "n_chars")
            .orderBy("doc_id"))


def q_blocklist_filter(spark, sf):
    """Blocklist filtering: drop blocked sources via a broadcast anti-join
    — the corpus side never shuffles (plan pinned in test_curation.py)."""
    from spork_spark.operators import blocklist_filter
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return (blocklist_filter(docs, ["src0", "src3", "src11"])
            .select("doc_id", "source", "lang")
            .orderBy("doc_id"))


def q_classifier_score(spark, sf):
    """fastText-shaped hashed-bigram linear quality classifier: tokenize →
    bigrams (with multiplicity) → 16-bit md5 hashing trick → INTEGER
    weight per bucket (bucket % 997 - 498) → exact BIGINT score. Pure
    HOFs, no shuffle, no Python; integer weights make the score exactly
    SQL-reproducible (float weights would drift by summation order)."""
    from spork_spark.operators import classifier_score
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    # Sort-first: same rows/order (unique key, narrow projection); the
    # ORDER-BY-on-top variant pays the range-bounds sampling pass twice
    # and runs the hash kernel in the scan's single task (see
    # q_text_signals; OPTIMIZATION_r10.md).
    return classifier_score(docs.orderBy("doc_id"))


def q_corpus_stats(spark, sf):
    """Per-(lang, source) dataset-card report: doc count, total/avg chars,
    total tokens, short-doc count — one partial+final HashAggregate."""
    from spork_spark.operators import corpus_stats
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return corpus_stats(docs).orderBy("lang", "source")


def q_kmeans(spark, sf):
    """Deterministic integer-quantized Lloyd's k-means (k=4, 2 rounds,
    seeds = vectors of the 4 smallest ids): assignment is a narrow map
    against the broadcast centroid literal; the update shuffles k·dim
    partial sums, not the corpus. Exact integer arithmetic end-to-end —
    the oracle replays both rounds in SQL and must match bit-for-bit."""
    from spork_spark.operators import kmeans_quantized
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    return kmeans_quantized(emb, k=4, n_iter=2).orderBy("vec_id")


def q_semantic_dedup(spark, sf):
    """SemDeDup (cluster → intra-cluster cosine prune): drop any vector
    whose cosine to an earlier same-cluster vector ≥ 0.45. The pair
    space is quadratic only within a cluster; the cosine test is exact
    integer arithmetic on quantized codes (dot² ≥ τ²·|a|²·|b|² in
    decimal128), so survivors are deterministic and SQL-checkable."""
    from spork_spark.operators import semantic_dedup
    eng = _eng(spark)
    emb = _t(eng, sf, "embeddings").df()
    return _iso_sort(
        semantic_dedup(emb, threshold=0.45, k=4, n_iter=2)
        .select("vec_id", "label"), "vec_id")


def q_ngram_logcount(spark, sf):
    """Corpus-LM statistical scorer (KenLM-filter shape, integer-exact):
    corpus bigram counts → per-doc Σ floor(log2(count)). Three shuffles
    (gram count, gram join, doc agg), all key-partitioned; docs with no
    bigram have no score row (inner join) — the oracle filters the
    same way."""
    from spork_spark.operators import ngram_logcount_score
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return ngram_logcount_score(docs).orderBy("doc_id")


def q_streaming_dedup(spark, sf):
    """streaming_dedup (ingest replay guard): batch path here (exact
    oracle = DISTINCT over the key projection — keys-only projection
    makes the kept row deterministic); the streaming path
    (dropDuplicatesWithinWatermark, bounded state) is pinned by the
    batch/stream parity test in test_streaming.py."""
    from spork_spark.streaming import streaming_dedup
    eng = _eng(spark)
    ev = _t(eng, sf, "events").df().select("user_id", "event_type", "ts")
    return (streaming_dedup(ev, ["user_id", "event_type"], "ts")
            .select("user_id", "event_type")
            .orderBy("user_id", "event_type"))


def q_stream_upsert(spark, sf):
    """Streaming CDC apply (streaming/__init__.py stream_upsert_parquet):
    a change stream MERGEs into a parquet snapshot per micro-batch via
    foreachBatch + merge_upsert — snapshot never shuffles (batch keys
    broadcast into one anti-join), atomic directory-rename publish,
    exactly-once per batch via the checkpoint. Both change waves land in
    one source fileset, so within-batch resolution picks the max-version
    row deterministically; the oracle replays the merge as
    anti-join ∪ window-winner SQL."""
    from spork_spark.streaming import stream_upsert_parquet
    eng = _eng(spark)
    orders = _t(eng, sf, "orders").df()
    base = (orders.filter(F.col("o_orderkey") % 3 == 0)
                  .select(F.col("o_orderkey").alias("id"),
                          F.col("o_custkey").cast("long").alias("val"),
                          F.lit(0).cast("long").alias("ver")))
    ch1 = (orders.filter(F.col("o_orderkey") % 4 == 0)
                 .select(F.col("o_orderkey").alias("id"),
                         (F.col("o_custkey") + 1000000).cast("long")
                         .alias("val"),
                         F.lit(1).cast("long").alias("ver")))
    ch2 = (orders.filter(F.col("o_orderkey") % 8 == 0)
                 .select(F.col("o_orderkey").alias("id"),
                         (F.col("o_custkey") + 2000000).cast("long")
                         .alias("val"),
                         F.lit(2).cast("long").alias("ver")))
    snap = _tmp_path("stream_upsert_snap", sf)
    src = _tmp_path("stream_upsert_src", sf)
    ck = _tmp_path("stream_upsert_ck", sf)
    base.write.mode("overwrite").parquet(snap)
    ch1.unionByName(ch2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(base.schema).parquet(src)
    stream_upsert_parquet(stream, snap, ["id"], ck, version_col="ver")
    return spark.read.parquet(snap).orderBy("id")


def q_snapshot_diff(spark, sf):
    """CDC between two snapshot versions (operators/diff.py
    snapshot_diff): old = customers < 1200, new = customers > 300 with
    mktsegment starred for custkey % 7 == 0 — yields all three change
    classes. ONE full-outer sort-merge join on the key; unchanged keys
    (the bulk) are dropped. Oracle = the same FULL OUTER JOIN with
    IS NOT DISTINCT FROM null-safe compares."""
    from spork_spark.operators import snapshot_diff
    eng = _eng(spark)
    cust = _t(eng, sf, "customer").df()
    old = (cust.filter(F.col("c_custkey") < 1200)
               .select("c_custkey", "c_mktsegment", "c_acctbal"))
    new = (cust.filter(F.col("c_custkey") > 300)
               .select(
                   "c_custkey",
                   F.when(F.col("c_custkey") % 7 == 0,
                          F.concat(F.col("c_mktsegment"), F.lit("*")))
                    .otherwise(F.col("c_mktsegment"))
                    .alias("c_mktsegment"),
                   "c_acctbal"))
    return snapshot_diff(old, new, ["c_custkey"]).orderBy("c_custkey")


def q_fingerprint_table(spark, sf):
    """Merkle-leaf table checksum (operators/diff.py table_fingerprint):
    orders reduced to 64 order-insensitive (n_rows, sum, xor) digest
    buckets — the anti-entropy exchange that compares two 100 TB copies
    with KB of traffic. md5-based 60-bit digests are engine-portable, so
    the oracle recomputes them bit-for-bit in DuckDB; sum folds in
    DECIMAL(38,0) (exact), xor in BIGINT. One map-side-combined hash
    aggregate; the shuffle carries <=64 rows per task."""
    from spork_spark.operators import table_fingerprint
    eng = _eng(spark)
    orders = _t(eng, sf, "orders").df()
    return table_fingerprint(
        orders,
        cols=["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"],
        num_buckets=64) \
        .withColumn("sum_digest", F.col("sum_digest").cast("string"))
    # ^ driver-facing projection: decimal(38,0) digit string — sums of
    #   60-bit digests exceed double precision, so unlike the rollup
    #   sums this one must stay exact as text (both engines render
    #   decimal->string as plain digits).


def q_leakage_safe_split(spark, sf):
    """Leakage-safe train/valid/test split (operators/splits.py): docs
    sharing a 40-char text prefix are near-dup pairs; connected
    components close the relation transitively; every cluster hashes as
    ONE unit (md5 of its min-id representative), so no near-duplicate
    ever straddles a split boundary. The oracle replays pairs +
    recursive-CTE components + the identical md5 bucket arithmetic."""
    from spork_spark.operators import leakage_safe_split
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    pref = (docs.where(F.col("text").isNotNull())
                .select("doc_id", F.substring("text", 1, 40).alias("__p")))
    a = pref.select(F.col("doc_id").alias("id_a"), "__p")
    b = pref.select(F.col("doc_id").alias("id_b"), "__p")
    pairs = (a.join(b, on="__p")
              .where(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b"))
    out = leakage_safe_split(docs, "doc_id", pairs,
                             splits=[("train", 80), ("valid", 10),
                                     ("test", 10)],
                             salt="r5")
    return out.select("doc_id", "split").orderBy("doc_id")


def q_k_anonymity(spark, sf):
    """k-anonymity audit (operators/dq.py k_anonymity): customer
    quasi-identifier combinations (nation, market segment) with fewer
    than 8 members re-identify their members — the indirect-identifier
    privacy gate next to scrub_pii's direct-identifier scrub. ONE
    map-combined groupBy; the corpus crosses the wire as group counts."""
    from spork_spark.operators import k_anonymity
    eng = _eng(spark)
    cust = _t(eng, sf, "customer").df()
    return k_anonymity(cust, ["c_nationkey", "c_mktsegment"], k=8)


def q_compaction_plan(spark, sf):
    """Small-file compaction planning (operators/layout.py
    compaction_plan): a (source, lang) file inventory with char-count
    sizes, next-fit-grouped by exclusive prefix sum into 20 kB target
    jobs. Exact integer window arithmetic — the oracle is one SQL
    window function. The inventory is metadata (one row per file), so
    the single global window is the same centralized planning every
    lakehouse OPTIMIZE does."""
    from spork_spark.operators import compaction_plan
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    inv = (docs.groupBy(
               F.concat_ws("/", F.col("source"), F.col("lang"))
                .alias("path"))
               .agg(F.sum(F.length("text")).alias("size_bytes")))
    return (compaction_plan(inv, "size_bytes", target_bytes=20000,
                            order_cols=["path"])
            .orderBy("path"))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_containment(spark, sf):
    """Directed containment near-dup pairs (operators/dedup.py
    containment_pairs): |S(a) ∩ S(b)| / |S(a)| over 8-gram shingles —
    the asymmetric quote/subset duplication Jaccard structurally
    misses. Inverted-index join (Σ df² over the capped vocabulary),
    never all-pairs; exact duplicates pre-collapse through the shared
    _exact_text_groups machinery.

    The informative-shingle cap is CORPUS-RELATIVE — df ≤ max(50,
    10% of docs) — because an absolute cap does not transfer across
    corpus sizes (a shared shingle's df grows linearly with the
    corpus, so a fixed cap that works at 500 docs blacks out the
    same duplication structure at 5,000; measured 2,721 → 0 pairs
    before this was made relative). The cap is computed INSIDE the
    plan (max_df_frac: 1-row count aggregate broadcast — r7 advisor:
    no eager action at query-construction time); the oracle replays
    it as a scalar subquery."""
    from spork_spark.operators import containment_pairs
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    return _iso_sort(
        containment_pairs(docs, "doc_id", "text", n=8, threshold=0.6,
                          max_df_frac=0.1, max_df_floor=50),
        "id_a", "id_b")


def q_shard_plan(spark, sf):
    """Training-export shard manifest (operators/layout.py shard_plan):
    documents in reproducible md5(seed:id) shuffle order, next-fit cut
    into 2000-token shards by the range-partitioned two-pass exclusive
    prefix sum (no fence — the input is the corpus, so a single-task
    window is never safe), then one groupBy for the per-shard manifest.
    The oracle replays the whole plan with one SQL window function."""
    from spork_spark.operators import shard_plan
    from spork_spark.operators.text import token_count as _tc
    eng = _eng(spark)
    docs = _t(eng, sf, "documents").df()
    d = (docs.where(F.col("text").isNotNull())
             .withColumn("__tok", _tc("text")))
    plan = shard_plan(d, "doc_id", "__tok", tokens_per_shard=2000, seed=7)
    return (plan.groupBy("shard_id")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("__tok").alias("n_tokens"))
                .orderBy("shard_id"))


def q_shard_plan_incremental(spark, sf):
    """Append-only export extension (operators/layout.py
    shard_plan_incremental): a new batch (doc_id % 5 == 0) joins an
    already-shipped export (the other docs' shard_plan manifest) —
    the running token total continues from the manifest's one-row
    aggregate, so shipped shards stay immutable and the part-filled
    last shard tops up first. History cost is manifest-sized; the
    batch pays the same two-pass prefix sum as shard_plan."""
    from spork_spark.operators import shard_plan, shard_plan_incremental
    from spork_spark.operators.text import token_count as _tc
    eng = _eng(spark)
    docs = (_t(eng, sf, "documents").df()
            .where(F.col("text").isNotNull())
            .withColumn("__tok", _tc("text")))
    old = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    manifest = (shard_plan(old, "doc_id", "__tok", 2000, seed=7)
                .groupBy("shard_id")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("__tok").alias("n_tokens")))
    inc = shard_plan_incremental(batch, manifest, "doc_id", "__tok",
                                 2000, seed=7)
    return (inc.groupBy("shard_id")
               .agg(F.count(F.lit(1)).alias("n_docs"),
                    F.sum("__tok").alias("n_tokens"))
               .orderBy("shard_id"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Order is the driver-gate sampling order: the per-round
        # correctness gate checks the FIRST 50 insertion keys, so
        # never-yet-driver-checked queries lead (rotated each round).
        # entry() calls q_agg_q1 directly; nothing reads this order
        # except the gate and the sweeps, which cover all keys.
        # --- never driver-checked (r10 rotation: 50 of the final 54
        #     oracled keys; CORRECTNESS_r01-r09 cover the other 159
        #     registry keys. The held-back 4 + the 2 rows-only RNG
        #     queries are the r11 tail, below.)
        "corpus_pipeline": q_corpus_pipeline,
        "per_source_cap": q_per_source_cap,
        "blocklist_filter": q_blocklist_filter,
        "classifier_score": q_classifier_score,
        "corpus_stats": q_corpus_stats,
        "ngram_logcount": q_ngram_logcount,
        "snapshot_diff": q_snapshot_diff,
        "fingerprint_table": q_fingerprint_table,
        "leakage_safe_split": q_leakage_safe_split,
        "compaction_plan": q_compaction_plan,
        "profile_events": q_profile_events,
        "weighted_sample": q_weighted_sample,
        "outliers": q_outliers,
        "sessionize": q_sessionize,
        "rollup_incremental": q_rollup_incremental,
        "pmi": q_pmi,
        "winsorize_events": q_winsorize,
        "histogram_events": q_histogram,
        "group_ols": q_group_ols,
        "covisitation": q_covisitation,
        "theil_sen": q_theil_sen,
        "timeseries_report": q_timeseries_report,
        "keywords": q_keywords,
        "conversion_times": q_conversion_times,
        "anomaly_days": q_anomaly_days,
        "rfm": q_rfm,
        "abc_suppliers": q_abc_suppliers,
        "growth": q_growth,
        "group_gini": q_group_gini,
        "group_mad": q_group_mad,
        "group_mode": q_group_mode,
        "item_cooccurrence": q_item_cooccurrence,
        "ohlc": q_ohlc,
        "twap": q_twap,
        "rolling_sum": q_rolling_sum,
        "cc_incremental": q_cc_incremental,
        "transitions": q_transitions,
        "dq_events": q_dq,
        "dq_embeddings": q_dq_embeddings,
        "asof_nearest": q_asof_nearest,
        "pivot_events": q_pivot_events,
        "unpivot_events": q_unpivot_events,
        "cohort": q_cohort,
        "partitioned_pruning": q_partitioned_pruning,
        "range_join": q_range_join,
        "window_frames": q_window_frames,
        "window_ranks": q_window_ranks,
        "cube_grouping": q_cube_grouping,
        "bucketed_join": q_bucketed_join,
        "cogroup_3way": q_cogroup_3way,
        # --- r11 tail: the last never-driver-checked keys (4 oracled
        #     held out of the r10 first-50 + the 2 rows-only RNG
        #     queries, which carry no oracle by design)
        "events_json_struct": q_events_json_struct,
        "stratified_sample": q_stratified_sample,
        "consistent_sample": q_consistent_sample,
        "benford": q_benford,
        "sample": q_sample,
        "unique_id": q_unique_id,
        # --- driver-checked green in r9 (CORRECTNESS_r09: 50/50)
        "quantize_embeddings": q_quantize_embeddings,
        "jl_sketch": q_jl_sketch,
        "multimodal_features": q_multimodal_features,
        "pigstorage_roundtrip": q_pigstorage_roundtrip,
        "json_roundtrip": q_json_roundtrip,
        "orc_roundtrip": q_orc_roundtrip,
        "text_loader": q_text_loader,
        "macro_params_script": q_macro_params_script,
        "udf_python": q_udf_python,
        "stream_through": q_stream_through,
        "rank_by": q_rank_by,
        "rank_dense": q_rank_dense,
        "join_merge": q_join_merge,
        "join_merge_sparse": q_join_merge_sparse,
        "join_skewed": q_join_skewed,
        "join_right": q_join_right,
        "skew_salted": q_skew_salted,
        "regex_funcs": q_regex_funcs,
        "string_funcs2": q_string_funcs2,
        "datetime_funcs2": q_datetime_funcs2,
        "bag_string": q_bag_string,
        "tuple_construct": q_tuple_construct,
        "map_funcs": q_map_funcs,
        "diff_bags": q_diff_bags,
        "pluck": q_pluck,
        "strsplittobag": q_strsplittobag,
        "assert_op": q_assert_op,
        "bloom_join": q_bloom_join,
        "stats_agg": q_stats_agg,
        "top_n": q_top_n,
        "events_sliding": q_events_sliding,
        "events_interval_join": q_events_interval_join,
        "time_rollup": q_time_rollup,
        "resample_mixture": q_resample_mixture,
        "dedup_lines": q_dedup_lines,
        "trending": q_trending,
        "inverted_index": q_inverted_index,
        "multimodal_decode_pnm": q_multimodal_decode_pnm,
        "multimodal_resize": q_multimodal_resize,
        "stream_dedup": q_streaming_dedup,
        "stream_upsert": q_stream_upsert,
        "merge_upsert": q_merge_upsert,
        "scd2": q_scd2,
        "funnel": q_funnel,
        "gap_fill": q_gap_fill,
        "ewma": q_ewma,
        "k_anonymity": q_k_anonymity,
        "chi2_lang_source": q_chi2,
        "partition_by_custom": q_partition_by_custom,
        "schema_merge": q_schema_merge,
        # --- driver-checked green in r8
        "containment": q_containment,
        "shard_plan": q_shard_plan,
        "shard_plan_incremental": q_shard_plan_incremental,
        "equifreq_bins": q_equifreq_bins,
        "setsim_pairs": q_setsim_pairs,
        "similarity_ivf_trained": q_similarity_ivf_trained,
        "pareto": q_pareto,
        "bm25": q_bm25,
        "heavy_hitters": q_heavy_hitters,
        "zorder": q_zorder,
        "asof_join": q_asof_join,
        "group_apply": q_group_apply,
        "collected_group": q_collected_group,
        "join_full": q_join_full,
        "pagerank": q_pagerank,
        "shortest_paths": q_shortest_paths,
        "label_spreading": q_label_spreading,
        "weighted_paths": q_weighted_paths,
        "dedup_incremental": q_dedup_incremental,
        "dedup_index_roundtrip": q_dedup_index_roundtrip,
        "dedup_incremental_clusters": q_dedup_incremental_clusters,
        "dedup_embedding": q_dedup_embedding,
        "sorted_neighborhood": q_sorted_neighborhood,
        "fuzzy_pairs": q_fuzzy_pairs,
        "similarity_ivf": q_similarity_ivf,
        "embedding_covariance": q_embedding_covariance,
        "semantic_dedup": q_semantic_dedup,
        "kmeans": q_kmeans,
        "hard_negatives": q_hard_negatives,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_audio": q_multimodal_audio,
        "multimodal_phash": q_multimodal_phash,
        "multimodal_near_dedup": q_multimodal_near_dedup,
        "multimodal_frames": q_multimodal_frames,
        "gopher_filter": q_gopher_filter,
        "scrub_pii": q_scrub_pii,
        "token_count": q_token_count,
        "normalize_text": q_normalize_text,
        "decontaminate": q_decontaminate,
        "chunk_documents": q_chunk_documents,
        "pack_sequences": q_pack_sequences,
        "text_signals": q_text_signals,
        "boilerplate": q_boilerplate,
        "bigram_lm": q_bigram_lm,
        "sketch_distinct": q_sketch_distinct,
        "sketch_quantiles": q_sketch_quantiles,
        # --- driver-checked green in r1-r7
        "agg_q1": q_agg_q1,
        "join_3way": q_join_3way,
        "filter_expr": q_filter_expr,
        "orderby_limit": q_orderby_limit,
        "distinct": q_distinct,
        "union_all": q_union_all,
        "union_distinct": q_union_distinct,
        "pigmix_distinct_agg": q_pigmix_distinct_agg,
        "pigmix_wide_group": q_pigmix_wide_group,
        "pigmix_map_access": q_pigmix_map_access,
        "pigmix_fanout_join": q_pigmix_fanout_join,
        "pigmix_anti_cogroup": q_pigmix_anti_cogroup,
        "pigmix_nested_split": q_pigmix_nested_split,
        "pigmix_total_sort": q_pigmix_total_sort,
        "pigmix_nested_sort": q_pigmix_nested_sort,
        "pigmix_multistore": q_pigmix_multistore,
        "union_onschema": q_union_onschema,
        "split": q_split,
        "cross": q_cross,
        "cogroup": q_cogroup,
        "join_left": q_join_left,
        "join_semi": q_join_semi,
        "join_anti": q_join_anti,
        "join_replicated": q_join_replicated,
        "group_all": q_group_all,
        "rank_window": q_rank_window,
        "cube": q_cube,
        "cube_mixed": q_cube_mixed,
        "sample_deterministic": q_sample_deterministic,
        "range_proj": q_range_proj,
        "rollup": q_rollup,
        "flatten_wordcount": q_flatten_wordcount,
        "flatten_join": q_flatten_join,
        "string_funcs": q_string_funcs,
        "math_funcs": q_math_funcs,
        "datetime_funcs": q_datetime_funcs,
        "int_division": q_int_division,
        "events_session": q_events_session,
        "events_json": q_events_json,
        "percentiles": q_percentiles,
        "window_lag": q_window_lag,
        "pig_script": q_pig_script,
        "nested_foreach": q_nested_foreach,
        "nested_cross": q_nested_cross,
        "udaf_custom": q_udaf_custom,
        "scalar_of_relation": q_scalar_of_relation,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash": q_dedup_minhash,
        "dedup_spans": q_dedup_spans,
        "triangles": q_triangles,
        "connected_components": q_connected_components,
        "dedup_near_full": q_dedup_near_full,
        "dedup_simhash": q_dedup_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "similarity_bruteforce": q_similarity_bruteforce,
        "similarity_lsh": q_similarity_lsh,
        "text_quality": q_text_quality,
        "lang_id": q_lang_id,
        "fingerprint": q_fingerprint,
        "tfidf": q_tfidf,
        "events_tumbling": q_events_tumbling,
        "events_session_window": q_events_session_window,
    }


def _sql_dot(vec: str, other: str) -> str:
    """Dot product with DuckDB's left-to-right list_reduce — matches
    Spark's aggregate() fold order bit-for-bit ((0+p1)+p2+… ≡ (p1+p2)+…
    since 0.0+x is exact)."""
    return (f"list_reduce(list_transform(list_zip({vec}, {other}), "
            f"x -> x[1]*x[2]), (a,b) -> a+b)")


def _sql_norm(vec: str) -> str:
    return (f"sqrt(list_reduce(list_transform({vec}, x -> x*x), "
            f"(a,b) -> a+b))")


def _sql_cos(a: str, b: str) -> str:
    return f"{_sql_dot(a, b)} / ({_sql_norm(a)} * {_sql_norm(b)})"


def _lsh_oracle_sql() -> str:
    """ANSI-SQL mirror of q_similarity_lsh. The SRP hyperplanes are
    seed-deterministic Python floats, embedded here as full-precision
    literals; dots/norms use DuckDB's left-to-right list_reduce, which
    matches Spark's aggregate() fold order bit-for-bit, and the query
    rounds scores before ranking — so buckets, candidates, scores, and
    ranks all reproduce exactly."""
    from spork_spark.operators.similarity import _hyperplanes
    bands, n_planes, dim, seed, k = 4, 10, 64, 42, 5

    dot, norm = _sql_dot, _sql_norm

    def plane_lit(ws: list) -> str:
        return "[" + ", ".join(repr(w) for w in ws) + "]::DOUBLE[]"

    def bucket(vec: str, planes: list) -> str:
        terms = [f"(CASE WHEN {dot(vec, plane_lit(p))} >= 0 "
                 f"THEN {1 << i} ELSE 0 END)"
                 for i, p in enumerate(planes)]
        return "(" + " + ".join(terms) + ")"

    tables = [_hyperplanes(dim, n_planes, seed + 101 * b)
              for b in range(bands)]
    cb_cols = ", ".join(f"{bucket('v', tables[b])} AS b{b}"
                        for b in range(bands))
    qb_cols = ", ".join(f"{bucket('qv', tables[b])} AS qb{b}"
                        for b in range(bands))
    unions = " UNION ALL ".join(
        f"SELECT cb.vec_id, qb.query_id FROM cb JOIN qb ON cb.b{b} = qb.qb{b}"
        for b in range(bands))
    return f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
              FROM embeddings WHERE vec_id < 3),
        cb AS (SELECT vec_id, v, {cb_cols} FROM c),
        qb AS (SELECT query_id, qv, {qb_cols} FROM q),
        cand AS (SELECT DISTINCT vec_id, query_id FROM ({unions}) u
                 WHERE vec_id <> query_id),
        scored AS (
          SELECT cand.query_id, cand.vec_id,
                 ROUND({dot('c.v', 'q.qv')} /
                       ({norm('c.v')} * {norm('q.qv')}), 6) AS score
          FROM cand
          JOIN c ON c.vec_id = cand.vec_id
          JOIN q ON q.query_id = cand.query_id),
        ranked AS (
          SELECT query_id, vec_id, score,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT query_id, vec_id, score, rank
        FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def _ivf_oracle_sql() -> str:
    """ANSI-SQL mirror of q_similarity_ivf. The coarse quantizer is
    training-free and deterministic (centroids = vectors of the 8 smallest
    ids), so cell assignment (argmax cosine, ties to the larger cell id —
    Spark's reverse(array_sort) order), the nprobe=3 probe set, and the
    round-before-rank scores all reproduce exactly."""
    n_centroids, nprobe, k, score_round = 8, 3, 5, 4
    cos = _sql_cos("t.v", "cent.cv")
    return f"""
        WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        cent AS (SELECT vec_id AS cell, v AS cv FROM c
                 ORDER BY vec_id LIMIT {n_centroids}),
        crank AS (
          SELECT t.vec_id, cent.cell,
                 row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY {cos} DESC, cent.cell DESC) AS rn
          FROM c t CROSS JOIN cent),
        cassign AS (SELECT vec_id, cell FROM crank WHERE rn = 1),
        q AS (SELECT vec_id, v FROM c WHERE vec_id < 3),
        qrank AS (
          SELECT t.vec_id AS query_id, cent.cell,
                 row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY {cos} DESC, cent.cell DESC) AS rn
          FROM q t CROSS JOIN cent),
        qprobe AS (SELECT query_id, cell FROM qrank WHERE rn <= {nprobe}),
        scored AS (
          SELECT qp.query_id, ca.vec_id,
                 ROUND({_sql_cos('cv2.v', 'qv2.v')}, {score_round}) AS score
          FROM cassign ca
          JOIN qprobe qp ON ca.cell = qp.cell
          JOIN c cv2 ON cv2.vec_id = ca.vec_id
          JOIN c qv2 ON qv2.vec_id = qp.query_id
          WHERE ca.vec_id <> qp.query_id),
        ranked AS (
          SELECT query_id, vec_id, score,
                 CAST(row_number() OVER (PARTITION BY query_id
                      ORDER BY score DESC, vec_id) AS INT) AS rank
          FROM scored)
        SELECT query_id, vec_id, score, rank
        FROM ranked WHERE rank <= {k} ORDER BY query_id, rank
    """


def _ivf_trained_oracle_sql() -> str:
    """ANSI-SQL replay of q_similarity_ivf_trained: the kmeans oracle
    recurrence (2 unrolled Lloyd rounds, integer arithmetic) produces
    the trained codebook c1 and corpus cells a1; queries rank cells by
    the same integer squared-L2 (ties to the smaller cid), probe the 2
    nearest, score by double cosine rounded to 4 — then recall@5 vs the
    brute-force top-5."""
    sqd = ("list_sum(list_transform(range(1, 65), i -> "
           "(t.qv[CAST(i AS INT)] - c1.cv[CAST(i AS INT)])"
           " * (t.qv[CAST(i AS INT)] - c1.cv[CAST(i AS INT)])))")
    cos_iv = _sql_cos("cv.v", "qv.v")
    cos_br = _sql_cos("c.v", "qs.v")
    return f"""
        WITH q AS (
          SELECT vec_id,
                 list_transform(embedding, x ->
                   CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                        AS BIGINT)) AS qv,
                 embedding::DOUBLE[] AS v
          FROM embeddings),
        c0 AS (
          SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                      AS BIGINT) AS cid, qv AS cv
          FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 4)),
        a0 AS (
          SELECT vec_id, cl FROM (
            SELECT q.vec_id, c0.cid AS cl,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY list_sum(list_transform(range(1, 65),
                       i -> (q.qv[CAST(i AS INT)]
                             - c0.cv[CAST(i AS INT)])
                            * (q.qv[CAST(i AS INT)]
                               - c0.cv[CAST(i AS INT)]))),
                       c0.cid) AS rn
            FROM q CROSS JOIN c0) WHERE rn = 1),
        e0 AS (
          SELECT a0.cl, d.i, q.qv[CAST(d.i AS INT)] AS v
          FROM a0 JOIN q USING (vec_id)
          CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d),
        c1 AS (
          SELECT cid, list(cv ORDER BY i) AS cv FROM (
            SELECT cl AS cid, i,
                   CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*))
                        AS BIGINT) AS cv
            FROM e0 GROUP BY cl, i)
          GROUP BY cid),
        a1 AS (
          SELECT vec_id, cl FROM (
            SELECT t.vec_id, c1.cid AS cl,
                   row_number() OVER (PARTITION BY t.vec_id
                     ORDER BY {sqd}, c1.cid) AS rn
            FROM q t CROSS JOIN c1) WHERE rn = 1),
        qset AS (SELECT vec_id AS query_id, qv, v FROM q
                 WHERE vec_id < 3),
        qrank AS (
          SELECT t.query_id, c1.cid,
                 row_number() OVER (PARTITION BY t.query_id
                   ORDER BY {sqd.replace('t.qv', 't.qv')}, c1.cid) AS rn
          FROM (SELECT query_id, qv FROM qset) t CROSS JOIN c1),
        qprobe AS (SELECT query_id, cid FROM qrank WHERE rn <= 2),
        iscored AS (
          SELECT qp.query_id, a1.vec_id,
                 ROUND({cos_iv}, 4) AS score
          FROM a1 JOIN qprobe qp ON a1.cl = qp.cid
          JOIN q cv ON cv.vec_id = a1.vec_id
          JOIN q qv ON qv.vec_id = qp.query_id
          WHERE a1.vec_id <> qp.query_id),
        ivfr AS (
          SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, vec_id) AS rnk
            FROM iscored) WHERE rnk <= 5),
        bscored AS (
          SELECT qs.query_id, c.vec_id, ROUND({cos_br}, 4) AS score
          FROM q c CROSS JOIN qset qs
          WHERE c.vec_id <> qs.query_id),
        bru AS (
          SELECT query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY score DESC, vec_id) AS rnk
            FROM bscored) WHERE rnk <= 5),
        h AS (
          SELECT query_id, COUNT(*) AS n
          FROM ivfr JOIN bru USING (query_id, vec_id)
          GROUP BY query_id)
        SELECT qs2.query_id,
               CAST(COALESCE(h.n, 0) AS INT) AS n_hits,
               ROUND(COALESCE(h.n, 0) / 5.0, 4) AS recall,
               COALESCE(h.n, 0) >= 3 AS meets_bound
        FROM (SELECT DISTINCT query_id FROM qset) qs2
        LEFT JOIN h USING (query_id)
        ORDER BY query_id
    """


def _zorder_oracle_sql(bits: int = 8) -> str:
    """Morton interleave of the two scaled columns a/b, replayed bit by
    bit — same arithmetic as operators/layout.py zorder_key."""
    terms = []
    for p in range(bits):
        terms.append(f"(((a >> {p}) & 1) << {2 * p})")
        terms.append(f"(((b >> {p}) & 1) << {2 * p + 1})")
    z = " | ".join(terms)
    m = (1 << bits) - 1
    return f"""
        WITH s AS (
          SELECT MIN(l_suppkey) mn1, MAX(l_suppkey) mx1,
                 MIN(l_partkey) mn2, MAX(l_partkey) mx2
          FROM lineitem),
        sc AS (
          SELECT l_suppkey, l_partkey,
                 CASE WHEN mx1 > mn1 THEN CAST(FLOOR(
                        (l_suppkey - mn1) * {m}.0 / (mx1 - mn1)) AS BIGINT)
                      ELSE 0 END AS a,
                 CASE WHEN mx2 > mn2 THEN CAST(FLOOR(
                        (l_partkey - mn2) * {m}.0 / (mx2 - mn2)) AS BIGINT)
                      ELSE 0 END AS b
          FROM lineitem CROSS JOIN s)
        SELECT l_suppkey, l_partkey, CAST({z} AS BIGINT) AS zkey
        FROM sc ORDER BY zkey, l_suppkey, l_partkey
    """


def oracle_sql() -> dict[str, str]:
    return {
        "similarity_lsh": _lsh_oracle_sql(),
        "similarity_ivf": _ivf_oracle_sql(),
        "similarity_ivf_trained": _ivf_trained_oracle_sql(),
        "zorder": _zorder_oracle_sql(),
        "agg_q1": """
            SELECT l_returnflag, l_linestatus,
                   FLOOR((SUM(l_quantity))*100 + 0.5)/100 AS sum_qty,
                   FLOOR((SUM(l_extendedprice))*100 + 0.5)/100 AS sum_base_price,
                   FLOOR((AVG(l_quantity))*100 + 0.5)/100 AS avg_qty,
                   FLOOR((AVG(l_discount))*100 + 0.5)/100 AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "join_3way": """
            SELECT n_name,
                   FLOOR((SUM(l_extendedprice))*100 + 0.5)/100 AS revenue,
                   COUNT(*) AS n_items
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "filter_expr": """
            SELECT o_orderkey,
                   FLOOR((o_totalprice * 0.9)*100 + 0.5)/100 AS discounted,
                   CASE WHEN o_totalprice > 200000.0
                        THEN 'big' ELSE 'small' END AS bucket
            FROM orders
            WHERE regexp_full_match(o_orderpriority, '[13]-.*')
              AND o_orderstatus IN ('F','P')
              AND o_totalprice > 1000.0
            ORDER BY o_orderkey
        """,
        "orderby_limit": """
            SELECT l_orderkey, l_linenumber, l_extendedprice
            FROM lineitem
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
            LIMIT 100
        """,
        "distinct": """
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        """,
        "union_all": """
            SELECT o_orderkey AS k, o_orderstatus AS st FROM orders
            WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey AS k, o_orderstatus AS st FROM orders
            WHERE o_totalprice > 100000.0
        """,
        "union_onschema": """
            SELECT o_orderkey AS k, o_totalprice AS price,
                   CAST(NULL AS VARCHAR) AS prio
            FROM orders WHERE o_orderstatus = 'F'
            UNION ALL
            SELECT o_orderkey AS k, CAST(NULL AS DOUBLE) AS price,
                   o_orderpriority AS prio
            FROM orders WHERE o_orderstatus = 'P'
        """,
        "split": """
            SELECT o_orderkey AS k, 'high' AS route FROM orders
            WHERE o_totalprice > 150000.0
            UNION ALL
            SELECT o_orderkey AS k, 'low' AS route FROM orders
            WHERE o_totalprice < 50000.0
            UNION ALL
            SELECT o_orderkey AS k, 'mid' AS route FROM orders
            WHERE NOT (COALESCE(o_totalprice > 150000.0, FALSE)
                       OR COALESCE(o_totalprice < 50000.0, FALSE))
        """,
        "cross": """
            SELECT r_name, n_name FROM region CROSS JOIN nation
            ORDER BY r_name, n_name
        """,
        "cogroup": """
            SELECT COALESCE(c.k, s.k) AS nationkey,
                   COALESCE(c.n, 0) AS n_cust,
                   COALESCE(s.n, 0) AS n_supp
            FROM (SELECT c_nationkey AS k, COUNT(*) AS n
                  FROM customer GROUP BY c_nationkey) c
            FULL OUTER JOIN
                 (SELECT s_nationkey AS k, COUNT(*) AS n
                  FROM supplier GROUP BY s_nationkey) s
            ON c.k = s.k
            ORDER BY nationkey
        """,
        "join_left": """
            SELECT c_custkey, COUNT(o_orderkey) AS n_orders
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey ORDER BY c_custkey
        """,
        "join_semi": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders
                                WHERE o_totalprice > 200000.0)
            ORDER BY c_custkey
        """,
        "join_anti": """
            SELECT c_custkey FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                    WHERE o_totalprice > 300000.0
                                      AND o_custkey IS NOT NULL)
            ORDER BY c_custkey
        """,
        "join_replicated": """
            SELECT p_brand,
                   FLOOR((SUM(l_extendedprice))*100 + 0.5)/100 AS value,
                   COUNT(*) AS cnt
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY p_brand
        """,
        "group_all": """
            SELECT COUNT(*) AS n_rows,
                   FLOOR((SUM(l_quantity))*100 + 0.5)/100 AS total_qty,
                   FLOOR((MIN(l_extendedprice))*100 + 0.5)/100 AS min_price,
                   FLOOR((MAX(l_extendedprice))*100 + 0.5)/100 AS max_price
            FROM lineitem
        """,
        "rank_window": """
            SELECT o_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
            FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                         rank() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC) AS rnk
                  FROM orders) t
            WHERE rnk <= 3
            ORDER BY o_custkey, rnk, o_orderkey
        """,
        "range_proj": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_quantity
            FROM lineitem
            ORDER BY l_orderkey, l_partkey, l_suppkey, l_quantity
        """,
        "sample_deterministic": """
            SELECT lang,
                   CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
                        THEN 'eval' ELSE 'train' END AS part,
                   COUNT(*) AS n
            FROM documents
            GROUP BY 1, 2
            ORDER BY lang, part
        """,
        "cube_mixed": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                    (l_returnflag),
                                    (l_linestatus), ())
            ORDER BY l_returnflag, l_linestatus, cnt
        """,
        "cube": """
            SELECT l_returnflag, l_linestatus,
                   FLOOR((SUM(l_quantity))*100 + 0.5)/100 AS sum_qty, COUNT(*) AS cnt
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag, l_linestatus
        """,
        "rollup": """
            SELECT yr, o_orderstatus,
                   FLOOR((SUM(o_totalprice))*100 + 0.5)/100 AS total, COUNT(*) AS cnt
            FROM (SELECT CAST(year(o_orderdate) AS INT) AS yr,
                         o_orderstatus, o_totalprice FROM orders) t
            GROUP BY ROLLUP (yr, o_orderstatus)
            ORDER BY yr, o_orderstatus
        """,
        "flatten_wordcount": """
            SELECT token, COUNT(*) AS cnt
            FROM (SELECT unnest(list_filter(
                      string_split_regex(text, '[ \t\n\r\f",()*]+'),
                      t -> t <> '')) AS token
                  FROM documents) t
            GROUP BY token
            ORDER BY cnt DESC, token
            LIMIT 100
        """,
        "string_funcs": """
            SELECT c_custkey,
                   UPPER(c_name) AS up,
                   LOWER(c_name) AS lo,
                   CASE WHEN 0 <= length(c_name)
                        THEN substring(c_name, 1, GREATEST(LEAST(8, length(c_name)), 0))
                   END AS sub,
                   CAST(strpos(c_name, '_') - 1 AS INT) AS idx,
                   c_name || '|' || c_mktsegment AS cat,
                   regexp_replace(c_name, '[0-9]+', '#', 'g') AS repl,
                   starts_with(c_name, 'CUSTOMER') AS sw,
                   CAST(length(c_name) AS BIGINT) AS len,
                   UPPER(substring(LOWER(c_name), 1, 1)) ||
                       substring(LOWER(c_name), 2) AS ucf
            FROM customer ORDER BY c_custkey
        """,
        "math_funcs": """
            SELECT l_orderkey,
                   CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS rnd,
                   FLOOR(l_extendedprice) AS flr,
                   CEIL(l_extendedprice) AS cl,
                   FLOOR((SQRT(l_quantity))*100 + 0.5)/100 AS sq,
                   ABS(0.0 - l_discount) AS ab,
                   FLOOR((LN(l_extendedprice))*100 + 0.5)/100 AS lg
            FROM lineitem WHERE l_linenumber = 1
            ORDER BY l_orderkey
        """,
        "datetime_funcs": """
            SELECT o_orderkey,
                   CAST(year(o_orderdate) AS INT) AS yr,
                   CAST(month(o_orderdate) AS INT) AS mo,
                   CAST(day(o_orderdate) AS INT) AS dy,
                   CAST(trunc((epoch(o_orderdate) -
                               epoch(TIMESTAMP '1995-01-01')) / 86400.0)
                        AS BIGINT) AS days_since
            FROM orders ORDER BY o_orderkey
        """,
        "int_division": """
            SELECT l_orderkey, l_linenumber,
                   CAST(trunc(l_linenumber / 2.0) AS INT) AS half,
                   l_orderkey % 7 AS m7
            FROM lineitem ORDER BY l_orderkey, l_linenumber
        """,
        "events_session": """
            SELECT user_id, hr, COUNT(*) AS cnt,
                   FLOOR((SUM(value))*100 + 0.5)/100 AS total
            FROM (SELECT user_id, CAST(hour(ts) AS INT) AS hr, value
                  FROM events) t
            GROUP BY user_id, hr
            ORDER BY cnt DESC, user_id, hr
            LIMIT 50
        """,
        "events_json": """
            SELECT event_type,
                   CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
                   COUNT(CAST(props->>'$.k' AS BIGINT)) AS n_k
            FROM events
            GROUP BY event_type ORDER BY event_type
        """,
        "percentiles": """
            SELECT l_returnflag,
                   FLOOR((quantile_cont(l_extendedprice, 0.5))*100 + 0.5)/100
                       AS p50,
                   FLOOR((quantile_cont(l_extendedprice, 0.95))*100 + 0.5)/100
                       AS p95,
                   FLOOR((stddev_samp(l_quantity))*100 + 0.5)/100 AS sd_qty
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "window_lag": """
            SELECT o_custkey, o_orderkey,
                   lag(o_totalprice) OVER w AS prev_price,
                   CAST(ntile(4) OVER w AS INT) AS quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey
        """,
        "pig_script": """
            SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt,
                   SUM(l_quantity) AS qty
            FROM lineitem
            WHERE l_quantity < 25.0
              AND regexp_full_match(l_returnflag, '[AR]')
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "nested_foreach": """
            WITH r AS (SELECT o_custkey, o_totalprice,
                              row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC) AS rn
                       FROM orders)
            SELECT o_custkey AS custkey,
                   COUNT(*) FILTER (WHERE o_totalprice > 150000.0) AS n_big,
                   FLOOR((SUM(o_totalprice) FILTER (WHERE rn <= 2))*100
                         + 0.5)/100 AS top2_total
            FROM r GROUP BY o_custkey ORDER BY custkey
        """,
        "udaf_custom": """
            SELECT l_returnflag,
                   FLOOR(((SUM(l_quantity) - MIN(l_quantity) - MAX(l_quantity))
                          / (COUNT(l_quantity) - 2))*100 + 0.5)/100
                       AS trimmed_qty,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "nested_cross": """
            WITH hi AS (SELECT o_orderpriority AS pri, o_totalprice AS hv
                        FROM orders WHERE o_totalprice > 400000.0),
                 lo AS (SELECT o_orderpriority AS pri, o_totalprice AS lv
                        FROM orders WHERE o_totalprice < 2000.0),
            -- one row PER GROUP, like Pig's nested FOREACH: an empty
            -- inner CROSS still emits (pri, 0, null) — an inner-join
            -- shape silently drops such groups (caught by the sf0.001
            -- driver-shape sim, where two priorities have no pairs)
                 pairs AS (
                   SELECT hi.pri AS pri, COUNT(*) AS n_pairs,
                          FLOOR(CAST(SUM(CAST(CAST(hi.hv - lo.lv AS VARCHAR)
                                              AS DECIMAL(38,18)))
                                     AS DOUBLE)*100 + 0.5)/100 AS spread_total
                   FROM hi JOIN lo ON hi.pri = lo.pri
                   GROUP BY hi.pri)
            SELECT g.pri AS pri,
                   COALESCE(p.n_pairs, 0) AS n_pairs,
                   p.spread_total AS spread_total
            FROM (SELECT DISTINCT o_orderpriority AS pri FROM orders) g
            LEFT JOIN pairs p ON g.pri = p.pri
            ORDER BY pri
        """,
        "scalar_of_relation": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
            ORDER BY o_orderkey
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id, MAX(n_chars) AS n_chars
            FROM documents GROUP BY text ORDER BY doc_id
        """,
        "pigmix_distinct_agg": """
            SELECT l_returnflag,
                   COUNT(DISTINCT l_partkey) AS n_parts,
                   COUNT(DISTINCT l_suppkey) AS n_supps,
                   COUNT(*) AS n_rows
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "pigmix_map_access": """
            WITH p AS (
              SELECT user_id,
                     CAST(json_extract_string(props, '$.k') AS INT) AS k
              FROM events WHERE event_type = 'click')
            SELECT user_id, CAST(SUM(k) AS BIGINT) AS sum_k,
                   COUNT(user_id) AS n
            FROM p GROUP BY user_id ORDER BY user_id
        """,
        "pigmix_fanout_join": """
            SELECT s_nationkey, COUNT(*) AS n_items,
                   FLOOR(SUM(l_quantity) * 100.0 + 0.5) / 100.0 AS qty
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey ORDER BY s_nationkey
        """,
        "pigmix_anti_cogroup": """
            SELECT l_partkey, COUNT(*) AS n_items
            FROM lineitem
            WHERE l_partkey NOT IN (
                SELECT p_partkey FROM part WHERE p_retailprice > 1800.0)
            GROUP BY l_partkey ORDER BY l_partkey
        """,
        "pigmix_nested_split": """
            SELECT event_type,
                   COUNT(*) FILTER (WHERE value > 40.0) AS n_hi,
                   COUNT(*) FILTER (WHERE value < 10.0) AS n_lo,
                   COUNT(*) AS n
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "pigmix_total_sort": """
            SELECT event_type, value, user_id
            FROM events
            ORDER BY event_type ASC, value DESC, user_id ASC
        """,
        "pigmix_nested_sort": """
            WITH ranked AS (
              SELECT l_suppkey, l_extendedprice,
                     ROW_NUMBER() OVER (PARTITION BY l_suppkey
                                        ORDER BY l_extendedprice DESC) AS rn
              FROM lineitem)
            SELECT l_suppkey, COUNT(*) AS n_top,
                   FLOOR(SUM(l_extendedprice) * 100.0 + 0.5) / 100.0
                       AS top3_total
            FROM ranked WHERE rn <= 3
            GROUP BY l_suppkey ORDER BY l_suppkey
        """,
        "pigmix_multistore": """
            SELECT event_id, event_type, value,
                   CASE WHEN value >= 25.0 THEN 'hi' ELSE 'lo' END AS route
            FROM events ORDER BY event_id
        """,
        "pigmix_wide_group": """
            SELECT l_returnflag, l_linestatus, l_linenumber,
                   CAST(year(l_shipdate) AS INT) AS ship_year,
                   FLOOR((SUM(l_quantity))*100 + 0.5)/100 AS sum_qty,
                   COUNT(*) AS n
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus, l_linenumber,
                     year(l_shipdate)
            ORDER BY l_returnflag, l_linestatus, l_linenumber, ship_year
        """,
        "union_distinct": """
            SELECT DISTINCT k FROM (
              SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
              UNION ALL
              SELECT o_custkey AS k FROM orders WHERE o_totalprice > 150000.0
            ) u ORDER BY k
        """,
        "dedup_simhash": """
            WITH sh AS (
              SELECT doc_id,
                     unnest(list_distinct([substring(text, i, 4)
                            for i in generate_series(
                                1, greatest(length(text) - 3, 1))])) AS sg
              FROM documents WHERE text IS NOT NULL),
            h AS (SELECT doc_id, md5(sg) AS m FROM sh),
            votes AS (
              SELECT doc_id, t.b AS b,
                     SUM(CASE WHEN ((strpos('0123456789abcdef',
                                     substring(m, (t.b // 4) + 1, 1)) - 1)
                                    >> (3 - t.b % 4)) & 1 = 1
                              THEN 1 ELSE -1 END) AS v
              FROM h CROSS JOIN range(64) t(b)
              GROUP BY doc_id, t.b),
            nib AS (
              SELECT doc_id, b // 4 AS p,
                     SUM(CASE WHEN v > 0 THEN 1 << (3 - b % 4)
                              ELSE 0 END) AS nv
              FROM votes GROUP BY doc_id, b // 4)
            SELECT doc_id,
                   string_agg(substring('0123456789abcdef',
                                        (nv + 1)::BIGINT, 1),
                              '' ORDER BY p) AS simhash
            FROM nib GROUP BY doc_id ORDER BY doc_id
        """,
        "setsim_pairs": """
            WITH s AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 12)
                                    for i in generate_series(
                                        1, greatest(length(text) - 11, 1))])
                       AS sh
              FROM documents WHERE text IS NOT NULL),
            t AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS tok FROM s),
            p AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     a.n AS na, b.n AS nb, COUNT(*) AS i
              FROM t a JOIN t b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2, 3, 4)
            SELECT id_a, id_b, CAST(i AS BIGINT) AS inter,
                   CAST(na + nb - i AS BIGINT) AS uni
            FROM p WHERE i * 1000000 >= 600000 * (na + nb - i)
            ORDER BY id_a, id_b
        """,
        "triangles": """
            WITH raw AS (
              SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
              UNION ALL
              SELECT doc_id, doc_id + 2 FROM documents
              WHERE doc_id % 2 = 0
              UNION ALL
              SELECT doc_id, doc_id * 2 FROM documents WHERE doc_id > 0),
            und AS (
              SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
              FROM raw
              WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
            FROM und e1
            JOIN und e2 ON e1.b = e2.a
            JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
        """,
        "dedup_spans": """
            WITH ex AS (
              SELECT doc_id,
                     unnest(list_distinct(list_transform(
                       list_filter(
                         generate_series(1, greatest(length(text) - 49, 0)),
                         p -> substring(md5(substring(text, CAST(p AS INT),
                                                      8)), 1, 1) = '0'),
                       p -> md5(substring(text, CAST(p AS INT), 50))))) AS h
              FROM documents WHERE text IS NOT NULL),
            dup AS (
              SELECT h FROM (
                SELECT h, COUNT(DISTINCT doc_id) nd FROM ex GROUP BY h)
              WHERE nd > 1),
            ns AS (SELECT doc_id, COUNT(*) n_spans FROM ex GROUP BY doc_id),
            nd2 AS (
              SELECT ex.doc_id, COUNT(*) n_dup FROM ex
              JOIN dup USING (h) GROUP BY ex.doc_id)
            SELECT d.doc_id,
                   CAST(COALESCE(ns.n_spans, 0) AS BIGINT) AS n_spans,
                   CAST(COALESCE(nd2.n_dup, 0) AS BIGINT) AS n_dup_spans,
                   COALESCE(nd2.n_dup, 0) * 100
                     <= 20 * COALESCE(ns.n_spans, 0) AS keep
            FROM documents d
            LEFT JOIN ns USING (doc_id)
            LEFT JOIN nd2 ON d.doc_id = nd2.doc_id
            ORDER BY d.doc_id
        """,
        "dedup_minhash": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 5)
                                    for i in generate_series(
                                        1, greatest(length(text) - 4, 1))]) AS s
              FROM documents WHERE text IS NOT NULL),
            ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
            sig AS (
              SELECT doc_id, j, MIN(md5(j::VARCHAR || ':' || sg)) AS mh
              FROM ex CROSS JOIN range(64) t(j)
              GROUP BY doc_id, j),
            band AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS bh
              FROM sig GROUP BY doc_id, j // 4),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM band a JOIN band b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
            v AS (
              SELECT p.id_a, p.id_b,
                     CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                     len(list_distinct(list_concat(sa.s, sb.s))) AS jac
              FROM pairs p
              JOIN sh sa ON sa.doc_id = p.id_a
              JOIN sh sb ON sb.doc_id = p.id_b)
            SELECT id_a, id_b, ROUND(jac, 4) AS jaccard
            FROM v WHERE jac >= 0.6 ORDER BY id_a, id_b
        """,
        "label_spreading": """
            WITH e0 AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 10 < 4
              UNION ALL
              SELECT doc_id, doc_id * 2 FROM documents),
            sym AS (
              SELECT DISTINCT a, b FROM (
                SELECT a, b FROM e0 UNION ALL SELECT b, a FROM e0)
              WHERE a <> b),
            l0 AS (
              SELECT doc_id AS node, lang AS label, TRUE AS is_seed
              FROM documents
              WHERE doc_id % 100 = 0 AND lang IS NOT NULL),
            c1 AS (
              SELECT s.a AS node, l.label, COUNT(*) AS c
              FROM sym s JOIN l0 l ON l.node = s.b
              WHERE s.a NOT IN (SELECT node FROM l0)
              GROUP BY s.a, l.label),
            v1 AS (
              SELECT node, MIN(label) AS label FROM (
                SELECT node, label, c,
                       MAX(c) OVER (PARTITION BY node) AS mc
                FROM c1) WHERE c = mc GROUP BY node),
            l1 AS (
              SELECT * FROM l0
              UNION ALL SELECT node, label, FALSE FROM v1),
            c2 AS (
              SELECT s.a AS node, l.label, COUNT(*) AS c
              FROM sym s JOIN l1 l ON l.node = s.b
              WHERE s.a NOT IN (SELECT node FROM l1)
              GROUP BY s.a, l.label),
            v2 AS (
              SELECT node, MIN(label) AS label FROM (
                SELECT node, label, c,
                       MAX(c) OVER (PARTITION BY node) AS mc
                FROM c2) WHERE c = mc GROUP BY node),
            l2 AS (
              SELECT * FROM l1
              UNION ALL SELECT node, label, FALSE FROM v2)
            SELECT node, label, is_seed FROM l2 ORDER BY node
        """,
        "weighted_paths": """
            WITH RECURSIVE
            e0 AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 10 < 4
              UNION ALL
              SELECT doc_id, doc_id * 2 FROM documents),
            ed AS (
              SELECT a, b, (a + b) % 7 + 1 AS w
              FROM (SELECT DISTINCT a, b FROM e0 WHERE a <> b)),
            src AS (SELECT DISTINCT doc_id AS node FROM documents
                    WHERE doc_id % 100 = 0),
            walk AS (
              SELECT node, CAST(0 AS BIGINT) AS dist, 0 AS hops FROM src
              UNION
              SELECT ed.b, walk.dist + ed.w, walk.hops + 1
              FROM walk JOIN ed ON ed.a = walk.node
              WHERE walk.hops < 4)
            SELECT node, MIN(dist) AS dist
            FROM walk GROUP BY node ORDER BY node
        """,
        "shortest_paths": """
            WITH RECURSIVE
            e AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 10 < 4
              UNION ALL
              SELECT doc_id, doc_id * 2 FROM documents),
            ed AS (SELECT DISTINCT a, b FROM e WHERE a <> b),
            src AS (SELECT DISTINCT doc_id AS node FROM documents
                    WHERE doc_id % 100 = 0),
            walk AS (
              SELECT node, 0 AS dist FROM src
              UNION
              SELECT ed.b, walk.dist + 1
              FROM walk JOIN ed ON ed.a = walk.node
              WHERE walk.dist < 4)
            SELECT node, CAST(MIN(dist) AS INT) AS dist
            FROM walk GROUP BY node ORDER BY node
        """,
        "dedup_incremental_clusters": """
            WITH RECURSIVE sh AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 5)
                                    for i in generate_series(
                                        1, greatest(length(text) - 4, 1))]) AS s
              FROM documents WHERE text IS NOT NULL),
            ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
            sig AS (
              SELECT doc_id, j, MIN(md5(j::VARCHAR || ':' || sg)) AS mh
              FROM ex CROSS JOIN range(64) t(j)
              GROUP BY doc_id, j),
            band AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS bh
              FROM sig GROUP BY doc_id, j // 4),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM band a JOIN band b
                ON a.band = b.band AND a.bh = b.bh
                AND a.doc_id < b.doc_id),
            v AS (
              SELECT p.id_a, p.id_b
              FROM pairs p
              JOIN sh sa ON sa.doc_id = p.id_a
              JOIN sh sb ON sb.doc_id = p.id_b
              WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                    len(list_distinct(list_concat(sa.s, sb.s))) >= 0.6),
            sym AS (
              SELECT id_a AS a, id_b AS b FROM v
              UNION SELECT id_b, id_a FROM v),
            walk(node, comp) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.node)
            SELECT node, MIN(comp) AS comp
            FROM walk GROUP BY node ORDER BY node
        """,
        "dedup_incremental": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 5)
                                    for i in generate_series(
                                        1, greatest(length(text) - 4, 1))]) AS s
              FROM documents WHERE text IS NOT NULL),
            ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
            sig AS (
              SELECT doc_id, j, MIN(md5(j::VARCHAR || ':' || sg)) AS mh
              FROM ex CROSS JOIN range(64) t(j)
              GROUP BY doc_id, j),
            band AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS bh
              FROM sig GROUP BY doc_id, j // 4),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM band a JOIN band b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
              WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
            v AS (
              SELECT p.id_a, p.id_b,
                     CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                     len(list_distinct(list_concat(sa.s, sb.s))) AS jac
              FROM pairs p
              JOIN sh sa ON sa.doc_id = p.id_a
              JOIN sh sb ON sb.doc_id = p.id_b)
            SELECT id_a, id_b, ROUND(jac, 4) AS jaccard
            FROM v WHERE jac >= 0.6 ORDER BY id_a, id_b
        """,
"dedup_index_roundtrip": """
            WITH sh AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 5)
                                    for i in generate_series(
                                        1, greatest(length(text) - 4, 1))]) AS s
              FROM documents WHERE text IS NOT NULL),
            ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
            sig AS (
              SELECT doc_id, j, MIN(md5(j::VARCHAR || ':' || sg)) AS mh
              FROM ex CROSS JOIN range(64) t(j)
              GROUP BY doc_id, j),
            band AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS bh
              FROM sig GROUP BY doc_id, j // 4),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM band a JOIN band b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
              WHERE a.doc_id % 5 = 0 OR b.doc_id % 5 = 0),
            v AS (
              SELECT p.id_a, p.id_b,
                     CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                     len(list_distinct(list_concat(sa.s, sb.s))) AS jac
              FROM pairs p
              JOIN sh sa ON sa.doc_id = p.id_a
              JOIN sh sb ON sb.doc_id = p.id_b)
            SELECT id_a, id_b, ROUND(jac, 4) AS jaccard
            FROM v WHERE jac >= 0.6 ORDER BY id_a, id_b
        """,
        "connected_components": """
            WITH RECURSIVE
            base AS (
              SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
              WHERE doc_id % 10 < 4
              UNION ALL
              SELECT doc_id, doc_id * 2 FROM documents
              WHERE doc_id % 7 = 0 AND doc_id > 0),
            sym AS (
              SELECT src AS a, dst AS b FROM base WHERE src != dst
              UNION
              SELECT dst, src FROM base WHERE src != dst),
            walk(node, comp) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.node)
            SELECT node, MIN(comp) AS comp FROM walk
            GROUP BY node ORDER BY node
        """,
        "dedup_near_full": """
            WITH RECURSIVE sh AS (
              SELECT doc_id,
                     list_distinct([substring(text, i, 5)
                                    for i in generate_series(
                                        1, greatest(length(text) - 4, 1))]) AS s
              FROM documents WHERE text IS NOT NULL),
            ex AS (SELECT doc_id, unnest(s) AS sg FROM sh),
            sig AS (
              SELECT doc_id, j, MIN(md5(j::VARCHAR || ':' || sg)) AS mh
              FROM ex CROSS JOIN range(64) t(j)
              GROUP BY doc_id, j),
            band AS (
              SELECT doc_id, j // 4 AS band,
                     md5(string_agg(mh, '|' ORDER BY j)) AS bh
              FROM sig GROUP BY doc_id, j // 4),
            pairs AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM band a JOIN band b
                ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
            v AS (
              SELECT p.id_a, p.id_b
              FROM pairs p
              JOIN sh sa ON sa.doc_id = p.id_a
              JOIN sh sb ON sb.doc_id = p.id_b
              WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE) /
                    len(list_distinct(list_concat(sa.s, sb.s))) >= 0.6),
            sym AS (
              SELECT id_a AS a, id_b AS b FROM v
              UNION SELECT id_b, id_a FROM v),
            walk(node, comp) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.node)
            SELECT doc_id FROM documents
            WHERE doc_id NOT IN (
              SELECT node FROM (SELECT node, MIN(comp) AS comp FROM walk
                                GROUP BY node) c
              WHERE node != comp)
            ORDER BY doc_id
        """,
        "ngram_jaccard": """
            WITH sh AS (
              SELECT doc_id, lang, source,
                     list_distinct([substring(text, i, 3)
                                    for i in generate_series(
                                        1, greatest(length(text) - 2, 1))]) AS s
              FROM documents)
            SELECT id_a, id_b, ROUND(jac, 4) AS jaccard
            FROM (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                         len(list_distinct(list_concat(a.s, b.s))) AS jac
                  FROM sh a JOIN sh b
                    ON a.lang = b.lang AND a.source = b.source
                   AND a.doc_id < b.doc_id) t
            WHERE jac >= 0.35
            ORDER BY id_a, id_b
        """,
        "similarity_bruteforce": """
            WITH q AS (SELECT vec_id AS query_id,
                              CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 3),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     ROUND(list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]), q.qv), 4) AS score
              FROM embeddings e, q WHERE e.vec_id <> q.query_id),
            ranked AS (
              SELECT query_id, vec_id, score,
                     CAST(row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, vec_id) AS INT) AS rank
              FROM scored)
            SELECT query_id, vec_id, score, rank
            FROM ranked WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "quantize_embeddings": """
            WITH q AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(
                         embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
              FROM embeddings)
            SELECT vec_id,
                   array_to_string(
                   CASE WHEN s > 0 THEN
                        list_transform(embedding, x ->
                            CAST(greatest(-127, least(127,
                                 CAST(floor(CAST(x AS DOUBLE) / s + 0.5)
                                      AS INT))) AS TINYINT))
                   ELSE list_transform(embedding, x -> CAST(0 AS TINYINT))
                   END, ',') AS q_vec,
                   s AS q_scale
            FROM q ORDER BY vec_id
        """,
        "resample_mixture": """
            WITH base AS (
              SELECT doc_id, lang,
                     CASE WHEN lang = 'en' THEN 2 ELSE 1 END
                     + CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                                 < (CASE WHEN lang = 'en'
                                         THEN 'c000' ELSE '4000' END)
                            THEN 1 ELSE 0 END AS nc
              FROM documents)
            SELECT doc_id, lang,
                   CAST(unnest(range(nc)) AS INT) AS copy_idx
            FROM base ORDER BY doc_id, copy_idx
        """,
        "scrub_pii": """
            WITH built AS (
              SELECT doc_id,
                     text || ' contact u' || doc_id || '@ex.org'
                          || ' from 10.1.2.3'
                          || CASE WHEN doc_id % 5 = 0
                                  THEN ' id 123-45-6789' ELSE '' END AS t0
              FROM documents),
            s1 AS (SELECT doc_id,
                     len(regexp_extract_all(t0,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                         AS n1,
                     regexp_replace(t0,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g') AS t1
                   FROM built),
            s2 AS (SELECT doc_id, n1,
                     len(regexp_extract_all(t1,
                         '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS n2,
                     regexp_replace(t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b',
                                    '<IP>', 'g') AS t2
                   FROM s1),
            s3 AS (SELECT doc_id, n1, n2,
                     len(regexp_extract_all(t2,
                         '\\b(?:\\+?\\d{1,2}[ .-]?)?\\(?\\d{3}\\)?[ .-]\\d{3}[ .-]\\d{4}\\b'))
                         AS n3,
                     regexp_replace(t2,
                         '\\b(?:\\+?\\d{1,2}[ .-]?)?\\(?\\d{3}\\)?[ .-]\\d{3}[ .-]\\d{4}\\b',
                         '<PHONE>', 'g') AS t3
                   FROM s2),
            s4 AS (SELECT doc_id, n1, n2, n3,
                     len(regexp_extract_all(t3, '\\b\\d{3}-\\d{2}-\\d{4}\\b'))
                         AS n4,
                     regexp_replace(t3, '\\b\\d{3}-\\d{2}-\\d{4}\\b',
                                    '<ID>', 'g') AS t4
                   FROM s3)
            SELECT doc_id, t4 AS text,
                   CAST(n1 + n2 + n3 + n4 AS BIGINT) AS pii_count
            FROM s4 ORDER BY doc_id
        """,
        "dedup_lines": """
            WITH c AS (SELECT text, COUNT(DISTINCT doc_id) AS n
                       FROM documents GROUP BY text)
            SELECT d.doc_id,
                   CASE WHEN d.text IS NULL OR c.n > 1 THEN ''
                        ELSE d.text END AS text
            FROM documents d LEFT JOIN c
              ON d.text IS NOT DISTINCT FROM c.text
            ORDER BY d.doc_id
        """,
        "gopher_filter": """
            WITH t AS (
              SELECT doc_id,
                     -- COALESCE: engine treats NULL text as zero tokens
                     -- (too_few_words), not as a NULL that escapes rules
                     list_filter(string_split_regex(
                                     coalesce(trim(text), ''), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents),
            m AS (
              SELECT doc_id,
                     CAST(len(toks) AS DOUBLE) AS n,
                     list_sum(list_transform(toks, x -> length(x)))
                         / greatest(CAST(len(toks) AS DOUBLE), 1.0) AS avg_len,
                     CAST(len(list_filter(toks,
                              x -> regexp_matches(x, '[A-Za-z]')))
                          AS DOUBLE)
                         / greatest(CAST(len(toks) AS DOUBLE), 1.0)
                         AS alpha_ratio,
                     len(list_filter(toks, x -> list_contains(
                         ['the','and','of','to','is','in','that','it','with'],
                         lower(x)))) AS n_stop
              FROM t)
            SELECT doc_id,
                   CASE WHEN n < 40 THEN 'too_few_words'
                        WHEN n > 120 THEN 'too_many_words'
                        WHEN avg_len < 3.0 THEN 'avg_word_too_short'
                        WHEN avg_len > 10.0 THEN 'avg_word_too_long'
                        WHEN alpha_ratio < 0.8 THEN 'non_alpha_words'
                        WHEN n_stop < 1 THEN 'too_few_stopwords'
                   END AS drop_reason,
                   CASE WHEN n < 40 THEN 'too_few_words'
                        WHEN n > 120 THEN 'too_many_words'
                        WHEN avg_len < 3.0 THEN 'avg_word_too_short'
                        WHEN avg_len > 10.0 THEN 'avg_word_too_long'
                        WHEN alpha_ratio < 0.8 THEN 'non_alpha_words'
                        WHEN n_stop < 1 THEN 'too_few_stopwords'
                   END IS NULL AS keep
            FROM m ORDER BY doc_id
        """,
        "text_quality": """
            WITH t AS (
              SELECT doc_id, text,
                     CAST(length(text) AS DOUBLE) AS ln,
                     list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS toks
              FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS BIGINT) AS n_tokens,
                   ROUND((ln - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                         / GREATEST(ln, 1.0), 4) AS alpha_ratio,
                   ROUND((ln - length(regexp_replace(text, '[0-9]', '', 'g')))
                         / GREATEST(ln, 1.0), 4) AS digit_ratio,
                   ROUND(len(list_filter(toks, x -> list_contains(
                         ['the','and','of','to','is','in','that','it','with'],
                         lower(x)))) / GREATEST(CAST(len(toks) AS DOUBLE), 1.0),
                         4) AS stopword_ratio
            FROM t ORDER BY doc_id
        """,
        "lang_id": r"""
            WITH toks AS (
              SELECT doc_id, lang,
                     list_transform(list_filter(
                         regexp_split_to_array(trim(text), '\s+'),
                         t -> t != ''), t -> lower(t)) AS tk
              FROM documents),
            scored AS (
              SELECT doc_id, lang, list_sort([
                {'score': len(list_filter(tk, t -> list_contains(
                    ['the','and','of','to','is','in','that','it','with'], t))),
                 'lang': 'en'},
                {'score': len(list_filter(tk, t -> list_contains(
                    ['el','la','de','que','y','los','las','una','por'], t))),
                 'lang': 'es'},
                {'score': len(list_filter(tk, t -> list_contains(
                    ['der','die','das','und','ist','nicht','mit','ein','zu'], t))),
                 'lang': 'de'},
                {'score': len(list_filter(tk, t -> list_contains(
                    ['le','la','les','de','et','est','une','dans','que'], t))),
                 'lang': 'fr'},
                {'score': len(list_filter(tk, t -> list_contains(
                    ['的','是','了','在','和','有','我','不','这'], t))),
                 'lang': 'zh'}
              ]) AS ss
              FROM toks)
            SELECT doc_id, lang,
                   CASE WHEN ss[-1].score > 0 THEN ss[-1].lang
                        ELSE 'und' END AS lang_pred
            FROM scored ORDER BY doc_id
        """,
        "fingerprint": """
            SELECT doc_id, md5(text) AS content_fp
            FROM documents ORDER BY doc_id
        """,
        "bm25": """
            WITH dl AS (
              SELECT doc_id,
                     len(list_filter(regexp_split_to_array(trim(text),
                         '\\s+'), x -> x != '')) AS dl
              FROM documents),
            stats AS (SELECT COUNT(*) AS n, SUM(dl) AS total_dl FROM dl),
            tok AS (
              SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(
                        lower(trim(text)), '\\s+'), x -> x != '')) AS token
              FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
                   WHERE token IN ('data', 'model', 'training')
                   GROUP BY 1, 2),
            dfq AS (SELECT token, COUNT(DISTINCT doc_id) AS df_t
                    FROM tf GROUP BY 1),
            part AS (
              SELECT tf.doc_id,
                     ln(1.0 + (CAST(n AS DOUBLE) - df_t + 0.5)
                              / (df_t + 0.5))
                     * tf * (1.2 + 1.0)
                     / (tf + 1.2 * (1.0 - 0.75
                        + 0.75 * (dl.dl * n) / CAST(total_dl AS DOUBLE)))
                        AS p
              FROM tf JOIN dfq USING (token)
                      JOIN dl ON tf.doc_id = dl.doc_id, stats)
            SELECT doc_id, ROUND(SUM(p), 6) AS bm25,
                   CAST(COUNT(*) AS BIGINT) AS n_terms
            FROM part GROUP BY doc_id ORDER BY doc_id
        """,
        "trending": """
            WITH day AS (
              SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
                     COUNT(*) AS cnt
              FROM events GROUP BY 1, 2),
            rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY day
                     ORDER BY cnt DESC, event_type) AS BIGINT) AS rk
                   FROM day)
            SELECT day, event_type, cnt, rk FROM rk
            WHERE rk <= 2 ORDER BY day, rk
        """,
        "sketch_quantiles": """
            SELECT event_type,
                   ROUND(quantile_cont(value, 0.25), 6) AS q1,
                   ROUND(quantile_cont(value, 0.50), 6) AS q2,
                   ROUND(quantile_cont(value, 0.75), 6) AS q3,
                   TRUE AS ok1, TRUE AS ok2, TRUE AS ok3
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "sketch_distinct": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
                   TRUE AS within_5pct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "time_rollup": """
            WITH base AS (
              SELECT date_trunc('hour', ts) AS bucket, event_type,
                     COUNT(*) AS cnt,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)))
                          AS DECIMAL(38,2)) AS sum_value,
                     MIN(value) AS min_value, MAX(value) AS max_value
              FROM events GROUP BY 1, 2),
            h AS (SELECT 'hour' AS grain, * FROM base),
            d AS (SELECT 'day' AS grain, date_trunc('day', bucket) AS bucket,
                         event_type, CAST(SUM(cnt) AS BIGINT) AS cnt,
                         CAST(SUM(sum_value) AS DECIMAL(38,2)) AS sum_value,
                         MIN(min_value) AS min_value,
                         MAX(max_value) AS max_value
                  FROM base GROUP BY 2, 3)
            SELECT grain, bucket, event_type, cnt,
                   CAST(sum_value AS DOUBLE) AS sum_value,
                   min_value, max_value
            FROM (SELECT * FROM h UNION ALL SELECT * FROM d)
            ORDER BY grain, bucket, event_type
        """,
        "inverted_index": """
            WITH tok AS (
              SELECT doc_id,
                     unnest(list_filter(
                        regexp_split_to_array(lower(trim(text)), '\\s+'),
                        x -> x != '')) AS token
              FROM documents WHERE text IS NOT NULL),
            tf AS (SELECT token, doc_id, COUNT(*) AS tf
                   FROM tok GROUP BY 1, 2),
            o AS (SELECT *, COUNT(*) OVER (PARTITION BY token) AS doc_freq
                  FROM tf)
            SELECT token, doc_id, tf, doc_freq FROM o
            WHERE doc_freq >= 3 ORDER BY token, doc_id LIMIT 2000
        """,
        "tfidf": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                        x -> x <> '')) AS token
              FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf
                   FROM toks GROUP BY doc_id, token),
            dfq AS (SELECT token, COUNT(*) AS df FROM tf
                    GROUP BY token HAVING COUNT(*) >= 5),
            nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents)
            SELECT doc_id, token, tf, df,
                   ROUND(tf * LN(CAST(n AS DOUBLE) / df), 6) AS tfidf
            FROM tf JOIN dfq USING (token), nd
            ORDER BY doc_id, token LIMIT 1000
        """,
        "events_tumbling": """
            SELECT event_type, bucket_start, COUNT(*) AS cnt,
                   FLOOR((SUM(value))*100 + 0.5)/100 AS total
            FROM (SELECT event_type,
                         (CAST(trunc(epoch(ts)) AS BIGINT) // 21600) * 21600
                             AS bucket_start,
                         value FROM events) t
            GROUP BY event_type, bucket_start
            ORDER BY event_type, bucket_start
        """,
        "events_session_window": """
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN lag(ts) OVER w IS NULL
                            OR epoch(ts) - epoch(lag(ts) OVER w) >= 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
            s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
                      ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sess_id
                  FROM o)
            SELECT user_id,
                   CAST(trunc(epoch(MIN(ts))) AS BIGINT) AS session_start,
                   COUNT(*) AS n_events,
                   ROUND(SUM(value), 2) AS total
            FROM s GROUP BY user_id, sess_id
            ORDER BY user_id, session_start
        """,
        "flatten_join": """
            WITH fe AS (
              SELECT o_custkey, unnest(list_filter(
                         string_split_regex(o_orderpriority, '[ \t\n",()*]+'),
                         t -> t <> '')) AS tok
              FROM orders)
            SELECT c.c_mktsegment AS seg, fe.tok AS tok,
                   COUNT(*) AS cnt
            FROM fe JOIN customer c ON fe.o_custkey = c.c_custkey
            GROUP BY seg, tok ORDER BY seg, tok
        """,
        "events_interval_join": """
            SELECT p.user_id AS user_id, COUNT(*) AS n_pairs
            FROM events p JOIN events c
              ON p.user_id = c.user_id
             AND p.event_type = 'purchase' AND c.event_type = 'click'
             AND c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
            GROUP BY p.user_id ORDER BY user_id
        """,
        "top_n": """
            SELECT custkey, FLOOR(s*100 + 0.5)/100 AS top3_total FROM (
              SELECT o_custkey AS custkey, SUM(o_totalprice) AS s FROM (
                SELECT o_custkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC) AS rn
                FROM orders) t
              WHERE rn <= 3 GROUP BY o_custkey) g
            ORDER BY custkey
        """,
        "rank_by": """
            SELECT CAST(rank() OVER (ORDER BY o_orderkey) AS BIGINT) AS rank,
                   o_orderkey
            FROM orders ORDER BY o_orderkey
        """,
        "rank_dense": """
            SELECT CAST(dense_rank() OVER (ORDER BY o_orderstatus DESC)
                        AS BIGINT) AS rank,
                   o_orderkey, o_orderstatus
            FROM orders ORDER BY o_orderkey
        """,
        "assert_op": """
            SELECT o_orderkey,
                   FLOOR(o_totalprice*100 + 0.5)/100 AS o_totalprice
            FROM orders ORDER BY o_orderkey
        """,
        "stream_through": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
                   UPPER(n_name) AS n_name
            FROM nation ORDER BY n_nationkey
        """,
        "token_count": r"""
            SELECT doc_id,
              len(list_filter(regexp_split_to_array(trim(text), '\s+'),
                              t -> t != '')) AS n_tokens,
              CAST(COALESCE(list_sum(list_transform(
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 t -> t != ''),
                     t -> (length(t)+3)//4)), 0)
                   + (length(text) -
                      length(regexp_replace(text, '[^\w\s]', '', 'g')))
                   AS BIGINT) AS n_bpe
            FROM documents ORDER BY doc_id
        """,
        "dedup_embedding": """
            SELECT a.vec_id AS id_a, b.vec_id AS id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[]))
                  >= 0.45
            ORDER BY id_a, id_b
        """,
        "multimodal_meta": """
            SELECT doc_id,
                   CASE WHEN doc_id % 3 = 0 THEN 'png'
                        ELSE 'unknown' END AS format,
                   CAST(CASE WHEN doc_id % 3 = 0
                             THEN octet_length(encode(text)) + 4
                             ELSE octet_length(encode(text)) END
                        AS BIGINT) AS n_bytes
            FROM documents ORDER BY doc_id
        """,
        "multimodal_decode": """
            WITH p AS (SELECT doc_id,
                              length(text) % 31 + 1 AS w,
                              doc_id % 7 + 1 AS h,
                              doc_id % 4 AS m
                       FROM documents)
            SELECT doc_id AS item_id,
                   CAST(w AS INT) AS width,
                   CAST(h AS INT) AS height,
                   CASE m WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                          WHEN 2 THEN 'bmp' ELSE 'pnm' END AS format,
                   CAST(CASE m WHEN 0 THEN 24 WHEN 1 THEN 10 WHEN 2 THEN 26
                        ELSE 9 + length(CAST(w AS VARCHAR))
                               + length(CAST(h AS VARCHAR))
                        END AS BIGINT) AS n_bytes
            FROM p ORDER BY item_id
        """,
        "multimodal_decode_pnm": """
            WITH p AS (SELECT doc_id,
                              length(text) % 31 + 1 AS w,
                              doc_id % 7 + 1 AS h
                       FROM documents)
            SELECT doc_id AS item_id,
                   CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                   'pnm' AS format,
                   CAST(3 + length(CAST(w AS VARCHAR))
                          + 1 + length(CAST(h AS VARCHAR))
                          + 5 + w * h AS BIGINT) AS n_bytes,
                   CAST(w * h AS BIGINT) AS n_pixels
            FROM p ORDER BY item_id
        """,
        "multimodal_phash": """
            WITH p AS (SELECT doc_id, length(text) % 31 + 1 AS w,
                              doc_id % 7 + 1 AS h, md5(text) AS m
                       FROM documents),
            v AS (SELECT doc_id, w, h,
                    list_transform(range(0, 64), q ->
                      ascii(substring(m, CAST(
                        (((q // 8) * h // 8) * w + ((q % 8) * w // 8))
                        % 32 + 1 AS INT), 1))) AS vals
                  FROM p),
            mh AS (SELECT doc_id, w, h, vals,
                          list_sum(vals) // 64 AS mean FROM v)
            SELECT doc_id AS item_id,
                   CAST(w AS INT) AS width, CAST(h AS INT) AS height,
                   CAST(list_sum(list_transform(range(0, 32), q ->
                     CASE WHEN vals[CAST(q + 1 AS INT)] > mean
                          THEN (CAST(1 AS BIGINT) << CAST(31 - q AS INT))
                          ELSE 0 END)) AS BIGINT) AS hash_hi,
                   CAST(list_sum(list_transform(range(0, 32), q ->
                     CASE WHEN vals[CAST(q + 33 AS INT)] > mean
                          THEN (CAST(1 AS BIGINT) << CAST(31 - q AS INT))
                          ELSE 0 END)) AS BIGINT) AS hash_lo
            FROM mh ORDER BY item_id
        """,
        "multimodal_near_dedup": """
            WITH RECURSIVE p AS (SELECT doc_id, length(text) % 31 + 1 AS w,
                              doc_id % 7 + 1 AS h, md5(text) AS m
                       FROM documents),
            v AS (SELECT doc_id, w, h,
                    list_transform(range(0, 64), q ->
                      ascii(substring(m, CAST(
                        (((q // 8) * h // 8) * w + ((q % 8) * w // 8))
                        % 32 + 1 AS INT), 1))) AS vals
                  FROM p),
            mh AS (SELECT doc_id, vals, list_sum(vals) // 64 AS mean
                   FROM v),
            hsh AS (
              SELECT doc_id,
                     CAST(list_sum(list_transform(range(0, 32), q ->
                       CASE WHEN vals[CAST(q + 1 AS INT)] > mean
                            THEN (CAST(1 AS BIGINT)
                                  << CAST(31 - q AS INT))
                            ELSE 0 END)) AS BIGINT) AS hi,
                     CAST(list_sum(list_transform(range(0, 32), q ->
                       CASE WHEN vals[CAST(q + 33 AS INT)] > mean
                            THEN (CAST(1 AS BIGINT)
                                  << CAST(31 - q AS INT))
                            ELSE 0 END)) AS BIGINT) AS lo
              FROM mh),
            pr AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM hsh a JOIN hsh b ON a.doc_id < b.doc_id
              WHERE bit_count(xor(a.hi, b.hi))
                    + bit_count(xor(a.lo, b.lo)) <= 3),
            sym AS (
              SELECT id_a AS a, id_b AS b FROM pr
              UNION SELECT id_b, id_a FROM pr),
            walk(node, comp) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.node)
            SELECT doc_id AS item_id FROM documents
            WHERE doc_id NOT IN (
              SELECT node FROM (SELECT node, MIN(comp) AS comp FROM walk
                                GROUP BY node) c
              WHERE node != comp)
            ORDER BY item_id
        """,
        "multimodal_resize": """
            WITH p AS (SELECT doc_id,
                              length(text) % 31 + 1 AS w,
                              doc_id % 7 + 1 AS h,
                              md5(text) AS m
                       FROM documents),
            d AS (SELECT doc_id, w, h, m,
                         CAST((w + 1) // 2 AS BIGINT) AS ow,
                         CAST((h + 1) // 2 AS BIGINT) AS oh
                  FROM p)
            SELECT doc_id AS item_id,
                   CAST(ow AS INT) AS width,
                   CAST(oh AS INT) AS height,
                   CAST(ow * oh AS BIGINT) AS n_pixels,
                   CAST(list_sum(list_transform(range(0, ow * oh), q ->
                        ascii(substring(m,
                          CAST(((q // ow) * 2 * w + (q % ow) * 2) % 32
                               + 1 AS INT), 1)))) AS BIGINT) AS px_sum
            FROM d ORDER BY item_id
        """,
        "multimodal_audio": """
            SELECT doc_id AS item_id,
                   CAST(8000 + doc_id % 3 * 4000 AS INT) AS sample_rate,
                   1 AS channels,
                   CAST((doc_id % 5 + 1) * 100 AS BIGINT) AS n_frames,
                   ((doc_id % 5 + 1) * 100)
                       / CAST(8000 + doc_id % 3 * 4000 AS DOUBLE)
                       AS duration_s,
                   CAST(0.0 AS DOUBLE) AS rms
            FROM documents ORDER BY item_id
        """,
        "multimodal_features": """
            WITH s AS (SELECT doc_id,
                              md5(text) || md5(CAST(doc_id AS VARCHAR))
                                  AS s64
                       FROM documents)
            SELECT doc_id AS item_id,
                   CAST(64 AS INT) AS n_dims,
                   array_to_string(
                        CAST(list_transform(range(1, 65),
                             j -> ascii(substring(s64, CAST(j AS INT), 1)))
                             AS INTEGER[]), ',') AS emb_bytes
            FROM s ORDER BY item_id
        """,
        "bloom_join": """
            SELECT l_suppkey, COUNT(*) AS n_items
            FROM lineitem
            WHERE l_suppkey IN (SELECT s_suppkey FROM supplier
                                WHERE s_nationkey = 3)
            GROUP BY l_suppkey ORDER BY l_suppkey
        """,
        "map_funcs": """
            SELECT o_orderkey, o_orderstatus AS status,
                   o_orderpriority AS prio,
                   CAST(2 AS BIGINT) AS map_size
            FROM orders ORDER BY o_orderkey
        """,
        "diff_bags": """
            SELECT o_custkey AS custkey,
                   CAST(SUM(CASE WHEN o_totalprice > 100000.0
                                  AND o_orderstatus <> 'F'
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_big_not_f,
                   CAST(SUM(CASE WHEN (o_totalprice > 100000.0)
                                  <> (o_orderstatus = 'F')
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_sym_diff
            FROM orders GROUP BY o_custkey ORDER BY custkey
        """,
        "udf_python": """
            SELECT n_nationkey, UPPER(reverse(n_name)) AS rev_name
            FROM nation ORDER BY n_nationkey
        """,
        "events_sliding": """
            SELECT event_type, win_start, COUNT(*) AS cnt FROM (
              SELECT event_type,
                     (CAST(trunc(epoch(ts)) AS BIGINT) // 21600) * 21600
                         AS win_start
              FROM events
              UNION ALL
              SELECT event_type,
                     ((CAST(trunc(epoch(ts)) AS BIGINT) - 10800) // 21600)
                         * 21600 + 10800 AS win_start
              FROM events) t
            GROUP BY event_type, win_start
            ORDER BY event_type, win_start
        """,
        "join_merge": """
            SELECT o_orderpriority, SUM(l_quantity) AS sum_qty,
                   COUNT(*) AS cnt
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "join_merge_sparse": """
            SELECT p_partkey, SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
            FROM part JOIN lineitem ON p_partkey = l_partkey
            WHERE p_retailprice > 995.0
            GROUP BY p_partkey ORDER BY p_partkey
        """,
        "join_skewed": """
            SELECT o_orderstatus, COUNT(*) AS cnt
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderstatus ORDER BY o_orderstatus
        """,
        "pluck": """
            SELECT c_name, c_nationkey FROM customer ORDER BY c_name
        """,
        "pigstorage_roundtrip": """
            SELECT n_nationkey, n_name, n_regionkey
            FROM nation ORDER BY n_nationkey
        """,
        "per_source_cap": """
            SELECT doc_id, source, n_chars
            FROM documents
            QUALIFY row_number() OVER (
                PARTITION BY source
                ORDER BY n_chars DESC, doc_id ASC) <= 5
            ORDER BY doc_id
        """,
        "blocklist_filter": """
            SELECT doc_id, source, lang FROM documents
            WHERE source NOT IN ('src0', 'src3', 'src11')
            ORDER BY doc_id
        """,
        "classifier_score": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)),
                                                       '\s+'),
                                 x -> x != '') AS ws
              FROM documents),
            g AS (
              SELECT doc_id,
                     CASE WHEN len(ws) >= 2
                          THEN list_transform(range(1, len(ws)),
                                i -> ws[CAST(i AS INT)] || ' '
                                     || ws[CAST(i AS INT) + 1])
                          ELSE CAST([] AS VARCHAR[]) END AS grams
              FROM t),
            w AS (
              SELECT doc_id, grams,
                     list_transform(grams, g2 ->
                       CAST(list_sum(list_transform([1, 2, 3, 4], i ->
                         (ascii(substring(md5(g2), CAST(i AS INT), 1))
                          - CASE WHEN ascii(substring(md5(g2),
                                            CAST(i AS INT), 1)) < 58
                                 THEN 48 ELSE 87 END)
                         * CASE i WHEN 1 THEN 4096 WHEN 2 THEN 256
                                  WHEN 3 THEN 16 ELSE 1 END))
                        AS BIGINT) % 997 - 498) AS wts
              FROM g)
            SELECT doc_id,
                   CAST(len(grams) AS INT) AS n_grams,
                   CAST(COALESCE(list_sum(wts), 0) AS BIGINT) AS score_int,
                   COALESCE(list_sum(wts), 0) > 0 AS keep
            FROM w ORDER BY doc_id
        """,
        "corpus_stats": r"""
            SELECT lang, source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars,
                   CAST(FLOOR(AVG(length(text)) * 100 + 0.5) AS BIGINT)
                       AS avg_chars_x100,
                   CAST(SUM(len(list_filter(
                        regexp_split_to_array(trim(text), '\s+'),
                        x -> x != ''))) AS BIGINT) AS total_tokens,
                   CAST(SUM(CASE WHEN length(text) < 100 THEN 1 ELSE 0
                            END) AS BIGINT) AS n_short
            FROM documents GROUP BY lang, source
            ORDER BY lang, source
        """,
        "kmeans": """
            WITH q AS (
              SELECT vec_id,
                     list_transform(embedding, x ->
                       CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                            AS BIGINT)) AS qv
              FROM embeddings),
            c0 AS (
              SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                          AS BIGINT) AS cid, qv AS cv
              FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 4)),
            a0 AS (
              SELECT vec_id, cl FROM (
                SELECT q.vec_id, c0.cid AS cl,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_sum(list_transform(range(1, 65),
                           i -> (q.qv[CAST(i AS INT)]
                                 - c0.cv[CAST(i AS INT)])
                                * (q.qv[CAST(i AS INT)]
                                   - c0.cv[CAST(i AS INT)]))),
                           c0.cid) AS rn
                FROM q CROSS JOIN c0) WHERE rn = 1),
            e0 AS (
              SELECT a0.cl, d.i, q.qv[CAST(d.i AS INT)] AS v
              FROM a0 JOIN q USING (vec_id)
              CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d),
            c1 AS (
              SELECT cid, list(cv ORDER BY i) AS cv FROM (
                SELECT cl AS cid, i,
                       CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*))
                            AS BIGINT) AS cv
                FROM e0 GROUP BY cl, i)
              GROUP BY cid),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT q.vec_id, c1.cid AS cl,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_sum(list_transform(range(1, 65),
                           i -> (q.qv[CAST(i AS INT)]
                                 - c1.cv[CAST(i AS INT)])
                                * (q.qv[CAST(i AS INT)]
                                   - c1.cv[CAST(i AS INT)]))),
                           c1.cid) AS rn
                FROM q CROSS JOIN c1) WHERE rn = 1)
            SELECT vec_id, cl AS cluster FROM a1 ORDER BY vec_id
        """,
        "pagerank": """
            WITH e AS (
              SELECT DISTINCT u, v FROM (
                SELECT doc_id AS u, doc_id + 1 AS v FROM documents
                UNION ALL
                SELECT doc_id, doc_id + 2 FROM documents
                WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id, doc_id * 2 FROM documents
                WHERE doc_id > 0)),
            n AS (SELECT DISTINCT node FROM
                  (SELECT u AS node FROM e UNION ALL SELECT v FROM e)),
            o AS (SELECT u AS node, COUNT(*) AS od FROM e GROUP BY u),
            b AS (SELECT n.node, COALESCE(o.od, 0) AS od
                  FROM n LEFT JOIN o USING (node)),
            r0 AS (SELECT node, od,
                          (SELECT 1000000000000 // COUNT(*) FROM b) AS r
                   FROM b),
            d1 AS (SELECT COALESCE(SUM(r), 0) AS dang
                   FROM r0 WHERE od = 0),
            c1 AS (SELECT e.v AS node, SUM(r.r // r.od) AS inc
                   FROM r0 r JOIN e ON r.node = e.u
                   WHERE r.od > 0 GROUP BY e.v),
            r1 AS (SELECT b.node, b.od,
                          (15 * (SELECT 1000000000000 // COUNT(*) FROM b)
                           + 85 * (COALESCE(c.inc, 0)
                                   + (SELECT dang FROM d1)
                                     // (SELECT COUNT(*) FROM b))) // 100
                              AS r
                   FROM b LEFT JOIN c1 c USING (node)),
            d2 AS (SELECT COALESCE(SUM(r), 0) AS dang
                   FROM r1 WHERE od = 0),
            c2 AS (SELECT e.v AS node, SUM(r.r // r.od) AS inc
                   FROM r1 r JOIN e ON r.node = e.u
                   WHERE r.od > 0 GROUP BY e.v),
            r2 AS (SELECT b.node, b.od,
                          (15 * (SELECT 1000000000000 // COUNT(*) FROM b)
                           + 85 * (COALESCE(c.inc, 0)
                                   + (SELECT dang FROM d2)
                                     // (SELECT COUNT(*) FROM b))) // 100
                              AS r
                   FROM b LEFT JOIN c2 c USING (node)),
            d3 AS (SELECT COALESCE(SUM(r), 0) AS dang
                   FROM r2 WHERE od = 0),
            c3 AS (SELECT e.v AS node, SUM(r.r // r.od) AS inc
                   FROM r2 r JOIN e ON r.node = e.u
                   WHERE r.od > 0 GROUP BY e.v),
            r3 AS (SELECT b.node, b.od,
                          (15 * (SELECT 1000000000000 // COUNT(*) FROM b)
                           + 85 * (COALESCE(c.inc, 0)
                                   + (SELECT dang FROM d3)
                                     // (SELECT COUNT(*) FROM b))) // 100
                              AS r
                   FROM b LEFT JOIN c3 c USING (node))
            SELECT node, CAST(r AS BIGINT) AS rank_units,
                   r / 1000000000000.0 AS rank
            FROM r3 ORDER BY node
        """,
        "outliers": """
            WITH d AS (
              SELECT event_id, event_type, value,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS v
              FROM events WHERE value IS NOT NULL),
            s AS (
              SELECT event_type, COUNT(*) AS n, SUM(v) AS sv,
                     SUM(v * v) AS q
              FROM d GROUP BY event_type)
            SELECT event_id, d.event_type, value
            FROM d JOIN s USING (event_type)
            WHERE CAST((n * v - sv) AS HUGEINT)
                  * CAST((n * v - sv) AS HUGEINT)
                  > 9 * (CAST(n AS HUGEINT) * CAST(q AS HUGEINT)
                         - CAST(sv AS HUGEINT) * CAST(sv AS HUGEINT))
            ORDER BY event_id
        """,
        "weighted_sample": """
            WITH d AS (
              SELECT doc_id, CAST(length(text) AS DOUBLE) AS weight,
                     md5('42:' || CAST(doc_id AS VARCHAR)) AS m
              FROM documents
              WHERE length(text) > 0),
            kd AS (
              SELECT doc_id, weight,
                     ROUND(ln((((ascii(substring(m, 1, 1)) - CASE WHEN ascii(substring(m, 1, 1)) < 58 THEN 48 ELSE 87 END) * CAST(268435456 AS BIGINT) + (ascii(substring(m, 2, 1)) - CASE WHEN ascii(substring(m, 2, 1)) < 58 THEN 48 ELSE 87 END) * 16777216 + (ascii(substring(m, 3, 1)) - CASE WHEN ascii(substring(m, 3, 1)) < 58 THEN 48 ELSE 87 END) * 1048576 + (ascii(substring(m, 4, 1)) - CASE WHEN ascii(substring(m, 4, 1)) < 58 THEN 48 ELSE 87 END) * 65536 + (ascii(substring(m, 5, 1)) - CASE WHEN ascii(substring(m, 5, 1)) < 58 THEN 48 ELSE 87 END) * 4096 + (ascii(substring(m, 6, 1)) - CASE WHEN ascii(substring(m, 6, 1)) < 58 THEN 48 ELSE 87 END) * 256 + (ascii(substring(m, 7, 1)) - CASE WHEN ascii(substring(m, 7, 1)) < 58 THEN 48 ELSE 87 END) * 16 + (ascii(substring(m, 8, 1)) - CASE WHEN ascii(substring(m, 8, 1)) < 58 THEN 48 ELSE 87 END) * 1) + 1.0) / 4294967296.0)
                           / weight, 6) AS sample_key
              FROM d)
            SELECT doc_id, weight, sample_key FROM kd
            ORDER BY sample_key DESC, doc_id LIMIT 50
        """,
        "profile_events": """
              SELECT 'event_id' AS "column", 'bigint' AS dtype,
                     COUNT(*) AS n_rows,
                     COUNT(*) FILTER (event_id IS NULL) AS n_nulls,
                     COUNT(DISTINCT event_id) AS n_distinct,
                     MIN(CAST(event_id AS DOUBLE)) AS min_num, MAX(CAST(event_id AS DOUBLE)) AS max_num,
                     CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
                     CAST(NULL AS DOUBLE) AS avg_len
              FROM events
              UNION ALL
              SELECT 'ts' AS "column", 'timestamp_ntz' AS dtype,
                     COUNT(*) AS n_rows,
                     COUNT(*) FILTER (ts IS NULL) AS n_nulls,
                     COUNT(DISTINCT ts) AS n_distinct,
                     CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
                     MIN(CAST(ts AS VARCHAR)) AS min_str, MAX(CAST(ts AS VARCHAR)) AS max_str,
                     CAST(NULL AS DOUBLE) AS avg_len
              FROM events
              UNION ALL
              SELECT 'user_id' AS "column", 'bigint' AS dtype,
                     COUNT(*) AS n_rows,
                     COUNT(*) FILTER (user_id IS NULL) AS n_nulls,
                     COUNT(DISTINCT user_id) AS n_distinct,
                     MIN(CAST(user_id AS DOUBLE)) AS min_num, MAX(CAST(user_id AS DOUBLE)) AS max_num,
                     CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
                     CAST(NULL AS DOUBLE) AS avg_len
              FROM events
              UNION ALL
              SELECT 'event_type' AS "column", 'string' AS dtype,
                     COUNT(*) AS n_rows,
                     COUNT(*) FILTER (event_type IS NULL) AS n_nulls,
                     COUNT(DISTINCT event_type) AS n_distinct,
                     CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
                     MIN(CAST(event_type AS VARCHAR)) AS min_str, MAX(CAST(event_type AS VARCHAR)) AS max_str,
                     ROUND(AVG(length(event_type)), 6) AS avg_len
              FROM events
              UNION ALL
              SELECT 'value' AS "column", 'double' AS dtype,
                     COUNT(*) AS n_rows,
                     COUNT(*) FILTER (value IS NULL) AS n_nulls,
                     COUNT(DISTINCT value) AS n_distinct,
                     MIN(CAST(value AS DOUBLE)) AS min_num, MAX(CAST(value AS DOUBLE)) AS max_num,
                     CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str,
                     CAST(NULL AS DOUBLE) AS avg_len
              FROM events
              UNION ALL
              SELECT 'props' AS "column", 'string' AS dtype,
                     COUNT(*) AS n_rows,
                     COUNT(*) FILTER (props IS NULL) AS n_nulls,
                     COUNT(DISTINCT props) AS n_distinct,
                     CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
                     MIN(CAST(props AS VARCHAR)) AS min_str, MAX(CAST(props AS VARCHAR)) AS max_str,
                     ROUND(AVG(length(props)), 6) AS avg_len
              FROM events
            ORDER BY "column"
        """,
        "sessionize": """
            WITH o AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, ts,
                     SUM(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM o)
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   COUNT(*) AS n_events,
                   MIN(ts) AS start_ts, MAX(ts) AS end_ts,
                   (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) / 1000000.0
                       AS duration_s
            FROM s GROUP BY user_id, session_seq
            ORDER BY user_id, session_seq
        """,
        "rollup_incremental": """
            WITH base AS (
              SELECT date_trunc('hour', ts) AS bucket, event_type,
                     COUNT(*) AS cnt,
                     CAST(SUM(CAST(value AS DECIMAL(18,2)))
                          AS DECIMAL(38,2)) AS sum_value,
                     MIN(value) AS min_value, MAX(value) AS max_value
              FROM events GROUP BY 1, 2),
            h AS (SELECT 'hour' AS grain, * FROM base),
            d AS (SELECT 'day' AS grain, date_trunc('day', bucket) AS bucket,
                         event_type, CAST(SUM(cnt) AS BIGINT) AS cnt,
                         CAST(SUM(sum_value) AS DECIMAL(38,2)) AS sum_value,
                         MIN(min_value) AS min_value,
                         MAX(max_value) AS max_value
                  FROM base GROUP BY 2, 3)
            SELECT grain, bucket, event_type, cnt,
                   CAST(sum_value AS DOUBLE) AS sum_value,
                   min_value, max_value
            FROM (SELECT * FROM h UNION ALL SELECT * FROM d)
            ORDER BY grain, bucket, event_type
        """,
        "pmi": """
            WITH t0 AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                        x -> x <> '')) AS token
              FROM documents WHERE text IS NOT NULL),
            toks AS (SELECT DISTINCT doc_id, token FROM t0),
            nd AS (SELECT COUNT(DISTINCT doc_id) AS n
                   FROM documents WHERE text IS NOT NULL),
            dfq AS (SELECT token, COUNT(*) AS df FROM toks
                    GROUP BY token),
            vocab AS (SELECT token, df FROM dfq, nd
                      WHERE df >= 5
                        AND df <= CAST(FLOOR(0.9 * n) AS BIGINT)),
            tv AS (SELECT t.doc_id, t.token
                   FROM toks t JOIN vocab USING (token)),
            pairs AS (
              SELECT a.token AS tok_a, b.token AS tok_b,
                     COUNT(*) AS n_pair
              FROM tv a JOIN tv b
                ON a.doc_id = b.doc_id AND a.token < b.token
              GROUP BY 1, 2 HAVING COUNT(*) >= 3)
            SELECT tok_a, tok_b, n_pair, va.df AS df_a, vb.df AS df_b,
                   ROUND(LN(CAST(n_pair AS DOUBLE) * n
                            / (va.df * vb.df)), 6) AS pmi
            FROM pairs
            JOIN vocab va ON tok_a = va.token
            JOIN vocab vb ON tok_b = vb.token, nd
            ORDER BY tok_a, tok_b
        """,
        "winsorize_events": """
            WITH s AS (
              SELECT event_type,
                     ROUND(quantile_cont(value, 0.05), 6) AS lo,
                     ROUND(quantile_cont(value, 0.95), 6) AS hi
              FROM events WHERE value IS NOT NULL GROUP BY event_type)
            SELECT event_id, e.event_type, value,
                   CASE WHEN value IS NULL THEN NULL
                        WHEN value < lo THEN lo
                        WHEN value > hi THEN hi
                        ELSE value END AS value_w
            FROM events e LEFT JOIN s USING (event_type)
            ORDER BY event_id
        """,
        "chi2_lang_source": """
            WITH d AS (SELECT lang AS a, source AS b FROM documents
                       WHERE lang IS NOT NULL AND source IS NOT NULL),
            c AS (SELECT a, b, COUNT(*) AS n_ab FROM d GROUP BY a, b),
            ma AS (SELECT a, COUNT(*) AS n_a FROM d GROUP BY a),
            mb AS (SELECT b, COUNT(*) AS n_b FROM d GROUP BY b),
            n AS (SELECT COUNT(*) AS n_total FROM d)
            SELECT ma.a AS lang, mb.b AS source,
                   CAST(COALESCE(c.n_ab, 0) AS BIGINT) AS n_ab,
                   n_a, n_b,
                   CAST((CAST(n_total * COALESCE(c.n_ab, 0)
                              - n_a * n_b AS HUGEINT)
                         * CAST(n_total * COALESCE(c.n_ab, 0)
                                - n_a * n_b AS HUGEINT) * 1000000)
                        // (CAST(n_total AS HUGEINT) * n_a * n_b)
                        AS BIGINT) AS contrib_e6
            FROM ma CROSS JOIN mb CROSS JOIN n
            LEFT JOIN c ON c.a = ma.a AND c.b = mb.b
            ORDER BY lang, source
        """,
        "histogram_events": """
            WITH d AS (
              SELECT event_type,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS v
              FROM events WHERE value IS NOT NULL),
            b AS (
              SELECT event_type,
                     CAST(LEAST(GREATEST(FLOOR(v / 500.0), 0), 19)
                          AS BIGINT) AS bucket
              FROM d)
            SELECT event_type, bucket,
                   CAST(bucket * 5.0 AS DOUBLE) AS bucket_lo,
                   CAST((bucket + 1) * 5.0 AS DOUBLE) AS bucket_hi,
                   COUNT(*) AS cnt
            FROM b GROUP BY 1, 2
            ORDER BY event_type, bucket
        """,
        "hard_negatives": """
            WITH a AS (
              SELECT vec_id AS anchor_id,
                     CAST(embedding AS DOUBLE[]) AS av, label AS al
              FROM embeddings WHERE vec_id % 50 = 0),
            scored AS (
              SELECT a.anchor_id, e.vec_id, e.label,
                     ROUND(list_cosine_similarity(
                         CAST(e.embedding AS DOUBLE[]), a.av), 4) AS score
              FROM embeddings e, a
              WHERE e.vec_id <> a.anchor_id AND e.label <> a.al),
            ranked AS (
              SELECT *, CAST(row_number() OVER (PARTITION BY anchor_id
                   ORDER BY score DESC, vec_id) AS INT) AS rank
              FROM scored)
            SELECT anchor_id, vec_id, label, score, rank
            FROM ranked WHERE rank <= 5 ORDER BY anchor_id, rank
        """,
        "normalize_text": """
            SELECT doc_id,
                   CASE WHEN text IS NULL THEN NULL ELSE
                     trim(regexp_replace(lower(nfc_normalize(text)),
                                         '\\s+', ' ', 'g')) END AS text_norm
            FROM documents ORDER BY doc_id
        """,
        "ohlc": """
            WITH base AS (
              SELECT event_type AS k, date_trunc('day', ts)::DATE AS day,
                     ts, event_id,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS v
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
            b2 AS (
              SELECT *,
                     first_value(v) OVER (PARTITION BY k, day
                       ORDER BY ts, event_id) AS open_c,
                     first_value(v) OVER (PARTITION BY k, day
                       ORDER BY ts DESC, event_id DESC) AS close_c
              FROM base)
            SELECT k AS event_type, day,
                   MIN(open_c) AS open_cents, MAX(v) AS high_cents,
                   MIN(v) AS low_cents, MIN(close_c) AS close_cents,
                   COUNT(*) AS n_obs
            FROM b2 GROUP BY 1, 2 ORDER BY event_type, day
        """,
        "twap": """
            WITH base AS (
              SELECT event_type AS k, epoch_us(ts) AS t,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS v
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
            st AS (
              SELECT k, t, v,
                     lead(t) OVER (PARTITION BY k ORDER BY t, v) AS nxt
              FROM base),
            s AS (
              SELECT k, SUM(CAST(v AS HUGEINT) * (nxt - t)) AS wsum,
                     MIN(t) AS t0, MAX(t) AS t1, COUNT(*) AS n_obs
              FROM st GROUP BY k)
            SELECT k AS event_type, n_obs,
                   CASE WHEN t1 = t0 THEN NULL ELSE
                     CAST((wsum * 1000000) // (t1 - t0) AS BIGINT)
                   END AS twap_e6
            FROM s ORDER BY event_type
        """,
        "rolling_sum": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts)::DATE AS day,
                     CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100
                                         + 0.5) AS BIGINT))
                          AS BIGINT) AS value_cents
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
              GROUP BY 1, 2)
            SELECT event_type, day, value_cents,
                   CAST(SUM(value_cents) OVER (
                     PARTITION BY event_type
                     ORDER BY date_diff('day', DATE '1970-01-01', day)
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS rolling_cents
            FROM daily ORDER BY event_type, day
        """,
        "ewma": """
            WITH RECURSIVE daily AS (
              SELECT event_type AS k, date_trunc('day', ts)::DATE AS day,
                     CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100
                                         + 0.5) AS BIGINT))
                          AS BIGINT) AS vc
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
              GROUP BY 1, 2),
            idx AS (
              SELECT k, day, vc,
                     ROW_NUMBER() OVER (PARTITION BY k ORDER BY day) AS i
              FROM daily),
            r AS (
              SELECT k, day, vc, i, CAST(vc AS HUGEINT) * 1000000 AS s
              FROM idx WHERE i = 1
              UNION ALL
              SELECT idx.k, idx.day, idx.vc, idx.i,
                     (3 * CAST(idx.vc AS HUGEINT) * 1000000 + 7 * r.s)
                       // 10
              FROM r JOIN idx ON idx.k = r.k AND idx.i = r.i + 1)
            SELECT k AS event_type, day, vc AS value_cents,
                   CAST(s AS BIGINT) AS ewma_ucents
            FROM r ORDER BY event_type, day
        """,
        "pareto": """
            SELECT * FROM part a
            WHERE NOT EXISTS (
              SELECT 1 FROM part b
              WHERE b.p_size >= a.p_size
                AND b.p_retailprice <= a.p_retailprice
                AND (b.p_size > a.p_size
                     OR b.p_retailprice < a.p_retailprice))
            ORDER BY p_partkey
        """,
        "benford": """
            WITH src AS (
              SELECT regexp_extract(CAST(l_extendedprice AS VARCHAR),
                                    '([1-9])', 1) AS dg
              FROM lineitem WHERE l_extendedprice IS NOT NULL),
            c AS (
              SELECT CAST(dg AS INTEGER) AS digit, COUNT(*) AS n
              FROM src WHERE dg <> '' GROUP BY 1),
            t AS (SELECT SUM(n) AS tot FROM c),
            d(digit, expected_ppm) AS (VALUES
              (1, 301029), (2, 176091), (3, 124938), (4, 96910),
              (5, 79181), (6, 66946), (7, 57991), (8, 51152),
              (9, 45757))
            SELECT d.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
                   CAST((COALESCE(c.n, 0) * 1000000) // t.tot
                        AS BIGINT) AS actual_ppm,
                   CAST(d.expected_ppm AS BIGINT) AS expected_ppm
            FROM d LEFT JOIN c ON c.digit = d.digit, t
            ORDER BY d.digit
        """,
        "consistent_sample": """
            WITH so AS (
              SELECT * FROM orders
              WHERE substring(md5('cs:' || CAST(o_custkey AS VARCHAR)),
                              1, 4) < '1999'),
            sc AS (
              SELECT * FROM customer
              WHERE substring(md5('cs:' || CAST(c_custkey AS VARCHAR)),
                              1, 4) < '1999')
            SELECT c_mktsegment, COUNT(*) AS n_orders,
                   COUNT(DISTINCT c_custkey) AS n_customers
            FROM so JOIN sc ON so.o_custkey = sc.c_custkey
            GROUP BY 1 ORDER BY c_mktsegment
        """,
        "jl_sketch": """
            WITH sg AS (
              SELECT t1.k, t2.i,
                     CASE WHEN strpos('02468ace',
                          substr(md5('42:' || t1.k || ':' || t2.i), 1, 1))
                          > 0 THEN 1 ELSE -1 END AS s
              FROM generate_series(0, 15) t1(k),
                   generate_series(0, 63) t2(i)),
            q AS (
              SELECT vec_id, gi.i AS i,
                     CAST(FLOOR(CAST(embedding[gi.i + 1] AS DOUBLE)
                                * 1000 + 0.5) AS BIGINT) AS qv
              FROM embeddings, generate_series(0, 63) gi(i)
              WHERE embedding IS NOT NULL),
            d AS (
              SELECT q.vec_id, sg.k, SUM(sg.s * q.qv) AS c
              FROM q JOIN sg ON sg.i = q.i GROUP BY 1, 2)
            SELECT vec_id,
                   array_to_string(list(CAST(c AS BIGINT) ORDER BY k), ',')
                       AS sketch
            FROM d GROUP BY vec_id ORDER BY vec_id
        """,
        "embedding_covariance": """
            WITH q AS (
              SELECT vec_id, CAST(i AS INTEGER) AS i,
                     CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000
                                + 0.5) AS BIGINT) AS qv
              FROM embeddings, generate_series(1, 64) t(i)
              WHERE embedding IS NOT NULL AND len(embedding) = 64),
            nn AS (SELECT COUNT(*) AS n FROM embeddings
                   WHERE embedding IS NOT NULL AND len(embedding) = 64),
            s AS (SELECT i, SUM(qv) AS sv FROM q GROUP BY i),
            g AS (
              SELECT a.i AS i, b.i AS j,
                     SUM(CAST(a.qv AS HUGEINT) * b.qv) AS s_ij
              FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.i <= b.i
              GROUP BY 1, 2),
            t AS (
              SELECT g.i, g.j, nn.n,
                     sa.sv AS s_i, sb.sv AS s_j, g.s_ij,
                     CAST(nn.n AS HUGEINT) * g.s_ij
                       - CAST(sa.sv AS HUGEINT) * sb.sv AS nm
              FROM g JOIN s sa ON sa.i = g.i
                     JOIN s sb ON sb.i = g.j, nn)
            SELECT i, j, n,
                   CAST(s_i AS BIGINT) AS s_i,
                   CAST(s_j AS BIGINT) AS s_j,
                   CAST(s_ij AS BIGINT) AS s_ij,
                   CASE WHEN n = 0 THEN NULL ELSE
                     CAST((CASE WHEN nm < 0 THEN -1 ELSE 1 END)
                          * (abs(nm) // (CAST(n AS HUGEINT) * n))
                          AS BIGINT) END AS cov_e6
            FROM t ORDER BY i, j
        """,
        "covisitation": """
            WITH o AS (
              SELECT user_id, ts, event_id, event_type,
                     CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                            OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                               > 1800 * 1000000
                          THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            s AS (
              SELECT user_id, event_type,
                     SUM(new_s) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS seq
              FROM o),
            bi AS (
              SELECT DISTINCT
                     CAST(user_id AS VARCHAR) || '#' ||
                       CAST(seq AS VARCHAR) AS b,
                     event_type AS i
              FROM s),
            sz AS (SELECT b, COUNT(*) AS s FROM bi GROUP BY b),
            bi2 AS (SELECT bi.* FROM bi JOIN sz USING (b)
                    WHERE sz.s <= 100),
            supp AS (SELECT i, COUNT(*) AS n FROM bi2 GROUP BY i
                     HAVING COUNT(*) >= 5),
            bi3 AS (SELECT bi2.* FROM bi2 JOIN supp USING (i)),
            nb AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM bi3),
            p AS (
              SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS co
              FROM bi3 a JOIN bi3 b ON a.b = b.b AND a.i < b.i
              GROUP BY 1, 2 HAVING COUNT(*) >= 5)
            SELECT item_a, item_b, co, sa.n AS n_a, sb.n AS n_b,
                   CAST((CAST(co AS HUGEINT) * n_baskets * 1000000)
                        // (CAST(sa.n AS HUGEINT) * sb.n)
                        AS BIGINT) AS lift_e6,
                   CAST((CAST(co AS HUGEINT) * co * 1000000)
                        // (CAST(sa.n AS HUGEINT) * sb.n)
                        AS BIGINT) AS cos2_e6
            FROM p JOIN supp sa ON sa.i = p.item_a
                   JOIN supp sb ON sb.i = p.item_b, nb
            ORDER BY item_a, item_b
        """,
        "theil_sen": """
            WITH daily AS (
              SELECT event_type AS g, date_trunc('day', ts)::DATE AS d,
                     CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100
                                         + 0.5) AS BIGINT))
                          AS BIGINT) AS y
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
              GROUP BY 1, 2),
            dd AS (
              SELECT g, date_diff('day', DATE '1970-01-01', d) AS x, y
              FROM daily),
            p AS (
              SELECT a.g,
                     (CASE WHEN b.y - a.y < 0 THEN -1 ELSE 1 END)
                     * ((abs(b.y - a.y) * 1000000) // (b.x - a.x))
                       AS slope_e6
              FROM dd a JOIN dd b ON a.g = b.g AND a.x < b.x),
            m AS (SELECT g, CAST(median(slope_e6) AS DOUBLE) AS slope_e6
                  FROM p GROUP BY g),
            nd AS (SELECT g, COUNT(*) AS n_days FROM daily GROUP BY g)
            SELECT nd.g AS event_type, nd.n_days, m.slope_e6
            FROM nd LEFT JOIN m ON m.g = nd.g ORDER BY event_type
        """,
        "boilerplate": """
            WITH toks AS (
              SELECT doc_id,
                     list_transform(list_filter(
                         regexp_split_to_array(trim(text), '\\s+'),
                         t -> t != ''), t -> lower(t)) AS tk
              FROM documents WHERE text IS NOT NULL),
            grams AS (
              SELECT doc_id,
                     CASE WHEN len(tk) >= 8 THEN
                       list_distinct([array_to_string(tk[i:i+7], ' ')
                           for i in generate_series(1, len(tk) - 7)])
                     ELSE [] END AS gs
              FROM toks),
            ex AS (SELECT doc_id, unnest(gs) AS g FROM grams),
            gdf AS (SELECT g, COUNT(*) AS df FROM ex GROUP BY g),
            per AS (
              SELECT e.doc_id, COUNT(*) AS n_grams,
                     SUM(CASE WHEN gdf.df >= 2 THEN 1 ELSE 0 END)
                       AS dup_grams
              FROM ex e JOIN gdf USING (g) GROUP BY 1)
            SELECT doc_id, n_grams,
                   CAST(dup_grams AS BIGINT) AS dup_grams,
                   CAST((dup_grams * 1000000) // n_grams AS BIGINT)
                     AS dup_ppm
            FROM per ORDER BY doc_id
        """,
        "timeseries_report": """
            WITH base AS (
              SELECT event_type AS g, date_trunc('day', ts)::DATE AS d,
                     epoch_us(ts) AS t,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS y
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
            f AS (SELECT g, MIN(d) AS d0 FROM base GROUP BY g),
            xy AS (SELECT b.g,
                          CAST(date_diff('day', f.d0, b.d) AS BIGINT) AS x,
                          b.y
                   FROM base b JOIN f ON f.g = b.g),
            sums AS (
              SELECT g, COUNT(*) AS n,
                     SUM(CAST(x AS HUGEINT)) AS sx,
                     SUM(CAST(y AS HUGEINT)) AS sy,
                     SUM(CAST(x AS HUGEINT) * y) AS sxy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx,
                     SUM(CAST(y AS HUGEINT) * y) AS syy
              FROM xy GROUP BY g),
            ols AS (
              SELECT g,
                     CAST(n AS HUGEINT) * sxy - sx * sy AS cov,
                     CAST(n AS HUGEINT) * sxx - sx * sx AS varx,
                     CAST(n AS HUGEINT) * syy - sy * sy AS vary
              FROM sums),
            ols2 AS (
              SELECT g,
                     CASE WHEN varx = 0 THEN NULL ELSE
                       CAST((CASE WHEN cov < 0 THEN -1 ELSE 1 END)
                            * ((abs(cov) * 1000000) // abs(varx))
                            AS BIGINT) END AS slope_e6,
                     CASE WHEN varx * vary = 0 THEN NULL ELSE
                       CAST((cov * cov * 1000000) // (varx * vary)
                            AS BIGINT) END AS r2_e6
              FROM ols),
            med AS (
              SELECT g, COUNT(*) AS n,
                     CAST(median(y) AS DOUBLE) AS median_cents
              FROM base GROUP BY g),
            mad AS (
              SELECT b.g, MIN(m.n) AS n, MIN(m.median_cents) AS median_cents,
                     CAST(median(ABS(b.y - m.median_cents)) AS DOUBLE)
                       AS mad_cents
              FROM base b JOIN med m ON m.g = b.g GROUP BY b.g),
            st AS (
              SELECT g, t, y,
                     lead(t) OVER (PARTITION BY g ORDER BY t, y) AS nxt
              FROM base),
            tw AS (
              SELECT g, SUM(CAST(y AS HUGEINT) * (nxt - t)) AS wsum,
                     MIN(t) AS t0, MAX(t) AS t1
              FROM st GROUP BY g),
            tw2 AS (
              SELECT g, CASE WHEN t1 = t0 THEN NULL ELSE
                       CAST((wsum * 1000000) // (t1 - t0) AS BIGINT)
                     END AS twap_e6
              FROM tw)
            SELECT o.g AS event_type, mad.n, o.slope_e6, o.r2_e6,
                   mad.median_cents, mad.mad_cents, tw2.twap_e6
            FROM ols2 o JOIN mad ON mad.g = o.g JOIN tw2 ON tw2.g = o.g
            ORDER BY event_type
        """,
        "keywords": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_filter(string_split_regex(trim(text),
                                                           '\\s+'),
                                        x -> x <> '')) AS token
              FROM documents),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf
                   FROM toks GROUP BY doc_id, token),
            dfq AS (SELECT token, COUNT(*) AS df FROM tf
                    GROUP BY token HAVING COUNT(*) >= 5),
            nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
            scored AS (
              SELECT doc_id, token,
                     ROUND(tf * LN(CAST(n AS DOUBLE) / df), 6) AS tfidf
              FROM tf JOIN dfq USING (token), nd),
            ranked AS (
              SELECT doc_id, token, tfidf,
                     CAST(row_number() OVER (PARTITION BY doc_id
                          ORDER BY tfidf DESC, token) AS INT) AS rank
              FROM scored)
            SELECT doc_id, token, tfidf, rank
            FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
        """,
        "conversion_times": """
            WITH base AS (
              SELECT user_id AS u, event_type AS e, epoch_us(ts) AS t
              FROM events
              WHERE ts IS NOT NULL
                AND event_type IN ('signup', 'purchase')),
            a AS (
              SELECT u, MIN(CASE WHEN e = 'signup' THEN t END) AS ta
              FROM base GROUP BY u),
            b AS (
              SELECT base.u, MIN(t) AS tb
              FROM base JOIN a ON a.u = base.u
              WHERE e = 'purchase' AND t >= a.ta
              GROUP BY base.u),
            users AS (
              SELECT a.u, CAST((tb - ta) // 1000000 AS BIGINT) AS delay
              FROM a LEFT JOIN b ON b.u = a.u WHERE ta IS NOT NULL)
            SELECT COUNT(*) AS n_started,
                   COUNT(delay) AS n_converted,
                   CAST(quantile_cont(delay, 0.5) AS DOUBLE) AS p50_s,
                   CAST(quantile_cont(delay, 0.9) AS DOUBLE) AS p90_s
            FROM users
        """,
        "anomaly_days": """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts)::DATE AS day,
                     CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100
                                         + 0.5) AS BIGINT))
                          AS BIGINT) AS day_cents
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
              GROUP BY 1, 2),
            m AS (
              SELECT event_type,
                     CAST(median(day_cents) AS DOUBLE) AS median_cents
              FROM daily GROUP BY event_type),
            md AS (
              SELECT d.event_type, MIN(m.median_cents) AS median_cents,
                     CAST(median(ABS(d.day_cents - m.median_cents))
                          AS DOUBLE) AS mad_cents
              FROM daily d JOIN m ON m.event_type = d.event_type
              GROUP BY d.event_type)
            SELECT d.event_type, d.day, d.day_cents,
                   md.median_cents, md.mad_cents
            FROM daily d JOIN md ON md.event_type = d.event_type
            WHERE ABS(d.day_cents - md.median_cents) > 2.5 * md.mad_cents
            ORDER BY d.event_type, d.day
        """,
        "rfm": """
            WITH base AS (
              SELECT user_id AS u, date_trunc('day', ts)::DATE AS d,
                     COALESCE(CAST(FLOOR(CAST(value AS DOUBLE) * 100
                                         + 0.5) AS BIGINT), 0) AS c
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            users AS (
              SELECT u, MAX(d) AS last_d, COUNT(*) AS frequency,
                     CAST(SUM(c) AS BIGINT) AS monetary_cents
              FROM base GROUP BY u),
            mx AS (SELECT MAX(last_d) AS m FROM users),
            u2 AS (
              SELECT u,
                     CAST(date_diff('day', last_d, mx.m) AS BIGINT)
                       AS recency_days,
                     frequency, monetary_cents
              FROM users, mx),
            rs AS (
              SELECT v AS recency_days,
                     CAST((cum * 5) // t + 1 AS INT) AS r_score
              FROM (SELECT v,
                           COALESCE(SUM(c) OVER (ORDER BY v DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cum,
                           SUM(c) OVER () AS t
                    FROM (SELECT recency_days AS v, COUNT(*) AS c
                          FROM u2 GROUP BY 1))),
            fs AS (
              SELECT v AS frequency,
                     CAST((cum * 5) // t + 1 AS INT) AS f_score
              FROM (SELECT v,
                           COALESCE(SUM(c) OVER (ORDER BY v ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cum,
                           SUM(c) OVER () AS t
                    FROM (SELECT frequency AS v, COUNT(*) AS c
                          FROM u2 GROUP BY 1))),
            ms AS (
              SELECT v AS monetary_cents,
                     CAST((cum * 5) // t + 1 AS INT) AS m_score
              FROM (SELECT v,
                           COALESCE(SUM(c) OVER (ORDER BY v ASC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS cum,
                           SUM(c) OVER () AS t
                    FROM (SELECT monetary_cents AS v, COUNT(*) AS c
                          FROM u2 GROUP BY 1)))
            SELECT u AS user_id, recency_days, frequency, monetary_cents,
                   r_score AS recency_days_score,
                   f_score AS frequency_score,
                   m_score AS monetary_cents_score,
                   CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
                     || CAST(m_score AS VARCHAR) AS segment
            FROM u2 JOIN rs USING (recency_days)
                    JOIN fs USING (frequency)
                    JOIN ms USING (monetary_cents)
            ORDER BY user_id
        """,
        "abc_suppliers": """
            WITH totals AS (
              SELECT l_suppkey,
                     CAST(SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)
                                         * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS total_cents
              FROM lineitem
              WHERE l_extendedprice IS NOT NULL
                AND l_suppkey IS NOT NULL
              GROUP BY l_suppkey),
            g AS (SELECT SUM(CAST(total_cents AS HUGEINT)) AS gt
                  FROM totals),
            r AS (
              SELECT l_suppkey, total_cents,
                     CAST(COALESCE(SUM(total_cents) OVER (
                       ORDER BY total_cents DESC, l_suppkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS cum_before_cents
              FROM totals)
            SELECT l_suppkey, total_cents, cum_before_cents,
                   CASE WHEN CAST(cum_before_cents AS HUGEINT) * 1000000
                             < g.gt * 800000 THEN 'A'
                        WHEN CAST(cum_before_cents AS HUGEINT) * 1000000
                             < g.gt * 950000 THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM r, g ORDER BY l_suppkey
        """,
        "growth": """
            WITH base AS (
              SELECT DISTINCT user_id AS u,
                     date_trunc('day', ts)::DATE AS day
              FROM events
              WHERE ts IS NOT NULL AND user_id IS NOT NULL),
            f AS (SELECT u, MIN(day) AS d0 FROM base GROUP BY u),
            daily AS (
              SELECT b.day, COUNT(*) AS n_active,
                     CAST(SUM(CASE WHEN f.d0 = b.day THEN 1 ELSE 0 END)
                          AS BIGINT) AS n_new
              FROM base b JOIN f ON f.u = b.u GROUP BY b.day)
            SELECT day, n_active, n_new,
                   n_active - n_new AS n_returning,
                   CAST(SUM(n_new) OVER (ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cum_users
            FROM daily ORDER BY day
        """,
        "group_gini": """
            WITH base AS (
              SELECT event_type AS g,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS y
              FROM events WHERE value IS NOT NULL),
            r AS (
              SELECT g, y,
                     row_number() OVER (PARTITION BY g ORDER BY y) AS i
              FROM base),
            s AS (
              SELECT g, COUNT(*) AS n,
                     SUM(CAST(y AS HUGEINT)) AS sy,
                     SUM(CAST(i AS HUGEINT) * y) AS siy
              FROM r GROUP BY g)
            SELECT g AS event_type, n, CAST(sy AS BIGINT) AS sum_cents,
                   CASE WHEN n <= 1 OR CAST(n AS HUGEINT) * sy = 0
                        THEN NULL ELSE
                     CAST(((2 * siy - (n + 1) * sy) * 1000000)
                          // (CAST(n AS HUGEINT) * sy) AS BIGINT)
                   END AS gini_e6
            FROM s ORDER BY event_type
        """,
        "group_mad": """
            WITH base AS (
              SELECT event_type AS g,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS v
              FROM events WHERE value IS NOT NULL),
            m AS (
              SELECT g, COUNT(*) AS n,
                     CAST(median(v) AS DOUBLE) AS median_cents
              FROM base GROUP BY g)
            SELECT b.g AS event_type, MIN(m.n) AS n,
                   MIN(m.median_cents) AS median_cents,
                   CAST(median(ABS(b.v - m.median_cents)) AS DOUBLE)
                     AS mad_cents
            FROM base b JOIN m ON m.g = b.g
            GROUP BY b.g ORDER BY event_type
        """,
        "group_mode": """
            WITH c AS (
              SELECT source AS g, lang AS v, COUNT(*) AS c
              FROM documents
              WHERE lang IS NOT NULL AND source IS NOT NULL
              GROUP BY 1, 2),
            t AS (SELECT g, MAX(c) AS cnt FROM c GROUP BY g)
            SELECT c.g AS source, MIN(c.v) AS mode, t.cnt
            FROM c JOIN t ON t.g = c.g AND c.c = t.cnt
            GROUP BY 1, 3 ORDER BY source
        """,
        "item_cooccurrence": """
            WITH bi AS (
              SELECT DISTINCT l_orderkey AS b, l_partkey AS i
              FROM lineitem
              WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
            sz AS (SELECT b, COUNT(*) AS s FROM bi GROUP BY b),
            bi2 AS (SELECT bi.* FROM bi JOIN sz USING (b)
                    WHERE sz.s <= 100),
            supp AS (SELECT i, COUNT(*) AS n FROM bi2 GROUP BY i
                     HAVING COUNT(*) >= 5),
            bi3 AS (SELECT bi2.* FROM bi2 JOIN supp USING (i)),
            nb AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM bi3),
            p AS (
              SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS co
              FROM bi3 a JOIN bi3 b ON a.b = b.b AND a.i < b.i
              GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT item_a, item_b, co, sa.n AS n_a, sb.n AS n_b,
                   CAST((CAST(co AS HUGEINT) * n_baskets * 1000000)
                        // (CAST(sa.n AS HUGEINT) * sb.n)
                        AS BIGINT) AS lift_e6,
                   CAST((CAST(co AS HUGEINT) * co * 1000000)
                        // (CAST(sa.n AS HUGEINT) * sb.n)
                        AS BIGINT) AS cos2_e6
            FROM p JOIN supp sa ON sa.i = p.item_a
                   JOIN supp sb ON sb.i = p.item_b, nb
            ORDER BY item_a, item_b
        """,
        "equifreq_bins": """
            WITH d AS (
              SELECT CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS v,
                     COUNT(*) AS c
              FROM events WHERE value IS NOT NULL GROUP BY 1),
            t AS (SELECT SUM(c) AS tot FROM d),
            b AS (
              SELECT v, c,
                     COALESCE(SUM(c) OVER (ORDER BY v
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS cum
              FROM d)
            SELECT CAST((cum * 10) // tot AS BIGINT) AS bin,
                   MIN(v) AS lo_cents, MAX(v) AS hi_cents,
                   COUNT(*) AS n_values, CAST(SUM(c) AS BIGINT) AS cnt
            FROM b, t GROUP BY 1 ORDER BY bin
        """,
        "bigram_lm": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(string_split_regex(trim(lower(text)),
                                                    '\\s+'),
                                 x -> x <> '') AS ws
              FROM documents WHERE text IS NOT NULL),
            tr AS (SELECT doc_id, ws FROM toks WHERE len(ws) >= 2),
            big AS (
              SELECT doc_id,
                     unnest(ws[1:len(ws) - 1]) AS w1,
                     unnest(ws[2:len(ws)]) AS w2
              FROM tr),
            cb AS (SELECT w1, w2, COUNT(*) AS c12 FROM big GROUP BY 1, 2),
            cu AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY 1),
            vv AS (SELECT COUNT(DISTINCT t) AS v
                   FROM (SELECT unnest(ws) AS t FROM tr)),
            p AS (
              SELECT b.doc_id,
                     ((cb.c12 + 1) * 1000000) // (cu.c1 + vv.v) AS p_e6
              FROM big b
              JOIN cb ON b.w1 = cb.w1 AND b.w2 = cb.w2
              JOIN cu ON b.w1 = cu.w1, vv)
            SELECT doc_id, COUNT(*) AS n_bigrams,
                   CAST(SUM(p_e6) AS BIGINT) AS sum_p_e6,
                   CAST(SUM(p_e6) // COUNT(*) AS BIGINT) AS avg_p_e6
            FROM p GROUP BY doc_id ORDER BY doc_id
        """,
        "gap_fill": """
            WITH daily AS (
              SELECT user_id % 50 AS k,
                     date_trunc('day', ts)::DATE AS day,
                     CAST(SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 100
                                         + 0.5) AS BIGINT))
                          AS BIGINT) AS obs
              FROM events
              WHERE event_type = 'purchase'
                AND ts IS NOT NULL AND value IS NOT NULL
              GROUP BY 1, 2),
            spine AS (
              SELECT k, unnest(generate_series(MIN(day), MAX(day),
                                               INTERVAL 1 DAY))::DATE AS day
              FROM daily GROUP BY k),
            j AS (
              SELECT s.k, s.day, d.obs
              FROM spine s LEFT JOIN daily d
                ON d.k = s.k AND d.day = s.day)
            SELECT k, day,
                   last_value(obs IGNORE NULLS) OVER (
                     PARTITION BY k ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS value_cents,
                   obs IS NULL AS filled
            FROM j ORDER BY k, day
        """,
        "group_ols": """
            WITH base AS (
              SELECT event_type AS g, date_trunc('day', ts)::DATE AS d,
                     CAST(FLOOR(CAST(value AS DOUBLE) * 100 + 0.5)
                          AS BIGINT) AS y
              FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
            f AS (SELECT g, MIN(d) AS d0 FROM base GROUP BY g),
            xy AS (
              SELECT b.g, CAST(date_diff('day', f.d0, b.d) AS BIGINT) AS x,
                     b.y
              FROM base b JOIN f ON f.g = b.g),
            s AS (
              SELECT g, COUNT(*) AS n,
                     SUM(CAST(x AS HUGEINT)) AS sx,
                     SUM(CAST(y AS HUGEINT)) AS sy,
                     SUM(CAST(x AS HUGEINT) * y) AS sxy,
                     SUM(CAST(x AS HUGEINT) * x) AS sxx,
                     SUM(CAST(y AS HUGEINT) * y) AS syy
              FROM xy GROUP BY g),
            t AS (
              SELECT g, n,
                     CAST(n AS HUGEINT) * sxy - sx * sy AS cov,
                     CAST(n AS HUGEINT) * sxx - sx * sx AS varx,
                     CAST(n AS HUGEINT) * syy - sy * sy AS vary,
                     sy * sxx - sx * sxy AS inum
              FROM s)
            SELECT g AS event_type, n,
                   CASE WHEN varx = 0 THEN NULL ELSE
                     CAST((CASE WHEN cov < 0 THEN -1 ELSE 1 END)
                          * ((abs(cov) * 1000000) // abs(varx))
                          AS BIGINT) END AS slope_e6,
                   CASE WHEN varx = 0 THEN NULL ELSE
                     CAST((CASE WHEN inum < 0 THEN -1 ELSE 1 END)
                          * ((abs(inum) * 1000000) // abs(varx))
                          AS BIGINT) END AS intercept_e6,
                   CASE WHEN varx * vary = 0 THEN NULL ELSE
                     CAST((cov * cov * 1000000) // (varx * vary)
                          AS BIGINT) END AS r2_e6
            FROM t ORDER BY event_type
        """,
        "cc_incremental": """
            WITH RECURSIVE
            base AS (
              SELECT doc_id AS src, doc_id + 1 AS dst FROM documents
              WHERE doc_id % 10 < 4
              UNION ALL
              SELECT doc_id, doc_id * 2 FROM documents
              WHERE doc_id % 7 = 0 AND doc_id > 0),
            sym AS (
              SELECT src AS a, dst AS b FROM base WHERE src != dst
              UNION
              SELECT dst, src FROM base WHERE src != dst),
            walk(node, comp) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.node)
            SELECT node, MIN(comp) AS comp FROM walk
            GROUP BY node ORDER BY node
        """,
        "sorted_neighborhood": """
            WITH r AS (
              SELECT doc_id, n_chars,
                     ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rn
              FROM documents WHERE n_chars IS NOT NULL)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   a.n_chars AS key_a, b.n_chars AS key_b,
                   CAST(b.rn - a.rn AS INTEGER) AS dist
            FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 2
            ORDER BY id_a, id_b
        """,
        "transitions": """
            WITH o AS (
              SELECT lag(event_type) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS f,
                     event_type AS t
              FROM events),
            s AS (SELECT f AS from_state, t AS to_state,
                         COUNT(*) AS cnt
                  FROM o WHERE f IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT from_state,
                           CAST(SUM(cnt) AS BIGINT) AS tt
                    FROM s GROUP BY 1)
            SELECT from_state, to_state, cnt,
                   CAST(cnt * 1000000 // tt AS BIGINT) AS prob_e6
            FROM s JOIN tot USING (from_state)
            ORDER BY from_state, to_state
        """,
        "dq_embeddings": """
            WITH v AS (SELECT * FROM embeddings)
            SELECT rule, kind, n_violations FROM (
              SELECT 'vector(embedding,64)' AS rule, 'vector' AS kind,
                     CAST(COUNT(CASE WHEN embedding IS NOT NULL AND
                       (len(embedding) <> 64 OR len(list_filter(
                           embedding, x -> x IS NULL
                           OR isnan(CAST(x AS DOUBLE)))) > 0)
                       THEN 1 END) AS BIGINT) AS n_violations
              FROM v
              UNION ALL
              SELECT 'not_null(embedding)', 'not_null',
                     CAST(COUNT(CASE WHEN embedding IS NULL THEN 1 END)
                          AS BIGINT)
              FROM v
              UNION ALL
              SELECT 'in_range(label,0,9)', 'in_range',
                     CAST(COUNT(CASE WHEN label IS NOT NULL
                          AND (label < 0 OR label > 9) THEN 1 END)
                          AS BIGINT)
              FROM v
              UNION ALL
              SELECT 'unique(vec_id)', 'unique',
                     CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
              FROM (SELECT vec_id, COUNT(*) AS n FROM v
                    GROUP BY vec_id HAVING COUNT(*) > 1))
            ORDER BY rule
        """,
        "dq_events": """
            SELECT 'foreign_key(user_id)' AS rule,
                   'foreign_key' AS kind,
                   CAST(COUNT(*) AS BIGINT) AS n_violations
            FROM events e
            WHERE user_id IS NOT NULL AND NOT EXISTS
              (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
            UNION ALL
            SELECT 'in_range(value,0,100)', 'in_range',
                   COUNT(*) FILTER (value IS NOT NULL
                                    AND (value < 0 OR value > 100))
            FROM events
            UNION ALL
            SELECT 'matches(event_type)', 'matches',
                   COUNT(*) FILTER (event_type IS NOT NULL
                     AND NOT regexp_full_match(event_type,
                                               '(?:[a-z_0-9]+)'))
            FROM events
            UNION ALL
            SELECT 'not_null(event_id)', 'not_null',
                   COUNT(*) FILTER (event_id IS NULL) FROM events
            UNION ALL
            SELECT 'unique(event_id)', 'unique',
                   CAST(COALESCE(SUM(n - 1), 0) AS BIGINT)
            FROM (SELECT COUNT(*) AS n FROM events
                  GROUP BY event_id HAVING COUNT(*) > 1)
            ORDER BY rule
        """,
        "asof_nearest": """
            WITH l AS (
              SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'click'),
            r AS (
              SELECT user_id, ts, MAX(value) AS p_value FROM events
              WHERE event_type = 'purchase' GROUP BY user_id, ts),
            j AS (
              SELECT l.event_id, l.user_id, l.ts, r.p_value,
                     r.ts AS rts,
                     abs(epoch_us(l.ts) - epoch_us(r.ts)) AS d,
                     CASE WHEN r.ts <= l.ts THEN 0 ELSE 1 END AS side
              FROM l JOIN r USING (user_id)),
            best AS (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id
                            ORDER BY d, side) AS rn
              FROM j)
            SELECT l.event_id, l.user_id, l.ts, b.p_value,
                   b.rts AS p_ts
            FROM l LEFT JOIN best b
              ON l.event_id = b.event_id AND b.rn = 1
            ORDER BY l.event_id
        """,
        "stream_dedup": """
            SELECT DISTINCT user_id, event_type FROM events
            ORDER BY user_id, event_type
        """,
        "ngram_logcount": r"""
            WITH t AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(lower(text)),
                                                       '\s+'),
                                 x -> x != '') AS ws
              FROM documents),
            g AS (
              SELECT doc_id,
                     unnest(list_transform(range(1, len(ws)),
                       i -> ws[CAST(i AS INT)] || ' '
                            || ws[CAST(i AS INT) + 1])) AS gram
              FROM t WHERE len(ws) >= 2),
            c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram)
            SELECT g.doc_id,
                   CAST(COUNT(*) AS INT) AS n_grams,
                   CAST(SUM(CAST(FLOOR(log2(c.cnt)) AS BIGINT))
                        AS BIGINT) AS logcount_sum
            FROM g JOIN c USING (gram)
            GROUP BY g.doc_id ORDER BY g.doc_id
        """,
        "semantic_dedup": """
            WITH q AS (
              SELECT vec_id,
                     list_transform(embedding, x ->
                       CAST(FLOOR(CAST(x AS DOUBLE) * 1000 + 0.5)
                            AS BIGINT)) AS qv
              FROM embeddings),
            c0 AS (
              SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1
                          AS BIGINT) AS cid, qv AS cv
              FROM (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 4)),
            a0 AS (
              SELECT vec_id, cl FROM (
                SELECT q.vec_id, c0.cid AS cl,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_sum(list_transform(range(1, 65),
                           i -> (q.qv[CAST(i AS INT)]
                                 - c0.cv[CAST(i AS INT)])
                                * (q.qv[CAST(i AS INT)]
                                   - c0.cv[CAST(i AS INT)]))),
                           c0.cid) AS rn
                FROM q CROSS JOIN c0) WHERE rn = 1),
            e0 AS (
              SELECT a0.cl, d.i, q.qv[CAST(d.i AS INT)] AS v
              FROM a0 JOIN q USING (vec_id)
              CROSS JOIN (SELECT unnest(range(1, 65)) AS i) d),
            c1 AS (
              SELECT cid, list(cv ORDER BY i) AS cv FROM (
                SELECT cl AS cid, i,
                       CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*))
                            AS BIGINT) AS cv
                FROM e0 GROUP BY cl, i)
              GROUP BY cid),
            a1 AS (
              SELECT vec_id, cl FROM (
                SELECT q.vec_id, c1.cid AS cl,
                       row_number() OVER (PARTITION BY q.vec_id
                         ORDER BY list_sum(list_transform(range(1, 65),
                           i -> (q.qv[CAST(i AS INT)]
                                 - c1.cv[CAST(i AS INT)])
                                * (q.qv[CAST(i AS INT)]
                                   - c1.cv[CAST(i AS INT)]))),
                           c1.cid) AS rn
                FROM q CROSS JOIN c1) WHERE rn = 1),
            dup AS (
              SELECT DISTINCT ab.vec_id
              FROM a1 aa JOIN a1 ab
                ON aa.cl = ab.cl AND aa.vec_id < ab.vec_id
              JOIN q qa ON qa.vec_id = aa.vec_id
              JOIN q qb ON qb.vec_id = ab.vec_id
              WHERE list_sum(list_transform(range(1, 65), i ->
                      qa.qv[CAST(i AS INT)] * qb.qv[CAST(i AS INT)])) > 0
                AND list_sum(list_transform(range(1, 65), i ->
                      qa.qv[CAST(i AS INT)] * qb.qv[CAST(i AS INT)]))
                    * list_sum(list_transform(range(1, 65), i ->
                      qa.qv[CAST(i AS INT)] * qb.qv[CAST(i AS INT)]))
                    * 1000000
                    >= 202500
                       * list_sum(list_transform(range(1, 65), i ->
                           qa.qv[CAST(i AS INT)] * qa.qv[CAST(i AS INT)]))
                       * list_sum(list_transform(range(1, 65), i ->
                           qb.qv[CAST(i AS INT)] * qb.qv[CAST(i AS INT)]))
            )
            SELECT e.vec_id, e.label FROM embeddings e
            WHERE e.vec_id NOT IN (SELECT vec_id FROM dup)
            ORDER BY e.vec_id
        """,
        "corpus_pipeline": r"""
            SELECT lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(len(list_filter(
                        regexp_split_to_array(trim(text), '\s+'),
                        t -> t != ''))) AS BIGINT) AS total_tokens,
                   CAST(SUM(length(text)) AS BIGINT) AS total_chars
            FROM (SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY text
                                                 ORDER BY doc_id) AS rn
                    FROM documents WHERE length(text) >= 50) WHERE rn = 1)
            GROUP BY lang, source ORDER BY lang, source
        """,
        "multimodal_frames": """
            SELECT doc_id AS item_id,
                   CAST(CEIL(GREATEST((strlen(text) +
                          CASE WHEN doc_id % 3 = 0 THEN 4 ELSE 0 END) // 4096,
                          1) / 2.0) AS BIGINT) AS n_frames
            FROM documents ORDER BY item_id
        """,
        "regex_funcs": """
            SELECT o_orderkey,
                   regexp_extract(o_orderpriority, '^(?:([0-9])-(.*))$', 1)
                       AS pri_num,
                   regexp_extract(o_orderpriority, '^(?:([0-9])-(.*))$', 2)
                       AS pri_word,
                   CASE WHEN regexp_full_match(o_orderpriority, 'URGENT-(.*)')
                        THEN regexp_extract(o_orderpriority,
                                            '^(?:URGENT-(.*))$', 1)
                   END AS no_match,
                   CASE WHEN regexp_full_match(o_orderpriority, '([0-9])-(.*)')
                        THEN regexp_extract(o_orderpriority,
                                            '^(?:([0-9])-(.*))$', 1)
                   END AS ag_1,
                   CASE WHEN regexp_full_match(o_orderpriority, '([0-9])-(.*)')
                        THEN regexp_extract(o_orderpriority,
                                            '^(?:([0-9])-(.*))$', 2)
                   END AS ag_2,
                   array_to_string(string_split(o_orderpriority, '-'), '|')
                       AS parts
            FROM orders ORDER BY o_orderkey
        """,
        "string_funcs2": """
            SELECT c_custkey,
                   CAST(CASE WHEN strpos(reverse(c_name), '0') = 0 THEN -1
                        ELSE length(c_name) - strpos(reverse(c_name), '0')
                        END AS INT) AS last0,
                   LOWER(substring(c_name, 1, 1)) || substring(c_name, 2)
                       AS lcf,
                   ends_with(c_name, '5') AS ew5,
                   LOWER(c_mktsegment) = 'building' AS is_bldg,
                   printf('%05d:%s', c_custkey, c_mktsegment) AS tag,
                   ROUND_EVEN(c_acctbal, 0) AS bal0,
                   TRIM('  ' || c_name || '  ') AS tr,
                   LTRIM('  ' || c_name || '  ') AS ltr,
                   RTRIM('  ' || c_name || '  ') AS rtr
            FROM customer ORDER BY c_custkey
        """,
        "datetime_funcs2": """
            SELECT o_orderkey,
                   o_orderdate + INTERVAL 1 DAY + INTERVAL 2 HOUR
                       AS plus_1d2h,
                   o_orderdate - INTERVAL 2 MONTH AS minus_2m,
                   CAST(trunc(
                     (year(o_orderdate)*12 + month(o_orderdate)
                      - (1995*12 + 6))
                     + (day(o_orderdate) - 15) / 31.0) AS BIGINT) AS mb,
                   CAST(trunc((
                     (year(o_orderdate)*12 + month(o_orderdate)
                      - (1995*12 + 6))
                     + (day(o_orderdate) - 15) / 31.0) / 12.0) AS BIGINT)
                       AS yb,
                   CAST(trunc((epoch(o_orderdate) -
                               epoch(TIMESTAMP '1995-06-15')) / 604800.0)
                        AS BIGINT) AS wb,
                   CAST(weekofyear(o_orderdate) AS INT) AS wk,
                   CAST(isoyear(o_orderdate) AS INT) AS wky,
                   CAST(trunc(epoch(o_orderdate)) AS BIGINT) AS ut,
                   CAST(trunc(epoch(o_orderdate)) * 1000 AS BIGINT) AS ms,
                   strftime(o_orderdate, '%Y/%m/%d') AS fmt
            FROM orders ORDER BY o_orderkey
        """,
        "bag_string": """
            SELECT n_regionkey,
                   string_agg(n_name, ',' ORDER BY n_name) AS names,
                   COUNT(*) AS n
            FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
        """,
        "tuple_construct": """
            SELECT r_regionkey,
                   r_regionkey AS pair_key,
                   r_name AS pair_name,
                   r_name AS name_again
            FROM region ORDER BY r_regionkey
        """,
        "macro_params_script": """
            SELECT l_returnflag, COUNT(*) AS cnt, SUM(l_quantity) AS qty
            FROM lineitem WHERE l_quantity >= 30.0
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "json_roundtrip": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
                   CAST(n_regionkey AS BIGINT) AS n_regionkey
            FROM nation ORDER BY n_nationkey
        """,
        "orc_roundtrip": """
            SELECT s_suppkey, s_name, s_nationkey
            FROM supplier ORDER BY s_suppkey
        """,
        "text_loader": """
            SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name
            FROM nation ORDER BY n_nationkey
        """,
        "stats_agg": """
            SELECT l_returnflag,
                   FLOOR((corr(l_quantity, l_extendedprice))*1000000
                         + 0.5)/1000000 AS cor_qp,
                   FLOOR((covar_samp(l_quantity, l_extendedprice))*100
                         + 0.5)/100 AS cov_qp,
                   FLOOR((var_samp(l_quantity))*100 + 0.5)/100 AS var_q
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "skew_salted": """
            SELECT o_orderpriority, COUNT(*) AS cnt,
                   FLOOR(SUM(l_quantity)*100 + 0.5) AS qty_x100
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "pivot_events": """
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                        AS BIGINT) AS click,
                   CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END)
                        AS BIGINT) AS error,
                   CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                        AS BIGINT) AS purchase,
                   CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END)
                        AS BIGINT) AS signup,
                   CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END)
                        AS BIGINT) AS view
            FROM events GROUP BY day ORDER BY day
        """,
        "unpivot_events": """
            SELECT CAST(ts AS DATE) AS day, event_type,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM events
            WHERE event_type IN ('click', 'error', 'purchase',
                                 'signup', 'view')
            GROUP BY day, event_type
            ORDER BY day, event_type
        """,
        "cohort": """
            WITH d AS (
              SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d
              FROM events),
            f AS (SELECT u, MIN(d) AS cohort FROM d GROUP BY u)
            SELECT f.cohort,
                   CAST(date_diff('day', f.cohort, d.d) AS INT)
                       AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM d JOIN f ON d.u = f.u
            GROUP BY f.cohort, day_offset
            ORDER BY f.cohort, day_offset
        """,
        "fuzzy_pairs": """
            WITH ex AS (
              SELECT c_custkey AS id, c_name AS s,
                     unnest(list_distinct(list_prepend(c_name,
                       [substring(c_name, 1, CAST(i AS INT) - 1)
                        || substring(c_name, CAST(i AS INT) + 1,
                                     length(c_name))
                        for i in generate_series(1, length(c_name))])))
                       AS v
              FROM customer WHERE c_name IS NOT NULL)
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM ex a JOIN ex b ON a.v = b.v AND a.id < b.id
            WHERE levenshtein(a.s, b.s) <= 1
            ORDER BY id_a, id_b
        """,
        "funnel": """
            WITH s1 AS (
              SELECT user_id AS u, MIN(ts) AS t FROM events
              WHERE event_type = 'view' GROUP BY user_id),
            s2 AS (
              SELECT e.user_id AS u, MIN(e.ts) AS t
              FROM events e JOIN s1 ON e.user_id = s1.u
              WHERE e.event_type = 'click' AND e.ts > s1.t
              GROUP BY e.user_id),
            s3 AS (
              SELECT e.user_id AS u, MIN(e.ts) AS t
              FROM events e JOIN s2 ON e.user_id = s2.u
              WHERE e.event_type = 'purchase' AND e.ts > s2.t
              GROUP BY e.user_id)
            SELECT * FROM (
              SELECT 1 AS step_idx, 'view' AS step,
                     CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
              UNION ALL
              SELECT 2, 'click', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
              UNION ALL
              SELECT 3, 'purchase',
                     CAST((SELECT COUNT(*) FROM s3) AS BIGINT)) f
            ORDER BY step_idx
        """,
        "scd2": """
            WITH o AS (
              SELECT user_id, ts, event_type,
                     LAG(event_type) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, event_type) AS pe
              FROM events),
            runs AS (
              SELECT user_id, event_type, ts AS valid_from
              FROM o WHERE pe IS DISTINCT FROM event_type)
            SELECT user_id, event_type, valid_from,
                   LEAD(valid_from) OVER (
                     PARTITION BY user_id
                     ORDER BY valid_from, event_type) AS valid_to
            FROM runs ORDER BY user_id, valid_from, event_type
        """,
        "merge_upsert": """
            WITH base AS (
              SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
            changed AS (
              SELECT o_orderkey FROM base
              WHERE o_orderkey % 7 = 0 OR o_orderkey % 13 = 0
              UNION
              SELECT o_orderkey + 100000000 FROM base
              WHERE o_orderkey % 31 = 0),
            applied AS (
              SELECT o_orderkey, 'U' AS o_orderstatus,
                     o_totalprice * 3 AS o_totalprice
              FROM base WHERE o_orderkey % 7 = 0 AND o_orderkey % 13 <> 0
              UNION ALL
              SELECT o_orderkey + 100000000, 'N', o_totalprice
              FROM base WHERE o_orderkey % 31 = 0)
            SELECT * FROM (
              SELECT * FROM base
              WHERE o_orderkey NOT IN (SELECT o_orderkey FROM changed)
              UNION ALL
              SELECT * FROM applied) m
            ORDER BY o_orderkey
        """,
        "stream_upsert": """
            WITH base AS (
              SELECT o_orderkey AS id, CAST(o_custkey AS BIGINT) AS val,
                     CAST(0 AS BIGINT) AS ver
              FROM orders WHERE o_orderkey % 3 = 0),
            ch AS (
              SELECT o_orderkey AS id,
                     CAST(o_custkey + 1000000 AS BIGINT) AS val,
                     CAST(1 AS BIGINT) AS ver
              FROM orders WHERE o_orderkey % 4 = 0
              UNION ALL
              SELECT o_orderkey, CAST(o_custkey + 2000000 AS BIGINT),
                     CAST(2 AS BIGINT)
              FROM orders WHERE o_orderkey % 8 = 0),
            win AS (
              SELECT id, val, ver FROM (
                SELECT *, ROW_NUMBER() OVER (
                  PARTITION BY id ORDER BY ver DESC, val DESC) AS rn
                FROM ch) WHERE rn = 1)
            SELECT id, val, ver FROM base
            WHERE id NOT IN (SELECT id FROM ch)
            UNION ALL SELECT * FROM win
            ORDER BY id
        """,
        "snapshot_diff": """
            WITH o AS (
              SELECT c_custkey, c_mktsegment, c_acctbal FROM customer
              WHERE c_custkey < 1200),
            n AS (
              SELECT c_custkey,
                     CASE WHEN c_custkey % 7 = 0
                          THEN c_mktsegment || '*'
                          ELSE c_mktsegment END AS c_mktsegment,
                     c_acctbal
              FROM customer WHERE c_custkey > 300)
            SELECT COALESCE(o.c_custkey, n.c_custkey) AS c_custkey,
                   CASE WHEN o.c_custkey IS NULL THEN 'added'
                        WHEN n.c_custkey IS NULL THEN 'removed'
                        ELSE 'changed' END AS change_type,
                   o.c_mktsegment AS old_c_mktsegment,
                   n.c_mktsegment AS new_c_mktsegment,
                   o.c_acctbal AS old_c_acctbal,
                   n.c_acctbal AS new_c_acctbal
            FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
            WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
               OR NOT (o.c_mktsegment IS NOT DISTINCT FROM n.c_mktsegment
                       AND o.c_acctbal IS NOT DISTINCT FROM n.c_acctbal)
            ORDER BY c_custkey
        """,
        "leakage_safe_split": """
            WITH RECURSIVE
            pref AS (
              SELECT doc_id, substring(text, 1, 40) AS p
              FROM documents WHERE text IS NOT NULL),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b
              FROM pref a JOIN pref b
                ON a.p = b.p AND a.doc_id < b.doc_id),
            sym AS (
              SELECT id_a AS a, id_b AS b FROM pairs WHERE id_a != id_b
              UNION
              SELECT id_b, id_a FROM pairs WHERE id_a != id_b),
            walk(node, comp) AS (
              SELECT a, a FROM sym
              UNION
              SELECT s.a, w.comp FROM sym s JOIN walk w ON s.b = w.node),
            comp AS (SELECT node, MIN(comp) AS comp FROM walk GROUP BY node),
            bucketed AS (
              SELECT d.doc_id,
                     ('0x' || substring(md5('r5' ||
                        CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)),
                        1, 15))::BIGINT % 100 AS bucket
              FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
            SELECT doc_id,
                   CASE WHEN bucket < 80 THEN 'train'
                        WHEN bucket < 90 THEN 'valid'
                        ELSE 'test' END AS split
            FROM bucketed ORDER BY doc_id
        """,
        "k_anonymity": """
            SELECT c_nationkey, c_mktsegment,
                   count(*) AS group_size
            FROM customer
            GROUP BY c_nationkey, c_mktsegment
            HAVING count(*) < 8
            ORDER BY group_size, c_nationkey, c_mktsegment
        """,
        "containment": """
            -- Replays the engine's exact-dup PRE-COLLAPSE (dedup.py
            -- _exact_text_groups): shingle + self-join over one
            -- representative per DISTINCT text, df weighted by group
            -- size, then expand rep-level directed pairs to members.
            -- Semantically identical to the direct 50k-doc replay
            -- (containment depends only on the texts) but the join is
            -- sigma df^2 over distinct texts — this is what makes the
            -- sf1 oracle runnable (the un-collapsed replay spilled
            -- >79 GB in DuckDB at sf1; r7 verdict item 4).
            WITH nn AS (SELECT doc_id, text FROM documents
                        WHERE text IS NOT NULL),
            grp AS (SELECT text, MIN(doc_id) AS gid, COUNT(*) AS gn
                    FROM nn GROUP BY text),
            mem AS (SELECT n.doc_id, g.gid, g.gn
                    FROM nn n JOIN grp g USING (text)),
            sh AS (SELECT gid, gn, list_distinct([substring(text, i, 8)
                      for i in generate_series(
                          1, greatest(length(text) - 7, 1))]) AS s
                   FROM grp),
            ex AS (SELECT gid, gn, unnest(s) AS g FROM sh),
            cap AS (SELECT greatest(50, count(*) // 10) AS c FROM nn),
            dfreq AS (SELECT g, SUM(gn) AS df, COUNT(*) AS rdf
                      FROM ex GROUP BY g),
            kept AS (SELECT e.gid, e.g, d.rdf
                     FROM ex e JOIN dfreq d USING (g), cap
                     WHERE d.df <= cap.c),
            sz AS (SELECT gid, count(*) AS n FROM kept GROUP BY gid),
            shared AS (
              SELECT a.gid AS ra, b.gid AS rb, count(*) AS c
              FROM kept a JOIN kept b USING (g)
              WHERE a.rdf >= 2 AND a.gid < b.gid GROUP BY 1, 2),
            directed AS (
              SELECT ra, rb, CAST(c AS DOUBLE) / sa.n AS ct
              FROM shared JOIN sz sa ON sa.gid = shared.ra
              UNION ALL
              SELECT rb, ra, CAST(c AS DOUBLE) / sb.n
              FROM shared JOIN sz sb ON sb.gid = shared.rb),
            cross_pairs AS (
              SELECT ma.doc_id AS id_a, mb.doc_id AS id_b, d.ct
              FROM directed d JOIN mem ma ON ma.gid = d.ra
                              JOIN mem mb ON mb.gid = d.rb
              WHERE d.ct >= 0.6),
            within AS (
              SELECT m1.doc_id AS id_a, m2.doc_id AS id_b,
                     CAST(1.0 AS DOUBLE) AS ct
              FROM mem m1 JOIN mem m2
                   ON m1.gid = m2.gid AND m1.doc_id <> m2.doc_id
              JOIN (SELECT DISTINCT gid FROM kept) kk
                   ON kk.gid = m1.gid
              WHERE m1.gn > 1)
            SELECT id_a, id_b, ROUND(ct, 4) AS containment
            FROM (SELECT * FROM cross_pairs
                  UNION ALL SELECT * FROM within)
            ORDER BY id_a, id_b
        """,
        "shard_plan": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(list_filter(
                          regexp_split_to_array(trim(text), '\s+'),
                          x -> x != '')) AS BIGINT) AS n,
                     md5('7:' || CAST(doc_id AS VARCHAR)) AS k
              FROM documents WHERE text IS NOT NULL),
            p AS (
              SELECT doc_id, n,
                     CAST(FLOOR(COALESCE(SUM(n) OVER (
                           ORDER BY k, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0)
                          / 2000.0) AS BIGINT) AS shard_id
              FROM t)
            SELECT shard_id, COUNT(*) AS n_docs,
                   CAST(SUM(n) AS BIGINT) AS n_tokens
            FROM p GROUP BY shard_id ORDER BY shard_id
        """,
        "shard_plan_incremental": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(list_filter(
                          regexp_split_to_array(trim(text), '\s+'),
                          x -> x != '')) AS BIGINT) AS n,
                     md5('7:' || CAST(doc_id AS VARCHAR)) AS k
              FROM documents WHERE text IS NOT NULL),
            base AS (SELECT COALESCE(SUM(n), 0) AS b
                     FROM t WHERE doc_id % 5 != 0),
            p AS (
              SELECT doc_id, n,
                     CAST(FLOOR((COALESCE(SUM(n) OVER (
                           ORDER BY k, doc_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING), 0)
                           + (SELECT b FROM base))
                          / 2000.0) AS BIGINT) AS shard_id
              FROM t WHERE doc_id % 5 = 0)
            SELECT shard_id, COUNT(*) AS n_docs,
                   CAST(SUM(n) AS BIGINT) AS n_tokens
            FROM p GROUP BY shard_id ORDER BY shard_id
        """,
        "compaction_plan": """
            WITH inv AS (
              SELECT source || '/' || lang AS path,
                     CAST(SUM(length(text)) AS BIGINT) AS size_bytes
              FROM documents GROUP BY source, lang)
            SELECT path, size_bytes,
                   CAST(FLOOR(COALESCE(SUM(size_bytes) OVER (
                         ORDER BY path
                         ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0)
                        / 20000.0) AS BIGINT) AS compaction_group
            FROM inv ORDER BY path
        """,
        "fingerprint_table": """
            WITH d AS (
              SELECT ('0x' || substring(md5(
                       CAST(o_orderkey AS VARCHAR) || chr(1) ||
                       CAST(o_custkey AS VARCHAR) || chr(1) ||
                       o_orderstatus || chr(1) ||
                       o_orderpriority), 1, 15))::BIGINT AS dv
              FROM orders)
            SELECT CAST(dv % 64 AS INT) AS bucket,
                   COUNT(*) AS n_rows,
                   CAST(CAST(SUM(CAST(dv AS DECIMAL(38,0)))
                             AS DECIMAL(38,0)) AS VARCHAR)
                     AS sum_digest,
                   bit_xor(dv) AS xor_digest
            FROM d GROUP BY 1 ORDER BY bucket
        """,
        "heavy_hitters": """
            WITH t AS (
              SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qty_bucket
              FROM lineitem WHERE l_quantity IS NOT NULL),
            n AS (SELECT COUNT(*) AS n FROM t)
            SELECT qty_bucket, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM t CROSS JOIN n
            GROUP BY qty_bucket, n.n
            HAVING COUNT(*) * 1000000 >= 100000 * n.n
            ORDER BY qty_bucket
        """,
        "partitioned_pruning": """
            SELECT CAST(year(o_orderdate) AS INT) AS yr, COUNT(*) AS cnt
            FROM orders WHERE o_orderstatus = 'F'
            GROUP BY 1 ORDER BY yr
        """,
        "strsplittobag": """
            SELECT token, COUNT(*) AS cnt
            FROM (SELECT unnest(string_split(o_orderpriority, '-')) AS token
                  FROM orders) t
            GROUP BY token ORDER BY token
        """,
        "decontaminate": r"""
            WITH toks AS (
              SELECT doc_id, lang,
                     list_transform(list_filter(
                         regexp_split_to_array(trim(text), '\s+'),
                         t -> t != ''), t -> lower(t)) AS tk
              FROM documents),
            grams AS (
              SELECT doc_id, lang,
                     CASE WHEN len(tk) >= 4 THEN
                       list_distinct([array_to_string(tk[i:i+3], ' ')
                           for i in generate_series(1, len(tk) - 3)])
                     ELSE [] END AS gs
              FROM toks),
            bench AS (
              SELECT DISTINCT unnest(gs) AS g FROM grams
              WHERE doc_id % 50 = 0),
            corpus AS (SELECT * FROM grams WHERE doc_id % 50 <> 0),
            hits AS (
              SELECT DISTINCT c.doc_id
              FROM (SELECT doc_id, unnest(gs) AS g FROM corpus) c
              JOIN bench USING (g))
            SELECT lang, (corpus.doc_id IN (SELECT doc_id FROM hits))
                       AS contaminated,
                   COUNT(*) AS n_docs
            FROM corpus
            GROUP BY 1, 2 ORDER BY lang, contaminated
        """,
        "chunk_documents": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 t -> t != '') AS tk
              FROM documents),
            chunks AS (
              SELECT doc_id, i AS chunk_idx,
                     LEAST(len(tk) - i*32, 32) AS n_tokens,
                     array_to_string(tk[i*32+1 : i*32+32], ' ') AS chunk_text
              FROM toks,
                   LATERAL (SELECT unnest(generate_series(
                       0, CAST(floor((len(tk)-1)/32.0) AS INT))) AS i)
              WHERE len(tk) >= 1)
            SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
                   CAST(n_tokens AS INT) AS n_tokens,
                   CAST(length(chunk_text) AS INT) AS n_chars
            FROM chunks ORDER BY doc_id, chunk_idx
        """,
        "text_signals": r"""
            WITH toks AS (
              SELECT doc_id,
                     list_transform(list_filter(
                         regexp_split_to_array(trim(text), '\s+'),
                         t -> t != ''), t -> lower(t)) AS tk,
                     text
              FROM documents),
            g AS (
              SELECT doc_id, text,
                     [array_to_string(tk[i:i+1], ' ')
                      for i in generate_series(
                          1, greatest(len(tk) - 2, 0) + 1)] AS grams
              FROM toks),
            ch AS (
              SELECT doc_id, grams,
                     [text[i] for i in generate_series(1, length(text))]
                         AS chars
              FROM g),
            ent AS (
              SELECT doc_id, grams,
                     CASE WHEN len(chars) > 0 THEN
                       list_reduce(list_transform(
                         list_sort(list_distinct(chars)),
                         c -> -(CAST(len(list_filter(chars, x -> x = c))
                                     AS DOUBLE) / len(chars)) *
                              log2(CAST(len(list_filter(chars, x -> x = c))
                                        AS DOUBLE) / len(chars))),
                         (a, b) -> a + b)
                     ELSE 0.0 END AS entropy
              FROM ch)
            SELECT doc_id,
                   FLOOR((CASE WHEN len(grams) > 0
                          THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                     / len(grams)
                          ELSE 0.0 END)*10000 + 0.5)/10000 AS rep2,
                   FLOOR(entropy*10000 + 0.5)/10000 AS entropy
            FROM ent ORDER BY doc_id
        """,
        "asof_join": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
                 v AS (SELECT user_id, ts, MAX(value) AS view_value
                       FROM events WHERE event_type = 'view'
                       GROUP BY user_id, ts)
            SELECT p.event_id, p.user_id,
                   CAST(trunc(epoch(p.ts)) AS BIGINT) AS ts,
                   FLOOR(v.view_value*100 + 0.5)/100 AS view_value
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND p.ts >= v.ts
            ORDER BY p.event_id
        """,
        "range_join": """
            WITH bands AS (
              SELECT n_nationkey AS band,
                     n_nationkey*25000.0 AS lo,
                     n_nationkey*25000.0 + 24999.99 AS hi
              FROM nation)
            SELECT band, COUNT(*) AS n_orders,
                   FLOOR(SUM(o_totalprice)*100 + 0.5)/100 AS total
            FROM orders JOIN bands
              ON o_totalprice >= lo AND o_totalprice <= hi
            GROUP BY band ORDER BY band
        """,
        "pack_sequences": r"""
            WITH base AS (
              SELECT doc_id,
                     CAST(doc_id % 4 AS INT) AS stream,
                     list_filter(regexp_split_to_array(trim(text), '\s+'),
                                 t -> t != '') AS tk
              FROM documents),
            nz AS (SELECT * FROM base WHERE len(tk) > 0),
            off AS (
              SELECT *, SUM(len(tk)) OVER (PARTITION BY stream
                          ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS e,
                        SUM(len(tk)) OVER (PARTITION BY stream
                          ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                          - len(tk) AS o
              FROM nz),
            segs AS (
              SELECT stream, q AS seq,
                     GREATEST(q*64 - o, 0) AS s,
                     LEAST((q+1)*64 - o, len(tk)) AS e2,
                     o, tk
              FROM off,
                   LATERAL (SELECT unnest(generate_series(
                       CAST(floor(o/64.0) AS BIGINT),
                       CAST(floor((e-1)/64.0) AS BIGINT))) AS q)),
            parts AS (
              SELECT stream, seq,
                     array_to_string(flatten(list(tk[s+1:e2]
                         ORDER BY o + s)), ' ') AS seq_text,
                     SUM(e2 - s) AS n_tokens
              FROM segs GROUP BY stream, seq)
            SELECT stream, CAST(seq AS INT) AS seq_idx,
                   CAST(n_tokens AS INT) AS n_tokens,
                   CAST(length(seq_text) AS INT) AS n_chars
            FROM parts ORDER BY stream, seq_idx
        """,
        "group_apply": """
            SELECT l_returnflag,
                   FLOOR(SUM(l_extendedprice * l_quantity)
                         / SUM(l_quantity) * 100 + 0.5)/100 AS wavg
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "window_ranks": """
            SELECT o_custkey, o_orderkey,
                   ROUND(percent_rank() OVER w, 6) AS pr,
                   ROUND(cume_dist() OVER w, 6) AS cd,
                   CAST(row_number() OVER w AS BIGINT) AS rn
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_custkey, o_orderkey
        """,
        "window_frames": """
            SELECT o_custkey, o_orderkey,
                   FLOOR(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         *100 + 0.5)/100 AS running,
                   FLOOR(AVG(o_totalprice) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                         *100 + 0.5)/100 AS moving3
            FROM orders ORDER BY o_custkey, o_orderkey
        """,
        "cube_grouping": """
            SELECT l_returnflag, l_linestatus,
                   CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
                   COUNT(*) AS cnt
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY gid, l_returnflag, l_linestatus
        """,
        "bucketed_join": """
            SELECT c_nationkey, COUNT(*) AS n_orders,
                   FLOOR(SUM(o_totalprice)*100 + 0.5)/100 AS total
            FROM customer JOIN orders ON c_custkey = o_custkey
            GROUP BY c_nationkey ORDER BY c_nationkey
        """,
        "events_json_struct": """
            SELECT event_type,
                   CAST(props->>'$.k' AS INT) % 10 AS kmod,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS sum_k
            FROM events
            GROUP BY 1, 2 ORDER BY event_type, kmod
        """,
        "stratified_sample": """
            SELECT lang, COUNT(*) AS n_docs
            FROM documents
            WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
                  CASE WHEN lang = 'en' THEN 'c000' ELSE '4000' END
            GROUP BY lang ORDER BY lang
        """,
        "collected_group": """
            SELECT l_linenumber, COUNT(*) AS cnt,
                   SUM(l_quantity) AS qty
            FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber
        """,
        "partition_by_custom": """
            SELECT o_custkey AS custkey, COUNT(*) AS n,
                   MAX(o_totalprice) AS max_price
            FROM orders GROUP BY o_custkey ORDER BY custkey
        """,
        "schema_merge": """
            SELECT n_nationkey, n_name,
                   CASE WHEN n_nationkey >= 12 THEN n_regionkey END
                       AS n_regionkey
            FROM nation ORDER BY n_nationkey
        """,
        "cogroup_3way": """
            WITH gn AS (SELECT n_nationkey AS k, COUNT(*) AS n
                        FROM nation GROUP BY 1),
                 gc AS (SELECT c_nationkey AS k, COUNT(*) AS n
                        FROM customer GROUP BY 1),
                 gs AS (SELECT s_nationkey AS k, COUNT(*) AS n
                        FROM supplier GROUP BY 1)
            SELECT COALESCE(gn.k, gc.k, gs.k) AS nationkey,
                   COALESCE(gn.n, 0) AS n_n,
                   COALESCE(gc.n, 0) AS n_c,
                   COALESCE(gs.n, 0) AS n_s
            FROM gn
            FULL OUTER JOIN gc ON gn.k IS NOT DISTINCT FROM gc.k
            FULL OUTER JOIN gs ON COALESCE(gn.k, gc.k)
                                  IS NOT DISTINCT FROM gs.k
            ORDER BY nationkey
        """,
        "join_right": """
            SELECT c_custkey, COUNT(o_orderkey) AS n_big
            FROM (SELECT * FROM orders WHERE o_totalprice > 250000.0) big
            RIGHT JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey ORDER BY c_custkey
        """,
        "join_full": """
            SELECT a.ak, a.aid, b.bk, b.bid
            FROM (SELECT o_custkey AS ak, o_orderkey AS aid FROM orders
                  WHERE o_totalprice > 400000.0) a
            FULL JOIN (SELECT o_custkey AS bk, o_orderkey AS bid FROM orders
                       WHERE o_totalprice < 1500.0) b
              ON a.ak = b.bk
            ORDER BY aid, bid
        """,
    }
