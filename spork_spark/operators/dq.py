"""Declarative data-quality validation (the dbt-tests / Deequ
constraint-suite shape; extension beyond the reference surface,
SURVEY.md §2.11 family next to profile_columns): a rule list compiles
to the minimum number of passes over the data and returns one row per
rule with its violation count — the gate a 100 TB ingest evaluates
before publishing a batch.

Pass structure (the scale contract):
- every ROW-WISE rule (not_null, accepted_values, in_range, matches)
  folds into ONE shared aggregate pass — k rules cost one scan;
- each `unique` rule is one map-combined groupBy counting key groups
  with multiplicity > 1 (violations = rows beyond the first of each);
- each `foreign_key` rule is one left-anti join against the reference
  keys (broadcast when small).
All counts are exact integers; no sampling, no Python row crossings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dq_validate(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → (rule, kind, n_violations).

    Rule dicts (``name`` optional, defaults to a derived label):
      {"kind": "not_null", "col": c}
      {"kind": "accepted_values", "col": c, "values": [...]}
      {"kind": "in_range", "col": c, "lo": x, "hi": y}   # inclusive
      {"kind": "matches", "col": c, "pattern": rx}       # full-string
      {"kind": "unique", "cols": [c, ...]}
      {"kind": "foreign_key", "col": c, "ref": DataFrame, "ref_col": r}
        (null FK values are not violations — use not_null to forbid)
    """
    spark = df.sparkSession
    rowwise_aggs: list = []
    labels: list[tuple[str, str]] = []
    results: list[DataFrame] = []

    def viol(cond, label):        # count rows FAILING the predicate
        rowwise_aggs.append(
            F.count(F.when(~F.coalesce(cond, F.lit(False)), 1))
             .cast("long").alias(f"__r{len(rowwise_aggs)}"))
        labels.append(label)

    for rule in rules:
        kind = rule["kind"]
        if kind == "not_null":
            c = rule["col"]
            viol(F.col(c).isNotNull(),
                 (rule.get("name", f"not_null({c})"), kind))
        elif kind == "accepted_values":
            c = rule["col"]
            viol(F.col(c).isNull() | F.col(c).isin(rule["values"]),
                 (rule.get("name", f"accepted_values({c})"), kind))
        elif kind == "in_range":
            c, lo, hi = rule["col"], rule["lo"], rule["hi"]
            viol(F.col(c).isNull()
                 | ((F.col(c) >= lo) & (F.col(c) <= hi)),
                 (rule.get("name", f"in_range({c},{lo},{hi})"), kind))
        elif kind == "matches":
            c, rx = rule["col"], rule["pattern"]
            viol(F.col(c).isNull() | F.col(c).rlike(f"^(?:{rx})$"),
                 (rule.get("name", f"matches({c})"), kind))
        elif kind == "vector":
            # embedding-column well-formedness: right dimensionality,
            # no NaN / null elements. Null vectors pass (use not_null
            # to forbid, same contract as the scalar rules). Folds into
            # the shared row-wise pass like any other predicate.
            c, dim = rule["col"], rule["dim"]
            ok = (F.col(c).isNull()
                  | ((F.size(F.col(c)) == dim)
                     & ~F.exists(F.col(c),
                                 lambda x: x.isNull()
                                 | F.isnan(x.cast("double")))))
            viol(ok, (rule.get("name", f"vector({c},{dim})"), kind))
        elif kind == "unique":
            cols = rule["cols"]
            name = rule.get("name", f"unique({','.join(cols)})")
            dup = (df.groupBy(*cols)
                     .agg(F.count(F.lit(1)).alias("__n"))
                     .where(F.col("__n") > 1)
                     .agg(F.coalesce(F.sum(F.col("__n") - 1), F.lit(0))
                          .cast("long").alias("n_violations")))
            results.append(dup.select(F.lit(name).alias("rule"),
                                      F.lit(kind).alias("kind"),
                                      "n_violations"))
        elif kind == "foreign_key":
            c, ref, rc = rule["col"], rule["ref"], rule["ref_col"]
            name = rule.get("name", f"foreign_key({c})")
            orphans = (df.where(F.col(c).isNotNull())
                         .join(ref.select(F.col(rc).alias(c)).distinct(),
                               on=c, how="left_anti")
                         .agg(F.count(F.lit(1)).cast("long")
                              .alias("n_violations")))
            results.append(orphans.select(F.lit(name).alias("rule"),
                                          F.lit(kind).alias("kind"),
                                          "n_violations"))
        else:
            raise ValueError(f"unknown rule kind: {kind!r}")

    if rowwise_aggs:              # ONE pass for every row-wise rule
        one = df.groupBy().agg(*rowwise_aggs)
        structs = [F.struct(F.lit(nm).alias("rule"),
                            F.lit(kd).alias("kind"),
                            F.col(f"__r{i}").alias("n_violations"))
                   for i, (nm, kd) in enumerate(labels)]
        results.insert(0, one.select(
            F.explode(F.array(*structs)).alias("p")).select("p.*"))
    if not results:
        return spark.createDataFrame(
            [], "rule string, kind string, n_violations long")
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def k_anonymity(df: DataFrame, quasi_cols: list[str], k: int = 5,
                null_as_value: bool = True) -> DataFrame:
    """Quasi-identifier audit: every combination of `quasi_cols` whose
    group is smaller than `k` re-identifies its members (Sweeney 2002,
    k-anonymity) — the privacy gate a training-data release runs next
    to PII scrubbing (text.scrub_pii removes direct identifiers; this
    catches the INDIRECT ones: zip+age+gender-style combinations).

    Returns the violating combinations: the quasi columns plus
    `group_size` (< k), smallest first — the release blocker worklist.
    An empty result means the table is k-anonymous over these columns.

    ONE map-combined groupBy on the quasi columns — the corpus crosses
    the wire as group counts. `null_as_value=True` (default) treats
    NULL as its own value (a null zip code still narrows someone down);
    False drops rows with any null quasi value from the audit.
    """
    if k < 2:
        raise ValueError("k must be >= 2 (k=1 is vacuous)")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    base = df
    if not null_as_value:
        for c in quasi_cols:
            base = base.where(F.col(c).isNotNull())
    return (base.groupBy(*quasi_cols)
                .agg(F.count(F.lit(1)).alias("group_size"))
                .where(F.col("group_size") < k)
                .orderBy("group_size", *quasi_cols))


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law as exact
# integer constants (no engine computes a log).
_BENFORD_PPM = [301029, 176091, 124938, 96910, 79181,
                66946, 57991, 51152, 45757]


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of ``value_col`` against
    Benford's law — the classic fabricated-data / unit-mixup audit for
    naturally-occurring amounts (invoices, populations, file sizes).

    The digit comes from the value's STRING form (first [1-9] char of
    the canonical decimal/integer rendering) — no log10, whose
    power-of-ten edge cases differ per libm; zero and null values
    carry no leading digit and are excluded. Output per digit 1-9:
    (digit, n, actual_ppm, expected_ppm) with actual_ppm the exact
    integer n·10⁶ div total and expected_ppm the precomputed Benford
    constant — deviations are the analyst's (or dq rule's) call, e.g.
    max |actual−expected|. ONE map-side-combined groupBy; the total is
    a 1-row broadcast. Digits absent from the data still appear (n=0),
    as a distribution audit requires.
    """
    digit = F.regexp_extract(F.col(value_col).cast("string"),
                             "([1-9])", 1)
    # Measured: spreading the scan HURTS here (0.34 -> 0.62 s at
    # sf0.1) — the digit regexp is cheap next to a full-row shuffle,
    # and the map-side-combined groupBy already moves only 9 rows.
    counts = (df.where(F.col(value_col).isNotNull() & (digit != ""))
                .groupBy(digit.cast("int").alias("digit"))
                .agg(F.count(F.lit(1)).alias("n")))
    spark = df.sparkSession
    digits = spark.createDataFrame(
        [(d + 1, _BENFORD_PPM[d]) for d in range(9)],
        "digit int, expected_ppm long")
    # The total rides a window over the JOINED frame, not a separate
    # groupBy().agg() consumer of `counts`: the two consumers' exchange
    # subtrees fail to canonicalize identically, ReuseExchange does not
    # fire, and the whole scan + digit regexp ran TWICE (plan dump
    # plans/r10/benford: two parquet scans). The joined frame is at most
    # 9 rows (the digit domain), so the unpartitioned window is a 9-row
    # single task at any scale; missing digits contribute n=0, and an
    # empty input keeps the null ratio (sum 0 → div 0 → null, exactly
    # the old (n·10⁶) div null).
    from pyspark.sql.window import Window
    joined = (digits.join(counts, on="digit", how="left")
                    .withColumn("n", F.coalesce(F.col("n"), F.lit(0))))
    return (joined
            .withColumn("__tot", F.sum("n").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing)))
            .withColumn("actual_ppm",
                        F.expr("(n * 1000000) div __tot")
                         .cast("long"))
            .select("digit", "n", "actual_ppm", "expected_ppm"))
