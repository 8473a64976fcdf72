-- Joda-pattern datetime surface: GetYear/GetMonth/GetWeek, ToString
-- with a Joda pattern, ToDate, and truncating DaysBetween.
o = LOAD '$sf/orders.parquet';
d = FOREACH o GENERATE o_orderkey,
        GetYear(o_orderdate) AS yr, GetMonth(o_orderdate) AS mo,
        GetWeek(o_orderdate) AS wk,
        ToString(o_orderdate, 'yyyy-MM-dd') AS ds,
        DaysBetween(o_orderdate, ToDate('1995-01-01', 'yyyy-MM-dd')) AS days;
f = FILTER d BY yr == 1997;
out = ORDER f BY o_orderkey;
