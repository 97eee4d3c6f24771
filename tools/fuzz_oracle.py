#!/usr/bin/env python3
"""Differential query fuzzer: the Python half of graft.Fuzz.

The 217 fixed oracle queries can only catch semantic gaps they
express; this tool samples the composition space the reference's
planner enumerates (filter/join/agg/window/explode chains over the
driver's testdata schema) with fresh random shapes every round:

  1. GENERATE a seeded random logical plan per query and render it
     TWICE — once in Spark SQL, once in DuckDB SQL. Only constructs
     with identical cross-engine semantics are in the grammar (see
     dialect notes inline); dialect-divergent spellings (explode vs
     unnest) render differently from the same plan node.
  2. RUN the Spark renderings through graft.Fuzz (writes one parquet
     per query under <out>/results/).
  3. COMPARE each result against DuckDB running the paired rendering,
     with the same normalization as tools/oracle_check.py (sort
     columns by name, sort rows, dtype-kind check, exact values).

Usage:
  python3 tools/fuzz_oracle.py --sf-dir /root/testdata/sf0.01 \
      --out /tmp/fuzz --n 200 --seed 13 --report FUZZ_r13.json

Determinism contract: same (seed, n, data) => same queries, so a
mismatch is reproducible by rerunning with the reported seed and
reading <out>/spark_sql/<name>.sql next to <out>/duck_sql/<name>.sql.
"""
import argparse, glob, json, os, random, shutil, subprocess, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents"]

# (table, column, kind) — kind in {int, money, frac, str, date, text}
# money = positive 2-decimal double (canonicalized to cents for sums),
# frac = small positive double compared/raw only, text = long prose.
COLS = {
    "lineitem": [("l_orderkey", "int"), ("l_partkey", "int"),
                 ("l_suppkey", "int"), ("l_linenumber", "int"),
                 ("l_quantity", "frac"), ("l_extendedprice", "money"),
                 ("l_discount", "frac"), ("l_tax", "frac"),
                 ("l_returnflag", "str"), ("l_linestatus", "str"),
                 ("l_shipdate", "date")],
    "orders": [("o_orderkey", "int"), ("o_custkey", "int"),
               ("o_orderstatus", "str"), ("o_totalprice", "money"),
               ("o_orderdate", "date"), ("o_orderpriority", "str")],
    "customer": [("c_custkey", "int"), ("c_name", "str"),
                 ("c_nationkey", "int"), ("c_acctbal", "money"),
                 ("c_mktsegment", "str")],
    "supplier": [("s_suppkey", "int"), ("s_name", "str"),
                 ("s_nationkey", "int"), ("s_acctbal", "money")],
    "part": [("p_partkey", "int"), ("p_name", "str"), ("p_brand", "str"),
             ("p_type", "str"), ("p_size", "int"),
             ("p_retailprice", "money")],
    "nation": [("n_nationkey", "int"), ("n_name", "str"),
               ("n_regionkey", "int")],
    "region": [("r_regionkey", "int"), ("r_name", "str")],
    "events": [("event_id", "int"), ("user_id", "int"),
               ("event_type", "str"), ("value", "frac")],
    "documents": [("doc_id", "int"), ("lang", "str"), ("source", "str"),
                  ("n_chars", "int"), ("text", "text")],
}

# FK graph: (fact, fact_key) -> (dim, dim_key). Joining through these
# keeps every generated join key-correct (the planner's own shapes).
FKS = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def cols_of(t, kinds=None):
    return [c for c, k in COLS[t] if kinds is None or k in kinds]


class Gen:
    """One seeded generator session: samples filter constants from the
    actual data (via DuckDB quantiles / deterministic row picks) so
    predicates land at varied selectivities instead of degenerating to
    all-or-nothing."""

    def __init__(self, sf_dir, seed):
        self.rnd = random.Random(seed)
        self.con = duckdb.connect()
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                self.con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # ---------------------------------------------------- constants
    def num_const(self, t, c):
        p = self.rnd.choice([0.1, 0.25, 0.5, 0.75, 0.9])
        v = self.con.execute(
            f"SELECT quantile_disc({c}, {p}) FROM {t}").fetchone()[0]
        return v

    def str_const(self, t, c):
        off = self.rnd.randrange(20)
        row = self.con.execute(
            f"SELECT {c} FROM {t} ORDER BY md5({c}) LIMIT 1 OFFSET {off}"
        ).fetchone()
        return row[0] if row else ""

    def date_const(self, t, c):
        p = self.rnd.choice([0.25, 0.5, 0.75])
        v = self.con.execute(
            f"SELECT quantile_disc({c}, {p}) FROM {t}").fetchone()[0]
        return str(v)[:19]

    # --------------------------------------------------- predicates
    def predicate(self, t, alias=""):
        """One predicate rendered identically in both dialects (all the
        sampled operators are cross-engine exact: int/double compares
        on identical parquet values, LIKE prefixes, IN lists,
        timestamp literals)."""
        q = f"{alias}." if alias else ""
        choices = []
        ints = cols_of(t, {"int"})
        if ints:
            choices.append("int_cmp")
        if cols_of(t, {"money", "frac"}):
            choices.append("num_cmp")
        if cols_of(t, {"str"}):
            choices.extend(["str_eq", "str_like", "str_in"])
        if cols_of(t, {"date"}):
            choices.append("date_cmp")
        kind = self.rnd.choice(choices)
        if kind == "int_cmp":
            c = self.rnd.choice(ints)
            op = self.rnd.choice(["<", "<=", ">", ">=", "%"])
            v = self.num_const(t, c)
            if op == "%":
                m = self.rnd.choice([2, 3, 5, 7])
                return f"{q}{c} % {m} = {self.rnd.randrange(m)}"
            return f"{q}{c} {op} {v}"
        if kind == "num_cmp":
            c = self.rnd.choice(cols_of(t, {"money", "frac"}))
            op = self.rnd.choice(["<", ">"])
            return f"{q}{c} {op} {self.num_const(t, c)}"
        if kind == "str_eq":
            c = self.rnd.choice(cols_of(t, {"str"}))
            return f"{q}{c} = '{self.str_const(t, c)}'"
        if kind == "str_like":
            c = self.rnd.choice(cols_of(t, {"str"}))
            v = self.str_const(t, c)[:2]
            return f"{q}{c} LIKE '{v}%'"
        if kind == "str_in":
            c = self.rnd.choice(cols_of(t, {"str"}))
            vs = sorted({self.str_const(t, c) for _ in range(3)})
            lst = ", ".join(f"'{v}'" for v in vs)
            return f"{q}{c} IN ({lst})"
        c = self.rnd.choice(cols_of(t, {"date"}))
        op = self.rnd.choice(["<", ">="])
        return f"{q}{c} {op} TIMESTAMP '{self.date_const(t, c)}'"

    # -------------------------------------------------- expressions
    def scalar_expr(self, t, alias=""):
        """A projected scalar with cross-engine-identical semantics.
        Notes: substr is 1-based in both; int/int division renders as
        double division in both (identical IEEE inputs => identical
        result); year/month return integer kinds in both."""
        q = f"{alias}." if alias else ""
        opts = []
        ints = cols_of(t, {"int"})
        if ints:
            opts.extend(["arith", "case"])
        if cols_of(t, {"str"}):
            opts.extend(["strfun", "concat"])
        if cols_of(t, {"date"}):
            opts.append("datepart")
        if cols_of(t, {"money"}):
            opts.append("cents")
        kind = self.rnd.choice(opts)
        if kind == "arith":
            c = self.rnd.choice(ints)
            k = self.rnd.randint(2, 9)
            op = self.rnd.choice(["+", "*", "-"])
            return f"({q}{c} {op} {k})", f"e_{c}"
        if kind == "case":
            c = self.rnd.choice(ints)
            v = self.num_const(t, c)
            return (f"(CASE WHEN {q}{c} <= {v} THEN 'lo' ELSE 'hi' END)",
                    f"band_{c}")
        if kind == "strfun":
            c = self.rnd.choice(cols_of(t, {"str"}))
            f = self.rnd.choice(["upper", "lower", "length"])
            return f"{f}({q}{c})", f"{f}_{c}"
        if kind == "concat":
            c = self.rnd.choice(cols_of(t, {"str"}))
            return (f"(substr({q}{c}, 1, 3) || '#')", f"tag_{c}")
        if kind == "datepart":
            c = self.rnd.choice(cols_of(t, {"date"}))
            f = self.rnd.choice(["year", "month"])
            return f"{f}({q}{c})", f"{f}_{c}"
        c = self.rnd.choice(cols_of(t, {"money"}))
        # money canonicalized to integer cents: exact in both engines
        return (f"CAST(round({q}{c} * 100) AS BIGINT)", f"cents_{c}")

    def agg_expr(self, t, alias=""):
        """Aggregate with engine-exact result: integer sums are cast to
        BIGINT on both sides (DuckDB SUM(BIGINT) is HUGEINT, which the
        driver's pandas hash renders as float); doubles only via
        min/max (no accumulation-order dependence) or cents-sums."""
        q = f"{alias}." if alias else ""
        opts = ["count"]
        if cols_of(t, {"int"}):
            opts.extend(["sum_int", "minmax_int", "count_distinct"])
        if cols_of(t, {"money"}):
            opts.append("sum_cents")
        if cols_of(t, {"money", "frac"}):
            opts.append("minmax_num")
        if cols_of(t, {"str"}):
            opts.append("minmax_str")
        kind = self.rnd.choice(opts)
        if kind == "count":
            return "COUNT(*)", "n"
        if kind == "sum_int":
            c = self.rnd.choice(cols_of(t, {"int"}))
            return f"CAST(SUM({q}{c}) AS BIGINT)", f"sum_{c}"
        if kind == "minmax_int":
            c = self.rnd.choice(cols_of(t, {"int"}))
            f = self.rnd.choice(["MIN", "MAX"])
            return f"{f}({q}{c})", f"{f.lower()}_{c}"
        if kind == "count_distinct":
            c = self.rnd.choice(cols_of(t, {"int"}))
            return f"COUNT(DISTINCT {q}{c})", f"nd_{c}"
        if kind == "sum_cents":
            c = self.rnd.choice(cols_of(t, {"money"}))
            return (f"CAST(SUM(CAST(round({q}{c} * 100) AS BIGINT)) "
                    f"AS BIGINT)", f"cents_{c}")
        if kind == "minmax_num":
            c = self.rnd.choice(cols_of(t, {"money", "frac"}))
            f = self.rnd.choice(["MIN", "MAX"])
            return f"{f}({q}{c})", f"{f.lower()}_{c}"
        c = self.rnd.choice(cols_of(t, {"str"}))
        f = self.rnd.choice(["MIN", "MAX"])
        return f"{f}({q}{c})", f"{f.lower()}_{c}"

    # ------------------------------------------------------- shapes
    def join_chain(self):
        """1-3 FK hops starting from a random fact table."""
        start = self.rnd.choice(["lineitem", "orders", "customer",
                                 "supplier", "nation"])
        hops, t = [], start
        for _ in range(self.rnd.randint(1, 3)):
            nxt = [f for f in FKS if f[0] == t]
            if not nxt:
                break
            hop = self.rnd.choice(nxt)
            hops.append(hop)
            t = hop[2]
        return start, hops

    def q_scan(self):
        t = self.rnd.choice([x for x in TABLES if x != "events"])
        n_proj = self.rnd.randint(1, 3)
        proj, names = [], []
        pick = self.rnd.sample(cols_of(t), min(2, len(cols_of(t))))
        for c in pick:
            proj.append(c)
        for _ in range(n_proj):
            e, nm = self.scalar_expr(t)
            while nm in names or nm in pick:
                nm += "x"
            names.append(nm)
            proj.append(f"{e} AS {nm}")
        preds = [self.predicate(t) for _ in range(self.rnd.randint(1, 2))]
        sql = (f"SELECT {', '.join(proj)} FROM {t} "
               f"WHERE {' AND '.join(preds)}")
        return sql, sql

    def q_join(self):
        start, hops = self.join_chain()
        tabs = [start] + [h[2] for h in hops]
        joins = " ".join(
            f"JOIN {d} ON {f}.{fk} = {d}.{dk}" for (f, fk, d, dk) in hops)
        agg = self.rnd.random() < 0.6
        if agg:
            gt = self.rnd.choice(tabs)
            gc = self.rnd.choice(cols_of(gt, {"str", "int"}))
            aggs, names = [], []
            for _ in range(self.rnd.randint(1, 3)):
                at = self.rnd.choice(tabs)
                e, nm = self.agg_expr(at, at)
                while nm in names:
                    nm += "x"
                names.append(nm)
                aggs.append(f"{e} AS {nm}")
            pred = self.predicate(start, start)
            sql = (f"SELECT {gt}.{gc}, {', '.join(aggs)} "
                   f"FROM {start} {joins} WHERE {pred} "
                   f"GROUP BY {gt}.{gc}")
            return sql, sql
        pt = self.rnd.choice(tabs)
        pcols = self.rnd.sample(cols_of(pt), min(3, len(cols_of(pt))))
        proj = ", ".join(f"{pt}.{c}" for c in pcols)
        # predicate aliases must each match their own table
        preds = [self.predicate(tb, tb)
                 for tb in self.rnd.sample(tabs, min(2, len(tabs)))]
        sql = (f"SELECT {proj} FROM {start} {joins} "
               f"WHERE {' AND '.join(preds)}")
        return sql, sql

    def q_agg(self):
        t = self.rnd.choice([x for x in TABLES if x != "events"])
        gcols = self.rnd.sample(cols_of(t, {"str", "int"}),
                                self.rnd.randint(1, 2))
        aggs, names = [], []
        for _ in range(self.rnd.randint(1, 3)):
            e, nm = self.agg_expr(t)
            while nm in names:
                nm += "x"
            names.append(nm)
            aggs.append(f"{e} AS {nm}")
        having = ""
        if self.rnd.random() < 0.4:
            having = f" HAVING COUNT(*) > {self.rnd.randint(1, 3)}"
        sql = (f"SELECT {', '.join(gcols + aggs)} FROM {t} "
               f"GROUP BY {', '.join(gcols)}{having}")
        return sql, sql

    def q_window(self):
        t, pk = self.rnd.choice([
            ("lineitem", "l_orderkey"), ("orders", "o_custkey"),
            ("customer", "c_nationkey"), ("part", "p_brand"),
        ])
        ids = {"lineitem": "l_orderkey, l_linenumber",
               "orders": "o_orderkey", "customer": "c_custkey",
               "part": "p_partkey"}[t]
        oc = self.rnd.choice(cols_of(t, {"int", "money", "date"}))
        fn = self.rnd.choice(["ROW_NUMBER()", "RANK()", "DENSE_RANK()"])
        keep = self.rnd.randint(1, 3)
        # full tiebreak (ids are unique) keeps ranks engine-exact
        sql = (f"SELECT {ids}, rk FROM ("
               f"SELECT {ids}, {fn} OVER (PARTITION BY {pk} "
               f"ORDER BY {oc}, {ids}) AS rk FROM {t}) w "
               f"WHERE rk <= {keep}")
        return sql, sql

    def q_explode(self):
        """Token explode over documents — the one dialect-divergent
        node: LATERAL VIEW explode(split()) vs unnest(string_split())."""
        minlen = self.rnd.randint(3, 8)
        agg = self.rnd.random() < 0.5
        if agg:
            spark = (f"SELECT tok, COUNT(*) AS n FROM documents "
                     f"LATERAL VIEW explode(split(text, ' ')) x AS tok "
                     f"WHERE length(tok) >= {minlen} GROUP BY tok "
                     f"HAVING COUNT(*) > 1")
            duck = (f"SELECT tok, COUNT(*) AS n FROM ("
                    f"SELECT unnest(string_split(text, ' ')) AS tok "
                    f"FROM documents) x WHERE length(tok) >= {minlen} "
                    f"GROUP BY tok HAVING COUNT(*) > 1")
        else:
            spark = (f"SELECT doc_id, lower(tok) AS tok FROM documents "
                     f"LATERAL VIEW explode(split(text, ' ')) x AS tok "
                     f"WHERE length(tok) >= {minlen} AND doc_id % 7 = 0")
            duck = (f"SELECT doc_id, lower(tok) AS tok FROM ("
                    f"SELECT doc_id, unnest(string_split(text, ' ')) "
                    f"AS tok FROM documents) x "
                    f"WHERE length(tok) >= {minlen} AND doc_id % 7 = 0")
        return spark, duck

    def q_limit(self):
        """Deterministic LIMIT: total order via unique key before the
        cut, identical in both dialects."""
        t, uk = self.rnd.choice([
            ("orders", "o_orderkey"), ("customer", "c_custkey"),
            ("part", "p_partkey"), ("documents", "doc_id")])
        oc = self.rnd.choice(cols_of(t, {"int", "money", "str"}))
        k = self.rnd.choice([5, 10, 25])
        direction = self.rnd.choice(["ASC", "DESC"])
        pcols = ", ".join(self.rnd.sample(cols_of(t),
                                          min(3, len(cols_of(t)))))
        sql = (f"SELECT {pcols} FROM {t} "
               f"ORDER BY {oc} {direction}, {uk} LIMIT {k}")
        return sql, sql

    def q_union(self):
        t = self.rnd.choice(["orders", "customer", "part"])
        c = cols_of(t, {"int"})[0]
        p1, p2 = self.predicate(t), self.predicate(t)
        op = self.rnd.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
        sql = (f"SELECT {c} FROM {t} WHERE {p1} "
               f"{op} SELECT {c} FROM {t} WHERE {p2}")
        return sql, sql

    def q_subquery(self):
        """Scalar/IN subqueries — exercises rewrite-to-join paths."""
        kind = self.rnd.choice(["in", "scalar"])
        if kind == "in":
            p = self.predicate("orders")
            sql = ("SELECT c_custkey, c_mktsegment FROM customer "
                   "WHERE c_custkey IN "
                   f"(SELECT o_custkey FROM orders WHERE {p})")
            return sql, sql
        c = self.rnd.choice(["o_totalprice", "o_orderkey"])
        sql = (f"SELECT o_orderkey, o_orderstatus FROM orders "
               f"WHERE {c} > (SELECT MIN({c}) * 2 FROM orders) "
               f"AND o_orderkey % 11 = 0")
        return sql, sql

    def q_lateral(self):
        """Correlated LATERAL subquery with per-row ORDER BY + LIMIT —
        the decorrelation path (Spark rewrites to WindowGroupLimit).
        Total order inside the lateral keeps the cut engine-exact."""
        k = self.rnd.randint(1, 3)
        m = self.rnd.choice([7, 10, 13])
        if self.rnd.random() < 0.5:
            oc = self.rnd.choice(["o_totalprice", "o_orderdate"])
            d = self.rnd.choice(["ASC", "DESC"])
            sql = (f"SELECT c_custkey, t.o_orderkey, t.o_totalprice "
                   f"FROM customer, LATERAL ("
                   f"SELECT o_orderkey, o_totalprice FROM orders "
                   f"WHERE o_custkey = c_custkey "
                   f"ORDER BY {oc} {d}, o_orderkey LIMIT {k}) t "
                   f"WHERE c_custkey % {m} = 0")
        else:
            oc = self.rnd.choice(["l_extendedprice", "l_quantity"])
            d = self.rnd.choice(["ASC", "DESC"])
            # (l_orderkey, l_linenumber) is NOT unique in the synthetic
            # lineitem, so the tiebreak must cover every projected
            # column: rows still tied after that are identical in the
            # output, making the LIMIT cut deterministic as a multiset
            sql = (f"SELECT o_orderkey, t.l_linenumber, t.l_extendedprice "
                   f"FROM orders, LATERAL ("
                   f"SELECT l_linenumber, l_extendedprice FROM lineitem "
                   f"WHERE l_orderkey = o_orderkey "
                   f"ORDER BY {oc} {d}, l_linenumber, l_extendedprice "
                   f"LIMIT {k}) t "
                   f"WHERE o_orderkey % {m} = 0")
        return sql, sql

    def q_rollup(self):
        """ROLLUP / CUBE / GROUPING SETS with coalesced labels (the
        group columns are non-null TPC-H fields, so a NULL is always a
        subtotal row, never data)."""
        t = self.rnd.choice(["lineitem", "orders", "customer", "part"])
        g1, g2 = self.rnd.sample(cols_of(t, {"str", "int"}), 2)
        gs = self.rnd.choice([
            f"ROLLUP({g1}, {g2})", f"CUBE({g1}, {g2})",
            f"GROUPING SETS (({g1}), ({g2}), ())"])
        e, nm = self.agg_expr(t)
        if nm == "n":
            nm = "n2"
        pred = self.predicate(t)
        sql = (f"SELECT COALESCE(CAST({g1} AS STRING), 'ALL') AS k1, "
               f"COALESCE(CAST({g2} AS STRING), 'ALL') AS k2, "
               f"COUNT(*) AS n, {e} AS {nm} "
               f"FROM {t} WHERE {pred} GROUP BY {gs}")
        return sql, sql

    def q_cte(self):
        """CTE aggregate joined back through the FK graph."""
        fact, fk, dim, dk = self.rnd.choice(
            [f for f in FKS if f[0] in ("lineitem", "orders", "customer")])
        e, nm = self.agg_expr(fact)
        if nm == "n":
            nm = "n2"
        pred = self.predicate(fact)
        dcol = self.rnd.choice(cols_of(dim, {"str", "int"}))
        thresh = self.rnd.randint(1, 3)
        sql = (f"WITH agg AS ("
               f"SELECT {fk} AS k, COUNT(*) AS n, {e} AS {nm} "
               f"FROM {fact} WHERE {pred} GROUP BY {fk}) "
               f"SELECT d.{dcol}, agg.k, agg.n, agg.{nm} "
               f"FROM agg JOIN {dim} d ON agg.k = d.{dk} "
               f"WHERE agg.n > {thresh}")
        return sql, sql

    def q_frame(self):
        """Window frame aggregation (ROWS BETWEEN) over an integer
        column, totally ordered inside each partition — engine-exact
        running sums, cast to BIGINT on both sides."""
        t, pk, ids = self.rnd.choice([
            ("lineitem", "l_orderkey", ["l_orderkey", "l_linenumber"]),
            ("orders", "o_custkey", ["o_orderkey"]),
            ("customer", "c_nationkey", ["c_custkey"]),
        ])
        ic = self.rnd.choice(cols_of(t, {"int"}))
        a = self.rnd.randint(1, 4)
        frame = self.rnd.choice([
            f"ROWS BETWEEN {a} PRECEDING AND CURRENT ROW",
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"])
        fn = self.rnd.choice(["SUM", "MIN", "MAX"])
        # the id columns are not a total order in the synthetic data
        # (lineitem repeats (l_orderkey, l_linenumber)); appending the
        # aggregated column makes remaining ties carry EQUAL frame
        # contributions, so the projected output is multiset-exact
        order = ", ".join(ids + [ic])
        idp = ", ".join(ids)
        pred = self.predicate(t)
        sql = (f"SELECT {idp}, CAST({fn}({ic}) OVER ("
               f"PARTITION BY {pk} ORDER BY {order} {frame}) AS BIGINT) "
               f"AS roll FROM {t} WHERE {pred}")
        return sql, sql

    def q_exists(self):
        """Correlated [NOT] EXISTS — the semi/anti join rewrite."""
        neg = self.rnd.choice(["", "NOT "])
        if self.rnd.random() < 0.5:
            p = self.predicate("lineitem")
            sql = (f"SELECT s_suppkey, s_name FROM supplier "
                   f"WHERE {neg}EXISTS (SELECT 1 FROM lineitem "
                   f"WHERE l_suppkey = s_suppkey AND {p})")
        else:
            p = self.predicate("orders")
            sql = (f"SELECT c_custkey, c_mktsegment FROM customer "
                   f"WHERE {neg}EXISTS (SELECT 1 FROM orders "
                   f"WHERE o_custkey = c_custkey AND {p})")
        return sql, sql

    def q_outer(self):
        """Null-heavy outer joins (round-13 verdict #5): a LEFT join
        whose predicate lives in the ON clause (null-extends instead
        of filtering — the classic outer-join trap), or a FULL join of
        two disjoint-ish filtered subsets. Null-ness surfaces through
        an IS NULL boolean plus COALESCE(-1) so no NULL ever reaches
        an int column (pandas would silently float-ify one side)."""
        if self.rnd.random() < 0.5:
            fact, fk, dim, dk = self.rnd.choice(
                [("orders", "o_custkey", "customer", "c_custkey"),
                 ("lineitem", "l_partkey", "part", "p_partkey"),
                 ("customer", "c_nationkey", "nation", "n_nationkey")])
            # dim on the LEFT, fact filtered in the ON clause: unmatched
            # dim rows survive with NULL fact columns
            p = self.predicate(fact, "f")
            fcol = cols_of(fact, {"int"})[0]
            sql = (f"SELECT d.{dk}, f.{fcol} IS NULL AS unmatched, "
                   f"COALESCE(f.{fcol}, -1) AS fval, COUNT(*) AS n "
                   f"FROM {dim} d LEFT JOIN {fact} f "
                   f"ON d.{dk} = f.{fk} AND {p} "
                   f"GROUP BY 1, 2, 3")
            return sql, sql
        t, uk = self.rnd.choice([("orders", "o_orderkey"),
                                 ("customer", "c_custkey"),
                                 ("part", "p_partkey")])
        p1, p2 = self.predicate(t, "x"), self.predicate(t, "y")
        m = self.rnd.choice([3, 5, 7])
        sql = (f"SELECT COALESCE(a.k, -1) AS ak, COALESCE(b.k, -1) AS bk, "
               f"a.k IS NULL AS only_b, b.k IS NULL AS only_a "
               f"FROM (SELECT {uk} AS k FROM {t} x WHERE {p1}) a "
               f"FULL JOIN (SELECT {uk} AS k FROM {t} y "
               f"WHERE {p2} AND {uk} % {m} = 0) b ON a.k = b.k")
        return sql, sql

    def q_decimal(self):
        """Decimal aggregation: exact integer cents lifted into
        DECIMAL so Spark's decimal sum/min/max path runs, final value
        cast back to DOUBLE (the decimal is exact and well under 2^53,
        so the double rendering is identical in both engines). AVG is
        deliberately absent: Spark keeps decimal scale +4 while DuckDB
        promotes to DOUBLE — not cross-engine exact."""
        t = self.rnd.choice([x for x in TABLES
                             if cols_of(x, {"money"})])
        c = self.rnd.choice(cols_of(t, {"money"}))
        g = self.rnd.choice(cols_of(t, {"str"}))
        dec = (f"CAST(CAST(round({c} * 100) AS BIGINT) "
               f"AS DECIMAL(18,0))")
        f1 = self.rnd.choice(["MIN", "MAX"])
        pred = self.predicate(t)
        sql = (f"SELECT {g}, CAST(SUM({dec}) AS DOUBLE) AS dsum, "
               f"CAST({f1}({dec}) AS DOUBLE) AS dmm, COUNT(*) AS n "
               f"FROM {t} WHERE {pred} GROUP BY {g}")
        return sql, sql

    def q_having_window(self):
        """Window over a grouped-and-HAVING-filtered aggregate in the
        same SELECT (round-13 verdict #5): the rank sees only groups
        that survive HAVING, which both engines must agree on before
        the window even runs. Full tiebreak (group key is unique per
        row) keeps ranks engine-exact."""
        t = self.rnd.choice(["lineitem", "orders", "customer", "part"])
        g = self.rnd.choice(cols_of(t, {"str", "int"}))
        e, nm = self.agg_expr(t)
        if nm == "n":
            nm = "n2"
        thresh = self.rnd.randint(1, 3)
        keep = self.rnd.choice([5, 10, 20])
        d = self.rnd.choice(["ASC", "DESC"])
        sql = (f"SELECT k, n, {nm}, rk FROM ("
               f"SELECT {g} AS k, COUNT(*) AS n, {e} AS {nm}, "
               f"RANK() OVER (ORDER BY COUNT(*) {d}, {g}) AS rk "
               f"FROM {t} GROUP BY {g} HAVING COUNT(*) > {thresh}) w "
               f"WHERE rk <= {keep}")
        return sql, sql

    def q_setop_limit(self):
        """Set op feeding ORDER BY ... LIMIT (round-13 verdict #5):
        ties at the cut boundary are only multiset-deterministic if
        the ORDER BY covers every projected column — which it does, so
        any rows tied across the boundary are identical and the cut is
        engine-exact as a multiset."""
        t = self.rnd.choice(["orders", "customer", "part", "lineitem"])
        ints = cols_of(t, {"int"})
        c1 = self.rnd.choice(ints)
        c2 = self.rnd.choice(
            [c for c in cols_of(t, {"str", "int"}) if c != c1])
        p1, p2 = self.predicate(t), self.predicate(t)
        op = self.rnd.choice(["UNION", "UNION ALL", "INTERSECT",
                              "EXCEPT"])
        k = self.rnd.choice([5, 10, 25])
        d = self.rnd.choice(["ASC", "DESC"])
        sql = (f"SELECT {c1}, {c2} FROM {t} WHERE {p1} "
               f"{op} SELECT {c1}, {c2} FROM {t} WHERE {p2} "
               f"ORDER BY {c1} {d}, {c2} LIMIT {k}")
        return sql, sql

    # --------------------------------------- event-time (round 15)
    # Batch-form event-time windows over the events table — the one
    # SURVEY §2 family (streaming windows) the batch grammar skipped.
    # Bucketing is exact integer epoch-second arithmetic in both
    # engines (no interval / time_bucket dialect divergence to
    # reconcile): Spark reads ts as timestamp_ntz with session TZ
    # UTC, DuckDB reads the same file naive — identical wall clocks,
    # identical epoch seconds, identical buckets.
    SECS_SPARK = "unix_timestamp(CAST(ts AS TIMESTAMP))"
    SECS_DUCK = "(epoch_us(ts) // 1000000)"

    def q_tumbling(self):
        """Tumbling window aggregate over fixed-width epoch buckets.
        Only order-independent aggregates (counts / min / max), so
        the result is engine-exact with no float summation."""
        w = self.rnd.choice([900, 3600, 21600, 86400])
        pred = self.predicate("events")
        g = self.rnd.choice(["event_type", "(user_id % 8)"])
        agg = self.rnd.choice(["COUNT(DISTINCT user_id)",
                               "MIN(event_id)", "MAX(event_id)"])

        def render(secs, idiv):
            b = f"((({secs}) {idiv} {w}) * {w})"
            return (f"SELECT {b} AS bucket_start, {g} AS g, "
                    f"COUNT(*) AS n, {agg} AS m "
                    f"FROM events WHERE {pred} GROUP BY 1, 2")
        return render(self.SECS_SPARK, "DIV"), render(self.SECS_DUCK, "//")

    def q_hopping(self):
        """Hopping window, width = 2 x hop: every event lands in
        exactly two windows — the per-event window-start expansion is
        the dialect-divergent bit (explode vs unnest), the counting
        is identical."""
        hop = self.rnd.choice([900, 3600, 21600])
        pred = self.predicate("events")
        agg = self.rnd.choice(["COUNT(DISTINCT user_id)",
                               "MIN(event_id)", "MAX(event_id)"])

        def render(secs, idiv, expand):
            b = f"((({secs}) {idiv} {hop}) * {hop})"
            starts = expand.format(a=b, b=f"({b} - {hop})")
            return (f"SELECT wstart, event_type, COUNT(*) AS n, {agg} AS m "
                    f"FROM (SELECT event_type, user_id, event_id, "
                    f"{starts} AS wstart "
                    f"FROM events WHERE {pred}) t GROUP BY 1, 2")
        return (render(self.SECS_SPARK, "DIV", "explode(array({a}, {b}))"),
                render(self.SECS_DUCK, "//", "unnest([{a}, {b}])"))

    def q_session(self):
        """Gap-based sessionization in batch form: a session break is
        a gap > G seconds from the same user's previous event; the
        session id is the running break count (LAG + windowed SUM,
        spelled identically in both dialects over exact integer
        seconds; (sec, event_id) is a total order). The BIGINT cast
        on the running sum keeps DuckDB's HUGEINT sum out of pandas
        floats."""
        gap = self.rnd.choice([600, 1800, 3600, 14400])
        pred = self.predicate("events")

        def render(secs):
            return (
                f"WITH o AS (SELECT user_id, event_id, {secs} AS sec "
                f"FROM events WHERE {pred}), "
                "b AS (SELECT user_id, event_id, sec, "
                "CASE WHEN sec - LAG(sec) OVER (PARTITION BY user_id "
                f"ORDER BY sec, event_id) > {gap} THEN 1 ELSE 0 END AS brk "
                "FROM o), "
                "s AS (SELECT user_id, sec, CAST(SUM(brk) OVER "
                "(PARTITION BY user_id ORDER BY sec, event_id "
                "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
                "AS BIGINT) AS sid FROM b) "
                "SELECT user_id, sid, COUNT(*) AS n, MIN(sec) AS t0, "
                "MAX(sec) AS t1 FROM s GROUP BY user_id, sid")
        return render(self.SECS_SPARK), render(self.SECS_DUCK)

    SHAPES = ["q_scan", "q_join", "q_agg", "q_window", "q_explode",
              "q_limit", "q_union", "q_subquery", "q_lateral",
              "q_rollup", "q_cte", "q_frame", "q_exists",
              "q_outer", "q_decimal", "q_having_window", "q_setop_limit",
              "q_tumbling", "q_hopping", "q_session"]

    def generate(self, i):
        shape = self.SHAPES[i % len(self.SHAPES)]
        return shape, *getattr(self, shape)()

    # ---------------------------------------- pipeline-operator shapes
    # These fuzz the ns_ dedup/mixing/retrieval LIBRARY operators the
    # SQL grammar cannot express, by randomizing their parameters
    # (minSim, shingle n, df caps, budgets, fixture residues — the
    # round-16 verdict's ask). The Scala side (graft.FuzzOps) runs the
    # operator AND dumps its own parameterized oracle template, so
    # there is exactly one source of truth for the semantics; this
    # side only picks parameters, executes the dumped SQL in DuckDB,
    # and compares. Parameter ranges are sized to stay cheap at
    # sf0.01 in both engines (shingle n >= 3 and df caps <= 100 bound
    # the pair fan-out).
    OP_SHAPES = ["ngram_jaccard", "ngram_containment", "bm25_topdocs",
                 "bm25_query", "token_budget_mix", "keep_best",
                 # round-17: standing-state (incremental) shapes — the
                 # fixed fixtures with randomized residues/splits/minSim
                 "dedup_incr", "keep_best_incr", "bm25_index_split",
                 # round-18: the COMPOSED keep-best + BM25 ingest loop
                 # (both standing indexes mutated per batch)
                 "corpus_keep_best_bm25"]

    def gen_op(self, i):
        op = self.OP_SHAPES[i % len(self.OP_SHAPES)]
        r = self.rnd
        if op == "ngram_jaccard":
            p = {"minSim": round(r.uniform(0.3, 0.8), 2),
                 "maxDf": r.choice([20, 50, 100]),
                 "n": r.choice([3, 4, 5]),
                 "residue": r.randrange(10)}
        elif op == "ngram_containment":
            p = {"minCont": round(r.uniform(0.5, 0.95), 2),
                 "maxDf": r.choice([20, 50, 100]),
                 "n": r.choice([3, 4, 5]),
                 "residue": r.randrange(10)}
        elif op == "bm25_topdocs":
            p = {"nTerms": r.randint(5, 40), "k": r.randint(1, 5)}
        elif op == "bm25_query":
            p = {"nQueries": r.randint(2, 8), "qTerms": r.randint(2, 5),
                 "k": r.randint(1, 5)}
        elif op == "token_budget_mix":
            p = {"budgetPer": r.choice([500, 1000, 2000, 4000, 8000]),
                 "budgetMod": r.choice([3, 5, 8, 12])}
        elif op == "keep_best":
            p = {"minSim": r.choice([0.35, 0.4, 0.5, 0.6, 0.7])}
        elif op == "dedup_incr":
            # residue split: keep the batch a small fraction (the
            # incremental-ingest contract) but never the fixed fixture
            p = {"minSim": r.choice([0.35, 0.4, 0.5, 0.6, 0.7]),
                 "m1": r.choice([40, 50, 60]), "r1": r.randrange(10),
                 "m2": r.choice([25, 30, 35]), "r2": r.randrange(10)}
        elif op == "keep_best_incr":
            p = {"minSim": r.choice([0.35, 0.4, 0.5, 0.6, 0.7])}
        elif op == "bm25_index_split":
            p = {"splitMod": r.choice([2, 3, 4, 5]),
                 "nTerms": r.randint(5, 40), "k": r.randint(1, 5)}
        else:  # corpus_keep_best_bm25
            p = {"minSim": r.choice([0.35, 0.4, 0.5, 0.6, 0.7]),
                 "nTerms": r.randint(5, 20), "k": r.randint(1, 4)}
        return op, p


# ------------------------------------------------------------ compare
def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def compare(name, spark_dir, con, duck_sql):
    files = sorted(glob.glob(f"{spark_dir}/{name}/*.parquet"))
    if not files:
        err = f"{spark_dir}/{name}.err"
        detail = open(err).read()[:200] if os.path.exists(err) else "no output"
        return f"spark error: {detail}"
    try:
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        want = norm(con.execute(duck_sql).fetchdf())
    except Exception as e:
        return f"read/exec error: {type(e).__name__}: {e}"
    if list(got.columns) != list(want.columns):
        return f"columns {list(got.columns)} != {list(want.columns)}"
    if len(got) != len(want):
        return f"rows {len(got)} != {len(want)}"
    bad = [c for c in got.columns
           if {got[c].dtype.kind, want[c].dtype.kind} == {"i", "f"}]
    if bad:
        return f"int-vs-float dtype kind on {bad}"
    try:
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      check_exact=True)
    except AssertionError as e:
        return "value mismatch: " + " | ".join(str(e).splitlines()[:3])
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graft_fuzz")
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--n-ops", type=int, default=0,
                    help="additional parameterized pipeline-op queries")
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--report", default="FUZZ.json")
    ap.add_argument("--skip-spark", action="store_true",
                    help="compare only (results already produced)")
    args = ap.parse_args()

    gen = Gen(args.sf_dir, args.seed)
    if not args.skip_spark and os.path.exists(args.out):
        shutil.rmtree(args.out)
    os.makedirs(f"{args.out}/spark_sql", exist_ok=True)
    os.makedirs(f"{args.out}/duck_sql", exist_ok=True)

    queries = {}
    for i in range(args.n):
        shape, spark_sql, duck_sql = gen.generate(i)
        name = f"fz_{i:04d}_{shape[2:]}"
        queries[name] = (spark_sql, duck_sql)
        open(f"{args.out}/spark_sql/{name}.sql", "w").write(spark_sql)
        open(f"{args.out}/duck_sql/{name}.sql", "w").write(duck_sql)
    op_names = []
    if args.n_ops:
        os.makedirs(f"{args.out}/ops", exist_ok=True)
        for i in range(args.n_ops):
            op, params = gen.gen_op(i)
            name = f"fzop_{i:04d}_{op}"
            op_names.append(name)
            lines = [f"op={op}"] + [f"{k}={v}" for k, v in params.items()]
            open(f"{args.out}/ops/{name}.props", "w").write(
                "\n".join(lines) + "\n")
    print(f"generated {len(queries)} paired queries + {len(op_names)} "
          f"op specs (seed={args.seed})")

    if not args.skip_spark:
        add_opens = []
        for p in ["java.lang", "java.lang.invoke", "java.lang.reflect",
                  "java.io", "java.net", "java.nio", "java.util",
                  "java.util.concurrent", "java.util.concurrent.atomic",
                  "sun.nio.ch", "sun.nio.cs", "sun.security.action",
                  "sun.util.calendar"]:
            add_opens += ["--add-opens", f"java.base/{p}=ALL-UNNAMED"]
        cmd = ["java", "-Xmx8g", *add_opens,
               "-Dspark.ui.enabled=false",
               "-Dspark.sql.session.timeZone=UTC",
               "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
               "graft.Fuzz", args.sf_dir, args.out]
        env = dict(os.environ, SPARK_GRAFT_CPUS="8")
        r = subprocess.run(cmd, env=env, capture_output=True, text=True,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        print(r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "")
        if r.returncode != 0:
            print(r.stderr[-2000:])
            sys.exit(1)

    mismatches = {}
    for name, (_, duck_sql) in sorted(queries.items()):
        detail = compare(name, f"{args.out}/results", gen.con, duck_sql)
        if detail:
            mismatches[name] = detail
            print(f"FAIL {name}: {detail}")
    for name in op_names:
        # the op's oracle template is dumped BY the Scala run (one
        # source of truth); a missing dump means the op crashed
        sql_path = f"{args.out}/ops_oracle/{name}.sql"
        if not os.path.exists(sql_path):
            detail = compare(name, f"{args.out}/results", gen.con,
                             "SELECT 1 WHERE 1=0")
            mismatches[name] = detail or "op ran but dumped no oracle"
            print(f"FAIL {name}: {mismatches[name]}")
            continue
        detail = compare(name, f"{args.out}/results", gen.con,
                         open(sql_path).read())
        if detail:
            mismatches[name] = detail
            print(f"FAIL {name}: {detail}")
    total = len(queries) + len(op_names)
    report = {
        "seed": args.seed, "n": total, "n_sql": len(queries),
        "n_ops": len(op_names), "sf_dir": args.sf_dir,
        "passed": total - len(mismatches),
        "failed": len(mismatches), "mismatches": mismatches,
    }
    json.dump(report, open(args.report, "w"), indent=1)
    print(f"fuzz: {report['passed']}/{report['n']} matched "
          f"-> {args.report}")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
