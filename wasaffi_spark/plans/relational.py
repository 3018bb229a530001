"""The declared relational query catalog (SURVEY §2C/§2D).

The reference inherits its entire relational surface from embedded
DataFusion v38 — every ``ctx.sql`` call routes into the full engine
(/root/reference/wasmedge_factory/src/lib.rs:192, Cargo.toml:18). This
module pins the equivalent Spark SQL surface, one representative query per
capability row of SURVEY §2C, each with a DuckDB oracle for the t2
correctness gate.

Conventions:

- Every computed column is aliased identically in the Spark query and the
  oracle SQL (the driver's compare hashes columns by name).
- Aggregates over doubles that would be sensitive to summation order
  (sum/avg of prices) are rounded at a precision far coarser than the
  accumulated FP error but far finer than the data, so Spark's partial
  aggregation and DuckDB's sequential sum hash identically.
- Small dimension tables get explicit ``BROADCAST`` hints — at 100 TB the
  fact tables shuffle on join keys only when the dim side is genuinely
  large; region/nation/supplier/part are classic broadcast dims.

Scale notes per query are in each docstring where non-obvious.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def _load(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    from ..engine import Engine

    if tables:
        Engine(spark).load_tables(sf_dir, tables)


def query(name: str, tables: tuple[str, ...], sql: str, oracle: str | None = None):
    """Register a SQL-defined query; oracle defaults to the same text
    (the overlap of Spark SQL and DuckDB SQL is the point — SURVEY §2C)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _load(spark, sf_dir, *tables)
        return spark.sql(sql)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = sql
    QUERIES[name] = fn
    ORACLE[name] = oracle if oracle is not None else sql
    return fn


def query_no_oracle(name: str, tables: tuple[str, ...], sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _load(spark, sf_dir, *tables)
        return spark.sql(sql)

    fn.__name__ = f"q_{name}"
    fn.__doc__ = sql
    QUERIES[name] = fn
    return fn


# -- sources / scan ---------------------------------------------------------

query(
    "scan_count",
    ("lineitem",),
    "select count(*) as cnt from lineitem",
)

# -- projection / filter ----------------------------------------------------
# Pushdown: the shipdate/discount predicates reach the parquet scan
# (PushedFilters), and only 4 columns are read (ReadSchema).

query(
    "filter_project",
    ("lineitem",),
    """select l_orderkey, l_extendedprice * (1 - l_discount) as revenue
       from lineitem
       where l_shipdate between timestamp '1994-01-01 00:00:00'
                            and timestamp '1994-12-31 00:00:00'
         and l_discount > 0.05""",
)

# -- joins ------------------------------------------------------------------
# nation is tiny → broadcast; at 100 TB the customer side never shuffles.

query(
    "join_agg",
    ("customer", "nation"),
    """select /*+ BROADCAST(nation) */ n_name, count(*) as cnt
       from customer join nation on c_nationkey = n_nationkey
       group by n_name order by n_name""",
    oracle="""select n_name, count(*) as cnt
       from customer join nation on c_nationkey = n_nationkey
       group by n_name order by n_name""",
)

query(
    "outer_join",
    ("customer", "orders"),
    """select c_custkey, count(o_orderkey) as order_cnt
       from customer left join orders on c_custkey = o_custkey
       group by c_custkey order by c_custkey limit 20""",
)

query(
    "anti_join",
    ("customer", "orders"),
    """select count(*) as cnt from customer
       where not exists (select 1 from orders where o_custkey = c_custkey)""",
)

query(
    "semi_join",
    ("customer", "orders"),
    """select count(*) as cnt from customer
       where exists (select 1 from orders
                     where o_custkey = c_custkey and o_totalprice > 100000)""",
)

query(
    "cross_join",
    ("region",),
    "select count(*) as cnt from region r1 cross join region r2",
)

# -- aggregation ------------------------------------------------------------
# TPC-H Q1 shape. sum_qty is exact (integral doubles); price aggregates are
# rounded (sum to 2dp on a ~1e8 magnitude, avg to 4dp) so partial-agg
# summation order cannot flip the hash.

query(
    "agg_pricing",
    ("lineitem",),
    """select l_returnflag, l_linestatus,
              sum(l_quantity) as sum_qty,
              round(sum(l_extendedprice), 2) as sum_price,
              round(avg(l_extendedprice), 4) as avg_price,
              count(*) as cnt
       from lineitem
       group by l_returnflag, l_linestatus
       order by l_returnflag, l_linestatus""",
)

query(
    "agg_stats",
    ("orders",),
    """select o_orderpriority,
              round(stddev_samp(o_totalprice), 4) as sd_price,
              round(var_samp(o_totalprice), 2) as var_price,
              min(o_totalprice) as min_price,
              max(o_totalprice) as max_price,
              count(distinct o_custkey) as n_cust
       from orders group by o_orderpriority order by o_orderpriority""",
)

# correlation / covariance (the remaining SURVEY §2C agg row entries)
query(
    "agg_corr",
    ("lineitem",),
    """select l_returnflag,
              round(corr(l_quantity, l_extendedprice), 6) as qp_corr,
              round(covar_samp(l_quantity, l_discount), 6) as qd_covar,
              count(*) as cnt
       from lineitem group by l_returnflag order by l_returnflag""",
)

# fixed-width histogram via pure arithmetic (portable width_bucket)
query(
    "histogram",
    ("orders",),
    """select cast(floor(o_totalprice / 50000) as bigint) as bucket,
              count(*) as cnt,
              round(min(o_totalprice), 2) as lo,
              round(max(o_totalprice), 2) as hi
       from orders group by bucket order by bucket""",
)

query(
    "having",
    ("orders",),
    """select o_custkey, count(*) as cnt from orders
       group by o_custkey having count(*) >= 5 order by o_custkey""",
)

# aggregation into collections: sorted for cross-engine determinism
# (collect_list/list() order is execution-dependent in both engines).
query(
    "array_agg",
    ("nation",),
    """select n_regionkey,
              sort_array(collect_list(n_name)) as names,
              cast(size(collect_list(n_name)) as bigint) as n
       from nation group by n_regionkey order by n_regionkey""",
    oracle="""select n_regionkey,
              list_sort(list(n_name)) as names,
              cast(len(list(n_name)) as bigint) as n
       from nation group by n_regionkey order by n_regionkey""",
)

query(
    "string_agg",
    ("region",),
    """select listagg(r_name, ',') within group (order by r_name) as all_regions
       from region""",
    oracle="""select string_agg(r_name, ',' order by r_name) as all_regions
       from region""",
)

query_no_oracle(
    "approx_distinct",
    ("orders",),
    "select approx_count_distinct(o_custkey) as acd from orders",
)

# approx percentile (t-digest in Spark, different sketch in DuckDB) —
# rows-only like every approx aggregate.
query_no_oracle(
    "approx_percentile",
    ("orders",),
    """select o_orderpriority,
              percentile_approx(o_totalprice, 0.5) as p50,
              percentile_approx(o_totalprice, 0.95) as p95
       from orders group by o_orderpriority order by o_orderpriority""",
)

# EXPLAIN surface (SURVEY §2C) — smoke-only: returns the plan as text.
query_no_oracle(
    "explain_smoke",
    ("lineitem",),
    "explain select count(*) from lineitem",
)

# -- grouping sets / rollup / cube -----------------------------------------

query(
    "rollup",
    ("lineitem",),
    """select l_returnflag, l_linestatus, sum(l_quantity) as sum_qty
       from lineitem group by rollup(l_returnflag, l_linestatus)
       order by l_returnflag nulls first, l_linestatus nulls first""",
)

query(
    "cube",
    ("orders",),
    """select o_orderstatus, o_orderpriority, count(*) as cnt
       from orders group by cube(o_orderstatus, o_orderpriority)
       order by o_orderstatus nulls first, o_orderpriority nulls first""",
)

# -- window functions -------------------------------------------------------

query(
    "window_rownum",
    ("orders",),
    """select o_custkey, o_orderkey,
              cast(row_number() over (partition by o_custkey
                                 order by o_orderdate, o_orderkey) as bigint) as rn
       from orders order by o_custkey, rn limit 100""",
)

query(
    "window_rank_lag",
    ("orders",),
    """select o_custkey, o_orderkey,
              cast(rank() over (partition by o_custkey order by o_totalprice desc,
                           o_orderkey) as bigint) as rnk,
              lag(o_orderkey) over (partition by o_custkey
                                    order by o_orderdate, o_orderkey) as prev_ok
       from orders order by o_custkey, o_orderkey limit 100""",
)

query(
    "window_frame",
    ("orders",),
    """select o_orderkey,
              round(sum(o_totalprice) over (partition by o_custkey
                    order by o_orderdate, o_orderkey
                    rows between unbounded preceding and current row), 2)
                as running_total
       from orders order by o_orderkey limit 100""",
)

# -- sort / limit / top-k ---------------------------------------------------
# Catalyst compiles this to TakeOrderedAndProject: no global sort at scale.

query(
    "topk",
    ("orders",),
    """select o_orderkey, o_totalprice from orders
       order by o_totalprice desc, o_orderkey limit 10""",
)

# -- set operations ---------------------------------------------------------

query(
    "setop_intersect",
    ("customer", "supplier"),
    """select c_nationkey as nationkey from customer
       intersect
       select s_nationkey as nationkey from supplier
       order by nationkey""",
)

query(
    "setop_except",
    ("customer", "supplier"),
    """select c_nationkey as nationkey from customer
       except
       select s_nationkey as nationkey from supplier
       order by nationkey""",
)

query(
    "union_all",
    ("customer", "supplier"),
    """select count(*) as cnt from (
         select c_nationkey as nationkey from customer
         union all
         select s_nationkey as nationkey from supplier) u""",
)

# -- subqueries / CTEs ------------------------------------------------------

query(
    "subquery_scalar",
    ("orders",),
    """select o_orderkey from orders o
       where o_totalprice > (select avg(o_totalprice) from orders)
       order by o_orderkey limit 20""",
)

query(
    "subquery_in",
    ("orders", "customer"),
    """select count(*) as cnt from orders
       where o_custkey in (select c_custkey from customer
                           where c_mktsegment = 'BUILDING')""",
)

query(
    "cte",
    ("orders",),
    """with big as (
         select o_custkey, sum(o_totalprice) as s
         from orders group by o_custkey)
       select count(*) as cnt from big where s > 100000""",
)

query(
    "values_inline",
    (),
    """select * from (values (1, 'a'), (2, 'b')) as v(id, tag) order by id""",
)

query(
    "distinct",
    ("orders",),
    "select distinct o_orderpriority from orders order by o_orderpriority",
)

# -- scalar function library ------------------------------------------------

query(
    "string_fns",
    ("part",),
    """select p_partkey,
              upper(substr(p_name, 1, 5)) as pfx,
              cast(length(p_name) as bigint) as name_len,
              replace(p_brand, 'Brand', 'B') as brand_s,
              concat(p_type, '/', p_brand) as type_brand
       from part order by p_partkey limit 20""",
)

# date_trunc returns TIMESTAMP in Spark but DATE in DuckDB — cast both to
# DATE so the hashed values agree.
query(
    "date_fns",
    ("orders",),
    """select cast(date_trunc('month', o_orderdate) as date) as m, count(*) as cnt
       from orders group by m order by m""",
)

query(
    "date_extract",
    ("orders",),
    """select cast(extract(year from o_orderdate) as bigint) as y,
              cast(extract(month from o_orderdate) as bigint) as mo,
              count(*) as cnt
       from orders group by y, mo order by y, mo""",
)

query(
    "math_fns",
    ("part",),
    """select p_partkey,
              round(sqrt(p_retailprice), 2) as sq,
              abs(p_size - 25) as sz_dist,
              floor(p_retailprice) as fl,
              ceil(p_retailprice) as ce
       from part order by p_partkey limit 20""",
    # Spark floor/ceil return BIGINT; DuckDB's return DOUBLE — cast.
    oracle="""select p_partkey,
              round(sqrt(p_retailprice), 2) as sq,
              abs(p_size - 25) as sz_dist,
              cast(floor(p_retailprice) as bigint) as fl,
              cast(ceil(p_retailprice) as bigint) as ce
       from part order by p_partkey limit 20""",
)

query(
    "conditional_fns",
    ("lineitem",),
    """select coalesce(nullif(l_returnflag, 'N'), 'X') as f, count(*) as cnt
       from lineitem group by f order by f""",
)

query(
    "case_when",
    ("orders",),
    """select case when o_totalprice < 50000 then 'small'
                   when o_totalprice < 150000 then 'medium'
                   else 'large' end as bucket,
              count(*) as cnt
       from orders group by bucket order by bucket""",
)

# -- pivot / unpivot --------------------------------------------------------
# Spark's PIVOT operator; the oracle expresses the same result portably
# as conditional aggregation.

query(
    "pivot",
    ("orders",),
    # coalesce: Spark PIVOT yields NULL for absent combinations where
    # conditional aggregation (the oracle) yields 0.
    """select o_orderpriority,
              coalesce(st_o, 0) as st_o,
              coalesce(st_f, 0) as st_f,
              coalesce(st_p, 0) as st_p
       from (select o_orderpriority, o_orderstatus from orders)
       pivot (count(*) for o_orderstatus in ('O' as st_o, 'F' as st_f, 'P' as st_p))
       order by o_orderpriority""",
    oracle="""select o_orderpriority,
              count(*) filter (where o_orderstatus = 'O') as st_o,
              count(*) filter (where o_orderstatus = 'F') as st_f,
              count(*) filter (where o_orderstatus = 'P') as st_p
       from orders group by o_orderpriority order by o_orderpriority""",
)

query(
    "unpivot",
    ("part",),
    """select p_partkey, metric, val from
         (select p_partkey, p_retailprice, cast(p_size as double) as p_size_d
          from part)
       unpivot (val for metric in (p_retailprice as price, p_size_d as size))
       order by p_partkey, metric limit 40""",
    oracle="""select p_partkey, metric, val from (
         select p_partkey, 'price' as metric, p_retailprice as val from part
         union all
         select p_partkey, 'size' as metric, cast(p_size as double) as val from part)
       order by p_partkey, metric limit 40""",
)

# -- arrays / structs / json -----------------------------------------------

query(
    "array_fns",
    ("embeddings",),
    """select vec_id, cast(size(embedding) as int) as emb_len
       from embeddings order by vec_id limit 10""",
    oracle="""select vec_id, cast(len(embedding) as int) as emb_len
       from embeddings order by vec_id limit 10""",
)

query(
    "struct_access",
    ("orders",),
    """select named_struct('k', o_orderkey, 'p', o_totalprice).p as p_price
       from orders order by o_orderkey limit 5""",
    oracle="""select struct_pack(k := o_orderkey, p := o_totalprice).p as p_price
       from orders order by o_orderkey limit 5""",
)

# map type: build + element_at; the oracle reduces to the underlying
# scalar (DuckDB's map extraction semantics differ across versions).
query(
    "map_access",
    ("orders",),
    """select o_orderkey,
              element_at(map('price', o_totalprice, 'neg', -o_totalprice),
                         'price') as price_val
       from orders order by o_orderkey limit 10""",
    oracle="""select o_orderkey, o_totalprice as price_val
       from orders order by o_orderkey limit 10""",
)

# schema-based JSON parsing (from_json → typed struct field), vs the
# path-extraction flavor in json_extract.
query(
    "json_struct",
    ("events",),
    """select event_id,
              from_json(props, 'k int').k as k_int
       from events order by event_id limit 20""",
    oracle="""select event_id, (props ->> '$.k')::int as k_int
       from events order by event_id limit 20""",
)

# interval arithmetic on timestamps.
query(
    "interval_arith",
    ("orders",),
    """select o_orderkey,
              o_orderdate + interval 30 day as due,
              cast(o_orderdate - interval 1 hour as timestamp) as hour_before
       from orders order by o_orderkey limit 20""",
    oracle="""select o_orderkey,
              o_orderdate + interval 30 day as due,
              cast(o_orderdate - interval 1 hour as timestamp) as hour_before
       from orders order by o_orderkey limit 20""",
)

query(
    "json_extract",
    ("events",),
    """select event_id, get_json_object(props, '$.k') as k
       from events order by event_id limit 10""",
    oracle="""select event_id, props ->> '$.k' as k
       from events order by event_id limit 10""",
)

# -- the reference's own surface: scalar UDF via CREATE FUNCTION ------------
# (≙ `select a, b, f1(a,b) from t`, lib.rs:194-198; here over a real table
# with exact-in-FP values so the DuckDB oracle's native pow() matches
# bit-for-bit.)


def _q_udf_pow(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from ..engine import Engine

    eng = Engine(spark)
    eng.load_tables(sf_dir, ("lineitem",))
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    udfs = os.path.join(repo, "fixtures", "udfs.py")
    eng.sql(
        "CREATE OR REPLACE FUNCTION f1(DOUBLE, DOUBLE) RETURNS DOUBLE "
        f"LANGUAGE WASM AS '{udfs}!f1'"
    )
    return eng.sql(
        """select l_linenumber, f1(cast(l_linenumber as double), 2.0) as sq
           from lineitem group by l_linenumber, sq order by l_linenumber"""
    )


_q_udf_pow.__name__ = "q_udf_pow"
QUERIES["udf_pow"] = _q_udf_pow
ORACLE["udf_pow"] = (
    """select l_linenumber, pow(cast(l_linenumber as double), 2.0) as sq
       from lineitem group by l_linenumber, sq order by l_linenumber"""
)


def _fixture_path() -> str:
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, "fixtures", "udfs.py")


def _q_udf_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARRAY<FLOAT> argument through the DDL-registered boundary: L2 norm
    of each embedding (the reference only ever exercises DOUBLE —
    SURVEY §1.2; this pins the full Arrow type lattice claim)."""
    from ..engine import Engine

    eng = Engine(spark)
    eng.load_tables(sf_dir, ("embeddings",))
    eng.sql(
        "CREATE OR REPLACE FUNCTION emb_norm(ARRAY<FLOAT>) RETURNS DOUBLE "
        f"AS '{_fixture_path()}!emb_norm'"
    )
    return eng.sql(
        """select vec_id, round(emb_norm(embedding), 6) as l2
           from embeddings order by vec_id limit 50"""
    )


_q_udf_array.__name__ = "q_udf_array"
QUERIES["udf_array"] = _q_udf_array
ORACLE["udf_array"] = (
    """select vec_id,
              round(sqrt(list_dot_product(embedding::DOUBLE[],
                                          embedding::DOUBLE[])), 6) as l2
       from embeddings order by vec_id limit 50"""
)


def _q_udf_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRING → BIGINT through the DDL-registered boundary."""
    from ..engine import Engine

    eng = Engine(spark)
    eng.load_tables(sf_dir, ("part",))
    eng.sql(
        "CREATE OR REPLACE FUNCTION str_len_upper(VARCHAR) RETURNS BIGINT "
        f"AS '{_fixture_path()}!str_len_upper'"
    )
    return eng.sql(
        """select p_partkey, str_len_upper(p_name) as ulen
           from part order by p_partkey limit 50"""
    )


_q_udf_string.__name__ = "q_udf_string"
QUERIES["udf_string"] = _q_udf_string
ORACLE["udf_string"] = (
    """select p_partkey, cast(length(upper(p_name)) as bigint) as ulen
       from part order by p_partkey limit 50"""
)


# BPE-ish token counting (north-star text op): regex word-piece count +
# a chars/3.5 subword estimate — both exact cross-engine.
query(
    "token_counts",
    ("documents",),
    r"""select doc_id,
              cast(size(split(text, '\\s+')) as bigint) as ws_tokens,
              cast(regexp_count(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]') as bigint)
                as re_tokens,
              cast(ceil(length(text) / 3.5) as bigint) as bpe_estimate
       from documents order by doc_id""",
    oracle=r"""select doc_id,
              len(string_split_regex(text, '\s+')) as ws_tokens,
              len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                as re_tokens,
              cast(ceil(length(text) / 3.5) as bigint) as bpe_estimate
       from documents order by doc_id""",
)
