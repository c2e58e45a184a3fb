"""The reference is a SQL extension; its query shapes must work from
spark.sql too — build on the DataFrame API, probe/estimate in SQL."""

import pytest
from pyspark.sql import functions as F

from bitfilters_spark.functions import build_filter
from bitfilters_spark.functions.hashing import spark_hash64
from bitfilters_spark.sql import register_sql_functions

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ctx(spark):
    register_sql_functions(spark)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keyed = orders.select(
        (F.col("o_orderkey") % 2).alias("grp"), spark_hash64("o_orderkey").alias("h")
    )
    keyed.createOrReplaceTempView("sql_keyed")
    return keyed


def test_sql_contains_member_counts(spark, ctx):
    """The reference's member-count test shape, written in SQL."""
    build_filter(ctx, ["grp"], "h", "duckdb_bloom", num_sectors=2048) \
        .createOrReplaceTempView("sql_filters")
    got = {
        r["grp"]: r["n"]
        for r in spark.sql("""
            SELECT k.grp, count(*) AS n
            FROM sql_keyed k JOIN sql_filters f USING (grp)
            WHERE bf_contains(f.filter, k.h)
            GROUP BY k.grp
        """).collect()
    }
    want = {r["grp"]: r["count"] for r in ctx.groupBy("grp").count().collect()}
    assert got == want


def test_sql_sketch_estimates(spark, ctx):
    build_filter(ctx, [], "h", "kmv", k=1 << 15).createOrReplaceTempView("sql_kmv")
    est = spark.sql("SELECT bf_kmv_distinct(filter) AS d FROM sql_kmv").collect()[0]["d"]
    assert est == ctx.select("h").distinct().count()

    build_filter(ctx, [], "h", "cms", d=4, w=1 << 15).createOrReplaceTempView("sql_cms")
    over = spark.sql("""
        SELECT count(*) AS bad FROM (
          SELECT k.h, any_value(c.n_exact) AS n_exact,
                 any_value(bf_cms_estimate(s.filter, k.h)) AS est
          FROM sql_keyed k
          CROSS JOIN sql_cms s
          JOIN (SELECT h, count(*) AS n_exact FROM sql_keyed GROUP BY h) c
            ON c.h = k.h
          GROUP BY k.h)
        WHERE est < n_exact
    """).collect()[0]["bad"]
    assert over == 0  # never underestimates


def test_sql_hash_parity(spark, ctx):
    import duckdb

    got = spark.sql(
        "SELECT h, bf_duckdb_hash(h) AS dh FROM sql_keyed LIMIT 50"
    ).collect()
    con = duckdb.connect()
    for r in got:
        want = con.sql(f"SELECT hash({r['h']}::BIGINT) AS h").fetchone()[0]
        want_signed = want - (1 << 64) if want > (1 << 63) - 1 else want
        assert r["dh"] == want_signed


def test_sql_filter_kind(spark, ctx):
    build_filter(ctx, [], "h", "xor8").createOrReplaceTempView("sql_x8")
    k = spark.sql("SELECT bf_filter_kind(filter) AS k FROM sql_x8").collect()[0]["k"]
    assert k == "xor"


def test_sql_qf_resize(spark, ctx):
    """Resize from SQL: grow keeps membership; shrink truncates exactly
    like a rebuild at the smaller width."""
    build_filter(ctx, ["grp"], "h", "quotient", q=16, r=4) \
        .createOrReplaceTempView("sql_qf")
    # grow (17, 3): membership identical for every member
    got = {
        r["grp"]: r["n"]
        for r in spark.sql(
            """
            SELECT k.grp, count(*) AS n
            FROM sql_keyed k JOIN sql_qf f ON f.grp = k.grp
            WHERE bf_contains(bf_qf_resize(f.filter, 17, NULL), k.h)
            GROUP BY k.grp
            """
        ).collect()
    }
    want = {
        r["grp"]: r["n"]
        for r in spark.sql(
            "SELECT grp, count(*) AS n FROM sql_keyed GROUP BY grp"
        ).collect()
    }
    assert got == want
    # geometry check via the kind sniffer + a shrink round-trip
    row = spark.sql(
        "SELECT bf_filter_kind(bf_qf_resize(filter, 17, 2)) AS kind, "
        "octet_length(bf_qf_resize(filter, 17, 2)) <= octet_length(filter) AS smaller "
        "FROM sql_qf LIMIT 1"
    ).collect()[0]
    assert row["kind"] == "quotient" and row["smaller"]


def test_sql_bks_quantile(spark, ctx):
    """Bottom-k sample sketch probed from SQL: under-capacity, quantiles
    are exact group quantiles."""
    from bitfilters_spark.functions.sample import bottomk_sample

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    keyed = orders.select(
        (F.col("o_orderkey") % 2).alias("grp"),
        spark_hash64("o_orderkey").alias("h"),
        F.col("o_custkey").alias("v"),
    )
    bottomk_sample(keyed, ["grp"], "h", "v", k=1_000_000).createOrReplaceTempView(
        "sql_bks"
    )
    got = {
        r["grp"]: (r["m"], r["p50"])
        for r in spark.sql(
            "SELECT grp, bf_bks_size(sample) AS m, "
            "bf_bks_quantile(sample, 0.5d) AS p50 FROM sql_bks"
        ).collect()
    }
    import math

    pdf = keyed.toPandas()
    for g, sub in pdf.groupby("grp"):
        vs = sorted(sub["v"])
        assert got[g][0] == len(vs)
        assert got[g][1] == vs[max(1, math.ceil(0.5 * len(vs))) - 1]


def test_sql_cms_join_size(spark, ctx):
    """Join-size planning from SQL: estimate |orders ⋈ customer| on
    custkey from two sketches; collision-free geometry => exact."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    a = build_filter(
        orders.select(spark_hash64("o_custkey").alias("h")),
        [], "h", "cms", d=4, w=1 << 16,
    ).select(F.col("filter").alias("fa"))
    b = build_filter(
        customer.select(spark_hash64("c_custkey").alias("h")),
        [], "h", "cms", d=4, w=1 << 16,
    ).select(F.col("filter").alias("fb"))
    a.crossJoin(b).createOrReplaceTempView("sql_cms_join")
    got = spark.sql(
        "SELECT bf_cms_join_size(fa, fb) AS est FROM sql_cms_join"
    ).collect()[0]["est"]
    exact = orders.join(
        customer, orders["o_custkey"] == customer["c_custkey"]
    ).count()
    assert got == exact


def test_bf_build_sql_workflow_matches_reference(spark, ctx):
    """The reference's whole SQL workflow (test/sql/bitfilters.test:37-50)
    through bf_build + bf_contains: build per-group quotient filters from
    SQL strings, probe cross-group in SQL, count false positives — all
    members hit (no false negatives), cross-group FP counts equal a
    direct DataFrame probe of the same blobs."""
    from bitfilters_spark.sql import bf_build

    spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView(
        "bfb_orders"
    )
    out = bf_build(
        spark,
        "bfb_orders",
        ["o_orderkey % 2 AS remainder"],
        "quotient",
        "xxhash64(o_orderkey)",
        view="bfb_filters",
        q=16,
        r=4,
    )
    assert set(out.columns) == {"remainder", "filter"}
    # members: every key hits its own group's filter
    hits = spark.sql(
        """
        SELECT f.remainder, count(*) AS n,
               count(CASE WHEN bf_contains(f.filter, xxhash64(o.o_orderkey))
                     THEN 1 END) AS n_hit
        FROM bfb_orders o JOIN bfb_filters f
          ON o.o_orderkey % 2 = f.remainder
        GROUP BY f.remainder
        """
    ).collect()
    assert len(hits) == 2
    for r in hits:
        assert r["n"] == r["n_hit"] and r["n"] > 0
    # cross-group probes: deterministic FP count equals the DataFrame path
    sql_fp = {
        r["remainder"]: r["fp"]
        for r in spark.sql(
            """
            SELECT f.remainder,
                   count(CASE WHEN bf_contains(f.filter, xxhash64(o.o_orderkey))
                         THEN 1 END) AS fp
            FROM bfb_orders o JOIN bfb_filters f
              ON o.o_orderkey % 2 != f.remainder
            GROUP BY f.remainder
            """
        ).collect()
    }
    from bitfilters_spark.functions.filters import filter_contains

    blobs = {r["remainder"]: bytes(r["filter"]) for r in out.collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    for rem, blob in blobs.items():
        df_fp = (
            orders.where(F.col("o_orderkey") % 2 != rem)
            .select(
                filter_contains(
                    F.lit(blob), F.xxhash64(F.col("o_orderkey"))
                ).alias("hit")
            )
            .where("hit")
            .count()
        )
        assert sql_fp[rem] == df_fp


def test_bf_build_accepts_select_source_and_global_group(spark, ctx):
    """A SELECT-statement source and empty group_exprs (one global
    filter), straight into a SQL probe — and sketch kinds work too."""
    from bitfilters_spark.sql import bf_build

    spark.read.parquet(f"{SF}/customer.parquet").createOrReplaceTempView(
        "bfb_cust"
    )
    bf_build(
        spark,
        "SELECT * FROM bfb_cust WHERE c_custkey <= 100",
        [],
        "kmv",
        "xxhash64(c_custkey)",
        view="bfb_kmv",
        k=256,
    )
    est = spark.sql(
        "SELECT bf_kmv_distinct(filter) AS d FROM bfb_kmv"
    ).collect()[0]["d"]
    exact = spark.sql(
        "SELECT count(DISTINCT c_custkey) AS d FROM bfb_cust WHERE c_custkey <= 100"
    ).collect()[0]["d"]
    assert est == exact  # under capacity -> exact
