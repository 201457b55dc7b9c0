"""engine.sql surface: catalog registration + ad-hoc SQL over the views."""

from __future__ import annotations

import pagerank_giraph_vs_mapreduce_spark as engine


def test_catalog_sql_roundtrip(spark, sf_dir):
    engine.open_catalog(spark, sf_dir)
    row = engine.sql(
        spark,
        """SELECT count(*) AS n_orders,
                  (SELECT count(DISTINCT src) FROM edges) AS n_src
           FROM orders""",
    ).first()
    assert row["n_orders"] > 0
    assert row["n_src"] > 0


def test_catalog_join_view_and_kernel_agree(spark, sf_dir):
    engine.open_catalog(spark, sf_dir)
    n_sql = engine.sql(
        spark,
        "SELECT count(*) AS n FROM (SELECT src AS id FROM edges UNION SELECT dst FROM edges)",
    ).first()["n"]
    res = engine.pagerank(
        engine.sql(spark, "SELECT src, dst FROM edges"), max_iter=1, tol=-1.0, min_iter=0
    )
    assert res.n_vertices == n_sql
