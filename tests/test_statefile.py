"""R2 state-file codec round-trip + reference-format parsing (S4/C6)."""

from __future__ import annotations

from pagerank_giraph_vs_mapreduce_spark.sources.statefile import (
    read_state,
    write_state,
)


def test_parse_reference_format(spark, tmp_path):
    p = tmp_path / "state"
    p.mkdir()
    (p / "part-00000").write_text(
        "1\t0.2500000000|2,3\n"
        "2\t0.2500000000|\n"  # dangling: empty outlinks
        "3\t0.5000000000|1\n"
        "garbage line\n"
        "4\tnotanumber|1\n"
    )
    rows = {r["id"]: r for r in read_state(spark, str(p)).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["outlinks"] == [2, 3]
    assert rows[2]["outlinks"] == []
    assert rows[3]["pr"] == 0.5


def test_round_trip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 0.125, [2, 3]), (2, 0.875, [])],
        "id bigint, pr double, outlinks array<bigint>",
    )
    out = str(tmp_path / "rt")
    write_state(df, out)
    back = {r["id"]: r for r in read_state(spark, out).collect()}
    assert back[1]["pr"] == 0.125
    assert back[1]["outlinks"] == [2, 3]
    assert back[2]["outlinks"] == []
