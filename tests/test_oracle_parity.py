"""SQL-transcription parity: the DuckDB expressions used as oracles
(duckdb_soundex_sql, duckdb_jw_sql) must reproduce the Python/Spark kernels
exactly on adversarial random strings — otherwise the driver's oracle gate
would be testing the wrong semantics."""

from __future__ import annotations

import random
import string

import duckdb
import pytest

from capelinker_spark.entry_queries import duckdb_jw_sql, duckdb_soundex_sql
from capelinker_spark.functions.strdist import jaro_winkler_dist, soundex


def _samples(n=300, seed=99):
    rnd = random.Random(seed)
    alphabet = string.ascii_uppercase + string.ascii_lowercase + " .-'0123456789"
    out = []
    for _ in range(n):
        k = rnd.randint(0, 14)
        out.append("".join(rnd.choice(alphabet) for _ in range(k)))
    out += ["", "A", "WH", "HW", "VAN NIEKERK", "1abc", " x", "Ashcraft",
            "Tymczak", "Pfister", "o'brien", "X Y Z"]
    return out


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE TABLE t(s VARCHAR, u VARCHAR)")
    vals = _samples()
    c.executemany(
        "INSERT INTO t VALUES (?, ?)", list(zip(vals, list(reversed(vals))))
    )
    return c


def test_soundex_sql_parity(con):
    rows = con.sql(f"SELECT s, {duckdb_soundex_sql('s')} AS x FROM t").fetchall()
    for s, got in rows:
        assert got == soundex(s), repr(s)


def test_jw_sql_parity(con):
    for p in (0.0, 0.1):
        rows = con.sql(
            f"SELECT s, u, {duckdb_jw_sql('s', 'u', p)} AS d FROM t "
            "WHERE length(s) > 0 AND length(u) > 0"
        ).fetchall()
        for s, u, got in rows:
            exp = jaro_winkler_dist(s, u, p=p)
            assert got == pytest.approx(exp, abs=1e-9), (s, u, p)


def test_jw_sql_null_and_equal(con):
    row = con.sql(
        f"SELECT {duckdb_jw_sql('NULL', chr(39) + 'abc' + chr(39))}, "
        f"{duckdb_jw_sql(chr(39) + 'abc' + chr(39), chr(39) + 'abc' + chr(39))}"
    ).fetchone()
    assert row[0] is None
    assert row[1] == 0.0


def test_float_queries_order_independent(spark):
    """The exactness design (integer accumulation + a single IEEE
    expression) must make float outputs independent of physical execution:
    rerun the cosine/uniqueness queries at a different shuffle-partition
    count and compare BIT-identical values (struct.pack, not approx)."""
    import struct

    from capelinker_spark.entry_queries import QUERIES

    sf_dir = "/root/testdata/sf0.001"

    def snapshot(name):
        df = QUERIES[name](spark, sf_dir)
        cols = sorted(df.columns)
        rows = []
        for r in df.select(*cols).collect():
            rows.append(
                tuple(
                    struct.pack("<d", v).hex() if isinstance(v, float) else v
                    for v in r
                )
            )
        return sorted(rows)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # dm2 is the sharpest case: its distributed prefix sum PARTITIONS
        # differently at each shuffle-partition count, yet the global
        # order — and therefore every offset — must not move
        for name in ("f9_cos_uniqueness", "j3b_bigram_cosine_join",
                     "f8_jw_uniqueness", "m1_logistic_score",
                     "dm2_sequence_packing", "ts6_line_repetition"):
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = snapshot(name)
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            b = snapshot(name)
            assert a == b, name
            assert len(a) > 0, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
