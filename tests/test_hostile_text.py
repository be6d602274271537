"""Hostile-text robustness: every catalog entry must RUN against a
documents table full of adversarial strings — emoji, CJK, RTL,
combining marks, zero-width joiners, embedded newlines/tabs, very long
unbroken tokens, empty and whitespace-only texts, nulls. The synthetic
fixtures are ASCII, so without this sweep a tokenizer/regex/byte-length
assumption could survive every green test and die on the first real
crawl shard. Crash-freedom only (no oracle parity: Java-regex and RE2
legitimately disagree on some Unicode character classes — the contract
here is that the ENGINE side never throws and returns a well-typed
frame)."""

from __future__ import annotations

import duckdb
import pytest

from taxi_aws_data_pipeline_spark.plans import CATALOG

from .oracle_utils import TABLE_NAMES

_HOSTILE_TEXTS = [
    "😀🚀💥 emoji only row 🎉🎊",
    "中文文本没有空格也没有标点符号连续很长的一段话用来测试分词",
    "مرحبا بالعالم نص من اليمين إلى اليسار",
    "é combining acute plus zero​width‌joiners‍ here",
    "line one\nline two\r\nline three\ttabbed",
    "x" * 5000,  # one unbroken 5k token
    "",
    "   \t  \n  ",
    'quotes "double" \'single\' and , commas ; semicolons',
    "mixed 😀 ascii 中文 عرب é ok?",
    None,
]


@pytest.fixture(scope="module")
def hostile_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hostile_sf")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM '/root/testdata/sf0.001/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    rows = ", ".join(
        f"({i + 1}, "
        + ("NULL" if txt is None else "'" + txt.replace("'", "''") + "'")
        + f", 'en', 'hostile', {0 if txt is None else len(txt)})"
        for i, txt in enumerate(_HOSTILE_TEXTS)
    )
    con.execute(
        f"""COPY (SELECT * FROM (VALUES {rows})
            t(doc_id, text, lang, source, n_chars))
            TO '{d}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.close()
    return str(d)


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_entry_survives_hostile_documents(spark, hostile_sf_dir, name):
    df = CATALOG[name].spark(spark, hostile_sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
