"""JSONL/CSV corpus sources under the strict+quarantine contract
(sources/textfiles.py): clean rows come back typed, corrupt lines come
back verbatim, and nothing is ever silently dropped."""

from __future__ import annotations

import pytest

from etl_pack_spark.sources.textfiles import read_csv, read_jsonl


def test_jsonl_clean_and_corrupt_split(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta"}\n'
        '{"doc_id": 2, "text": "gamma"}\n'
        'this is not json at all\n'
        '{"doc_id": "not-a-number", "text": "bad type"}\n'
        '{"doc_id": 5, "text": "delta"}\n'
    )
    clean, corrupt = read_jsonl(spark, str(p), "doc_id long, text string")
    rows = sorted(map(tuple, clean.collect()))
    assert rows == [(1, "alpha beta"), (2, "gamma"), (5, "delta")]
    assert [f.dataType.simpleString() for f in clean.schema.fields] == [
        "bigint", "string",
    ]
    bad = sorted(r["raw_line"] for r in corrupt.collect())
    # conservation: every input line is in exactly one side
    assert len(rows) + len(bad) == 5
    assert any("not json" in b for b in bad)
    assert any("not-a-number" in b for b in bad)


def test_jsonl_all_clean_and_all_corrupt_edges(spark, tmp_path):
    good = tmp_path / "good.jsonl"
    good.write_text('{"doc_id": 1, "text": "x"}\n')
    clean, corrupt = read_jsonl(spark, str(good), "doc_id long, text string")
    assert clean.count() == 1 and corrupt.count() == 0
    bad = tmp_path / "bad.jsonl"
    bad.write_text("garbage\nmore garbage\n")
    clean, corrupt = read_jsonl(spark, str(bad), "doc_id long, text string")
    assert clean.count() == 0 and corrupt.count() == 2


def test_jsonl_schema_must_not_claim_corrupt_col(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text("{}\n")
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_jsonl(spark, str(p), "_corrupt_record string")


def test_csv_clean_and_corrupt_split(spark, tmp_path):
    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text\n"
        "1,alpha\n"
        "2,beta\n"
        "not-a-number,gamma\n"
        '3,"unterminated quote\n'
        "4,delta\n"
    )
    clean, corrupt = read_csv(spark, str(p), "doc_id long, text string")
    rows = sorted(map(tuple, clean.collect()))
    assert (1, "alpha") in rows and (2, "beta") in rows
    assert all(isinstance(r[0], int) for r in rows)
    bad = [r["raw_line"] for r in corrupt.collect()]
    assert any("not-a-number" in b for b in bad)


def test_clean_side_feeds_operators(spark, tmp_path):
    """The clean frame is a normal typed DataFrame: the text operators
    compose with it directly — ingest-to-curation with no staging."""
    from etl_pack_spark.operators.textops import text_signals

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta gamma"}\n'
        "broken line\n"
        '{"doc_id": 2, "text": "delta epsilon"}\n'
    )
    clean, corrupt = read_jsonl(spark, str(p), "doc_id long, text string")
    sig = text_signals(clean, "doc_id", "text")
    assert sig.count() == 2 and corrupt.count() == 1


def test_release_unpins_the_shared_parse(spark, tmp_path):
    """r9 ADVICE introduced release(); r10 ADVICE: the r9 version
    keyed off an attribute monkey-patched onto the returned frames, so
    release() on a DERIVED frame (clean.select(...)) was a silent
    no-op and the parse leaked. Now the read returns a
    QuarantinedRead handle carrying (clean, corrupt, release); the
    module-level release() takes the handle and RAISES on anything
    else — no silent path remains."""
    from etl_pack_spark.sources import textfiles

    p = tmp_path / "docs.jsonl"
    p.write_text('{"doc_id": 1, "text": "ok"}\nnot json\n')
    handle = textfiles.read_jsonl(spark, str(p), "doc_id long, text string")
    clean, corrupt = handle  # tuple-unpack compatibility
    assert clean is handle.clean and corrupt is handle.corrupt
    assert clean.count() == 1 and corrupt.count() == 1
    parse = handle._parsed
    assert parse.storageLevel.useMemory  # pinned
    textfiles.release(handle)
    assert handle.released
    assert not parse.storageLevel.useMemory  # released
    # the cache is LOAD-BEARING (SPARK-21610): actions after release
    # fail loudly instead of silently re-reading
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    with _pytest.raises(AnalysisException):
        clean.count()
    textfiles.release(handle)  # idempotent
    # r10 ADVICE: a frame (derived or foreign) is NOT a valid release
    # target — raising here is the fix for the silent-no-op leak
    with _pytest.raises(TypeError, match="QuarantinedRead"):
        textfiles.release(clean.select("doc_id"))
    with _pytest.raises(TypeError, match="QuarantinedRead"):
        textfiles.release(spark.range(1))


def test_quarantined_read_context_manager(spark, tmp_path):
    """The handle is a context manager: the pinned parse is released
    on exit even when the body raises."""
    from etl_pack_spark.sources import textfiles

    p = tmp_path / "docs.csv"
    p.write_text("doc_id,text\n1,alpha\nbad-row-here\n")
    with textfiles.read_csv(spark, str(p), "doc_id long, text string") as (
        clean, corrupt,
    ):
        assert clean.count() == 1 and corrupt.count() == 1
    # released on exit
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import AnalysisException

    with _pytest.raises(AnalysisException):
        clean.count()
