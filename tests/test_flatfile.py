"""Flat-file dialect tests pinned to the reference's own test vectors
(FIXTURES.md §C; /root/reference/src/flatfile.rs:648-772)."""

from __future__ import annotations

import os
import zipfile

import pytest

from nem_mms_spark.sources.flatfile import (
    classify_lines,
    comment_records,
    flatfiles_to_parquet,
    parse_flatfiles,
    read_flatfile_lines,
    segment_info,
)

EMMS = "C,NEMP.WORLD,BIDMOVE_SUMMARY,AEMO,PUBLIC,2021/04/01,04:43:39,339145123,BIDMOVE_SUMMARY,339145118"
EOR = "C,END OF REPORT,45917"

SCADA_FILE = "\n".join(
    [
        EMMS,
        "I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID,SCADAVALUE",
        'D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:40:00,UNIT01,123.45',
        'D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:45:00,UNIT01,',
        'D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:45:00,UNIT02,0.5',
        "C,END OF REPORT,6",
    ]
)

# headers reordered + an extra column the schema drops + unknown package
MIXED_FILE = "\n".join(
    [
        EMMS,
        "I,DISPATCH,UNIT_SCADA,1,DUID,EXTRA_COL,SCADAVALUE,SETTLEMENTDATE",
        'D,DISPATCH,UNIT_SCADA,1,UNIT09,junk,9.25,2021/04/01 04:40:00',
        "I,BID,BIDDAYOFFER_D,2,SETTLEMENTDATE,DUID,BIDTYPE",
        "D,BID,BIDDAYOFFER_D,2,2021/03/31 00:00,DUID1,ENERGY",
        "I,DISPATCH,LOCAL_PRICE,1,SETTLEMENTDATE,DUID,LOCAL_PRICE_ADJUSTMENT,LOCALLY_CONSTRAINED",
        "D,DISPATCH,LOCAL_PRICE,1,2021/04/01 04:40:00,UNIT01,1.5,1",
        "D,DISPATCH,LOCAL_PRICE,1,2021/04/01 04:40:00,UNIT02,,0",
        "C,END OF REPORT,9",
    ]
)


@pytest.fixture()
def scada_path(tmp_path):
    p = tmp_path / "scada.csv"
    p.write_text(SCADA_FILE)
    return str(p)


def test_classify_and_comments(spark, scada_path):
    lines = read_flatfile_lines(spark, scada_path)
    assert lines.count() == 6
    classified = classify_lines(lines)
    kinds = {r["rtype"] for r in classified.collect()}
    assert kinds == {"C", "I", "D"}
    com = comment_records(classified).collect()
    eor = [r for r in com if r["kind"] == "EOR"][0]
    assert eor["count_of_records"] == 6
    hdr = [r for r in com if r["kind"] == "EMMS"][0]
    assert hdr["system"] == "NEMP.WORLD"
    assert str(hdr["publish_dt"]) == "2021-04-01 04:43:39"
    # full EMMS surface (reference vector, flatfile.rs:649-667)
    assert hdr["report_id"] == "BIDMOVE_SUMMARY"
    assert hdr["from_participant"] == "AEMO"
    assert hdr["to_participant"] == "PUBLIC"
    assert hdr["payload_info"] == ["339145123", "BIDMOVE_SUMMARY", "339145118"]


def test_but_comment_record(spark, tmp_path):
    # reference vector, flatfile.rs:670-690
    f = "\n".join(
        [
            "C,PRODUCTION,BLIND_UPDATE_SUBMISSION,PARTICIPANTID,NEMMCO,"
            "2021/09/03,22:04:05,,,,NEM,123ABC-002,324-BB321",
            "C,END OF REPORT,2",
        ]
    )
    p = tmp_path / "but.csv"
    p.write_text(f)
    com = comment_records(classify_lines(read_flatfile_lines(spark, str(p)))).collect()
    but = [r for r in com if r["kind"] == "BUT"][0]
    assert but["system"] == "PRODUCTION"
    assert but["report_id"] == "BLIND_UPDATE_SUBMISSION"
    assert but["from_participant"] == "PARTICIPANTID"
    assert but["to_participant"] == "NEMMCO"
    assert str(but["publish_dt"]) == "2021-09-03 22:04:05"
    assert but["market"] == "NEM"
    assert but["payload_id"] == "123ABC-002"
    assert but["payload_response_id"] == "324-BB321"
    assert but["payload_info"] is None


def test_quoted_fields_rfc4180(spark, tmp_path):
    # embedded comma and doubled-quote escape inside quoted fields must
    # parse like the reference's csv crate (main.rs:161-165)
    f = "\n".join(
        [
            "I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID,SCADAVALUE",
            'D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:40:00,"UNIT,01",1.5',
            'D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:45:00,"say ""hi""",2.5',
        ]
    )
    p = tmp_path / "quoted.csv"
    p.write_text(f)
    rows = {
        r["DUID"]: r["SCADAVALUE"]
        for r in parse_flatfiles(spark, str(p))["DISPATCH_UNIT_SCADA"].collect()
    }
    assert rows == {"UNIT,01": 1.5, 'say "hi"': 2.5}


def test_quoted_embedded_newline(spark, tmp_path):
    # a quoted field containing a newline is ONE record (the reference's
    # csv crate accepts this, main.rs:161-165); the EOR trailer counts it
    # as one record too
    f = "\n".join(
        [
            "I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID,SCADAVALUE",
            'D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:40:00,"UNIT\nA",1.5',
            "C,END OF REPORT,3",
        ]
    )
    p = tmp_path / "nl.csv"
    p.write_text(f)
    lines = read_flatfile_lines(spark, str(p))
    assert lines.count() == 3  # the two physical lines merged into one record
    rows = parse_flatfiles(spark, str(p))["DISPATCH_UNIT_SCADA"].collect()
    assert len(rows) == 1
    assert rows[0]["DUID"] == "UNIT\nA"
    assert rows[0]["SCADAVALUE"] == 1.5


def test_stray_quote_stays_localized():
    """A single malformed line with an unpaired quote must not swallow
    the rest of the file into one record: continuation is bounded (by
    buffered BYTES), and past the bound the buffered lines are emitted
    individually — with the trip counted for observability."""
    from nem_mms_spark.sources.flatfile import _split_records

    good = [f"D,T,S,1,row{i},1.0" for i in range(200)]
    text = "\n".join(['D,T,S,1,"broken,1.0'] + good)
    trips_before = _split_records.bound_trips
    recs = list(_split_records(text, max_continued_bytes=1024))
    assert _split_records.bound_trips == trips_before + 1
    # every good line must come back as its own record
    for line in good:
        assert line in recs
    # and the broken opener surfaces as a record of its own
    assert any(r.startswith('D,T,S,1,"broken') for r in recs)


def test_long_legitimate_multiline_record_not_split():
    """RFC-4180 permits arbitrarily many embedded newlines: a legitimate
    quoted field spanning hundreds of physical lines must come back as
    ONE record (the old 64-LINE bound force-split it; the bound is now
    on buffered bytes)."""
    from nem_mms_spark.sources.flatfile import _split_records

    body = "\n".join(f"line{i}" for i in range(500))
    text = f'D,T,S,1,"{body}",1.0\nplain,1'
    recs = list(_split_records(text))
    assert recs == [f'D,T,S,1,"{body}",1.0', "plain,1"]


def test_balanced_multiline_record_still_merges():
    from nem_mms_spark.sources.flatfile import _split_records

    text = 'a,"x\ny",b\nplain,1'
    assert list(_split_records(text)) == ['a,"x\ny",b', "plain,1"]


def test_eor_count_mismatch_is_fatal(spark, tmp_path):
    f = "\n".join(
        [
            "I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID,SCADAVALUE",
            "D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:40:00,UNIT01,1.0",
            "C,END OF REPORT,7",  # file actually has 3 records
        ]
    )
    p = tmp_path / "badcount.csv"
    p.write_text(f)
    with pytest.raises(ValueError, match="EOR count mismatch"):
        parse_flatfiles(spark, str(p))


def test_parse_scada_types_and_nulls(spark, scada_path):
    out = parse_flatfiles(spark, scada_path)
    assert set(out) == {"DISPATCH_UNIT_SCADA"}
    df = out["DISPATCH_UNIT_SCADA"]
    assert [f.name for f in df.schema.fields] == [
        "DUID", "SETTLEMENTDATE", "SCADAVALUE",
    ]
    rows = sorted(df.collect(), key=lambda r: (str(r[1]), r[0]))
    assert rows[0]["DUID"] == "UNIT01"
    assert rows[0]["SCADAVALUE"] == 123.45
    assert rows[1]["SCADAVALUE"] is None  # empty cell -> NULL
    assert str(rows[0]["SETTLEMENTDATE"]) == "2021-04-01 04:40:00"


def test_projection_by_name_and_unknown_package(spark, tmp_path, capsys):
    p = tmp_path / "mixed.csv"
    p.write_text(MIXED_FILE)
    out = parse_flatfiles(spark, str(p))
    # unknown (BID, BIDDAYOFFER_D) skipped with warning, not fatal
    assert set(out) == {"DISPATCH_UNIT_SCADA", "DISPATCH_LOCAL_PRICE"}
    assert "unrecognized package" in capsys.readouterr().out

    scada = out["DISPATCH_UNIT_SCADA"].collect()
    assert len(scada) == 1
    # bound by NAME despite reordered headers; EXTRA_COL dropped
    assert scada[0]["DUID"] == "UNIT09"
    assert scada[0]["SCADAVALUE"] == 9.25

    lp = {r["DUID"]: r for r in out["DISPATCH_LOCAL_PRICE"].collect()}
    assert lp["UNIT01"]["LOCALLY_CONSTRAINED"] == 1  # Int8
    assert lp["UNIT02"]["LOCAL_PRICE_ADJUSTMENT"] is None


def test_nested_zip_and_routing(spark, tmp_path):
    inner = tmp_path / "inner.zip"
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("scada.csv", SCADA_FILE)
    outer = tmp_path / "outer.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.writestr("nested/inner.zip", inner.read_bytes())
        zf.writestr("direct.csv", MIXED_FILE)
        zf.writestr("ignored.txt", "not,a,flatfile")
    os.remove(inner)

    dest = str(tmp_path / "out")
    written = flatfiles_to_parquet(spark, str(outer), dest)
    assert set(written) == {"DISPATCH_UNIT_SCADA", "DISPATCH_LOCAL_PRICE"}
    scada = spark.read.parquet(written["DISPATCH_UNIT_SCADA"])
    assert scada.count() == 4  # 3 from nested zip + 1 from direct.csv


def test_null_in_non_nullable_is_fatal(spark, tmp_path):
    bad = "\n".join(
        [
            "I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID,SCADAVALUE",
            "D,DISPATCH,UNIT_SCADA,1,,UNIT01,1.0",  # empty SETTLEMENTDATE
        ]
    )
    p = tmp_path / "bad.csv"
    p.write_text(bad)
    with pytest.raises(ValueError, match="non-null"):
        parse_flatfiles(spark, str(p))


def test_missing_header_is_fatal(spark, tmp_path):
    bad = "\n".join(
        [
            "I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID",  # no SCADAVALUE
            "D,DISPATCH,UNIT_SCADA,1,2021/04/01 04:40:00,UNIT01",
        ]
    )
    p = tmp_path / "bad2.csv"
    p.write_text(bad)
    with pytest.raises(ValueError, match="missing column headers"):
        parse_flatfiles(spark, str(p))


def test_unrecognized_record_type_is_fatal(spark, tmp_path):
    p = tmp_path / "bad3.csv"
    p.write_text("X,whatever,1")
    with pytest.raises(ValueError, match="unrecognized payload") as ei:
        parse_flatfiles(spark, str(p))
    # caret rendering under the offending field (error.rs:119-144 parity)
    assert "\n\tX,whatever,1\n\t^" in str(ei.value)
    assert 'Expected one of ["C", "I", "D"]' in str(ei.value)


def test_info_schemas_pretty_print(capsys):
    from nem_mms_spark.cli import main

    assert main(["info", "--schemas"]) == 0
    out = capsys.readouterr().out
    assert "Package name: DISPATCHPRICE" in out
    assert "SETTLEMENTDATE" in out and "timestamp_ntz" in out
    assert "✓ Parse" in out and "✗ Fetch Current" in out


def test_datetime_minute_format_ladder(spark, tmp_path):
    # reference data-record vector uses '%Y/%m/%d %H:%M' (flatfile.rs:752)
    f = "\n".join(
        [
            "I,DISPATCH,UNIT_SCADA,1,SETTLEMENTDATE,DUID,SCADAVALUE",
            "D,DISPATCH,UNIT_SCADA,1,2021/03/31 00:00,DUID1,241",
        ]
    )
    p = tmp_path / "fmt.csv"
    p.write_text(f)
    out = parse_flatfiles(spark, str(p))
    row = out["DISPATCH_UNIT_SCADA"].collect()[0]
    assert str(row["SETTLEMENTDATE"]) == "2021-03-31 00:00:00"
    assert row["SCADAVALUE"] == 241.0
