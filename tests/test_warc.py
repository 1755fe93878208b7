"""WARC ingestion (operators/warc.py): the full Spark-vs-DuckDB parity its
future (round-12) gate will run, parser pins, the corrupt-stream fuzz
contract, and the empty guard."""

import duckdb
import pytest

from poc_juma_etl_spark.operators.warc import (
    WARC_ORACLE,
    encode_warc,
    parse_warc,
    q_multimodal_warc_ingest,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_warc_ingest_matches_duckdb_oracle(spark):
    got = [tuple(r) for r in q_multimodal_warc_ingest(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(WARC_ORACLE).fetchall()]
    assert got == want
    assert len(got) == 500


def test_parse_warc_record_structure():
    recs = parse_warc(encode_warc(5))
    assert recs[0]["warc_type"] == "warcinfo" and recs[0]["body"] is None
    responses = [r for r in recs if r["warc_type"] == "response"]
    assert len(responses) == 1 + 5 % 3
    assert responses[0]["body"] == "page 5-0 " * (3 + 5 % 5)


def test_parse_warc_corruption_fails_typed():
    """Byte flips in headers/lengths/separators and truncations at every
    boundary fail as ValueError — never a raw slice/decode error (the
    shared multimodal fuzz contract)."""
    base = encode_warc(9)
    # truncations at every prefix length on a coarse stride + boundaries
    for cut in list(range(1, len(base), 97)) + [len(base) - 1, len(base) - 4]:
        try:
            parse_warc(base[:cut])
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"truncation at {cut} raised {type(e).__name__}: {e}")
    # single-byte corruptions
    for pos in range(0, len(base), 53):
        mutated = bytearray(base)
        mutated[pos] ^= 0xFF
        try:
            recs = parse_warc(bytes(mutated))
            # a flip inside body text parses fine — that's what the hash
            # gate is for; structural flips must raise ValueError
            assert isinstance(recs, list)
        except ValueError:
            pass
        except Exception as e:  # noqa: BLE001
            pytest.fail(f"flip at {pos} raised {type(e).__name__}: {e}")


def test_warc_ingest_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(0).write.parquet(
        f"{empty}/documents.parquet"
    )
    assert q_multimodal_warc_ingest(spark, empty).collect() == []


def test_parse_warc_negative_content_length_fails_typed():
    """A crafted self-referential negative Content-Length must raise, not
    loop forever re-parsing the same offset (review repro)."""
    base = encode_warc(3)
    evil = base + b"WARC/1.0\r\nWARC-Type: junk\r\nContent-Length: -44\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(bytes(evil))


def test_parse_warc_bad_version_line_fails_typed():
    """The module contract is WARC/1.0: any other version string after
    the WARC/ prefix (WARC/0.9, WARC/garbage) must raise the typed
    ValueError, not be silently treated as a header (round-10 ADVICE)."""
    base = encode_warc(2)
    for bad in (b"WARC/0.9", b"WARC/1.1", b"WARC/garbage"):
        evil = bad + base[len(b"WARC/1.0") :]
        with pytest.raises(ValueError, match="version"):
            parse_warc(bytes(evil))


def test_warc_file_e2e_matches_duckdb_oracle(spark):
    """Real-file sibling: multi-record .warc shards written to disk, read
    back through binaryFile, every record attributed to its document —
    value parity on the same closed-form oracle family."""
    from poc_juma_etl_spark.operators.warc import (
        N_WARC_DOCS,
        WARC_FILE_ORACLE,
        etl_warc_file_ingest_e2e,
    )

    got = [tuple(r) for r in etl_warc_file_ingest_e2e(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(WARC_FILE_ORACLE).fetchall()]
    assert got == want
    assert len(got) == N_WARC_DOCS


def test_warc_multi_doc_concatenation_parses():
    """A concatenation of spec-valid per-doc archives is itself a
    spec-valid WARC: record counts and per-record attribution survive."""
    blob = encode_warc(3) + encode_warc(4) + encode_warc(5)
    recs = parse_warc(blob)
    assert len(recs) == sum(2 + d % 3 for d in (3, 4, 5))
    assert all("urn:uuid:" in r["record_id"] for r in recs)


def test_warc_file_e2e_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(0).write.parquet(
        f"{empty}/documents.parquet"
    )
    from poc_juma_etl_spark.operators.warc import etl_warc_file_ingest_e2e

    assert etl_warc_file_ingest_e2e(spark, empty).collect() == []
