"""Driver-contract smoke + oracle equivalence at sf0.001 (fast tier).

Mirrors exactly what the per-round verify does: run queries() against
oracle_sql() through DuckDB on the same parquet views, compare sorted values.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return (
        pdf.sort_values(list(pdf.columns), kind="stable")
        .reset_index(drop=True)
        .astype(str)
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"doc_id", "kind", "text", "media_ref", "offset"}


def test_queries_have_oracles_or_are_documented():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)
    # since round 3 EVERY query is oracle-visible: the extraction family via
    # fixture_oracle.py literal VALUES tables, and the media decode via the
    # byte-chunk-mean DuckDB mirror (multimodal.ORACLE_MEDIA_FEATURES)
    assert set(qs) == set(os_)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_query_matches_oracle(spark, con, name):
    got = _canon(entrymod.queries()[name](spark, SF).toPandas())
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    assert got.columns.tolist() == want.columns.tolist(), name
    assert got.equals(want), f"{name}: value mismatch"


def test_media_decode_feature_values_exact(spark):
    """Independent reconstruction of the synthetic payloads in pure Python —
    build the exact byte strings from (doc_id, text) for ALL THREE
    containers (P6 stills, C444 Y4M video, RIFF/WAVE PCM audio), decode
    with a from-first-principles reference (no shared code path beyond
    numpy), and pin the raw float64 features (a stronger check than the
    ×4096 floor)."""
    import hashlib

    import numpy as np

    from grobid_clinical_report_spark import multimodal

    feats = (
        multimodal.extract_media_features(multimodal.media_table(spark, SF))
        .select("doc_id", "feature")
        .toPandas()
        .set_index("doc_id")
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).toPandas()
    for _, row in docs.head(50).iterrows():
        did = int(row["doc_id"])
        w, h = 8 + did % 24, 8 + (did * 7) % 24
        n3 = w * h * 3
        hx = hashlib.md5(row["text"].encode()).hexdigest()
        pix = (hx * (n3 // 32 + 2))[:n3].encode("ascii")
        a = np.frombuffer(pix, dtype=np.uint8)
        d0, d1, units = float(w), float(h), float(w * h)
        if did % 4 == 3:
            nf = 8 + (did * 3) % 25
            raw = (
                f"YUV4MPEG2 W{w} H{h} F4:1 Ip A1:1 C444\n".encode()
                + (b"FRAME\n" + pix) * nf
            )
            # cross-check the table's payload really is this byte string
            info = multimodal.probe_y4m(raw)
            assert (info.width, info.height, info.n_frames) == (w, h, nf)
            # planar: channel p covers bytes [p·w·h, (p+1)·w·h)
            s = a.reshape(3, -1).sum(axis=1, dtype=np.int64)
        elif did % 4 == 2:
            import struct

            ch = 1 + (did // 4) % 2
            fmt = struct.pack("<HHIIHH", 1, ch, 500, 500 * ch, ch, 8)
            raw = (
                b"RIFF" + struct.pack("<I", 36 + n3) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", n3) + pix
            )
            ai = multimodal.probe_wav(raw)
            assert (ai.channels, ai.sample_rate, ai.data_size) == (
                ch, 500, n3,
            )
            s = a.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            d0, d1, units = float(ch), 500.0, float(n3 // ch)
        else:
            raw = f"P6\n{w} {h}\n255\n".encode() + pix
            dw, dh, mx, plane = multimodal.decode_ppm(raw)
            assert (dw, dh, mx) == (w, h, 255)
            s = a.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        want = [
            d0, d1, 255.0,
            3 * s[0] / n3, 3 * s[1] / n3, 3 * s[2] / n3,
            s.sum() / n3, units,
        ]
        got = list(feats.loc[str(did)]["feature"])
        assert got == want, did


def test_verification_window_policy():
    """The sharded driver-verification window (ADVICE r5): deterministic
    per-round rotation, churned queries pinned inside the first-50 window,
    every query eventually rotates back in."""
    names = list(entrymod._canonical())
    # deterministic and consistent with queries() ordering
    out = entrymod.rotated_out()
    assert entrymod.rotated_out() == out
    assert list(entrymod.queries())[-len(out):] == out
    # pinned queries (code churned this round, or rotated out last round —
    # nothing misses two consecutive windows) never rotate out, any round
    pinned = (
        entrymod._CHURNED_THIS_ROUND | entrymod._ROTATED_OUT_LAST_ROUND
    )
    for r in range(1, 20):
        assert not set(entrymod.rotated_out(r)) & pinned
    # over enough rounds, every UNPINNED query takes its turn outside the
    # window (no query can be parked outside forever either: the excluded
    # set changes every round)
    unpinned = set(names) - pinned
    cover = set()
    for r in range(1, 40):
        got = entrymod.rotated_out(r)
        assert len(got) == len(names) - entrymod._DRIVER_CAP
        cover |= set(got)
    assert cover == unpinned


def test_verification_window_infeasible_pins_raise(monkeypatch):
    """ADVICE r6: the rotation walk is bounded — over-pinning must raise a
    clear error instead of spinning forever."""
    import pytest

    monkeypatch.setattr(
        entrymod,
        "_CHURNED_THIS_ROUND",
        frozenset(entrymod._canonical()),
    )
    with pytest.raises(RuntimeError, match="rotation infeasible"):
        entrymod.rotated_out(3)


def test_current_round_reads_committed_file():
    """ADVICE r6: the round number comes from the tracked ROUND file, so
    the rotation is a pure function of the committed tree."""
    import os

    here = os.path.dirname(os.path.abspath(entrymod.__file__))
    with open(os.path.join(here, "ROUND")) as f:
        assert entrymod._current_round() == int(f.read().strip())
