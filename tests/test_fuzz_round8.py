"""Round-8 cross-engine fuzz: the three-engine agreement claims of the
new surfaces as properties, not just examples.

* text metrics (token_count/punct/stopword/quality) on arbitrary
  whitespace-riddled text: Spark == DuckDB oracle fragment — and never
  an ANSI ArithmeticException, whatever the input;
* Luhn validation on arbitrary digit strings: Spark == DuckDB mirror
  == python reference fold;
* MP3 frame streams with random bitrates/padding: index ==
  construction ground truth; split segments reassemble byte-exactly;
* MP4 sample tables with random sizes/deltas/sync sets: index ==
  ground truth; GOP segments tile the sample range.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pixeltable_spark.operators import text as textops
from pixeltable_spark.operators.pii import luhn_sql, luhn_valid

_SET = settings(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture])

# -- text metrics -------------------------------------------------------------

_texts = st.lists(
    st.one_of(
        st.sampled_from(["", " ", "\t", "\n", "the", "and,", "a.b!",
                         "word", "x;y:", "?!", "über", "naïve"]),
        st.text(alphabet=" \t\nabcdeTHE.,!?", max_size=12)),
    max_size=8).map(lambda parts: " ".join(parts))


class TestTextMetricsFuzz:
    @_SET
    @given(st.lists(_texts, min_size=1, max_size=12))
    def test_spark_matches_duckdb(self, spark, texts):
        import __spark_entry__ as em
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id int, text string")
        got = {r["doc_id"]: (r["n"], r["p"], r["s"], r["q"]) for r in
               df.select("doc_id",
                         textops.token_count(F.col("text")).alias("n"),
                         F.round(textops.punct_ratio(F.col("text")), 6).alias("p"),
                         F.round(textops.stopword_ratio(F.col("text")), 6).alias("s"),
                         textops.quality_score(F.col("text")).alias("q"),
                         ).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id INT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)",
                        list(enumerate(texts)))
        tok = em._TOKCOUNT
        stop = em._STOPPAT
        want = {r[0]: (r[1], r[2], r[3], r[4]) for r in con.execute(f"""
SELECT doc_id, {tok},
  round(CASE WHEN length(text) > 0 THEN
    CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
      / length(text) ELSE 0.0 END, 6),
  round(CASE WHEN ({tok}) > 0 THEN
    CAST(len(regexp_extract_all(lower(text), '{stop}')) AS DOUBLE)
      / ({tok}) ELSE 0.0 END, 6),
  round((CASE WHEN ({tok}) BETWEEN 20 AND 1000 THEN 0.5 ELSE 0.1 END)
    + least(round(CASE WHEN ({tok}) > 0 THEN
        CAST(len(regexp_extract_all(lower(text), '{stop}')) AS DOUBLE)
          / ({tok}) ELSE 0.0 END, 6) * 2.0, 0.3)
    - least(round(CASE WHEN length(text) > 0 THEN
        CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
          / length(text) ELSE 0.0 END, 6) * 2.0, 0.2), 6)
FROM documents""").fetchall()}
        for k in got:
            gn, gp, gs, gq = got[k]
            wn, wp, ws, wq = want[k]
            assert gn == wn, (texts[k], gn, wn)
            assert gp == pytest.approx(wp, abs=1e-9)
            assert gs == pytest.approx(ws, abs=1e-9)
            assert gq == pytest.approx(wq, abs=2e-6)  # rounding of
            # ratios happens inside q on the oracle side only


# -- Luhn ----------------------------------------------------------------------

class TestLuhnFuzz:
    @_SET
    @given(st.lists(st.from_regex(r"[0-9]{1,20}", fullmatch=True),
                    min_size=1, max_size=20))
    def test_three_engines_agree(self, spark, nums):
        def py_luhn(s):
            tot = 0
            for i, ch in enumerate(reversed(s), 1):
                d = int(ch)
                if i % 2 == 0:
                    d *= 2
                    if d > 9:
                        d -= 9
                tot += d
            return len(s) >= 13 and tot % 10 == 0

        df = spark.createDataFrame([(n,) for n in nums], "s string")
        got = {r["s"]: r["ok"] for r in
               df.select("s", luhn_valid(F.col("s")).alias("ok")).collect()}
        con = duckdb.connect()
        con.execute("CREATE TABLE t (s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(n,) for n in nums])
        duck = dict(con.execute(f"SELECT s, {luhn_sql('s')} FROM t").fetchall())
        for n in set(nums):
            assert got[n] == duck[n] == py_luhn(n), n


# -- MP3 frame streams ---------------------------------------------------------

_BITRATES = [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]


class TestMp3Fuzz:
    @_SET
    @given(st.lists(st.tuples(st.sampled_from(_BITRATES),
                              st.booleans()),
                    min_size=1, max_size=40))
    def test_index_and_split_ground_truth(self, frames_spec):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_mp3_frames import mk_frame

        from pixeltable_spark.functions import audio_codec as ac
        p = b"".join(mk_frame(b, padding=int(pad)) for b, pad in frames_spec)
        idx = ac.mp3_frame_index(p)
        assert len(idx) == len(frames_spec)
        assert [f["bitrate"] // 1000 for f in idx] == \
            [b for b, _ in frames_spec]
        assert sum(f["size"] for f in idx) == len(p)
        assert ac.mp3_duration(p) == pytest.approx(
            len(frames_spec) * 1152 / 44100, abs=1e-6)
        segs = ac.mp3_split(p, duration=0.08)
        assert b"".join(s for _, _, s in segs) == p


# -- MP4 sample tables ----------------------------------------------------------

class TestMp4Fuzz:
    @_SET
    @given(st.data())
    def test_index_ground_truth(self, data):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_mp4_sample_index import build_mp4

        from pixeltable_spark.functions import video_codec as vc
        n = data.draw(st.integers(min_value=1, max_value=30))
        sizes = data.draw(st.lists(st.integers(1, 200),
                                   min_size=n, max_size=n))
        # stts entries covering exactly n samples
        deltas, left = [], n
        while left > 0:
            c = data.draw(st.integers(1, left))
            deltas.append((c, data.draw(st.integers(1, 1000))))
            left -= c
        sync = sorted(data.draw(st.sets(st.integers(1, n), min_size=1,
                                        max_size=n)))
        p, offs = build_mp4(sizes, deltas, sync)
        idx = vc.mp4_sample_index(p)
        assert [s["size"] for s in idx] == sizes
        assert [s["offset"] for s in idx] == offs
        assert [s["keyframe"] for s in idx] == \
            [(i + 1) in set(sync) for i in range(n)]
        # dts is the running stts sum
        want_dts, t = [], 0
        for c, d in deltas:
            for _ in range(c):
                want_dts.append(t)
                t += d
        assert [s["dts"] for s in idx] == want_dts
        # GOP segments tile the samples and start on keyframes
        if 1 in sync:
            segs = vc.mp4_gop_segments(p, duration=0.01)
            assert sum(s[3] for s in segs) == n
            assert all(idx[s[2]]["keyframe"] for s in segs)


# -- plan-shape pins for the round-8 operators ---------------------------------

class TestPlanShapes:
    def _plan(self, df) -> str:
        return df._jdf.queryExecution().executedPlan().toString()

    def test_pii_audit_projection_map_only(self, spark):
        """q136's scoring surface (regex counts + the Luhn fold +
        scrubbing) is one map-only codegen projection — no Exchange, no
        Python in the plan."""
        from pixeltable_spark.operators.pii import (pii_count, scrub_pii,
                                                    valid_card_count)
        df = spark.createDataFrame(
            [(1, "card 4111111111111111 x@y.io")], "doc_id int, t string")
        q = df.select(
            pii_count(F.col("t"), "email").alias("e"),
            valid_card_count(F.col("t")).alias("l"),
            scrub_pii(F.col("t")).alias("s"))
        plan = self._plan(q)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_luhn_stays_jvm_side(self, spark):
        from pixeltable_spark.operators.pii import luhn_valid
        df = spark.createDataFrame([("4111111111111111",)], "s string")
        plan = self._plan(df.select(luhn_valid(F.col("s"))))
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_text_metric_guards_map_only(self, spark):
        """The ANSI guards added this round must not introduce a
        shuffle or a Python stage into the per-row metric projection."""
        from pixeltable_spark.operators import text as textops
        df = spark.createDataFrame([(1, "some text.")],
                                   "doc_id int, text string")
        q = df.select(
            textops.token_count(F.col("text")),
            textops.punct_ratio(F.col("text")),
            textops.stopword_ratio(F.col("text")),
            textops.quality_score(F.col("text")))
        plan = self._plan(q)
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan

    def test_dedup_by_url_single_shuffle_family(self, spark):
        """The NULL-safe rewrite (split + union) must stay one
        aggregation shuffle on the keyed branch, not add a distinct or
        an extra exchange per branch."""
        from pixeltable_spark.operators.urlops import dedup_by_url
        df = spark.createDataFrame([(1, "http://a/b")],
                                   "doc_id int, url string")
        plan = self._plan(dedup_by_url(df))
        # partial agg -> Exchange(key) -> final agg, then the join's
        # broadcast/exchange; the NULL branch adds NO exchange
        assert plan.count("Exchange") <= 3, plan


# -- container fuzz (Ogg pages / ADTS frames / MKV blocks / H.264 SPS) ---------

class TestContainerFuzz:
    @_SET
    @given(st.lists(st.integers(1, 200), min_size=1, max_size=25),
           st.integers(0, 400))
    def test_ogg_pages_ground_truth(self, page_sizes, pre_skip):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_ogg_pages import build_opus_stream, mk_page

        from pixeltable_spark.functions import audio_codec as ac
        p = build_opus_stream(n_data_pages=len(page_sizes),
                              pre_skip=pre_skip)
        idx = ac.ogg_page_index(p, verify_crc=True)
        assert len(idx) == len(page_sizes) + 2
        assert all(pg["crc_ok"] for pg in idx)
        assert sum(pg["size"] for pg in idx) == len(p)
        assert ac.ogg_duration(p) == pytest.approx(
            len(page_sizes) * 960 / 48000, abs=1e-6)

    @_SET
    @given(st.lists(st.tuples(st.integers(8, 1500), st.integers(1, 4)),
                    min_size=1, max_size=30))
    def test_adts_ground_truth(self, spec):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_adts_frames import mk_adts

        from pixeltable_spark.functions import audio_codec as ac
        p = b"".join(mk_adts(size=s, n_blocks=b) for s, b in spec)
        idx = ac.adts_frame_index(p)
        assert len(idx) == len(spec)
        assert [f["size"] for f in idx] == [s for s, _ in spec]
        assert ac.adts_duration(p) == pytest.approx(
            sum(b * 1024 for _, b in spec) / 44100, abs=1e-6)
        segs = ac.adts_split(p, duration=0.05)
        assert b"".join(s for _, _, s in segs) == p

    @_SET
    @given(st.integers(16, 4000), st.integers(16, 4000),
           st.sampled_from([66, 100]))
    def test_h264_sps_dims_roundtrip(self, w, h, profile):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_h264_structure import mk_sps

        from pixeltable_spark.functions import video_codec as vc
        w -= w % 2
        h -= h % 2   # crop units are 2 px for 4:2:0
        w, h = max(w, 16), max(h, 16)
        sps = vc.h264_parse_sps(mk_sps(w, h, profile=profile))
        assert (sps["width"], sps["height"]) == (w, h)


class TestMkvFuzz:
    @_SET
    @given(st.data())
    def test_block_index_ground_truth(self, data):
        import sys
        sys.path.insert(0, "/root/repo/tests")
        from test_mkv_blocks import (block_group, build_mkv, cluster, el,
                                     simple_block)

        from pixeltable_spark.functions import video_codec as vc
        tscale = data.draw(st.sampled_from([1_000_000, 500_000, 2_000_000]))
        n_clusters = data.draw(st.integers(1, 6))
        spec = []   # (ctime, [(rel, keyframe, via_group)])
        t = 0
        for _ in range(n_clusters):
            blocks = data.draw(st.lists(
                st.tuples(st.integers(0, 500), st.booleans(), st.booleans()),
                min_size=1, max_size=5))
            spec.append((t, blocks))
            t += data.draw(st.integers(100, 1000))
        ebml_hdr = el(0x1A45DFA3, el(0x4282, b"matroska"))
        info = el(0x1549A966, el(0x2AD7B1, tscale.to_bytes(3, "big")))
        tracks = el(0x1654AE6B, el(0xAE, el(0x83, b"\x01")
                                   + el(0x86, b"V_T")))
        body = info + tracks
        want = []
        for ctime, blocks in spec:
            blob = b""
            for rel, kf, via_group in blocks:
                if via_group:
                    blob += block_group(1, rel, ref=not kf)
                else:
                    blob += simple_block(1, rel, kf)
                want.append((round((ctime + rel) * tscale / 1e9, 6), kf))
            body += cluster(ctime, blob)
        p = ebml_hdr + el(0x18538067, body)
        idx = vc.mkv_block_index(p)
        assert [(b["t"], b["keyframe"]) for b in idx] == want
        segs = vc.mkv_split(p, duration=1e-9)
        assert sum(len([b for b in vc.mkv_block_index(s)])
                   for _, _, s in segs) == len(want)
