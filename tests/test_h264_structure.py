"""H.264/MP4 structure layer (functions/h264_codec.py, mp4_box.py):
Exp-Golomb + SPS round-trips, emulation prevention, NAL segmentation,
IDR split points, MP4 sample-table resolution, Spark operators.

Every fixture is CONSTRUCTED through the modules' own serializer twins
(build_annexb_stream / write_sps / build_minimal_mp4), so parses are
checked against the exact field vectors that produced the bytes."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from buildkite_logs_parquet_spark.functions.h264_codec import (
    SPS,
    build_annexb_stream,
    find_nal_units,
    h264_stream_info,
    insert_emulation_prevention,
    parse_slice_header_prefix,
    parse_sps,
    read_se,
    read_ue,
    remove_emulation_prevention,
    write_se,
    write_sps,
    write_ue,
)
from buildkite_logs_parquet_spark.functions.mp3_codec import (
    BitReader,
    BitWriter,
)
from buildkite_logs_parquet_spark.functions.mp4_box import (
    build_minimal_mp4,
    sample_index,
    video_track_info,
    walk_boxes,
)


class TestExpGolomb:
    @given(st.lists(st.integers(0, 2**20), max_size=30))
    @settings(max_examples=60, deadline=None)
    def test_ue_roundtrip(self, vals):
        w = BitWriter()
        for v in vals:
            write_ue(w, v)
        w.write(1, 1)  # stop bit so the buffer is non-empty
        r = BitReader(w.to_bytes())
        assert [read_ue(r) for _ in vals] == vals

    @given(st.lists(st.integers(-(2**19), 2**19), max_size=30))
    @settings(max_examples=60, deadline=None)
    def test_se_roundtrip(self, vals):
        w = BitWriter()
        for v in vals:
            write_se(w, v)
        w.write(1, 1)
        r = BitReader(w.to_bytes())
        assert [read_se(r) for _ in vals] == vals

    def test_canonical_first_values(self):
        # spec table: ue 0→'1', 1→'010', 2→'011', 3→'00100'
        for v, bits in [(0, "1"), (1, "010"), (2, "011"), (3, "00100")]:
            w = BitWriter()
            write_ue(w, v)
            got = "".join(
                str((w.to_bytes()[i // 8] >> (7 - i % 8)) & 1)
                for i in range(len(bits))
            )
            assert got == bits, v


class TestEmulationPrevention:
    @given(st.binary(max_size=80))
    @settings(max_examples=80, deadline=None)
    def test_roundtrip_and_no_start_codes(self, raw):
        ebsp = insert_emulation_prevention(raw)
        assert remove_emulation_prevention(ebsp) == raw
        # the whole point: no 00 00 0x (x<=1) pattern survives encoding
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp

    def test_known_vector(self):
        assert insert_emulation_prevention(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
        assert remove_emulation_prevention(b"\x00\x00\x03\x00") == b"\x00\x00\x00"


def _sps_strategy():
    return st.builds(
        SPS,
        profile_idc=st.sampled_from([66, 77, 100, 110]),
        level_idc=st.sampled_from([10, 30, 31, 40, 51]),
        sps_id=st.integers(0, 31),
        chroma_format_idc=st.sampled_from([0, 1, 2, 3]),
        bit_depth_luma=st.sampled_from([8, 10]),
        bit_depth_chroma=st.sampled_from([8, 10]),
        log2_max_frame_num=st.integers(4, 12),
        pic_order_cnt_type=st.sampled_from([0, 1, 2]),
        log2_max_poc_lsb=st.integers(4, 12),
        delta_pic_order_always_zero=st.booleans(),
        offset_for_non_ref_pic=st.integers(-8, 8),
        offset_for_top_to_bottom_field=st.integers(-8, 8),
        offsets_for_ref_frame=st.lists(
            st.integers(-16, 16), max_size=4
        ).map(tuple),
        max_num_ref_frames=st.integers(0, 16),
        gaps_in_frame_num_allowed=st.booleans(),
        pic_width_in_mbs=st.integers(1, 256),
        pic_height_in_map_units=st.integers(1, 144),
        frame_mbs_only=st.booleans(),
        mb_adaptive_frame_field=st.booleans(),
        direct_8x8_inference=st.booleans(),
        crop=st.tuples(*[st.integers(0, 3)] * 4),
        vui_present=st.just(False),
    )


class TestSPS:
    @given(_sps_strategy())
    @settings(max_examples=80, deadline=None)
    def test_roundtrip_randomized(self, sps):
        if sps.profile_idc not in (100, 110):
            # the baseline/main bitstream has no chroma block: normalize
            # the fields the writer will not emit
            sps.chroma_format_idc = 1
            sps.separate_colour_plane = False
            sps.bit_depth_luma = sps.bit_depth_chroma = 8
        got = parse_sps(write_sps(sps))
        for f in (
            "profile_idc level_idc sps_id chroma_format_idc "
            "bit_depth_luma bit_depth_chroma log2_max_frame_num "
            "pic_order_cnt_type max_num_ref_frames "
            "gaps_in_frame_num_allowed pic_width_in_mbs "
            "pic_height_in_map_units frame_mbs_only "
            "direct_8x8_inference crop vui_present"
        ).split():
            assert getattr(got, f) == getattr(sps, f), f
        if sps.pic_order_cnt_type == 0:
            assert got.log2_max_poc_lsb == sps.log2_max_poc_lsb
        elif sps.pic_order_cnt_type == 1:
            assert got.offsets_for_ref_frame == sps.offsets_for_ref_frame
        if not sps.frame_mbs_only:
            assert got.mb_adaptive_frame_field == sps.mb_adaptive_frame_field

    def test_geometry_1080p(self):
        # canonical 1920x1080: 120x68 macroblocks, bottom crop 8 px
        # = 4 crop units at 4:2:0 frame coding
        sps = SPS(
            profile_idc=100, chroma_format_idc=1,
            pic_width_in_mbs=120, pic_height_in_map_units=68,
            frame_mbs_only=True, crop=(0, 0, 0, 4),
        )
        assert (sps.width, sps.height) == (1920, 1080)
        got = parse_sps(write_sps(sps))
        assert (got.width, got.height) == (1920, 1080)

    def test_geometry_monochrome_and_444(self):
        s = SPS(profile_idc=100, chroma_format_idc=0,
                pic_width_in_mbs=10, pic_height_in_map_units=10,
                crop=(1, 1, 1, 1))
        assert (s.width, s.height) == (158, 158)  # CropUnit 1/1
        s3 = SPS(profile_idc=100, chroma_format_idc=3,
                 pic_width_in_mbs=10, pic_height_in_map_units=10,
                 crop=(1, 1, 1, 1))
        assert (s3.width, s3.height) == (158, 158)


class TestAnnexBWalk:
    def _idr_rbsp(self):
        # slice header prefix: first_mb=0, slice_type=7 (I, %5==2), pps=0
        w = BitWriter()
        write_ue(w, 0)
        write_ue(w, 7)
        write_ue(w, 0)
        w.write(1, 1)
        return w.to_bytes() + b"\x5a\x00\x00\x01\x99"  # fake coded data
        # NOTE: the payload CONTAINS 00 00 01 — emulation prevention in
        # build_annexb_stream must neutralize it or the walk would split

    def test_nal_walk_idr_detection_and_emulation(self):
        sps = SPS(pic_width_in_mbs=4, pic_height_in_map_units=3)
        stream = build_annexb_stream([
            (3, 7, write_sps(sps)),
            (3, 8, b"\x08"),          # minimal PPS stand-in
            (3, 5, self._idr_rbsp()),  # IDR
            (2, 1, self._idr_rbsp()),  # non-IDR slice
            (3, 5, self._idr_rbsp()),  # IDR again
        ])
        nals = find_nal_units(stream)
        assert [u.nal_type for u in nals] == [7, 8, 5, 1, 5]
        info = h264_stream_info(stream)
        assert info.n_idr == 2 and info.n_slices == 1
        assert info.sps is not None and info.sps.width == 64
        assert len(info.idr_offsets) == 2
        # split offsets actually point at start codes
        for off in info.idr_offsets:
            assert stream[off:off + 3] in (b"\x00\x00\x00", b"\x00\x00\x01")

    def test_four_byte_and_three_byte_start_codes(self):
        stream = build_annexb_stream([(3, 9, b"\x10"), (3, 9, b"\x10")])
        assert stream[:4] == b"\x00\x00\x00\x01"
        nals = find_nal_units(stream)
        assert len(nals) == 2
        assert nals[0].offset == 0 and nals[1].offset == 6

    def test_slice_prefix(self):
        w = BitWriter()
        write_ue(w, 3)   # first_mb_in_slice
        write_ue(w, 12)  # slice_type (12 % 5 == 2 -> I)
        write_ue(w, 1)   # pps_id
        w.write(1, 1)
        p = parse_slice_header_prefix(w.to_bytes())
        assert (p.first_mb_in_slice, p.slice_type, p.pps_id) == (3, 2, 1)
        assert p.type_name == "I"

    def test_no_start_code_raises(self):
        with pytest.raises(ValueError):
            find_nal_units(b"\xff" * 64)


class TestMp4:
    def test_box_tree_and_track_info(self):
        sps = SPS(profile_idc=66, pic_width_in_mbs=4, pic_height_in_map_units=3)
        raw = build_minimal_mp4(
            width=64, height=48, sps=[b"\x67" + write_sps(sps)], pps=[b"\x68\x08"],
        )
        roots = walk_boxes(raw)
        assert [b.type for b in roots] == [b"ftyp", b"moov"]
        info = video_track_info(raw)
        assert info.codec == "avc1"
        assert (info.width, info.height) == (64, 48)
        assert info.timescale == 600
        assert len(info.sps) == 1 and len(info.pps) == 1
        parsed = parse_sps(remove_emulation_prevention(info.sps[0][1:]))
        assert (parsed.width, parsed.height) == (64, 48)

    def test_sample_index_multi_chunk_stsc_runs(self):
        # 6 samples: chunk 1 holds 1, chunks 2..3 hold 2, chunk 4 holds 1
        sizes = [10, 20, 30, 40, 50, 60]
        raw = build_minimal_mp4(
            sample_sizes=sizes,
            samples_per_chunk=[(1, 1), (2, 2), (4, 1)],
            chunk_offsets=[1000, 2000, 3000, 4000],
            sync_samples=[1, 4],
            stts_runs=[(3, 100), (3, 200)],
        )
        info = video_track_info(raw)
        idx = sample_index(raw, info.stbl)
        assert [s.offset for s in idx] == [
            1000, 2000, 2020, 3000, 3040, 4000,
        ]
        assert [s.size for s in idx] == sizes
        assert [s.is_sync for s in idx] == [True, False, False, True, False, False]
        assert [s.dts for s in idx] == [0, 100, 200, 300, 500, 700]

    def test_absent_stss_means_all_sync(self):
        raw = build_minimal_mp4(sample_sizes=[5, 5], chunk_offsets=[100])
        info = video_track_info(raw)
        idx = sample_index(raw, info.stbl)
        assert all(s.is_sync for s in idx)

    def test_inconsistent_tables_raise(self):
        raw = build_minimal_mp4(
            sample_sizes=[5, 5, 5],
            samples_per_chunk=[(1, 1)],  # 1 chunk x 1 sample != 3 samples
            chunk_offsets=[100],
        )
        info = video_track_info(raw)
        with pytest.raises(ValueError):
            sample_index(raw, info.stbl)

    def test_no_video_track_raises(self):
        from buildkite_logs_parquet_spark.functions.mp4_box import _box

        raw = _box(b"ftyp", b"isom" + bytes(8)) + _box(b"moov", b"")
        with pytest.raises(ValueError):
            video_track_info(raw)


class TestSparkOperators:
    def _clips(self, spark):
        sps = SPS(profile_idc=100, pic_width_in_mbs=8,
                  pic_height_in_map_units=6, crop=(0, 0, 0, 4))
        w = BitWriter()
        write_ue(w, 0); write_ue(w, 7); write_ue(w, 0); w.write(1, 1)
        idr = w.to_bytes()
        annexb = build_annexb_stream([
            (3, 7, write_sps(sps)), (3, 8, b"\x08"),
            (3, 5, idr), (2, 1, idr), (3, 5, idr),
        ])
        mp4 = build_minimal_mp4(
            sample_sizes=[10, 20, 30],
            samples_per_chunk=[(1, 3)],
            chunk_offsets=[500],
            sync_samples=[1, 3],
            sps=[b"\x67" + write_sps(sps)],
        )
        return spark.createDataFrame(
            [(1, bytearray(annexb)), (2, bytearray(mp4)),
             (3, bytearray(b"not video at all"))],
            "media_id long, payload binary",
        )

    def test_summary_and_split_points(self, spark):
        from buildkite_logs_parquet_spark.operators.multimodal import (
            video_split_points,
            video_stream_summary,
        )

        media = self._clips(spark)
        rows = {
            r["media_id"]: r
            for r in video_stream_summary(media).collect()
        }
        assert rows[1]["parse_ok"] and rows[1]["container"] == "annexb"
        assert rows[1]["profile"] == "high"
        assert (rows[1]["width"], rows[1]["height"]) == (128, 88)
        assert rows[1]["n_sync"] == 2
        assert rows[2]["parse_ok"] and rows[2]["container"] == "mp4"
        assert rows[2]["codec"] == "avc1"
        assert rows[2]["n_units"] == 3 and rows[2]["n_sync"] == 2
        assert rows[2]["width"] == 128  # SPS geometry, not tkhd
        assert rows[3]["parse_ok"] is False
        sp = video_split_points(media).orderBy("media_id", "split_idx").collect()
        by_id = {}
        for r in sp:
            by_id.setdefault(r["media_id"], []).append(r)
        assert [r["kind"] for r in by_id[1]] == ["idr", "idr"]
        assert [r["byte_offset"] for r in by_id[2]] == [500, 530]
        assert [r["kind"] for r in by_id[2]] == ["sync_sample"] * 2
        assert 3 not in by_id  # quarantined by absence
        # narrow map: no shuffle
        plan = video_split_points(media)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestReviewHardening:
    """Round-6 video-tier review regressions."""

    def test_trailing_zero_rbsp_rejected_by_builder(self):
        # spec 7.4.1: a NAL must not end in 0x00 — an RBSP that does is
        # indistinguishable from the next start code's leading zero and
        # the round-trip silently truncated it
        with pytest.raises(ValueError):
            build_annexb_stream([(3, 5, b"\x12\x00")])
        # the compliant form round-trips exactly
        stream = build_annexb_stream([(3, 5, b"\x12\x80"), (3, 9, b"\x10")])
        nals = find_nal_units(stream)
        assert len(nals) == 2
        payload = stream[nals[0].header_offset + 1:
                         nals[0].header_offset + nals[0].size]
        assert remove_emulation_prevention(payload) == b"\x12\x80"

    def test_truncated_sps_raises_instead_of_fabricating_geometry(self):
        sps = SPS(
            profile_idc=100, pic_width_in_mbs=120,
            pic_height_in_map_units=68, crop=(0, 0, 0, 4),
        )
        full = write_sps(sps)
        assert parse_sps(full).height == 1080
        with pytest.raises(ValueError):
            parse_sps(full[:7])  # over-read must raise, never zero-fill

    def test_hostile_stsz_fixed_count_rejected(self):
        raw = bytearray(build_minimal_mp4(sample_sizes=[5, 5]))
        # rewrite the stsz box: fixed_size=1000, sample_count=2^31
        import struct as _s

        i = raw.find(b"stsz")
        _s.pack_into(">II", raw, i + 8, 1000, 2**31)
        info = video_track_info(bytes(raw))
        with pytest.raises(ValueError):
            sample_index(bytes(raw), info.stbl)

    def test_hostile_stts_run_count_clamped(self):
        raw = bytearray(build_minimal_mp4(
            sample_sizes=[5, 5], stts_runs=[(2, 100)]
        ))
        import struct as _s

        i = raw.find(b"stts")
        # one run claiming 2^31 samples: must clamp to n_samples, not loop
        _s.pack_into(">II", raw, i + 8 + 4, 2**31, 100)
        info = video_track_info(bytes(raw))
        idx = sample_index(bytes(raw), info.stbl)
        assert [s.dts for s in idx] == [0, 100]

    def test_shared_dispatch_consistency(self, spark):
        # summary and split points must agree on every clip they parse
        from buildkite_logs_parquet_spark.operators.multimodal import (
            _video_structure,
        )

        sps = SPS(pic_width_in_mbs=4, pic_height_in_map_units=3)
        w = BitWriter()
        write_ue(w, 0); write_ue(w, 7); write_ue(w, 0); w.write(1, 1)
        stream = build_annexb_stream(
            [(3, 7, write_sps(sps)), (3, 5, w.to_bytes())]
        )
        summary, splits = _video_structure(stream)
        assert summary["n_sync"] == len(splits) == 1
        mp4 = build_minimal_mp4(sample_sizes=[7, 7], sync_samples=[2])
        summary, splits = _video_structure(mp4)
        assert summary["n_sync"] == len(splits) == 1
        assert splits[0]["kind"] == "sync_sample"


class TestRound7AdvisoryHardening:
    """Round-7 fixes of the round-6 advisory findings (ADVICE.md)."""

    def test_hostile_stsc_gap_rejected_not_allocated(self):
        # a 2-entry stsc whose second first_chunk is huge must NOT drive
        # a [per]*gap allocation: the run clamps to the real chunk count
        raw = bytearray(build_minimal_mp4(
            sample_sizes=[5, 5], samples_per_chunk=[(1, 1), (2, 1)],
            chunk_offsets=[100, 105],
        ))
        import struct as _s

        i = raw.find(b"stsc")
        # entry 1: first_chunk = 80_000_000 (would be ~320 MB of spc)
        _s.pack_into(">I", raw, i + 8 + 4 + 12, 80_000_000)
        info = video_track_info(bytes(raw))
        idx = sample_index(bytes(raw), info.stbl)  # clamps, no ballooning
        assert len(idx) == 2

    def test_non_increasing_stsc_first_chunk_raises(self):
        raw = bytearray(build_minimal_mp4(
            sample_sizes=[5, 5], samples_per_chunk=[(1, 1), (2, 1)],
            chunk_offsets=[100, 105],
        ))
        import struct as _s

        i = raw.find(b"stsc")
        _s.pack_into(">I", raw, i + 8 + 4 + 12, 1)  # duplicate first_chunk
        info = video_track_info(bytes(raw))
        with pytest.raises(ValueError):
            sample_index(bytes(raw), info.stbl)

    def test_stco_count_beyond_box_raises_valueerror(self):
        # a declared count past the box payload must fail LOUDLY with the
        # module's quarantine exception, not read neighboring boxes'
        # bytes as chunk offsets (nor raise struct.error at EOF)
        raw = bytearray(build_minimal_mp4(sample_sizes=[5, 5]))
        import struct as _s

        i = raw.find(b"stco")
        _s.pack_into(">I", raw, i + 8, 1000)
        info = video_track_info(bytes(raw))
        with pytest.raises(ValueError):
            sample_index(bytes(raw), info.stbl)

    def test_stss_count_beyond_box_raises_valueerror(self):
        raw = bytearray(build_minimal_mp4(
            sample_sizes=[5, 5], sync_samples=[1]
        ))
        import struct as _s

        i = raw.find(b"stss")
        _s.pack_into(">I", raw, i + 8, 2**20)
        info = video_track_info(bytes(raw))
        with pytest.raises(ValueError):
            sample_index(bytes(raw), info.stbl)

    def test_variable_stsz_count_beyond_box_raises(self):
        raw = bytearray(build_minimal_mp4(sample_sizes=[5, 5]))
        import struct as _s

        i = raw.find(b"stsz")
        _s.pack_into(">II", raw, i + 8, 0, 2**20)  # variable, huge count
        info = video_track_info(bytes(raw))
        with pytest.raises(ValueError):
            sample_index(bytes(raw), info.stbl)

    def test_zero_header_nal_rejected_by_builder(self):
        # header byte 0x00 + RBSP starting 00 01 = unescaped start code
        # (emulation prevention never scans the header byte): the builder
        # must reject it instead of emitting a phantom unit
        with pytest.raises(ValueError):
            build_annexb_stream([(0, 0, b"\x00\x01\x80"), (3, 1, b"\x10")])
        # nonzero headers with the same RBSP round-trip fine
        stream = build_annexb_stream([(1, 1, b"\x00\x01\x80"), (3, 1, b"\x10")])
        assert len(find_nal_units(stream)) == 2
