"""AVI video container tier: pure-stdlib RIFF parser round-trips,
foreign-writer tolerance, fail-loud refusals, and the Spark frame-stats
surface (VERDICT r12 item 6 — retires the last declared multimodal
stand-in: frame extraction now parses a REAL video container)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from bigdata_googleplaystore_spark.operators import codecs, multimodal


# ----------------------------------------------------------------------
# Codec unit level (no Spark)
# ----------------------------------------------------------------------


def test_avi_roundtrip_frame_exact():
    frames = [bytes(range(64)), bytes(range(64, 128)), b"\x07" * 30]
    payload = codecs.encode_avi_gray(frames, 16, 4, fps=5)
    assert codecs.sniff(payload) == "avi"
    w, h, fps, out = codecs.decode_avi_gray(payload)
    assert (w, h, fps) == (16, 4, 5)
    assert out[0] == frames[0]
    assert out[1] == frames[1]
    assert out[2] == frames[2].ljust(64, b"\x00")  # short frame zero-pads


def test_avi_single_frame_and_odd_width_stride():
    # width 5 -> 15-byte rows pad to a 16-byte stride; both sides must
    # agree on the padding or pixels shear
    frames = [bytes(range(35))]
    payload = codecs.encode_avi_gray(frames, 5, 7, fps=1)
    w, h, fps, out = codecs.decode_avi_gray(payload)
    assert (w, h, fps) == (5, 7, 1)
    assert out == [frames[0]]


def test_avi_decoder_tolerates_foreign_chunks_and_00dc_tag():
    """Real muxers emit JUNK padding, INFO lists, and tag compressed-
    codec frames '00dc' even for DIB; the walker must skip the former
    and accept the latter."""
    payload = codecs.encode_avi_gray([bytes(range(64))], 16, 4, fps=5)
    junk = (
        b"JUNK" + struct.pack("<I", 13) + b"\x00" * 13 + b"\x00"  # word pad
        + b"LIST" + struct.pack("<I", 4 + 12) + b"INFO"
        + b"ISFT" + struct.pack("<I", 4) + b"test"
    )
    hacked = payload[:12] + junk + payload[12:]
    hacked = b"RIFF" + struct.pack("<I", len(hacked) - 8) + hacked[8:]
    hacked = hacked.replace(b"00db", b"00dc")  # movi chunk + idx1 entry
    w, h, fps, out = codecs.decode_avi_gray(hacked)
    assert (w, h, fps) == (16, 4, 5)
    assert out == [bytes(range(64))]


def test_avi_foreign_layouts_decode_exactly():
    """Real-muxer layouts the r13 review flagged: top-down DIBs
    (negative strf biHeight), 'rec '-grouped interleave lists, and
    zero-length dropped-frame markers (VfW repeat-previous) must all
    decode to the right pixels, not silently-wrong ones."""
    frame0, frame1 = bytes(range(64)), bytes(range(64, 128))
    one = codecs.encode_avi_gray([frame0], 16, 4, fps=5)

    # top-down: flip the strf height sign and store rows top-down
    strf_bu = struct.pack("<IiiHHI", 40, 16, 4, 1, 24, 0)
    strf_td = struct.pack("<IiiHHI", 40, 16, -4, 1, 24, 0)
    td_rows = b"".join(
        b"".join(bytes((g, g, g)) for g in frame0[r * 16 : (r + 1) * 16])
        for r in range(4)
    )
    bu_rows = codecs._dib_pack_gray(frame0, 16, 4)
    hacked = one.replace(strf_bu, strf_td, 1).replace(bu_rows, td_rows, 1)
    assert codecs.decode_avi_gray(hacked)[3] == [frame0]

    # rec-interleave: the frame chunk rides inside LIST 'rec '
    plain_movi = codecs._riff_list(
        b"movi", codecs._riff_chunk(b"00db", bu_rows)
    )
    rec_movi = codecs._riff_list(
        b"movi",
        codecs._riff_list(b"rec ", codecs._riff_chunk(b"00db", bu_rows)),
    )
    assert plain_movi in one
    hacked2 = one.replace(plain_movi, rec_movi, 1)
    hacked2 = b"RIFF" + struct.pack("<I", len(hacked2) - 8) + hacked2[8:]
    assert codecs.decode_avi_gray(hacked2)[3] == [frame0]

    # dropped frame (zero-length chunk) repeats the previous frame
    two = codecs.encode_avi_gray([frame0, frame1], 16, 4, fps=5)
    d0, d1 = codecs._dib_pack_gray(frame0, 16, 4), codecs._dib_pack_gray(frame1, 16, 4)
    plain2 = codecs._riff_list(
        b"movi", codecs._riff_chunk(b"00db", d0) + codecs._riff_chunk(b"00db", d1)
    )
    dropped = codecs._riff_list(
        b"movi", codecs._riff_chunk(b"00db", d0) + codecs._riff_chunk(b"00db", b"")
    )
    assert plain2 in two
    hacked3 = two.replace(plain2, dropped, 1)
    hacked3 = b"RIFF" + struct.pack("<I", len(hacked3) - 8) + hacked3[8:]
    assert codecs.decode_avi_gray(hacked3)[3] == [frame0, frame0]


def test_avi_header_validation_refusals():
    """Fail-loud on malformed headers (r13 review): dwScale=0 has no
    defined fps, and a strh frame count the movi list contradicts must
    not be reported as if it were the container's truth."""
    one = codecs.encode_avi_gray([b"\x01" * 64], 16, 4, fps=5)
    pre = struct.pack("<IHHI", 0, 0, 0, 0)  # dwFlags..dwInitialFrames
    good = b"vids" + b"DIB " + pre + struct.pack("<II", 1, 5)
    bad = b"vids" + b"DIB " + pre + struct.pack("<II", 0, 5)
    assert good in one
    with pytest.raises(ValueError, match="dwScale"):
        codecs.decode_avi_gray(one.replace(good, bad, 1))
    i = one.index(b"vids")
    patched = one[: i + 32] + struct.pack("<I", 3) + one[i + 36 :]
    with pytest.raises(ValueError, match="frame"):
        codecs.decode_avi_gray(patched)
    # NTSC-style non-integral rate rounds (29.97 -> 30), documented
    ntsc = one.replace(good, b"vids" + b"DIB " + pre + struct.pack("<II", 1001, 30000), 1)
    assert codecs.decode_avi_gray(ntsc)[2] == 30


def test_avi_refusals_fail_loudly():
    payload = codecs.encode_avi_gray([b"\x01" * 64], 16, 4)
    # wrong magic
    with pytest.raises(ValueError, match="RIFF/AVI"):
        codecs.decode_avi_gray(b"RIFF" + payload[4:8] + b"WAVE" + payload[12:])
    # compressed stream (strf biCompression != 0, e.g. MJPG): refuse,
    # never emit garbage frames
    strf_rgb = struct.pack("<IiiHHI", 40, 16, 4, 1, 24, 0)
    strf_mjpg = struct.pack("<IiiHHI", 40, 16, 4, 1, 24, 0x47504A4D)
    with pytest.raises(ValueError, match="unsupported AVI"):
        codecs.decode_avi_gray(payload.replace(strf_rgb, strf_mjpg, 1))
    # truncated mid-movi (cutting only the trailing idx1 is tolerated —
    # the index is optional — so cut into the frame data itself)
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_avi_gray(payload[: payload.index(b"idx1") - 10])
    # no frames at all
    with pytest.raises(ValueError, match="at least one frame"):
        codecs.encode_avi_gray([], 16, 4)


def test_avi_golden_bytes_stable():
    """The encoder's bytes are part of the oracle contract (DuckDB
    re-derives frame sums from the source text), so the container
    layout must not drift silently."""
    payload = codecs.encode_avi_gray([b"ab", b"cd"], 2, 1, fps=10)
    # spot-pin the structure: RIFF/AVI magic, hdrl first, 2 frames in
    # movi, idx1 with 2 keyframe entries
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    assert payload.count(b"00db") == 4  # 2 movi chunks + 2 idx1 entries
    assert b"idx1" in payload and b"vids" in payload and b"DIB " in payload
    import hashlib

    assert hashlib.md5(payload).hexdigest() == GOLDEN_MD5


# filled by the first run; pinned so layout drift is loud
GOLDEN_MD5 = "22fb95a5996a223b11cb1f8b237e6724"


def test_avi_av_mux_demux_sample_and_frame_exact():
    """Interleaved A/V: video frames and PCM samples both survive the
    per-frame-period interleave byte-exact; the video-only view ignores
    the audio stream; audio-less files refuse the A/V demux."""
    import numpy as np

    frames = [bytes(range(64)), bytes(range(64, 128)), b"\x05" * 64]
    samples = [(i % 256 - 128) * 100 for i in range(2500)]
    av = codecs.encode_avi_av(frames, 16, 4, samples, sample_rate=8000, fps=10)
    assert codecs.sniff(av) == "avi"
    w, h, fps, out, sr, s = codecs.decode_avi_av(av)
    assert (w, h, fps, sr) == (16, 4, 10, 8000)
    assert out == frames
    assert s.dtype == np.dtype("<i2") and s.tolist() == samples
    # video-only view of the same container
    assert codecs.decode_avi_gray(av)[3] == frames
    # decode_features treats it as a video payload (px over all frames)
    # and audio-less files refuse the A/V demux
    with pytest.raises(ValueError, match="no audio"):
        codecs.decode_avi_av(codecs.encode_avi_gray(frames, 16, 4))
    # stereo/compressed audio refuses
    strf_mono = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    strf_stereo = struct.pack("<HHIIHH", 1, 2, 8000, 16000, 2, 16)
    assert strf_mono in av
    with pytest.raises(ValueError, match="PCM16 mono"):
        codecs.decode_avi_av(av.replace(strf_mono, strf_stereo, 1))


def _grow_movi(payload: bytes, old_chunk: bytes, new_chunks: bytes) -> bytes:
    """Swap a movi chunk for a longer replacement, fixing the movi LIST
    and RIFF lengths so the container stays structurally valid."""
    hacked = payload.replace(old_chunk, new_chunks, 1)
    i = hacked.index(b"movi") - 8  # the movi LIST header
    (old_len,) = struct.unpack("<I", hacked[i + 4 : i + 8])
    hacked = (
        hacked[: i + 4]
        + struct.pack("<I", old_len + len(new_chunks) - len(old_chunk))
        + hacked[i + 8 :]
    )
    return b"RIFF" + struct.pack("<I", len(hacked) - 8) + hacked[8:]


def test_avi_chunk_stream_type_routing_refusals():
    """r13 review finding: a movi chunk whose type suffix contradicts
    its stream's declared type (audio bytes as video frames, a dropped-
    frame marker aimed at the audio stream) or addresses an undeclared
    stream must raise ValueError — never TypeError, never garbage
    pixels."""
    frames = [bytes(range(64))]
    av = codecs.encode_avi_av(frames, 16, 4, [1, -2, 3], 8000, fps=10)
    d0 = codecs._dib_pack_gray(frames[0], 16, 4)
    plain = codecs._riff_chunk(b"00db", d0)
    assert plain in av
    # video-typed chunk aimed at the audio stream (zero-length: the
    # dropped-frame marker that previously became a None in the audio
    # chunk list and crashed b"".join with TypeError)
    with pytest.raises(ValueError, match="contradicts"):
        codecs.decode_avi_av(
            _grow_movi(av, plain, plain + codecs._riff_chunk(b"01dc", b""))
        )
    # audio-typed chunk aimed at the video stream (bytes would decode
    # as garbage pixels when dwLength is 0)
    with pytest.raises(ValueError, match="contradicts"):
        codecs.decode_avi_gray(
            _grow_movi(av, plain, plain + codecs._riff_chunk(b"00wb", b"xx"))
        )
    # chunk for a stream hdrl never declared
    with pytest.raises(ValueError, match="declares only"):
        codecs.decode_avi_gray(
            _grow_movi(av, plain, plain + codecs._riff_chunk(b"07db", d0))
        )


# ----------------------------------------------------------------------
# Spark surface
# ----------------------------------------------------------------------


def test_video_frame_stats_matches_per_text_sums(spark):
    texts = [
        ("a" * 70, 0),     # 2 frames: 64 'a's + 6 'a's
        ("xyz", 1),        # 1 partial frame
        ("b" * 500, 2),    # capped at 6 frames (500 > 6*64)
    ]
    df = spark.createDataFrame(
        [(i, t) for t, i in texts], "doc_id long, text string"
    )
    media = multimodal.attach_video_payload(df, "text", "doc_id")
    rows = multimodal.video_frame_stats(media).collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    assert [r.frame_sum for r in sorted(by_id[0], key=lambda r: r.frame_idx)] == [
        97 * 64,
        97 * 6,
    ]
    assert by_id[0][0].n_frames == 2 and by_id[0][0].fps == 10
    assert [r.frame_sum for r in by_id[1]] == [ord("x") + ord("y") + ord("z")]
    caps = sorted(by_id[2], key=lambda r: r.frame_idx)
    assert len(caps) == 6 and all(r.frame_sum == 98 * 64 for r in caps)
    assert all(r.n_px == 64 for r in rows)


def test_av_demux_stats_matches_per_text_sums(spark):
    texts = [("a" * 70, 0), ("b" * 500, 1)]
    df = spark.createDataFrame(
        [(i, t) for t, i in texts], "doc_id long, text string"
    )
    media = multimodal.attach_av_payload(df, "text", "doc_id")
    rows = {r.media_id: r for r in multimodal.av_demux_stats(media).collect()}
    r0 = rows[0]
    assert (r0.fps, r0.sample_rate) == (10, 8000)
    assert r0.n_frames == 2 and r0.px_sum == 97 * 70
    assert r0.n_samples == 70 and r0.sample_sum == (97 - 128) * 128 * 70
    r1 = rows[1]  # capped at 6 frames; audio still carries every byte
    assert r1.n_frames == 6 and r1.px_sum == 98 * 6 * 64
    assert r1.n_samples == 500 and r1.sample_sum == (98 - 128) * 128 * 500


def test_video_dup_pairs_cap_and_geometry_semantics(spark):
    """The dedup signature covers decoded frames AFTER the cap and
    padding: a clip truncated at the 6-frame cap signs equal to its
    longer source; same pixels at different geometry sign differently;
    distinct content never pairs."""
    long_text = "z" * 500
    rows = [
        (0, long_text),           # 6 capped frames
        (1, long_text[:384]),     # same 6 frames via truncation -> dup of 0
        (2, long_text[:383]),     # one byte short: last tile differs
        (3, "q" * 500),           # different content entirely
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    media = multimodal.attach_video_payload(df, "text", "doc_id")
    pairs = {
        (r.video_a, r.video_b)
        for r in multimodal.video_dup_pairs(media).collect()
    }
    assert pairs == {(0, 1)}
    # geometry is part of the signature: same pixel stream, different
    # frame shape -> no pair
    m8 = multimodal.attach_video_payload(
        df.filter("doc_id = 0"), "text", "doc_id", frame_w=8, frame_h=8
    )
    sig16 = multimodal.video_signatures(
        media.filter("media_id = 0")
    ).first().sig
    sig8 = multimodal.video_signatures(m8).first().sig
    assert sig16 != sig8


def test_video_payloads_are_real_avi(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    payload = bytes(
        multimodal.attach_video_payload(df, "text", "doc_id").first().payload
    )
    assert codecs.sniff(payload) == "avi"
    w, h, fps, frames = codecs.decode_avi_gray(payload)
    assert (w, h) == (16, 4) and len(frames) == 1
    assert frames[0].rstrip(b"\x00") == b"hello world"
