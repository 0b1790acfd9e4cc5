"""Multimodal plumbing: binary columns, metadata, mapInPandas decode."""

from __future__ import annotations

import pytest

from bigdata_elephant_spark.operators import multimodal as mm
from bigdata_elephant_spark.sources.corpus import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.attach_fake_media(read_table(spark, sf_dir, "documents"))


def test_media_schema(media):
    d = dict(media.dtypes)
    assert d["media"] == "binary"
    assert d["meta"].startswith("struct<format:string,width:int")


def test_decode_unknown_format_raises_without_pil(media):
    """Non-netpbm payloads with no PIL installed fail the task with
    the NotImplementedError surfaced from the worker (magic-byte
    dispatch); if PIL is present the payloads just aren't images and
    still fail. Either way fake=False on raw text bytes errors."""
    with pytest.raises(Exception, match="decoder|PIL|cannot identify"):
        mm.decode_media(media, fake=False).collect()


def test_decode_real_netpbm_without_pil(spark):
    """fake=False genuinely works on netpbm payloads in this
    container (no PIL): black and white P6 images produce all-0 /
    all-1 grayscale-thumbnail features, and a P5 ramp reproduces the
    integer-luma + nearest-neighbor reference computed inline."""
    import numpy as np

    black = np.zeros((10, 7, 3), dtype=np.uint8)
    white = np.full((5, 5, 3), 255, dtype=np.uint8)
    rows = [
        (0, bytearray(mm.encode_ppm(black))),
        (1, bytearray(mm.encode_ppm(white))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {
        r["doc_id"]: r["feature"]
        for r in mm.decode_media(media, fake=False).collect()
    }
    assert len(out[0]) == mm.FEATURE_DIM
    assert all(abs(v) < 1e-9 for v in out[0])
    assert all(abs(v - 1.0) < 1e-9 for v in out[1])
    # structured pixels: driver-side reference == executor decode
    px = ((np.arange(9 * 6 * 3) * 7) % 256).astype(np.uint8).reshape(
        9, 6, 3
    )
    media2 = spark.createDataFrame(
        [(2, bytearray(mm.encode_ppm(px)))],
        "doc_id long, media binary",
    )
    (row,) = mm.decode_media(media2, fake=False).collect()
    assert row["feature"] == [
        pytest.approx(v, abs=1e-7)
        for v in mm._netpbm_features(mm.encode_ppm(px))
    ]


def test_fake_decode_shapes_and_determinism(media):
    feats = mm.decode_media(media, fake=True)
    rows = feats.limit(20).collect()
    assert all(len(r["feature"]) == mm.FEATURE_DIM for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)
    # deterministic across runs (hash-seeded stub)
    again = {
        r["doc_id"]: r["feature"]
        for r in mm.decode_media(media, fake=True).limit(20).collect()
    }
    for r in rows:
        assert again[r["doc_id"]] == r["feature"]


def test_media_summary_prunes_payload(media):
    out = mm.media_summary(media).collect()
    assert len(out) == 1 and out[0]["format"] == "fake/raw"
    assert out[0]["total_bytes"] > 0


def test_frame_sample_fanout_and_crc(spark):
    import zlib
    from bigdata_elephant_spark.operators.multimodal import (
        attach_fake_media,
        frame_sample,
    )

    docs = spark.createDataFrame(
        [(1, "a" * 200), (2, "xy"), (3, "")],
        "doc_id long, text string",
    )
    got = frame_sample(
        attach_fake_media(docs), frame_size=64, stride=2
    ).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 200 bytes -> 4 frames, stride 2 -> idx 0 and 2
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 2]
    assert {r["frame_idx"]: r["frame_bytes"] for r in by_doc[1]} == {
        0: 64, 2: 64}
    # 2 bytes -> 1 frame; empty payload -> no frames
    assert [r["frame_bytes"] for r in by_doc[2]] == [2]
    assert 3 not in by_doc
    # crc matches an independent recompute
    raw = b"a" * 200
    crc0 = zlib.crc32(raw[0:64])
    assert {r["frame_idx"]: r["frame_crc"] for r in by_doc[1]}[0] == crc0


def test_resize_media_shapes(spark):
    from bigdata_elephant_spark.operators.multimodal import (
        attach_fake_media,
        resize_media,
    )

    docs = spark.createDataFrame(
        [(1, "ab"), (2, "x" * 5000), (3, "")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in resize_media(
        attach_fake_media(docs), target_w=8, target_h=8
    ).collect()}
    assert all(len(r["media"]) == 64 for r in got.values())
    assert bytes(got[1]["media"])[:4] == b"abab"      # cycled
    assert bytes(got[2]["media"]) == b"x" * 64        # truncated
    assert bytes(got[3]["media"]) == b"\x00" * 64     # empty -> zeros
    assert got[1]["width"] == 8 and got[1]["height"] == 8


# ------------------------------------------------- real PPM decoder


def test_ppm_roundtrip_and_header_variants():
    import numpy as np

    from bigdata_elephant_spark.operators.multimodal import (
        decode_ppm,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(px)) == px).all()
    # comments + arbitrary whitespace in the header
    body = px.tobytes()
    raw = b"P6 # a comment\n# another\n 7\t5 \n255\n" + body
    assert (decode_ppm(raw) == px).all()
    # grayscale P5
    g = rng.integers(0, 256, size=(4, 6, 1), dtype=np.uint8)
    raw5 = b"P5\n6 4\n255\n" + g.tobytes()
    assert (decode_ppm(raw5) == g).all()
    # nearest-neighbor resize: exact index-map semantics
    small = resize_nearest(px, 3, 2)
    assert small.shape == (2, 3, 3)
    assert (small[0, 0] == px[0, 0]).all()
    assert (small[1, 2] == px[(1 * 5) // 2, (2 * 7) // 3]).all()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_ppm_stats_pipeline(spark):
    """Synthesized payloads are REAL P6 files; stats come from an
    actual parse+decode, and match the closed-form expectation."""
    from bigdata_elephant_spark.operators.multimodal import (
        decode_ppm,
        ppm_channel_stats,
        synth_ppm_payloads,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (0, 5, 11)], "doc_id long"
    )
    payloads = {r["doc_id"]: bytes(r["media"])
                for r in synth_ppm_payloads(docs).collect()}
    px5 = decode_ppm(payloads[5])
    assert px5.shape == (5 % 8 + 8, 5 % 16 + 8, 3)
    stats = {r["doc_id"]: r
             for r in ppm_channel_stats(synth_ppm_payloads(docs)).collect()}
    import numpy as np

    expect = px5.reshape(-1, 3).astype(np.float64).mean(axis=0)
    assert stats[5]["mean_r"] == expect[0]
    assert stats[5]["mean_g"] == expect[1]
    assert stats[5]["mean_b"] == expect[2]


def test_ahash_known_duplicates_and_band_completeness(spark):
    """Average-hash pipeline: (1) payloads are fully determined by
    doc_id mod 256 (w: mod 16, h: mod 8, pixels: mod 256), so docs
    256 apart are byte-identical images -> hamming 0; (2) the banded
    pair join returns exactly the pairs a brute-force quadratic
    Hamming scan finds (4x16-bit pigeonhole completeness, thr=3)."""
    import numpy as np

    from bigdata_elephant_spark.operators.multimodal import (
        ahash_64,
        ahash_hashes,
        decode_ppm,
        phash_near_dup_pairs,
        synth_ppm_payloads,
    )

    ids = list(range(40)) + [256, 257, 300]
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    payloads = synth_ppm_payloads(docs)
    hashes = ahash_hashes(payloads)
    rows = {r["doc_id"]: (r["h_hi"], r["h_lo"]) for r in hashes.collect()}
    # determinism vs a local decode of the same payload
    pay = {r["doc_id"]: bytes(r["media"]) for r in payloads.collect()}
    assert rows[5] == ahash_64(decode_ppm(pay[5]))
    # identical image 256 apart => identical hash halves
    assert rows[0] == rows[256]
    assert rows[1] == rows[257]

    got = {(r["doc_a"], r["doc_b"]): r["hamming"]
           for r in phash_near_dup_pairs(hashes, thr=3).collect()}
    assert got[(0, 256)] == 0 and got[(1, 257)] == 0

    def ham(a, b):
        (ha, la), (hb, lb) = rows[a], rows[b]
        return bin(ha ^ hb).count("1") + bin(la ^ lb).count("1")

    expect = {
        (a, b): ham(a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if ham(a, b) <= 3
    }
    # brute force compares unordered pairs; normalize orientation
    expect = {(min(a, b), max(a, b)): h for (a, b), h in expect.items()}
    assert got == expect


def test_wav_decoder_roundtrip_and_chunk_walk():
    """encode->decode roundtrips; the chunk walker handles unknown
    chunks, odd-size word alignment, and fmt after data; non-WAV and
    unsupported formats raise."""
    import struct

    import numpy as np
    import pytest as _pytest

    from bigdata_elephant_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
    )

    s = np.array([-2048, 0, 1, 2047, -1], dtype=np.int16)
    rate, back = decode_wav(encode_wav(s, 16000))
    assert rate == 16000 and (back == s).all()

    # hand-build: LIST chunk (odd size -> pad), then data, then fmt
    data = s.tobytes()
    fmt = struct.pack("<4sI", b"fmt ", 16) + struct.pack(
        "<HHIIHH", 1, 1, 8000, 16000, 2, 16
    )
    odd = struct.pack("<4sI", b"LIST", 3) + b"abc" + b"\x00"  # pad
    dchunk = struct.pack("<4sI", b"data", len(data)) + data
    body = odd + dchunk + fmt
    raw = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
    rate2, back2 = decode_wav(raw)
    assert rate2 == 8000 and (back2 == s).all()

    with _pytest.raises(ValueError):
        decode_wav(b"OggS....nonsense")
    stereo_fmt = struct.pack("<4sI", b"fmt ", 16) + struct.pack(
        "<HHIIHH", 1, 2, 8000, 32000, 4, 16
    )
    bad = struct.pack(
        "<4sI4s", b"RIFF", 4 + len(stereo_fmt) + len(dchunk), b"WAVE"
    ) + stereo_fmt + dchunk
    with _pytest.raises(ValueError):
        decode_wav(bad)


def test_wav_stats_pipeline(spark):
    """Synthesized payloads are REAL WAV files; stats come from an
    actual parse+decode and match the closed-form expectation."""
    import numpy as np

    from bigdata_elephant_spark.operators.multimodal import (
        decode_wav,
        synth_wav_payloads,
        wav_sample_stats,
    )

    docs = spark.createDataFrame([(i,) for i in (0, 7, 123)], "doc_id long")
    payloads = {r["doc_id"]: bytes(r["media"])
                for r in synth_wav_payloads(docs).collect()}
    rate7, s7 = decode_wav(payloads[7])
    assert rate7 == 8000 + (7 % 4) * 4000
    assert len(s7) == 7 % 500 + 100
    i = np.arange(len(s7))
    expect = (7 * 37 + i * 11) % 4096 - 2048
    assert (s7 == expect).all()

    stats = {r["doc_id"]: r
             for r in wav_sample_stats(synth_wav_payloads(docs)).collect()}
    assert stats[7]["peak"] == int(np.abs(expect).max())
    assert stats[7]["mean_amp"] == round(float(expect.sum()) / len(s7), 6)
    assert stats[7]["duration_ms"] == len(s7) * 1000 // rate7


def test_video_container_roundtrip_and_fanout(spark):
    """encode->demux roundtrips frames of differing dimensions; the
    stats fan-out emits one row per frame with formula-exact means;
    a corrupt container raises."""
    import numpy as np
    import pytest as _pytest

    from bigdata_elephant_spark.operators.multimodal import (
        decode_video,
        encode_video,
        synth_video_payloads,
        video_frame_stats,
    )

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8),
    ]
    back = decode_video(encode_video(frames))
    assert len(back) == 2
    assert (back[0] == frames[0]).all() and (back[1] == frames[1]).all()
    with _pytest.raises(ValueError):
        decode_video(b"AVI nonsense")

    docs = spark.createDataFrame([(2,), (5,)], "doc_id long")
    stats = video_frame_stats(synth_video_payloads(docs)).collect()
    by_doc = {}
    for r in stats:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[2]) == 2 % 4 + 2
    assert len(by_doc[5]) == 5 % 4 + 2
    r = next(x for x in by_doc[5] if x["frame_idx"] == 1)
    w, h, seed = 1 % 8 + 4, 1 % 4 + 4, 5 * 131 + 1 * 17
    p = np.arange(w * h * 3, dtype=np.int64)
    px = ((seed * 31 + p * 7) % 256).reshape(h, w, 3)
    gray = px.sum(axis=2) // 3
    assert r["width"] == w and r["height"] == h
    assert r["mean_gray"] == round(float(gray.sum()) / (w * h), 6)


def test_truncated_headers_raise_not_hang():
    """A corrupt/truncated netpbm header must raise ValueError —
    never loop forever on empty reads (an executor hang is far worse
    than a failed task at scale)."""
    import numpy as np
    import pytest

    from bigdata_elephant_spark.operators.multimodal import (
        _parse_ppm_at,
        decode_ppm,
        encode_ppm,
    )

    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n12 34")          # header cut mid-token
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6 # comment only")  # comment runs to EOF
    with pytest.raises(ValueError, match="truncated"):
        _parse_ppm_at(b"P6\n2 2", 0)
    # intact frames still parse
    frame = encode_ppm(np.zeros((2, 3, 3), dtype=np.uint8))
    px, end = _parse_ppm_at(frame, 0)
    assert px.shape == (2, 3, 3) and end == len(frame)


def test_real_pil_decode_where_available(spark):
    """Integration test for the real decoder path: runs wherever PIL
    is installed, skips cleanly in containers without it (this one).
    Exercises the exact mapInPandas plumbing the fake path uses, with
    genuine PNG bytes."""
    import io

    import pytest

    PIL = pytest.importorskip("PIL")
    from PIL import Image

    from bigdata_elephant_spark.operators.multimodal import (
        FEATURE_DIM,
        decode_media,
    )

    def png_bytes(shade: int) -> bytes:
        buf = io.BytesIO()
        Image.new("RGB", (8, 8), (shade, shade, shade)).save(
            buf, format="PNG"
        )
        return buf.getvalue()

    rows = [(0, png_bytes(0)), (1, png_bytes(255))]
    media = spark.createDataFrame(rows, "doc_id long, media binary")
    out = {
        r["doc_id"]: r["feature"]
        for r in decode_media(media, fake=False).collect()
    }
    assert len(out[0]) == FEATURE_DIM
    assert all(abs(v) < 1e-9 for v in out[0])        # black image
    assert all(abs(v - 1.0) < 1e-9 for v in out[1])  # white image


def test_media_validity_classifies_real_bytes(spark):
    """r14 ingest lane: media_validity parses the REAL RIFF
    container with pure column expressions and lands every corrupt
    shape in its declared class (first match wins), and the
    quarantine split's clean side is schema-stable."""
    import numpy as np

    wav = mm.encode_wav(np.arange(100, dtype=np.int16), 8000)
    rows = [
        (0, wav),
        (1, None),
        (2, b""),
        (3, wav[:7]),
        (4, b"JUNK" + wav[4:]),
        (5, wav[:8] + b"EVAW" + wav[12:]),
        (6, wav[:-5]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {
        r["doc_id"]: r["validity"]
        for r in mm.media_validity(df).collect()
    }
    assert got == {
        0: "ok",
        1: "null_media",
        2: "empty",
        3: "truncated_header",
        4: "bad_magic",
        5: "bad_magic",
        6: "size_mismatch",
    }
    assert set(got.values()) <= set(mm.MEDIA_VALIDITY_CLASSES)
    clean, quar = mm.quarantine_media(df)
    assert [r["doc_id"] for r in clean.collect()] == [0]
    assert clean.columns == ["doc_id", "media"]
    assert quar.columns == ["doc_id", "media", "validity"]


def test_media_quarantine_matches_decoder_contract(spark):
    """The lane's promise: every clean-side payload really decodes
    (decode_wav succeeds and returns exactly the declared sample
    count), and every hard-broken class raises — so the scan-fused
    column predicate is a faithful, cheap stand-in for a decode
    attempt. size_mismatch is the documented exception: decode_wav
    silently clamps (returns fewer samples), which is exactly why
    the lane must catch it structurally."""
    import numpy as np
    import pytest as _pytest

    wav = mm.encode_wav(
        (np.arange(200) % 4096 - 2048).astype(np.int16), 16000
    )
    ok_rate, ok_samples = mm.decode_wav(wav)
    assert ok_rate == 16000 and len(ok_samples) == 200

    for payload in (b"", wav[:7], b"JUNK" + wav[4:]):
        with _pytest.raises(ValueError):
            mm.decode_wav(payload)
    # the silent class: decodes, but short — dead-letter material
    rate, samples = mm.decode_wav(wav[:-6])
    assert rate == 16000 and len(samples) == 197


def test_synth_ahash_fused_equals_composed(spark):
    """The fused single-Python-stage synth+hash (synth_ahash_hashes)
    is bit-identical to synth_ppm_payloads |> ahash_hashes — the
    payload round-trip it removes is pure serialization."""
    from bigdata_elephant_spark.operators import multimodal

    docs = spark.range(0, 300).selectExpr("id AS doc_id")
    fused = {
        (r.doc_id, r.h_hi, r.h_lo)
        for r in multimodal.synth_ahash_hashes(docs).collect()
    }
    composed = {
        (r.doc_id, r.h_hi, r.h_lo)
        for r in multimodal.ahash_hashes(
            multimodal.synth_ppm_payloads(docs)
        ).collect()
    }
    assert fused == composed and len(fused) == 300
