"""Multimodal column plumbing: real header round-trips, frame sampling,
deterministic features (operators/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from s3_access_logs_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"document body number {i} " * (1 + i % 5)) for i in range(30)],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def assets(spark, docs):
    df = MM.synthesize_assets(docs)
    df.persist()
    yield df
    df.unpersist()


def test_synthesize_modalities(assets):
    counts = {r["modality"]: r["count"] for r in
              assets.groupBy("modality").count().collect()}
    assert counts == {"image": 10, "audio": 10, "video": 10}


def test_decode_metadata_roundtrip(assets):
    rows = {r.asset_id: r for r in MM.decode_metadata(assets).collect()}
    for doc_id, r in rows.items():
        m = doc_id % 3
        if m == 0:
            w, h = MM.image_params(doc_id)
            assert (r.meta.format, r.meta.width, r.meta.height) == ("png", w, h)
            assert r.meta.channels == 3 and r.meta.sample_rate is None
        elif m == 1:
            sr, dur = MM.audio_params(doc_id)
            assert (r.meta.format, r.meta.sample_rate) == ("wav", sr)
            assert r.meta.duration_ms == dur  # exact: sr is a multiple of 1000
        else:
            nf, w, h = MM.video_params(doc_id)
            assert (r.meta.format, r.meta.n_frames, r.meta.width) == ("mvid", nf, w)


def test_decode_metadata_walks_riff_chunks():
    """Review r5: real encoders emit 18-byte fmt chunks (cbSize present)
    or LIST/INFO chunks before `data`; the classic 44-byte fixed offsets
    read those as header fields and report plausible-looking garbage.
    The metadata path must chunk-walk like the sample decoder does."""
    import struct

    def wav(fmt_body: bytes, pre_data: bytes, n_samples: int) -> bytes:
        data = b"\x00\x00" * n_samples
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
            + pre_data
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    fmt16 = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    # 18-byte fmt chunk (cbSize=0) — data size lands at offset 42, not 40
    m = MM._decode_meta_one(wav(fmt16 + b"\x00\x00", b"", 4000))
    assert (m["format"], m["sample_rate"], m["duration_ms"]) == (
        "wav", 8000, 500,
    )
    # LIST/INFO chunk between fmt and data
    lst = b"LIST" + struct.pack("<I", 10) + b"INFOIART42"
    m = MM._decode_meta_one(wav(fmt16, lst, 2000))
    assert (m["format"], m["sample_rate"], m["duration_ms"]) == (
        "wav", 8000, 250,
    )
    # stereo 2-channel: duration divides by the frame size, and the
    # actual channel count is reported instead of a hardcoded 1
    fmt_st = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    m = MM._decode_meta_one(wav(fmt_st, b"", 8000))
    assert (m["channels"], m["duration_ms"]) == (2, 500)
    # truncated data chunk: header-declared duration (ffprobe behavior)
    truncated = wav(fmt16, b"", 4000)[:-7000]
    m = MM._decode_meta_one(truncated)
    assert (m["format"], m["duration_ms"]) == ("wav", 500)
    # compressed tag (IMA ADPCM): bytes/frame != ch*bits/8, so duration
    # must stay NULL instead of a confidently wrong guess
    fmt_adpcm = struct.pack("<HHIIHH", 0x11, 1, 8000, 4055, 256, 4)
    m = MM._decode_meta_one(wav(fmt_adpcm, b"", 2000))
    assert (m["format"], m["sample_rate"], m["duration_ms"]) == (
        "wav", 8000, None,
    )
    # hostile uint32 header fields that overflow the int32 meta schema
    # must degrade to all-NULL, not fail the Arrow batch downstream
    hostile = (
        b"RIFF" + struct.pack("<I", 100) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 1, 2, 2, 16)
        + b"data" + struct.pack("<I", 0xFFFFFFF0)
    )
    assert MM._decode_meta_one(hostile)["format"] is None
    png_huge = (
        MM.PNG_SIG + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">IIBBBBB", 0x80000000, 10, 8, 2, 0, 0, 0)
        + b"\x00\x00\x00\x00"
    )
    assert MM._decode_meta_one(png_huge)["format"] is None


def test_decode_unknown_format_yields_nulls(spark):
    junk = spark.createDataFrame(
        [(1, "image", bytearray(b"not a container at all"))], MM.ASSET_TYPE
    )
    r = MM.decode_metadata(junk).collect()[0]
    assert r.meta.format is None and r.meta.width is None


def test_decode_corrupt_containers_tolerant(spark):
    """ADVICE r4: realistic corrupt payloads must yield all-NULL meta,
    never crash the Arrow batch — one bad asset cannot fail a
    corpus-scale decode stage. Covers: PNG signature but truncated
    before IHDR, WAV with sample_rate=0 (ZeroDivisionError), 12-byte
    RIFF/WAVE header only, truncated MVID, and a NULL payload."""
    import struct as _struct

    wav_sr0 = (
        b"RIFF" + _struct.pack("<I", 36) + b"WAVEfmt "
        + _struct.pack("<IHHIIHH", 16, 1, 1, 0, 0, 2, 16)
        + b"data" + _struct.pack("<I", 4) + b"\x00" * 4
    )
    rows = [
        (1, "image", bytearray(MM.PNG_SIG + b"\x00" * 4)),  # < 24 bytes
        (2, "audio", bytearray(wav_sr0)),  # sample_rate == 0
        (3, "audio", bytearray(b"RIFF\x00\x00\x00\x00WAVE")),  # 12 bytes
        (4, "video", bytearray(MM.MVID_MAGIC + b"\x01\x02")),  # truncated
        (5, "image", None),  # NULL payload
    ]
    # nullable payload schema: ASSET_TYPE declares payload non-null, but
    # a foreign table fed to decode_metadata may not — the decode itself
    # must tolerate the NULL, not crash the batch
    junk = spark.createDataFrame(
        rows, "asset_id long, modality string, payload binary"
    )
    out = {r.asset_id: r.meta for r in MM.decode_metadata(junk).collect()}
    assert len(out) == 5
    for asset_id, meta in out.items():
        assert all(v is None for v in meta.asDict().values()), (
            asset_id,
            meta,
        )


def test_sample_frames_bytes(assets):
    frames = MM.sample_frames(assets, stride=2).collect()
    by_asset: dict[int, list] = {}
    for f in frames:
        by_asset.setdefault(f.asset_id, []).append(f)
    for asset_id, fs in by_asset.items():
        nf, _, _ = MM.video_params(asset_id)
        assert len(fs) == (nf + 1) // 2
        for f in fs:
            assert f.frame_idx % 2 == 0
            expect = bytes((f.frame_idx * 31 + j * 7) % 256
                           for j in range(MM.MVID_FRAME_SIZE))
            assert bytes(f.frame_payload) == expect


def test_resize_rewrites_header_only_for_images(assets):
    out = {r.asset_id: r for r in MM.resize_images(assets, 64, 48).collect()}
    decoded = {r.asset_id: r for r in
               MM.decode_metadata(MM.resize_images(assets, 64, 48)).collect()}
    for asset_id, r in out.items():
        if asset_id % 3 == 0:
            assert (decoded[asset_id].meta.width,
                    decoded[asset_id].meta.height) == (64, 48)
        else:
            assert r.modality in ("audio", "video")  # passthrough


def test_features_deterministic_unit_norm(assets):
    a = {r.asset_id: r.features for r in MM.extract_features(assets, dim=8).collect()}
    b = {r.asset_id: r.features for r in MM.extract_features(assets, dim=8).collect()}
    assert a == b
    for v in a.values():
        assert len(v) == 8
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


class TestDecodePixels:
    def test_valid_png_synthesis_and_exact_pixel_decode(self, spark, docs):
        """pixels=True emits fully valid PNGs; decode_pixels recovers the
        exact deterministic pixel pattern (pillow where installed, the
        pure-stdlib PNG path otherwise — identical output either way)."""
        assets = MM.synthesize_assets(docs, pixels=True)
        out = {
            r.asset_id: r
            for r in MM.decode_pixels(assets).collect()
        }
        n_images = 0
        for asset_id, r in out.items():
            if asset_id % 3 == 0:  # image
                w, h = MM.image_params(asset_id)
                assert (r.width, r.height, r.channels) == (w, h, 3)
                arr = np.frombuffer(bytes(r.pixels), dtype=np.uint8).reshape(
                    h, w, 3
                )
                assert np.array_equal(arr, MM.image_pixels(asset_id, w, h))
                n_images += 1
            else:  # audio/video payloads are not images -> NULL row
                assert r.pixels is None and r.width is None
        assert n_images == 10

    def test_pure_decoder_handles_all_filter_types(self):
        """The stdlib fallback must reconstruct filters 1/2/3/4 (Sub, Up,
        Average, Paeth) per the public PNG spec, not just the filter-0
        scanlines our encoder writes."""
        import struct as st
        import zlib

        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        stride = 5 * 3
        raw = bytearray()
        prev = np.zeros(stride, dtype=np.int64)
        for y in range(6):
            line = arr[y].reshape(-1).astype(np.int64)
            ftype = y % 5
            raw.append(ftype)
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                b = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a
                        if (pa <= pb and pa <= pc)
                        else (b if pb <= pc else c)
                    )
                raw.append((line[i] - pred) % 256)
            prev = line

        def chunk(tag, data):
            return (
                st.pack(">I", len(data))
                + tag
                + data
                + st.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        png = (
            MM.PNG_SIG
            + chunk(b"IHDR", st.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        got = MM._png_decode_pure(png)
        assert got is not None and np.array_equal(got, arr)

    def test_undecodable_payload_yields_null_not_failure(self, spark):
        junk = spark.createDataFrame(
            [(1, "image", bytearray(b"not an image"))], MM.ASSET_TYPE
        )
        r = MM.decode_pixels(junk).collect()[0]
        assert r.pixels is None and r.width is None

    def test_header_only_png_yields_null(self, spark, docs):
        """The oracle-friendly header-only PNGs (no IDAT) are not
        decodable images; decode_pixels must NULL them, not crash."""
        assets = MM.synthesize_assets(docs)  # default: header-only
        out = MM.decode_pixels(assets).filter("asset_id % 3 = 0").collect()
        assert len(out) == 10
        assert all(r.pixels is None for r in out)


class TestImageNearDup:
    """Perceptual dHash + the shared banded-Hamming machinery."""

    @staticmethod
    def _png_asset(spark, rows):
        return spark.createDataFrame(rows, "asset_id long, payload binary")

    def test_copies_and_variants_found(self, spark):
        base = MM.image_pixels(3, 24, 16)
        tweaked = base.copy()
        tweaked[0, 0, :] = 255 - tweaked[0, 0, :]  # one pixel flipped
        # image_pixels only phase-shifts ONE gradient pattern across
        # doc_ids — perceptually those are all the same image (and
        # dHash correctly says so), so the "different" image must be
        # structurally different, not another phase of the gradient
        other = np.random.default_rng(42).integers(
            0, 256, size=(16, 24, 3)
        ).astype(np.uint8)
        rows = [
            (1, MM._png_encode_pixels(base)),
            (2, MM._png_encode_pixels(base)),      # exact copy
            (3, MM._png_encode_pixels(tweaked)),   # near copy
            (4, MM._png_encode_pixels(other)),     # different image
        ]
        assets = self._png_asset(spark, rows)
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in MM.image_near_pairs(assets, max_hamming=5).collect()
        }
        assert pairs.get((1, 2)) == 0            # exact copy: hamming 0
        assert (1, 3) in pairs and pairs[(1, 3)] <= 5
        assert not any(4 in p for p in pairs)    # distinct image absent

    def test_dhash_deterministic_drops_undecodable(self, spark):
        base = MM.image_pixels(6, 24, 16)
        assets = self._png_asset(
            spark,
            [(1, MM._png_encode_pixels(base)), (2, b"not an image")],
        )
        a = sorted(map(tuple, MM.image_dhash(assets).collect()))
        b = sorted(map(tuple, MM.image_dhash(assets).collect()))
        assert a == b
        assert [r[0] for r in a] == [1]  # undecodable row dropped
        # words fit the 32-bit layout hamming_near_pairs shifts over
        assert all(0 <= r[1] < (1 << 32) and 0 <= r[2] < (1 << 32) for r in a)


class TestAudioNearDup:
    """Energy-envelope fingerprints on the shared Hamming machinery."""

    @staticmethod
    def _wav(samples):
        import struct

        body = samples.astype("<i2").tobytes()
        return MM._wav_bytes(8000, len(samples), body)

    def test_copies_gain_and_distinct(self, spark):
        rng = np.random.default_rng(7)
        # structured signal: rising bursts -> distinctive envelope
        t = np.arange(8000)
        sig = (
            np.sin(t / 40.0) * (1 + (t // 1000) % 4) * 2000
        ).astype(np.int64)
        gain = (sig * 1.5).clip(-32768, 32767)  # louder copy
        other = (rng.standard_normal(8000) * 8000).clip(-32768, 32767)
        assets = spark.createDataFrame(
            [
                (1, self._wav(sig)),
                (2, self._wav(sig)),          # exact copy
                (3, self._wav(gain)),         # gain-changed copy
                (4, self._wav(other)),        # different audio
                (5, b"not a wav"),
            ],
            "asset_id long, payload binary",
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in MM.audio_near_pairs(assets, max_hamming=5).collect()
        }
        assert pairs.get((1, 2)) == 0
        assert (1, 3) in pairs and pairs[(1, 3)] <= 5
        assert not any(4 in p or 5 in p for p in pairs)

    def test_fingerprint_drops_short_and_nonwav(self, spark):
        assets = spark.createDataFrame(
            [
                (1, self._wav(np.zeros(10))),   # too short
                (2, b"RIFFxxxxWAVE"),            # truncated header
            ],
            "asset_id long, payload binary",
        )
        assert MM.audio_fingerprint(assets).count() == 0


class TestVideoNearDup:
    """Temporal-envelope fingerprints on the shared Hamming machinery."""

    @staticmethod
    def _mvid(frame_means):
        import struct as st

        n, fs = len(frame_means), 16
        head = MM.MVID_MAGIC + st.pack("<IIII", n, fs, 4, 4)
        body = b"".join(
            bytes([int(m) % 256] * fs) for m in frame_means
        )
        return head + body

    def test_copies_variants_distinct(self, spark):
        rng = np.random.default_rng(11)
        env = (np.sin(np.arange(200) / 7.0) * 100 + 120).astype(int)
        tweak = env.copy()
        tweak[5] += 30  # one frame brightness glitch
        other = rng.integers(0, 256, size=200)
        assets = spark.createDataFrame(
            [
                (1, self._mvid(env)),
                (2, self._mvid(env)),      # exact copy
                (3, self._mvid(tweak)),    # near copy
                (4, self._mvid(other)),    # different video
                (5, b"AVI?whatever"),      # not MVID
            ],
            "asset_id long, payload binary",
        )
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in MM.video_near_pairs(assets, max_hamming=5).collect()
        }
        assert pairs.get((1, 2)) == 0
        assert (1, 3) in pairs and pairs[(1, 3)] <= 5
        assert not any(4 in p or 5 in p for p in pairs)

    def test_single_frame_dropped(self, spark):
        assets = spark.createDataFrame(
            [(1, self._mvid([100]))], "asset_id long, payload binary"
        )
        assert MM.video_fingerprint(assets).count() == 0


class TestFingerprintReviewFixes:
    def test_null_payload_dropped_in_all_fingerprints(self, spark):
        df = spark.createDataFrame(
            [(1, None)], "asset_id long, payload binary"
        )
        assert MM.image_dhash(df).count() == 0
        assert MM.audio_fingerprint(df).count() == 0
        assert MM.video_fingerprint(df).count() == 0

    def test_wav_chunk_walk_and_mixdown(self, spark):
        import struct as st

        import numpy as np

        sig = (np.sin(np.arange(8000) / 40.0) * 8000).astype("<i2")
        canonical = MM._wav_bytes(8000, len(sig), sig.tobytes())
        # 18-byte fmt chunk (cbSize=0) + a LIST chunk before data —
        # the layout real encoders emit; a 44-byte-offset reader would
        # fingerprint garbage here
        fmt18 = st.pack("<HHIIHHH", 1, 1, 8000, 16000, 2, 16, 0)
        extended = (
            b"RIFF" + st.pack("<I", 0) + b"WAVE"
            + b"fmt " + st.pack("<I", 18) + fmt18
            + b"LIST" + st.pack("<I", 4) + b"INFO"
            + b"data" + st.pack("<I", len(sig) * 2) + sig.tobytes()
        )
        fa = MM._audio_fingerprint_one(canonical)
        fb = MM._audio_fingerprint_one(extended)
        assert fa is not None and fa == fb
        # stereo: both channels = the signal -> mixdown equals mono
        stereo_sig = np.repeat(sig, 2).astype("<i2")
        stereo = (
            b"RIFF" + st.pack("<I", 0) + b"WAVE"
            + b"fmt " + st.pack("<I", 16)
            + st.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
            + b"data" + st.pack("<I", len(stereo_sig) * 2)
            + stereo_sig.tobytes()
        )
        assert MM._audio_fingerprint_one(stereo) == fa
        # non-PCM (format tag 3 = float) -> dropped, not garbage
        f32 = extended.replace(
            st.pack("<HHIIHHH", 1, 1, 8000, 16000, 2, 16, 0),
            st.pack("<HHIIHHH", 3, 1, 8000, 16000, 2, 16, 0),
        )
        assert MM._audio_fingerprint_one(f32) is None

    def test_rgba_and_rgb_hash_identically(self):
        import numpy as np

        rng = np.random.default_rng(21)
        rgb = rng.integers(0, 256, size=(16, 24, 3)).astype(np.uint8)
        alpha = rng.integers(0, 256, size=(16, 24, 1)).astype(np.uint8)
        rgba = np.concatenate([rgb, alpha], axis=2)
        # alpha must not leak into the hash: the pillow path strips it,
        # the pure-PNG path keeps it — both must agree
        assert MM._dhash_one(rgb) == MM._dhash_one(rgba)


class TestRealCodecFallback:
    """VERDICT r4 item 2: real-codec payloads reach the perceptual gates
    when PyAV is installed; posture unchanged (drop, never crash) when
    it is absent. The encode-side fixtures need the codec lib too, so
    those tests importorskip."""

    def test_posture_without_codec_lib(self, spark):
        # an MP3-looking payload (ID3 magic) with no codec lib present:
        # every fingerprint path must DROP the row, not crash the batch
        fake_mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + b"\xff\xfb" * 64
        df = spark.createDataFrame(
            [(1, "audio", bytearray(fake_mp3))], MM.ASSET_TYPE
        )
        try:
            import av  # noqa: F401

            # with PyAV present this payload is undecodable junk anyway
        except ImportError:
            pass
        assert MM.audio_fingerprint(df).count() == 0
        assert MM.video_fingerprint(df).count() == 0
        assert MM.image_dhash(df).count() == 0

    def test_av_audio_fingerprint_real_codec(self, spark):
        av = __import__("pytest").importorskip("av")
        import io

        import numpy as np

        # a 1 s 8 kHz tone-sweep WAV and its MP3 transcode must land in
        # the same fingerprint space with small Hamming distance
        sr, n = 8000, 8000
        t = np.arange(n) / sr
        pcm = (
            np.sin(2 * np.pi * (200 + 400 * t) * t) * 20000
        ).astype("<i2")
        wav = MM._wav_bytes(sr, n, pcm.tobytes())

        buf = io.BytesIO()
        out = av.open(buf, "w", format="mp3")
        stream = out.add_stream("mp3", rate=sr)
        frame = av.AudioFrame.from_ndarray(
            pcm.reshape(1, -1), format="s16", layout="mono"
        )
        frame.sample_rate = sr
        for pkt in stream.encode(frame):
            out.mux(pkt)
        for pkt in stream.encode(None):
            out.mux(pkt)
        out.close()
        mp3 = buf.getvalue()

        fp_wav = MM._audio_fingerprint_one(wav)
        fp_mp3 = MM._audio_fingerprint_one(mp3)
        assert fp_wav is not None and fp_mp3 is not None
        ham = bin(
            (fp_wav[0] ^ fp_mp3[0]) | ((fp_wav[1] ^ fp_mp3[1]) << 32)
        ).count("1")
        assert ham <= 8  # lossy transcode, same energy envelope

    def test_av_video_fingerprint_real_codec(self, spark):
        av = __import__("pytest").importorskip("av")
        import io

        import numpy as np

        buf = io.BytesIO()
        out = av.open(buf, "w", format="mp4")
        stream = out.add_stream("h264", rate=10)
        stream.width, stream.height = 64, 64
        stream.pix_fmt = "yuv420p"
        for i in range(24):  # brightness ramps up then down
            level = 40 + (i * 16 if i < 12 else (24 - i) * 16)
            img = np.full((64, 64, 3), min(level, 255), dtype=np.uint8)
            frame = av.VideoFrame.from_ndarray(img, format="rgb24")
            for pkt in stream.encode(frame):
                out.mux(pkt)
        for pkt in stream.encode(None):
            out.mux(pkt)
        out.close()
        fp = MM._video_fingerprint_one(buf.getvalue())
        assert fp is not None  # decoded via the PyAV fallback

    def test_av_jpeg_pixels(self, spark):
        av = __import__("pytest").importorskip("av")
        try:
            import PIL  # noqa: F401

            __import__("pytest").skip("pillow present: PIL path wins")
        except ImportError:
            pass
        import io

        import numpy as np

        buf = io.BytesIO()
        out = av.open(buf, "w", format="image2", options={})
        stream = out.add_stream("mjpeg")
        stream.width, stream.height = 32, 24
        stream.pix_fmt = "yuvj420p"
        img = MM.image_pixels(7, 32, 24)
        frame = av.VideoFrame.from_ndarray(img, format="rgb24")
        for pkt in stream.encode(frame):
            out.mux(pkt)
        for pkt in stream.encode(None):
            out.mux(pkt)
        out.close()
        arr = MM._decode_pixels_one(buf.getvalue())
        assert arr is not None and arr.shape == (24, 32, 3)
        # lossy JPEG: demand closeness, not equality
        assert float(np.abs(arr.astype(int) - img.astype(int)).mean()) < 24


class TestUniquePixels:
    """Round 10 (VERDICT r9 item 6): the aperiodic pixel mode for
    store-depth scale measurements — the default formula is periodic
    in doc_id mod 3840, so scaled corpora saturated at ~1.2k distinct
    images."""

    def test_unique_mode_is_deterministic_and_aperiodic(self):
        from s3_access_logs_spark.operators.multimodal import image_pixels

        a = image_pixels(7, 16, 16, unique=True)
        b = image_pixels(7, 16, 16, unique=True)
        assert (a == b).all()  # deterministic in doc_id
        # the formula's period: id and id+3840 give IDENTICAL formula
        # images but DISTINCT unique-mode images
        f1 = image_pixels(7, 16, 16)
        f2 = image_pixels(7 + 3840, 16, 16)
        assert (f1 == f2).all()
        u2 = image_pixels(7 + 3840, 16, 16, unique=True)
        assert not (a == u2).all()
        # negative ids (dirty sweeps) must seed, not crash
        image_pixels(-5, 8, 8, unique=True)

    def test_synthesize_assets_unique_requires_pixels(self, spark):
        from s3_access_logs_spark.operators.multimodal import (
            decode_pixels,
            image_pixels,
            synthesize_assets,
        )

        docs = spark.createDataFrame(
            [(i * 3, f"text {i}") for i in range(4)],
            "doc_id long, text string",
        )
        with pytest.raises(ValueError, match="unique_pixels"):
            synthesize_assets(docs, pixels=False, unique_pixels=True)
        assets = synthesize_assets(docs, pixels=True, unique_pixels=True)
        dec = decode_pixels(assets).collect()
        import numpy as np

        for r in dec:
            if r.pixels is None:
                continue
            w = r.width
            h = r.height
            got = np.frombuffer(
                bytes(r.pixels), dtype=np.uint8
            ).reshape(h, w, 3)
            want = image_pixels(r.asset_id, w, h, unique=True)
            assert (got == want).all(), r.asset_id
