"""Image codec + pipeline tests — the per-row invariant of
BASELINE.json input_hint: lossless allclose / lossy PSNR ≥ 40 dB +
caption equality."""

import numpy as np
import pytest

from eo_tools_spark.functions import imaging as IM


def random_img(seed, h=64, w=80):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


class TestCodecs:
    def test_png_roundtrip_filter0(self):
        img = random_img(1)
        assert np.array_equal(IM.png_decode(IM.png_encode(img, 0)), img)

    def test_png_roundtrip_filter2(self):
        img = random_img(2)
        assert np.array_equal(IM.png_decode(IM.png_encode(img, 2)), img)

    def test_png_rgb(self):
        img = np.random.default_rng(3).integers(0, 256, (32, 48, 3), dtype=np.uint8)
        assert np.array_equal(IM.png_decode(IM.png_encode(img, 2)), img)

    def test_png_smooth_compresses(self):
        yy, xx = np.mgrid[0:128, 0:128]
        img = (128 + 60 * np.sin(xx * 0.1)).astype(np.uint8)
        data = IM.png_encode(img, filter_type=2)
        assert len(data) < img.size / 4  # up-filter + zlib on smooth data

    def test_raw_roundtrip(self):
        img = random_img(4)
        assert np.array_equal(IM.raw_decode(IM.raw_encode(img), 80, 64), img)

    def test_qjpg_psnr_over_40(self):
        img = random_img(5, 128, 128)
        dec = IM.qjpg_decode(IM.qjpg_encode(img), 128, 128)
        assert IM.psnr(img, dec) >= 40.0
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    def test_png_decode_foreign_filters_1_3_4(self):
        """Decoder must reconstruct spec-compliant PNGs using Sub(1),
        Average(3) and Paeth(4) filters — built by hand since our
        encoder only emits 0/2 (foreign-PNG interop path)."""
        import struct
        import zlib

        from eo_tools_spark.functions.imaging import PNG_SIG, _chunk

        rng = np.random.default_rng(77)
        img = rng.integers(0, 256, (6, 8), dtype=np.uint8)
        h, w = img.shape

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        # forward-filter each row with its per-row filter type
        ftypes = [1, 3, 4, 1, 3, 4]
        out = bytearray()
        prev = np.zeros(w, dtype=int)
        for y in range(h):
            f = ftypes[y]
            cur = img[y].astype(int)
            out.append(f)
            for x in range(w):
                left = cur[x - 1] if x > 0 else 0
                up = prev[x]
                ul = prev[x - 1] if x > 0 else 0
                if f == 1:
                    val = (cur[x] - left) % 256
                elif f == 3:
                    val = (cur[x] - (left + up) // 2) % 256
                else:
                    val = (cur[x] - paeth(left, up, ul)) % 256
                out.append(val)
            prev = cur
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        data = (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b"")
        )
        got = IM.png_decode(data)
        np.testing.assert_array_equal(got, img)

    def test_audio_stub_raises(self):
        with pytest.raises(NotImplementedError):
            IM.decode_image(b"xx", "audio", 1, 1)


class TestHashResize:
    def test_phash_deterministic_and_locality(self):
        img = random_img(6, 64, 64)
        h1 = IM.average_hash(img)
        assert h1 == IM.average_hash(img.copy())
        # tiny noise → small hamming distance
        noisy = np.clip(img.astype(int) + np.random.default_rng(7).integers(-2, 3, img.shape), 0, 255).astype(np.uint8)
        d = bin((h1 ^ IM.average_hash(noisy)) & (2**64 - 1)).count("1")
        assert d <= 8
        # different image → large distance
        d2 = bin((h1 ^ IM.average_hash(random_img(99, 64, 64))) & (2**64 - 1)).count("1")
        assert d2 > 10

    def test_resize_shapes(self):
        img = random_img(8, 100, 60)
        assert IM.resize_nearest(img, 32, 32).shape == (32, 32)
        assert IM.resize_bilinear(img, 32, 32).shape == (32, 32)

    def test_bilinear_identity(self):
        img = random_img(9, 40, 40)
        assert np.array_equal(IM.resize_bilinear(img, 40, 40), img)


class TestImageTable:
    def test_generator_deterministic_across_partitioning(self, spark):
        from eo_tools_spark.sources.synthetic import images_table

        a = images_table(spark, 60, partitions=2).toPandas().sort_values("image_id")
        b = images_table(spark, 60, partitions=8).toPandas().sort_values("image_id")
        assert list(a.image_id) == list(b.image_id)
        for x, y in zip(a.itertuples(), b.itertuples()):
            assert bytes(x.bytes) == bytes(y.bytes)
            assert x.phash == y.phash and x.caption == y.caption

    def test_roundtrip_invariant_all_rows(self, spark):
        from eo_tools_spark.operators.image_pipeline import verify_roundtrip
        from eo_tools_spark.sources.synthetic import images_table

        imgs = images_table(spark, 90, partitions=4)
        res = verify_roundtrip(imgs).toPandas()
        assert len(res) == 90
        assert res.pixels_ok.all() and res.caption_ok.all()
        lossy = res[res.fmt == "qjpg"]
        assert (lossy.psnr >= 40.0).all()
        lossless = res[res.fmt != "qjpg"]
        assert (lossless.psnr >= 999.0).all()  # exact

    def test_decode_stats_phash_matches_stored(self, spark):
        from eo_tools_spark.operators.image_pipeline import decode_stats
        from eo_tools_spark.sources.synthetic import images_table

        imgs = images_table(spark, 30, partitions=2)
        joined = decode_stats(imgs).join(imgs.select("image_id", "phash", "fmt"), "image_id")
        pdf = joined.toPandas()
        lossless = pdf[pdf.fmt != "qjpg"]
        assert (lossless.phash2 == lossless.phash).all()
        # lossy phash may differ slightly but by few bits
        for r in pdf[pdf.fmt == "qjpg"].itertuples():
            d = bin((r.phash ^ r.phash2) & (2**64 - 1)).count("1")
            assert d <= 4

    def test_thumbnails(self, spark):
        from eo_tools_spark.operators.image_pipeline import thumbnails
        from eo_tools_spark.sources.synthetic import images_table

        t = thumbnails(images_table(spark, 12, partitions=2)).toPandas()
        assert len(t) == 12
        assert all(len(r.thumb) == 32 * 32 for r in t.itertuples())

    def test_phash_neardup_finds_self_similar(self, spark):
        from eo_tools_spark.operators.image_pipeline import phash_neardup
        from eo_tools_spark.sources.synthetic import images_table

        from pyspark.sql import functions as F

        imgs = images_table(spark, 100, partitions=4)
        # duplicate rows with new ids → hamming 0 pairs must be found
        dup = imgs.limit(10).withColumn("image_id", F.concat(F.lit("dup-"), imgs.image_id))
        both = imgs.union(dup)
        pairs = phash_neardup(both, max_hamming=3).toPandas()
        zero = pairs[pairs.hamming == 0]
        assert len(zero) >= 10

    def test_frame_sample_real_avi(self, spark):
        """The de-stubbed multimodal path (round-4 verdict task 3):
        REAL uncompressed-AVI container bytes decoded distributed; every
        sampled frame must equal the generator's source frames exactly."""
        import numpy as np

        from eo_tools_spark.operators.image_pipeline import frame_sample
        from eo_tools_spark.sources.synthetic import make_video, media_table

        media = media_table(spark, n_video=8, n_audio=0)
        out = frame_sample(media, every_n=2).toPandas()
        assert len(out) > 0
        for r in out.itertuples():
            i = int(r.media_id.split("-")[1])
            src = make_video(i)[-1]
            f = np.frombuffer(r.frame, dtype=np.uint8).reshape(r.fh, r.fw, 3)
            assert np.array_equal(f, src[r.frame_idx])
            assert r.f_mean == float(int(src[r.frame_idx].sum())) / src[r.frame_idx].size
        # every_n sampling: frame indices are 0, 2, 4, ...
        assert set(out.frame_idx % 2) == {0}

    def test_audio_stats_real_wav(self, spark):
        import numpy as np

        from eo_tools_spark.operators.image_pipeline import audio_stats
        from eo_tools_spark.sources.synthetic import make_audio, media_table

        media = media_table(spark, n_video=0, n_audio=6)
        out = audio_stats(media).toPandas()
        assert len(out) == 6
        for r in out.itertuples():
            i = int(r.media_id.split("-")[1])
            s = make_audio(i)[-1].astype(np.int64)
            assert r.n_samples == len(s) and r.rate == 8000
            assert r.sum_s == int(s.sum()) and r.sum_sq == int((s * s).sum())
            assert r.peak == int(np.abs(s).max())

    def test_unknown_media_format_raises(self, spark):
        """Honest contract: formats without a codec raise loudly."""
        import pandas as pd

        from eo_tools_spark.operators.image_pipeline import (
            audio_stats,
            frame_sample,
        )

        media = spark.createDataFrame(
            pd.DataFrame(
                {"media_id": ["v1"], "fmt": ["mkv"], "bytes": [b"\0" * 64]}
            )
        )
        with pytest.raises(Exception, match="mkv"):
            frame_sample(media).collect()
        with pytest.raises(Exception, match="mkv"):
            audio_stats(media).collect()
        # mp4 is now decodable — garbage bytes must raise the parser's
        # loud ValueError, not silently pass
        bad_mp4 = spark.createDataFrame(
            pd.DataFrame(
                {"media_id": ["v2"], "fmt": ["mp4"], "bytes": [b"\0" * 64]}
            )
        )
        with pytest.raises(Exception, match="ISO BMFF"):
            frame_sample(bad_mp4).collect()


class TestMixedMediaRouting:
    def test_media_kind_routes_a_mixed_table(self, spark):
        """fmt alone is ambiguous (MP4 carries both kinds) — media_kind
        splits a mixed table so both operators decode every row of
        their kind, including the MP4 ones."""
        from eo_tools_spark.operators.image_pipeline import (
            audio_stats,
            frame_sample,
        )
        from eo_tools_spark.sources.synthetic import media_table

        media = media_table(spark, n_video=8, n_audio=6)
        vids = frame_sample(media.where("media_kind = 'video'")).toPandas()
        auds = audio_stats(media.where("media_kind = 'audio'")).toPandas()
        assert set(vids.media_id.str[:4]) == {"vid-"} and len(vids) > 0
        assert set(auds.media_id.str[:4]) == {"aud-"} and len(auds) == 6

    def test_wrong_kind_mp4_fails_loudly(self, spark):
        """An MP4 audio row through frame_sample (and vice versa) must
        raise the track-routing error, never return wrong rows."""
        from eo_tools_spark.operators.image_pipeline import (
            audio_stats,
            frame_sample,
        )
        from eo_tools_spark.sources.synthetic import media_table

        media = media_table(spark, n_video=8, n_audio=6)
        mp4_audio = media.where("media_kind = 'audio' AND fmt = 'mp4'")
        assert mp4_audio.count() > 0
        with pytest.raises(Exception, match="no video track"):
            frame_sample(mp4_audio).collect()
        mp4_video = media.where("media_kind = 'video' AND fmt = 'mp4'")
        assert mp4_video.count() > 0
        with pytest.raises(Exception, match="no audio track"):
            audio_stats(mp4_video).collect()
