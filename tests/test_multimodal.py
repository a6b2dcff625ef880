"""Multimodal binary-column operators: real resize/frame-sample/audio
paths verified against numpy ground truth; unsupported codecs fail loudly
at the decode registry with the Spark plumbing intact."""

import numpy as np
import pandas as pd
import pytest

from profet_spark import fixtures, imaging
from profet_spark.functions import multimodal as mm


@pytest.fixture(scope="module")
def img_df(spark):
    pdf = fixtures.make_fixture(n_entities=6, img_sizes=(16, 32))
    return fixtures.to_spark(spark, pdf), pdf


def test_resize_images_exact(spark, img_df):
    df, pdf = img_df
    out = mm.resize_images(df.select("image_id", "ts", "bytes", "w", "h", "fmt"),
                           8, 8).toPandas()
    assert (out["w"] == 8).all() and (out["h"] == 8).all()
    assert (out["fmt"] == "ppm").all()
    src = pdf.set_index(["image_id", "ts"])
    for _, r in out.iterrows():
        orig = imaging.decode(bytes(src.loc[(r.image_id, r.ts)]["bytes"]),
                              src.loc[(r.image_id, r.ts)]["fmt"])
        want = mm._resize_nn(orig, 8, 8)
        got = imaging.decode(bytes(r.bytes), "ppm")
        assert np.array_equal(got, want)


def test_sample_video_frames_roundtrip(spark):
    rng = np.random.default_rng(7)
    rows = []
    for vid in range(3):
        frames = [rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
                  for _ in range(5)]
        rows.append({"video_id": f"v{vid}", "fmt": "rawvid",
                     "video": mm.encode_rawvid(frames), "frames": frames})
    df = spark.createDataFrame(
        pd.DataFrame([{k: r[k] for k in ("video_id", "fmt", "video")} for r in rows]))
    out = mm.sample_video_frames(df, every_n=2).toPandas()
    # 5 frames, every 2nd -> indices 0,2,4 per video
    assert sorted(out["frame_idx"].unique().tolist()) == [0, 2, 4]
    assert len(out) == 9
    by_key = {(r.video_id, r.frame_idx): bytes(r.frame_bytes)
              for r in out.itertuples()}
    for r in rows:
        for i in (0, 2, 4):
            got = imaging.decode(by_key[(r["video_id"], i)], "ppm")
            assert np.array_equal(got, r["frames"][i])


def test_video_unknown_codec_fails_loudly(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"video_id": ["x"], "fmt": ["mp4"], "video": [b"\x00\x01"]}))
    with pytest.raises(Exception, match="NotImplementedError|mp4"):
        mm.sample_video_frames(df, every_n=1).collect()


def test_audio_features_wav(spark):
    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = (10_000 * np.sin(2 * np.pi * 440 * t / rate))
    blob = mm.encode_wav_pcm16(sine, rate)
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["a1"], "fmt": ["wav"], "audio": [blob]}))
    out = mm.add_audio_features(df).toPandas().iloc[0]
    s = np.clip(sine, -32768, 32767).astype("<i2").astype(np.float64)
    assert out.duration_s == pytest.approx(1.0)
    assert out.rms == pytest.approx(float(np.sqrt((s * s).sum() / len(s))), rel=1e-12)
    assert out.peak == float(np.abs(s).max())
    want_zcr = float((np.signbit(s[1:]) != np.signbit(s[:-1])).sum() / (len(s) - 1))
    assert out.zcr == pytest.approx(want_zcr, rel=1e-12)


def test_audio_unknown_codec_fails_loudly(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"audio_id": ["x"], "fmt": ["mp3"], "audio": [b"\x00"]}))
    with pytest.raises(Exception, match="NotImplementedError|mp3"):
        mm.add_audio_features(df).collect()


def test_null_payload_raises_named_error(spark):
    """bytes(None) used to surface as an opaque TypeError deep in the
    worker; the kernels now name the function and the remedy."""
    import pandas as pd
    import pytest
    from profet_spark.functions import multimodal as mm

    df = spark.createDataFrame(
        pd.DataFrame({"video_id": [1], "video": [None], "fmt": ["rawvid"]}))
    with pytest.raises(Exception, match="NULL payload bytes"):
        mm.sample_video_frames(df).count()
    adf = spark.createDataFrame(
        pd.DataFrame({"aid": [1], "audio": [None], "fmt": ["wav"]}))
    with pytest.raises(Exception, match="NULL payload bytes"):
        mm.add_audio_features(adf, bytes_col="audio").count()
