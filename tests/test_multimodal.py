"""Real media decode (round 4): the PPM/WAV parsers against
hand-written literal files (decoder independence from the fixture
generator), synth→decode roundtrips against analytic expectations, and
the Spark extract path end to end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from engine import multimodal as mm


def test_decode_ppm_handwritten_literal():
    # 2x2 RGB image written by hand, with a header comment
    payload = b"P6\n# test\n2 2\n255\n" + bytes(
        [255, 0, 0,  0, 255, 0,
         0, 0, 255,  10, 20, 30]
    )
    w, h, px = mm.decode_ppm(payload)
    assert (w, h) == (2, 2)
    assert px.shape == (2, 2, 3)
    assert tuple(px[0, 0]) == (255, 0, 0)
    assert tuple(px[1, 1]) == (10, 20, 30)


def test_decode_wav_handwritten_literal():
    samples = np.array([0, 100, -100, 32767, -32768], dtype="<i2")
    body = samples.tobytes()
    payload = (
        b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16)
        + b"data" + struct.pack("<I", len(body)) + body
    )
    rate, ch, got = mm.decode_wav(payload)
    assert (rate, ch) == (44100, 1)
    np.testing.assert_array_equal(got, samples)


def test_decode_rejects_malformed():
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P5\n2 2\n255\n" + b"\0" * 4)   # not P6
    with pytest.raises(ValueError):
        mm.decode_ppm(b"P6\n4 4\n255\n" + b"\0" * 5)   # truncated
    with pytest.raises(ValueError):
        mm.decode_wav(b"RIFX" + b"\0" * 40)            # wrong magic
    with pytest.raises(ValueError):
        mm.decode_wav(
            b"RIFF" + struct.pack("<I", 4) + b"WAVE"
        )                                              # no fmt/data
    with pytest.raises(ValueError, match="mono"):
        body = np.zeros(8, dtype="<i2").tobytes()      # stereo: the
        mm.decode_wav(                                 # pinned mono
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 176400, 4, 16)
            + b"data" + struct.pack("<I", len(body)) + body
        )                                              # features can't
                                                       # represent it


def test_synth_roundtrip_matches_generator_params():
    """decode(synth(ref)) must reproduce the md5-derived dimensions and
    the analytic ramp sums — the same arithmetic the oracle mirrors."""
    import hashlib

    for ref in ("img:abc", "img:0123456789ab"):
        h = hashlib.md5(ref.encode()).digest()
        w_want = 4 + h[0] % 13
        h_want = 3 + h[1] % 11
        w, hh, px = mm.decode_ppm(mm.synth_payload("image", ref))
        assert (w, hh) == (w_want, h_want)
        m = np.arange(3 * w * hh)
        want = ((h[3] + 5 * m) % 256).reshape(hh, w, 3)
        np.testing.assert_array_equal(px, want)
    for ref in ("aud:xyz", "aud:0123456789ab"):
        h = hashlib.md5(ref.encode()).digest()
        n_want = 64 + h[4] % 64
        rate, ch, s = mm.decode_wav(mm.synth_payload("audio", ref))
        assert (rate, ch, len(s)) == (8000, 1, n_want)
        k = np.arange(n_want)
        want = ((h[5] * 256 + h[6] + 11 * k) % 4096) - 2048
        np.testing.assert_array_equal(s, want)


def test_extract_media_features_spark(spark):
    """End to end through the Spark plumbing: spans explode, payload
    synthesis, real decode — checked against a local decode of the
    same synthesized bytes."""
    import pandas as pd

    rows = [
        ("d1", [("text", "hello", "", 0), ("image", "", "img:aaaa", 1),
                ("audio", "", "aud:bbbb", 2)]),
        ("d2", [("image", "", "img:cccc", 0)]),
        ("d3", [("text", "no media", "", 0)]),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [r[0] for r in rows],
            "spans": [
                [{"kind": k, "text": t, "media_ref": m, "offset": o}
                 for k, t, m, o in r[1]]
                for r in rows
            ],
        }),
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    got = (
        mm.extract_media_features(docs, kinds=("image", "audio"))
        .toPandas()
        .set_index("media_ref")
        .sort_index()
    )
    assert set(got.index) == {"img:aaaa", "img:cccc", "aud:bbbb"}
    w, h, px = mm.decode_ppm(mm.synth_payload("image", "img:aaaa"))
    r = got.loc["img:aaaa"]
    assert (r.width, r.height, r.n_frames) == (w, h, 1)
    mean_r = px.reshape(-1, 3)[:, 0].sum() / (w * h)
    np.testing.assert_allclose(
        r.feat[0], np.float32(mean_r / 255.0), rtol=0, atol=0
    )
    rate, ch, s = mm.decode_wav(mm.synth_payload("audio", "aud:bbbb"))
    r = got.loc["aud:bbbb"]
    assert (r.width, r.height, r.n_frames) == (8000, 1, len(s))
    np.testing.assert_allclose(
        r.feat[1], np.float32(len(s) / 4096.0), rtol=0, atol=0
    )


def test_payload_column_decoded_as_is(spark):
    """A docs table WITH a binary payload column (production layout) is
    decoded verbatim — never overridden by the fixture synthesizer."""
    import pandas as pd

    payload = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 50, 60, 70])
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["d1"],
                "spans": [[{"kind": "image", "text": "",
                            "media_ref": "img:whatever", "offset": 0}]],
                "payload": [payload],
            }
        ),
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, payload binary",
    )
    rows = mm.extract_media_features(docs, kinds=("image",)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.n_frames) == (2, 1, 1)
    # means of the HANDWRITTEN bytes, not anything md5-derived
    np.testing.assert_allclose(
        r.feat[0:3],
        [np.float32((10 + 50) / 2 / 255.0), np.float32((20 + 60) / 2 / 255.0),
         np.float32((30 + 70) / 2 / 255.0)],
    )
