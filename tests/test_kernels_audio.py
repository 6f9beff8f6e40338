"""V5/V6 audio kernels (reference tasks.py:467-603, views.py:396-409):
from-scratch RIFF/WAV parse/write/resample/mixdown and the ID3v2.4
retag, replacing the reference's ffmpeg/eyed3 subprocess layer."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from doctor_spark.kernels.audio import (
    WavError,
    audio_duration_sec,
    best_case_name,
    make_id3v2,
    mixdown_mono,
    parse_id3v2,
    parse_wav,
    remove_id3,
    resample_linear,
    set_audio_metadata,
    transcode_wav,
    transcode_wav_voip,
    write_wav,
)

AUDIO_DATA = {
    "court_full_name": "Testing Supreme Court",
    "court_short_name": "Testing Supreme Court",
    "court_pk": "mad",
    "court_url": "http://www.example.com/",
    "docket_number": "docket number 1 005",
    "date_argued": "2020-01-01",
    "date_argued_year": "2020",
    "case_name": "SEC v. Frank J. Custable, Jr.",
    "case_name_full": "case name full",
    "case_name_short": "short",
    "download_url": "http://media.example.gov/x.mp3",
}


def _stereo_wav(rate=44100, n=None):
    n = n or rate
    t = np.arange(n)
    left = (np.sin(2 * np.pi * 440 * t / rate) * 12000).astype(np.int16)
    right = (np.sin(2 * np.pi * 220 * t / rate) * 9000).astype(np.int16)
    return write_wav(rate, np.stack([left, right], axis=1)), left, right


class TestRiffRoundtrip:
    def test_pcm16_stereo_exact(self):
        wav, left, right = _stereo_wav()
        rate, x = parse_wav(wav)
        assert rate == 44100 and x.shape == (44100, 2)
        assert (x[:, 0] == left).all() and (x[:, 1] == right).all()

    def test_pcm8_centers_unsigned(self):
        pay = np.array([0, 128, 255], dtype=np.uint8)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        wav = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 3) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 3) + pay.tobytes()
        )
        _, x = parse_wav(wav)
        assert x[:, 0].tolist() == [-32768, 0, 32512]

    def test_float32_full_scale(self):
        f = np.array([0.0, 0.5, -1.0, 2.0], dtype=np.float32)  # 2.0 clips
        fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        wav = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + 16) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 16) + f.tobytes()
        )
        _, x = parse_wav(wav)
        assert x[:, 0].tolist() == [0, 16384, -32767, 32767]

    def test_extensible_pcm_guid(self):
        body = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        body += struct.pack("<HHI", 22, 16, 1)
        body += bytes.fromhex("0100000000001000800000aa00389b71")
        pay = np.array([7, -7], dtype="<i2").tobytes()
        wav = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(body) + 8 + 4) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(body)) + body
            + b"data" + struct.pack("<I", 4) + pay
        )
        rate, x = parse_wav(wav)
        assert rate == 8000 and x[:, 0].tolist() == [7, -7]

    def test_fail_closed(self):
        with pytest.raises(WavError):
            parse_wav(b"not audio at all")
        with pytest.raises(WavError):
            parse_wav(b"RIFF\x04\x00\x00\x00WAVE")  # no chunks


class TestDsp:
    def test_resample_closed_form_length(self):
        for n, a, b in [(44100, 44100, 22050), (1000, 11025, 8000),
                        (5, 22050, 8000), (1, 8000, 22050)]:
            x = np.zeros((n, 1), dtype=np.int16)
            m = resample_linear(x, a, b).shape[0]
            assert m == ((n - 1) * b // a + 1) if n else 0

    def test_downsample_by_two_picks_every_other(self):
        x = np.arange(0, 1000, dtype=np.int16).reshape(-1, 1)
        y = resample_linear(x, 44100, 22050)
        assert (y[:, 0] == np.arange(0, 1000, 2, dtype=np.int16)[: len(y)]).all()

    def test_upsample_interpolates_midpoints(self):
        x = np.array([[0], [100]], dtype=np.int16)
        y = resample_linear(x, 1, 2)
        assert y[:, 0].tolist() == [0, 50, 100]

    def test_mixdown_floor_average(self):
        x = np.array([[3, 4], [-3, -4], [32767, 32767]], dtype=np.int16)
        m = mixdown_mono(x)
        assert m[:, 0].tolist() == [3, -4, 32767]  # floor division

    def test_identity_rate_copies(self):
        x = np.array([[1], [2]], dtype=np.int16)
        y = resample_linear(x, 8000, 8000)
        assert (y == x).all() and y is not x


class TestTranscodeProfiles:
    def test_mp3_profile_22050_keeps_channels(self):
        wav, _, _ = _stereo_wav()
        rate, x = parse_wav(transcode_wav(wav))
        assert rate == 22050 and x.shape == (22050, 2)

    def test_voip_profile_8000_mono(self):
        wav, _, _ = _stereo_wav()
        rate, x = parse_wav(transcode_wav_voip(wav))
        assert rate == 8000 and x.shape == (8000, 1)

    def test_metadata_chunks_dropped(self):
        wav, _, _ = _stereo_wav(8000, 800)
        # splice a LIST/INFO chunk in (ffmpeg -map_metadata -1 analog)
        info = b"LIST" + struct.pack("<I", 4) + b"INFO"
        tagged = wav[:12] + info + wav[12:]
        out = transcode_wav(tagged)
        assert b"LIST" not in out and b"INFO" not in out

    def test_duration(self):
        wav, _, _ = _stereo_wav()
        assert audio_duration_sec(wav) == 1.0
        assert abs(audio_duration_sec(transcode_wav(wav)) - 1.0) < 1e-4

    def test_deterministic(self):
        wav, _, _ = _stereo_wav()
        assert transcode_wav(wav) == transcode_wav(wav)


class TestId3:
    def test_reference_field_mapping(self):
        """tasks.py:535-603 verbatim: title precedence, album
        "court, year", Argued/Docket comment, Speech genre, Free Law
        publisher fields — the reference's own test asserts title and
        publisher (tests.py:519-530)."""
        wav, _, _ = _stereo_wav(8000, 400)
        tagged = set_audio_metadata(AUDIO_DATA, wav)
        tags, comments, images = parse_id3v2(tagged)
        assert tags["TIT2"] == "SEC v. Frank J. Custable, Jr."
        assert tags["TPUB"] == "Free Law Project"
        assert tags["TALB"] == "Testing Supreme Court, 2020"
        assert tags["TPE1"] == "Testing Supreme Court"
        assert tags["TCON"] == "Speech"
        assert tags["WPUB"] == "https://free.law"
        assert comments == [
            "Argued: 2020-01-01. Docket number: docket number 1 005"
        ]
        # no seal: publisher logo fills BOTH slots (types 3 and 14)
        assert [im[0] for im in images] == [3, 14]
        assert images[0][1] == images[1][1]

    def test_seal_takes_front_cover(self):
        wav, _, _ = _stereo_wav(8000, 400)
        tagged = set_audio_metadata(AUDIO_DATA, wav, seal_png=b"sealpng")
        _, _, images = parse_id3v2(tagged)
        assert images[0] == (
            3, b"sealpng", "image/png", "Seal for Testing Supreme Court"
        )
        assert images[1][0] == 14 and images[1][1] != b"sealpng"

    def test_best_case_name_precedence(self):
        assert best_case_name(AUDIO_DATA) == AUDIO_DATA["case_name"]
        assert best_case_name(
            {"case_name": "", "case_name_full": "F"}
        ) == "F"
        assert best_case_name({"case_name_short": "S"}) == "S"
        assert best_case_name({}) == ""

    def test_retag_replaces_not_stacks(self):
        wav, _, _ = _stereo_wav(8000, 400)
        once = set_audio_metadata(AUDIO_DATA, wav)
        twice = set_audio_metadata(AUDIO_DATA, once)
        assert once == twice  # id3.Tag.remove analog

    def test_tagged_payload_still_parses(self):
        wav, l, _ = _stereo_wav(8000, 400)
        rate, x = parse_wav(set_audio_metadata(AUDIO_DATA, wav))
        assert rate == 8000 and (x[:, 0] == l[:400]).all()

    def test_remove_id3_passthrough(self):
        assert remove_id3(b"RIFFjunk") == b"RIFFjunk"

    def test_unicode_roundtrip(self):
        tag = make_id3v2({"TIT2": "Sæculum — Ñandú v. 株式会社"})
        tags, _, _ = parse_id3v2(tag)
        assert tags["TIT2"] == "Sæculum — Ñandú v. 株式会社"
