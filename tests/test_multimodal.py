"""Multimodal stage plumbing: schema, actor pool, determinism, strict
stub behavior."""

import numpy as np
import pyarrow as pa
import pytest


def test_media_pipeline_schema_and_determinism(ray_session):
    from docling_pdf_ray.functions.multimodal import (FEATURE_DIM,
                                                      media_features,
                                                      synth_media_dataset)

    ds = synth_media_dataset(48, seed=5)
    out = media_features(ds, concurrency=(1, 2), batch_size=8)
    t = pa.concat_tables(out.iter_batches(batch_format="pyarrow")).sort_by("media_id")
    assert t.num_rows == 48
    assert t.column_names == ["media_id", "kind", "n_bytes", "width",
                              "height", "feature"]
    feats = t.column("feature").to_pylist()
    assert all(len(f) == FEATURE_DIM for f in feats)
    # re-run: identical (deterministic fake decode + fixed projection)
    out2 = media_features(synth_media_dataset(48, seed=5),
                          concurrency=(1, 2), batch_size=8)
    t2 = pa.concat_tables(out2.iter_batches(batch_format="pyarrow")).sort_by("media_id")
    assert t.equals(t2)


def test_strict_mode_raises():
    from docling_pdf_ray.functions.multimodal import MediaFeatureStage

    stage = MediaFeatureStage(strict=True)
    batch = pa.table({"media_id": [1], "kind": ["image"],
                      "payload": [b"xx"], "meta": ["{}"]})
    with pytest.raises(NotImplementedError, match="codec"):
        stage(batch)


def test_fake_decode_is_pure():
    from docling_pdf_ray.functions.multimodal import _fake_decode

    w1, h1, f1 = _fake_decode(b"payload")
    w2, h2, f2 = _fake_decode(b"payload")
    assert (w1, h1) == (w2, h2)
    assert np.array_equal(f1, f2)
    w3, _, f3 = _fake_decode(b"other")
    assert not np.array_equal(f1, f3)


def test_ppm_decode_roundtrip_and_resize():
    from docling_pdf_ray.functions.multimodal import (decode_ppm, encode_ppm,
                                                      resize_nearest)

    img = np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    # comment + extra whitespace in the header parse
    with_comment = b"P6\n# a comment\n7 5\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(with_comment), img)
    r = resize_nearest(img, 3, 2)
    assert r.shape == (2, 3, 3)
    # identity resize is exact
    assert np.array_equal(resize_nearest(img, 7, 5), img)
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n4 4\n255\n\x00\x00")


def test_bmp_decode_roundtrip_padding_and_feature_parity():
    """r3 BMP codec: encode/decode identity on widths exercising all
    row-padding remainders, top-down (negative height) rasters, the
    malformed-payload guards, and feature parity — the SAME image via
    PPM and BMP payloads must produce identical stage features."""
    import struct

    from docling_pdf_ray.functions.multimodal import (MediaFeatureStage,
                                                      decode_bmp, encode_bmp,
                                                      encode_ppm)

    rng = np.random.RandomState(7)
    for w in (1, 2, 3, 4, 7):                 # stride remainders 0..3
        img = rng.randint(0, 256, size=(5, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img), w

    # top-down variant: negative height, rows in natural order
    img = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    bu = encode_bmp(img)
    stride = (6 * 3 + 3) & ~3
    raster = np.zeros((4, stride), dtype=np.uint8)
    raster[:, :18] = img[:, :, ::-1].reshape(4, 18)     # natural order, BGR
    td = bu[:22] + struct.pack("<i", -4) + bu[26:54] + raster.tobytes()
    assert np.array_equal(decode_bmp(td), img)

    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError, match="24bpp"):
        bad = bytearray(encode_bmp(img))
        bad[28] = 8                                      # claim 8bpp
        decode_bmp(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(img)[:-4])
    with pytest.raises(ValueError, match="offset"):
        bad = bytearray(encode_bmp(img))
        bad[10:14] = (0).to_bytes(4, "little")  # raster inside header
        decode_bmp(bytes(bad))

    stage = MediaFeatureStage(strict=True)
    batch = pa.table({"media_id": [0, 1], "kind": ["image", "image"],
                      "payload": [encode_ppm(img), encode_bmp(img)],
                      "meta": ["{}", "{}"]})
    out = stage(batch)
    assert out.column("width").to_pylist() == [6, 6]
    assert out.column("height").to_pylist() == [4, 4]
    f = out.column("feature").to_pylist()
    assert f[0] == f[1]                                  # codec-independent


def test_wav_decode_roundtrip():
    from docling_pdf_ray.functions.multimodal import decode_wav, encode_wav

    x = (np.sin(np.linspace(0, 20, 1600)) * 0.5).astype(np.float32)
    y, rate = decode_wav(encode_wav(x, 8000))
    assert rate == 8000 and len(y) == 1600
    assert np.allclose(y, x, atol=1.0 / 32767)


def test_real_decoders_run_inside_stage():
    """image/audio rows of the synth corpus carry REAL P6/WAV payloads:
    the stage must report their true geometry, not the fake's."""
    from docling_pdf_ray.functions.multimodal import (MediaFeatureStage,
                                                      decode_ppm, decode_wav,
                                                      encode_ppm, encode_wav)

    img = np.full((10, 20, 3), 128, dtype=np.uint8)
    wav = encode_wav(np.zeros(1234, dtype=np.float32), 16000)
    batch = pa.table({"media_id": [0, 1], "kind": ["image", "audio"],
                      "payload": [encode_ppm(img), wav], "meta": ["{}", "{}"]})
    out = MediaFeatureStage(strict=True)(batch)   # strict: stubs would raise
    assert out.column("width").to_pylist() == [20, 1234]   # img w, audio samples
    assert out.column("height").to_pylist() == [10, 16000]  # img h, sample rate


def test_malformed_real_format_payloads_fall_back_not_raise():
    """A payload that LOOKS like P6/WAV but is truncated must ride the
    stub arm in default mode (never kill the task) and raise only
    under strict=True."""
    from docling_pdf_ray.functions.multimodal import MediaFeatureStage

    bad = pa.table({"media_id": [0, 1], "kind": ["image", "audio"],
                    "payload": [b"P6\n4 4\n255\n\x00", b"RIFFjunk"],
                    "meta": ["{}", "{}"]})
    out = MediaFeatureStage(strict=False)(bad)
    assert out.num_rows == 2                      # fake-decoded, no raise
    import wave

    # the strict contract: codec parse errors (ValueError / wave.Error)
    # or the honest no-codec stub (NotImplementedError) — nothing else
    with pytest.raises((ValueError, NotImplementedError, wave.Error)):
        MediaFeatureStage(strict=True)(bad)


def test_rvid_roundtrip_frame_sampling_and_stage():
    """Real video path: RVID decode roundtrip, deterministic
    even-spaced frame sampling, and the stage reporting true geometry
    under strict=True (stubs would raise)."""
    from docling_pdf_ray.functions.multimodal import (MediaFeatureStage,
                                                      decode_rvid,
                                                      encode_rvid,
                                                      sample_frame_indices)

    frames = np.arange(6 * 4 * 5 * 3, dtype=np.uint8).reshape(6, 4, 5, 3)
    payload = encode_rvid(frames, 24)
    dec, fps = decode_rvid(payload)
    assert fps == 24 and np.array_equal(dec, frames)

    assert sample_frame_indices(6, 4).tolist() == [0, 2, 3, 5]
    assert sample_frame_indices(2, 4).tolist() == [0, 1]     # k > n clamps
    assert sample_frame_indices(100, 1).tolist() == [50]     # midpoint

    batch = pa.table({"media_id": [0], "kind": ["video"],
                      "payload": [payload], "meta": ["{}"]})
    out = MediaFeatureStage(strict=True)(batch)
    assert out.column("width").to_pylist() == [5]
    assert out.column("height").to_pylist() == [4]

    with pytest.raises(ValueError, match="truncated"):
        decode_rvid(payload[:-10])


def test_pgm_decode_roundtrip_and_feature_parity():
    """P5 PGM codec: encode/decode identity on grayscale rasters
    (channel-replicated output), header comment handling, malformed
    guards, and stage parity — a gray image fed as PGM and as the
    equivalent channel-replicated PPM must produce identical features."""
    from docling_pdf_ray.functions.multimodal import (MediaFeatureStage,
                                                      decode_pgm, encode_pgm,
                                                      encode_ppm)

    gray = np.arange(5 * 7, dtype=np.uint8).reshape(5, 7)
    img = np.repeat(gray[:, :, None], 3, axis=2)
    assert np.array_equal(decode_pgm(encode_pgm(gray)), img)
    # encoding an already-replicated RGB image lands on the same bytes
    assert encode_pgm(img) == encode_pgm(gray)
    with_comment = b"P5\n# c\n7 5\n255\n" + gray.tobytes()
    assert np.array_equal(decode_pgm(with_comment), img)
    with pytest.raises(ValueError, match="P5"):
        decode_pgm(b"P6\n1 1\n255\n\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_pgm(b"P5\n4 4\n255\n\x00")

    stage = MediaFeatureStage(strict=True)
    import pyarrow as pa

    def feats(payload):
        batch = pa.table({"media_id": pa.array([0], pa.int64()),
                          "kind": pa.array(["image"], pa.string()),
                          "payload": pa.array([payload], pa.binary())})
        out = stage(batch)
        assert out.column("width")[0].as_py() == 7
        assert out.column("height")[0].as_py() == 5
        return out.column("feature")[0].as_py()

    assert feats(encode_pgm(gray)) == feats(encode_ppm(img))


def test_pam_decode_roundtrip_and_feature_parity():
    """P7 PAM (r3, third real image codec): RGB depth-3 round-trips
    exactly; depth-1 grayscale channel-replicates and its features
    match the PGM path on the same luminance; comment/whitespace
    header quirks parse; malformed payloads raise."""
    import numpy as np
    import pytest

    from docling_pdf_ray.functions.multimodal import (
        decode_pam, decode_pgm, encode_pam, encode_pgm, image_features)

    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert (decode_pam(encode_pam(img)) == img).all()

    # grayscale: PAM depth-1 must equal the PGM decode of the same image
    g_pam = decode_pam(encode_pam(img, depth=1))
    g_pgm = decode_pgm(encode_pgm(img))
    assert (g_pam == g_pgm).all()
    assert np.allclose(image_features(g_pam), image_features(g_pgm))

    # header with a comment line and advisory TUPLTYPE
    hdr = (b"P7\n# crawler artifact\nWIDTH 2\nHEIGHT 1\nDEPTH 3\n"
           b"MAXVAL 255\nTUPLTYPE RGB\nENDHDR\n" + bytes(6))
    assert decode_pam(hdr).shape == (1, 2, 3)

    for bad in [b"P7\nWIDTH 2\nHEIGHT 1\nDEPTH 3\nMAXVAL 255\nENDHDR\n",
                b"P7\nWIDTH 2\nHEIGHT 1\nDEPTH 2\nMAXVAL 255\nENDHDR\n" + bytes(4),
                b"P7\nWIDTH 2\nHEIGHT 1\nDEPTH 3\nMAXVAL 65535\nENDHDR\n" + bytes(12),
                b"P6 not a pam"]:
        with pytest.raises(ValueError):
            decode_pam(bad)


def test_ahash64_properties():
    from docling_pdf_ray.functions.multimodal import ahash64, encode_bmp, decode_bmp

    rng = np.random.RandomState(3)
    img = rng.randint(0, 251, size=(24, 31, 3), dtype=np.uint8)
    h = ahash64(img)
    assert 0 <= h < (1 << 64)
    # deterministic, codec-roundtrip stable
    assert ahash64(decode_bmp(encode_bmp(img))) == h
    # uniform non-clipping brightness shift is hash-invariant by design
    assert ahash64(np.clip(img.astype(np.int16) + 4, 0, 255).astype(np.uint8)) == h
    # a structurally different image is far away
    other = rng.randint(0, 251, size=(24, 31, 3), dtype=np.uint8)
    assert bin(h ^ ahash64(other)).count("1") > 10


def test_image_phash_dedup_recall_and_precision(ray_session):
    """Planted pairs (5k+3, 5k+4) are all recovered; no random pair
    sneaks under the hamming threshold."""
    from docling_pdf_ray.queries import q_image_phash_dups

    pairs = q_image_phash_dups("/root/testdata/sf0.001")
    got = set(zip(pairs["media_id_a"], pairs["media_id_b"]))
    from docling_pdf_ray.queries import _media_fixture_n
    n = _media_fixture_n("/root/testdata/sf0.001")  # query's own formula
    planted = {(5 * k + 3, 5 * k + 4) for k in range(n // 5)
               if 5 * k + 4 < n}
    assert planted <= got, planted - got
    assert (pairs["hamming"] <= 3).all()
    # precision: anything beyond the planted set must be a true
    # hamming<=3 collision of the hashes themselves (verify re-check)
    from docling_pdf_ray.functions.multimodal import (ImageHashStage,
                                                      synth_image_dedup_dataset)
    t = pa.concat_tables(list(
        synth_image_dedup_dataset(n=n).map_batches(
            ImageHashStage, batch_format="pyarrow", concurrency=2)
        .iter_batches(batch_format="pyarrow")))
    fp = dict(zip(t.column("media_id").to_pylist(),
                  t.column("ahash").to_pylist()))
    for a, b in got:
        assert bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1") <= 3


def test_image_hash_stage_strict_and_fallback():
    from docling_pdf_ray.functions.multimodal import ImageHashStage

    batch = pa.table({"media_id": pa.array([0], pa.int64()),
                      "kind": pa.array(["image"]),
                      "payload": pa.array([b"\xff\xd8jpeg-ish"], pa.binary())})
    out = ImageHashStage(strict=False)(batch)
    assert out.num_rows == 1  # digest fallback keeps the row
    assert out.column("decoded").to_pylist() == [False]  # ...but tagged
    with pytest.raises(NotImplementedError):
        ImageHashStage(strict=True)(batch)


def test_pseudo_hash_rows_never_pair(ray_session):
    """ADVICE r4: two byte-identical UNDECODABLE payloads produce equal
    blake2b pseudo-hashes (hamming 0) but carry no pixel evidence —
    the dedup must not surface them as a near-dup image pair. Pinned by
    running the banding+verify flow over a batch mixing a real planted
    pair with an identical undecodable pair."""
    import numpy as np

    from docling_pdf_ray.functions.multimodal import (ImageHashStage,
                                                      encode_ppm)
    from docling_pdf_ray import queries as Q

    rng = np.random.RandomState(3)
    img = rng.randint(0, 251, size=(20, 20, 3), dtype=np.uint8)
    near = np.clip(img.astype(np.int16) + 2, 0, 255).astype(np.uint8)
    batch = pa.table({
        "media_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array([encode_ppm(img), encode_ppm(near),
                             b"\xff\xd8same-jpeg", b"\xff\xd8same-jpeg"],
                            pa.binary())})
    hashed = ImageHashStage(strict=False)(batch)
    t = hashed.filter(hashed.column("decoded"))
    bands = Q._fp_band_table(t.column("media_id").to_pylist(),
                             t.column("ahash").to_pylist(), 4)
    got = set()
    for _, g in bands.to_pandas().groupby("_bucket"):
        v = Q._fp_verify_group(g, 3, a_col="a", b_col="b")
        got |= set(zip(v.column("a").to_pylist(), v.column("b").to_pylist()))
    assert got == {(0, 1)}      # the real pair, never the jpeg twins


def test_media_feature_stats_query(ray_session):
    """Registry entry: per-kind integer aggregates over the
    materialized mixed-media fixture — deterministic, all three kinds
    present, counts sum to the fixture size."""
    from docling_pdf_ray import queries as Q

    out = Q.q_media_feature_stats("/root/testdata/sf0.001")
    assert list(out.columns) == ["kind", "n_items", "sum_bytes",
                                 "sum_width", "sum_height"]
    assert sorted(out["kind"]) == ["audio", "image", "video"]
    assert out["n_items"].sum() == 48          # min fixture size at sf0.001
    assert (out["sum_bytes"] > 0).all()
    out2 = Q.q_media_feature_stats("/root/testdata/sf0.001")
    import pandas as pd
    pd.testing.assert_frame_equal(out, out2)


def test_afp64_gain_invariance_and_contrast():
    """Uniform gain never flips a bit; a structurally different
    envelope is far away."""
    import numpy as np

    from docling_pdf_ray.functions.multimodal import afp64

    rng = np.random.RandomState(5)
    amps = np.where(rng.rand(64) < 0.5, 0.1, 0.6)
    tone = np.tile([1.0, -1.0], 32)
    x = (amps[:, None] * tone[None, :]).ravel()
    h = afp64(x)
    assert afp64(x * 1.02) == h
    assert afp64(x * 0.5) == h
    other_amps = np.where(rng.rand(64) < 0.5, 0.1, 0.6)
    other = (other_amps[:, None] * tone[None, :]).ravel()
    assert bin(h ^ afp64(other)).count("1") > 10
    assert afp64(np.zeros(0)) == 0


def test_audio_fp_dedup_recall_and_precision(ray_session):
    """Planted re-mastered pairs (5k+3, 5k+4) are all recovered; every
    reported pair is a true hamming<=3 fingerprint match; pseudo-hash
    (undecodable) rows never pair."""
    import pyarrow as pa

    from docling_pdf_ray.functions.multimodal import (AudioHashStage,
                                                      audio_table_path)
    from docling_pdf_ray.queries import q_audio_fp_dups

    pairs = q_audio_fp_dups("/root/testdata/sf0.001")
    got = set(zip(pairs["media_id_a"], pairs["media_id_b"]))
    from docling_pdf_ray.queries import _media_fixture_n
    n = _media_fixture_n("/root/testdata/sf0.001")  # same formula as
    #   the query builds its fixture with — never hardcode the 64
    planted = {(5 * k + 3, 5 * k + 4) for k in range(n // 5)
               if 5 * k + 4 < n}
    assert planted <= got, planted - got
    assert (pairs["hamming"] <= 3).all()

    import ray.data as rd
    t = pa.concat_tables(list(
        rd.read_parquet(audio_table_path(n=n))
        .map_batches(AudioHashStage, batch_format="pyarrow",
                     concurrency=2)
        .iter_batches(batch_format="pyarrow")))
    fp = dict(zip(t.column("media_id").to_pylist(),
                  t.column("afp").to_pylist()))
    dec = dict(zip(t.column("media_id").to_pylist(),
                   t.column("decoded").to_pylist()))
    undecodable = {m for m, d in dec.items() if not d}
    assert undecodable, "fixture must contain MP3-shaped rows"
    for a, b in got:
        assert a not in undecodable and b not in undecodable
        assert bin((fp[a] ^ fp[b]) & ((1 << 64) - 1)).count("1") <= 3


def test_audio_hash_stage_strict_and_fallback():
    import pyarrow as pa
    import pytest

    from docling_pdf_ray.functions.multimodal import AudioHashStage

    batch = pa.table({"media_id": pa.array([0], pa.int64()),
                      "kind": pa.array(["audio"]),
                      "payload": pa.array([b"\xffID3mp3-ish"],
                                          pa.binary())})
    out = AudioHashStage(strict=False)(batch)
    assert out.num_rows == 1
    assert out.column("decoded").to_pylist() == [False]
    with pytest.raises(NotImplementedError):
        AudioHashStage(strict=True)(batch)
