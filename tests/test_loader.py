"""Native prefetching corpus loader (native/dataloader.cpp + io/loader.py).

Gates: decoded samples bit-match the Python readers for raw int16, RIFF
wav (pcm16) and float32 streams; completion-order iteration covers every
index exactly once; decode failures surface as drops, not crashes.
"""
import os

import numpy as np
import pytest

from hts_train_world_tpu.io import loader, rawio, wavio


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("nativeload")
    rng = np.random.default_rng(0)
    raws, wavs, f32s = [], [], []
    for i, n in enumerate([1000, 4321, 12345]):
        x = (rng.standard_normal(n) * 8000).astype(np.int16)
        rp = d / f"u{i}.raw"
        x.astype("<i2").tofile(rp)
        raws.append(str(rp))
        wp = d / f"u{i}.wav"
        from scipy.io import wavfile
        wavfile.write(str(wp), 16000 + i, x)
        wavs.append(str(wp))
        fp = d / f"u{i}.lf0"
        rawio.write_f32(str(fp), rng.standard_normal(n).astype(np.float32))
        f32s.append(str(fp))
    return raws, wavs, f32s


def test_raw_bitmatch(corpus):
    raws, _, _ = corpus
    got = loader.load_corpus(raws, loader.RAW_INT16, n_threads=3)
    for p, g in zip(raws, got):
        ref = np.fromfile(p, "<i2").astype(np.float64) / 32768.0
        np.testing.assert_array_equal(g, ref)


def test_wav_bitmatch_and_fs(corpus):
    _, wavs, _ = corpus
    with loader.CorpusLoader(wavs, loader.WAV, n_threads=2) as dl:
        seen = {}
        for i, x, sr in dl:
            seen[i] = (x, sr)
    assert sorted(seen) == list(range(len(wavs)))
    for i, p in enumerate(wavs):
        ref, fs = wavio.wavread(p)
        x, sr = seen[i]
        assert sr == fs == 16000 + i
        np.testing.assert_array_equal(x, ref)


def test_f32_bitmatch(corpus):
    _, _, f32s = corpus
    got = loader.load_corpus(f32s, loader.F32)
    for p, g in zip(f32s, got):
        np.testing.assert_array_equal(
            g, rawio.read_f32(p).astype(np.float64))


def test_bad_file_dropped(tmp_path, corpus):
    raws, _, _ = corpus
    bad = str(tmp_path / "missing.raw")
    garbage_wav = str(tmp_path / "bad.wav")
    open(garbage_wav, "wb").write(b"not a riff file at all........")
    got = loader.load_corpus([raws[0], bad], loader.RAW_INT16)
    assert got[0] is not None and got[1] is None
    got = loader.load_corpus([garbage_wav], loader.WAV)
    assert got[0] is None


def test_empty_corpus():
    assert loader.load_corpus([], loader.WAV) == []


def test_many_files_all_delivered(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    for i in range(40):
        p = tmp_path / f"m{i}.raw"
        (rng.standard_normal(100 + 7 * i) * 100).astype("<i2").tofile(p)
        paths.append(str(p))
    with loader.CorpusLoader(paths, loader.RAW_INT16, n_threads=8,
                             queue_cap=4) as dl:
        idxs = sorted(i for i, x, _ in dl)
    assert idxs == list(range(40))
