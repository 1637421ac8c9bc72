"""Native extension tests: C++ YIN vs the NumPy reference implementation."""

import shutil

import numpy as np
import pytest

requires_gxx = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


@requires_gxx
def test_native_yin_matches_numpy():
    from e2e_tts_tpu.audio.features import yin_f0
    from e2e_tts_tpu.native import load

    assert load("yin") is not None

    sr = 22050
    t = np.arange(sr * 2)
    x = 0.5 * np.sin(2 * np.pi * 196 * t / sr) * (
        0.6 + 0.4 * np.sin(2 * np.pi * 3 * t / sr)
    )
    f_native = yin_f0(x, sr, 256, use_native=True)
    f_numpy = yin_f0(x, sr, 256, use_native=False)
    assert len(f_native) == len(f_numpy)
    # voiced/unvoiced decisions identical; voiced estimates within 0.1 Hz
    assert ((f_native > 0) == (f_numpy > 0)).mean() > 0.99
    voiced = (f_native > 0) & (f_numpy > 0)
    assert np.abs(f_native[voiced] - f_numpy[voiced]).max() < 0.1


@requires_gxx
def test_native_yin_silence_and_short_input():
    from e2e_tts_tpu.native import native_yin_f0

    out = native_yin_f0(np.zeros(22050, np.float32), 22050, 256)
    assert out is not None and (out == 0).all()
    short = native_yin_f0(np.zeros(100, np.float32), 22050, 256)
    assert short is not None
