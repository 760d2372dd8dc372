"""Audio feature library: windows, spectrogram, mel/fbank, whisper-fbank.

TPU-native equivalent of the reference's MNN-Audio
(/root/reference/tools/audio/include/audio/audio.hpp:85-177: wav load/save,
window functions, spectrogram, melscale_fbanks, fbank, whisper_fbank).
Feature math in jax (jit/fusable, runs on TPU for batch preprocessing);
wav IO via the stdlib (PCM16) — the reference likewise hand-rolls IO.
"""

from __future__ import annotations

import wave as _wave
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# -- IO ---------------------------------------------------------------------

def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """-> (float32 samples in [-1, 1] shaped [n] or [n, ch], sample_rate)."""
    with _wave.open(path, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch)
    return x, sr


def save_wav(path: str, samples: np.ndarray, sample_rate: int) -> None:
    x = np.asarray(samples)
    if x.ndim == 1:
        ch = 1
    else:
        ch = x.shape[1]
    pcm = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    with _wave.open(path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())


# -- windows (audio.hpp window types) ---------------------------------------

def hann_window(n: int, periodic: bool = True) -> jnp.ndarray:
    m = n if periodic else n - 1
    return 0.5 - 0.5 * jnp.cos(2 * jnp.pi * jnp.arange(n) / m)


def hamming_window(n: int, periodic: bool = True) -> jnp.ndarray:
    m = n if periodic else n - 1
    return 0.54 - 0.46 * jnp.cos(2 * jnp.pi * jnp.arange(n) / m)


def povey_window(n: int) -> jnp.ndarray:
    return hann_window(n, periodic=False) ** 0.85


def blackman_window(n: int, periodic: bool = True) -> jnp.ndarray:
    m = n if periodic else n - 1
    t = 2 * jnp.pi * jnp.arange(n) / m
    return 0.42 - 0.5 * jnp.cos(t) + 0.08 * jnp.cos(2 * t)


WINDOWS = {
    "hann": hann_window,
    "hamming": hamming_window,
    "povey": povey_window,
    "blackman": blackman_window,
}


# -- spectrogram ------------------------------------------------------------

def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, center: bool = True):
    if center:
        x = jnp.pad(x, (n_fft // 2, n_fft // 2), mode="reflect")
    n_frames = 1 + (x.shape[0] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[idx]  # [frames, n_fft]


def spectrogram(
    x: jnp.ndarray,
    n_fft: int = 400,
    hop_length: Optional[int] = None,
    window: str = "hann",
    power: float = 2.0,
    center: bool = True,
) -> jnp.ndarray:
    """-> [frames, n_fft//2 + 1] magnitude^power."""
    hop = hop_length or n_fft // 4
    frames = frame_signal(jnp.asarray(x, jnp.float32), n_fft, hop, center)
    win = WINDOWS[window](n_fft)
    spec = jnp.fft.rfft(frames * win, n=n_fft, axis=-1)
    return jnp.abs(spec) ** power


# -- mel --------------------------------------------------------------------

def _hz_to_mel(f, htk=False):
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f = np.asarray(f, np.float64)
    mel = f / (200.0 / 3)
    log_region = f >= 1000.0
    mel = np.where(
        log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0), mel
    )
    return mel


def _mel_to_hz(m, htk=False):
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    m = np.asarray(m, np.float64)
    f = m * (200.0 / 3)
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
    return f


def mel_filterbank(
    n_mels: int,
    n_fft: int,
    sample_rate: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = None,
) -> jnp.ndarray:
    """Triangular mel filters [n_fft//2+1, n_mels] (≈ melscale_fbanks)."""
    fmax = fmax or sample_rate / 2
    mels = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    freqs = _mel_to_hz(mels, htk)
    fft_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    lower = (fft_freqs[:, None] - freqs[None, :-2]) / (freqs[1:-1] - freqs[:-2])
    upper = (freqs[None, 2:] - fft_freqs[:, None]) / (freqs[2:] - freqs[1:-1])
    fb = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (freqs[2:] - freqs[:-2])
        fb = fb * enorm[None, :]
    return jnp.asarray(fb, jnp.float32)


def fbank(
    x: jnp.ndarray,
    sample_rate: int = 16000,
    n_mels: int = 80,
    n_fft: int = 400,
    hop_length: int = 160,
    window: str = "povey",
    dither: float = 0.0,
    preemphasis: float = 0.97,
) -> jnp.ndarray:
    """Kaldi-style log-mel filterbank features [frames, n_mels]."""
    x = jnp.asarray(x, jnp.float32)
    if preemphasis:
        x = jnp.concatenate([x[:1] * (1 - preemphasis), x[1:] - preemphasis * x[:-1]])
    spec = spectrogram(x, n_fft, hop_length, window, power=2.0, center=False)
    fb = mel_filterbank(n_mels, n_fft, sample_rate, fmin=20.0, htk=True)
    mel = jnp.maximum(spec @ fb, 1e-10)
    return jnp.log(mel)


def whisper_fbank(
    x: jnp.ndarray,
    sample_rate: int = 16000,
    n_mels: int = 128,
    n_fft: int = 400,
    hop_length: int = 160,
) -> jnp.ndarray:
    """Whisper's log10-mel features with max-clamp normalization
    (reference: audio.hpp whisper_fbank; used by the Omni audio path)."""
    spec = spectrogram(jnp.asarray(x, jnp.float32), n_fft, hop_length,
                       window="hann", power=2.0, center=True)
    spec = spec[:-1]  # whisper drops the last frame
    fb = mel_filterbank(n_mels, n_fft, sample_rate, norm="slaney")
    mel = spec @ fb
    logspec = jnp.log10(jnp.maximum(mel, 1e-10))
    logspec = jnp.maximum(logspec, logspec.max() - 8.0)
    return (logspec + 4.0) / 4.0  # [frames, n_mels]
