"""Audio preprocessing: loading + whisper-style log-mel spectrograms.

Port of the reference's audio_process (/root/reference/src/audio_process.h:
27-57): ffmpeg-assisted loading and mel_spectrogram variants.  The mel
pipeline matches Whisper/HF WhisperFeatureExtractor semantics (hann window,
reflect padding, slaney mel filterbank, log10 with 8-dB dynamic range clamp)
— verified against transformers in tests.
"""
from __future__ import annotations

import math
import shutil
import subprocess
import wave

import numpy as np


def load_audio(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Load audio as mono f32 at `sample_rate`.  WAV PCM is read natively;
    other formats go through ffmpeg (like the reference, audio_process.h:27)."""
    if path.lower().endswith(".wav"):
        with wave.open(path, "rb") as w:
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            ch = w.getnchannels()
            sr = w.getframerate()
        dt = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
        x = np.frombuffer(raw, dtype=dt).astype(np.float32)
        if width == 1:
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (8 * width - 1))
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        if sr != sample_rate:
            x = _resample(x, sr, sample_rate)
        return x
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(f"need ffmpeg to load {path}")
    out = subprocess.run(
        [ffmpeg, "-nostdin", "-i", path, "-f", "f32le", "-ac", "1",
         "-ar", str(sample_rate), "pipe:1"],
        check=True, capture_output=True)
    return np.frombuffer(out.stdout, np.float32)


def _resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    n_out = int(round(len(x) * sr_out / sr_in))
    t = np.linspace(0, len(x) - 1, n_out)
    return np.interp(t, np.arange(len(x)), x).astype(np.float32)


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank [n_mels, n_fft//2+1]."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_region = f >= 1000.0
        mel = np.where(log_region,
                       15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
                       mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    fmax = sample_rate / 2
    mels = np.linspace(hz_to_mel(0.0), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sample_rate)
    fb = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lower = (bins - hz[i]) / (hz[i + 1] - hz[i])
        upper = (hz[i + 2] - bins) / (hz[i + 2] - hz[i + 1])
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz[2:] - hz[:-2])
    fb *= enorm[:, None]
    return fb.astype(np.float32)


def log_mel_spectrogram(samples: np.ndarray, *, n_mels: int = 128,
                        n_fft: int = 400, hop_length: int = 160,
                        sample_rate: int = 16000,
                        pad_to_samples: int = -1) -> np.ndarray:
    """Whisper-style log-mel features [n_mels, frames]
    (reference mel_spectrogram, audio_process.h:30)."""
    x = np.asarray(samples, np.float32)
    if pad_to_samples > 0 and len(x) < pad_to_samples:
        x = np.pad(x, (0, pad_to_samples - len(x)))
    # reflect-pad by n_fft//2 on both sides (center=True)
    half = n_fft // 2
    x = np.pad(x, (half, half), mode="reflect")
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    n_frames = 1 + (len(x) - n_fft) // hop_length
    idx = (np.arange(n_fft)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    frames = x[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2       # [frames, bins]
    fb = mel_filterbank(n_mels, n_fft, sample_rate)
    mel = fb @ spec.T                                     # [n_mels, frames]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    # whisper drops the final frame and clamps dynamic range to 8 dB
    log_spec = log_spec[:, :-1]
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def load_pcm(path: str, sample_rate: int = 16000) -> np.ndarray:
    """Alias for load_audio (raw mono PCM f32)."""
    return load_audio(path, sample_rate)


def htk_mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                       f_min: float = 0.0, f_max: float = -1.0) -> np.ndarray:
    """HTK-formula triangular mel filterbank WITHOUT slaney normalization
    [n_mels, n_fft//2+1] (reference build_mel_filter_bank(..., htk=true),
    audio_process.cpp:149-186, as called by mel_spectrogram_gemma_4:651)."""
    if f_max <= f_min:
        f_max = sample_rate / 2.0
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)
    mel2hz = lambda m: 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)
    mel_f = mel2hz(np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2))
    # n_fft here is the FULL fft length; reference sums over all n_fft bins
    # of the (symmetric) power spectrum, with bin freqs k*sr/n_fft — only
    # bins strictly inside (mel_f[i], mel_f[i+2]) get weights, so in
    # practice only the first half contributes
    bins = np.arange(n_fft) * (sample_rate / float(n_fft))
    fb = np.zeros((n_mels, n_fft), np.float64)
    for i in range(n_mels):
        inside = (bins > mel_f[i]) & (bins < mel_f[i + 2])
        lower = (bins - mel_f[i]) / (mel_f[i + 1] - mel_f[i])
        upper = 1.0 - (bins - mel_f[i + 1]) / (mel_f[i + 2] - mel_f[i + 1])
        fb[i] = np.where(inside, np.minimum(lower, upper), 0.0)
    return fb.astype(np.float32)


def log_mel_gemma4(samples: np.ndarray, cfg) -> np.ndarray:
    """Gemma-4 mel features [frames, feature_size] (reference
    mel_spectrogram_gemma_4, audio_process.cpp:639-686): left-pad
    frame_length/2 zeros, periodic-hann(frame_length) windowed frames every
    hop, zero-padded FFT of fft_length, MAGNITUDE spectrum (sqrt of power),
    HTK mel filters, log(sum + mel_floor); frames = n_samples // hop."""
    x = np.asarray(samples, np.float32)
    n_frames = len(x) // cfg.hop_length
    x = np.pad(x, (cfg.frame_length // 2, cfg.frame_length))
    window = (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(cfg.frame_length)
                                  / cfg.frame_length))).astype(np.float32)
    idx = (np.arange(cfg.frame_length)[None, :]
           + cfg.hop_length * np.arange(n_frames)[:, None])
    frames = x[idx] * window[None, :]
    frames = np.pad(frames, ((0, 0), (0, cfg.fft_length - cfg.frame_length)))
    mag = np.abs(np.fft.fft(frames, axis=1))              # full symmetric fft
    fb = htk_mel_filterbank(cfg.feature_size, cfg.fft_length,
                            cfg.sampling_rate)
    mel = mag @ fb.T                                      # [frames, n_mels]
    return np.log(mel + cfg.mel_floor).astype(np.float32)


def log_mel_dual_reflect(samples: np.ndarray, *, n_mels: int = 128,
                         n_fft: int = 1024, hop_length: int = 256,
                         sample_rate: int = 24000) -> np.ndarray:
    """Qwen3-TTS speaker-encoder mel [frames, n_mels] (reference
    mel_spectrogram_dual_pad_reflect, audio_process.cpp:592-637):
    reflect-pad (n_fft - hop)/2 both sides, periodic hann, MAGNITUDE
    spectrum, slaney filterbank, log(max(1e-5, x))."""
    x = np.asarray(samples, np.float32)
    half = (n_fft - hop_length) // 2
    x = np.pad(x, (half, half), mode="reflect")
    window = (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft)
                                  / n_fft))).astype(np.float32)
    n_frames = 1 + (len(x) - n_fft) // hop_length
    idx = (np.arange(n_fft)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    frames = x[idx] * window[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))             # [frames, bins]
    fb = mel_filterbank(n_mels, n_fft, sample_rate)
    mel = mag @ fb.T
    return np.log(np.maximum(mel, 1e-5)).astype(np.float32)
