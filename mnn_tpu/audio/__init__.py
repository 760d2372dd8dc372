from mnn_tpu.audio.audio import (
    fbank,
    hamming_window,
    hann_window,
    load_wav,
    mel_filterbank,
    save_wav,
    spectrogram,
    whisper_fbank,
)

__all__ = [
    "fbank", "hamming_window", "hann_window", "load_wav", "mel_filterbank",
    "save_wav", "spectrogram", "whisper_fbank",
]
