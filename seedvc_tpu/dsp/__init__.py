from seedvc_tpu.dsp.mel import (  # noqa: F401
    MelFrontend,
    hann_window,
    log_mel_spectrogram,
    mel_filterbank,
)
from seedvc_tpu.dsp.stft import frame_signal, stft_magnitude  # noqa: F401
