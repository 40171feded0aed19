from .attention import dot_product_attention, flash_attention  # noqa: F401
from .beam_search import (  # noqa: F401
    apply_ngram_block,
    beam_search,
    diverse_beam_search,
    greedy_search,
    sample_search,
)
from .dynamic_conv import dynamic_conv, lightweight_conv  # noqa: F401
from .ring_attention import ring_attention  # noqa: F401
from .audio import SNR_LEVELS, add_noise_snr, pcm16_to_float, sample_noise_segment  # noqa: F401
from .interpolate import length_mask, linear_resize_batched  # noqa: F401
from .stft import (  # noqa: F401
    hifigan_log_mel,
    mel_filterbank,
    mel_frame_count,
    pad_to_whisper_chunk,
    spectrogram,
    whisper_log_mel,
)
